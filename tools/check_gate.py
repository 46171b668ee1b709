#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale-factor dir, then compare each query's parquet output against its
DuckDB oracle (columns sorted by name, rows sorted, values hashed)."""
import json, math, sys, subprocess, glob, os

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
skip_verify = "--no-verify" in sys.argv

if not skip_verify:
    cp = subprocess.run(["bash", "-c",
        f"cd /root/repo && timeout 1200 java -cp target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\\n' ':') "
        f"--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED "
        f"--add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED "
        f"--add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED "
        f"--add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED "
        f"--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED "
        f"--add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED "
        f"--add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED "
        f"graft.Verify {sfdir} {outdir} 2>&1 | grep -E '\\[verify\\]|Exception' | head -40"])
    print("--- verify done ---")

import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None: return "NULL"
    if isinstance(v, bool): return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(round(v, 9))
    return str(v)

def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sc = [cols[i] for i in order]
    sr = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return sc, sr

fails = []
for name, sql in sorted(oracles.items()):
    pq = f"{outdir}/{name}"
    if not glob.glob(f"{pq}/*.parquet"):
        fails.append((name, "NO SPARK OUTPUT")); print(f"{name}: NO-OUTPUT"); continue
    try:
        sdf = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        scols = [d[0] for d in sdf.description]; srows = sdf.fetchall()
        odf = con.execute(sql)
        ocols = [d[0] for d in odf.description]; orows = odf.fetchall()
    except Exception as e:
        fails.append((name, f"SQL ERROR: {e}")); print(f"{name}: SQL-ERROR {str(e)[:200]}"); continue
    sc, sr = normalize(scols, srows)
    oc, orr = normalize(ocols, orows)
    if sc != oc:
        fails.append((name, f"SCHEMA {sc} vs {oc}")); print(f"{name}: SCHEMA-MISMATCH spark={sc} oracle={oc}"); continue
    if len(sr) != len(orr):
        fails.append((name, f"ROWS {len(sr)} vs {len(orr)}")); print(f"{name}: ROWCOUNT {len(sr)} vs {len(orr)}"); continue
    if sr != orr:
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
        fails.append((name, f"VALUES {diffs}")); print(f"{name}: VALUE-MISMATCH e.g. {diffs}"); continue
    print(f"{name}: OK ({len(sr)} rows)")

# queries without oracle → rows-only check
for name in set(os.listdir(outdir)) - set(oracles) - {"oracle_sql.json"}:
    if glob.glob(f"{outdir}/{name}/*.parquet"):
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
        print(f"{name}: rows-only ({n} rows)")
    else:
        print(f"{name}: rows-only NO OUTPUT"); fails.append((name, "NO OUTPUT"))

print(f"\n{'FAIL' if fails else 'PASS'}: {len(oracles) - sum(1 for f in fails if f[0] in oracles)}/{len(oracles)} oracle checks green")
sys.exit(1 if fails else 0)
