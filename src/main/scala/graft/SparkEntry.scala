package graft

import graft.operators._
import graft.sources.Export
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator
 * (SURVEY.md §2 + the training-data-pipeline operator family), each
 * with an ANSI-SQL oracle the driver runs in DuckDB over the same
 * parquet tables. Every computed column is aliased identically on both
 * sides; floating aggregates are rounded on both sides; hash-valued
 * ops use the cross-engine polynomial hash ([[operators.Hashing]]).
 *
 * Naming: q_* relational core, ev_* event/stream ops, s_* scanner ops,
 * t_* field transforms, r_* routing, d_* dedup, sim_* similarity,
 * ta_* text analysis, ft_* the fulltext index + BM25 engine itself.
 */
object SparkEntry {

  // ---------- shared readers ----------
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------- shared DuckDB SQL fragments (mirrors of the Spark ops) ----------
  /** Engine V1 analyzer: lowercase + maximal [a-z0-9] runs. */
  private val ToksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)"

  /** The v1+stop chain: V1 then English stopword removal — mirrors
    * `Analyzer(stop = true)` with the engine's exact stopword list
    * ([[graft.analysis.Tokenizer.EnglishStopwords]]). */
  private lazy val StopToksSql = {
    val stops = graft.analysis.Tokenizer.EnglishStopwords.toSeq.sorted
      .map(w => s"'$w'").mkString("(", ", ", ")")
    s"list_filter($ToksSql, t -> t NOT IN $stops)"
  }

  /** Mirror of Hashing.polyHash (base-257 rolling hash mod 1e9+7). */
  private def polySql(s: String): String =
    s"list_reduce(list_concat([0::BIGINT], list_transform(string_split($s, ''), " +
      s"c -> ascii(c)::BIGINT)), (a, b) -> (a * 257 + b) % 1000000007)"

  /** Mirror of Dedup.shingles(k=3) over a `toks` column. */
  private val ShinglesSql =
    "list_distinct(list_filter(list_transform(range(0, greatest(len(toks) - 3, 0) + 1), " +
      "i -> array_to_string(toks[i+1:i+3], ' ')), s -> len(s) > 0))"

  /** Mirror of Similarity.dot: left-fold in element order, double acc —
    * bit-identical to Spark's aggregate(zip_with(...)). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_concat([0.0::DOUBLE], list_transform(range(1, len($a) + 1), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private val Langs = Seq("de", "en", "es", "fr")
  private val StopSql: Map[String, String] = Map(
    "en" -> inList(Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for")),
    "es" -> inList(Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por")),
    "fr" -> inList(Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est")),
    "de" -> inList(Seq("der", "die", "das", "und", "von", "zu", "den", "mit", "ist", "ein")))

  private def hitsSql(lang: String): String =
    s"len(list_filter(toks, t -> t IN ${StopSql(lang)}))::BIGINT"

  /** BM25 reference query for the ft_* entries. */
  val FtQuery = "dup window spark"
  private val FtQueryTerms = Seq("dup", "spark", "window") // sorted

  /** Query for the incremental-maintenance entry (distinct terms so a
    * stale index can't accidentally agree with the topk entry). */
  val FtQueryInc = "merge vector stream"
  private val FtQueryIncTerms = Seq("merge", "stream", "vector") // sorted

  /** Query for the stemmed-chain entry: every term CHANGES under
    * Porter stemming (query → queri, merge → merg, value → valu), so a
    * build that silently skipped the stem stage has df = 0 for every
    * query-side stem and cannot match the oracle. */
  val FtQueryStem = "query merge value"

  /** The documents generator's closed 31-token vocabulary (identical at
    * every scale factor — verified against sf0.001/0.01/0.1). The
    * stemmed-chain oracle needs corpus tokens mapped through the SAME
    * (token → stem) function the engine applies; with a closed vocab
    * that map is this finite table, computed here by the engine's own
    * [[graft.analysis.PorterStemmer]] and embedded in the SQL — the
    * "persisted token→stem map the oracle joins through". */
  private val DocVocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** Stemmed chain mirror: v1 → stopword filter → per-token stem CASE
    * over the closed vocabulary (tokens whose stem differs). */
  private lazy val StemToksSql = {
    val whens = DocVocab
      .map(t => t -> graft.analysis.PorterStemmer.stem(t))
      .collect { case (t, s) if s != t => s"WHEN t = '$t' THEN '$s'" }
      .mkString(" ")
    s"list_transform($StopToksSql, t -> CASE $whens ELSE t END)"
  }

  // ---------- flagship ----------
  /** Flagship: build the inverted index over sf0.001 documents and run
    * a BM25 top-10 query (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    FtIndex.reader(spark, dir).searchDF(FtQuery, 10)
  }

  // =====================================================================
  // Spark-side queries
  // =====================================================================

  private def q1Agg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        count(lit(1)).as("count_order"))

  private def q3JoinTopn(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  private def q5Revenue(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .join(tbl(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(tbl(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(tbl(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(tbl(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  private def wTopnPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    tbl(s, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
  }

  private def qDistinctUsers(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events").groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))

  private def evHourly(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))

  /** Sliding-window event counts (window 2h, slide 1h — Spark's
    * `window()` operator, the overlapping-windows sibling of
    * ev_hourly's tumbling date_trunc): every event lands in exactly
    * two hour-aligned windows, which the oracle reproduces as a
    * two-offset union. */
  private def evSliding(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"))

  private def evSessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    tbl(s, dir, "events")
      .withColumn("ms", unix_millis(col("ts").cast("timestamp_ltz")))
      .withColumn("prev_ms", lag("ms", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
      .withColumn("sess_no", sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("sess_no").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  private def evAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = tbl(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
    val signups = ev.filter(col("event_type") === "signup")
    AsOf.asOfJoin(purchases, signups, "user_id", "ts", "event_id", "value")
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("purchase_value"),
        round(col("asof_value"), 2).as("asof_value"))
  }

  private def sExcludeSeen(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val seen = docs.filter(pmod(col("doc_id"), lit(7)) === 0).select("doc_id")
    ScanOps.excludeSeen(docs, seen, "doc_id").select("doc_id", "lang")
  }

  private def sChangedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val prior = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(4)) === 2, md5(lit("stale")))
          .otherwise(md5(col("text"))).as("prior_hash"))
    ScanOps.changedDocs(docs, prior, "doc_id", "text").select("doc_id", "content_hash")
  }

  private def sDocPerLine(s: SparkSession, dir: String): DataFrame =
    ScanOps.docPerLine(tbl(s, dir, "documents").filter(col("doc_id") < 50),
        "doc_id", "text", " ")
      .select(col("line_id"), col("line_no").cast("long").as("line_no"), col("line"))

  private def tFieldOps(s: SparkSession, dir: String): DataFrame = {
    var df = tbl(s, dir, "documents")
    df = Transforms.copyField(df, "lang", "lang_copy")
    df = Transforms.setStaticValue(df, "pipeline_version", "v1")
    df = Transforms.template(df, "tag", col("source"), lit(":"), col("lang"))
    df = Transforms.trimValues(df, "lang_copy")
    df.select("doc_id", "lang_copy", "pipeline_version", "tag")
  }

  private def tRegexReplace(s: SparkSession, dir: String): DataFrame =
    Transforms.regexReplace(tbl(s, dir, "documents"), "text", "batch", "BATCH",
        into = Some("replaced"), discardUnmatched = true)
      .select(col("doc_id"), substring(col("replaced"), 1, 60).as("snippet"))

  private def tDatetimeReformat(s: SparkSession, dir: String): DataFrame =
    Transforms.reformatDateTime(tbl(s, dir, "events"), "ts", "iso_ts")
      .select("event_id", "iso_ts")

  private def tReadableSize(s: SparkSession, dir: String): DataFrame =
    Transforms.readableFileSize(
        tbl(s, dir, "documents").withColumn("bytes", col("n_chars") * lit(31013L)),
        "bytes")
      .select("doc_id", "readable_size", "readable_size_num", "readable_size_units")

  private def tUrlEncode(s: SparkSession, dir: String): DataFrame =
    Transforms.urlEncodeField(
        tbl(s, dir, "documents").withColumn("snippet", substring(col("text"), 1, 40)),
        "snippet", "encoded")
      .select("doc_id", "encoded")

  private def tTemplate(s: SparkSession, dir: String): DataFrame =
    Transforms.fieldTemplate(tbl(s, dir, "documents"), "summary",
        "[${lang}] ${source} has ${n_chars} chars")
      .select("doc_id", "summary")

  /** FetchUrl plumbing over the deterministic stub kernel (no egress
    * here): URL construction, host-partitioned fetch, status/body/
    * error channels — all mirrored in plain SQL by the oracle. */
  private def tFetchUrl(s: SparkSession, dir: String): DataFrame = {
    val urls = tbl(s, dir, "documents").withColumn("url",
      concat(lit("http://h"), pmod(col("doc_id"), lit(5)),
        lit(".example/"), col("doc_id")))
    Transforms.fetchUrl(urls, "url")
      .select(col("doc_id"), col("url"),
        col("http_status").cast("long").as("http_status"),
        col("body").cast("string").as("body_str"), col("fetch_error"))
  }

  private def sChildDocs(s: SparkSession, dir: String): DataFrame =
    ScanOps.childDocs(tbl(s, dir, "documents").filter(col("doc_id") < 40),
        "doc_id", split(col("text"), " "))
      .select(col("child_id"), col("doc_id"),
        col("child_no").cast("long").as("child_no"), col("child"))

  private def sXmlExtract(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // XML assembled from table columns, then REALLY parsed back out by
    // from_xml — the oracle knows the expected round-trip values
    val xml = tbl(s, dir, "documents").withColumn("xml",
      concat(lit("<doc id=\""), col("doc_id"), lit("\"><meta><lang>"), col("lang"),
        lit("</lang><source>"), col("source"), lit("</source></meta><len>"),
        col("n_chars"), lit("</len></doc>")))
    val schema = StructType(Seq(
      StructField("_id", LongType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("source", StringType)))),
      StructField("len", LongType)))
    ScanOps.xmlExtract(xml, "xml", schema, Map(
      "_id" -> "xml_id", "meta.lang" -> "xml_lang",
      "meta.source" -> "xml_source", "len" -> "xml_len"))
      .select("doc_id", "xml_id", "xml_lang", "xml_source", "xml_len")
  }

  private def rRouteByField(s: SparkSession, dir: String): DataFrame = {
    val branches = Routing.routeByField(tbl(s, dir, "documents"), "lang",
      branchValues = Seq("en", "fr", "de"))
    val tagged = branches.toSeq.sortBy(_._1).map { case (v, bdf) =>
      bdf.withColumn("branch", lit(v))
    }
    Routing.merge(tagged).groupBy("branch").agg(count(lit(1)).as("n_docs"))
  }

  private def rBranchCounts(s: SparkSession, dir: String): DataFrame =
    Routing.branchCounts(tbl(s, dir, "events"), "event_type")

  /** Dedup key: first 8 analyzer tokens (boilerplate-prefix dedup). */
  private def withDedupKey(df: DataFrame): DataFrame =
    df.withColumn("k", array_join(slice(Dedup.tokens(col("text")), 1, 8), " "))

  private def dExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(withDedupKey(tbl(s, dir, "documents")), "doc_id", "k")

  private def dExactRows(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDedupRows(withDedupKey(tbl(s, dir, "documents")), "doc_id", "k")
      .select("doc_id")

  private def dMinhashSig(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashSignaturesPoly(tbl(s, dir, "documents"), "doc_id", "text")

  private def dMinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashNearDups(tbl(s, dir, "documents"), "doc_id", "text",
      threshold = 0.5, crossEngine = true)

  private def dSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashPoly(tbl(s, dir, "documents"), "doc_id", "text")

  /** SimHash near-dup PAIRS through the production chunk-banding join
    * (Manku-style: Hamming ≤ 3 ⇒ one of four 8-bit chunks matches
    * exactly), over oracle-mirrorable 32-bit polynomial fingerprints —
    * gates the banding/join construction itself, which `d_simhash`
    * (fingerprints only) does not reach. Doc subset keeps the
    * candidate set bounded (the 31-word synthetic vocabulary makes
    * many fingerprints collide corpus-wide). */
  private def dSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val fp = Dedup.simHashPoly(
        tbl(s, dir, "documents").filter(col("doc_id") < 200), "doc_id", "text",
        bits = 32)
      .withColumnRenamed("doc_id", "id")
    Dedup.simHashNearDupsFrom(fp, bits = 32, nChunks = 4, maxHammingDistance = 3)
      .select("id_a", "id_b", "hamming")
  }

  private def dNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val pairs = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
    Dedup.ngramJaccard(docs, "doc_id", "text", pairs)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-dup clustering: connected components over the simhash pair
    * graph (the exact d_simhash_pairs construction) — pair lists
    * become dedup groups, component = smallest reachable doc id,
    * which the oracle reproduces with a recursive transitive
    * closure. */
  private def dNeardupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupComponents(dSimhashPairs(s, dir))

  /** The deduplicated corpus view — the end artifact of the pair →
    * cluster → survivor pipeline: every document of the pair-graph
    * subset with its component (own id when unpaired) and
    * keep = "this doc is its component's representative". */
  private def dNeardupSurvivors(s: SparkSession, dir: String): DataFrame = {
    val comp = Dedup.nearDupComponents(dSimhashPairs(s, dir))
      .withColumnRenamed("id", "doc_id")
    tbl(s, dir, "documents").filter(col("doc_id") < 200)
      .select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        (coalesce(col("component"), col("doc_id")) === col("doc_id")).as("keep"))
  }

  /** Paragraph-level exact dedup over 2-token chunks: the synthetic
    * 31-word vocabulary makes 2-token chunks collide densely (within
    * and across documents), so the gate exercises real drops —
    * election, survivor filtering, and reassembly all verified by the
    * oracle's identical construction. Production default is wider
    * chunks (or newline paragraphs); the width only changes the unit. */
  private def dChunkDedup(s: SparkSession, dir: String): DataFrame =
    Dedup.chunkDedup(tbl(s, dir, "documents"), "doc_id", "text",
      chunkTokens = 2)

  private def dEmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings").filter(col("vec_id") < 300)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("v_a"), col("v_b")), 4).as("cosine"))
      .filter(col("cosine") >= 0.25)
  }

  /** The PRODUCTION embedding near-dup path — SRP-bucketed candidate
    * join, never all-pairs ([[Dedup.embeddingNearDups]]); the oracle
    * reproduces the hyperplane buckets arithmetically and joins inside
    * them, so the bucketed-join construction itself is gate-verified
    * (d_embedding_neardup keeps the all-pairs oracle as the recall
    * baseline on the same subset). */
  private def dEmbeddingNeardupLsh(s: SparkSession, dir: String): DataFrame = {
    val e = tbl(s, dir, "embeddings").filter(col("vec_id") < 300)
    Dedup.embeddingNearDups(e, "vec_id", "embedding",
        threshold = 0.25, planes = 6)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Benchmark decontamination: docs sharing a word 5-gram with the
    * deterministic "benchmark" subset (doc_id % 7 = 0). The string
    * (non-hashed) n-gram form so the DuckDB oracle joins the raw
    * n-grams through the same explode → join → count construction;
    * the spec pins hashNgrams=true equality. */
  private def dDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    Dedup.decontaminate(
      docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
      docs.filter(pmod(col("doc_id"), lit(7)) === 0),
      "doc_id", "text", n = 5, hashNgrams = false)
  }

  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    tbl(s, dir, "embeddings").filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray

  private def simBruteforceTopk(s: SparkSession, dir: String): DataFrame = {
    val q = queryVec(s, dir)
    Similarity.bruteForceTopK(tbl(s, dir, "embeddings"), "vec_id", "embedding", q, 20)
      .select(col("rank").cast("long").as("rank"), col("id"), col("cosine"))
  }

  // ---- persisted similarity indexes (built once per sf dir, memoized;
  // the gate queries run against the bucket-partitioned tables, so the
  // query-side plan is a partition-pruned scan — SimilarityIndexSpec
  // pins the pruning) ----
  private val SimCacheVersion = 4 // v4: gate IVF path trains on a kmeansTrainLimit hash sample (the 100 TB setting)
  private val builtSim = scala.collection.mutable.Set[String]()

  private def ensureSimIndex(kind: String, sfDir: String)
                            (build: String => Unit): String = synchronized {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    val out = s"/tmp/graft_${kind}_v$SimCacheVersion/$name"
    if (!builtSim.contains(out)) {
      val marker = java.nio.file.Paths.get(out, "_built")
      if (!java.nio.file.Files.exists(marker)) {
        build(out)
        java.nio.file.Files.createFile(marker)
      }
      builtSim += out
    }
    out
  }

  /** Rank the ≤ k probed hits. The constant-zero partition key
    * ([[Similarity.constantZeroKey]]: non-foldable in both
    * nullability cases, null-proof) is semantically the empty spec
    * (all rows in one partition — they already are: only k rows
    * survive the limit) but keeps WindowExec's "No Partition Defined"
    * warning out of the logs, so a REAL unpartitioned-window
    * regression stands out. */
  private def rankTopK(df: DataFrame): DataFrame =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(Similarity.constantZeroKey(col("id")))
          .orderBy(col("cosine").desc, col("id").asc)).cast("long"))
      .select("rank", "id", "cosine")

  private def simAnnTopk(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureSimIndex("ann", dir)(out =>
      Similarity.annBuild(tbl(s, dir, "embeddings"), "vec_id", "embedding", out,
        planes = 6))
    rankTopK(Similarity.annQuery(s, idx, queryVec(s, dir), 20))
  }

  /** IVF through the REFINED path AT THE 100 TB SETTING: one
    * deterministic spherical k-means iteration trained on a
    * `kmeansTrainLimit` hash-ordered sample (256 < every sf's corpus,
    * so the sampling genuinely bites), while the final assignment map
    * still covers the full corpus. The oracle recomputes the identical
    * centroids — same hash-ordered training sample, same id-ordered
    * recenter fold — so both the bounded-training path and the
    * refinement arithmetic are gate-verified end-to-end. */
  private def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureSimIndex("ivf", dir)(out =>
      Similarity.ivfBuild(tbl(s, dir, "embeddings"), "vec_id", "embedding", out,
        numCentroids = 64, kmeansIters = 1, kmeansTrainLimit = 256))
    rankTopK(Similarity.ivfQuery(s, idx, queryVec(s, dir), 20, nprobe = 3))
  }

  /** Shared upsert gate fixture over the embeddings table:
    * (initial subset, one upsert batch, deletion set). The batch (a)
    * inserts the held-out third, (b) re-upserts some surviving ids
    * with REVERSED vectors — same norm, different direction, so rows
    * genuinely MOVE buckets — and (c) the deletion set drops every
    * 7th subset id. Mirrored arithmetically by the upsert oracles. */
  private def upsertFixture(e: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val m3 = pmod(col("vec_id"), lit(3)); val m5 = pmod(col("vec_id"), lit(5))
    val m7 = pmod(col("vec_id"), lit(7))
    val initial = e.filter(m3 =!= 0)
    val upserts = e.filter(m3 === 0).select(col("vec_id"), col("embedding"))
      .unionByName(e.filter(m3 =!= 0 && m5 === 1 && m7 =!= 0)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding")))
    val deletes = e.filter(m3 =!= 0 && m7 === 0).select(col("vec_id").as("id"))
    (initial, upserts, deletes)
  }

  /** The journaled join-based upsert path, gate-verified end-to-end
    * (the IVF analog of `ft_incremental`): build the persisted index
    * over the deterministic SUBSET (raw hash-sampled centroids), then
    * apply [[upsertFixture]]'s batch. The oracle is a fresh assignment
    * of the FINAL corpus to the SUBSET-build centroids, so any stale
    * copy, ghost row, missed move, or missed delete hash-mismatches. */
  private def simIvfUpsert(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureSimIndex("ivfup", dir) { out =>
      val (initial, upserts, deletes) = upsertFixture(tbl(s, dir, "embeddings"))
      Similarity.ivfBuild(initial, "vec_id", "embedding", out,
        numCentroids = 64, kmeansIters = 0)
      Similarity.ivfUpsertDF(upserts, "vec_id", "embedding", out, deletes)
    }
    rankTopK(Similarity.ivfQuery(s, idx, queryVec(s, dir), 20, nprobe = 3))
  }

  /** The SAME journaled upsert machinery through the SRP index
    * (bucket = hyperplane hash instead of nearest centroid): subset
    * build → [[upsertFixture]] batch → Hamming-1 multi-probe query.
    * Oracle = fresh SRP assignment of the final corpus. */
  private def simAnnUpsert(s: SparkSession, dir: String): DataFrame = {
    val idx = ensureSimIndex("annup", dir) { out =>
      val (initial, upserts, deletes) = upsertFixture(tbl(s, dir, "embeddings"))
      Similarity.annBuild(initial, "vec_id", "embedding", out, planes = 6)
      Similarity.annUpsertDF(upserts, "vec_id", "embedding", out, deletes)
    }
    rankTopK(Similarity.annQuery(s, idx, queryVec(s, dir), 20))
  }

  private def taLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.languageId(tbl(s, dir, "documents"), "text")
      .select("doc_id", "lang_pred")

  private def taQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(tbl(s, dir, "documents"), "text")
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
        col("mean_token_len"), col("punct_ratio"), col("stopword_ratio"),
        col("quality_ok"))

  private def taTokenCounts(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(tbl(s, dir, "documents"), "text")
      .select("doc_id", "ws_tokens", "bpeish_tokens")

  /** Raw ratio doubles, no rounding: both engines divide the same
    * exact ints, so the doubles are bit-identical (the ta_quality
    * precedent); cross-engine decimal rounding is the riskier op. */
  private def taRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionSignals(tbl(s, dir, "documents"), "text")
      .select("doc_id", "dup_token_frac", "top_token_frac",
        "dup_bigram_frac", "repetition_ok")

  /** Pattern scrubbing over the closed synthetic vocabulary (the PII
    * presets can't hit a corpus with no emails/URLs/digits — the spec
    * covers those; the gate entry proves the replace+count machinery
    * on patterns with real hits). */
  private def taScrub(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.scrub(tbl(s, dir, "documents"), "text",
        pattern = "\\b(customer|key|order)\\b", replacement = "[REDACTED]")
      .select("doc_id", "scrubbed", "n_redactions")

  private def taFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(tbl(s, dir, "documents"), "text")
      .select("doc_id", "fingerprint")

  private def taRollingHash(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("rh"))

  private def pPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val survivors = Dedup.exactDedupRows(docs, "doc_id", "text")
    val scored = TextAnalysis.qualityScore(survivors, "text").filter(col("quality_ok"))
    TextAnalysis.languageId(scored, "text")
      .groupBy("source", "lang_pred").agg(count(lit(1)).as("n_docs"))
  }

  /** Deterministic stratified sampling (data mixing): 50 % of src0 and
    * src1, 20 % of everything else, by cross-engine id-hash bucket —
    * the oracle reproduces the polynomial hash arithmetic, so the
    * sample SET (not just its size) is verified. */
  private def pSampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(tbl(s, dir, "documents"), "source", "doc_id",
        Map("src0" -> 0.5, "src1" -> 0.5), defaultFraction = 0.2,
        crossEngine = true)
      .select("doc_id", "source")

  /** Sequence packing (concat-and-chunk): per-source shards, ascending
    * doc_id, ws-token prefix sums cut into 512-token bins. */
  private def pPack(s: SparkSession, dir: String): DataFrame =
    Packing.packByBudget(
        TextAnalysis.tokenCounts(tbl(s, dir, "documents"), "text"),
        "source", "doc_id", "ws_tokens", budget = 512)
      .select("doc_id", "source", "tokens_before", "bin", "bin_offset")

  /** Per-domain document caps (the Gopher/FineWeb crawl-pipeline
    * stage): at most 30 docs per source, kept by (n_chars desc,
    * doc_id asc) — one group-partitioned rank window, mirrored by the
    * oracle's QUALIFY. */
  private def pDomainCap(s: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(tbl(s, dir, "documents"), "source",
        Seq(col("n_chars").desc, col("doc_id").asc), 30)
      .select("doc_id", "source")

  /** Temperature mixing: √-scaled per-stratum keep rates, realized by
    * a cross-engine hash uniform — bit-reproducible keep/drop. The
    * stratum is a length bucket (n_chars/100) because the synthetic
    * `source` groups are perfectly uniform (all rates would be 1.0 and
    * nothing would drop); length buckets are genuinely skewed, so the
    * entry exercises real drops at both gate scales. */
  private def pTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .withColumn("stratum", (col("n_chars") / lit(100.0)).cast("long"))
    Sampling.temperatureMix(d, "doc_id", "stratum")
  }

  /** Spellcheck collation (Solr spellcheck.collate): 'dup windoq
    * sprak' → each term's best dictionary suggestion (distance asc,
    * df desc, term asc; in-dictionary terms are their own distance-0
    * suggestion) + the corrected query's boolean hit count. */
  private def ftCollate(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.collate("dup windoq sprak", 2)
  }

  /** Bigram-LM perplexity filter (the Gopher/CCNet LM quality score):
    * add-0.1-smoothed corpus-trained bigram model, per-doc mean
    * negative log-likelihood — nll rounded to 6dp on both sides (the
    * per-doc mean's summation order differs across engines; 6dp is
    * far above the ~1e-13 reassociation noise). */
  private def taLmQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lmScores(tbl(s, dir, "documents"), "doc_id", "text", 0.1)
      .withColumn("nll", round(col("nll"), 6))

  // ---------- multimodal / scan extensions ----------

  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.demoMediaTable(s, tbl(s, dir, "documents"), "doc_id", "text")
    Multimodal.extractFeatures(media, nFeatures = 4)
      .select(col("media_id"),
        round(element_at(col("features"), 1).cast("double"), 3).as("f0"),
        round(element_at(col("features"), 4).cast("double"), 3).as("f3"))
  }

  private def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.demoMediaTable(s, tbl(s, dir, "documents"), "doc_id", "text")
      .join(tbl(s, dir, "documents").select(col("doc_id").as("media_id"), col("n_chars")), "media_id")
      .withColumn("media_meta", struct(
        lit("video").as("media_type"), lit("fake").as("format"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        (col("n_chars") * 10L).as("duration_ms")))
    Multimodal.sampleFrames(media, everyMs = 1000L)
      .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
        max("frame_ts_ms").as("last_ts_ms"))
  }

  private def sPreAnalyze(s: SparkSession, dir: String): DataFrame =
    ScanOps.preAnalyze(tbl(s, dir, "documents").filter(col("doc_id") < 50), "text")
      .select(col("doc_id"), explode(col("pre_analyzed")).as("tok"))
      .select(col("doc_id"), col("tok.t").as("t"),
        col("tok.s").cast("long").as("s"), col("tok.e").cast("long").as("e"))

  // ---------- fulltext engine ----------

  private def ftDocStats(s: SparkSession, dir: String): DataFrame =
    FtIndex.docStats(s, dir)

  private def ftDictionary(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensure(s, dir)
    s.read.parquet(graft.index.IndexBuilder.dictionaryDir(idx))
      .select(col("term"), col("df").cast("long").as("df"), col("cf").cast("long").as("cf"))
  }

  private def ftCorpusStats(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensure(s, dir)
    s.read.parquet(graft.index.IndexBuilder.corpusStatsDir(idx))
      .select(col("n_docs"), round(col("avgdl"), 6).as("avgdl"), col("n_terms"))
  }

  /** Top-20 as (rank, doc_id, score): k large enough to capture every
    * matching doc, so the rounded re-rank is over the complete
    * candidate set (oracle-exact); doc_id parsed back from conv_id. */
  private def bm25Top20DF(s: SparkSession, rdr: graft.query.IndexReader,
                          query: String): DataFrame = {
    import s.implicits._
    val ranked = rdr.searchRanked(query, 1000000)
      .map { r =>
        val origId = r.conv_id.substring(4).toLong
        val scoreR = BigDecimal(r.score)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (origId, scoreR)
      }
      .sortBy { case (id, sc) => (-sc, id) }
      .take(20).zipWithIndex
      .map { case ((id, sc), i) => ((i + 1).toLong, id, sc) }
    ranked.toDF("rank", "doc_id", "score")
  }

  private def ftBm25Topk(s: SparkSession, dir: String): DataFrame =
    bm25Top20DF(s, FtIndex.reader(s, dir), FtQuery)

  /** BM25 over the incrementally-maintained index (base build →
    * update/delete/append delta → must equal plain SQL over the final
    * documents corpus). */
  private def ftIncremental(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureIncremental(s, dir)
    bm25Top20DF(s, new graft.query.IndexReader(s, idx), FtQueryInc)
  }

  /** BM25 over the same delta'd fixture AFTER an explicit staging
    * compaction (overlays folded into a fresh base): the compact is
    * content-preserving, so the oracle is the identical final-corpus
    * SQL — a compact that dropped, duplicated, or ghosted any row
    * hash-mismatches. */
  private def ftCompacted(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureCompacted(s, dir)
    bm25Top20DF(s, new graft.query.IndexReader(s, idx), FtQueryInc)
  }

  /** BM25 over the atomically-patched index (Solr atomic update
    * driven through the delta machinery: a ~2% id band got
    * `text || " patched dup"` via Incremental.atomicSet) — must equal
    * plain SQL over the CASE-patched corpus. */
  private def ftAtomicUpdate(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureAtomic(s, dir)
    bm25Top20DF(s, new graft.query.IndexReader(s, idx), FtQuery)
  }

  /** QueryHits → top-20 (rank, doc_id, score) with 4-decimal rounding;
    * engine docIDs equal original doc_ids on this corpus (dense,
    * conv_id zero-padded), so results are oracle-mirrorable. */
  private def hitsTop20DF(s: SparkSession,
                          hits: Seq[graft.model.QueryHit]): DataFrame = {
    import s.implicits._
    hits.map { h =>
        val scoreR = BigDecimal(h.score)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (h.doc_id, scoreR)
      }
      .sortBy { case (id, sc) => (-sc, id) }
      .take(20).zipWithIndex
      .map { case ((id, sc), i) => ((i + 1).toLong, id, sc) }
      .toDF("rank", "doc_id", "score")
  }

  private def ftBm25Filtered(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchWhere(FtQuery, pmod(col("doc_id"), lit(3)) === 0, 1000000))
  }

  /** Boolean query: both must-terms required, the not-term excluding —
    * the reference's Solr/Lucene boolean query shape. */
  private def ftBm25Boolean(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchBoolean("batch window", "dup", 1000000))
  }

  /** Prefix (trailing-wildcard) query: 's*' expands against the
    * dictionary (scan/slow/small/sort/spark/stream in this corpus's
    * closed vocabulary) and runs through the disjunctive WAND core
    * with per-term idfs — Lucene PrefixQuery under its
    * SCORING_BOOLEAN rewrite. */
  private def ftBm25Prefix(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchPrefix("s", 1000000))
  }

  /** Field collapsing (Solr collapse): the best hit per `source` plus
    * the group's match count, computed fully distributed over the
    * FULL scored match set (scoredDocs ⨝ documents → max_by) — the
    * match set never reaches the driver. Scores rounded BEFORE the
    * argmax (scoreKey) so engine and oracle pick identically. */
  private def ftCollapse(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.searchCollapse(FtQuery, tbl(s, dir, "documents"), "doc_id", "source",
      scoreKey = c => round(c, 4))
  }

  /** More-like-this (the Lucene/Solr MLT component): the 5 most
    * interesting terms of seed doc 0 (highest tf·idf within the seed,
    * selection score rounded to 4 decimals so both engines cut
    * identically) run through the disjunctive scorer, seed excluded.
    * The cap BINDS here (the seed holds 17-18 distinct terms), so the
    * entry proves selection, not just the downstream search. */
  private def ftMoreLikeThis(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.moreLikeThis(0L, 1000000, maxQueryTerms = 5))
  }

  /** Query-time boosting (Lucene `term^boost`): dup^2 window spark^0.5
    * — per-term idf scaling through the shared WAND core (bounds scale
    * with contributions, pruning stays lossless). Reorders the
    * ft_bm25_topk ranking, so the entry proves the boosts actually
    * reached the scorer. */
  private def ftBm25Boosted(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchBoosted(
      Seq("dup" -> 2.0, "window" -> 1.0, "spark" -> 0.5), 1000000))
  }

  /** Fuzzy query (Lucene FuzzyQuery): 'spork'~2 expands against the
    * dictionary by banded Levenshtein scan ({sort, spark} in this
    * corpus's closed vocabulary — distances 2 and 1) and runs through
    * the disjunctive WAND core with per-term idfs. Spark and DuckDB
    * share the same unit-cost levenshtein, so the oracle reproduces
    * the expansion with `levenshtein(term, 'spork') <= 2`. */
  private def ftBm25Fuzzy(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchFuzzy("spork", 2, 1000000))
  }

  /** Wildcard query (Lucene WildcardQuery): 's?a*' expands against
    * the dictionary ({scan, small, spark} in this corpus's closed
    * vocabulary — a PROPER subset of the 's' prefix family, so the
    * entry proves the mid-pattern constraint bound) and runs through
    * the disjunctive WAND core with per-term idfs. The literal
    * prefix 's' pushes to Parquet; the oracle mirrors the expansion
    * with RE2 `regexp_matches(term, '^s.a.*$')` — same anchored
    * regex Spark's rlike evaluates. */
  private def ftBm25Wildcard(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchWildcard("s?a*", 1000000))
  }

  /** Result grouping (Solr group.field/group.limit): the top 3 hits
    * per `source` over the FULL scored match set — the perGroup > 1
    * generalization of ft_collapse, scores rounded BEFORE the group
    * rank so both engines select identically. */
  private def ftGroupTopK(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.searchGroupTopK(FtQuery, tbl(s, dir, "documents"), "doc_id", "source",
      perGroup = 3, scoreKey = c => round(c, 4))
  }

  /** Deep paging (Solr cursorMark): PAGE 2 of the flagship query —
    * the cursor is page 1's last (rounded score, doc_id) hit, and the
    * page-2 hits are ranked 1-20 within the page. Scores rounded to
    * 4dp on BOTH sides before the cursor compare so the cursor means
    * the same thing to both engines; the oracle selects absolute
    * ranks 21-40 and re-ranks them. Proves the cursor filter skips
    * exactly one page — no overlap, no gap. */
  private def ftSearchAfter(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    val r4 = (c: org.apache.spark.sql.Column) => round(c, 4)
    val page1 = rdr.searchAfter(FtQuery, 20, None, scoreKey = r4)
    val cur = page1.last
    hitsTop20DF(s,
      rdr.searchAfter(FtQuery, 20, Some((cur.score, cur.doc_id)), scoreKey = r4))
  }

  /** Highlighting (the Solr highlighter): the flagship top-20 with a
    * 10-token snippet of the stored text around the first query-term
    * hit, matched terms wrapped in `<em>` — selection identical to
    * ft_bm25_topk (rounded + re-ranked), snippets computed as column
    * expressions over ONE id-filtered doc-store scan. The oracle
    * rebuilds each snippet with the same sentinel/least/slice/wrap
    * arithmetic over DuckDB's list functions. */
  private def ftHighlight(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    val ranked = hitsTop20DF(s, rdr.search(FtQuery, 1000000))
    val ids = ranked.select("doc_id").collect().map(_.getLong(0)).toSeq
    ranked.join(rdr.snippets(FtQuery, ids, 10), Seq("doc_id"))
      .select("rank", "doc_id", "score", "snippet")
  }

  /** Facet queries (Solr facet.query): three named boolean subqueries'
    * match-set counts side by side — arbitrary-predicate facet buckets
    * (each an independent distributed count, unioned). */
  private def ftFacetQuery(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetQueries(Seq(
      ("dup_and_window", "dup window", ""),
      ("spark_not_dup", "spark", "dup"),
      ("all_three", FtQuery, "")))
  }

  /** First 20 rows of an ALREADY-ORDERED (doc_id, score) serving
    * DataFrame, with driver-assigned ranks — the DataFrame siblings
    * of hitsTop20DF. */
  private def rankTop20DF(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    df.as[(Long, Double)].collect().take(20).zipWithIndex
      .map { case ((id, sc), i) => ((i + 1).toLong, id, sc) }
      .toSeq.toDF("rank", "doc_id", "score")
  }

  /** Function-query boosting (Solr boost=): flagship scores times
    * ln(1 + n_chars) — a per-DOCUMENT metadata boost outside the WAND
    * core (vs ft_bm25_boosted's per-term weights inside it). Rounded
    * AFTER the multiply on both sides. */
  private def ftBoostByField(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rankTop20DF(s, rdr.searchBoostBy(FtQuery, tbl(s, dir, "documents"),
      "doc_id", log(lit(1.0) + col("n_chars")), 1000000,
      scoreKey = c => round(c, 4)))
  }

  /** Re-ranking (Solr ReRankQParser): the flagship top-50 re-ordered
    * by score + 2·score("merge vector"), unmatched rescore docs keep
    * their base score — both cutoffs on 4dp-rounded scores so the
    * engines cut identically. */
  private def ftRerank(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rankTop20DF(s, rdr.rerank(FtQuery, "merge vector", 50, 2.0, 20,
      scoreKey = c => round(c, 4)))
  }

  /** Term vectors (Solr TermVectorComponent): (term, tf, df) rows for
    * docs 0-2 — tf recomputed from stored text, df joined from the
    * index dictionary, so the entry cross-checks the dictionary's df
    * against the oracle's from-scratch count. */
  private def ftTermVectors(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.termVectors(Seq(0L, 1L, 2L))
  }

  /** Query elevation (Solr QueryElevationComponent): docs 42 then 7
    * pinned ahead of the flagship organic ranking — scores 4dp-rounded
    * before the cut, elevated-but-unmatched docs surface with score 0
    * (none in this corpus at gate scales; the spec pins that case on a
    * fixture). Rank assigned positionally from the engine's final
    * order, which the oracle reproduces with an elevation-first sort. */
  private def ftElevate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rdr = FtIndex.reader(s, dir)
    rdr.elevate(FtQuery, Seq(42L, 7L), 20, scoreKey = c => round(c, 4))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        ((i + 1).toLong, r.getLong(0), r.getDouble(1), r.getBoolean(2)) }
      .toDF("rank", "doc_id", "score", "elevated")
  }

  /** Keyword extraction (MoreLikeThis interesting-terms / tv.tf_idf):
    * top-5 stored-text terms per doc by tf·ln(N/df) for docs 0-4,
    * 4dp-rounded before the per-doc cut, ties term-ascending. */
  private def ftKeywords(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.keywords(Seq(0L, 1L, 2L, 3L, 4L), 5)
  }

  /** Unigram token entropy (lexical diversity), 6dp-rounded. */
  private def taEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenEntropy(tbl(s, dir, "documents"), "doc_id", "text")
      .withColumn("entropy", round(col("entropy"), 6))

  /** Realtime get (Solr RTG): stored docs fetched by id from the
    * delta-maintained index — reads THROUGH the update/append overlays
    * (an updated doc returns post-update text, an appended doc is
    * present), mirroring RTG's see-latest-without-commit semantics.
    * Ids picked by scale-independent fractions: 0 (unchanged), n/5
    * (updated by the delta), 9n/10 and n−1 (appended); the oracle
    * computes the same ids from count(*). */
  private def ftRtg(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureIncremental(s, dir)
    val n = tbl(s, dir, "documents").count()
    val ids = Seq(0L, n / 5, (n * 9) / 10, n - 1)
    // filter on the STORED conv_id (pushes into the parquet scan via
    // min/max stats), not the derived origId — a by-id get must never
    // decode the whole doc store
    val convIds = ids.map(id => f"doc-$id%010d")
    graft.index.IndexBuilder.readDocs(s, idx)
      .filter(col("conv_id").isInCollection(convIds))
      .select(FtIndex.origId(col("conv_id")).as("doc_id"), col("text"))
  }

  /** Sharded export round trip: write the corpus as 8 deterministic
    * parquet shards, read it BACK, and summarize per shard (count +
    * content-hash sum) — the oracle computes the same summary from
    * the source table, so any row lost, duplicated, or corrupted by
    * the write/read crossing hash-mismatches. The one gate entry that
    * exercises a user-facing WRITE path. */
  private def pExportShards(s: SparkSession, dir: String): DataFrame = {
    val out = "/tmp/graft_export_" +
      dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
    Export.exportShards(docs, "doc_id", out, 8)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(Hashing.polyHash(col("text"))).as("content_sum"))
  }

  /** Query-time synonym expansion (Lucene SynonymQuery): groups
    * (scan|sort) and (merge|join) each score as ONE virtual term —
    * member tfs summed before the saturation curve, idf from the max
    * member df — which a plain OR of the members cannot reproduce. */
  private def ftBm25Synonyms(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rankTop20DF(s,
      rdr.scoredDocsSynonyms(Seq(Seq("scan", "sort"), Seq("merge", "join")))
        .withColumn("score", round(col("score"), 4))
        .orderBy(col("score").desc, col("doc_id").asc).limit(20))
  }

  /** LM Dirichlet similarity (Solr's per-field similarity alternative,
    * LMDirichletSimilarity): the flagship terms scored by the
    * Dirichlet-smoothed language model instead of BM25 — proves the
    * second scorer end-to-end over the same postings/dictionary/cf
    * artifacts, 4dp-rounded before the cut like every scored entry. */
  private def ftLmDirichlet(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rankTop20DF(s, rdr.scoredDocsDirichlet(FtQuery, mu = 500.0)
      .withColumn("score", round(col("score"), 4))
      .orderBy(col("score").desc, col("doc_id").asc).limit(20))
  }

  /** Join query (Solr {!join}): every doc sharing a `source` with any
    * 'dup AND window' boolean match — match set → distinct join keys
    * → semi-join back onto the metadata. */
  private def ftJoinQuery(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.searchJoin("dup window", "", tbl(s, dir, "documents"), "doc_id", "source")
  }

  /** Term enumeration (Solr terms component): the 15 most frequent
    * 's'-prefixed dictionary terms with their dfs — cross-checks the
    * dictionary df against the oracle's from-scratch count at a
    * deterministic (df desc, term asc) cut. */
  private def ftTerms(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.terms("s", 15)
  }

  /** Query-string parsing + dispatch (the Lucene classic syntax the
    * reference's Solr users type): 'dup^2 wind* sprak~2 spark' — a
    * boosted term, a wildcard expansion, a fuzzy expansion, and a
    * plain term, accumulated into ONE disjunctive query with per-term
    * boosts SUMMED across clauses (spark gets 1+1 from fuzzy+plain:
    * Lucene's additive clause scoring). The oracle rebuilds the
    * accumulation with a UNION ALL candidate table. */
  private def ftQueryString(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchParsed("dup^2 wind* sprak~2 spark", 1000000))
  }

  /** Minimum-should-match query (the Solr/Lucene `mm` parameter): at
    * least 2 of the 3 query terms required, scored over the matching
    * terms only — between the pure disjunction (ft_bm25_topk) and the
    * full conjunction (ft_bm25_boolean). */
  private def ftBm25Mm(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchMinShouldMatch(FtQuery, 2, 1000000))
  }

  /** Phrase query (ordered adjacency; Lucene PhraseQuery scoring:
    * tf = phrase frequency, idf = Σ term idfs). */
  private def ftBm25Phrase(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchPhrase("batch window", 1000000))
  }

  /** Unordered proximity (SpanNearQuery inOrder=false): window and
    * batch within 3 positions in EITHER order, pf anchored on
    * 'window' occurrences — matches docs the ordered entry can't
    * (batch after window), so the pair proves the order flag. */
  private def ftBm25NearUnordered(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchNearUnordered("window", "batch", 2, 1000000))
  }

  /** Ordered proximity query (SpanNearQuery inOrder): "batch window"~2
    * — 'window' within 3 positions after 'batch'. Matches a strict
    * SUPERSET of ft_bm25_phrase's docs (slop 0 ⊂ slop 2), so the entry
    * proves the slop bound actually widens the span window; scoring is
    * the phrase scorer with tf = span count. */
  private def ftBm25Near(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    hitsTop20DF(s, rdr.searchNear("batch window", 2, 1000000))
  }

  /** BM25 over an index built with the NON-DEFAULT v1+stop analysis
    * chain (the mirrorable half of the reference's text_en): stopword
    * removal changes dl/avgdl, so a build that silently ignored the
    * chain hash-mismatches the stop-filtered oracle. */
  private def ftBm25Stop(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureStop(s, dir)
    bm25Top20DF(s, new graft.query.IndexReader(s, idx), FtQuery)
  }

  /** BM25 over an index built with the FULL text_en-analog chain
    * (v1+stop+stem — the reference's `preanalyze/conf/schema.xml:39-60`
    * fieldType). Every query term changes under stemming, so the
    * entry proves the stem stage ran on BOTH the build and query
    * sides; the oracle maps corpus tokens through the engine's
    * (token → stem) vocabulary map. */
  private def ftBm25Stem(s: SparkSession, dir: String): DataFrame = {
    val idx = FtIndex.ensureStem(s, dir)
    bm25Top20DF(s, new graft.query.IndexReader(s, idx), FtQueryStem)
  }

  /** Mixed-shape batched serving through ONE Spark job
    * ([[graft.query.IndexReader.searchManyMixed]]): a free-text, a
    * boolean, a phrase, a minimum-should-match, a prefix, and a
    * fuzzy query answered together — the gate entry for the
    * batching/θ-bookkeeping layer itself (the per-shape entries cover
    * the kernels). k is oracle-exhaustive; per query the rounded
    * re-rank keeps the top 20, exactly like the per-shape entries,
    * and the oracle is their UNION ALL tagged by query_id. */
  private def ftBm25Mixed(s: SparkSession, dir: String): DataFrame = {
    import graft.query.QuerySpec
    import s.implicits._
    val rdr = FtIndex.reader(s, dir)
    val batch = Seq(
      "free" -> QuerySpec.Free(FtQuery),
      "bool" -> QuerySpec.Boolean("batch window", "dup"),
      "phrase" -> QuerySpec.Phrase("batch window"),
      "mm" -> QuerySpec.MinMatch(FtQuery, 2),
      "prefix" -> QuerySpec.Prefix("s"),
      "fuzzy" -> QuerySpec.Fuzzy("spork", 2))
    rdr.searchManyMixed(batch, 1000000)
      .groupBy(_._1).toSeq.flatMap { case (qid, hits) =>
        hits.map { case (_, _, id, sc) =>
          (id, BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
          .sortBy { case (id, sc) => (-sc, id) }
          .take(20).zipWithIndex
          .map { case ((id, sc), i) => (qid, (i + 1).toLong, id, sc) }
      }
      .toDF("query_id", "rank", "doc_id", "score")
  }

  /** Facet counts over a boolean query's FULL match set
    * ([[graft.query.IndexReader.facetCounts]]): search as a relational
    * operator — the match set never reaches the driver; it joins the
    * documents table and aggregates distributed. Engine docIds equal
    * original doc_ids on this corpus, so the join needs no id
    * translation. */
  private def ftFacets(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetCounts("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", "source")
  }

  /** Stats faceting (the Solr stats component) over the same boolean
    * match set as ft_facets: count + min/max/sum of `n_chars` per
    * source — one map-side-combinable hash aggregate after the
    * match-set ⨝ documents join; every stat is an exact integer
    * aggregate (the mean is sum_v / n_docs, caller-side). */
  private def ftFacetStats(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetStats("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", "source", "n_chars")
  }

  /** Block join (Lucene ToParentBlockJoinQuery, ScoreMode.Max):
    * flagship child matches roll up to parents (parent = id/10 — the
    * synthetic corpus has no natural block structure), parent score =
    * max child score, top-20 parents. Max of 4dp-rounded child scores
    * is exact cross-engine (no summation-order concern). */
  private def ftBlockJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rdr = FtIndex.reader(s, dir)
    val meta = tbl(s, dir, "documents")
      .select(col("doc_id"), (col("doc_id") / lit(10)).cast("long").as("parent_id"))
    rdr.searchParentsBlockJoin(FtQuery, meta, "doc_id", "parent_id",
        "max", 20, scoreKey = c => round(c, 4))
      .collect().toSeq.zipWithIndex
      .map { case (r, i) =>
        ((i + 1).toLong, r.getLong(0), r.getDouble(1), r.getLong(2)) }
      .toDF("rank", "parent_id", "score", "n_children")
  }

  /** Graph query (Solr {!graph}): BFS from the 'batch window -dup'
    * match set over a derived follow relation (d₂ follows d₁ when
    * d₂.t = d₁.f with f = id mod 37, t = (7·id+3) mod 37 — the
    * synthetic corpus has no natural doc-to-doc edge field), 3 hops,
    * depth = first reach. The oracle is a bounded recursive closure
    * taking min(depth). */
  private def ftGraph(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    val m = tbl(s, dir, "documents").select(col("doc_id"),
      pmod(col("doc_id"), lit(37L)).as("f"),
      pmod(col("doc_id") * 7 + 3, lit(37L)).as("t"))
    rdr.graphTraverse("batch window", "dup", m, "doc_id", "f", "t", 3)
  }

  /** Stats percentiles (Solr stats.percentiles): exact p50/p95 of
    * n_chars per source over the same match set as ft_facet_stats. */
  private def ftFacetStatsPct(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetPercentiles("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", "source", "n_chars")
  }

  /** Pivot faceting (Solr facet.pivot): match-set counts per
    * (source, lang) combination — the flat relational form of the
    * nested pivot tree, same single aggregate as ft_facets. */
  private def ftFacetPivot(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetPivot("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", Seq("source", "lang"))
  }

  /** Range faceting (Solr facet.range): width-100 bins of n_chars
    * over the match set, empty bins absent (mincount=1). */
  private def ftFacetRange(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.facetRange("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", "n_chars", 0L, 100L)
  }

  /** Sorted-by-field serving (Solr `sort=n_chars desc`): the 20
    * longest matching documents, doc_id tie-break — TakeOrdered over
    * the match-set ⨝ metadata join, never a relevance score. */
  private def ftSortByField(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.searchSortBy("batch window", "dup",
      tbl(s, dir, "documents"), "doc_id", "n_chars", asc = false, 20)
  }

  /** Spellcheck / suggest (Solr spellcheck): closest dictionary terms
    * to 'par' — {part d=1, a d=2, spark d=2} in this corpus's closed
    * vocabulary — ordered (distance asc, df desc, term asc). */
  private def ftSuggest(s: SparkSession, dir: String): DataFrame = {
    val rdr = FtIndex.reader(s, dir)
    rdr.suggest("par", 2, 5)
  }

  // =====================================================================
  // Registry
  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q3_join_topn" -> (q3JoinTopn _),
    "q5_revenue" -> (q5Revenue _),
    "w_topn_per_group" -> (wTopnPerGroup _),
    "q_distinct_users" -> (qDistinctUsers _),
    "ev_hourly" -> (evHourly _),
    "ev_sliding" -> (evSliding _),
    "ev_sessions" -> (evSessions _),
    "ev_asof" -> (evAsof _),
    "s_exclude_seen" -> (sExcludeSeen _),
    "s_changed_docs" -> (sChangedDocs _),
    "s_doc_per_line" -> (sDocPerLine _),
    "t_field_ops" -> (tFieldOps _),
    "t_regex_replace" -> (tRegexReplace _),
    "t_datetime_reformat" -> (tDatetimeReformat _),
    "t_readable_size" -> (tReadableSize _),
    "t_url_encode" -> (tUrlEncode _),
    "t_template" -> (tTemplate _),
    "t_fetch_url" -> (tFetchUrl _),
    "s_child_docs" -> (sChildDocs _),
    "s_xml_extract" -> (sXmlExtract _),
    "r_route_by_field" -> (rRouteByField _),
    "r_branch_counts" -> (rBranchCounts _),
    "d_exact" -> (dExact _),
    "d_exact_rows" -> (dExactRows _),
    "d_minhash_sig" -> (dMinhashSig _),
    "d_minhash_pairs" -> (dMinhashPairs _),
    "d_simhash" -> (dSimhash _),
    "d_simhash_pairs" -> (dSimhashPairs _),
    "d_ngram_jaccard" -> (dNgramJaccard _),
    "d_chunk_dedup" -> (dChunkDedup _),
    "d_neardup_clusters" -> (dNeardupClusters _),
    "d_neardup_survivors" -> (dNeardupSurvivors _),
    "d_embedding_neardup" -> (dEmbeddingNeardup _),
    "d_embedding_neardup_lsh" -> (dEmbeddingNeardupLsh _),
    "d_decontaminate" -> (dDecontaminate _),
    "sim_bruteforce_topk" -> (simBruteforceTopk _),
    "sim_ann_topk" -> (simAnnTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "sim_ivf_upsert" -> (simIvfUpsert _),
    "sim_ann_upsert" -> (simAnnUpsert _),
    "ta_lang_id" -> (taLangId _),
    "ta_quality" -> (taQuality _),
    "ta_token_counts" -> (taTokenCounts _),
    "ta_fingerprint" -> (taFingerprint _),
    "ta_repetition" -> (taRepetition _),
    "ta_entropy" -> (taEntropy _),
    "ta_scrub" -> (taScrub _),
    "ta_rolling_hash" -> (taRollingHash _),
    "p_pipeline" -> (pPipeline _),
    "p_sample_stratified" -> (pSampleStratified _),
    "p_pack" -> (pPack _),
    "p_domain_cap" -> (pDomainCap _),
    "p_temperature_mix" -> (pTemperatureMix _),
    "p_export_shards" -> (pExportShards _),
    "ta_lm_quality" -> (taLmQuality _),
    "ft_collate" -> (ftCollate _),
    "mm_features" -> (mmFeatures _),
    "mm_frame_sample" -> (mmFrameSample _),
    "s_pre_analyze" -> (sPreAnalyze _),
    "ft_doc_stats" -> (ftDocStats _),
    "ft_dictionary" -> (ftDictionary _),
    "ft_corpus_stats" -> (ftCorpusStats _),
    "ft_bm25_topk" -> (ftBm25Topk _),
    "ft_bm25_filtered" -> (ftBm25Filtered _),
    "ft_bm25_boolean" -> (ftBm25Boolean _),
    "ft_bm25_mm" -> (ftBm25Mm _),
    "ft_bm25_prefix" -> (ftBm25Prefix _),
    "ft_bm25_wildcard" -> (ftBm25Wildcard _),
    "ft_query_string" -> (ftQueryString _),
    "ft_terms" -> (ftTerms _),
    "ft_bm25_fuzzy" -> (ftBm25Fuzzy _),
    "ft_bm25_boosted" -> (ftBm25Boosted _),
    "ft_more_like_this" -> (ftMoreLikeThis _),
    "ft_collapse" -> (ftCollapse _),
    "ft_group_topk" -> (ftGroupTopK _),
    "ft_search_after" -> (ftSearchAfter _),
    "ft_facet_query" -> (ftFacetQuery _),
    "ft_highlight" -> (ftHighlight _),
    "ft_term_vectors" -> (ftTermVectors _),
    "ft_elevate" -> (ftElevate _),
    "ft_keywords" -> (ftKeywords _),
    "ft_lm_dirichlet" -> (ftLmDirichlet _),
    "ft_bm25_synonyms" -> (ftBm25Synonyms _),
    "ft_rtg" -> (ftRtg _),
    "ft_join" -> (ftJoinQuery _),
    "ft_boost_by_field" -> (ftBoostByField _),
    "ft_rerank" -> (ftRerank _),
    "ft_facet_stats" -> (ftFacetStats _),
    "ft_facet_stats_pct" -> (ftFacetStatsPct _),
    "ft_graph" -> (ftGraph _),
    "ft_block_join" -> (ftBlockJoin _),
    "ft_facet_pivot" -> (ftFacetPivot _),
    "ft_facet_range" -> (ftFacetRange _),
    "ft_sort_by_field" -> (ftSortByField _),
    "ft_suggest" -> (ftSuggest _),
    "ft_bm25_phrase" -> (ftBm25Phrase _),
    "ft_bm25_near" -> (ftBm25Near _),
    "ft_bm25_near_unordered" -> (ftBm25NearUnordered _),
    "ft_bm25_stop" -> (ftBm25Stop _),
    "ft_bm25_stem" -> (ftBm25Stem _),
    "ft_bm25_mixed" -> (ftBm25Mixed _),
    "ft_incremental" -> (ftIncremental _),
    "ft_compacted" -> (ftCompacted _),
    "ft_atomic_update" -> (ftAtomicUpdate _),
    "ft_facets" -> (ftFacets _)
  )

  // =====================================================================
  // DuckDB oracles
  // =====================================================================

  def oracleSql: Map[String, String] = {
    val langCase = {
      val whens = Langs.map(l => s"WHEN best > 0 AND h_$l = best THEN '$l'").mkString(" ")
      s"CASE $whens ELSE 'und' END"
    }
    val hitCols = Langs.map(l => s"${hitsSql(l)} AS h_$l").mkString(", ")
    val bestExpr = s"greatest(${Langs.map(l => s"h_$l").mkString(", ")})"

    val minhashSelects = (1 to 8).map { i =>
      val a = Hashing.minHashA(i); val b = Hashing.minHashB(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % 1000000007)) AS s$i"
    }.mkString(", ")

    // minhash-LSH pair oracle: 64 poly signatures → 16 bands of 4 →
    // poly band hash → row_number cap 64 → in-bucket pairs (mirrors
    // Dedup.minHashCandidates(crossEngine = true) step for step)
    val mhSigList = (1 to 64).map { i =>
      val a = Hashing.minHashA(i); val b = Hashing.minHashB(i)
      s"list_min(list_transform(hs, h -> (h * $a + $b) % 1000000007))"
    }.mkString("[", ", ", "]")

    // SRP-LSH bucket oracle: mirrors Similarity.hyperplaneBucket /
    // planeComponent arithmetic and the left-fold dot product
    def bucketSql(v: String, planes: Int): String =
      (0 until planes).map { j =>
        val comp = s"(((($j*100003 + 17) + (i-1)*257) * 2654435761) % 1000000007 % 100000)" +
          s"::DOUBLE / 100000.0 - 0.5"
        val dot = s"list_reduce(list_concat([0.0::DOUBLE], " +
          s"list_transform(range(1, len($v) + 1), i -> $v[i]::DOUBLE * ($comp))), (x, y) -> x + y)"
        s"(CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    val annProbes = (Seq("qb") ++ (0 until 6).map(j => s"xor(qb, ${1L << j})"))
      .map(e => s"SELECT $e AS pb FROM q").mkString(" UNION ALL ")

    def simhashBitsSql(bits: Int) = (0 until bits).map { j =>
      s"(CASE WHEN list_sum(list_transform(th, h -> CASE WHEN (h >> $j) & 1 = 1 " +
        s"THEN 1 ELSE -1 END)) > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val simhashBits = simhashBitsSql(16)

    // the simhash chunk-banding pair construction (mirrors
    // Dedup.simHashNearDupsFrom over 32-bit poly fingerprints), shared
    // by d_simhash_pairs and the d_neardup_clusters closure
    val simhashPairsCtes =
      s"""sh_base AS (SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id < 200),
         |sh_h AS (SELECT doc_id, list_transform(list_distinct(toks), t -> ${polySql("t")}) AS th FROM sh_base),
         |sh_f AS (SELECT doc_id AS id, (${simhashBitsSql(32)})::BIGINT AS fp FROM sh_h),
         |sh_b AS (SELECT id, fp, c.range AS chunk, (fp >> (c.range * 8)) & 255 AS cv
         |      FROM sh_f CROSS JOIN range(0, 4) c),
         |sh_bc AS (SELECT id, fp, chunk, cv FROM (
         |  SELECT id, fp, chunk, cv,
         |   row_number() OVER (PARTITION BY chunk, cv ORDER BY id) AS rn FROM sh_b)
         | WHERE rn <= 64),
         |sh_p AS (SELECT DISTINCT a.id AS id_a, b2.id AS id_b,
         |       bit_count(xor(a.fp, b2.fp))::BIGINT AS hamming
         |      FROM sh_bc a JOIN sh_bc b2 ON a.chunk = b2.chunk AND a.cv = b2.cv AND a.id < b2.id),
         |sh_pairs AS (SELECT id_a, id_b, hamming FROM sh_p WHERE hamming <= 3)""".stripMargin

    val ftTermsIn = inList(FtQueryTerms)
    val ftIncTermsIn = inList(FtQueryIncTerms)
    // the stemmed query's terms, stemmed by the engine's own chain
    val ftStemTermsIn = inList(
      graft.analysis.Analyzer.TextEn.tokenize(FtQueryStem).distinct.sorted)

    val ftTopkSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // minimum-should-match: docs matching >= 2 of the query's terms,
    // scored over the matching terms only (the dfs join restricts tf
    // to query terms, so the HAVING counts matched query terms)
    val ftMmSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id HAVING count(DISTINCT term) >= 2)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // prefix query: the dfs CTE restricts to terms LIKE 's%' — the
    // oracle's analog of the dictionary expansion; everything else is
    // the plain disjunctive scorer over the expanded terms
    val ftPrefixSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term LIKE 's%' GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // wildcard query: the dfs CTE restricts to terms matching the
    // anchored RE2 regex '^s.a.*$' (glob 's?a*') — the oracle's
    // analog of the dictionary expansion
    val ftWildcardSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf
         |  WHERE regexp_matches(term, '^s.a.*$$') GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // more-like-this: the interesting CTE reproduces the seed's
    // tf·idf term selection (score rounded to 4 decimals BEFORE the
    // LIMIT-5 cut, term-asc tie-break — both sides cut identically);
    // the rest is the plain disjunctive scorer, seed excluded
    val ftMltSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |alldf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |interesting AS (
         | SELECT sd.term, alldf.df,
         |  round(sd.tf * ln(1 + (n - df + 0.5) / (df + 0.5)), 4) AS sel
         | FROM (SELECT term, tf FROM tf WHERE doc_id = 0) sd
         | JOIN alldf USING (term) CROSS JOIN stats
         | ORDER BY sel DESC, sd.term ASC LIMIT 5),
         |dfs AS (SELECT term, df FROM interesting),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | WHERE tf.doc_id <> 0
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // boosted query: per-term boost times idf FIRST (engine scales the
    // idf before tfNorm — mirrored associativity), then the usual sum
    val ftBoostedSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |boosts(term, b) AS (VALUES ('dup', 2.0::DOUBLE), ('window', 1.0::DOUBLE), ('spark', 0.5::DOUBLE)),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum((b * ln(1 + (n - df + 0.5) / (df + 0.5))) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN boosts USING (term)
         |  JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // fuzzy query: the dfs CTE restricts to terms within 2 edits of
    // 'spork' — DuckDB's levenshtein is the same unit-cost distance
    // as Spark's, so the dictionary expansion reproduces exactly
    val ftFuzzySql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf
         |  WHERE levenshtein(term, 'spork') <= 2 GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // field collapsing: best (rounded score, doc_id asc) hit per
    // source over the FULL match set, plus the group match count
    val ftCollapseSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |r AS (
         | SELECT d.source, sc.doc_id, round(sc.s, 4) AS score,
         |  row_number() OVER (PARTITION BY d.source
         |    ORDER BY round(sc.s, 4) DESC, sc.doc_id ASC) AS rn,
         |  count(*) OVER (PARTITION BY d.source) AS n_matches
         | FROM scores sc JOIN documents d USING (doc_id))
         |SELECT source, doc_id, score, n_matches FROM r WHERE rn = 1""".stripMargin

    // result grouping: collapse's window generalized to top-3 per
    // group, rank emitted as grank
    val ftGroupSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |r AS (
         | SELECT d.source, sc.doc_id, round(sc.s, 4) AS score,
         |  row_number() OVER (PARTITION BY d.source
         |    ORDER BY round(sc.s, 4) DESC, sc.doc_id ASC) AS grank
         | FROM scores sc JOIN documents d USING (doc_id))
         |SELECT source, grank::BIGINT AS grank, doc_id, score
         |FROM r WHERE grank <= 3""".stripMargin

    // deep paging: absolute ranks 21-40 of the flagship ordering
    // (scores rounded BEFORE the cut, like the engine's cursor),
    // re-ranked 1-20 within the page
    val ftSearchAfterSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |ranked AS (
         | SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS arank,
         |  doc_id, round(s, 4) AS score
         | FROM scores)
         |SELECT (arank - 20)::BIGINT AS rank, doc_id, score
         |FROM ranked WHERE arank BETWEEN 21 AND 40 ORDER BY rank""".stripMargin

    // highlighting: flagship top-20 + 10-token snippet around the
    // first query-term occurrence (sentinel 999999999 for absent
    // terms, start = greatest(1, mpos-5), matched terms <em>-wrapped)
    val ftHighlightSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |top AS (
         | SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         |  doc_id, round(s, 4) AS score
         | FROM scores ORDER BY rank LIMIT 20),
         |dts AS (SELECT doc_id, $ToksSql AS ts FROM documents
         |        WHERE doc_id IN (SELECT doc_id FROM top)),
         |mp AS (SELECT doc_id, ts, least(
         |  CASE WHEN list_position(ts, 'dup') = 0 THEN 999999999 ELSE list_position(ts, 'dup') END,
         |  CASE WHEN list_position(ts, 'spark') = 0 THEN 999999999 ELSE list_position(ts, 'spark') END,
         |  CASE WHEN list_position(ts, 'window') = 0 THEN 999999999 ELSE list_position(ts, 'window') END) AS fp
         | FROM dts),
         |sn AS (SELECT doc_id, array_to_string(list_transform(
         |   list_slice(ts, greatest(1, (CASE WHEN fp = 999999999 THEN 1 ELSE fp END) - 5),
         |              greatest(1, (CASE WHEN fp = 999999999 THEN 1 ELSE fp END) - 5) + 9),
         |   x -> CASE WHEN x IN $ftTermsIn THEN '<em>' || x || '</em>' ELSE x END), ' ') AS snippet
         | FROM mp)
         |SELECT t.rank, t.doc_id, t.score, sn.snippet
         |FROM top t JOIN sn USING (doc_id) ORDER BY t.rank""".stripMargin

    // term vectors: (term, tf, df) for docs 0-2, df from scratch
    val ftTermVectorsSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
         |SELECT doc_id, term, tf, df FROM tf JOIN dfs USING (term)
         |WHERE doc_id IN (0, 1, 2)""".stripMargin

    // join query: docs sharing a source with any 'dup AND window' match
    val ftJoinSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tsets AS (SELECT doc_id, list(DISTINCT term) AS ts FROM toks GROUP BY 1)
         |SELECT d.doc_id FROM documents d WHERE d.source IN (
         | SELECT DISTINCT m.source FROM documents m JOIN tsets USING (doc_id)
         | WHERE list_contains(ts, 'dup') AND list_contains(ts, 'window'))""".stripMargin

    // query elevation: docs 42 then 7 pinned first (in list order),
    // then the organic rounded ranking; an elevated doc absent from
    // the match set would surface with score 0
    val ftElevateSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |elev(e_id, elev_pos) AS (VALUES (42, 1), (7, 2)),
         |alld AS (
         | SELECT coalesce(e.e_id, s.doc_id)::BIGINT AS doc_id,
         |  round(coalesce(s.s, 0), 4) AS score, e.elev_pos
         | FROM scores s FULL OUTER JOIN elev e ON s.doc_id = e.e_id)
         |SELECT row_number() OVER (ORDER BY
         |  CASE WHEN elev_pos IS NULL THEN 1 ELSE 0 END,
         |  elev_pos ASC NULLS LAST, score DESC, doc_id ASC) AS rank,
         | doc_id, score, (elev_pos IS NOT NULL) AS elevated
         |FROM alld ORDER BY rank LIMIT 20""".stripMargin

    // keyword extraction: per-doc top-5 terms by tf·ln(N/df), rounded
    // before the cut, ties term-ascending (mirrors IndexReader.keywords)
    val ftKeywordsSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
         |tv AS (SELECT doc_id, term, round(tf * ln(n / df), 4) AS tfidf
         |  FROM tf JOIN dfs USING (term) CROSS JOIN nn
         |  WHERE doc_id IN (0, 1, 2, 3, 4)),
         |r AS (SELECT doc_id, term, tfidf,
         |  row_number() OVER (PARTITION BY doc_id
         |    ORDER BY tfidf DESC, term ASC) AS krank FROM tv)
         |SELECT doc_id, krank::BIGINT AS krank, term, tfidf
         |FROM r WHERE krank <= 5""".stripMargin

    // LM Dirichlet: per matched term max(0, ln(1 + tf/(μ·cf/total)) +
    // ln(μ/(dl+μ))), μ = 500 — mirrors Wand.scoredDocIdsDirichlet
    val ftLmDirichletSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |tot AS (SELECT count(*)::BIGINT AS tot FROM toks),
         |cfs AS (SELECT term, count(*)::BIGINT AS cf FROM toks
         |  WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(greatest(0, ln(1 + tf / (500.0 * (cf / tot::DOUBLE))) + ln(500.0 / (dl + 500.0)))) AS s
         | FROM tf JOIN cfs USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // function-query boost: score × ln(1 + n_chars), rounded after
    // the multiply
    val ftBoostByFieldSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s * ln(1 + n_chars), 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s * ln(1 + n_chars), 4) AS score
         |FROM scores JOIN documents USING (doc_id)
         |ORDER BY rank LIMIT 20""".stripMargin

    // rerank: flagship top-50 (rounded cut) + 2×score('merge vector'),
    // unmatched keep the base score; combined re-rounded
    val ftRerankSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs1 AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
         |s1 AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs1 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |dfs2 AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN ('merge', 'vector') GROUP BY 1),
         |s2 AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs2 USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id),
         |cut AS (SELECT doc_id, round(s, 4) AS sc1 FROM s1
         |        ORDER BY round(s, 4) DESC, doc_id ASC LIMIT 50),
         |comb AS (SELECT cut.doc_id,
         |  round(sc1 + 2.0 * coalesce(s2.s, 0), 4) AS score
         | FROM cut LEFT JOIN s2 USING (doc_id))
         |SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank,
         | doc_id, score
         |FROM comb ORDER BY rank LIMIT 20""".stripMargin

    // query string 'dup^2 wind* sprak~2 spark': candidate terms with
    // per-clause boosts, SUMMED per term, then the boosted scorer
    val ftQueryStringSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |alldf AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |cand AS (
         | SELECT term, 2.0::DOUBLE AS b FROM alldf WHERE term = 'dup'
         | UNION ALL SELECT term, 1.0 FROM alldf WHERE regexp_matches(term, '^wind.*$$')
         | UNION ALL SELECT term, 1.0 FROM alldf WHERE levenshtein(term, 'sprak') <= 2
         | UNION ALL SELECT term, 1.0 FROM alldf WHERE term = 'spark'),
         |boosts AS (SELECT term, sum(b) AS b FROM cand GROUP BY 1),
         |dfs AS (SELECT term, df FROM alldf WHERE term IN (SELECT term FROM boosts)),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum((b * ln(1 + (n - df + 0.5) / (df + 0.5))) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN boosts USING (term)
         |  JOIN dl USING (doc_id) CROSS JOIN stats
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // spellcheck collation: best suggestion per raw term (distance
    // asc, df desc, term asc; in-dictionary terms self-correct at
    // distance 0), then the corrected query's all-terms hit count
    val ftCollateSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q(pos, term) AS (VALUES (1, 'dup'), (2, 'windoq'), (3, 'sprak')),
         |corr AS (SELECT q.pos, coalesce((
         |   SELECT d.term FROM dfs d
         |   WHERE levenshtein(d.term, q.term) <= 2
         |   ORDER BY levenshtein(d.term, q.term) ASC, d.df DESC, d.term ASC
         |   LIMIT 1), q.term) AS cterm
         |  FROM q),
         |coll AS (SELECT string_agg(cterm, ' ' ORDER BY pos) AS collated FROM corr),
         |tsets AS (SELECT doc_id, list(DISTINCT term) AS ts FROM toks GROUP BY 1),
         |hits AS (SELECT count(*)::BIGINT AS n_hits FROM tsets
         |  WHERE NOT EXISTS (SELECT 1 FROM corr WHERE NOT list_contains(ts, cterm)))
         |SELECT collated, n_hits FROM coll CROSS JOIN hits""".stripMargin

    // facet.query: three named boolean subqueries' match-set counts
    val ftFacetQuerySql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tsets AS (SELECT doc_id, list(DISTINCT term) AS ts FROM toks GROUP BY 1)
         |SELECT 'dup_and_window' AS facet, count(*)::BIGINT AS n_docs FROM tsets
         | WHERE list_contains(ts, 'dup') AND list_contains(ts, 'window')
         |UNION ALL
         |SELECT 'spark_not_dup' AS facet, count(*)::BIGINT AS n_docs FROM tsets
         | WHERE list_contains(ts, 'spark') AND NOT list_contains(ts, 'dup')
         |UNION ALL
         |SELECT 'all_three' AS facet, count(*)::BIGINT AS n_docs FROM tsets
         | WHERE list_contains(ts, 'dup') AND list_contains(ts, 'window')
         |  AND list_contains(ts, 'spark')""".stripMargin

    // boolean: both must-terms required, the not-term excluding;
    // scores over must terms only
    val ftBooleanSql =
      s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
         |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN ('batch', 'window') GROUP BY 1),
         |m AS (SELECT doc_id FROM tf WHERE term IN ('batch', 'window')
         |      GROUP BY doc_id HAVING count(DISTINCT term) = 2),
         |x AS (SELECT DISTINCT doc_id FROM tf WHERE term = 'dup'),
         |scores AS (
         | SELECT tf.doc_id,
         |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
         | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
         | WHERE tf.doc_id IN (SELECT doc_id FROM m)
         |   AND tf.doc_id NOT IN (SELECT doc_id FROM x)
         | GROUP BY tf.doc_id)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // phrase: ordered adjacency count = tf; idf = idf(batch)+idf(window)
    // summed in phrase order (explicit left-to-right addition)
    val ftPhraseSql =
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |p AS (SELECT doc_id, len(toks)::BIGINT AS dl,
         |  len(list_filter(range(1, len(toks)), i -> toks[i] = 'batch' AND toks[i+1] = 'window'))::BIGINT AS pf
         | FROM t),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM p) / (SELECT count(*) FROM documents) AS avgdl),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf
         |        WHERE term IN ('batch', 'window') GROUP BY 1),
         |scores AS (
         | SELECT p.doc_id,
         |  ((SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'batch')
         |   + (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'window'))
         |  * (pf / (pf + 1.2 * (1 - 0.75 + 0.75 * p.dl / stats.avgdl))) AS s
         | FROM p CROSS JOIN stats WHERE pf > 0)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // ordered proximity "batch window"~2: a batch-position matches
    // when a window-position exists within the next 3 slots (maxWidth
    // = (m-1)+slop = 3; exists == the engine's greedy minimal chain
    // for m = 2); scoring = the phrase scorer with tf = span count
    val ftNearSql =
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |p AS (SELECT doc_id, len(toks)::BIGINT AS dl,
         |  len(list_filter(range(1, len(toks) + 1), i -> toks[i] = 'batch' AND
         |    len(list_filter(range(i + 1, i + 4), j -> j <= len(toks) AND toks[j] = 'window')) > 0))::BIGINT AS pf
         | FROM t),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM p) / (SELECT count(*) FROM documents) AS avgdl),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf
         |        WHERE term IN ('batch', 'window') GROUP BY 1),
         |scores AS (
         | SELECT p.doc_id,
         |  ((SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'batch')
         |   + (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'window'))
         |  * (pf / (pf + 1.2 * (1 - 0.75 + 0.75 * p.dl / stats.avgdl))) AS s
         | FROM p CROSS JOIN stats WHERE pf > 0)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    // unordered proximity: pf = 'window' positions with a 'batch'
    // within +-3 slots (either order); idf(window) + idf(batch) in
    // anchor-first order
    val ftNearUnorderedSql =
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |p AS (SELECT doc_id, len(toks)::BIGINT AS dl,
         |  len(list_filter(range(1, len(toks) + 1), i -> toks[i] = 'window' AND
         |    len(list_filter(range(greatest(1, i - 3), i + 4), j -> j <= len(toks) AND toks[j] = 'batch')) > 0))::BIGINT AS pf
         | FROM t),
         |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
         |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM p) / (SELECT count(*) FROM documents) AS avgdl),
         |tf AS (SELECT doc_id, unnest(toks) AS term FROM t),
         |dfs AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf
         |        WHERE term IN ('batch', 'window') GROUP BY 1),
         |scores AS (
         | SELECT p.doc_id,
         |  ((SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'window')
         |   + (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) FROM dfs WHERE term = 'batch'))
         |  * (pf / (pf + 1.2 * (1 - 0.75 + 0.75 * p.dl / stats.avgdl))) AS s
         | FROM p CROSS JOIN stats WHERE pf > 0)
         |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
         | doc_id, round(s, 4) AS score
         |FROM scores ORDER BY rank LIMIT 20""".stripMargin

    Map(
      "q1_agg" ->
        """SELECT l_returnflag, l_linestatus,
          | round(sum(l_quantity), 2) AS sum_qty,
          | round(sum(l_extendedprice), 2) AS sum_base_price,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
          | count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          |GROUP BY 1, 2""".stripMargin,

      "q3_join_topn" ->
        """SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

      "q5_revenue" ->
        """SELECT r_name, n_name,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          | count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY 1, 2""".stripMargin,

      "w_topn_per_group" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          | SELECT o_custkey, o_orderkey, o_totalprice,
          |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          | FROM orders) WHERE rn <= 3""".stripMargin,

      "q_distinct_users" ->
        """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
          |FROM events GROUP BY 1""".stripMargin,

      "ev_hourly" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
          | event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2""".stripMargin,

      // sliding 2h/1h windows: each event is in the hour-aligned
      // window starting at trunc(hour, ts) and the one 1h earlier
      "ev_sliding" ->
        """WITH w AS (
          | SELECT event_type, date_trunc('hour', ts) AS s FROM events
          | UNION ALL
          | SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events)
          |SELECT strftime(s, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
          | count(*)::BIGINT AS n_events
          |FROM w GROUP BY 1, 2""".stripMargin,

      "ev_sessions" ->
        """WITH g AS (
          | SELECT user_id, event_id, ts,
          |  CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
          |        OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
          |       THEN 1 ELSE 0 END AS new_sess
          | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
          |), se AS (
          | SELECT user_id,
          |  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_no
          | FROM g)
          |SELECT user_id, max(sess_no)::BIGINT AS n_sessions, count(*) AS n_events
          |FROM se GROUP BY 1""".stripMargin,

      "ev_asof" ->
        """WITH u AS (
          | SELECT event_id, user_id, ts, value, 1 AS is_left, NULL::DOUBLE AS v
          | FROM events WHERE event_type = 'purchase'
          | UNION ALL
          | SELECT event_id, user_id, ts, NULL::DOUBLE AS value, 0 AS is_left, value AS v
          | FROM events WHERE event_type = 'signup'
          |), j AS (
          | SELECT event_id, user_id, value, is_left,
          |  last_value(v IGNORE NULLS) OVER (
          |   PARTITION BY user_id ORDER BY ts ASC, is_left ASC, event_id ASC
          |   ROWS UNBOUNDED PRECEDING) AS asof_v
          | FROM u)
          |SELECT event_id, user_id, round(value, 2) AS purchase_value,
          | round(asof_v, 2) AS asof_value
          |FROM j WHERE is_left = 1""".stripMargin,

      "s_exclude_seen" ->
        "SELECT doc_id, lang FROM documents WHERE doc_id % 7 <> 0",

      "s_changed_docs" ->
        """SELECT doc_id, md5(text) AS content_hash FROM documents
          |WHERE doc_id % 2 = 1 OR doc_id % 4 = 2""".stripMargin,

      "s_doc_per_line" ->
        """SELECT doc_id::VARCHAR || '#L' || line_no::VARCHAR AS line_id, line_no, line
          |FROM (
          | SELECT doc_id, generate_subscripts(parts, 1)::BIGINT - 1 AS line_no, unnest(parts) AS line
          | FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents WHERE doc_id < 50))""".stripMargin,

      "t_field_ops" ->
        """SELECT doc_id, lang AS lang_copy, 'v1' AS pipeline_version,
          | source || ':' || lang AS tag
          |FROM documents""".stripMargin,

      "t_regex_replace" ->
        """SELECT doc_id, substr(regexp_replace(text, 'batch', 'BATCH', 'g'), 1, 60) AS snippet
          |FROM documents WHERE regexp_matches(text, 'batch')""".stripMargin,

      "t_datetime_reformat" ->
        "SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts FROM events",

      "t_readable_size" ->
        """WITH b AS (SELECT doc_id, n_chars * 31013 AS bytes FROM documents),
          |u AS (SELECT doc_id,
          | CASE WHEN bytes >= 1073741824 THEN CAST(floor(bytes / 1073741824.0) AS BIGINT)
          |      WHEN bytes >= 1048576 THEN CAST(floor(bytes / 1048576.0) AS BIGINT)
          |      WHEN bytes >= 1024 THEN CAST(floor(bytes / 1024.0) AS BIGINT)
          |      ELSE bytes END AS readable_size_num,
          | CASE WHEN bytes >= 1073741824 THEN 'GB' WHEN bytes >= 1048576 THEN 'MB'
          |      WHEN bytes >= 1024 THEN 'KB' ELSE 'bytes' END AS readable_size_units
          |FROM b)
          |SELECT doc_id, readable_size_num::VARCHAR || ' ' || readable_size_units AS readable_size,
          | readable_size_num, readable_size_units FROM u""".stripMargin,

      "t_url_encode" ->
        "SELECT doc_id, replace(substr(text, 1, 40), ' ', '+') AS encoded FROM documents",

      "t_template" ->
        """SELECT doc_id, '[' || lang || '] ' || source || ' has ' ||
          | n_chars::VARCHAR || ' chars' AS summary FROM documents""".stripMargin,

      "t_fetch_url" ->
        """WITH u AS (SELECT doc_id,
          |  'http://h' || (doc_id % 5)::VARCHAR || '.example/' || doc_id::VARCHAR AS url
          | FROM documents)
          |SELECT doc_id, url,
          | (CASE WHEN doc_id % 17 = 0 THEN 404 ELSE 200 END)::BIGINT AS http_status,
          | CASE WHEN doc_id % 17 = 0 THEN NULL ELSE 'BODY:' || url END AS body_str,
          | CASE WHEN doc_id % 17 = 0 THEN 'HTTP server responded 404' END AS fetch_error
          |FROM u""".stripMargin,

      "s_child_docs" ->
        """SELECT doc_id::VARCHAR || '⇛' || child_no::VARCHAR AS child_id,
          | doc_id, child_no, child
          |FROM (
          | SELECT doc_id, generate_subscripts(parts, 1)::BIGINT - 1 AS child_no,
          |  unnest(parts) AS child
          | FROM (SELECT doc_id, string_split(text, ' ') AS parts
          |       FROM documents WHERE doc_id < 40))""".stripMargin,

      "s_xml_extract" ->
        """SELECT doc_id, doc_id AS xml_id, lang AS xml_lang,
          | source AS xml_source, n_chars AS xml_len FROM documents""".stripMargin,

      "r_route_by_field" ->
        """SELECT lang AS branch, count(*) AS n_docs FROM documents
          |WHERE lang IN ('en', 'fr', 'de') GROUP BY 1""".stripMargin,

      "r_branch_counts" ->
        "SELECT event_type, count(*) AS n_docs FROM events GROUP BY 1",

      "d_exact" ->
        s"""WITH k AS (SELECT doc_id, md5(array_to_string(($ToksSql)[1:8], ' ')) AS content_hash FROM documents)
           |SELECT content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM k GROUP BY 1""".stripMargin,

      "d_exact_rows" ->
        s"""SELECT min(doc_id) AS doc_id FROM documents
           |GROUP BY md5(array_to_string(($ToksSql)[1:8], ' '))""".stripMargin,

      "d_minhash_sig" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |sh AS (SELECT doc_id, $ShinglesSql AS shs FROM base),
           |h AS (SELECT doc_id, list_transform(shs, s -> ${polySql("s")}) AS hs
           |      FROM sh WHERE len(shs) > 0)
           |SELECT doc_id, $minhashSelects FROM h""".stripMargin,

      "d_minhash_pairs" ->
        s"""WITH base AS (SELECT doc_id AS id, $ToksSql AS toks FROM documents),
           |shl AS (SELECT id, $ShinglesSql AS shs FROM base),
           |h AS (SELECT id, list_transform(shs, s -> ${polySql("s")}) AS hs
           |      FROM shl WHERE len(shs) > 0),
           |sg AS (SELECT id, $mhSigList AS sig FROM h),
           |bd AS (SELECT id, sig, r.range AS band,
           |  ${polySql("array_to_string(sig[r.range*4+1 : r.range*4+4], ',')")} AS band_hash
           | FROM sg CROSS JOIN range(0, 16) r),
           |cp AS (SELECT * FROM (
           |  SELECT id, sig, band, band_hash,
           |   row_number() OVER (PARTITION BY band, band_hash ORDER BY id) AS rn FROM bd)
           | WHERE rn <= 64),
           |pairs AS (
           | SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           |  len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i]))::DOUBLE / 64.0 AS est_jaccard
           | FROM cp a JOIN cp b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id)
           |SELECT id_a, id_b, est_jaccard FROM pairs WHERE est_jaccard >= 0.5""".stripMargin,

      "sim_ann_topk" ->
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |b AS (SELECT id, v, ${bucketSql("v", 6)} AS bucket FROM e),
           |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE id = 7),
           |pr AS ($annProbes),
           |c AS (SELECT b.id, ${cosSql("b.v", "q.qv")} AS cosine
           |      FROM b CROSS JOIN q WHERE b.bucket IN (SELECT pb FROM pr))
           |SELECT row_number() OVER (ORDER BY cosine DESC, id ASC) AS rank, id, cosine
           |FROM c ORDER BY rank LIMIT 20""".stripMargin,

      "d_simhash" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |h AS (SELECT doc_id, list_transform(list_distinct(toks), t -> ${polySql("t")}) AS th FROM base)
           |SELECT doc_id, ($simhashBits)::BIGINT AS simhash FROM h""".stripMargin,

      // the chunk-banding near-dup join: any pair within Hamming 3 of
      // the 32-bit fingerprint shares one of four exact 8-bit chunks;
      // buckets capped at 64 lowest ids (mirrors maxBucketSize)
      "d_simhash_pairs" ->
        s"""WITH $simhashPairsCtes
           |SELECT id_a, id_b, hamming FROM sh_pairs""".stripMargin,

      // near-dup clustering: transitive closure over the simhash pair
      // graph, component = smallest reachable id (mirrors
      // Dedup.nearDupComponents' min-label fixpoint)
      "d_neardup_clusters" ->
        s"""WITH RECURSIVE $simhashPairsCtes,
           |edges AS (SELECT id_a AS a, id_b AS b FROM sh_pairs
           |          UNION SELECT id_b, id_a FROM sh_pairs),
           |verts AS (SELECT DISTINCT a AS id FROM edges),
           |reach(id, lbl) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b)
           |SELECT id, min(lbl) AS component FROM reach GROUP BY 1""".stripMargin,

      // the survivor view: component for every doc of the subset (own
      // id when unpaired), keep = doc is its component representative
      "d_neardup_survivors" ->
        s"""WITH RECURSIVE $simhashPairsCtes,
           |edges AS (SELECT id_a AS a, id_b AS b FROM sh_pairs
           |          UNION SELECT id_b, id_a FROM sh_pairs),
           |verts AS (SELECT DISTINCT a AS id FROM edges),
           |reach(id, lbl) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b),
           |comp AS (SELECT id, min(lbl) AS component FROM reach GROUP BY 1)
           |SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
           | (coalesce(c.component, d.doc_id) = d.doc_id) AS keep
           |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
           |WHERE d.doc_id < 200""".stripMargin,

      "d_ngram_jaccard" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |sh AS (SELECT doc_id, $ShinglesSql AS sh FROM base)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           | len(list_intersect(a.sh, b.sh))::DOUBLE / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           |FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
           |WHERE a.doc_id % 2 = 0""".stripMargin,

      // paragraph-level exact dedup over 2-token chunks: first
      // occurrence by (doc_id, idx) survives, survivors rejoined in
      // document order (mirrors Dedup.chunkDedup(chunkTokens = 2))
      "d_chunk_dedup" ->
        s"""WITH t AS (SELECT doc_id, $ToksSql AS ts FROM documents),
           |nch AS (SELECT doc_id, ts, ((len(ts) + 1) // 2) AS nc FROM t),
           |ex AS (SELECT doc_id, unnest(range(1, nc + 1)) AS i, ts FROM nch),
           |ch AS (SELECT doc_id, (i - 1)::BIGINT AS idx,
           |  array_to_string(list_slice(ts, (i - 1) * 2 + 1, least(i * 2, len(ts))), ' ') AS chunk
           | FROM ex),
           |win AS (SELECT doc_id, idx, chunk,
           |  row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn FROM ch),
           |kept AS (SELECT doc_id, idx, chunk FROM win WHERE rn = 1),
           |ka AS (SELECT doc_id, count(*)::BIGINT AS n_kept,
           |  string_agg(chunk, ' ' ORDER BY idx) AS text_dedup FROM kept GROUP BY 1),
           |tot AS (SELECT doc_id, nc::BIGINT AS n_units FROM nch)
           |SELECT tot.doc_id, tot.n_units,
           | (tot.n_units - coalesce(ka.n_kept, 0))::BIGINT AS n_dropped,
           | coalesce(ka.text_dedup, '') AS text_dedup
           |FROM tot LEFT JOIN ka USING (doc_id)""".stripMargin,

      "d_embedding_neardup" ->
        s"""WITH e AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 300)
           |SELECT id_a, id_b, cosine FROM (
           | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |  round(${cosSql("a.v", "b.v")}, 4) AS cosine
           | FROM e a JOIN e b ON a.vec_id < b.vec_id)
           |WHERE cosine >= 0.25""".stripMargin,

      // the SRP-bucketed production near-dup join: buckets reproduced
      // arithmetically, pairs only within a bucket, buckets capped at
      // the 64 lowest ids (mirrors maxBucketSize)
      "d_embedding_neardup_lsh" ->
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings WHERE vec_id < 300),
           |b AS (SELECT id, v, ${bucketSql("v", 6)} AS bucket FROM e),
           |bc AS (SELECT id, v, bucket FROM (
           |  SELECT id, v, bucket,
           |   row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn FROM b)
           | WHERE rn <= 64),
           |p AS (SELECT DISTINCT a.id AS id_a, c.id AS id_b, ${cosSql("a.v", "c.v")} AS cosine
           |      FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.id < c.id)
           |SELECT id_a, id_b, round(cosine, 4) AS cosine FROM p WHERE cosine >= 0.25""".stripMargin,

      // benchmark decontamination: distinct word 5-grams of the
      // benchmark subset (doc_id % 7 = 0) joined against the rest of
      // the corpus — per-doc count of shared distinct 5-grams
      "d_decontaminate" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |g AS (SELECT doc_id, unnest(list_distinct(list_filter(
           |       list_transform(range(0, greatest(len(toks) - 5, 0) + 1),
           |         i -> array_to_string(toks[i+1:i+5], ' ')),
           |       s -> len(s) > 0))) AS ng FROM base),
           |bench AS (SELECT DISTINCT ng FROM g WHERE doc_id % 7 = 0),
           |corp AS (SELECT doc_id, ng FROM g WHERE doc_id % 7 <> 0)
           |SELECT doc_id, count(*)::BIGINT AS n_contaminated_ngrams
           |FROM corp WHERE ng IN (SELECT ng FROM bench)
           |GROUP BY doc_id""".stripMargin,

      "sim_bruteforce_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
           |c AS (SELECT vec_id AS id, ${cosSql("embedding", "qv")} AS cosine FROM embeddings, q)
           |SELECT row_number() OVER (ORDER BY cosine DESC, id ASC) AS rank, id, cosine
           |FROM c ORDER BY rank LIMIT 20""".stripMargin,

      // IVF oracle through the REFINED path at the 100 TB setting,
      // mirrored step for step: fixed-64 hash-ordered sampled
      // centroids (matrix index = rank by sampled id) → one
      // deterministic spherical k-means iteration over the
      // kmeansTrainLimit = 256 hash-ordered TRAINING SAMPLE (assign by
      // argmax-cosine with ties → lowest index; recenter on the
      // id-ORDERED fold of unit-vector components, cast FLOAT —
      // exactly the engine's order-fixed recenter, so the refined
      // centroids are bit-identical) → nprobe nearest refined lists →
      // exact re-rank over the FULL corpus
      "sim_ivf_topk" ->
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |c0 AS (SELECT row_number() OVER (ORDER BY cid ASC) - 1 AS idx, cv FROM (
           |        SELECT vec_id AS cid, embedding AS cv FROM embeddings
           |        ORDER BY (vec_id * 2654435761) % 1000000007 ASC, vec_id ASC LIMIT 64)),
           |tr AS (SELECT id, v FROM e
           |       ORDER BY (id * 2654435761) % 1000000007 ASC, id ASC LIMIT 256),
           |a0 AS (SELECT tr.id, tr.v,
           |  (SELECT idx FROM c0 ORDER BY ${cosSql("tr.v", "cv")} DESC, idx ASC LIMIT 1) AS b
           | FROM tr),
           |ctr AS (SELECT id, b, generate_subscripts(v, 1) AS pos, unnest(v) AS x,
           |         sqrt(${dotSql("v", "v")}) AS nrm FROM a0),
           |sums AS (SELECT b, pos,
           |  list_reduce(list_concat([0.0::DOUBLE], list(x::DOUBLE / nrm ORDER BY id)),
           |              (acc, y) -> acc + y) AS sx,
           |  count(*) AS n
           | FROM ctr GROUP BY b, pos),
           |c1 AS (SELECT c0.idx, coalesce(s.cv1, c0.cv) AS cv
           |       FROM c0 LEFT JOIN (
           |         SELECT b AS idx, list(CAST(sx / n AS FLOAT) ORDER BY pos) AS cv1
           |         FROM sums GROUP BY b) s USING (idx)),
           |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
           |pr AS (SELECT idx FROM c1, q ORDER BY ${cosSql("cv", "qv")} DESC, idx ASC LIMIT 3),
           |a1 AS (SELECT e.id, e.v,
           |  (SELECT idx FROM c1 ORDER BY ${cosSql("e.v", "cv")} DESC, idx ASC LIMIT 1) AS bucket
           | FROM e),
           |cand AS (SELECT id, ${cosSql("v", "qv")} AS cosine
           |         FROM a1, q WHERE bucket IN (SELECT idx FROM pr))
           |SELECT row_number() OVER (ORDER BY cosine DESC, id ASC) AS rank, id, cosine
           |FROM cand ORDER BY rank LIMIT 20""".stripMargin,

      // the journaled upsert path: oracle = fresh assignment of the
      // FINAL corpus (inserted third + reversed movers − deletions) to
      // the SUBSET build's raw hash-sampled centroids — stale copies,
      // ghost rows in emptied buckets, or missed moves hash-mismatch
      "sim_ivf_upsert" ->
        s"""WITH init AS (SELECT vec_id AS id, embedding AS v FROM embeddings
           |             WHERE vec_id % 3 <> 0),
           |c0 AS (SELECT row_number() OVER (ORDER BY cid ASC) - 1 AS idx, cv FROM (
           |        SELECT id AS cid, v AS cv FROM init
           |        ORDER BY (id * 2654435761) % 1000000007 ASC, id ASC LIMIT 64)),
           |e AS (SELECT vec_id AS id,
           |       CASE WHEN vec_id % 3 <> 0 AND vec_id % 5 = 1 AND vec_id % 7 <> 0
           |            THEN list_reverse(embedding) ELSE embedding END AS v
           |      FROM embeddings WHERE NOT (vec_id % 3 <> 0 AND vec_id % 7 = 0)),
           |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
           |pr AS (SELECT idx FROM c0, q ORDER BY ${cosSql("cv", "qv")} DESC, idx ASC LIMIT 3),
           |a1 AS (SELECT e.id, e.v,
           |  (SELECT idx FROM c0 ORDER BY ${cosSql("e.v", "cv")} DESC, idx ASC LIMIT 1) AS bucket
           | FROM e),
           |cand AS (SELECT id, ${cosSql("v", "qv")} AS cosine
           |         FROM a1, q WHERE bucket IN (SELECT idx FROM pr))
           |SELECT row_number() OVER (ORDER BY cosine DESC, id ASC) AS rank, id, cosine
           |FROM cand ORDER BY rank LIMIT 20""".stripMargin,

      // the same journaled upsert machinery through the SRP index:
      // fresh hyperplane assignment of the final corpus, Hamming-1
      // multi-probe around the query vector's own bucket
      "sim_ann_upsert" ->
        s"""WITH e AS (SELECT vec_id AS id,
           |       CASE WHEN vec_id % 3 <> 0 AND vec_id % 5 = 1 AND vec_id % 7 <> 0
           |            THEN list_reverse(embedding) ELSE embedding END AS v
           |      FROM embeddings WHERE NOT (vec_id % 3 <> 0 AND vec_id % 7 = 0)),
           |b AS (SELECT id, v, ${bucketSql("v", 6)} AS bucket FROM e),
           |q AS (SELECT embedding AS qv, ${bucketSql("embedding", 6)} AS qb
           |      FROM embeddings WHERE vec_id = 7),
           |pr AS ($annProbes),
           |c AS (SELECT b.id, ${cosSql("b.v", "q.qv")} AS cosine
           |      FROM b CROSS JOIN q WHERE b.bucket IN (SELECT pb FROM pr))
           |SELECT row_number() OVER (ORDER BY cosine DESC, id ASC) AS rank, id, cosine
           |FROM c ORDER BY rank LIMIT 20""".stripMargin,

      "ta_lang_id" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |h AS (SELECT doc_id, $hitCols FROM base),
           |b AS (SELECT doc_id, h_de, h_en, h_es, h_fr, $bestExpr AS best FROM h)
           |SELECT doc_id, $langCase AS lang_pred FROM b""".stripMargin,

      "ta_quality" ->
        s"""WITH base AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
           |m AS (SELECT doc_id, text, toks, len(toks)::BIGINT AS n_tokens,
           | (len(text) - len(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::BIGINT AS punct,
           | ${hitsSql("en")} AS stops FROM base)
           |SELECT doc_id, n_tokens,
           | CASE WHEN n_tokens > 0 THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / n_tokens ELSE 0.0 END AS mean_token_len,
           | CASE WHEN len(text) > 0 THEN punct::DOUBLE / len(text) ELSE 0.0 END AS punct_ratio,
           | CASE WHEN n_tokens > 0 THEN stops::DOUBLE / n_tokens ELSE 0.0 END AS stopword_ratio,
           | (n_tokens >= 5
           |  AND (CASE WHEN n_tokens > 0 THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / n_tokens ELSE 0.0 END) >= 2
           |  AND (CASE WHEN n_tokens > 0 THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / n_tokens ELSE 0.0 END) <= 12
           |  AND (CASE WHEN n_tokens > 0 THEN stops::DOUBLE / n_tokens ELSE 0.0 END) >= 0.0) AS quality_ok
           |FROM m""".stripMargin,

      "ta_token_counts" ->
        """SELECT doc_id,
          | len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))::BIGINT AS ws_tokens,
          | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]'))::BIGINT AS bpeish_tokens
          |FROM documents""".stripMargin,

      // Gopher-style repetition signals: duplicate-token fraction,
      // dominant-token fraction (max per-token count — the oracle may
      // rescan per distinct token; the engine uses a sorted run-length
      // fold, same value), exact positional duplicate-bigram fraction
      "ta_repetition" ->
        s"""WITH base AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |m AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
           |  list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bg
           | FROM base),
           |f AS (SELECT doc_id,
           |  CASE WHEN n > 0 THEN (n - len(list_distinct(toks)))::DOUBLE / n ELSE 0.0 END AS dup_t,
           |  CASE WHEN n > 0 THEN
           |   list_max(list_transform(list_distinct(toks), t -> len(list_filter(toks, x -> x = t))))::DOUBLE / n
           |  ELSE 0.0 END AS top_t,
           |  CASE WHEN len(bg) > 0 THEN (len(bg) - len(list_distinct(bg)))::DOUBLE / len(bg) ELSE 0.0 END AS dup_b
           | FROM m)
           |SELECT doc_id, dup_t AS dup_token_frac, top_t AS top_token_frac,
           | dup_b AS dup_bigram_frac,
           | (dup_t <= 0.95 AND top_t <= 0.2 AND dup_b <= 0.9) AS repetition_ok
           |FROM f""".stripMargin,

      // pattern scrubbing: replacement over the raw text + redaction
      // count over the ORIGINAL text (both engines: non-overlapping
      // left-to-right matches of a backreference-free pattern)
      "ta_scrub" ->
        """SELECT doc_id,
          | regexp_replace(text, '\b(customer|key|order)\b', '[REDACTED]', 'g') AS scrubbed,
          | len(regexp_extract_all(text, '\b(customer|key|order)\b'))::BIGINT AS n_redactions
          |FROM documents""".stripMargin,

      "ta_fingerprint" ->
        """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
          |FROM documents""".stripMargin,

      "ta_rolling_hash" ->
        s"SELECT doc_id, ${polySql("text")} AS rh FROM documents",

      "p_pipeline" ->
        s"""WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
           |d AS (SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM keep)),
           |base AS (SELECT doc_id, source, text, $ToksSql AS toks FROM d),
           |m AS (SELECT doc_id, source, toks, len(toks)::BIGINT AS n_tokens,
           |  CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, t -> len(t)))::DOUBLE / len(toks) ELSE 0.0 END AS mtl
           |  FROM base),
           |ok AS (SELECT doc_id, source, toks FROM m WHERE n_tokens >= 5 AND mtl >= 2 AND mtl <= 12),
           |h AS (SELECT doc_id, source, $hitCols FROM ok),
           |b AS (SELECT doc_id, source, h_de, h_en, h_es, h_fr, $bestExpr AS best FROM h)
           |SELECT source, $langCase AS lang_pred, count(*) AS n_docs
           |FROM b GROUP BY 1, 2""".stripMargin,

      // stratified hash sampling: the oracle reproduces the polynomial
      // id-hash bucket arithmetic, so the sampled SET is verified
      "p_sample_stratified" ->
        s"""SELECT doc_id, source FROM documents
           |WHERE (${polySql("doc_id::VARCHAR")} % 1000) <
           |  CASE WHEN source IN ('src0', 'src1') THEN 500 ELSE 200 END""".stripMargin,

      // sequence packing: per-source ws-token prefix sums cut into
      // 512-token bins (bin = where the doc's first token lands)
      "p_pack" ->
        """WITH t AS (SELECT doc_id, source,
          |  len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0))::BIGINT AS ws
          | FROM documents),
          |c AS (SELECT doc_id, source,
          |  (sum(ws) OVER (PARTITION BY source ORDER BY doc_id
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ws)::BIGINT AS tokens_before
          | FROM t)
          |SELECT doc_id, source, tokens_before,
          | (tokens_before // 512)::BIGINT AS bin,
          | (tokens_before % 512)::BIGINT AS bin_offset
          |FROM c""".stripMargin,

      "mm_features" -> {
        val slotSum = (j: Int) =>
          s"list_sum(list_transform(range(len(cs)), i -> CASE WHEN i % 4 = $j THEN cs[i+1] ELSE 0 END))"
        s"""WITH b AS (SELECT doc_id AS media_id,
           |  list_transform(string_split(text, ''), c -> ascii(c)) AS cs FROM documents),
           |s AS (SELECT media_id, ${slotSum(0)} AS s0, ${slotSum(3)} AS s3,
           |  greatest(len(cs) // 4, 1) AS per FROM b)
           |SELECT media_id,
           | round((s0::DOUBLE / 255.0 / per)::FLOAT::DOUBLE, 3) AS f0,
           | round((s3::DOUBLE / 255.0 / per)::FLOAT::DOUBLE, 3) AS f3
           |FROM s""".stripMargin
      },

      "mm_frame_sample" ->
        """SELECT doc_id AS media_id,
          | (n_chars * 10 // 1000 + 1)::BIGINT AS n_frames,
          | ((n_chars * 10 // 1000) * 1000)::BIGINT AS last_ts_ms
          |FROM documents""".stripMargin,

      "s_pre_analyze" ->
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 50),
          |x AS (SELECT doc_id, toks, unnest(toks) AS t, generate_subscripts(toks, 1) AS k FROM t)
          |SELECT doc_id, t,
          | (CASE WHEN k = 1 THEN 0 ELSE list_sum(list_transform(toks[1:k-1], w -> len(w) + 1)) END)::BIGINT AS s,
          | (CASE WHEN k = 1 THEN 0 ELSE list_sum(list_transform(toks[1:k-1], w -> len(w) + 1)) END)::BIGINT + len(t)::BIGINT AS e
          |FROM x""".stripMargin,

      "ft_doc_stats" ->
        s"""SELECT doc_id, len($ToksSql)::BIGINT AS dl FROM documents""".stripMargin,

      "ft_dictionary" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2)
           |SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1""".stripMargin,

      "ft_corpus_stats" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1)
           |SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
           | round((SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents), 6) AS avgdl,
           | (SELECT count(DISTINCT term) FROM toks)::BIGINT AS n_terms""".stripMargin,

      "ft_bm25_topk" -> ftTopkSql,

      "ft_bm25_filtered" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
           |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
           |scores AS (
           | SELECT tf.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           | WHERE tf.doc_id % 3 = 0
           | GROUP BY tf.doc_id)
           |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
           | doc_id, round(s, 4) AS score
           |FROM scores ORDER BY rank LIMIT 20""".stripMargin,

      "ft_bm25_boolean" -> ftBooleanSql,
      "ft_bm25_mm" -> ftMmSql,
      "ft_bm25_prefix" -> ftPrefixSql,
      "ft_bm25_wildcard" -> ftWildcardSql,
      "ft_query_string" -> ftQueryStringSql,
      "ft_terms" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term FROM toks GROUP BY 1, 2)
           |SELECT term, count(*)::BIGINT AS df FROM tf
           |WHERE term LIKE 's%' GROUP BY 1
           |ORDER BY df DESC, term ASC LIMIT 15""".stripMargin,
      "ft_bm25_fuzzy" -> ftFuzzySql,
      "ft_bm25_boosted" -> ftBoostedSql,
      "ft_more_like_this" -> ftMltSql,
      "ft_collapse" -> ftCollapseSql,
      "ft_group_topk" -> ftGroupSql,
      "ft_search_after" -> ftSearchAfterSql,
      "ft_facet_query" -> ftFacetQuerySql,
      "ft_highlight" -> ftHighlightSql,
      "ft_term_vectors" -> ftTermVectorsSql,
      "ft_elevate" -> ftElevateSql,
      "ft_keywords" -> ftKeywordsSql,
      "ft_lm_dirichlet" -> ftLmDirichletSql,
      // synonym groups (scan|sort), (merge|join): tf summed per group
      // before tfNorm, idf from the group's max member df
      "ft_bm25_synonyms" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |sel AS (SELECT doc_id, term,
           |  CASE WHEN term IN ('scan', 'sort') THEN 0 ELSE 1 END AS grp
           | FROM toks WHERE term IN ('scan', 'sort', 'merge', 'join')),
           |tfg AS (SELECT doc_id, grp, count(*)::BIGINT AS tf FROM sel GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
           |mdf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM sel GROUP BY 1),
           |gdf AS (SELECT CASE WHEN term IN ('scan', 'sort') THEN 0 ELSE 1 END AS grp,
           |  max(df) AS df FROM mdf GROUP BY 1),
           |scores AS (
           | SELECT tfg.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tfg JOIN gdf USING (grp) JOIN dl USING (doc_id) CROSS JOIN stats
           | GROUP BY tfg.doc_id)
           |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
           | doc_id, round(s, 4) AS score
           |FROM scores ORDER BY rank LIMIT 20""".stripMargin,
      // realtime get: by-id doc-store fetch through the delta overlays;
      // the final corpus equals documents, ids derived from count(*)
      "ft_rtg" ->
        """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents)
          |SELECT doc_id, text FROM documents, nn
          |WHERE doc_id IN (0, n // 5, (n * 9) // 10, n - 1)""".stripMargin,
      // unigram token entropy via H = ln(n) - sum(tf*ln tf)/n
      "ta_entropy" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2)
           |SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
           | round(ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf), 6) AS entropy
           |FROM tf GROUP BY 1""".stripMargin,
      "ft_join" -> ftJoinSql,
      "ft_boost_by_field" -> ftBoostByFieldSql,
      "ft_rerank" -> ftRerankSql,
      "ft_collate" -> ftCollateSql,
      "ta_lm_quality" ->
        s"""WITH t AS (SELECT doc_id, $ToksSql AS ts FROM documents),
           |bi AS (SELECT doc_id,
           |  unnest(list_slice(ts, 1, len(ts) - 1)) AS a,
           |  unnest(list_slice(ts, 2, len(ts))) AS b
           | FROM t WHERE len(ts) >= 2),
           |cab AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM bi GROUP BY 1, 2),
           |ca AS (SELECT a, count(*)::BIGINT AS c_a FROM bi GROUP BY 1),
           |v AS (SELECT count(DISTINCT term)::BIGINT AS vs
           |      FROM (SELECT unnest(ts) AS term FROM t)),
           |lp AS (SELECT bi.doc_id,
           |  ln((c_ab + 0.1) / (c_a + 0.1 * vs)) AS lp
           | FROM bi JOIN cab USING (a, b) JOIN ca USING (a) CROSS JOIN v)
           |SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           | round(-avg(lp), 6) AS nll
           |FROM lp GROUP BY 1""".stripMargin,
      // temperature mixing: keep_rate = sqrt(n_s)/max sqrt(n_s); u and
      // the rate are IEEE-exact on both engines (sqrt + div + 1e6 grid)
      "p_temperature_mix" ->
        s"""WITH d AS (SELECT doc_id, (n_chars // 100)::BIGINT AS stratum FROM documents),
           |c AS (SELECT stratum, count(*)::BIGINT AS n_s FROM d GROUP BY 1),
           |m AS (SELECT max(sqrt(n_s)) AS mx FROM c),
           |r AS (SELECT d.doc_id, d.stratum, sqrt(c.n_s) / m.mx AS keep_rate,
           |  (${polySql("'mix-' || d.doc_id::VARCHAR || '-salt'")} % 1000000)::DOUBLE / 1000000.0 AS u
           | FROM d JOIN c USING (stratum) CROSS JOIN m)
           |SELECT doc_id, stratum, round(keep_rate, 6) AS keep_rate
           |FROM r WHERE u < keep_rate""".stripMargin,

      // sharded export round trip: the oracle summarizes the SOURCE
      // table; the entry summarizes what was read back from disk
      "p_export_shards" ->
        s"""SELECT (doc_id % 8)::BIGINT AS shard, count(*)::BIGINT AS n_docs,
           | sum(${polySql("text")})::BIGINT AS content_sum
           |FROM documents GROUP BY 1""".stripMargin,

      "p_domain_cap" ->
        """SELECT doc_id, source FROM (
          | SELECT doc_id, source,
          |  row_number() OVER (PARTITION BY source
          |    ORDER BY n_chars DESC, doc_id ASC) AS rn
          | FROM documents) WHERE rn <= 30""".stripMargin,

      "ft_bm25_phrase" -> ftPhraseSql,
      "ft_bm25_near" -> ftNearSql,
      "ft_bm25_near_unordered" -> ftNearUnorderedSql,

      // the one-job mixed batch = the six per-shape oracles tagged
      // by query_id (searchManyMixed must equal per-shape serving)
      "ft_bm25_mixed" ->
        s"""SELECT 'free' AS query_id, rank, doc_id, score FROM ($ftTopkSql)
           |UNION ALL
           |SELECT 'bool' AS query_id, rank, doc_id, score FROM ($ftBooleanSql)
           |UNION ALL
           |SELECT 'phrase' AS query_id, rank, doc_id, score FROM ($ftPhraseSql)
           |UNION ALL
           |SELECT 'mm' AS query_id, rank, doc_id, score FROM ($ftMmSql)
           |UNION ALL
           |SELECT 'prefix' AS query_id, rank, doc_id, score FROM ($ftPrefixSql)
           |UNION ALL
           |SELECT 'fuzzy' AS query_id, rank, doc_id, score FROM ($ftFuzzySql)""".stripMargin,

      // the full text_en-analog chain: v1 → stop filter → Porter stem.
      // dl is the STOP-chain length (stemming is length-preserving);
      // terms go through the engine-computed (token → stem) map over
      // the generator's closed vocabulary (StemToksSql)
      "ft_bm25_stem" ->
        s"""WITH toks AS (SELECT doc_id, unnest($StemToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
           |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftStemTermsIn GROUP BY 1),
           |scores AS (
           | SELECT tf.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           | GROUP BY tf.doc_id)
           |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
           | doc_id, round(s, 4) AS score
           |FROM scores ORDER BY rank LIMIT 20""".stripMargin,

      // the v1+stop chain: same BM25 shape, tokens stop-filtered — dl,
      // avgdl, and every score shift, so an index built with the wrong
      // chain cannot hash-match
      "ft_bm25_stop" ->
        s"""WITH toks AS (SELECT doc_id, unnest($StopToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
           |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
           |scores AS (
           | SELECT tf.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           | GROUP BY tf.doc_id)
           |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
           | doc_id, round(s, 4) AS score
           |FROM scores ORDER BY rank LIMIT 20""".stripMargin,

      // oracle over the FINAL corpus: the incremental index (base →
      // update/delete/append delta) must land exactly here
      "ft_incremental" -> ftIncrementalSql,

      // compaction is content-preserving: the compacted fixture must
      // land on the SAME final-corpus oracle as ft_incremental
      "ft_compacted" -> ftIncrementalSql,

      // facet counts over the FULL boolean match set (must: batch AND
      // window, not: dup), grouped by source — the match set is
      // relational (never collected), so the oracle is plain SQL over
      // the same predicate
      "ft_facets" ->
        s"""WITH t AS (SELECT doc_id, source, $ToksSql AS toks FROM documents)
           |SELECT source, count(*)::BIGINT AS n_docs
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |GROUP BY source""".stripMargin,

      // stats faceting over the same boolean match set: exact integer
      // aggregates of n_chars per source (no floats cross the gate)
      "ft_facet_stats" ->
        s"""WITH t AS (SELECT doc_id, source, n_chars, $ToksSql AS toks FROM documents)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  min(n_chars)::BIGINT AS min_v, max(n_chars)::BIGINT AS max_v,
           |  sum(n_chars)::BIGINT AS sum_v
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |GROUP BY source""".stripMargin,

      // block join: child scores (rounded) roll up to parents by MAX,
      // parents ranked (score desc, parent_id asc)
      "ft_block_join" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
           |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
           |scores AS (
           | SELECT tf.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           | GROUP BY tf.doc_id),
           |p AS (SELECT (doc_id // 10)::BIGINT AS parent_id, round(s, 4) AS cs FROM scores),
           |agg AS (SELECT parent_id, max(cs) AS score, count(*)::BIGINT AS n_children
           |        FROM p GROUP BY 1)
           |SELECT row_number() OVER (ORDER BY score DESC, parent_id ASC) AS rank,
           | parent_id, score, n_children
           |FROM agg ORDER BY rank LIMIT 20""".stripMargin,

      // atomic update: plain BM25 over the CASE-patched corpus (the
      // same ~2% band atomicSet patched through the delta machinery)
      "ft_atomic_update" ->
        s"""WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
           |d AS (SELECT doc_id,
           |  CASE WHEN doc_id >= n // 4 AND doc_id < n // 4 + greatest(1, n // 50)
           |       THEN text || ' patched dup' ELSE text END AS text
           | FROM documents CROSS JOIN nn),
           |toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM d),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
           |stats AS (SELECT (SELECT count(*) FROM d)::BIGINT AS n,
           |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM d) AS avgdl),
           |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftTermsIn GROUP BY 1),
           |scores AS (
           | SELECT tf.doc_id,
           |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
           | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           | GROUP BY tf.doc_id)
           |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
           | doc_id, round(s, 4) AS score
           |FROM scores ORDER BY rank LIMIT 20""".stripMargin,

      // graph query: bounded recursive closure, min depth per doc
      "ft_graph" ->
        s"""WITH RECURSIVE t0 AS (SELECT doc_id, $ToksSql AS toks,
           |  doc_id % 37 AS f, (doc_id * 7 + 3) % 37 AS t FROM documents),
           |roots AS (SELECT doc_id FROM t0
           | WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |   AND NOT list_contains(toks, 'dup')),
           |reach(doc_id, depth) AS (
           |  SELECT doc_id, 0::BIGINT AS depth FROM roots
           |  UNION
           |  SELECT m2.doc_id, r.depth + 1
           |  FROM reach r JOIN t0 m1 ON m1.doc_id = r.doc_id
           |       JOIN t0 m2 ON m2.t = m1.f
           |  WHERE r.depth < 3)
           |SELECT doc_id, min(depth)::BIGINT AS depth
           |FROM reach GROUP BY 1""".stripMargin,

      // stats percentiles: exact R-7 quantiles (quantile_cont ==
      // Spark percentile), rounded on both sides
      "ft_facet_stats_pct" ->
        s"""WITH t AS (SELECT doc_id, source, n_chars, $ToksSql AS toks FROM documents)
           |SELECT source, count(*)::BIGINT AS n_docs,
           |  round(quantile_cont(n_chars, 0.5), 4) AS p_lo,
           |  round(quantile_cont(n_chars, 0.95), 4) AS p_hi
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |GROUP BY source""".stripMargin,

      // pivot faceting: the same match set counted per (source, lang)
      "ft_facet_pivot" ->
        s"""WITH t AS (SELECT doc_id, source, lang, $ToksSql AS toks FROM documents)
           |SELECT source, lang, count(*)::BIGINT AS n_docs
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |GROUP BY source, lang""".stripMargin,

      // range faceting: width-100 bins of n_chars, mincount=1 —
      // identical bin arithmetic (start + width * floor((v-start)/width))
      "ft_facet_range" ->
        s"""WITH t AS (SELECT doc_id, n_chars, $ToksSql AS toks FROM documents)
           |SELECT (0 + 100 * floor((n_chars - 0) / 100.0))::BIGINT AS bin_start,
           |  count(*)::BIGINT AS n_docs
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |GROUP BY 1""".stripMargin,

      // sort-by-field serving: the 20 longest matching docs, doc_id
      // tie-break (deterministic LIMIT on both sides)
      "ft_sort_by_field" ->
        s"""WITH t AS (SELECT doc_id, n_chars, $ToksSql AS toks FROM documents)
           |SELECT doc_id, n_chars
           |FROM t
           |WHERE list_contains(toks, 'batch') AND list_contains(toks, 'window')
           |  AND NOT list_contains(toks, 'dup')
           |ORDER BY n_chars DESC, doc_id ASC LIMIT 20""".stripMargin,

      // spellcheck/suggest: nearest dictionary terms to 'par' ordered
      // (distance asc, df desc, term asc) — DuckDB's levenshtein is
      // the same unit-cost distance as Spark's
      "ft_suggest" ->
        s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
           |dict AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
           |SELECT term, levenshtein(term, 'par')::BIGINT AS distance, df
           |FROM dict WHERE levenshtein(term, 'par') <= 2
           |ORDER BY distance ASC, df DESC, term ASC LIMIT 5""".stripMargin
    )
  }

  private lazy val ftIncrementalSql = {
    val ftIncTermsIn = inList(FtQueryIncTerms)
    s"""WITH toks AS (SELECT doc_id, unnest($ToksSql) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM toks GROUP BY 1),
       |stats AS (SELECT (SELECT count(*) FROM documents)::BIGINT AS n,
       |  (SELECT coalesce(sum(dl), 0)::DOUBLE FROM dl) / (SELECT count(*) FROM documents) AS avgdl),
       |dfs AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN $ftIncTermsIn GROUP BY 1),
       |scores AS (
       | SELECT tf.doc_id,
       |  sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * (tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))) AS s
       | FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       | GROUP BY tf.doc_id)
       |SELECT row_number() OVER (ORDER BY round(s, 4) DESC, doc_id ASC) AS rank,
       | doc_id, round(s, 4) AS score
       |FROM scores ORDER BY rank LIMIT 20""".stripMargin
  }
}
