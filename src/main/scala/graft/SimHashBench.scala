package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused micro-benchmark: the SimHash vote kernel — native one-pass
  * [[graft.functions.SimHashExpr]] vs the declarative per-bit
  * `aggregate` fold it replaced (the production 64-bit near-dup
  * fingerprint path). Alternating same-window passes over a real
  * transcript corpus; checksum parity guards the comparison. */
object SimHashBench {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft_bench_corpus/c960000")
    val bits = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val nDocs = args.drop(2).headOption.map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // capped + repartitioned: the declarative arm is slow enough that a
    // full 5 M-doc pass would take tens of minutes on its own
    val docs = spark.read.parquet(corpus).select(col("text"))
      .limit(nDocs.toInt).repartition(32).persist()
    docs.count() // materialize outside the timed region
    val th = transform(array_distinct(Dedup.tokens(col("text"))), t => xxhash64(t))

    def time(tag: String, c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      // checksum mod a prime: summing millions of raw 64-bit
      // fingerprints overflows ANSI long arithmetic
      val s = docs.select(c.as("h"))
        .agg(sum(pmod(col("h"), lit(1000000007L)))).head().getLong(0)
      println(f"$tag: wall=${(System.nanoTime() - t0) / 1e9}%.2f s checksum=$s")
      s
    }
    var ok = true
    for (round <- Seq("warm", "a", "b")) {
      // fused: tokenize → dedupe → hash → vote in ONE scan, no token array
      val sf = time(s"fused_$round", Dedup.simHashText(col("text"), bits, poly = false))
      // native votes, but the distinct-token-hash array still built
      // through interpreted transform/filter (the round-4 mid state)
      val sn = time(s"native_$round", Dedup.simHashBits(th, bits))
      val sd = time(s"decl_$round", Dedup.simHashDecl(th, bits))
      ok &= sn == sd && sf == sd
    }
    println(s"parity: ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
  }
}
