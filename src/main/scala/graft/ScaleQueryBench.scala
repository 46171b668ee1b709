package graft

import org.apache.spark.sql.SparkSession

/**
 * Query-side SCALE observation: run the round bench's exact serving
 * battery ([[Bench.queryLatencies]]: BM25 / boolean / phrase p95 at
 * k=10, batched qps, single-node LocalIndex p95) against an EXISTING
 * index built at any corpus size — used for the committed 10×
 * (52.8 M-turn) serving numbers in BASELINE.md, where the per-round
 * bench only exercises sf0.1.
 *
 *   ScaleQueryBench <indexDir> <corpusDir> [cpus] [skipLocal]
 *
 * Prints one JSON line, same key names as the round bench so numbers
 * are directly comparable across corpus sizes.
 */
object ScaleQueryBench {
  def main(args: Array[String]): Unit = {
    val Array(idxDir, corpusDir, rest @ _*) = args: @unchecked
    val cpus = rest.headOption.getOrElse("32").toInt
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-query-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
      b.config("spark.local.dir", "/dev/shm/graft-spark-local")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val results = Bench.queryLatencies(s, idxDir, corpusDir,
      includeLocal = !rest.contains("skipLocal"))
    val nDocs = new graft.query.IndexReader(s, idxDir).stats.n_docs
    s.stop()
    val qs = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_query","unit":"sec","queries":$qs,"index":"$idxDir","n_docs":$nDocs}""")
  }
}
