package graft

import graft.index.{BuildConfig, IndexBuilder}
import org.apache.spark.sql.SparkSession

/** Focused micro-benchmark: same-window cost of per-posting position
  * storage (format v3) — alternating storePositions=true/false builds
  * of the same materialized corpus, reporting wall and postings bytes.
  * Isolates the positions encode/write cost from host-load drift the
  * way the main bench's pairing isolates scaling. */
object PosBench {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft_bench_corpus/c960000")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val turns = spark.read.parquet(corpus).as[graft.model.Turn]
    for ((sp, tag) <- Seq((true, "warm"), (true, "pos1"), (false, "nopos1"),
                          (true, "pos2"), (false, "nopos2"))) {
      val dir = s"/dev/shm/posbench_$tag"
      graft.store.Manifest.deleteRecursively(java.nio.file.Paths.get(dir))
      val t0 = System.nanoTime()
      IndexBuilder.build(spark, turns, BuildConfig(dir, storePositions = sp))
      val bytes = java.nio.file.Files
        .walk(java.nio.file.Paths.get(IndexBuilder.postingsDir(dir)))
        .filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      println(f"$tag: wall=${(System.nanoTime() - t0) / 1e9}%.1f s postingsBytes=$bytes")
      graft.store.Manifest.deleteRecursively(java.nio.file.Paths.get(dir))
    }
    spark.stop()
  }
}
