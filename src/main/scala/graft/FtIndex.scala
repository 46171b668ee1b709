package graft

import graft.index.{BuildConfig, IndexBuilder}
import graft.model.Turn
import graft.query.IndexReader
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Memoized fulltext index over a test-data `documents` table, used by
 * the SparkEntry `ft_*` correctness queries and the benchmark.
 *
 * The documents table stands in for the transcript corpus: each doc
 * becomes a single-turn conversation with `conv_id = "doc-%010d"`, so
 * the engine's global (conv_id, turn_idx) sort order equals numeric
 * doc_id order and the assigned dense docIDs are recoverable from
 * conv_id — the oracle compares on the ORIGINAL doc_id, never on any
 * engine-internal id.
 */
object FtIndex {

  /** Bump to invalidate /tmp caches when the index layout changes. */
  private val CacheVersion = 5

  private val built = scala.collection.mutable.Set[String]()

  def indexDir(sfDir: String): String = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    s"/tmp/graft_ftidx_v$CacheVersion/$name"
  }

  /** The documents table as a Dataset[Turn] (the engine's input shape). */
  def docsAsTurns(spark: SparkSession, sfDir: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        format_string("doc-%010d", col("doc_id")).as("conv_id"),
        lit(0).as("turn_idx"),
        lit("doc").as("role"),
        col("text"),
        lit("").as("tool"),
        lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"))
      .as[Turn]
  }

  /** Build (or resume — content-hash-checked) the index; idempotent
    * and memoized per JVM. Returns the index directory. */
  def ensure(spark: SparkSession, sfDir: String): String = synchronized {
    val out = indexDir(sfDir)
    if (!built.contains(out)) {
      IndexBuilder.build(spark, docsAsTurns(spark, sfDir),
        BuildConfig(out, nSegments = 8, waveSize = 8))
      built += out
    }
    out
  }

  def reader(spark: SparkSession, sfDir: String): IndexReader =
    new IndexReader(spark, ensure(spark, sfDir))

  /** Original doc_id parsed back out of the engine conv_id
    * ("doc-%010d" → the zero-padded digits; safe for doc_id 0). */
  def origId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(c, 5, 10).cast("long")

  /** doc_stats with the original doc_id restored. */
  def docStats(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = ensure(spark, sfDir)
    spark.read.parquet(IndexBuilder.docStatsDir(dir))
      .select(origId(col("conv_id")).as("doc_id"), col("dl").cast("long").as("dl"))
  }
}
