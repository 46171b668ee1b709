package graft.streaming

import graft.index.{BuildConfig, BuildReport, IndexBuilder}
import graft.model.Turn
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * The reference's steady-state loop — poll the source, dedup, feed the
 * pipeline, index (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/model/impl/ScannerImpl.java:219-258`)
 * — as one composable "cycle": spool whatever the stream has available
 * (exactly-once per micro-batch, [[StreamingIngest.start]]), then
 * bring the index up to date over base ∪ spool with
 * [[graft.index.IndexBuilder.build]], which routes to the incremental
 * delta path when the index already exists (per-doc hash diff →
 * touched-segment overlays; untouched segments stay byte-identical).
 *
 * Streaming handles arrival and bookkeeping; the heavy
 * global-sort/index work stays batch — a stream cannot finalize the
 * total (conv_id, turn_idx) order dense docIDs need, so this is the
 * standard lambda split for an inverted index. Run `cycle` on the
 * reference's scan interval (its default: 30 min) or behind any
 * scheduler; every piece is idempotent, so a crashed cycle re-runs
 * from its ledgers (spool batches overwrite their own partition, the
 * build anti-plans against the segment manifest).
 */
object ContinuousIndexer {

  /** One scan-and-index cycle. Returns the build report (a no-op
    * report with zero segments built when nothing changed — the
    * content-hash check short-circuits). */
  def cycle(spark: SparkSession, stream: Dataset[Turn],
            base: Option[Dataset[Turn]], spoolDir: String,
            checkpointDir: String, cfg: BuildConfig,
            watermark: String = "10 minutes"): BuildReport = {
    val q = StreamingIngest.start(spark, stream, spoolDir, checkpointDir, watermark)
    q.awaitTermination()
    val spooled = StreamingIngest.readSpool(spark, spoolDir)
    val turns = base.fold(spooled)(_.unionByName(spooled))
    IndexBuilder.build(spark, turns, cfg)
  }
}
