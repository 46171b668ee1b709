package graft.streaming

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured-Streaming ingest — the reference's polling `Scanner`
 * loop re-expressed (`model/impl/ScannerImpl.java:219-258`: 25 ms
 * poll, dedup by remembered id, feed the DAG). Here the poll loop is
 * the micro-batch trigger, the "remembered ids" dedup is
 * `dropDuplicates` under a watermark plus an idempotent
 * append-per-batch, and the FTI status ledger is the per-batch
 * manifest row the sink writes atomically with the data.
 *
 * The stream lands turns into a SPOOL table (parquet, partitioned by
 * ingest batch); the batch [[graft.index.IndexBuilder]] then indexes
 * spool + base — streaming handles arrival/exactly-once bookkeeping,
 * the heavy global-sort/index work stays batch, which is the standard
 * lambda split for an inverted index (docIDs need a total order that
 * a stream cannot finalize early).
 */
object StreamingIngest {

  /** Start spooling a turn stream. Exactly-once per micro-batch:
    * foreachBatch writes `batch=<id>` partitions idempotently (re-run
    * batches overwrite their own partition, the reference's
    * at-most-once potent-step skip made stronger —
    * `StepImpl.java:632-651`). */
  def start(spark: SparkSession, turns: Dataset[Turn], spoolDir: String,
            checkpointDir: String,
            watermark: String = "10 minutes"): StreamingQuery = {
    turns
      .withWatermark("ts", watermark)
      .dropDuplicates("conv_id", "turn_idx") // scanner dedup memory
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        batch.write.mode("overwrite")
          .parquet(s"$spoolDir/batch=$batchId")
        graft.store.Manifest.writeAtomic(
          java.nio.file.Paths.get(spoolDir, "_manifest", f"batch-$batchId%09d.json"),
          Map("batch" -> batchId.toString,
            "status" -> graft.store.Manifest.Complete,
            "turns" -> batch.count().toString))
        ()
      }
      .start()
  }

  /** Read everything spooled so far as one Dataset[Turn]. */
  def readSpool(spark: SparkSession, spoolDir: String): Dataset[Turn] = {
    import spark.implicits._
    spark.read.option("basePath", spoolDir)
      .parquet(s"$spoolDir/batch=*")
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[Turn]
  }

  /** Streaming quality metrics with event-time windows + watermark:
    * turns and mean doc length per (window, role) — the streaming
    * analog of the reference's DocumentCounter test processor
    * (`processors/DocumentCounter.java`). Returns a streaming
    * DataFrame the caller sinks (memory sink in tests). */
  def turnMetrics(turns: Dataset[Turn], window: String = "1 hour",
                  watermark: String = "10 minutes"): DataFrame =
    turns
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("role"))
      .agg(count(lit(1)).as("n_turns"),
        avg(length(col("text"))).as("mean_chars"))
}
