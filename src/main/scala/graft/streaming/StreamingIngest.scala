package graft.streaming

import graft.model.Turn
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Running per-conversation state for [[StreamingIngest.conversationSummaries]].
  * `lastTsMs` is the running max event time — the timeout must be
  * monotone in it, or a late (within-watermark) batch would pull the
  * deadline earlier and finalize prematurely. */
case class ConvState(nTurns: Long, minTurn: Int, maxTurn: Int,
                     contentHash: Long, lastTsMs: Long)

/** One finalized conversation emitted when it goes idle past the gap. */
case class ConvSummary(conv_id: String, n_turns: Long, min_turn: Int,
                       max_turn: Int, content_hash: Long)

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

  /**
   * Custom keyed state (`flatMapGroupsWithState` + event-time
   * timeout): per-conversation progress tracking that emits ONE
   * summary row — turn count, turn_idx span, order-insensitive
   * content hash (xor of the same per-turn hash the index's change
   * detection uses) — when the conversation goes idle past
   * `gapMs` of event time. The streaming form of the reference
   * scanner's per-source bookkeeping: state lives per key, is updated
   * incrementally as turns arrive (arbitrarily across micro-batches),
   * and is dropped on finalization, so memory is O(live
   * conversations), never O(history).
   */
  def conversationSummaries(turns: Dataset[Turn],
                            gapMs: Long = 30L * 60 * 1000): Dataset[ConvSummary] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvSummary(convId, s.nTurns, s.minTurn, s.maxTurn, s.contentHash))
          } else {
            var s = state.getOption.getOrElse(
              ConvState(0L, Int.MaxValue, Int.MinValue, 0L, Long.MinValue))
            rows.foreach { t =>
              s = ConvState(s.nTurns + 1,
                math.min(s.minTurn, t.turn_idx), math.max(s.maxTurn, t.turn_idx),
                s.contentHash ^ graft.index.RowHash.turnHash(t),
                if (t.ts == null) s.lastTsMs else math.max(s.lastTsMs, t.ts.getTime))
            }
            state.update(s)
            // finalize when event time passes the conversation's last
            // activity + gap; monotone in the RUNNING max (a late
            // in-order-violating batch must never pull it earlier),
            // and clamped above the current watermark — Spark rejects
            // a timeout at or below it, which a null-ts row arriving
            // after the gap already elapsed would otherwise produce
            val base =
              if (s.lastTsMs == Long.MinValue) state.getCurrentWatermarkMs()
              else s.lastTsMs
            state.setTimeoutTimestamp(
              math.max(base + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
