package graft.streaming

import graft.SparkFunSuite
import graft.model.Turn
import graft.sources.SyntheticTranscripts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Structured-Streaming ingest specs: scanner-style dedup under a
 * watermark, idempotent per-batch spool with manifest rows, and the
 * windowed metrics aggregation (SURVEY.md §2.1 Scanner → streaming
 * mapping; reference poll loop `ScannerImpl.java:219-258`).
 */
class StreamingIngestSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def turnsFixture: Seq[Turn] =
    (0 until 50).map(i => SyntheticTranscripts.makeTurn(7L, i % 10, i / 10))

  test("spool: stream lands all turns, dedups repeats, writes batch manifests") {
    val spool = tmpDir("spool"); val ckpt = tmpDir("spool-ckpt")
    val mem = MemoryStream[Turn]
    val fixture = turnsFixture
    mem.addData(fixture)
    mem.addData(fixture.take(10)) // duplicate arrivals (scanner re-scan)

    val q = StreamingIngest.start(spark, mem.toDS(), spool, ckpt)
    q.awaitTermination(120000)

    val landed = StreamingIngest.readSpool(spark, spool)
    // dropDuplicates within the run: every (conv_id, turn_idx) exactly once
    val dupCount = landed.groupBy("conv_id", "turn_idx").count()
      .filter($"count" > 1).count()
    assert(dupCount == 0)
    assert(landed.count() == 50)
    // per-turn text equality vs the fixture (input_hint invariant)
    val src = fixture.toDF()
    val mismatches = landed.toDF().join(src.select($"conv_id", $"turn_idx",
        $"text".as("src_text")), Seq("conv_id", "turn_idx"))
      .filter($"text" =!= $"src_text").count()
    assert(mismatches == 0)
    // manifest rows exist and sum to the landed count
    val mdir = java.nio.file.Paths.get(spool, "_manifest")
    val manifests = java.nio.file.Files.list(mdir).iterator()
    var total = 0L
    manifests.forEachRemaining { p =>
      val m = graft.store.Manifest.read(p).get
      assert(m("status") == graft.store.Manifest.Complete)
      total += m("turns").toLong
    }
    assert(total == 50)
  }

  test("spooled stream indexes identically to a batch read of the same turns") {
    val spool = tmpDir("spool2"); val ckpt = tmpDir("spool2-ckpt")
    val mem = MemoryStream[Turn]
    mem.addData(turnsFixture)
    StreamingIngest.start(spark, mem.toDS(), spool, ckpt).awaitTermination(120000)

    val viaStream = tmpDir("idx-stream"); val viaBatch = tmpDir("idx-batch")
    val cfgS = graft.index.BuildConfig(viaStream, nSegments = 4)
    val cfgB = graft.index.BuildConfig(viaBatch, nSegments = 4)
    graft.index.IndexBuilder.build(spark, StreamingIngest.readSpool(spark, spool), cfgS)
    graft.index.IndexBuilder.build(spark, turnsFixture.toDS(), cfgB)
    def fp(dir: String) = spark.read.parquet(graft.index.IndexBuilder.postingsDir(dir))
      .select(col("term"), col("segment"), col("block_id"), md5(col("doc_deltas")), md5(col("tfs")))
      .collect().map(_.toSeq.mkString("|")).toSet
    assert(fp(viaStream) == fp(viaBatch))
  }

  test("windowed metrics: event-time windows by role add up") {
    val mem = MemoryStream[Turn]
    mem.addData(turnsFixture)
    val q = StreamingIngest.turnMetrics(mem.toDS(), window = "1 hour")
      .writeStream.format("memory").queryName("metrics_t")
      .outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.sql("select role, sum(n_turns) from metrics_t group by role")
      .as[(String, Long)].collect().toMap
    q.stop()
    assert(rows.values.sum == 50)
    val wantRoles = turnsFixture.map(_.role).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows == wantRoles)
  }
}

/** Custom keyed state: flatMapGroupsWithState conversation summaries
  * with event-time timeout (prompt requirement: custom state via
  * KeyValueGroupedDataset). */
class ConversationStateSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(convId: String, idx: Int, sec: Long) =
    Turn(convId, idx, "user", s"text $convId $idx", "tool0",
      new java.sql.Timestamp(sec * 1000))

  test("idle conversation finalizes once: count, span, xor content hash; state dropped") {
    val mem = MemoryStream[Turn]
    val q = StreamingIngest.conversationSummaries(mem.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("convsum").outputMode("append")
      .option("checkpointLocation", tmpDir("convsum-ckpt")).start()
    try {
      mem.addData(t("a", 0, 100), t("a", 1, 160))
      q.processAllAvailable()
      mem.addData(t("b", 0, 1000)) // watermark sails past a's idle gap
      q.processAllAvailable()
      mem.addData(t("b", 1, 2000)) // next trigger fires a's timeout
      q.processAllAvailable()
      val rows = spark.table("convsum").as[ConvSummary].collect()
      val a = rows.filter(_.conv_id == "a")
      assert(a.length == 1) // exactly one finalization
      assert(a.head.n_turns == 2 && a.head.min_turn == 0 && a.head.max_turn == 1)
      val want = graft.index.RowHash.turnHash(t("a", 0, 100)) ^
        graft.index.RowHash.turnHash(t("a", 1, 160))
      assert(a.head.content_hash == want)
      assert(!rows.exists(_.conv_id == "b")) // b is still live (no timeout yet)
    } finally q.stop()
  }
}
