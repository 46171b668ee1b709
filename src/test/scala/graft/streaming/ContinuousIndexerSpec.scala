package graft.streaming

import graft.SparkFunSuite
import graft.index.{BuildConfig, IndexBuilder}
import graft.model.Turn
import graft.query.IndexReader
import graft.sources.SyntheticTranscripts
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * The steady-state scan→index loop: each cycle spools what the stream
 * has, then incrementally brings the index up to date. Pins:
 *
 *  - cycle 2 takes the DELTA path (only the appended docs' segments
 *    rebuilt, the first cycle's untouched segments skipped);
 *  - a third cycle with nothing new is a no-op (content-hash
 *    short-circuit — the reference scanner's "remembered id" skip);
 *  - the final index answers queries identically to a from-scratch
 *    full rebuild of the same corpus.
 */
class ContinuousIndexerSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("cycles: spool → delta build; idle cycle no-op; equals full rebuild") {
    val spool = tmpDir("ci-spool"); val ckpt = tmpDir("ci-ckpt")
    val idx = tmpDir("ci-idx"); val idxFull = tmpDir("ci-idx-full")
    val cfg = BuildConfig(idx, nSegments = 6, waveSize = 6)

    val waveA = (0 until 40).map(i => SyntheticTranscripts.makeTurn(3L, i % 8, i / 8))
    val waveB = (0 until 24).map(i => SyntheticTranscripts.makeTurn(3L, 8 + i % 4, i / 4))

    val mem = MemoryStream[Turn]
    mem.addData(waveA)
    val rep1 = ContinuousIndexer.cycle(spark, mem.toDS(), None, spool, ckpt, cfg)
    assert(rep1.segmentsBuilt == 6 && rep1.nDocs == 40)

    mem.addData(waveB)
    val rep2 = ContinuousIndexer.cycle(spark, mem.toDS(), None, spool, ckpt, cfg)
    assert(rep2.nDocs == 64)
    // delta path: appends touch the tail segments only
    assert(rep2.segmentsBuilt > 0 && rep2.segmentsBuilt < 6,
      s"expected a partial delta, got ${rep2.segmentsBuilt}/6")

    // idle cycle: nothing new arrived → content hash matches → no-op
    val rep3 = ContinuousIndexer.cycle(spark, mem.toDS(), None, spool, ckpt, cfg)
    assert(rep3.segmentsBuilt == 0 && rep3.nDocs == 64)

    // equality with a from-scratch full rebuild of the same corpus
    IndexBuilder.build(spark,
      StreamingIngest.readSpool(spark, spool),
      BuildConfig(idxFull, nSegments = 6, waveSize = 6))
    val q = "user assistant bash" // head tokens folded into every synthetic turn
    val inc = new IndexReader(spark, idx).search(q, 20)
    val full = new IndexReader(spark, idxFull).search(q, 20)
    assert(inc == full, s"incremental $inc != full $full")
    assert(inc.nonEmpty)
  }

  test("auto-compaction: overlays folded once they cross the segment-fraction threshold; queries unchanged") {
    val spool = tmpDir("ci-ac-spool"); val ckpt = tmpDir("ci-ac-ckpt")
    val idx = tmpDir("ci-ac-idx")
    // threshold low enough that a couple of delta cycles cross it;
    // compaction is content-preserving, so the only observable change
    // is the overlay dirs folding away
    val cfg = BuildConfig(idx, nSegments = 6, waveSize = 6,
      autoCompactFraction = 0.25)

    val mem = MemoryStream[Turn]
    mem.addData((0 until 36).map(i => SyntheticTranscripts.makeTurn(5L, i % 6, i / 6)))
    ContinuousIndexer.cycle(spark, mem.toDS(), None, spool, ckpt, cfg)
    assert(IndexBuilder.overlaidSegments(idx).isEmpty) // full build: no overlays

    // delta cycles keep appending; each touches the tail segments and
    // would leave overlay dirs behind — the threshold folds them
    var cycles = 0
    var sawOverlayFold = false
    for (w <- 1 to 3) {
      mem.addData((0 until 12).map(i =>
        SyntheticTranscripts.makeTurn(5L, 6 + w * 4 + i % 4, i / 4)))
      ContinuousIndexer.cycle(spark, mem.toDS(), None, spool, ckpt, cfg)
      cycles += 1
      val over = IndexBuilder.overlaidSegments(idx)
      // with fraction 0.25 of 6+ segments, at most 1-2 overlays may
      // linger below threshold; crossing it must fold them away
      if (over.isEmpty && cycles >= 1) sawOverlayFold = true
      assert(over.size <= math.max(1, (0.25 * 12).toInt + 1),
        s"overlays accumulated past the threshold: $over")
    }
    assert(sawOverlayFold, "auto-compaction never triggered across 3 delta cycles")

    // content preserved: equals a from-scratch rebuild of the same corpus
    val idxFull = tmpDir("ci-ac-full")
    IndexBuilder.build(spark, StreamingIngest.readSpool(spark, spool),
      BuildConfig(idxFull, nSegments = 6, waveSize = 6))
    val q = "user assistant bash"
    val inc = new IndexReader(spark, idx).search(q, 20)
    val full = new IndexReader(spark, idxFull).search(q, 20)
    assert(inc == full && inc.nonEmpty)
  }
}
