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
}
