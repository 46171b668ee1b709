package graft.index

import graft.SparkFunSuite
import graft.model.Turn
import graft.sources.SyntheticTranscripts
import org.apache.spark.sql.functions._

/** The Scala-side turn hash must equal the SQL expression
  * xxhash64(conv_id, turn_idx, role, text, tool) bit-for-bit — the
  * fresh-build accumulator hash and the resume-path scan hash must be
  * the same function or change detection breaks silently. */
class RowHashSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("turnHash == SQL xxhash64 over a synthetic corpus + edge rows") {
    val corpus = SyntheticTranscripts.generate(spark, 11L, nConvs = 50)
      .collect().toSeq ++ Seq(
      Turn("", 0, "", "", "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
      Turn("c", -1, "röle", "üñíçødé 😀", "t", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
    val sql = corpus.toDS().select(col("conv_id"), col("turn_idx"),
        xxhash64(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool")).as("h"))
      .as[(String, Int, Long)].collect()
      .map { case (c, i, h) => (c, i) -> h }.toMap
    corpus.foreach { t =>
      assert(RowHash.turnHash(t) == sql((t.conv_id, t.turn_idx)), s"turn ${t.conv_id}#${t.turn_idx}")
    }
  }
}
