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

  test("raw-field mirrors == SQL xxhash64 forms (incl. null fields)") {
    import org.apache.spark.unsafe.types.UTF8String
    def u8(s: String) = if (s == null) null else UTF8String.fromString(s)
    val rows = Seq(
      ("conv-1", 3, "user", "hello WORLD 42", "bash"),
      ("", 0, "", "", ""),
      ("c", -1, null, "üñíçødé 😀", null))
    val sql = rows.toDF("conv_id", "turn_idx", "role", "text", "tool")
      .select(col("conv_id"),
        xxhash64(col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool")).as("th"),
        xxhash64(col("role"), col("text"), col("tool")).as("ch"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (c, i, ro, te, to) =>
      assert(RowHash.turnHashRaw(u8(c), i, u8(ro), u8(te), u8(to)) == sql(c)._1, s"turnHashRaw $c")
      assert(RowHash.contentHashRaw(u8(ro), u8(te), u8(to)) == sql(c)._2, s"contentHashRaw $c")
    }
  }
}
