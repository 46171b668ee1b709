package graft.index

import graft.model.Turn
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Scala-side mirror of the SQL expression
 * `xxhash64(conv_id, turn_idx, role, text, tool)`: seed 42, each
 * child's hash chained as the next child's seed, null children
 * skipped — exactly Spark's HashExpression fold. Pinned equal to the
 * SQL form by RowHashSpec.
 *
 * Used to fold the corpus content hash into Phase A's id-assignment
 * pass (an accumulator) on fresh builds, so the upfront
 * change-detection scan — a full corpus read — only happens when
 * there is a prior manifest to compare against.
 */
object RowHash {

  def turnHash(t: Turn): Long = {
    var h = 42L
    h = str(t.conv_id, h)
    h = XxHash64Function.hash(t.turn_idx, IntegerType, h)
    h = str(t.role, h)
    h = str(t.text, h)
    h = str(t.tool, h)
    h
  }

  private def str(s: String, seed: Long): Long =
    if (s == null) seed
    else XxHash64Function.hash(UTF8String.fromString(s), StringType, seed)
}
