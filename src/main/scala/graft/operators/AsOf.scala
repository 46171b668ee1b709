package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join: each left row picks up the most recent
 * right row with `right.ts <= left.ts` within the same key — the
 * standard time-series enrichment operator.
 *
 * Scale shape: implemented as UNION + one window pass (partition by
 * key, order by time), NOT a range join — one shuffle on the key,
 * O(1) state per row (a running `last(..., ignoreNulls)`), no
 * per-row binary search and no cross product, so it survives a
 * 100x scale-up exactly like any windowed aggregation. Determinism:
 * ties on ts break right-before-left then by the id column.
 */
object AsOf {

  /**
   * @param left      rows to enrich
   * @param right     rows providing the as-of value
   * @param keyCol    join key column (both sides)
   * @param tsCol     event-time column (both sides)
   * @param idCol     unique id per row (both sides; tie-break)
   * @param valueCol  right-side column to carry, emitted as `asof_<valueCol>`
   */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, idCol: String, valueCol: String): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__v", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(col(keyCol), col(tsCol), col(idCol),
        col(valueCol).as("__v"))
      .withColumn("__is_left", lit(0))
    val unioned = l.select((left.columns.map(col) :+ col("__is_left") :+ col("__v")): _*)
      .unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (<= semantics)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_left").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$valueCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__v")
  }
}
