package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for Spark's `private[aggregate] CollectTopK` — the
  * bounded-priority-queue `TypedImperativeAggregate` behind
  * `InferWindowGroupLimit`-style top-k. Same one-object pattern as
  * `org.apache.spark.sql.graft.ColumnBridge`: the narrowest possible
  * bridge into a Spark-internal API, kept to a single forwarding
  * method so the dependency surface stays one constructor call. */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): Expression =
    CollectTopK(child, num, reverse).toAggregateExpression()
}
