package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native dot product over two float-array columns, accumulating in
 * double in LEFT-TO-RIGHT element order — bit-identical to the
 * declarative `aggregate(zip_with(a, b, (x,y) → x·y), 0.0, +)` fold
 * (pinned by DotExprSpec and by every cosine-scoring DuckDB oracle),
 * but ONE fused loop inside whole-stage codegen instead of an
 * interpreted higher-order pipeline that allocates a products array
 * and boxes every fold step. The dot product is the inner loop of
 * every similarity operator; at corpus scale the interpretation
 * overhead is the bottleneck, not the arithmetic.
 */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got ${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotExpr.dotOrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double r = graft.functions.DotExpr.dotOrNull($a, $b);
         |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {

  /** Σ a_i·b_i, double accumulation in index order. Null on length
    * mismatch OR any null element — exactly the declarative zip_with
    * fold's semantics (padding and null products null-propagate the
    * whole sum). */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
