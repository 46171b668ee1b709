package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/**
 * Native argmax-cosine over a fixed centroid set: returns the 0-based
 * INDEX of the centroid with the highest cosine similarity to the
 * input vector, ties → lowest index.
 *
 * The centroid matrix rides along as expression DATA (one serialized
 * reference object shipped with the plan), not as per-centroid literal
 * sub-trees — the literal-array form (`array(cos(v, lit(c0)), cos(v,
 * lit(c1)), …)`) grows the expression tree linearly in the centroid
 * count and dies in plan compilation long before execution at real
 * centroid counts. Here plan size is O(1) nodes and the kernel is one
 * fused loop inside whole-stage codegen.
 *
 * Arithmetic contract (what the DuckDB oracles mirror): every dot
 * product is a left-to-right double fold; cos(v, c_i) =
 * dot(v,c_i) / (sqrt(dot(v,v)) · sqrt(dot(c_i,c_i))); the comparison
 * scans centroids in index order with strict `>`, which equals SQL
 * `ORDER BY cos DESC, idx ASC LIMIT 1`. Inputs are assumed nonzero
 * (cosine of a zero vector is NaN in any engine); a NaN similarity
 * never wins, and a row where every similarity is NaN yields null.
 * Null is also returned on dimension mismatch or a null element,
 * matching [[DotExpr]]'s null semantics.
 */
case class ArgMaxCosExpr(child: Expression, centroids: Seq[Seq[Float]])
  extends UnaryExpression {

  require(centroids.nonEmpty, "argmax_cos requires at least one centroid")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cos"

  @transient private lazy val matrix: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
      math.sqrt(s)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val r = ArgMaxCosExpr.argmax(input.asInstanceOf[ArrayData], matrix, norms)
    if (r < 0) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidMatrix", matrix, "float[][]")
    val n = ctx.addReferenceObj("centroidNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.ArgMaxCosExpr.argmax($v, $m, $n);
         |${ev.isNull} = ${ev.value} < 0;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ArgMaxCosExpr =
    copy(child = newChild)
}

object ArgMaxCosExpr {

  /** 0-based index of the max-cosine centroid (ties → lowest index),
    * or -1 for null (dimension mismatch, null element, all-NaN). */
  def argmax(v: ArrayData, cents: Array[Array[Float]], norms: Array[Double]): Int = {
    val dim = v.numElements()
    var dv = 0.0
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return -1
      val x = v.getFloat(i).toDouble
      dv += x * x
      i += 1
    }
    val nv = math.sqrt(dv)
    var best = Double.NegativeInfinity
    var bestIdx = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      if (cv.length != dim) return -1
      var dot = 0.0
      var j = 0
      while (j < dim) { dot += v.getFloat(j).toDouble * cv(j).toDouble; j += 1 }
      val cos = dot / (nv * norms(c))
      if (cos > best) { best = cos; bestIdx = c }
      c += 1
    }
    bestIdx
  }

  def apply(v: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(ArgMaxCosExpr(
      ColumnBridge.expression(v), centroids.map(_.toSeq).toSeq))
}
