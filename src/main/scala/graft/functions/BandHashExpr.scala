package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native LSH band keys over a MinHash signature: slice the signature
 * into `bands` runs of `rowsPerBand`, render each run as the
 * comma-joined decimal string the declarative chain built, and hash it
 * — all in one loop per row. Bit-identical (BandHashSpec pins the
 * parity) to the interpreted
 * `transform(sequence(0, bands-1), b → hash(array_join(slice(sig,
 * b·rpb+1, rpb), ",")))` it replaces, which allocated a slice array, a
 * joined string, and a lambda frame per band per document.
 * `crossEngine = true` uses the polynomial hash a DuckDB oracle
 * reproduces (signature values are minima in [0, P), so their decimal
 * rendering is the plain non-negative form); `false` is Spark's
 * `xxhash64` (seed 42) over the same string.
 */
case class BandHashExpr(child: Expression, bands: Int, rowsPerBand: Int,
                        crossEngine: Boolean) extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> signature, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_band_hash"

  override protected def nullSafeEval(input: Any): Any =
    BandHashExpr.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand, crossEngine)

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandHashExpr.compute($c, $bands, $rowsPerBand, $crossEngine);")

  override protected def withNewChildInternal(newChild: Expression): BandHashExpr =
    copy(child = newChild)
}

object BandHashExpr {

  private val P = 1000000007L

  def compute(sig: ArrayData, bands: Int, rowsPerBand: Int,
              crossEngine: Boolean): GenericArrayData = {
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(16 * rowsPerBand)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, sig.numElements())
      while (i < end) {
        if (sb.length > 0) sb.append(',')
        sb.append(sig.getLong(i))
        i += 1
      }
      out(b) =
        if (crossEngine) {
          // ASCII digit/comma fold == PolyHashExpr's code-point fold
          var h = 0L
          var p = 0
          while (p < sb.length) { h = (h * 257L + sb.charAt(p)) % P; p += 1 }
          h
        } else XxHash64Function.hash(
          UTF8String.fromString(sb.toString), StringType, 42L)
      b += 1
    }
    new GenericArrayData(out)
  }

  def apply(sig: Column, bands: Int, rowsPerBand: Int, crossEngine: Boolean): Column =
    ColumnBridge.column(BandHashExpr(
      ColumnBridge.expression(sig), bands, rowsPerBand, crossEngine))
}
