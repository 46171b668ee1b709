package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the cross-engine polynomial string
 * hash (Rabin-Karp base-257 mod 1e9+7 — see [[graft.operators.Hashing]]
 * for the contract and the DuckDB mirror).
 *
 * Semantically identical to the declarative
 * `aggregate(transform(split(s, ""), ascii), 0L, (h, c) → (h·257+c) mod P)`
 * form (asserted by PolyHashSpec), but evaluates as ONE tight
 * code-point loop inside whole-stage codegen instead of materializing
 * a per-character string array and folding a 3-op expression tree over
 * it — the declarative form allocates O(len) UTF8Strings per call,
 * which dominated the MinHash entries' profile (hundreds of shingle
 * hashes per document).
 */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    PolyHashExpr.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {

  /** Fold h ← (h·257 + codePoint) mod 1e9+7 over the string's code
    * points. Code points (not UTF-16 units): `split(s, "")` keeps
    * surrogate pairs together and `ascii` returns the code point, and
    * DuckDB's `string_split(s, '')`/`ascii` do the same. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 257L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  /** Column form. */
  def apply(c: Column): Column =
    ColumnBridge.column(PolyHashExpr(ColumnBridge.expression(c)))
}
