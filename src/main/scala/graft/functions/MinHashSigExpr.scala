package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native MinHash signature over a token array: word k-shingling,
 * shingle hashing, and the n-way running-min fold in ONE code-point
 * loop per row.
 *
 * Semantically identical (asserted by MinHashSigSpec, and bit-for-bit
 * by the d_minhash_sig / d_minhash_pairs gate oracles) to the
 * declarative pipeline
 * `Hashing.minHashSig(transform(Dedup.shingles(text, k), hash), n)` —
 * but that pipeline is four interpreted higher-order functions
 * (transform/slice/array_join/aggregate/zip_with are not
 * whole-stage-codegen-able), allocating a shingle-string array, a hash
 * array, and an n-wide accumulator array PER FOLD STEP. At hundreds of
 * shingles × 64 positions per document the interpretation overhead
 * dominated the whole MinHash profile.
 *
 * Equivalences relied on (and pinned by spec):
 *  - duplicate shingles never change a min, so array_distinct is
 *    unnecessary for signatures;
 *  - shingle i = tokens[i..min(i+k,len)-1] joined by " " for
 *    i ∈ [0, max(len-k, 0)] — the declarative slice() tail behavior;
 *  - affine schedule = Hashing.minHashA/B; all arithmetic mod 1e9+7.
 *
 * Returns null when the row yields no shingles (the declarative
 * `filter(size(sh) > 0)` drop).
 *
 * `crossEngine = true` hashes shingles with the polynomial hash a
 * DuckDB oracle reproduces; `false` uses xxhash64 (seed 42, Spark's
 * `xxhash64` function) folded into [0, P).
 */
case class MinHashSigExpr(child: Expression, k: Int, n: Int, crossEngine: Boolean)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], k, n, crossEngine)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashSigExpr.compute($c, $k, $n, $crossEngine);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  private val P = 1000000007L

  /** Returns the n-position signature, or null if no shingles. */
  def compute(tokens: ArrayData, k: Int, n: Int, crossEngine: Boolean): GenericArrayData = {
    val len = tokens.numElements()
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, P)
    var any = false
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val lastStart = math.max(len - k, 0)
    while (i <= lastStart && len > 0) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + k, len)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(tokens.getUTF8String(j).toString)
        j += 1
      }
      if (sb.length > 0) {
        any = true
        val h =
          if (crossEngine) polyOf(sb)
          else {
            val xx = XxHash64Function.hash(
              UTF8String.fromString(sb.toString), StringType, 42L)
            ((xx % P) + P) % P // pmod into [0, P)
          }
        var q = 1
        while (q <= n) {
          // affine (h·a_q + b_q) mod P with Hashing.minHashA/B schedule
          val v = (h * (7919L * q + 13L) + 4729L * q + 31L) % P
          if (v < mins(q - 1)) mins(q - 1) = v
          q += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** PolyHashExpr.hash over a builder (same code-point fold). */
  private def polyOf(sb: java.lang.StringBuilder): Long = {
    var h = 0L
    var i = 0
    while (i < sb.length) {
      val cp = sb.codePointAt(i)
      h = (h * 257L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** Column form over a token-array column. */
  def apply(tokens: Column, k: Int, n: Int, crossEngine: Boolean): Column =
    ColumnBridge.column(
      MinHashSigExpr(ColumnBridge.expression(tokens), k, n, crossEngine))
}
