package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass token counts over raw text:
 * `struct(ws_tokens, bpeish_tokens)` where
 *
 *  - `ws_tokens` = number of maximal runs of non-whitespace characters
 *    (= `size(filter(split(t, "\\s+"), len > 0))` — Java regex `\s` is
 *    exactly `[ \t\n\x0B\f\r]`);
 *  - `bpeish_tokens` = number of matches of
 *    `[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]` — ASCII letter runs, single
 *    digits, and single OTHER code points (a negated Java char class
 *    matches one CODE POINT, so a supplementary character counts once,
 *    not twice — this scan iterates code points for that arm).
 *
 * Replaces the interpreted `filter(split(...))` HOF and the
 * `regexp_extract_all` that materialized the full match array per row
 * just to take its size. Null input → null struct (the regex forms
 * also null-propagate). Parity with both regex forms is spec-pinned
 * including unicode/surrogate edges.
 */
case class TokenCountsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpeish_tokens", LongType, nullable = false)))

  override def prettyName: String = "graft_token_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountsExpr.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.TokenCountsExpr.counts($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCountsExpr =
    copy(child = newChild)
}

object TokenCountsExpr {

  private def isWs(cp: Int): Boolean = // Java regex \s
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  private def isAlpha(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  /** Both counts in one code-point scan. */
  def counts(s: UTF8String): InternalRow = {
    val str = s.toString
    val n = str.length
    var ws = 0L
    var bpeish = 0L
    var inNonWs = false
    var inAlpha = false
    var i = 0
    while (i < n) {
      val cp = str.codePointAt(i)
      if (isWs(cp)) { inNonWs = false; inAlpha = false }
      else {
        if (!inNonWs) { ws += 1; inNonWs = true }
        if (isAlpha(cp)) { if (!inAlpha) { bpeish += 1; inAlpha = true } }
        else { bpeish += 1; inAlpha = false } // single digit or single other code point
      }
      i += Character.charCount(cp)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](ws, bpeish))
  }

  def apply(text: Column): Column =
    ColumnBridge.column(TokenCountsExpr(ColumnBridge.expression(text)))
}
