package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's per-document field processors (SURVEY.md §2.3), each
 * re-expressed as a declarative column transform so Catalyst keeps it
 * inside whole-stage codegen — no UDFs, no row-at-a-time DAG. Scaladoc
 * cites the JesterJ source each op derives from (all paths relative to
 * `/root/reference/code/ingest/src/main/java/org/jesterj/ingest/`).
 */
object Transforms {

  /** `processors/CopyField.java:41-49` — copy a field, optionally
    * dropping the source (retainOriginal=false ≡ rename). */
  def copyField(df: DataFrame, from: String, into: String,
                retainOriginal: Boolean = true): DataFrame = {
    val out = df.withColumn(into, col(from))
    if (retainOriginal) out else out.drop(from)
  }

  /** `processors/DropFieldProcessor.java` — remove a field. */
  def dropField(df: DataFrame, field: String): DataFrame = df.drop(field)

  /** `processors/TrimValues.java` — trim whitespace on every value. */
  def trimValues(df: DataFrame, field: String): DataFrame =
    df.withColumn(field, trim(col(field)))

  /** `processors/SplitFieldProcessor.java` — split each value on a
    * delimiter; `explodeRows` yields one row per part (the reference
    * keeps a multi-valued field; relationally that's the exploded
    * form). Parts are trimmed like the reference's `trimParts`. */
  def splitField(df: DataFrame, field: String, delim: String,
                 into: String, explodeRows: Boolean): DataFrame = {
    val parts = split(col(field), java.util.regex.Pattern.quote(delim))
    if (explodeRows) df.withColumn(into, explode(parts))
    else df.withColumn(into, parts)
  }

  /** `processors/RegexValueReplace.java:38-53` — regex replaceAll;
    * `discardUnmatched` drops rows whose value has no match (the
    * reference's `discardingUnmatched` mode). */
  def regexReplace(df: DataFrame, field: String, pattern: String,
                   replacement: String, into: Option[String] = None,
                   discardUnmatched: Boolean = false): DataFrame = {
    val base = if (discardUnmatched) df.filter(col(field).rlike(pattern)) else df
    base.withColumn(into.getOrElse(field),
      regexp_replace(col(field), pattern, replacement))
  }

  /** `processors/SimpleDateTimeReformatter.java` — parse then format
    * to ISO-8601; preserves the old value on parse failure (the
    * reference's behavior) via coalesce. */
  def reformatDateTime(df: DataFrame, field: String, into: String,
                       inputFormat: Option[String] = None): DataFrame = {
    val parsed = inputFormat match {
      case Some(f) => to_timestamp(col(field), f)
      case None => col(field).cast("timestamp")
    }
    df.withColumn(into, coalesce(
      date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss'Z'"), col(field).cast("string")))
  }

  /** `processors/SetStaticValue.java` — constant field; `skipIfPresent`
    * keeps an existing non-null/non-empty value. */
  def setStaticValue(df: DataFrame, field: String, value: String,
                     skipIfPresent: Boolean = false): DataFrame =
    if (skipIfPresent && df.columns.contains(field))
      df.withColumn(field,
        when(col(field).isNull.or(col(field) === lit("")), lit(value))
          .otherwise(col(field)))
    else df.withColumn(field, lit(value))

  /** `processors/SetReadableFileSize.java` — byte count → "12 KB"
    * style display size (binary units, floored — commons-io
    * byteCountToDisplaySize semantics), plus split numeric/units
    * fields like the reference. Pure CASE chain (codegen'd). */
  def readableFileSize(df: DataFrame, bytesField: String,
                       into: String = "readable_size"): DataFrame = {
    val b = col(bytesField).cast("long")
    val gb = 1073741824L; val mb = 1048576L; val kb = 1024L
    val num = when(b >= gb, floor(b / gb))
      .when(b >= mb, floor(b / mb))
      .when(b >= kb, floor(b / kb))
      .otherwise(b)
    val units = when(b >= gb, lit("GB")).when(b >= mb, lit("MB"))
      .when(b >= kb, lit("KB")).otherwise(lit("bytes"))
    df.withColumn(into, concat(num.cast("string"), lit(" "), units))
      .withColumn(s"${into}_num", num)
      .withColumn(s"${into}_units", units)
  }

  /** `processors/UrlEncodeFieldProcessor.java` — URL-encode (UTF-8).
    * Spark's built-in `url_encode` (codegen'd, java URLEncoder
    * semantics: space → '+', matching the reference's
    * URLEncoder.encode call). */
  def urlEncodeField(df: DataFrame, field: String, into: String): DataFrame =
    df.withColumn(into, url_encode(col(field)))

  /** `processors/FieldTemplateProcessor.java` — template evaluation
    * against other fields. Fixed templates compile to concat/
    * format_string (codegen) instead of a per-row Velocity engine. */
  def template(df: DataFrame, into: String, parts: Column*): DataFrame =
    df.withColumn(into, concat(parts: _*))

  /** `processors/FieldTemplateProcessor.java:110` — the general form:
    * a template string referencing arbitrary other fields
    * (`"${field}"` substitution, the useful subset of the reference's
    * Velocity language) COMPILED ONCE into a concat expression tree,
    * so evaluation is whole-stage-codegen per row — no template engine
    * in the hot path. Non-string fields are cast to string. */
  def fieldTemplate(df: DataFrame, into: String, template: String): DataFrame = {
    val ref = """\$\{([^}]+)\}""".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    ref.findAllMatchIn(template).foreach { m =>
      if (m.start > last) parts += lit(template.substring(last, m.start))
      parts += col(m.group(1)).cast("string")
      last = m.end
    }
    if (last < template.length) parts += lit(template.substring(last))
    if (parts.isEmpty) parts += lit("")
    df.withColumn(into, concat(parts.toSeq: _*))
  }

  /** `processors/WrappingProcessor.java` — around-advice for another
    * processor (before/success/error/always hooks). In a columnar
    * engine a processor is a `DataFrame => DataFrame` function, so the
    * around-advice is literal function composition plus a LAZY metrics
    * frame (rows in/out, step name) the caller sinks with the data —
    * the reference's success/error callbacks become inspection of the
    * metrics (per-ROW error channels stay op-specific: Multimodal's
    * `decode_error`, xmlExtract's PERMISSIVE nulls). */
  def wrap(df: DataFrame, stepName: String)
          (op: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val out = op(df)
    val metrics = df.groupBy().agg(count(lit(1)).as("rows_in"))
      .crossJoin(out.groupBy().agg(count(lit(1)).as("rows_out")))
      .withColumn("step", lit(stepName))
      .select("step", "rows_in", "rows_out")
    (out, metrics)
  }

  /** `processors/LogAndDrop.java` — drop rows matching a predicate;
    * returns (kept, droppedCount-as-metric-df). The reference writes a
    * DROPPED status event per doc; we record the count in the lineage
    * manifest instead (SURVEY.md §2.5). */
  def logAndDrop(df: DataFrame, dropIf: Column): (DataFrame, DataFrame) =
    (df.filter(!dropIf),
      df.groupBy().agg(sum(dropIf.cast("long")).as("dropped_count")))
}
