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

  /** Result of one fetch: HTTP-ish status, body bytes (null on
    * failure), error message (null on success). */
  case class FetchResult(status: Int, body: Array[Byte], error: String)

  /**
   * `processors/FetchUrl.java:55-110` — fetch the URL in a field into
   * raw bytes, with a PER-HOST throttle, an HTTP-status field, and an
   * error field (failure keeps the row, `failOnError` rethrows — the
   * reference's `failOnIOError`).
   *
   * Spark-native shape: rows are first repartitioned BY HOST, so one
   * host's URLs land in one partition and the token-interval throttle
   * is globally correct per host — the reference's per-JVM
   * visited-site cache (`FetchUrl.java:61-74`) under-throttles as soon
   * as there are two JVMs; here adding executors never multiplies the
   * per-host rate. The fetch loop is `mapPartitions` (a per-row
   * network side effect genuinely outside declarative Spark — the one
   * §2.3 processor where that's the right tool).
   *
   * `fetcher` is the pluggable kernel. The default [[fakeFetch]] is a
   * DETERMINISTIC STAND-IN (this environment has no egress): status,
   * body, and error derive from the URL alone, so specs and the
   * cross-engine oracle can pin the full plumbing — swap in a real
   * `HttpURLConnection`-based function (connect/read timeouts, ≥400 →
   * error, `FetchUrl.java:76-97`) for production.
   */
  def fetchUrl(df: DataFrame, urlCol: String,
               fetcher: String => FetchResult = fakeFetch,
               throttleMs: Long = 0L,
               statusCol: String = "http_status",
               bodyCol: String = "body",
               errorCol: String = "fetch_error",
               failOnError: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val hostOf = (u: String) =>
      try new java.net.URI(u).getHost catch { case _: Exception => null }
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(statusCol, IntegerType, nullable = true),
      StructField(bodyCol, BinaryType, nullable = true),
      StructField(errorCol, StringType, nullable = true)))
    val urlIdx = df.schema.fieldIndex(urlCol)
    // repartition on the HOST expression (derived column, not persisted)
    val byHost = df.repartition(
      expr(s"parse_url(cast($urlCol as string), 'HOST')"))
    byHost.mapPartitions { it =>
      val lastAccess = scala.collection.mutable.HashMap.empty[String, Long]
      it.map { r =>
        val url = r.getString(urlIdx)
        val host = hostOf(url)
        if (throttleMs > 0 && host != null) {
          val now = System.currentTimeMillis()
          lastAccess.get(host).foreach { last =>
            val elapsed = now - last
            if (elapsed < throttleMs) Thread.sleep(throttleMs - elapsed)
          }
          lastAccess(host) = System.currentTimeMillis()
        }
        val res =
          try fetcher(url)
          catch { case e: Exception => FetchResult(-1, null, e.getMessage) }
        if (failOnError && res.error != null)
          throw new RuntimeException(s"fetch failed for $url: ${res.error}")
        Row.fromSeq(r.toSeq ++ Seq(
          if (res.status < 0) null else res.status, res.body, res.error))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deterministic stand-in fetch kernel (clearly marked; see
    * [[fetchUrl]]): every 17th id-ish URL 404s with the reference's
    * error message shape, the rest return 200 with body
    * `"BODY:" + url` — all derivable in plain SQL, so the gate oracle
    * mirrors the complete fetch plumbing. */
  def fakeFetch(url: String): FetchResult = {
    val tail = url.reverse.takeWhile(_.isDigit).reverse
    val id = if (tail.isEmpty) 0L else tail.toLong
    if (id % 17 == 0 && tail.nonEmpty)
      FetchResult(404, null, "HTTP server responded 404")
    else
      FetchResult(200, ("BODY:" + url).getBytes("UTF-8"), null)
  }
}
