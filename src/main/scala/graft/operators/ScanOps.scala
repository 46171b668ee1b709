package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * The reference's scanner-side incremental-ingest operators
 * (SURVEY.md §2.1): dedup memory and hash-based change detection,
 * re-expressed as anti-joins / hash-compare joins against a processed-
 * docs ledger instead of per-doc Cassandra lookups
 * (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/model/impl/ScannerImpl.java:365-417`).
 */
object ScanOps {

  /** `SimpleFileScanner` (`scanners/SimpleFileScanner.java:51,72-91`):
    * one row per file with raw bytes + the reference's file-attribute
    * metadata fields (`scanners/FileScanner.java:23-40`: `created`,
    * `modified` as epoch-millis strings, `file_size`, and the file URI
    * as the doc id). The periodic re-walk becomes re-running the read;
    * the memory throttle (`SimpleFileScanner.java:258-285`) is
    * subsumed by Spark's block manager. */
  def scanFiles(spark: org.apache.spark.sql.SparkSession, rootDir: String,
                glob: String = "*"): DataFrame = {
    // created/accessed epoch-millis via filesystem attributes — the
    // reference emits all four (FileScanner.java:23-40); stores that
    // don't track creation/access yield null for those two fields.
    val attrs = udf { path: String =>
      try {
        val p = java.nio.file.Paths.get(new java.net.URI(path))
        val a = java.nio.file.Files.readAttributes(
          p, classOf[java.nio.file.attribute.BasicFileAttributes])
        (a.creationTime.toMillis.toString, a.lastAccessTime.toMillis.toString)
      } catch { case _: Exception => (null: String, null: String) }
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(rootDir)
      .withColumn("_attrs", attrs(col("path")))
      .select(
        col("path").as("id"),
        col("content").as("raw_data"),
        (unix_millis(col("modificationTime").cast("timestamp_ltz"))).cast("string").as("modified"),
        col("_attrs._1").as("created"),
        col("_attrs._2").as("accessed"),
        col("length").cast("string").as("file_size"))
  }

  /** `JdbcScanner` (`scanners/JdbcScanner.java:63,123-170`): one row
    * per result-set row; Spark's JDBC source gives pushdown and
    * partitioned reads for free. The designated PK column becomes the
    * doc id as `jdbcUrl + "/" + table + "/" + pk`
    * (`JdbcScanner.java:177-180`). */
  def scanJdbc(spark: org.apache.spark.sql.SparkSession, url: String,
               table: String, pkColumn: String,
               options: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    options.foldLeft(base) { case (b, (k, v)) => b.option(k, v) }
      .load()
      .withColumn("id", concat(lit(url), lit("/"), lit(table), lit("/"),
        col(pkColumn).cast("string")))
  }

  /** `PreAnalyzeFields` (`processors/PreAnalyzeFields.java:64-114`):
    * attach the analyzed token stream as a column of
    * `{t, s, e, i}` structs (term, start/end offset, position
    * increment) — the engine-side equivalent of Solr PreAnalyzed
    * JSON, computed with the same versioned chain the index uses. */
  def preAnalyze(df: DataFrame, textCol: String,
                 into: String = "pre_analyzed"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tokUdf = udf((text: String) =>
      graft.analysis.Tokenizer.tokenizeWithOffsets(text))
    df.withColumn(into, tokUdf(col(textCol)))
  }

  /** `rememberScannedIds` (`ScannerImpl.java:365-378`): skip docs whose
    * id was seen before — left_anti against the seen-ids ledger. */
  def excludeSeen(src: DataFrame, seen: DataFrame, idCol: String): DataFrame =
    src.join(seen.select(idCol).distinct(), Seq(idCol), "left_anti")

  /** `detectChangesViaHashing` (`ScannerImpl.java:380-417`): reindex
    * iff the content hash changed vs the last recorded hash. New docs
    * (no prior hash) are fresh too — left join + null-or-diff filter.
    * `prior` must have columns (idCol, "prior_hash"). */
  def changedDocs(src: DataFrame, prior: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    src.withColumn("content_hash", md5(col(textCol)))
      .join(prior.select(col(idCol), col("prior_hash")), Seq(idCol), "left")
      .filter(col("prior_hash").isNull || col("content_hash") =!= col("prior_hash"))
      .drop("prior_hash")
  }

  /** Per-line doc splitting (`SimpleFileScanner.docPerLineIfMatches`,
    * `scanners/SimpleFileScanner.java:193-218`): one row per line with
    * a 0-based line number, id suffixed `#L<n>` like the reference.
    * `delim` is taken literally (regex-quoted). */
  def docPerLine(src: DataFrame, idCol: String, textCol: String,
                 delim: String = "\n"): DataFrame =
    src.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("line_no", "line")))
      .withColumn("line_id", concat(col(idCol), lit("#L"), col("line_no")))

  /** The reference's parent⇛child id separator
    * (`model/impl/DocumentImpl.java:66`, `CHILD_SEP` U+21DB). */
  val ChildSep = "⇛"

  /** Parent/child documents (`DocumentImpl.java:60-76` makeChild): a
    * source doc that expands into multiple child docs — XML records,
    * archive members, chunks — emits one row per child with composite
    * id `parentId⇛ordinal` and every parent field carried along.
    * `childrenCol` is any array expression over the parent row. */
  def childDocs(src: DataFrame, idCol: String, childrenCol: Column,
                childField: String = "child"): DataFrame =
    src.select(col("*"), posexplode(childrenCol).as(Seq("child_no", childField)))
      .withColumn("child_id",
        concat(col(idCol).cast("string"), lit(ChildSep), col("child_no").cast("string")))

  /** `StaxExtractingProcessor` (`processors/StaxExtractingProcessor.java:84-147`
    * `ElementSpec` path patterns → destination fields): extract element
    * and attribute paths from an XML string column. The reference walks
    * StAX events against a path stack; declaratively the same contract
    * is `from_xml` with an explicit schema plus one nested-field
    * projection per (path → destination) — Catalyst prunes branches the
    * paths never touch, rows parse inside the scan stage, and
    * malformed XML yields nulls per-field instead of failing the task
    * (PERMISSIVE mode, like the reference's per-doc error status).
    * Paths are dotted element names; attributes use the standard `_`
    * prefix (`"meta.lang" → col, "_id" → attribute id`). */
  def xmlExtract(df: DataFrame, xmlCol: String, xmlSchema: StructType,
                 paths: Map[String, String]): DataFrame = {
    val parsed = from_xml(col(xmlCol), xmlSchema)
    paths.toSeq.sortBy(_._2).foldLeft(df.withColumn("_xml", parsed)) {
      case (d, (path, dest)) =>
        d.withColumn(dest, path.split('.').foldLeft(col("_xml"))(_.getField(_)))
    }.drop("_xml")
  }
}
