package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The reference's scanner-side incremental-ingest operators
 * (SURVEY.md §2.1): dedup memory and hash-based change detection,
 * re-expressed as anti-joins / hash-compare joins against a processed-
 * docs ledger instead of per-doc Cassandra lookups
 * (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/model/impl/ScannerImpl.java:365-417`).
 */
object ScanOps {

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
}
