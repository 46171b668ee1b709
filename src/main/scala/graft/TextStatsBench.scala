package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused micro-benchmark: the language-ID / quality-score token
  * statistics — native one-scan [[graft.functions.TokenStatsExpr]]
  * (as wired into `TextAnalysis.languageId`) vs the declarative
  * interpreted-HOF form that re-derived the token array per language.
  * Result-set parity guards the comparison. */
object TextStatsBench {
  def main(args: Array[String]): Unit = {
    val corpus = args.headOption.getOrElse("/tmp/graft_bench_corpus/c960000")
    val nDocs = args.drop(1).headOption.map(_.toInt).getOrElse(400000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(corpus).select(col("text"))
      .limit(nDocs).repartition(32).persist()
    docs.count() // materialize outside the timed region

    // declarative twin of languageId (the pre-TokenStatsExpr form)
    def declPred: org.apache.spark.sql.Column = {
      val langs = Seq("de", "en", "es", "fr")
      val hitCols = langs.map(l => TextAnalysis.stopwordHits(col("text"), l))
      val best = greatest(hitCols: _*)
      langs.zip(hitCols).foldRight(lit("und"): org.apache.spark.sql.Column) {
        case ((l, h), acc) => when(h === best && best > 0, lit(l)).otherwise(acc)
      }
    }
    def time(tag: String, f: => org.apache.spark.sql.DataFrame): Map[String, Long] = {
      val t0 = System.nanoTime()
      val m = f.groupBy("lang_pred").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      println(f"$tag: wall=${(System.nanoTime() - t0) / 1e9}%.2f s dist=$m")
      m
    }
    var ok = true
    for (round <- Seq("warm", "a", "b")) {
      val mn = time(s"native_$round", TextAnalysis.languageId(docs, "text"))
      val md = time(s"decl_$round", docs.withColumn("lang_pred", declPred))
      ok &= mn == md
    }
    println(s"parity: ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
  }
}
