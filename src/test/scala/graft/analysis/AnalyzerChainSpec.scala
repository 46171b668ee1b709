package graft.analysis

import graft.SparkFunSuite
import graft.index.{BuildConfig, IndexBuilder}
import graft.model.Turn
import graft.query.IndexReader
import org.apache.spark.sql.functions._

/**
 * Configurable analysis chains (the reference's text_en fieldType:
 * Stop → LowerCase → PorterStem, pinned in
 * `configsets/preanalyze/conf/schema.xml:39-60`): the chain id is
 * persisted in corpus_stats, query tokenization follows it, and
 * changing the chain invalidates the index like a source change.
 */
class AnalyzerChainSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val docs = Seq(
    Turn("c0", 0, "user", "the runner was running quickly", "", ts),
    Turn("c0", 1, "user", "a run in the park", "", ts),
    Turn("c1", 0, "user", "walking is not running", "", ts))

  test("text_en chain: stopwords dropped from the index, stemmed query matches") {
    val dir = tmpDir("idx-texten")
    IndexBuilder.build(spark, docs.toDS(),
      BuildConfig(dir, nSegments = 2, analyzer = Analyzer.TextEn))
    val dict = spark.read.parquet(IndexBuilder.dictionaryDir(dir))
      .select("term").as[String].collect().toSet
    assert(!dict.contains("the") && !dict.contains("a") && !dict.contains("was"))
    assert(dict.contains("run")) // running/runner/run all stem to run*
    val rdr = new IndexReader(spark, dir)
    assert(rdr.analyzer == Analyzer.TextEn)
    // query "runs" stems to "run" → matches every doc containing a run-form
    val hits = rdr.search("running", 10).map(_.doc_id).toSet
    val direct = rdr.search("run", 10).map(_.doc_id).toSet
    assert(hits == direct && hits.nonEmpty)
  }

  test("V1 chain (default) keeps stopwords; ids differ per chain") {
    val dir = tmpDir("idx-v1chain")
    IndexBuilder.build(spark, docs.toDS(), BuildConfig(dir, nSegments = 2))
    val dict = spark.read.parquet(IndexBuilder.dictionaryDir(dir))
      .select("term").as[String].collect().toSet
    assert(dict.contains("the") && dict.contains("running"))
    assert(Analyzer.V1.id == "v1" && Analyzer.TextEn.id == "v1+stop+stem")
    assert(Analyzer.parse("v1+stop+stem") == Analyzer.TextEn)
  }

  test("chain change invalidates a resumed index (like a source change)") {
    val dir = tmpDir("idx-chainchg")
    IndexBuilder.build(spark, docs.toDS(), BuildConfig(dir, nSegments = 2))
    val statsPath = java.nio.file.Paths.get(IndexBuilder.corpusStatsDir(dir))
    val t1 = java.nio.file.Files.getLastModifiedTime(statsPath)
    // same chain, same source → untouched
    IndexBuilder.build(spark, docs.toDS(), BuildConfig(dir, nSegments = 2))
    assert(java.nio.file.Files.getLastModifiedTime(statsPath) == t1)
    // different chain → full rebuild
    IndexBuilder.build(spark, docs.toDS(),
      BuildConfig(dir, nSegments = 2, analyzer = Analyzer.TextEn))
    assert(java.nio.file.Files.getLastModifiedTime(statsPath) != t1)
    assert(new IndexReader(spark, dir).analyzer == Analyzer.TextEn)
  }

  test("PorterStemmer goldens (public algorithm fixtures)") {
    val cases = Map("running" -> "run", "runner" -> "runner",
      "caresses" -> "caress", "ponies" -> "poni", "relational" -> "relat",
      "conditional" -> "condit", "sky" -> "sky", "walking" -> "walk")
    cases.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }
}
