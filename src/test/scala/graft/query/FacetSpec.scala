package graft.query

import graft.SparkFunSuite
import graft.index.{BuildConfig, IndexBuilder}
import graft.sources.SyntheticTranscripts

/** Search as a relational operator: the FULL boolean match set as a
  * distributed DataFrame ([[IndexReader.matchingDocs]]) and facet
  * counting on top of it ([[IndexReader.facetCounts]]) — both against
  * brute-force oracles over the tokenized corpus. */
class FacetSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private def fixture(name: String) = {
    val dir = tmpDir(name)
    val turns = SyntheticTranscripts.generate(spark, 42L, nConvs = 300)
    IndexBuilder.build(spark, turns, BuildConfig(dir, nSegments = 6))
    val corpus = turns.collect().sortBy(t => (t.conv_id, t.turn_idx))
    (new IndexReader(spark, dir), corpus)
  }

  test("matchingDocs == brute-force boolean filter over the tokenized corpus") {
    val (rdr, corpus) = fixture("idx-facet")
    val tokSets = corpus.map(t => graft.analysis.Tokenizer.termFreqs(t.text).keySet)
    Seq(("user la", "bash"), ("la ma", ""), ("user", "la"),
        ("user la ma", "ra")).foreach { case (mq, nq) =>
      val must = graft.analysis.Tokenizer.tokenize(mq).distinct
      val not = graft.analysis.Tokenizer.tokenize(nq).distinct
      val want = corpus.indices
        .filter(i => must.forall(tokSets(i)) && !not.exists(tokSets(i)))
        .map(_.toLong).toSet
      val got = rdr.matchingDocs(mq, nq).as[Long].collect().toSet
      assert(got == want, s"must='$mq' not='$nq'")
      assert(want.nonEmpty, s"degenerate fixture for '$mq'")
    }
    // absent must-term, empty query → empty match set (schema intact)
    assert(rdr.matchingDocs("nosuchterm user").collect().isEmpty)
    assert(rdr.matchingDocs("").collect().isEmpty)
    assert(rdr.matchingDocs("user la").columns.toSeq == Seq("doc_id"))
  }

  test("matchingDocs cardinality == exhaustive searchBoolean") {
    val (rdr, _) = fixture("idx-facet-card")
    assert(rdr.matchingDocs("user la", "bash").count() ==
      rdr.searchBoolean("user la", "bash", 1000000).size)
  }

  test("facetCounts == groupBy over the brute-force match set") {
    val (rdr, corpus) = fixture("idx-facet-counts")
    val tokSets = corpus.map(t => graft.analysis.Tokenizer.termFreqs(t.text).keySet)
    val meta = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t.role) }.toSeq.toDF("doc_id", "role")
    val must = Seq("la", "user")
    val want = corpus.indices
      .filter(i => must.forall(tokSets(i)) && !tokSets(i)("bash"))
      .groupBy(i => corpus(i).role).view.mapValues(_.size.toLong).toMap
    val got = rdr.facetCounts("user la", "bash", meta, "doc_id", "role")
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got.values.sum > 0)
  }
}
