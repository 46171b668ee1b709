package graft.query

import graft.SparkFunSuite
import graft.index.{BuildConfig, IndexBuilder}
import graft.sources.SyntheticTranscripts

/** Batched retrieval must be result-identical to per-query search. */
class SearchManySpec extends SparkFunSuite {

  test("searchMany == per-query search, bit-identical, across query shapes") {
    val dir = tmpDir("idx-many")
    val turns = SyntheticTranscripts.generate(spark, 42L, nConvs = 400)
    IndexBuilder.build(spark, turns, BuildConfig(dir, nSegments = 6))
    val rdr = new IndexReader(spark, dir)
    val queries = Seq(
      "q0" -> "assistant tool error",
      "q1" -> "user",
      "q2" -> "ba ce di",
      "q3" -> "nosuchtermanywhere",
      "q4" -> "user assistant system tool",
      "q5" -> "fo fo fo ba")
    val batched = rdr.searchMany(queries, 10)
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap
    queries.foreach { case (qid, q) =>
      val single = rdr.search(q, 10).map(h => (h.doc_id, h.score))
      assert(batched.getOrElse(qid, Seq.empty) == single, s"query $qid '$q'")
    }
  }
}
