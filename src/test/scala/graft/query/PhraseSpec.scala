package graft.query

import graft.SparkFunSuite
import graft.analysis.Tokenizer
import graft.index.{BuildConfig, IndexBuilder}
import graft.model.Turn

/**
 * Exact-phrase correctness over the v3 positional index, against a
 * brute-force text-adjacency oracle. The corpus is built so the
 * phrase's terms CO-OCCUR IN EVERY DOCUMENT — the shape that silently
 * truncated the old candidate-verify implementation at its
 * `maxCandidates` cap; the positional path has no cap to truncate.
 */
class PhraseSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  // deterministic corpus: every doc contains "alpha beta" at least
  // once; noise words, extra repeats, reversed pairs, and gapped pairs
  // exercise ordering and adjacency
  private val texts: Vector[String] = {
    val rng = new java.util.SplittableRandom(2026)
    val noise = Array("red", "green", "blue", "cyan", "teal", "plum", "jade")
    Vector.tabulate(600) { i =>
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      val n = 4 + rng.nextInt(18)
      (0 until n).foreach(_ => words += noise(rng.nextInt(noise.length)))
      // mandatory adjacent pair (co-occurrence = 100%)
      words.insert(rng.nextInt(words.length + 1), "alphabeta") // placeholder
      var t = words.mkString(" ").replace("alphabeta", "alpha beta")
      if (i % 7 == 0) t = t + " alpha beta"      // extra phrase occurrence
      if (i % 5 == 0) t = t + " beta alpha"      // reversed (not a match)
      if (i % 11 == 0) t = t + " alpha green beta" // gapped (not a match)
      if (i % 13 == 0) t = t + " go go go"       // repeated-term phrase, pf=2
      if (i % 3 == 0) t = t + " one two three"   // 3-term phrase
      t
    }
  }

  // single-turn convs with zero-padded ids → engine doc_id = index
  private lazy val dir: String = {
    val d = tmpDir("phrase-idx")
    val turns = texts.zipWithIndex.map { case (t, i) =>
      Turn(f"c$i%06d", 0, "doc", t, "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    IndexBuilder.build(spark, turns.toDS(), BuildConfig(d, nSegments = 5, waveSize = 5))
    d
  }
  private lazy val rdr = new IndexReader(spark, dir)

  // ---- brute-force oracle (the old verify logic, over raw text) ----
  private lazy val docToks = texts.map(Tokenizer.tokenize)
  private lazy val dls = docToks.map(_.length)
  private lazy val nDocs = texts.length.toLong
  private lazy val avgdl = dls.map(_.toLong).sum.toDouble / nDocs

  private def oracle(phrase: String, k: Int): Vector[(Long, Double)] = {
    val terms = Tokenizer.tokenize(phrase)
    val dfs = terms.distinct.map(t => t -> docToks.count(_.contains(t)).toLong).toMap
    if (dfs.values.exists(_ == 0L)) return Vector.empty
    val idfSum = terms.foldLeft(0.0)((s, t) => s + BM25.idf(dfs(t), nDocs))
    val hits = docToks.indices.flatMap { id =>
      val toks = docToks(id)
      var pf = 0
      var i = 0
      while (i + terms.length <= toks.length) {
        var j = 0
        while (j < terms.length && toks(i + j) == terms(j)) j += 1
        if (j == terms.length) pf += 1
        i += 1
      }
      if (pf > 0) Some((id.toLong, idfSum * BM25.tfNorm(pf, dls(id), avgdl)))
      else None
    }
    hits.sortBy { case (id, s) => (-s, id) }.take(k).toVector
  }

  private def got(phrase: String, k: Int): Vector[(Long, Double)] =
    rdr.searchPhrase(phrase, k).map(h => (h.doc_id, h.score))

  test("all-co-occurring phrase is exact at any k (the old cap's failure shape)") {
    // every doc holds both terms → the conjunctive candidate set is the
    // ENTIRE corpus; scores must still be bit-identical to brute force
    assert(oracle("alpha beta", 100000).length == texts.length) // sanity: all docs match
    assert(got("alpha beta", 10) == oracle("alpha beta", 10))
    assert(got("alpha beta", 100000) == oracle("alpha beta", 100000))
  }

  test("phrase order matters (reversed pair scores separately)") {
    val fwd = got("alpha beta", 10000)
    val rev = got("beta alpha", 10000)
    assert(rev == oracle("beta alpha", 10000))
    assert(rev.nonEmpty && rev.toSet != fwd.toSet)
  }

  test("gapped terms do not match; 3-term phrase exact") {
    assert(got("alpha green beta", 10000) == oracle("alpha green beta", 10000))
    assert(got("one two three", 10000) == oracle("one two three", 10000))
    assert(got("one two three", 5).nonEmpty)
  }

  test("repeated-term phrase counts overlapping occurrences") {
    val g = got("go go", 10000)
    assert(g == oracle("go go", 10000))
    assert(g.nonEmpty) // "go go go" yields pf = 2
  }

  test("absent term or empty phrase yields no hits; single term = plain search") {
    assert(got("alpha missingword", 10).isEmpty)
    assert(got("", 10).isEmpty)
    assert(rdr.searchPhrase("alpha", 10) == rdr.search("alpha", 10))
  }

  // near oracle: greedy minimal ordered chain, width <= (m-1)+slop,
  // each matching start counts 1 — independent find-based walk (the
  // engine uses persistent monotone pointers)
  private def nearOracle(phrase: String, slop: Int, k: Int): Vector[(Long, Double)] = {
    val terms = Tokenizer.tokenize(phrase)
    val m = terms.length
    val dfs = terms.distinct.map(t => t -> docToks.count(_.contains(t)).toLong).toMap
    if (dfs.values.exists(_ == 0L)) return Vector.empty
    val idfSum = terms.foldLeft(0.0)((s, t) => s + BM25.idf(dfs(t), nDocs))
    val hits = docToks.indices.flatMap { id =>
      val toks = docToks(id)
      var pf = 0
      toks.indices.filter(toks(_) == terms(0)).foreach { p0 =>
        var prev = p0
        var ok = true
        (1 until m).foreach { s =>
          if (ok) ((prev + 1) until toks.length).find(toks(_) == terms(s)) match {
            case Some(p) => prev = p
            case None => ok = false
          }
        }
        if (ok && prev - p0 <= (m - 1) + slop) pf += 1
      }
      if (pf > 0) Some((id.toLong, idfSum * BM25.tfNorm(pf, dls(id), avgdl)))
      else None
    }
    hits.sortBy { case (id, s) => (-s, id) }.take(k).toVector
  }

  test("searchNear: ordered spans within slop == greedy-chain oracle; slop 0 == phrase") {
    def gotNear(q: String, slop: Int, k: Int) =
      rdr.searchNear(q, slop, k).map(h => (h.doc_id, h.score))
    // slop 0 is the exact phrase path, bit-equal
    for (q <- Seq("alpha beta", "go go", "one two three"))
      assert(gotNear(q, 0, 10000) == got(q, 10000), s"slop0 '$q'")
    // slop 1 picks up the 'alpha green beta' gapped docs
    val s0 = gotNear("alpha beta", 0, 100000)
    val s1 = gotNear("alpha beta", 1, 100000)
    assert(s1 == nearOracle("alpha beta", 1, 100000))
    assert(s1.map(_._1).toSet == s0.map(_._1).toSet) // all docs already match at slop 0...
    assert(s1.toSet != s0.toSet) // ...but gapped docs now score HIGHER (pf grew)
    // reversed order never matches regardless of slop width
    assert(gotNear("beta alpha", 3, 100000) == nearOracle("beta alpha", 3, 100000))
    // 3-term chains with slop
    for (slop <- Seq(1, 2, 5))
      assert(gotNear("one two three", slop, 100000) ==
        nearOracle("one two three", slop, 100000), s"3-term slop $slop")
    // repeated-term chain: second 'go' must sit strictly after the first
    assert(gotNear("go go", 2, 100000) == nearOracle("go go", 2, 100000))
    // degenerate shapes
    assert(rdr.searchNear("alpha", 2, 10) == rdr.search("alpha", 10))
    assert(gotNear("alpha missingword", 2, 10).isEmpty)
    intercept[IllegalArgumentException] { rdr.searchNear("alpha beta", -1, 10) }
  }

  // unordered oracle: pf = a-positions with any b within +-(slop+1)
  private def nearUnorderedOracle(a: String, b: String, slop: Int,
                                  k: Int): Vector[(Long, Double)] = {
    val dfs = Seq(a, b).map(t => t -> docToks.count(_.contains(t)).toLong).toMap
    if (dfs.values.exists(_ == 0L)) return Vector.empty
    val idfSum = BM25.idf(dfs(a), nDocs) + BM25.idf(dfs(b), nDocs)
    val d = slop + 1
    val hits = docToks.indices.flatMap { id =>
      val toks = docToks(id)
      val bpos = toks.indices.filter(toks(_) == b).toSet
      val pf = toks.indices.count(i => toks(i) == a &&
        (math.max(0, i - d) to (i + d)).exists(bpos))
      if (pf > 0) Some((id.toLong, idfSum * BM25.tfNorm(pf, dls(id), avgdl)))
      else None
    }
    hits.sortBy { case (id, s) => (-s, id) }.take(k).toVector
  }

  test("searchNearUnordered: either-order window == anchored oracle") {
    def gotU(a: String, b: String, slop: Int, k: Int) =
      rdr.searchNearUnordered(a, b, slop, k).map(h => (h.doc_id, h.score))
    for ((a, b, sl) <- Seq(("alpha", "beta", 0), ("alpha", "beta", 1),
        ("beta", "alpha", 1), ("one", "three", 1), ("alpha", "green", 2)))
      assert(gotU(a, b, sl, 100000) == nearUnorderedOracle(a, b, sl, 100000),
        s"unordered ($a, $b)~$sl")
    // the reversed 'beta alpha' appendix (i % 5 docs) adds unordered
    // pf that the ordered count can't see — scores must differ
    val ordScores = rdr.searchNear("alpha beta", 0, 100000)
      .map(h => (h.doc_id, h.score)).toSet
    assert(gotU("alpha", "beta", 0, 100000).toSet != ordScores,
      "unordered must count reversed adjacencies")
    assert(gotU("alpha", "missingword", 2, 10).isEmpty)
    intercept[IllegalArgumentException] { rdr.searchNearUnordered("alpha", "alpha", 1, 10) }
    intercept[IllegalArgumentException] { rdr.searchNearUnordered("alpha", "beta", -1, 10) }
  }

  test("LocalIndex phrase/boolean serving paths are bit-identical to the cluster path") {
    val local = LocalIndex.load(spark, dir)
    for (q <- Seq("alpha beta", "beta alpha", "one two three", "go go")) {
      assert(local.searchPhrase(q, 10) == rdr.searchPhrase(q, 10), s"phrase '$q'")
    }
    assert(local.searchBoolean("alpha one", "go", 10) ==
      rdr.searchBoolean("alpha one", "go", 10))
    assert(local.search("alpha one", 10) == rdr.search("alpha one", 10))
    for ((q, sl) <- Seq(("alpha beta", 1), ("one two three", 2), ("go go", 3)))
      assert(local.searchNear(q, sl, 10) == rdr.searchNear(q, sl, 10), s"near '$q'~$sl")
    // rewrite-family parity: same expansions, bit-identical hits
    assert(local.searchPrefix("gr", 10) == rdr.searchPrefix("gr", 10))
    assert(local.searchWildcard("?ed", 10) == rdr.searchWildcard("?ed", 10))
    assert(local.searchWildcard("t*", 10) == rdr.searchWildcard("t*", 10))
    assert(local.searchFuzzy("grean", 1, 10) == rdr.searchFuzzy("grean", 1, 10))
    assert(local.searchBoosted(Seq("alpha" -> 2.0, "green" -> 0.5), 10) ==
      rdr.searchBoosted(Seq("alpha" -> 2.0, "green" -> 0.5), 10))
    assert(local.searchMinShouldMatch("alpha one red", 2, 10) ==
      rdr.searchMinShouldMatch("alpha one red", 2, 10))
    assert(local.searchNearUnordered("alpha", "beta", 1, 10) ==
      rdr.searchNearUnordered("alpha", "beta", 1, 10))
    assert(local.searchPrefix("gr", 10).nonEmpty &&
      local.searchFuzzy("grean", 1, 10).nonEmpty) // expansions actually hit
  }
}
