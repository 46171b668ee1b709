package graft.query

import graft.analysis.Analyzer
import graft.index.IndexBuilder
import graft.model.{CorpusStats, PostingBlockRow, QueryHit, RankedTurn}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed BM25 top-k retrieval over a built index (SURVEY.md
 * §2.7): query terms → dictionary lookup (df → idf) → postings scan
 * pruned to the query terms (Parquet row-group stats: postings files
 * are term-sorted within each segment) → per-segment block-max WAND
 * with a bounded min-heap (one `flatMapGroups` task per segment) →
 * driver k-way merge under the total order (score desc, docId asc).
 *
 * The per-segment shuffle moves only the query terms' posting BLOCKS
 * (compressed), never documents; the driver merge moves only
 * per-segment top-k — both O(k · terms), independent of corpus size.
 */
class IndexReader(spark: SparkSession, dir: String) extends Serializable {
  import spark.implicits._

  lazy val stats: CorpusStats = {
    val s = spark.read.parquet(IndexBuilder.corpusStatsDir(dir)).as[CorpusStats].head()
    graft.model.IndexFormat.check(s, dir)
    s
  }

  /** Query-side chain = the chain the index was built with. */
  lazy val analyzer: Analyzer = Analyzer.parse(stats.analyzer)

  private lazy val postings = spark.read.parquet(IndexBuilder.postingsDir(dir))
  private lazy val dictionary = spark.read.parquet(IndexBuilder.dictionaryDir(dir))

  /** Global document frequencies for a term set (small collect). */
  def docFreqs(terms: Seq[String]): Map[String, Long] =
    dictionary.filter(col("term").isInCollection(terms))
      .select("term", "df").as[(String, Long)].collect().toMap

  /** Top-k hits for a free-text query. Deterministic: tie-break
    * (score desc, docId asc); summation in ascending term order. */
  def search(query: String, k: Int = 10): Vector[QueryHit] = {
    val terms = analyzer.tokenize(query).distinct.sorted
    if (terms.isEmpty || stats.n_docs == 0) return Vector.empty
    val dfs = docFreqs(terms)
    if (dfs.isEmpty) return Vector.empty
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k

    val perSegment = postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment)
      .flatMapGroups { (_, rows) =>
        val byTerm = rows.toVector.groupBy(_.term).map { case (t, rs) =>
          t -> rs.toIndexedSeq
        }
        Wand.topK(byTerm, idfs, avgdl, kk).iterator
      }
      .collect()

    perSegment.sorted(new Ordering[QueryHit] {
      override def compare(a: QueryHit, b: QueryHit): Int =
        BM25.hitOrdering.compare((a.doc_id, a.score), (b.doc_id, b.score))
    }).take(k).toVector
  }

  /**
   * Batched top-k: MANY queries against the index in ONE Spark job —
   * the serving-scale path (per-query jobs pay scheduler latency;
   * a batch amortizes the postings scan across queries). One postings
   * scan pruned to the UNION of all query terms; each segment task
   * runs WAND per query over its term subset; the driver merges
   * per-segment winners per query. Results are identical to calling
   * [[search]] per query (same summation order, same tie-break).
   *
   * @param queries (query_id, query text)
   * @return (query_id, rank, doc_id, score) rows, rank 1..k
   */
  def searchMany(queries: Seq[(String, String)], k: Int = 10): Seq[(String, Int, Long, Double)] = {
    val parsed = queries.map { case (id, q) =>
      id -> analyzer.tokenize(q).distinct.sorted
    }
    val allTerms = parsed.flatMap(_._2).distinct.sorted
    if (allTerms.isEmpty || stats.n_docs == 0) return Seq.empty
    val dfs = docFreqs(allTerms)
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k
    val queriesB = spark.sparkContext.broadcast(parsed)

    val perSegment =
      try {
        postings
          .filter(col("term").isInCollection(allTerms))
          .as[PostingBlockRow]
          .groupByKey(_.segment)
          .flatMapGroups { (_, rows) =>
            val byTerm = rows.toVector.groupBy(_.term).map { case (t, rs) =>
              t -> rs.toIndexedSeq
            }
            queriesB.value.iterator.flatMap { case (qid, terms) =>
              val qBlocks = terms.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
              if (qBlocks.isEmpty) Iterator.empty
              else Wand.topK(qBlocks, idfs, avgdl, kk).iterator.map(h => (qid, h.doc_id, h.score))
            }
          }
          .collect()
      } finally queriesB.unpersist(blocking = false) // async: frees executor copies without stalling the serving path (destroy() blocks)

    perSegment.groupBy(_._1).toSeq.flatMap { case (qid, hits) =>
      hits.map(h => (h._2, h._3))
        .sorted(new Ordering[(Long, Double)] {
          override def compare(a: (Long, Double), b: (Long, Double)): Int =
            BM25.hitOrdering.compare(a, b)
        })
        .take(k).zipWithIndex
        .map { case ((doc, score), i) => (qid, i + 1, doc, score) }
    }
  }

  /**
   * Metadata-filtered top-k: BM25 over only the documents matching a
   * predicate on the doc table (staging columns: conv_id, turn_idx,
   * role, tool, text, dl, segment). Distributed and broadcast-free:
   * the allowed docIds are COGROUPED with the posting blocks by
   * segment, so each task holds one segment's allowed set (bounded by
   * segSize) and WAND drops disallowed candidates after cursor
   * alignment — exact filtered top-k, not post-filtering.
   */
  def searchWhere(query: String, predicate: org.apache.spark.sql.Column,
                  k: Int = 10): Vector[QueryHit] = {
    val terms = analyzer.tokenize(query).distinct.sorted
    if (terms.isEmpty || stats.n_docs == 0) return Vector.empty
    val dfs = docFreqs(terms)
    if (dfs.isEmpty) return Vector.empty
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k

    val allowed = IndexBuilder.readStaging(spark, dir)
      .filter(predicate)
      .select(col("segment").as("a_segment"), col("doc_id").as("a_doc_id"))
      .as[(Int, Long)]
      .groupByKey(_._1)
    val blocks = postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment)

    val perSegment = blocks.cogroup(allowed) { (_, rows, allowRows) =>
      val byTerm = rows.toVector.groupBy(_.term).map { case (t, rs) =>
        t -> rs.toIndexedSeq
      }
      if (byTerm.isEmpty) Iterator.empty
      else {
        val ok = new java.util.HashSet[java.lang.Long]()
        allowRows.foreach(r => ok.add(r._2))
        if (ok.isEmpty) Iterator.empty
        else Wand.topK(byTerm, idfs, avgdl, kk, allow = ok.contains(_)).iterator
      }
    }.collect()

    perSegment.sorted(new Ordering[QueryHit] {
      override def compare(a: QueryHit, b: QueryHit): Int =
        BM25.hitOrdering.compare((a.doc_id, a.score), (b.doc_id, b.score))
    }).take(k).toVector
  }

  /**
   * Boolean BM25 top-k: every `mustQuery` term required (AND), any
   * `notQuery` term excluding (NOT) — the reference's Solr/Lucene
   * boolean query shape, scored over the must terms only. One pruned
   * postings scan of must ∪ not terms; per-segment leapfrog
   * intersection ([[Wand.topKConjunctive]]); driver k-way merge.
   */
  def searchBoolean(mustQuery: String, notQuery: String = "",
                    k: Int = 10): Vector[QueryHit] = {
    val must = analyzer.tokenize(mustQuery).distinct.sorted
    val not = analyzer.tokenize(notQuery).distinct.sorted.filterNot(must.contains)
    if (must.isEmpty || stats.n_docs == 0) return Vector.empty
    val dfs = docFreqs(must)
    if (dfs.size < must.size) return Vector.empty // a must-term is absent from the corpus
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k
    val mustSet = must.toSet
    val allTerms = must ++ not

    val perSegment = postings
      .filter(col("term").isInCollection(allTerms))
      .as[PostingBlockRow]
      .groupByKey(_.segment)
      .flatMapGroups { (_, rows) =>
        val byTerm = rows.toVector.groupBy(_.term).map { case (t, rs) =>
          t -> rs.toIndexedSeq
        }
        val (mb, nb) = byTerm.partition { case (t, _) => mustSet.contains(t) }
        Wand.topKConjunctive(mb, nb, idfs, avgdl, kk, must).iterator
      }
      .collect()

    perSegment.sorted(new Ordering[QueryHit] {
      override def compare(a: QueryHit, b: QueryHit): Int =
        BM25.hitOrdering.compare((a.doc_id, a.score), (b.doc_id, b.score))
    }).take(k).toVector
  }

  /**
   * Phrase top-k (candidate-verify design): the index prunes to docs
   * containing ALL phrase terms (conjunctive leapfrog — no positions
   * stored in the v2 format), then the candidates' texts are re-read
   * from the staging view (row-group pruned by doc_id) and the exact
   * ordered-adjacency count is computed with the same analyzer the
   * index used. Scoring is Lucene PhraseQuery semantics: tf = phrase
   * frequency, idf = Σ idf(term_i) over the phrase's terms in order.
   *
   * Scale shape: the verify stage touches candidate rows only (the
   * conjunction of all phrase terms bounds it by the rarest term's
   * df); `maxCandidates` caps the exactness window for pathological
   * all-stopword phrases — a positions-bearing format v3 would replace
   * the verify scan if phrase queries dominated a workload.
   */
  def searchPhrase(phrase: String, k: Int = 10,
                   maxCandidates: Int = 100000): Vector[QueryHit] = {
    val terms = analyzer.tokenize(phrase) // ordered, duplicates kept
    if (terms.isEmpty || stats.n_docs == 0) return Vector.empty
    if (terms.length == 1) return search(phrase, k)
    val dfs = docFreqs(terms.distinct)
    if (dfs.size < terms.distinct.size) return Vector.empty
    // Lucene PhraseWeight: idf summed over term OCCURRENCES in order
    val idfSum = terms.foldLeft(0.0)((s, t) => s + BM25.idf(dfs(t), stats.n_docs))
    val cands = searchBoolean(terms.mkString(" "), "", maxCandidates).map(_.doc_id)
    if (cands.isEmpty) return Vector.empty
    val az = analyzer
    val seq = terms.toIndexedSeq
    val avgdl = stats.avgdl
    val candDf = cands.toDF("doc_id")
    val verified = IndexBuilder.readDocs(spark, dir)
      .join(org.apache.spark.sql.functions.broadcast(candDf), "doc_id")
      .select(col("doc_id"), col("text"), col("dl"))
      .as[(Long, String, Int)]
      .map { case (id, text, dl) =>
        val toks = az.tokenize(text)
        var pf = 0
        var i = 0
        while (i + seq.length <= toks.length) {
          var j = 0
          while (j < seq.length && toks(i + j) == seq(j)) j += 1
          if (j == seq.length) pf += 1
          i += 1
        }
        (id, pf, dl)
      }
      .filter(_._2 > 0)
      .collect()
    verified.map { case (id, pf, dl) =>
        QueryHit(id, idfSum * BM25.tfNorm(pf, dl, avgdl))
      }.sortBy(h => (-h.score, h.doc_id)).take(k).toVector
  }

  /** Top-k joined back to (conv_id, turn_idx) via doc_stats. */
  def searchRanked(query: String, k: Int = 10): Seq[RankedTurn] = {
    val hits = search(query, k)
    if (hits.isEmpty) return Seq.empty
    val ids = hits.map(_.doc_id)
    val meta = IndexBuilder.readDocs(spark, dir)
      .filter(col("doc_id").isInCollection(ids))
      .select("doc_id", "conv_id", "turn_idx")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    hits.map { h =>
      val (cid, tix) = meta(h.doc_id)
      RankedTurn(h.doc_id, h.score, cid, tix)
    }
  }

  /** Search as a DataFrame with 1-based rank (for SparkEntry/Verify). */
  def searchDF(query: String, k: Int = 10): DataFrame = {
    val rows = searchRanked(query, k).zipWithIndex.map { case (r, i) =>
      (i + 1, r.doc_id, r.score, r.conv_id, r.turn_idx)
    }
    spark.createDataFrame(rows)
      .toDF("rank", "doc_id", "score", "conv_id", "turn_idx")
  }
}
