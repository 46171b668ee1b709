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
 * (compressed), never documents.
 *
 * == Two-level merge + θ sharing ==
 * Query tasks each own a contiguous RANGE of segments (`groupByKey(
 * segment / groupSize)`), processed in ascending docId order with the
 * WAND threshold carried ACROSS segments ([[Wand.TopKMerger]] seeds
 * each segment's evaluator with the task's current kth score — the
 * shared-collector-threshold pattern of Lucene's per-segment search).
 * The driver then merges per-TASK top-k: O(k · tasks) rows collected,
 * independent of segment count — at 2^20 segments the flat per-segment
 * collect would be O(k · 2^20) rows with every segment's WAND starting
 * cold at θ = −∞.
 *
 * @param queryTasks target query-task count; 0 → 2 × defaultParallelism
 */
class IndexReader(spark: SparkSession, dir: String,
                  queryTasks: Int = 0) extends Serializable {
  import spark.implicits._

  lazy val stats: CorpusStats = {
    val s = IndexReader.readStatsDirect(dir).getOrElse(
      spark.read.parquet(IndexBuilder.corpusStatsDir(dir)).as[CorpusStats].head())
    graft.model.IndexFormat.check(s, dir)
    s
  }

  /** Query-side chain = the chain the index was built with. */
  lazy val analyzer: Analyzer = Analyzer.parse(stats.analyzer)

  private lazy val postings = spark.read.parquet(IndexBuilder.postingsDir(dir))
  private lazy val dictionary = spark.read.parquet(IndexBuilder.dictionaryDir(dir))

  /** Dedicated session for the fixed-shape top-k collect paths (same
    * SparkContext, isolated SQLConf) with ADAPTIVE EXECUTION OFF: the
    * WAND serving jobs are one postings scan + one groupByKey whose
    * task count the reader already right-sizes ([[groupSize]] targets
    * 2x parallelism), so AQE's per-exchange stage materialization adds
    * a scheduling round-trip per query without adding information —
    * measured ~40% of a warm top-10 search's latency (median 111 ms ->
    * 68 ms on the 5.28 M-doc bench index). Relational compositions
    * (matchingDocs / scoredDocs / facets), whose join sizes DO vary
    * with the match set, stay on the caller's session with AQE as
    * configured. */
  private lazy val serveSession: SparkSession = {
    val s2 = spark.newSession()
    Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone").foreach { k =>
      spark.conf.getOption(k).foreach(s2.conf.set(k, _))
    }
    s2.conf.set("spark.sql.adaptive.enabled",
      sys.env.getOrElse("GRAFT_SERVE_AQE", "false")) // A/B escape hatch
    s2
  }
  private lazy val postingsServe =
    serveSession.read.parquet(IndexBuilder.postingsDir(dir))

  /** Segments per query task (contiguous ranges keep docIds ascending
    * within a task — the θ-carry correctness condition). */
  private[query] lazy val groupSize: Int = {
    val nSeg = graft.store.Manifest
      .read(graft.store.Manifest.phaseAPath(IndexBuilder.manifestDir(dir)))
      .flatMap(_.get("n_segments_effective")).map(_.toInt).getOrElse(0)
    val tasks = if (queryTasks > 0) queryTasks
                else 2 * spark.sparkContext.defaultParallelism
    if (nSeg <= 0) 1 else math.max(1, (nSeg + tasks - 1) / tasks)
  }

  /** Whether the index stored per-posting position lists
    * (BuildConfig.storePositions; missing manifest key = older
    * positional build → true). Phrase queries require them. */
  lazy val positionsStored: Boolean = graft.store.Manifest
    .read(graft.store.Manifest.phaseAPath(IndexBuilder.manifestDir(dir)))
    .flatMap(_.get("store_positions")).forall(_ == "true")

  /** Global document frequencies for a term set (small collect). */
  def docFreqs(terms: Seq[String]): Map[String, Long] =
    dictionary.filter(col("term").isInCollection(terms))
      .select("term", "df").as[(String, Long)].collect().toMap

  /** Collection frequencies (total occurrences) for the given terms —
    * same range-pruned dictionary lookup as [[docFreqs]]. */
  def collectionFreqs(terms: Seq[String]): Map[String, Long] =
    dictionary.filter(col("term").isInCollection(terms))
      .select("term", "cf").as[(String, Long)].collect().toMap

  /** Total token count of the indexed corpus: Σ cf over the dictionary
    * (block-footer-derived, one cheap aggregate, cached per reader) —
    * exact, unlike avgdl·nDocs which reintroduces the double ratio. */
  lazy val totalTokens: Long =
    dictionary.agg(coalesce(sum(col("cf")), lit(0L))).as[Long].head()

  private def mergeDriver(perTask: Array[QueryHit], k: Int): Vector[QueryHit] =
    perTask.sorted(new Ordering[QueryHit] {
      override def compare(a: QueryHit, b: QueryHit): Int =
        BM25.hitOrdering.compare((a.doc_id, a.score), (b.doc_id, b.score))
    }).take(k).toVector

  /** Top-k hits for a free-text query. Deterministic: tie-break
    * (score desc, docId asc); summation in ascending term order. */
  def search(query: String, k: Int = 10): Vector[QueryHit] =
    mergeDriver(searchCollect(query, k), k)

  /** The pre-driver-merge collected rows — package-visible so specs
    * can pin the O(k · tasks) collect bound. */
  private[query] def searchCollect(query: String, k: Int): Array[QueryHit] =
    searchTermsCollect(analyzer.tokenize(query).distinct.sorted, k)

  /** [[searchCollect]] for an explicit ALREADY-ANALYZED term set — the
    * shared disjunctive core that prefix/wildcard rewrites feed their
    * expanded terms into. `boost` scales a term's idf BEFORE it enters
    * the WAND core, so score contributions and pruning bounds scale
    * together and the pruning stays lossless (boost ≥ 0). */
  private def searchTermsCollect(terms: Seq[String], k: Int,
                                 boost: String => Double = _ => 1.0): Array[QueryHit] = {
    if (terms.isEmpty || stats.n_docs == 0) return Array.empty
    val dfs = docFreqs(terms)
    if (dfs.isEmpty) return Array.empty
    val idfs = dfs.map { case (t, df) => t -> boost(t) * BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k
    val g = groupSize

    postingsServe
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        val merger = new Wand.TopKMerger(kk)
        Wand.bySegment(rows).foreach { case (_, byTerm) =>
          merger.offerAll(Wand.topK(byTerm, idfs, avgdl, kk,
            initialThreshold = merger.threshold))
        }
        merger.result.iterator
      }
      .collect()
  }

  /**
   * Prefix (trailing-wildcard) top-k — Lucene PrefixQuery under its
   * SCORING_BOOLEAN rewrite: the prefix expands against the dictionary
   * to its matching terms (a Parquet-pushdown `startsWith` range scan,
   * never a postings read), and the expansion runs through the shared
   * disjunctive WAND core with each expanded term keeping its own idf.
   * The prefix is lowercased but NOT analyzed (Lucene wildcard-term
   * semantics — stemming a partial term would corrupt it); a trailing
   * `*` is accepted and stripped. More than `maxExpansions` matching
   * terms throws rather than silently truncating the match set —
   * lengthen the prefix or raise the cap.
   */
  def searchPrefix(prefix: String, k: Int = 10,
                   maxExpansions: Int = 1024): Vector[QueryHit] = {
    val p = prefix.toLowerCase(java.util.Locale.ROOT).stripSuffix("*")
    require(p.nonEmpty, "empty prefix")
    if (stats.n_docs == 0) return Vector.empty
    val expanded = dictionary.filter(col("term").startsWith(p))
      .select("term").as[String].collect().sorted.toSeq
    require(expanded.length <= maxExpansions,
      s"prefix '$p*' expands to ${expanded.length} terms (> $maxExpansions) — " +
        "use a longer prefix or raise maxExpansions")
    if (expanded.isEmpty) Vector.empty
    else mergeDriver(searchTermsCollect(expanded, k), k)
  }

  /** The wildcard dictionary expansion ([[searchWildcard]]'s scan),
    * shared with the query-string parser. */
  private def expandWildcard(pattern: String, maxExpansions: Int): Seq[String] = {
    val p = pattern.toLowerCase(java.util.Locale.ROOT)
    require(p.exists(c => c != '*' && c != '?'),
      s"wildcard pattern '$pattern' has no literal characters")
    val litPrefix = p.takeWhile(c => c != '*' && c != '?')
    val base =
      if (litPrefix.nonEmpty) dictionary.filter(col("term").startsWith(litPrefix))
      else dictionary
    val expanded = base.filter(col("term").rlike(Wand.globToRegex(p)))
      .select("term").as[String].collect().sorted.toSeq
    require(expanded.length <= maxExpansions,
      s"wildcard '$p' expands to ${expanded.length} terms (> $maxExpansions) — " +
        "tighten the pattern or raise maxExpansions")
    expanded
  }

  /** The fuzzy dictionary expansion ([[searchFuzzy]]'s banded scan),
    * shared with the query-string parser. */
  private def expandFuzzy(term: String, maxEdits: Int,
                          maxExpansions: Int): Seq[String] = {
    require(maxEdits >= 0 && maxEdits <= 2, s"maxEdits $maxEdits not in 0..2")
    val q = term.toLowerCase(java.util.Locale.ROOT)
    require(q.nonEmpty, "empty fuzzy term")
    val expanded = dictionary
      .filter(length(col("term")).between(q.length - maxEdits, q.length + maxEdits))
      .filter(levenshtein(col("term"), lit(q)) <= maxEdits)
      .select("term").as[String].collect().sorted.toSeq
    require(expanded.length <= maxExpansions,
      s"'$q'~$maxEdits expands to ${expanded.length} terms (> $maxExpansions) — " +
        "lower maxEdits or raise maxExpansions")
    expanded
  }

  /**
   * Fuzzy top-k — Lucene FuzzyQuery under the same scoring-boolean
   * rewrite as [[searchPrefix]]: the term expands against the
   * dictionary to every vocabulary term within `maxEdits` Levenshtein
   * edits, and the expansion runs through the shared disjunctive WAND
   * core with each expanded term keeping its own idf. The distance
   * scan prunes first with a length band (|len(t) − len(q)| ≤
   * maxEdits, a necessary condition for the edit distance, and a
   * plain comparison Parquet can evaluate cheaply) so the full
   * `levenshtein` only runs on the banded slice; either way the scan
   * touches the DICTIONARY — the corpus vocabulary, orders of
   * magnitude smaller than the postings — never a posting list.
   * Lucene proper intersects a Levenshtein automaton with its term
   * FST; against a columnar dictionary this banded scan is that
   * intersection's analog (one pruned scan, no postings I/O).
   *
   * The term is lowercased but NOT analyzed (Lucene fuzzy-term
   * semantics — stemming a misspelling would corrupt it). More than
   * `maxExpansions` matching terms throws rather than silently
   * truncating the match set. `maxEdits` is capped at 2, Lucene's own
   * bound — beyond 2 edits the expansion stops meaning "typo".
   */
  def searchFuzzy(term: String, maxEdits: Int = 2, k: Int = 10,
                  maxExpansions: Int = 1024): Vector[QueryHit] = {
    require(maxEdits >= 0 && maxEdits <= 2, s"maxEdits $maxEdits not in 0..2")
    require(term.nonEmpty, "empty fuzzy term")
    if (stats.n_docs == 0) return Vector.empty
    val expanded = expandFuzzy(term, maxEdits, maxExpansions)
    if (expanded.isEmpty) Vector.empty
    else mergeDriver(searchTermsCollect(expanded, k), k)
  }

  /**
   * Wildcard top-k — Lucene WildcardQuery under the same
   * scoring-boolean rewrite as [[searchPrefix]]: the glob pattern
   * (`*` = any run, `?` = one character) expands against the
   * dictionary and the expansion runs through the shared disjunctive
   * WAND core with each expanded term keeping its own idf. The
   * pattern's literal prefix (the characters before the first
   * wildcard) pushes to Parquet as a `startsWith` range scan — the
   * columnar analog of Lucene seeking the term enum to the common
   * prefix — and the full anchored regex then runs only on that
   * slice. A leading-wildcard pattern is accepted (full dictionary
   * scan, exactly Lucene's cost caveat) but the scan still touches
   * the DICTIONARY only, never a posting list. The pattern is
   * lowercased but NOT analyzed (Lucene wildcard-term semantics).
   * More than `maxExpansions` matching terms throws rather than
   * silently truncating the match set.
   */
  def searchWildcard(pattern: String, k: Int = 10,
                     maxExpansions: Int = 1024): Vector[QueryHit] = {
    if (stats.n_docs == 0) {
      require(pattern.exists(c => c != '*' && c != '?'),
        s"wildcard pattern '$pattern' has no literal characters")
      return Vector.empty
    }
    val expanded = expandWildcard(pattern, maxExpansions)
    if (expanded.isEmpty) Vector.empty
    else mergeDriver(searchTermsCollect(expanded, k), k)
  }

  /**
   * Query-time term boosting (Lucene's `term^boost` syntax): each
   * term's score contribution scales by its boost, implemented by
   * scaling the term's idf before it enters the shared WAND core — so
   * every upper bound scales with the contribution and the pruning
   * stays lossless (boosts must be ≥ 0; a 0 boost keeps the term
   * matching at zero score, Lucene's behavior). A boost of 1.0 on
   * every term reproduces [[search]] bit-exactly (×1.0 is exact in
   * IEEE arithmetic). Each input is analyzed singly; one that
   * analyzes to more or fewer than one token throws (boost a phrase
   * by boosting its terms).
   */
  def searchBoosted(boosts: Seq[(String, Double)], k: Int = 10): Vector[QueryHit] = {
    require(boosts.forall(_._2 >= 0), "boosts must be >= 0")
    val termBoosts = boosts.map { case (raw, b) =>
      val ts = analyzer.tokenize(raw)
      require(ts.length == 1, s"boosted term '$raw' analyzed to ${ts.length} tokens")
      ts.head -> b
    }
    require(termBoosts.map(_._1).distinct.length == termBoosts.length,
      "duplicate boosted term")
    val bm = termBoosts.toMap
    mergeDriver(searchTermsCollect(bm.keys.toSeq.sorted, k, bm), k)
  }

  /**
   * Spellcheck / suggest (the Solr spellcheck component): the closest
   * dictionary terms to an input, as (term, distance, df) ordered by
   * (edit distance asc, df desc, term asc) — "nearest first, then
   * most common", Solr's popularity-weighted suggestion order, fully
   * deterministic. The same banded-Levenshtein dictionary scan as
   * [[searchFuzzy]] (length band pushes to Parquet, distance runs on
   * the banded slice, postings never touched); `orderBy.limit(n)`
   * plans as a distributed TakeOrdered, so only n rows reach the
   * driver no matter the vocabulary size.
   */
  def suggest(term: String, maxEdits: Int = 2, n: Int = 5): DataFrame = {
    require(maxEdits >= 0 && maxEdits <= 2, s"maxEdits $maxEdits not in 0..2")
    val q = term.toLowerCase(java.util.Locale.ROOT)
    require(q.nonEmpty, "empty suggest term")
    dictionary
      .filter(length(col("term")).between(q.length - maxEdits, q.length + maxEdits))
      .withColumn("distance", levenshtein(col("term"), lit(q)).cast("long"))
      .filter(col("distance") <= maxEdits)
      .select("term", "distance", "df")
      .orderBy(col("distance").asc, col("df").desc, col("term").asc)
      .limit(n)
  }

  /**
   * Query-STRING entry point: parse Lucene classic syntax
   * ([[QueryParser]]) and dispatch to the matching execution path.
   * Supported shapes (the engine's executors are per-shape, so the
   * parser enforces the combinations that have exact semantics
   * rather than silently approximating Lucene's free mixing):
   *
   *  - any `+term` / `-term` present → boolean query: `+` terms AND
   *    plain terms are all required, `-` terms exclude
   *    ([[searchBoolean]]); other clause kinds are rejected.
   *  - a single `"phrase"` / `"phrase"~N` clause → exact phrase /
   *    ordered proximity ([[searchNear]]).
   *  - otherwise (plain, `^boost`, wildcard, `~fuzzy` clauses) → ONE
   *    disjunctive query: wildcards and fuzzies expand against the
   *    dictionary, and per-term boosts SUM across clauses — exactly
   *    Lucene's additive clause scoring, since two SHOULD clauses on
   *    the same term contribute (b₁+b₂)·idf·tfNorm — then everything
   *    runs through the shared WAND core with boost-scaled idfs.
   */
  def searchParsed(q: String, k: Int = 10,
                   maxExpansions: Int = 1024): Vector[QueryHit] = {
    import QueryParser._
    val clauses = parse(q)
    require(clauses.nonEmpty, "empty query string")
    val musts = clauses.collect { case Must(t) => t }
    val nots = clauses.collect { case Not(t) => t }
    val phrases = clauses.collect { case p: Phrase => p }
    if (musts.nonEmpty || nots.nonEmpty) {
      require(clauses.forall {
        case _: Must | _: Not | _: Bare => true
        case _ => false
      }, "+/- (boolean) queries combine only with plain terms in this engine")
      val bares = clauses.collect { case Bare(t) => t }
      searchBoolean((musts ++ bares).mkString(" "), nots.mkString(" "), k)
    } else if (phrases.nonEmpty) {
      require(clauses.size == 1, "a phrase clause must stand alone")
      searchNear(phrases.head.text, phrases.head.slop, k)
    } else {
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      def add(t: String, b: Double): Unit =
        acc.update(t, acc.getOrElse(t, 0.0) + b)
      clauses.foreach {
        case Bare(t) => analyzer.tokenize(t).distinct.foreach(add(_, 1.0))
        case Boosted(t, b) =>
          val ts = analyzer.tokenize(t)
          require(ts.length == 1, s"boosted term '$t' analyzed to ${ts.length} tokens")
          add(ts.head, b)
        case Wild(p) => expandWildcard(p, maxExpansions).foreach(add(_, 1.0))
        case Fuzzy(t, me) => expandFuzzy(t, me, maxExpansions).foreach(add(_, 1.0))
        case _ => ()
      }
      if (acc.isEmpty || stats.n_docs == 0) return Vector.empty
      val bm = acc.toMap
      mergeDriver(searchTermsCollect(bm.keys.toSeq.sorted, k, bm), k)
    }
  }

  /** Term enumeration (the Solr terms component / Lucene TermsEnum):
    * dictionary terms matching an optional prefix, with their
    * document frequencies, ordered df-desc then term-asc (Solr's
    * `terms.sort=count`) and capped at `limit` — a pure dictionary
    * scan (prefix pushes to Parquet; `orderBy.limit` plans as a
    * distributed TakeOrdered), postings never touched. */
  def terms(prefix: String = "", limit: Int = 10): DataFrame = {
    require(limit > 0, "limit must be positive")
    val base =
      if (prefix.isEmpty) dictionary
      else dictionary.filter(col("term").startsWith(
        prefix.toLowerCase(java.util.Locale.ROOT)))
    base.select(col("term"), col("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(limit)
  }

  /** Whole-query spellcheck collation (Solr `spellcheck.collate`):
    * every query term replaced by its BEST dictionary suggestion
    * under the [[suggest]] order (edit distance asc, df desc, term
    * asc) — a term already in the dictionary is its own suggestion at
    * distance 0, so correct terms pass through unchanged and no
    * separate presence check is needed — plus the corrected query's
    * boolean (all-terms) hit count, Solr's "collation with hits"
    * response shape. ONE banded dictionary scan covers every distinct
    * query term (the [[searchManyMixed]] batched-fuzzy pattern: the
    * OR of the per-term length bands pushes to Parquet, candidates
    * come back with df, and the per-term best pick runs driver-side
    * under the same suggest order via the parity-pinned
    * [[Wand.editDistance]]) plus one distributed match-set count —
    * two Spark jobs total, where the round-5 form paid one sequential
    * suggest job per distinct term. A term with no suggestion within
    * `maxEdits` stays as typed; the collation then counts 0 hits,
    * exactly Solr's response for an uncorrectable term. */
  def collate(query: String, maxEdits: Int = 2): DataFrame = {
    import spark.implicits._
    require(maxEdits >= 0 && maxEdits <= 2, s"maxEdits $maxEdits not in 0..2")
    val raw = analyzer.tokenize(query)
    val bestOf = bestSuggestions(raw.distinct, maxEdits)
    val corrected = raw.map(t => bestOf(t).getOrElse(t))
    val collation = corrected.mkString(" ")
    val nHits = if (corrected.isEmpty) 0L else matchingDocs(collation).count()
    // column named `collated`: COLLATION is a reserved word in ANSI
    // SQL engines, which would break the cross-engine oracle
    Seq((collation, nHits)).toDF("collated", "n_hits")
  }

  /** Best dictionary suggestion per input term, in ONE batched
    * banded-Levenshtein dictionary job (CollateJobSpec pins the job
    * count): None for a term with no candidate within `maxEdits`. */
  private[query] def bestSuggestions(ts: Seq[String],
                                     maxEdits: Int): Map[String, Option[String]] = {
    import spark.implicits._
    if (ts.isEmpty) return Map.empty
    val matched = dictionary
      .filter(ts.map(t =>
        length(col("term")).between(t.length - maxEdits, t.length + maxEdits) &&
          levenshtein(col("term"), lit(t)) <= maxEdits).reduce(_ || _))
      .select("term", "df").as[(String, Long)].collect()
    ts.map { t =>
      val cands = matched.iterator
        .map { case (term, df) => (Wand.editDistance(term, t), -df, term) }
        .filter(_._1 <= maxEdits).toSeq
      t -> (if (cands.isEmpty) None else Some(cands.min._3))
    }.toMap
  }

  /**
   * More-like-this (the Lucene/Solr MLT component): find documents
   * similar to a SEED document by (1) selecting the seed's most
   * "interesting" terms — highest tf·idf within the seed, Lucene's
   * MLT heuristic, subject to `minTermFreq`/`minDocFreq` floors and a
   * `maxQueryTerms` cap — and (2) running the selected terms through
   * the shared disjunctive WAND core, excluding the seed itself from
   * the results. The seed's text is ONE row fetched from the doc
   * store and its term stats ONE dictionary lookup — O(1) driver
   * work; the search is the ordinary distributed top-k (collected at
   * k+1 so dropping the seed still leaves a full top-k).
   *
   * Selection orders by (tf·idf rounded to 4 decimals) desc, term
   * asc — the rounding makes the cutoff reproducible across engines
   * (ties in (tf, df) are exact; unequal pairs essentially never land
   * within 1e-4), exactly like the rank tie-breaks elsewhere. This
   * engine's idf is the BM25 idf used everywhere else (Lucene MLT
   * uses the classic `log(N/df)+1`; same ordering for fixed N in the
   * common range, and one consistent idf keeps selection and scoring
   * on the same scale).
   */
  def moreLikeThis(docId: Long, k: Int = 10, maxQueryTerms: Int = 25,
                   minTermFreq: Int = 1, minDocFreq: Int = 1): Vector[QueryHit] = {
    if (stats.n_docs == 0) return Vector.empty
    val seedOpt = IndexBuilder.readDocs(spark, dir)
      .filter(col("doc_id") === docId).select("text").as[String]
      .collect().headOption
    if (seedOpt.isEmpty) return Vector.empty // unknown seed: no neighbors
    val tfs = analyzer.tokenize(seedOpt.get).groupBy(identity).view
      .mapValues(_.size).toMap.filter(_._2 >= math.max(1, minTermFreq))
    if (tfs.isEmpty) return Vector.empty
    val dfs = docFreqs(tfs.keys.toSeq.sorted)
      .filter(_._2 >= math.max(1, minDocFreq))
    val chosen = dfs.toSeq
      .map { case (t, df) =>
        val sc = tfs(t) * BM25.idf(df, stats.n_docs)
        (t, BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (t, sc) => (-sc, t) }
      .take(maxQueryTerms).map(_._1).sorted
    if (chosen.isEmpty) return Vector.empty
    mergeDriver(searchTermsCollect(chosen, k + 1), k + 1)
      .filter(_.doc_id != docId).take(k)
  }

  /**
   * Minimum-should-match top-k (the Solr/Lucene `mm` parameter): BM25
   * over documents containing at least `minMatch` of the query's
   * terms, scored over the matching terms only — the middle ground
   * between the pure disjunction ([[search]], mm = 1) and the full
   * conjunction ([[searchBoolean]], mm = n, whose scores it
   * reproduces exactly). Same pruned postings scan, per-segment WAND
   * with the mm-extended pivot rule ([[Wand.topK]] `minMatch`),
   * θ-shared task merge, driver k-way merge.
   *
   * Terms absent from the corpus cannot match and do not count
   * toward `minMatch` (Lucene semantics); if fewer than `minMatch`
   * query terms exist in the corpus the result is empty.
   */
  def searchMinShouldMatch(query: String, minMatch: Int,
                           k: Int = 10): Vector[QueryHit] = {
    val mm = math.max(1, minMatch)
    val terms = analyzer.tokenize(query).distinct.sorted
    if (terms.isEmpty || stats.n_docs == 0) return Vector.empty
    val dfs = docFreqs(terms)
    if (dfs.size < mm) return Vector.empty
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val kk = k
    val g = groupSize

    val perTask = postingsServe
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        val merger = new Wand.TopKMerger(kk)
        Wand.bySegment(rows).foreach { case (_, byTerm) =>
          merger.offerAll(Wand.topK(byTerm, idfs, avgdl, kk,
            initialThreshold = merger.threshold, minMatch = mm))
        }
        merger.result.iterator
      }
      .collect()

    mergeDriver(perTask, k)
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

    val g = groupSize
    val perTask =
      try {
        postingsServe
          .filter(col("term").isInCollection(allTerms))
          .as[PostingBlockRow]
          .groupByKey(_.segment / g)
          .flatMapGroups { (_, rows) =>
            // one merger per query, θ carried across the task's segments
            val mergers = scala.collection.mutable.LinkedHashMap
              .empty[String, Wand.TopKMerger]
            Wand.bySegment(rows).foreach { case (_, byTerm) =>
              queriesB.value.foreach { case (qid, terms) =>
                val qBlocks = terms.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
                if (qBlocks.nonEmpty) {
                  val m = mergers.getOrElseUpdate(qid, new Wand.TopKMerger(kk))
                  m.offerAll(Wand.topK(qBlocks, idfs, avgdl, kk,
                    initialThreshold = m.threshold))
                }
              }
            }
            mergers.iterator.flatMap { case (qid, m) =>
              m.result.iterator.map(h => (qid, h.doc_id, h.score))
            }
          }
          .collect()
      } finally queriesB.unpersist(blocking = false) // async: frees executor copies without stalling the serving path (destroy() blocks)

    perTask.groupBy(_._1).toSeq.flatMap { case (qid, hits) =>
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
   * Mixed-shape batched serving: free-text, boolean (AND/NOT),
   * phrase, minimum-should-match, prefix, and fuzzy queries answered
   * together in ONE Spark job — one postings scan pruned to the union
   * of every query's terms (prefix/fuzzy expansions included, each
   * family resolved by ONE batch-wide dictionary scan), per-task
   * θ-shared evaluation per query, driver merge per query. Results
   * are identical to calling [[search]]/[[searchBoolean]]/
   * [[searchPhrase]]/[[searchMinShouldMatch]]/[[searchPrefix]]/
   * [[searchFuzzy]] per query (same summation order, tie-break, and
   * θ semantics — the SearchManySpec mixed test pins the parity).
   *
   * @param queries (query_id, spec)
   * @return (query_id, rank, doc_id, score), rank 1..k
   */
  def searchManyMixed(queries: Seq[(String, QuerySpec)],
                      k: Int = 10): Seq[(String, Int, Long, Double)] = {
    if (stats.n_docs == 0) return Seq.empty
    // only multi-token phrases read positions — the compile step below
    // downgrades a 1-term phrase to a plain term query, so a
    // positions-free index can still serve it
    val needPos = queries.exists {
      case (_, QuerySpec.Phrase(t)) => analyzer.tokenize(t).length >= 2
      case _ => false
    }
    require(!needPos || positionsStored,
      s"index at $dir was built with storePositions=false — phrase " +
        "queries need position lists; rebuild with storePositions=true")
    // compile each query driver-side: the terms whose blocks it needs
    // plus its scoring constants (idfs / idf sum). Prefix queries
    // expand FIRST — one dictionary scan for the whole batch (the OR
    // of every prefix's startsWith, still Parquet-pushable), terms
    // assigned back per prefix driver-side — so the expansions join
    // allTerms before dfs are fetched; mm and prefix then both compile
    // to the disjunctive shape (a prefix is a disjunction of its
    // expanded terms with per-term idfs, mm a disjunction evaluated at
    // minMatch).
    sealed trait C extends Serializable { def id: String }
    case class CFree(id: String, terms: Seq[String],
                     idfs: Map[String, Double], mm: Int = 1) extends C
    case class CBool(id: String, must: Seq[String], not: Seq[String],
                     idfs: Map[String, Double]) extends C
    case class CPhrase(id: String, seq: IndexedSeq[String],
                       idfSum: Double) extends C

    val prefixes = queries.collect {
      case (_, QuerySpec.Prefix(p, _)) =>
        p.toLowerCase(java.util.Locale.ROOT).stripSuffix("*")
    }.distinct.filter(_.nonEmpty)
    val expansions: Map[String, Seq[String]] =
      if (prefixes.isEmpty) Map.empty
      else {
        val matched = dictionary
          .filter(prefixes.map(p => col("term").startsWith(p)).reduce(_ || _))
          .select("term").as[String].collect().sorted.toSeq
        prefixes.map(p => p -> matched.filter(_.startsWith(p))).toMap
      }

    // fuzzy expansion: ONE banded-levenshtein dictionary scan covering
    // every fuzzy term in the batch, matches assigned back per query
    // driver-side with the same classic unit-cost edit distance the
    // scan used (Spark's levenshtein — the two must agree exactly)
    val fuzzies = queries.collect {
      case (_, QuerySpec.Fuzzy(t, me, _)) =>
        (t.toLowerCase(java.util.Locale.ROOT), math.min(math.max(me, 0), 2))
    }.distinct.filter(_._1.nonEmpty)
    val fuzzyExpansions: Map[(String, Int), Seq[String]] =
      if (fuzzies.isEmpty) Map.empty
      else {
        val matched = dictionary
          .filter(fuzzies.map { case (t, me) =>
            length(col("term")).between(t.length - me, t.length + me) &&
              levenshtein(col("term"), lit(t)) <= me
          }.reduce(_ || _))
          .select("term").as[String].collect().sorted.toSeq
        fuzzies.map { case (t, me) =>
          (t, me) -> matched.filter(Wand.editDistanceWithin(_, t, me))
        }.toMap
      }

    val allTerms = queries.flatMap { case (_, q) => q match {
      case QuerySpec.Free(t) => analyzer.tokenize(t)
      case QuerySpec.Boolean(m, n) => analyzer.tokenize(m) ++ analyzer.tokenize(n)
      case QuerySpec.Phrase(t) => analyzer.tokenize(t)
      case QuerySpec.MinMatch(t, _) => analyzer.tokenize(t)
      case QuerySpec.Prefix(p, _) =>
        expansions.getOrElse(
          p.toLowerCase(java.util.Locale.ROOT).stripSuffix("*"), Nil)
      case QuerySpec.Fuzzy(t, me, _) =>
        fuzzyExpansions.getOrElse(
          (t.toLowerCase(java.util.Locale.ROOT),
            math.min(math.max(me, 0), 2)), Nil)
    }}.distinct.sorted
    if (allTerms.isEmpty) return Seq.empty
    val dfs = docFreqs(allTerms)
    def idfOf(ts: Seq[String]) =
      ts.flatMap(t => dfs.get(t).map(df => t -> BM25.idf(df, stats.n_docs))).toMap

    val compiled: Seq[C] = queries.flatMap { case (id, q) => q match {
      case QuerySpec.Free(t) =>
        val terms = analyzer.tokenize(t).distinct.sorted
        val idfs = idfOf(terms)
        if (idfs.isEmpty) None else Some(CFree(id, terms, idfs))
      case QuerySpec.MinMatch(t, m) =>
        val mm = math.max(1, m)
        val terms = analyzer.tokenize(t).distinct.sorted
        val idfs = idfOf(terms)
        if (idfs.size < mm) None else Some(CFree(id, terms, idfs, mm))
      case QuerySpec.Prefix(p, maxExp) =>
        val terms = expansions.getOrElse(
          p.toLowerCase(java.util.Locale.ROOT).stripSuffix("*"), Nil)
        require(terms.length <= maxExp,
          s"prefix '$p' expands to ${terms.length} terms (> $maxExp)")
        if (terms.isEmpty) None else Some(CFree(id, terms, idfOf(terms)))
      case QuerySpec.Fuzzy(t, me, maxExp) =>
        val terms = fuzzyExpansions.getOrElse(
          (t.toLowerCase(java.util.Locale.ROOT),
            math.min(math.max(me, 0), 2)), Nil)
        require(terms.length <= maxExp,
          s"fuzzy '$t'~$me expands to ${terms.length} terms (> $maxExp)")
        if (terms.isEmpty) None else Some(CFree(id, terms, idfOf(terms)))
      case QuerySpec.Boolean(m, n) =>
        val must = analyzer.tokenize(m).distinct.sorted
        val not = analyzer.tokenize(n).distinct.sorted.filterNot(must.contains)
        if (must.isEmpty || must.exists(!dfs.contains(_))) None
        else Some(CBool(id, must, not, idfOf(must)))
      case QuerySpec.Phrase(t) =>
        val terms = analyzer.tokenize(t)
        if (terms.isEmpty || terms.distinct.exists(!dfs.contains(_))) None
        else if (terms.length == 1)
          Some(CFree(id, terms, idfOf(terms))) // 1-term phrase = term query
        else Some(CPhrase(id, terms.toIndexedSeq,
          terms.foldLeft(0.0)((s, x) => s + BM25.idf(dfs(x), stats.n_docs))))
    }}
    if (compiled.isEmpty) return Seq.empty
    val avgdl = stats.avgdl
    val kk = k
    val g = groupSize
    val qB = spark.sparkContext.broadcast(compiled)

    val perTask =
      try {
        postingsServe
          .filter(col("term").isInCollection(allTerms))
          .as[PostingBlockRow]
          .groupByKey(_.segment / g)
          .flatMapGroups { (_, rows) =>
            val mergers = scala.collection.mutable.LinkedHashMap
              .empty[String, Wand.TopKMerger]
            def m(id: String) = mergers.getOrElseUpdate(id, new Wand.TopKMerger(kk))
            Wand.bySegment(rows).foreach { case (_, byTerm) =>
              qB.value.foreach {
                case CFree(id, terms, idfs, minM) =>
                  val qb = terms.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
                  if (qb.nonEmpty) {
                    val mm = m(id)
                    mm.offerAll(Wand.topK(qb, idfs, avgdl, kk,
                      initialThreshold = mm.threshold, minMatch = minM))
                  }
                case CBool(id, must, not, idfs) =>
                  val mb = must.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
                  val nb = not.iterator.flatMap(t => byTerm.get(t).map(t -> _)).toMap
                  if (mb.nonEmpty) {
                    val mm = m(id)
                    mm.offerAll(Wand.topKConjunctive(mb, nb, idfs, avgdl, kk, must,
                      initialThreshold = mm.threshold))
                  }
                case CPhrase(id, seq, idfSum) =>
                  val qb = seq.distinct.iterator
                    .flatMap(t => byTerm.get(t).map(t -> _)).toMap
                  if (qb.nonEmpty) {
                    val mm = m(id)
                    mm.offerAll(Wand.topKPhrase(qb, seq, idfSum, avgdl, kk,
                      initialThreshold = mm.threshold))
                  }
              }
            }
            mergers.iterator.flatMap { case (id, mm) =>
              mm.result.iterator.map(h => (id, h.doc_id, h.score))
            }
          }
          .collect()
      } finally qB.unpersist(blocking = false)

    perTask.groupBy(_._1).toSeq.flatMap { case (qid, hits) =>
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

    val g = groupSize
    val allowed = IndexBuilder.readStaging(spark, dir)
      .filter(predicate)
      .select(col("segment").as("a_segment"), col("doc_id").as("a_doc_id"))
      .as[(Int, Long)]
      .groupByKey(_._1 / g)
    val blocks = postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)

    val perTask = blocks.cogroup(allowed) { (_, rows, allowRows) =>
      val segs = Wand.bySegment(rows)
      if (segs.isEmpty) Iterator.empty
      else {
        // per-segment allowed sets as SORTED primitive long arrays +
        // binary search (~8 B/doc — no boxing, no HashSet node
        // overhead): memory stays proportional to predicate
        // selectivity but at the representation floor, so even a
        // permissive predicate (≈ every doc allowed) costs segSize
        // longs per segment, not a multi-GB boxed hash set. Absent
        // segment → nothing allowed there.
        val okBySeg = new java.util.HashMap[Int, LongBuf]()
        allowRows.foreach { case (s, id) =>
          var buf = okBySeg.get(s)
          if (buf == null) { buf = new LongBuf(); okBySeg.put(s, buf) }
          buf.add(id)
        }
        val merger = new Wand.TopKMerger(kk)
        segs.foreach { case (seg, byTerm) =>
          val buf = okBySeg.get(seg)
          if (buf != null && buf.nonEmpty) {
            val arr = buf.sortedArray
            merger.offerAll(Wand.topK(byTerm, idfs, avgdl, kk,
              initialThreshold = merger.threshold,
              allow = id => java.util.Arrays.binarySearch(arr, id) >= 0))
          }
        }
        merger.result.iterator
      }
    }.collect()

    mergeDriver(perTask, k)
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

    val g = groupSize
    val perTask = postingsServe
      .filter(col("term").isInCollection(allTerms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        val merger = new Wand.TopKMerger(kk)
        Wand.bySegment(rows).foreach { case (_, byTerm) =>
          val (mb, nb) = byTerm.partition { case (t, _) => mustSet.contains(t) }
          merger.offerAll(Wand.topKConjunctive(mb, nb, idfs, avgdl, kk, must,
            initialThreshold = merger.threshold))
        }
        merger.result.iterator
      }
      .collect()

    mergeDriver(perTask, k)
  }

  /**
   * Exact phrase top-k, INDEX-ONLY (format v3 positional postings): a
   * single pruned postings scan of the phrase's distinct terms,
   * per-segment conjunctive leapfrog + position-list adjacency
   * counting ([[Wand.topKPhrase]]), driver k-way merge. No candidate
   * cap, no re-read of document text — an all-common-terms phrase
   * costs the conjunction, never a truncated answer. Scoring is Lucene
   * PhraseQuery semantics: tf = phrase frequency, idf = Σ idf(term_i)
   * over the phrase's terms in order (duplicates counted).
   */
  def searchPhrase(phrase: String, k: Int = 10): Vector[QueryHit] =
    searchNear(phrase, 0, k)

  /**
   * Ordered proximity top-k (Lucene SpanNearQuery inOrder=true / the
   * sloppy-phrase family): the phrase's terms must appear IN ORDER
   * within a span of at most (m−1)+slop positions; `slop = 0` IS the
   * exact phrase query ([[searchPhrase]] delegates here). Same
   * index-only execution as the exact path — conjunctive leapfrog
   * over the distinct terms, then greedy minimal-chain span counting
   * over the v3 position lists ([[Wand.topKPhrase]]) with block-max
   * early termination — and the same PhraseQuery scoring (tf = span
   * count, idf = Σ idf(term_i) in phrase order). Each matching start
   * position counts 1 (the span count — reproducible in plain SQL),
   * not Lucene's 1/(1+dist) sloppyFreq weighting.
   */
  def searchNear(phrase: String, slop: Int, k: Int = 10): Vector[QueryHit] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    require(positionsStored,
      s"index at $dir was built with storePositions=false — phrase/near " +
        "queries need position lists; rebuild with storePositions=true")
    val terms = analyzer.tokenize(phrase) // ordered, duplicates kept
    if (terms.isEmpty || stats.n_docs == 0) return Vector.empty
    if (terms.length == 1) return search(phrase, k)
    val dfs = docFreqs(terms.distinct)
    if (dfs.size < terms.distinct.size) return Vector.empty
    // Lucene PhraseWeight: idf summed over term OCCURRENCES in order
    val idfSum = terms.foldLeft(0.0)((s, t) => s + BM25.idf(dfs(t), stats.n_docs))
    val avgdl = stats.avgdl
    val kk = k
    val sl = slop
    val seq = terms.toIndexedSeq

    val g = groupSize
    val perTask = postingsServe
      .filter(col("term").isInCollection(terms.distinct))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        val merger = new Wand.TopKMerger(kk)
        Wand.bySegment(rows).foreach { case (_, byTerm) =>
          merger.offerAll(Wand.topKPhrase(byTerm, seq, idfSum, avgdl, kk,
            initialThreshold = merger.threshold, slop = sl))
        }
        merger.result.iterator
      }
      .collect()

    mergeDriver(perTask, k)
  }

  /**
   * Two-term UNORDERED proximity top-k (SpanNearQuery inOrder=false):
   * the terms must co-occur within |q − p| ≤ slop + 1 positions in
   * EITHER order — pf counts `termA`'s qualifying occurrences
   * ([[Wand.topKNearUnordered2]]), scored like the phrase family
   * (tf = pf, idf = idf(A) + idf(B)). Same index-only execution as
   * [[searchNear]]. Each term is analyzed singly and must survive as
   * one distinct token.
   */
  def searchNearUnordered(termA: String, termB: String, slop: Int,
                          k: Int = 10): Vector[QueryHit] = {
    require(slop >= 0, s"slop must be >= 0, got $slop")
    require(positionsStored,
      s"index at $dir was built with storePositions=false — proximity " +
        "queries need position lists; rebuild with storePositions=true")
    val ts = Seq(termA, termB).map { raw =>
      val t = analyzer.tokenize(raw)
      require(t.length == 1, s"near term '$raw' analyzed to ${t.length} tokens")
      t.head
    }
    val (a, b) = (ts(0), ts(1))
    require(a != b, "unordered near needs two distinct terms")
    if (stats.n_docs == 0) return Vector.empty
    val dfs = docFreqs(Seq(a, b).distinct)
    if (dfs.size < 2) return Vector.empty
    val idfSum = BM25.idf(dfs(a), stats.n_docs) + BM25.idf(dfs(b), stats.n_docs)
    val avgdl = stats.avgdl
    val kk = k
    val sl = slop
    val g = groupSize
    val perTask = postingsServe
      .filter(col("term").isInCollection(Seq(a, b)))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        val merger = new Wand.TopKMerger(kk)
        Wand.bySegment(rows).foreach { case (_, byTerm) =>
          merger.offerAll(Wand.topKNearUnordered2(byTerm, a, b, sl,
            idfSum, avgdl, kk, initialThreshold = merger.threshold))
        }
        merger.result.iterator
      }
      .collect()
    mergeDriver(perTask, k)
  }

  /**
   * The FULL match set of a boolean query as a DataFrame of docIds —
   * search as a relational operator. No scoring, no top-k heap, and
   * crucially NO driver collect: per-segment leapfrog intersection
   * emits matching docIds ([[Wand.matchingDocIds]]) and the result
   * STAYS distributed, so facet counts, joins against document
   * metadata, and bulk exports compose as ordinary DataFrame ops
   * downstream. At 100 TB the match set of a selective conjunction is
   * exactly what should flow into a shuffle — never the postings, and
   * never a driver materialization (the top-k paths collect O(k·tasks)
   * rows; a match SET is unbounded and must not come home).
   */
  def matchingDocs(mustQuery: String, notQuery: String = ""): DataFrame = {
    val must = analyzer.tokenize(mustQuery).distinct.sorted
    val not = analyzer.tokenize(notQuery).distinct.sorted.filterNot(must.contains)
    def empty = spark.createDataset(Seq.empty[Long]).toDF("doc_id")
    if (must.isEmpty || stats.n_docs == 0) return empty
    if (docFreqs(must).size < must.size) return empty // a must-term is absent
    val mustSet = must.toSet
    val allTerms = must ++ not
    val g = groupSize
    postings
      .filter(col("term").isInCollection(allTerms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        Wand.bySegment(rows).iterator.flatMap { case (_, byTerm) =>
          val (mb, nb) = byTerm.partition { case (t, _) => mustSet.contains(t) }
          Wand.matchingDocIds(mb, nb, must)
        }
      }
      .toDF("doc_id")
  }

  /**
   * The FULL scored match set of a disjunctive (optionally
   * minimum-should-match) query as a DataFrame of (doc_id, score) —
   * the scored sibling of [[matchingDocs]]. No top-k heap and NO
   * driver collect: per-segment cursor merges emit every matching
   * doc's full BM25 score ([[Wand.scoredDocIds]], bit-equal to the
   * top-k scores) and the result stays distributed, so collapsing,
   * score-thresholded exports, and metadata joins compose as ordinary
   * DataFrame ops. At 100 TB this is what must flow into a shuffle —
   * never the postings, never a driver materialization.
   */
  def scoredDocs(query: String, minMatch: Int = 1): DataFrame = {
    val mm = math.max(1, minMatch)
    val terms = analyzer.tokenize(query).distinct.sorted
    def empty = spark.createDataset(Seq.empty[(Long, Double)]).toDF("doc_id", "score")
    if (terms.isEmpty || stats.n_docs == 0) return empty
    val dfs = docFreqs(terms)
    if (dfs.size < mm || dfs.isEmpty) return empty
    val idfs = dfs.map { case (t, df) => t -> BM25.idf(df, stats.n_docs) }
    val avgdl = stats.avgdl
    val g = groupSize
    postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        Wand.bySegment(rows).iterator.flatMap { case (_, byTerm) =>
          Wand.scoredDocIds(byTerm, idfs, avgdl, mm)
        }
      }
      .toDF("doc_id", "score")
  }

  /**
   * The full scored match set under query-time SYNONYM expansion
   * (Solr's SynonymGraphFilter at query time / Lucene SynonymQuery):
   * each group of terms scores as ONE virtual term — tf summed across
   * the group's members, idf from the group's MAX member df — so a
   * document mentioning any mix of the synonyms saturates the same
   * curve a single term would, instead of stacking per-member scores
   * the way a plain OR does. Groups must be disjoint. Same segment
   * machinery and scale shape as [[scoredDocs]].
   */
  def scoredDocsSynonyms(groups: Seq[Seq[String]]): DataFrame = {
    val gs = groups.map(g => g.flatMap(analyzer.tokenize(_)).distinct.sorted)
      .filter(_.nonEmpty)
    val flat = gs.flatten
    require(flat.distinct.size == flat.size, "synonym groups must be disjoint")
    def empty = spark.createDataset(Seq.empty[(Long, Double)]).toDF("doc_id", "score")
    if (gs.isEmpty || stats.n_docs == 0) return empty
    val dfs = docFreqs(flat)
    // groups whose every member is absent contribute nothing
    val live = gs.filter(_.exists(dfs.contains))
    if (live.isEmpty) return empty
    val groupIdfs = live.map { g =>
      BM25.idf(g.flatMap(dfs.get).max, stats.n_docs)
    }.toArray
    val termGroup = live.zipWithIndex
      .flatMap { case (g, i) => g.map(_ -> i) }.toMap
    val terms = live.flatten
    val avgdl = stats.avgdl
    val g = groupSize
    postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        Wand.bySegment(rows).iterator.flatMap { case (_, byTerm) =>
          Wand.scoredDocIdsSynonyms(byTerm, termGroup, groupIdfs, avgdl)
        }
      }
      .toDF("doc_id", "score")
  }

  /**
   * The full scored match set under the Dirichlet-smoothed
   * language-model similarity (Solr's per-field `similarity` config
   * with LMDirichletSimilarity; Zhai & Lafferty '01) — the engine's
   * second scorer, sharing the postings/dictionary/segment machinery
   * with BM25: per matched term max(0, ln(1 + tf/(μ·p(t|C))) +
   * ln(μ/(dl+μ))), p(t|C) = cf/totalTokens from the dictionary.
   * Serves through the relational path (match set → TakeOrdered at
   * the caller), not the WAND heap: the block-max metadata bounds
   * BM25's tfNorm, not the LM saturation curve, so BM25 remains the
   * pruned default scorer and the LM is the re-scoring alternative —
   * at 100 TB a scored MATCH SET is what flows into a shuffle either
   * way. Same determinism contract as [[scoredDocs]] (ascending-term
   * summation; clamp per term).
   */
  def scoredDocsDirichlet(query: String, mu: Double = 2000.0,
                          minMatch: Int = 1): DataFrame = {
    require(mu > 0, "mu must be positive")
    val mm = math.max(1, minMatch)
    val terms = analyzer.tokenize(query).distinct.sorted
    def empty = spark.createDataset(Seq.empty[(Long, Double)]).toDF("doc_id", "score")
    if (terms.isEmpty || stats.n_docs == 0) return empty
    val cfs = collectionFreqs(terms)
    if (cfs.size < mm || cfs.isEmpty) return empty
    val total = totalTokens
    if (total <= 0) return empty
    val ps = cfs.map { case (t, cf) => t -> cf.toDouble / total }
    val g = groupSize
    val muL = mu
    postings
      .filter(col("term").isInCollection(terms))
      .as[PostingBlockRow]
      .groupByKey(_.segment / g)
      .flatMapGroups { (_, rows) =>
        Wand.bySegment(rows).iterator.flatMap { case (_, byTerm) =>
          Wand.scoredDocIdsDirichlet(byTerm, ps, muL, mm)
        }
      }
      .toDF("doc_id", "score")
  }

  /**
   * Field collapsing (Solr collapse / Lucene grouping): one best-
   * scoring document per group of a metadata column, with the group's
   * match count — `scoredDocs ⨝ metadata → per-group argmax`, all
   * distributed (the shuffle carries matched (docId, score) pairs and
   * the argmax is a map-side-combinable max_by; group cardinality,
   * not corpus size, reaches the driver only if the caller collects).
   * Ties break (score desc, docId asc) via the max_by ordering key.
   * `scoreKey` optionally transforms the score BEFORE the argmax
   * (e.g. rounding, quantized relevance tiers) — the reported score
   * is the transformed one, so selection and output stay consistent.
   */
  def searchCollapse(query: String, meta: DataFrame, idCol: String,
                     groupCol: String, minMatch: Int = 1,
                     scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                       = identity): DataFrame =
    scoredDocs(query, minMatch)
      .withColumn("score", scoreKey(col("score")))
      .join(meta.select(col(idCol).cast("long").as("doc_id"), col(groupCol)),
        Seq("doc_id"))
      .groupBy(groupCol)
      .agg(
        max_by(col("doc_id"),
          struct(col("score"), lit(0L) - col("doc_id"))).as("doc_id"),
        max(col("score")).as("score"),
        count(lit(1)).as("n_matches"))

  /** Result grouping (Solr group.field / group.limit, Lucene
    * grouping): the top `perGroup` hits per metadata group by
    * (score desc, doc_id asc), over the FULL scored match set — the
    * generalization of [[searchCollapse]] (perGroup = 1 selects the
    * same docs). One rank window per group after the match-set ⨝
    * metadata join: the shuffle carries matched (docId, score) pairs
    * partitioned BY GROUP — never a global sort, never the driver.
    * `scoreKey` as in [[searchCollapse]] (rounding before the rank
    * keeps engine and oracle selections identical). */
  def searchGroupTopK(query: String, meta: DataFrame, idCol: String,
                      groupCol: String, perGroup: Int, minMatch: Int = 1,
                      scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                        = identity): DataFrame = {
    require(perGroup > 0, "perGroup must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("score").desc, col("doc_id").asc)
    scoredDocs(query, minMatch)
      .withColumn("score", scoreKey(col("score")))
      .join(meta.select(col(idCol).cast("long").as("doc_id"), col(groupCol)),
        Seq("doc_id"))
      .withColumn("grank", row_number().over(w).cast("long"))
      .filter(col("grank") <= perGroup)
      .select(col(groupCol), col("grank"), col("doc_id"), col("score"))
  }

  /** Function-query boosting (Solr's `boost=` / Lucene
    * FunctionScoreQuery): each match's relevance score MULTIPLIED by
    * a caller-supplied column expression over document metadata
    * (recency decay, popularity, length priors…) — scored match set ⨝
    * metadata → `score · boost` → distributed TakeOrdered, never a
    * global sort. Unlike [[searchBoosted]] (per-TERM weights inside
    * the WAND core), the function is per-DOCUMENT and outside the
    * core, so it composes with any boost shape at the cost of scoring
    * the full match set (the price Lucene pays too — a function query
    * can't be bounded by term upper bounds). `scoreKey` (e.g. 4dp
    * rounding) applies AFTER the multiply, so engine and oracle rank
    * the same values. */
  def searchBoostBy(query: String, meta: DataFrame, idCol: String,
                    boost: org.apache.spark.sql.Column, k: Int = 10,
                    minMatch: Int = 1,
                    scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                      = identity): DataFrame = {
    require(k > 0, "k must be positive")
    scoredDocs(query, minMatch)
      .join(meta.select(col(idCol).cast("long").as("doc_id"),
        boost.cast("double").as("boost_v")), Seq("doc_id"))
      .withColumn("score", scoreKey(col("score") * col("boost_v")))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .select("doc_id", "score")
  }

  /** Re-ranking (the Solr ReRankQParser / Lucene QueryRescorer): the
    * main query's top `n` hits re-ordered by `score₁ + weight·score₂`
    * where score₂ comes from a second (usually more expensive) query;
    * docs the second query doesn't match keep score₁ — exactly
    * Solr's additive reRank semantics. The top-n cut runs on the
    * FIRST query's (rounded) scores via distributed TakeOrdered; the
    * rescore is a LEFT join of the n-row cut against the second
    * query's scored match set, so the expensive side never exceeds n
    * rows in the join. `scoreKey` applies to score₁ BEFORE the cut
    * and to the combined score, keeping both cutoffs engine-stable. */
  def rerank(query: String, rescoreQuery: String, n: Int, weight: Double,
             k: Int = 10,
             scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
               = identity): DataFrame = {
    require(n > 0 && k > 0, "n and k must be positive")
    val base = scoredDocs(query)
      .withColumn("score", scoreKey(col("score")))
      .orderBy(col("score").desc, col("doc_id").asc).limit(n)
    val re = scoredDocs(rescoreQuery)
      .withColumnRenamed("score", "score2")
    base.join(re, Seq("doc_id"), "left")
      .withColumn("score", scoreKey(
        col("score") + lit(weight) * coalesce(col("score2"), lit(0.0))))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .select("doc_id", "score")
  }

  /** Query elevation (the Solr QueryElevationComponent): editorially
    * pinned documents first, in the given order, then the organic
    * ranking. Elevated documents are included even when they do not
    * match the query (Solr's component injects them by id), with
    * organic score 0.0; elevated documents that DO match keep their
    * BM25 score but rank by elevation position. Implementation: the
    * scored match set unioned with the (tiny) elevation list as
    * zero-score rows, one map-side-combinable max-aggregate collapses
    * the overlap (BM25 scores are strictly positive, so a matching
    * elevated doc's real score wins), elevation position looked up
    * from a literal map, then ONE TakeOrdered — O(k) to the driver,
    * never the match set. Returns (doc_id, score, elevated) in final
    * rank order. */
  def elevate(query: String, elevated: Seq[Long], k: Int = 10,
              scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                = identity): DataFrame = {
    require(k > 0, "k must be positive")
    require(elevated.nonEmpty, "elevation list must be non-empty")
    require(elevated.distinct.size == elevated.size,
      "elevation list must not repeat a doc id")
    import spark.implicits._
    val posMap = typedLit(elevated.zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap)
    val eDf = elevated.map(id => (id, 0.0)).toDF("doc_id", "score")
    scoredDocs(query)
      .withColumn("score", scoreKey(col("score")))
      .union(eDf)
      .groupBy("doc_id").agg(max(col("score")).as("score"))
      .withColumn("elev_pos", element_at(posMap, col("doc_id")))
      .orderBy(
        when(col("elev_pos").isNotNull, lit(0)).otherwise(lit(1)).asc,
        col("elev_pos").asc_nulls_last,
        col("score").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("score"),
        col("elev_pos").isNotNull.as("elevated"))
  }

  /** Term vectors (the Solr TermVectorComponent): per-document
    * (term, tf, df) rows for the given doc ids — tf recomputed from
    * the STORED text under the v1 chain (Solr's own fallback when
    * vectors aren't indexed reads stored fields the same way), df
    * joined from the index dictionary. One id-filtered doc-store
    * scan → explode → count, one broadcast-sized dictionary join —
    * never a postings read (our postings are term-major; walking
    * them doc-ward would scan the whole index for k docs). Like
    * [[snippets]], exact for v1-chain indexes; a stemming chain's
    * dictionary holds stems, which won't join raw-token tfs. */
  def termVectors(docIds: Seq[Long]): DataFrame = {
    require(docIds.nonEmpty, "termVectors needs at least one doc id")
    val toks = graft.operators.TextAnalysis.tokensCol(col("text"))
    IndexBuilder.readDocs(spark, dir)
      .filter(col("doc_id").isInCollection(docIds))
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(dictionary.select(col("term"), col("df")), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Per-document significant terms (tf·idf keyword extraction — the
    * Lucene MoreLikeThis "interesting terms" / Solr tv.tf_idf shape):
    * for each given document, the top `k` stored-text terms by
    * tf · ln(N/df), built on [[termVectors]] (one id-filtered
    * doc-store scan + a broadcast-sized dictionary join). Scores are
    * rounded to 4 decimals BEFORE the per-doc cut so the ranking is
    * representation-stable across engines; ties break term-ascending.
    * The window partitions by doc_id over ≤ |docIds| · vocab rows —
    * bounded by the request, never the corpus. */
  def keywords(docIds: Seq[Long], k: Int = 5): DataFrame = {
    require(k > 0, "k must be positive")
    val n = stats.n_docs
    val tv = termVectors(docIds)
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    tv.withColumn("krank", row_number().over(w).cast("long"))
      .filter(col("krank") <= k)
      .select(col("doc_id"), col("krank"), col("term"), col("tfidf"))
  }

  /** Join query (Solr's `{!join from=f to=f}` over one collection):
    * every document whose `joinCol` value appears among the boolean
    * query's matches — match set ⨝ metadata → DISTINCT join keys →
    * left-semi back onto the metadata. The key set is bounded by the
    * join column's cardinality (never the match set), so the semi-
    * join side is broadcastable at any corpus size. */
  def searchJoin(mustQuery: String, notQuery: String, meta: DataFrame,
                 idCol: String, joinCol: String): DataFrame = {
    val m = meta.select(col(idCol).cast("long").as("doc_id"), col(joinCol))
    val keys = matchingDocs(mustQuery, notQuery)
      .join(m, Seq("doc_id")).select(joinCol).distinct()
    m.join(keys, Seq(joinCol), "left_semi").select("doc_id")
  }

  /** Deep paging (Solr cursorMark / Lucene searchAfter): the next `k`
    * hits strictly AFTER a `(score, docId)` cursor in (score desc,
    * doc_id asc) order — the stateless pagination that stays O(k) per
    * page regardless of page depth, where `start=N` offset paging
    * costs O(N + k). Computed over the full scored match set with the
    * cursor as a FILTER, then `orderBy.limit(k)` — Spark plans that
    * as a distributed TakeOrdered (per-partition heaps, k rows to the
    * driver), so no page ever materializes more than k rows anywhere.
    * Hits come back page-ordered. Pass the last hit of a page as the
    * next page's cursor; with `scoreKey` rounding (recommended — it
    * makes the cursor representation-stable across engines) ties are
    * broken by doc_id exactly as the ordering does, so pages never
    * skip or repeat a document. */
  def searchAfter(query: String, k: Int = 10,
                  after: Option[(Double, Long)] = None, minMatch: Int = 1,
                  scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                    = identity): Vector[QueryHit] = {
    require(k > 0, "k must be positive")
    val scored = scoredDocs(query, minMatch)
      .withColumn("score", scoreKey(col("score")))
    val paged = after match {
      case Some((s, id)) =>
        scored.filter(col("score") < s ||
          (col("score") === s && col("doc_id") > id))
      case None => scored
    }
    paged.orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .collect().iterator
      .map(r => QueryHit(r.getLong(r.fieldIndex("doc_id")),
        r.getDouble(r.fieldIndex("score"))))
      .toVector
  }

  /** Snippet generation (the Solr highlighter / Lucene
    * FastVectorHighlighter shape): for the given doc ids, a `width`-
    * token window of the STORED text centered on the first query-term
    * occurrence, matched terms wrapped in `<em>`. All column
    * expressions over the doc store (one Parquet scan filtered to the
    * k hit ids — an id IN-filter Parquet can evaluate against row-
    * group stats): v1 tokens → first-match position (array_position
    * per term, 0 = absent mapped to a sentinel, least) → slice →
    * per-token wrap → join. Tokens come from the V1 chain of the
    * stored text, and a token is marked iff it equals an ANALYZED
    * query term — exact for v1-chain indexes (the common case); under
    * a stemming chain morphological variants score but are not
    * marked, the classic highlighter/analyzer mismatch Lucene
    * documents for its own highlighters. */
  def snippets(query: String, docIds: Seq[Long], width: Int = 10): DataFrame = {
    require(width > 0, "width must be positive")
    val terms = analyzer.tokenize(query).distinct.sorted
    val Big = 999999999L
    val toks = graft.operators.TextAnalysis.tokensCol(col("text"))
    val firstPos = least(terms.map { t =>
      val ap = array_position(col("ts"), t)
      when(ap === 0, Big).otherwise(ap)
    }: _*)
    IndexBuilder.readDocs(spark, dir)
      .filter(col("doc_id").isInCollection(docIds))
      .withColumn("ts", toks)
      .withColumn("mpos",
        when(firstPos === Big, 1L).otherwise(firstPos))
      .withColumn("start", greatest(lit(1L), col("mpos") - lit(width / 2)))
      .withColumn("sn", slice(col("ts"), col("start").cast("int"), lit(width)))
      .withColumn("snippet", array_join(
        transform(col("sn"), t =>
          when(t.isInCollection(terms), concat(lit("<em>"), t, lit("</em>")))
            .otherwise(t)), " "))
      .select(col("doc_id"), col("snippet"))
  }

  /** Highlighted top-k serving: [[search]]'s hits joined with their
    * [[snippets]] — (doc_id, score, snippet), score-desc order left
    * to the caller (the k-row join output is driver-sized). */
  def highlight(query: String, k: Int = 10, width: Int = 10): DataFrame = {
    val hits = search(query, k)
    val hitsDF = spark.createDataFrame(hits.map(h => (h.doc_id, h.score)))
      .toDF("doc_id", "score")
    hitsDF.join(snippets(query, hits.map(_.doc_id), width), Seq("doc_id"))
      .select("doc_id", "score", "snippet")
  }

  /** Facet queries (Solr `facet.query`): the match-set COUNT of each
    * named boolean (must, not) subquery — arbitrary-predicate facet
    * buckets next to [[facetCounts]]'s field buckets. One distributed
    * count per subquery (matchingDocs → map-side-combinable count —
    * one 8-byte row per task reaches the shuffle), unioned; the union
    * of K single-row aggregates is K independent tiny jobs, never a
    * cross-query shuffle. */
  def facetQueries(queries: Seq[(String, String, String)]): DataFrame = {
    require(queries.nonEmpty, "facetQueries needs at least one subquery")
    require(queries.map(_._1).distinct.length == queries.length,
      "duplicate facet name")
    queries.map { case (name, must, not) =>
      matchingDocs(must, not).agg(count(lit(1)).as("n_docs"))
        .select(lit(name).as("facet"), col("n_docs"))
    }.reduce(_ unionAll _)
  }

  /** Facet counts over a boolean query's match set — the Solr/Lucene
    * faceting shape the reference's search sinks expose: matching docs
    * grouped by a metadata column. Computed as match-set ⨝ metadata →
    * count, all distributed: the join shuffles only MATCHED docIds
    * (8 B rows) and the count is map-side combinable. */
  def facetCounts(mustQuery: String, notQuery: String,
                  meta: DataFrame, idCol: String, facetCol: String): DataFrame =
    // cast like the sibling facet methods: a string id column would
    // otherwise coerce BOTH join sides to double and silently mis-join
    // ids above 2^53
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id"), col(facetCol)),
        Seq("doc_id"))
      .groupBy(facetCol).agg(count(lit(1)).as("n_docs"))

  /** Pivot (multi-level) faceting (Solr facet.pivot): match-set
    * counts per COMBINATION of metadata columns — the flat relational
    * form of Solr's nested pivot tree (the nesting is a driver-side
    * rollup of these rows if a caller wants it). Same single
    * map-side-combinable aggregate as [[facetCounts]]; cardinality of
    * the output is the product of the pivot columns' cardinalities at
    * worst, never the match set. */
  def facetPivot(mustQuery: String, notQuery: String, meta: DataFrame,
                 idCol: String, pivotCols: Seq[String]): DataFrame = {
    require(pivotCols.nonEmpty, "facetPivot needs at least one column")
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id") +:
        pivotCols.map(col): _*), Seq("doc_id"))
      .groupBy(pivotCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Range faceting (Solr facet.range): fixed-width numeric bins over
    * the match set — each matched doc lands in the bin
    * `start + width·⌊(v − start)/width⌋`; bins with no matches are
    * absent (Solr's `mincount=1` shape). The bin arithmetic is plain
    * integer-in-double math (exact for any realistic column range),
    * so an oracle reproduces it verbatim. */
  def facetRange(mustQuery: String, notQuery: String, meta: DataFrame,
                 idCol: String, rangeCol: String,
                 start: Long, width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id"), col(rangeCol)),
        Seq("doc_id"))
      .withColumn("bin_start", (lit(start) +
        floor((col(rangeCol) - lit(start)) / lit(width.toDouble)) * lit(width))
        .cast("long"))
      .groupBy("bin_start").agg(count(lit(1)).as("n_docs"))
  }

  /** Sorted-by-field serving (the Solr `sort=<field> asc|desc` form):
    * top-k of a boolean query's match set ordered by a METADATA
    * column instead of relevance, doc_id-asc tie-break — match-set ⨝
    * metadata → `orderBy.limit(k)`, which Spark plans as a
    * distributed TakeOrdered (per-partition heaps, k rows to the
    * driver), never a global sort of the match set. */
  def searchSortBy(mustQuery: String, notQuery: String, meta: DataFrame,
                   idCol: String, sortCol: String, asc: Boolean = true,
                   k: Int = 10): DataFrame = {
    val s = col(sortCol)
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id"), s), Seq("doc_id"))
      .orderBy((if (asc) s.asc else s.desc), col("doc_id").asc)
      .limit(k)
  }

  /** Stats faceting (the Solr stats component / JSON `stats` facet):
    * count + min/max/sum of a numeric metadata column per facet
    * group, over a boolean query's match set. Same shape as
    * [[facetCounts]] — match-set ⨝ metadata → one hash aggregate, all
    * partial (map-side-combinable), so the shuffle carries one row
    * per (task, group), never the match set. The mean is left to the
    * caller (`sum_v / n_docs`) so every emitted stat is an exact
    * integer-safe aggregate. */
  def facetStats(mustQuery: String, notQuery: String, meta: DataFrame,
                 idCol: String, facetCol: String, statCol: String): DataFrame =
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id"),
        col(facetCol), col(statCol)), Seq("doc_id"))
      .groupBy(facetCol)
      .agg(count(lit(1)).as("n_docs"),
        min(col(statCol)).as("min_v"),
        max(col(statCol)).as("max_v"),
        sum(col(statCol)).as("sum_v"))

  /** Block-join parent query (Lucene ToParentBlockJoinQuery / Solr
    * `{!parent}` with a score mode): children matching the query roll
    * up to their parents, parent score = `max` | `avg` | `total` of
    * the matching children's scores (Lucene's ScoreMode), plus the
    * matching-child count. One scored-match-set ⨝ parent-key
    * projection, one map-side-combinable aggregate, one TakeOrdered —
    * the same scale shape as [[searchCollapse]], with the parent key
    * playing the group. `scoreKey` (rounding) applies to child scores
    * BEFORE the roll-up and to the parent score after, keeping both
    * cutoffs engine-stable; `max` needs no re-round (max of rounded
    * values is exact cross-engine). */
  def searchParentsBlockJoin(query: String, meta: DataFrame, idCol: String,
                             parentCol: String, scoreMode: String, k: Int = 10,
                             scoreKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column
                               = identity): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = scoreMode match {
      case "max"   => max(col("score"))
      case "avg"   => avg(col("score"))
      case "total" => sum(col("score"))
      case other => throw new IllegalArgumentException(
        s"unknown score mode '$other' (max | avg | total)")
    }
    scoredDocs(query)
      .withColumn("score", scoreKey(col("score")))
      .join(meta.select(col(idCol).cast("long").as("doc_id"),
        col(parentCol).as("parent_id")), Seq("doc_id"))
      .groupBy("parent_id")
      .agg(agg.as("score"), count(lit(1)).as("n_children"))
      .withColumn("score", scoreKey(col("score")))
      .orderBy(col("score").desc, col("parent_id").asc).limit(k)
      .select("parent_id", "score", "n_children")
  }

  /** Graph query (Solr `{!graph from=f to=t maxDepth=N}`): BFS from
    * the root query's match set over the edge relation "document d₂
    * follows d₁ when d₂[to] = d₁[from]", up to `maxDepth` hops.
    * Returns (doc_id, depth) with depth the FIRST-reach BFS depth
    * (0 for roots) — equal to the min-depth over all paths, which the
    * oracle reproduces with a bounded recursive closure.
    *
    * Scale shape: per hop, one frontier⨝meta projection to DISTINCT
    * follow keys (bounded by the key domain, broadcastable — the same
    * argument as [[searchJoin]]), one keyed join back, and one
    * anti-join against the reached set; ≤ maxDepth rounds, each
    * lineage-truncated with an eager localCheckpoint (see
    * [[graft.operators.Dedup.nearDupComponents]] for why persist
    * alone lets iterative plans grow 2^rounds). The metadata frame is
    * NOT checkpointed — its plan is round-constant. */
  def graphTraverse(rootMust: String, rootNot: String, meta: DataFrame,
                    idCol: String, fromCol: String, toCol: String,
                    maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    // the edge relation stays a lazy column-pruned scan: each hop
    // re-reads 3 columns, which scales (a localCheckpoint here would
    // materialize a corpus-sized copy — the atomicSet anti-pattern)
    val m = meta.select(col(idCol).cast("long").as("doc_id"),
      col(fromCol).as("f"), col(toCol).as("t"))
    var reached = matchingDocs(rootMust, rootNot)
      .withColumn("depth", lit(0L)).localCheckpoint(true)
    var frontier = reached
    var depth = 0L
    while (depth < maxDepth && !frontier.isEmpty) {
      val keys = frontier.join(m, Seq("doc_id"))
        .select(col("f").as("k")).distinct()
      val newDocs = m.join(keys, m("t") === keys("k"))
        .select(col("doc_id")).distinct()
        .join(reached.select("doc_id"), Seq("doc_id"), "left_anti")
        .withColumn("depth", lit(depth + 1L))
        .localCheckpoint(true)
      // each frontier is checkpointed, so `reached` stays a FLAT union
      // of ≤ maxDepth+1 checkpointed scans — linear, not the
      // 2^rounds self-reference growth the CC loop guards against; no
      // per-hop re-materialization of the whole reached set needed
      reached = reached.union(newDocs)
      frontier = newDocs
      depth += 1
    }
    reached
  }

  /** Stats-component percentiles (Solr `stats.percentiles`): EXACT
    * linear-interpolated quantiles of a metadata stat per facet value
    * over the boolean match set — Spark's exact `percentile` and
    * DuckDB's `quantile_cont` share the same R-7 definition
    * (rank = p·(n−1), linear interpolation), so the oracle reproduces
    * the values to rounding. The exact aggregator holds each group's
    * (value → count) map — bounded by the stat's per-group
    * cardinality, the tradeoff Solr itself makes for exact
    * percentiles (its default is t-digest approximation; swap in
    * percentile_approx for that regime at 100 TB). */
  def facetPercentiles(mustQuery: String, notQuery: String, meta: DataFrame,
                       idCol: String, facetCol: String, statCol: String,
                       pLo: Double = 0.5, pHi: Double = 0.95): DataFrame =
    matchingDocs(mustQuery, notQuery)
      .join(meta.select(col(idCol).cast("long").as("doc_id"),
        col(facetCol), col(statCol)), Seq("doc_id"))
      .groupBy(facetCol)
      .agg(count(lit(1)).as("n_docs"),
        round(percentile(col(statCol), lit(pLo)), 4).as("p_lo"),
        round(percentile(col(statCol), lit(pHi)), 4).as("p_hi"))

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

/** Growable primitive long buffer → sorted array (the searchWhere
  * allowed-set representation: 8 B/doc, binary-search membership). */
private[query] final class LongBuf {
  private var a = new Array[Long](16)
  private var n = 0
  def add(v: Long): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
    a(n) = v; n += 1
  }
  def nonEmpty: Boolean = n > 0
  def sortedArray: Array[Long] = {
    val out = java.util.Arrays.copyOf(a, n)
    java.util.Arrays.sort(out)
    out
  }
}

/** Query shapes for [[IndexReader.searchManyMixed]] — the Solr/Lucene
  * query-type family the reference's sinks serve. */
object IndexReader {

  /** Driver-side read of the one-row corpus_stats table via
    * parquet-hadoop directly — opening a reader costs a Spark JOB
    * (scheduler round-trip + task launch) per IndexReader instance
    * just to fetch six scalars. Falls back to the Spark read (None)
    * when the table is not the single-file single-row shape this
    * fast path expects. */
  private[query] def readStatsDirect(dir: String): Option[CorpusStats] = try {
    val d = new java.io.File(IndexBuilder.corpusStatsDir(dir))
    val fs = Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet"))
    if (fs.length != 1) return None
    val reader = org.apache.parquet.hadoop.ParquetReader.builder(
        new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(fs.head.getPath))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .build()
    try {
      val g = reader.read()
      if (g == null || reader.read() != null) return None // not exactly one row
      Some(CorpusStats(
        g.getLong("n_docs", 0), g.getDouble("avgdl", 0), g.getLong("n_terms", 0),
        g.getInteger("index_version", 0), g.getInteger("tokenizer_version", 0),
        g.getString("analyzer", 0)))
    } finally reader.close()
  } catch { case scala.util.control.NonFatal(_) => None }
}

sealed trait QuerySpec extends Serializable
object QuerySpec {
  /** Free-text disjunctive BM25 (the [[IndexReader.search]] shape). */
  case class Free(text: String) extends QuerySpec
  /** Every must-term required, any not-term excluding. */
  case class Boolean(must: String, not: String = "") extends QuerySpec
  /** Ordered-adjacency phrase (Lucene PhraseQuery scoring). */
  case class Phrase(text: String) extends QuerySpec
  /** At least `m` of the query's terms required (Solr/Lucene `mm` —
    * the [[IndexReader.searchMinShouldMatch]] shape). */
  case class MinMatch(text: String, m: Int) extends QuerySpec
  /** Trailing-wildcard prefix, dictionary-expanded (the
    * [[IndexReader.searchPrefix]] shape). */
  case class Prefix(prefix: String, maxExpansions: Int = 1024) extends QuerySpec
  /** Levenshtein fuzzy term, dictionary-expanded (the
    * [[IndexReader.searchFuzzy]] shape). */
  case class Fuzzy(term: String, maxEdits: Int = 2,
                   maxExpansions: Int = 1024) extends QuerySpec
}
