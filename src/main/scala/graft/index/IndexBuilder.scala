package graft.index

import graft.analysis.{Analyzer, Tokenizer}
import graft.model._
import graft.store.Manifest
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import java.nio.file.{Files, Paths}


case class BuildConfig(outDir: String,
                       nSegments: Int = 0, // 0 → auto: max(64, nDocs/25k)
                       waveSize: Int = 0,  // 0 → auto: min(256, nSegments)
                       sortPartitions: Int = 0, // 0 → defaultParallelism
                       resume: Boolean = true,
                       failAfterWaves: Int = -1, // test hook: simulated kill
                       poisonSegments: Set[Int] = Set.empty, // test hook: deterministic task failure
                       analyzer: Analyzer = Analyzer.V1,
                       storePositions: Boolean = true, // false → no per-posting position lists (phrase queries unavailable; ~smaller index + cheaper encode — the Lucene IndexOptions.DOCS_AND_FREQS analog for analytics-only fields)
                       maxOpenTerms: Int = 1 << 19,        // encoder vocab cap
                       maxBufferedPostings: Long = 1L << 22, // encoder memory cap (~64 MB arrays)
                       autoCompactFraction: Double = 0.5) { // fold staging overlays back into the base once they cover > this fraction of segments (<= 0 disables)
  /** Segment count targets CACHE-RESIDENT encoder term maps (~25k
    * docs/segment → sub-MB per-task vocab): profiling showed the
    * encode stage goes DRAM-latency-bound once the per-segment term
    * map outgrows L2, costing ~3x at 32 threads. */
  def segmentsFor(nDocs: Long): Int =
    if (nSegments > 0) nSegments
    else math.max(64L, (nDocs + 24999) / 25000).min(1 << 20).toInt
  def waveFor(segments: Int): Int =
    if (waveSize > 0) waveSize else math.min(256, math.max(1, segments))
}

case class BuildReport(nDocs: Long, avgdl: Double, nTerms: Long,
                       segmentsBuilt: Int, segmentsSkipped: Int, wallMs: Long,
                       segmentsQuarantined: Int = 0)

/** Thrown by the fault-injection hook (FIXTURES.md §4 kill-after-N). */
class SimulatedKill(wave: Int) extends RuntimeException(s"simulated kill after wave $wave")

/**
 * Two-phase, wave-checkpointed inverted-index build (SURVEY.md §2.7,
 * §7). Replaces the reference's scan→transform→Solr pipeline
 * (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/processors/SendToSolrProcessor.java:102-142`)
 * plus the Lucene indexing it delegates to.
 *
 * == Phase A (global stats + stable docIDs) ==
 * Global sort by (conv_id, turn_idx) via `repartitionByRange` +
 * `sortWithinPartitions`, then two-pass dense docID assignment
 * (per-partition counts → broadcast offsets → mapPartitions). docIDs
 * depend only on the data's total order, never on partitioning — the
 * stability invariant tested at 2 vs 32 partitions. Docs land in
 * SEGMENTS = contiguous docId ranges (segment = docId / segSize), the
 * unit of checkpointing. Phase A commits: a staging copy of the corpus
 * (one doc_id-sorted, segment-monotone file per sort partition, so
 * parquet min/max stats prune segment filters for Phase B and resume;
 * doc_stats is this same table column-pruned), and a phaseA manifest
 * carrying an order-insensitive corpus content hash (xor of
 * xxhash64(conv_id, turn_idx, text)) for change detection — the
 * reference's `jj_scanner_doc_hash` analog
 * (`ScannerImpl.java:380-417`). The dictionary and corpus_stats are
 * derived AFTER the waves from the posting-block footers
 * (sum(n_docs), sum(block_cf) per term) — a shuffle over block rows
 * (≈ postings/128), not a third tokenize pass over the corpus.
 *
 * == Phase B (postings, per-segment, in waves) ==
 * For each wave of segments not yet COMPLETE: read staging (pushed
 * segment filter + file stats select only the wave's segments) →
 * range-repartition DOC
 * rows by segment (exactly one segment per partition; equal keys never
 * split) → local doc_id sort → streaming [[encodeDocs]]: tokenize each
 * doc and APPEND to per-term posting buffers — docIds arrive ascending
 * per segment, so posting lists are sorted by construction and the
 * exploded token stream is never shuffled OR sorted → write
 * partitioned by segment → atomic per-segment publish + manifest row.
 *
 * == Why this scales ==
 * There is NO global repartition-by-term shuffle and no token-level
 * sort: the segment IS the docId-range salt of SURVEY.md §2.7 applied
 * uniformly, so a head term with df ≈ N is split across every segment
 * with at most segSize postings per segment — skew is structurally
 * bounded, and per-term segment postings concatenate in segment order
 * into globally docId-sorted lists. Everything that crosses the wire
 * is doc rows (compact) or encoded blocks (compressed); per-task
 * memory is O(per-segment vocabulary), tuned by nSegments. The only
 * corpus-wide shuffles are the Phase-A range sort and the
 * dictionary's block-footer groupBy. Wave size bounds the working
 * set; killed builds resume by manifest anti-planning, and replays
 * are idempotent (overwrite-by-partition).
 */
object IndexBuilder {

  def stagingDir(outDir: String) = s"$outDir/_staging/docs"
  /** Per-segment overlay replacing the base staging rows of segments
    * touched by an incremental update ([[Incremental]]). */
  def overlayDir(outDir: String) = s"$outDir/_staging/seg"
  def manifestDir(outDir: String) = s"$outDir/_manifest"
  def postingsDir(outDir: String) = s"$outDir/postings"
  def dictionaryDir(outDir: String) = s"$outDir/dictionary"
  def corpusStatsDir(outDir: String) = s"$outDir/corpus_stats"

  /** Posting-table schema, for inference-free reads (an empty segment
    * dir must read as 0 rows, not an AnalysisException). */
  val PostingSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[PostingBlockRow].schema

  /** Staging-table schema: DocTurn + the per-doc source hash
    * (xxhash64(role, text, tool)) incremental change detection diffs
    * against — stored so the diff never has to re-read the text. */
  val StagingSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.Encoders.product[DocTurn].schema
      .add("src_hash", org.apache.spark.sql.types.LongType)

  /** Segments whose staging rows live in the overlay (directory list —
    * bounded by segments touched since the last full build). */
  def overlaidSegments(outDir: String): Set[Int] = {
    val d = Paths.get(overlayDir(outDir))
    if (!Files.exists(d)) return Set.empty
    val s = Files.list(d)
    try {
      val it = s.iterator()
      val out = Set.newBuilder[Int]
      while (it.hasNext) {
        val name = it.next().getFileName.toString
        if (name.startsWith("segment=")) out += name.stripPrefix("segment=").toInt
      }
      out.result()
    } finally s.close() // serving-path hot loop: leaked dir fds accumulate between GCs
  }

  /**
   * The staging corpus VIEW: base rows for untouched segments, overlay
   * rows for segments rewritten by incremental updates. This (not the
   * base dir) is what Phase B, doc_stats readers, and metadata-filtered
   * search must read. Both sides carry parquet min/max segment stats,
   * so wave filters still prune files. Overlays accumulate one dir per
   * touched segment; a periodic full rebuild compacts them away.
   */
  def readStaging(spark: SparkSession, outDir: String): DataFrame = {
    if (!Files.exists(Paths.get(stagingDir(outDir))))
      Incremental.recoverCompact(outDir) // crash inside compact's rename window
    val base = spark.read.schema(StagingSchema).parquet(stagingDir(outDir))
    val over = overlaidSegments(outDir)
    if (over.isEmpty) base
    else {
      val overlay = spark.read.schema(StagingSchema).parquet(overlayDir(outDir))
      base.filter(!col("segment").isInCollection(over)).unionByName(overlay)
    }
  }

  /** doc_stats view (doc_id, conv_id, turn_idx, dl, segment + fields) —
    * the staging view read with column pruning; files are doc_id-sorted
    * and segment-clustered so lookups prune by row-group stats. */
  def readDocs(spark: SparkSession, outDir: String): DataFrame =
    readStaging(spark, outDir)

  /** Order-insensitive xor accumulator (for the ride-along corpus
    * hash; updates ride a result stage → applied once per successful
    * task, like the dl accumulator). */
  private class XorAcc extends org.apache.spark.util.AccumulatorV2[Long, Long] {
    private var v = 0L
    override def isZero: Boolean = v == 0L
    override def copy(): XorAcc = { val c = new XorAcc; c.v = v; c }
    override def reset(): Unit = v = 0L
    override def add(x: Long): Unit = v ^= x
    override def merge(o: org.apache.spark.util.AccumulatorV2[Long, Long]): Unit = v ^= o.value
    override def value: Long = v
  }

  /** Per-segment Long-counter accumulator (merge = pointwise sum). */
  private class SegCounter extends org.apache.spark.util.AccumulatorV2[(Int, Long), Map[Int, Long]] {
    private val m = scala.collection.mutable.HashMap.empty[Int, Long]
    override def isZero: Boolean = m.isEmpty
    override def copy(): SegCounter = {
      val c = new SegCounter; m.foreach { case (k, v) => c.m.update(k, v) }; c
    }
    override def reset(): Unit = m.clear()
    override def add(v: (Int, Long)): Unit =
      m.update(v._1, m.getOrElse(v._1, 0L) + v._2)
    override def merge(other: org.apache.spark.util.AccumulatorV2[(Int, Long), Map[Int, Long]]): Unit =
      other.value.foreach { case (k, v) => m.update(k, m.getOrElse(k, 0L) + v) }
    override def value: Map[Int, Long] = m.toMap
  }

  def build(spark: SparkSession, turns: Dataset[Turn], cfg: BuildConfig): BuildReport = {
    // Small-corpus builds: the default 128 MB split size collapses the
    // staging read into a handful of input tasks, capping every
    // downstream map stage at that width regardless of cluster size.
    // Splits are sized so the read parallelism tracks the cluster; at
    // TB scale the defaults already give plentiful splits and these
    // bounds are no-ops in practice.
    //
    // The overrides live on a DEDICATED session (newSession shares the
    // SparkContext but has isolated SQLConf), so concurrent queries on
    // the caller's session never observe them and two concurrent builds
    // cannot race on a save/restore of shared conf. The caller's input
    // Dataset is re-bound to the build session through a global temp
    // view — logical plans are session-independent.
    val bs = spark.newSession()
    Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone").foreach { k =>
      spark.conf.getOption(k).foreach(bs.conf.set(k, _))
    }
    bs.conf.set("spark.sql.files.maxPartitionBytes", (16L << 20).toString)
    bs.conf.set("spark.sql.files.openCostInBytes", (1L << 20).toString)
    val vn = s"graft_build_src_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    turns.createOrReplaceGlobalTempView(vn)
    try {
      import bs.implicits._
      buildInner(bs, bs.table(s"global_temp.$vn").as[Turn], cfg)
    } finally spark.catalog.dropGlobalTempView(vn)
  }

  private def buildInner(spark: SparkSession, turns: Dataset[Turn], cfg: BuildConfig): BuildReport = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val mdir = manifestDir(cfg.outDir)
    // a staging base lost to a crash inside compact's rename window
    // must be restored BEFORE the compatibility check — without it the
    // missing base would route a perfectly resumable index into a full
    // rebuild
    Incremental.recoverCompact(cfg.outDir)

    val phaseAPath = Manifest.phaseAPath(mdir)
    val prior = Manifest.read(phaseAPath)

    // ---- change detection: order-insensitive corpus hash over the
    // full identity+content tuple. The upfront scan (a full corpus
    // read) only runs when there IS a prior manifest to compare
    // against; a fresh build computes the same hash as an accumulator
    // riding Phase A's id-assignment pass — one less corpus read. ----
    val (srcCount, srcHash) =
      if (prior.isEmpty) (-1L, null: String)
      else {
        val hashRow = turns.agg(
          coalesce(sum(lit(1L)), lit(0L)).as("n"),
          coalesce(expr("bit_xor(xxhash64(conv_id, turn_idx, role, text, tool))"), lit(0L)).as("h")
        ).head()
        (hashRow.getLong(0), hashRow.getLong(1).toString)
      }
    // analyzer/index_version checks REQUIRE the keys (not forall): a
    // pre-v2 on-disk index must trigger a clean full rebuild, never a
    // resume into mixed-format tables
    val compatible = cfg.resume && prior.exists(m =>
      m.get("status").contains(Manifest.Complete) &&
        m.get("analyzer").contains(cfg.analyzer.id) &&
        m.get("store_positions").contains(cfg.storePositions.toString) &&
        m.get("index_version").contains(IndexFormat.Version.toString) &&
        Files.exists(Paths.get(stagingDir(cfg.outDir))))
    val phaseAValid = compatible && prior.exists(_.get("content_hash").contains(srcHash))

    val (nDocs, avgdl, segSize, nSegEff) =
      if (phaseAValid) {
        val m = prior.get
        (m("n_docs").toLong, m("avgdl").toDouble,
          m("seg_size").toLong, m("n_segments_effective").toInt)
      } else if (compatible && prior.exists(_.get("n_docs").exists(_ != "0"))) {
        // source changed but the on-disk index is the same format over
        // an older corpus version → DELTA: diff per-doc hashes, rewrite
        // only touched segments' staging, mark them stale. Phase B then
        // rebuilds exactly those segments. (An EMPTY prior index has no
        // docIDs to preserve and a degenerate frozen segSize — route to
        // a fresh full build instead.)
        Incremental.delta(spark, turns, cfg, srcHash)
      } else {
        // fresh build (or incompatible format) → reset everything
        Manifest.deleteRecursively(Paths.get(cfg.outDir))
        phaseA(spark, turns, cfg, srcHash, srcCount)
      }

    // ---- Phase B: postings in waves, resume-aware. A failing wave is
    // isolated segment by segment; a deterministically-failing segment
    // accumulates attempts (across reruns too, via the ledger) and is
    // QUARANTINED at MaxAttempts — the build completes without it, the
    // reference's retry→DEAD state machine
    // (`ScannerImpl.java:614-713`, HeuristicFatalFTITest). ----
    val states = Manifest.segmentStates(mdir)
    val complete = states.collect {
      case (s, m) if m.get("status").contains(Manifest.Complete) => s
    }.toSet
    val allSegments = (0 until nSegEff).toVector
    val pending = allSegments.filterNot(s => states.get(s).exists(m =>
      m.get("status").contains(Manifest.Complete) ||
        m.get("status").contains(Manifest.Quarantined)))
    val failCounts = scala.collection.mutable.HashMap.empty[Int, Int]
    states.foreach { case (s, m) =>
      if (m.get("status").contains(Manifest.Failed))
        failCounts(s) = m.get("attempts").map(_.toInt).getOrElse(0)
    }
    val attemptOf: Int => Int = s => failCounts.getOrElse(s, 0) + 1
    var wavesDone = 0
    pending.grouped(cfg.waveFor(nSegEff)).foreach { wave =>
      if (cfg.failAfterWaves >= 0 && wavesDone >= cfg.failAfterWaves)
        throw new SimulatedKill(wavesDone)
      try buildWave(spark, cfg, wave, attemptOf)
      catch {
        case k: SimulatedKill => throw k
        case e0: Exception =>
          // Isolate segment by segment. FAILED rows are appended
          // IMMEDIATELY (crash-safe attempt accounting, and a later
          // retry-success's COMPLETE row correctly supersedes them in
          // ledger order). The QUARANTINE decision is deferred to the
          // end of the wave and requires SIBLING EVIDENCE: only when
          // some segment of the same wave succeeded in this same
          // environment is repeated failure attributable to the DATA.
          // An all-failing multi-segment wave aborts instead (lost
          // executors / full disk look exactly like this) — after a
          // few all-failing segments we stop probing and throw rather
          // than burn MaxAttempts × waveSize failing jobs.
          var anySucceeded = false
          var lastErr: Exception = e0
          val completed = scala.collection.mutable.Set.empty[Int]
          val it = wave.iterator
          // environment probe counter: segments that ATTEMPTED this run
          // and failed outright. Budget-exhausted segments (poisons from
          // prior runs) must not count — three leading poisons would
          // otherwise bail the loop forever and starve their healthy
          // siblings of the attempt that proves sibling evidence.
          var failedProbes = 0
          while (it.hasNext && (anySucceeded || failedProbes < 3 || wave.size == 1)) {
            val seg = it.next()
            var done = false
            var attempted = false
            while (!done && failCounts.getOrElse(seg, 0) < MaxAttempts) {
              attempted = true
              try {
                buildWave(spark, cfg, Seq(seg), attemptOf)
                done = true; anySucceeded = true; completed += seg
              } catch {
                case k: SimulatedKill => throw k
                case e: Exception =>
                  lastErr = e
                  val n = failCounts.getOrElse(seg, 0) + 1
                  failCounts(seg) = n
                  Manifest.appendLedger(mdir, Seq(Map(
                    "segment" -> seg.toString, "status" -> Manifest.Failed,
                    "attempts" -> n.toString,
                    "error" -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))))
              }
            }
            if (attempted && !done) failedProbes += 1
          }
          // env-abort only when this run actually TESTED the
          // environment and everything it tested failed. A wave of
          // solely budget-exhausted segments (nothing attemptable)
          // falls through: their ≥MaxAttempts recorded failures are
          // the quarantine evidence — the reference's DEAD state has
          // the same env-vs-poison residual risk.
          if (!anySucceeded && failedProbes > 0 && wave.size > 1) throw lastErr
          // exhausted-but-unfinished segments with sibling evidence →
          // quarantine (appended last, supersedes their FAILED rows).
          // This also catches segments that exhausted their budget in
          // PRIOR runs once any sibling finally succeeds.
          val exhausted = wave.filter(s => !completed.contains(s) &&
            failCounts.getOrElse(s, 0) >= MaxAttempts)
          if (exhausted.nonEmpty)
            Manifest.appendLedger(mdir, exhausted.map(s => Map(
              "segment" -> s.toString, "status" -> Manifest.Quarantined,
              "attempts" -> failCounts(s).toString)))
      }
      wavesDone += 1
    }

    // ---- finalize: dictionary + corpus_stats from the posting blocks
    // (no extra tokenize pass; resumes for free — skipped iff nothing
    // was rebuilt and a COMPLETE finalize manifest exists) ----
    val finPath = Manifest.finalizePath(mdir)
    val nTerms =
      if (pending.isEmpty && Manifest.isComplete(finPath) &&
          Files.exists(Paths.get(corpusStatsDir(cfg.outDir))))
        Manifest.read(finPath).get("n_terms").toLong
      else finalizeStats(spark, cfg, nDocs, avgdl, nSegEff)

    val finalStates = Manifest.segmentStates(mdir)
    val built = pending.count(s => finalStates.get(s)
      .exists(_.get("status").contains(Manifest.Complete)))
    // quarantined THIS RUN (symmetric with `built`); the full set is
    // Manifest.quarantinedSegments(manifestDir)
    val quarantined = pending.count(s => finalStates.get(s)
      .exists(_.get("status").contains(Manifest.Quarantined)))

    // auto-compaction: a long-lived delta deployment (ContinuousIndexer)
    // otherwise accumulates one overlay dir per segment ever touched,
    // and readStaging's NOT-IN mask grows with them until an operator
    // intervenes. Content-preserving (the staging view is identical),
    // runs AFTER the index is fully published, so queries are unchanged.
    if (cfg.autoCompactFraction > 0) {
      val over = overlaidSegments(cfg.outDir)
      if (over.nonEmpty && nSegEff > 0 &&
          over.size.toDouble > cfg.autoCompactFraction * nSegEff)
        Incremental.compact(spark, cfg.outDir)
    }

    BuildReport(nDocs, avgdl, nTerms, built, complete.size,
      System.currentTimeMillis() - t0, quarantined)
  }

  /** Failed-segment retry budget before quarantine (the reference's
    * `errorCounter` threshold, `ScannerImpl.java:614-713`). */
  val MaxAttempts = 3

  /**
   * The shared 2-pass dense-rank mechanism: global (conv_id, turn_idx)
   * range sort, then per-partition counts → prefix offsets, so a later
   * mapPartitions can assign id = offset(pid) + local index. Range
   * partitions are globally ordered and keys unique, so the id equals
   * the row's rank in the total order at ANY parallelism (the 2-vs-13
   * partition stability spec). Returns (sorted dataset — shuffle-
   * reused across passes, see below — offsets by partition id, total
   * rows).
   *
   * NOT persisted — SHUFFLE REUSE is the materialization. The sorted
   * data is surfaced as ONE `RDD[Turn]` (`Dataset.rdd`, taken once):
   * every pass — the counting action here and any later
   * offset-indexing mapPartitions — is a result-stage re-run over
   * that same RDD, so the exchange's map output is fetched from disk,
   * never recomputed, and partition ids and the in-partition order
   * (total — keys are unique) are identical across passes; each extra
   * pass re-runs only the reduce-side in-partition sort. The RDD
   * identity is LOAD-BEARING: running the passes as separate
   * DataFrame actions instead plans a fresh exchange per action, and
   * `RangePartitioner` re-SAMPLES its boundaries with a seed derived
   * from the new RDD's id — pass 2's partition boundaries then
   * disagree with pass 1's counts and the assigned ids are garbage
   * (observed as non-monotone docIds crashing the encoder).
   *
   * This replaced a DISK_ONLY persist deliberately: Dataset caching
   * routes corpus-sized text through the in-memory COLUMNAR batch
   * builder even at DISK_ONLY (round 5 had already demoted it from
   * MEMORY_AND_DISK after the builder's per-task stat-gathering over
   * ~KB strings OOM-killed the 52.8 M-turn build), and profiling this
   * round put the cache build at 5.3 s cold / 1.1 s warm on the 5.28
   * M-turn bench corpus PLUS a corpus-sized copy in the block-manager
   * disk store — against ~2 s for the re-sort the reuse pass pays.
   * Shuffle files live on executor-local disk at any corpus:heap
   * ratio; no storage-memory interaction at all.
   *
   * Offset-indexing passes must still run in their OWN job (not
   * lazily inside a union): a union branch sees UNION-GLOBAL partition
   * ids and would misindex the offsets.
   */
  /** Fixed column order of the rows [[sortAndOffsets]] returns:
    * conv_id(0), turn_idx(1), role(2), text(3), tool(4) — `ts` is
    * deliberately dropped before the exchange (nothing downstream
    * reads it; guide §2.3, shuffle fewer bytes). */
  private[index] val SortedOrdinals: Seq[String] =
    Seq("conv_id", "turn_idx", "role", "text", "tool")

  private[index] def sortAndOffsets(spark: SparkSession, turns: Dataset[Turn],
                                    p: Int): (org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow], Array[Long], Long) = {
    val sorted = turns.toDF().select(SortedOrdinals.map(col): _*)
      .repartitionByRange(p, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
      // ONE RDD of RAW InternalRows: pins the sampled range boundaries
      // across passes AND lets the count pass run without decoding a
      // Turn object per row (the offset pass reads UTF8String views)
      .queryExecution.toRdd
    val counts = sorted.mapPartitions { it =>
      Iterator.single((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](counts.length.max(1))
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    (sorted, offsets, acc)
  }

  /** Phase A. Returns (nDocs, avgdl, segSize, effective segment count). */
  private def phaseA(spark: SparkSession, turns: Dataset[Turn], cfg: BuildConfig,
                     srcHash: String, srcCount: Long): (Long, Double, Long, Int) = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val p = if (cfg.sortPartitions > 0) cfg.sortPartitions
            else spark.sparkContext.defaultParallelism

    // pass 1: sort + per-partition counts → dense offsets (docID
    // stability — SURVEY.md §7.5)
    val ((sorted, offsets, nDocs), tCounts) = timedMs(sortAndOffsets(spark, turns, p))
    dbg(s"phaseA sort+count ${tCounts}ms")
    require(srcCount < 0 || nDocs == srcCount,
      s"sorted count $nDocs != source count $srcCount")
    val nSegTarget = cfg.segmentsFor(nDocs)
    val segSize = math.max(1L, (nDocs + nSegTarget - 1) / nSegTarget)
    val nSegEff = if (nDocs == 0) 0 else (((nDocs - 1) / segSize) + 1).toInt
    val offB = spark.sparkContext.broadcast(offsets)

    // pass 2: assign ids + doc length; dl total folds into the same
    // job via an accumulator (updates are applied once per successful
    // result-stage task), so avgdl costs no extra pass
    val az = cfg.analyzer
    val dlAcc = spark.sparkContext.longAccumulator("graft.dlSum")
    val hashAcc = new XorAcc
    spark.sparkContext.register(hashAcc, "graft.srcHash")
    val needHash = srcHash == null // fresh build: hash rides this pass
    val v1 = az.id == Analyzer.V1.id
    // staging rows are built as InternalRows straight from the sorted
    // shuffle's UTF8String views — no Turn decode, no String re-encode
    // (each row is consumed by the parquet writer before the next is
    // pulled, so holding views is safe); src_hash and the fresh-build
    // content hash fold into the same pass via the raw-field mirrors
    // (RowHashSpec pins their equality to the SQL xxhash64 forms)
    val stagingRows = sorted.mapPartitions { it =>
      val off = offB.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { r =>
        val id = off + i; i += 1
        val conv = r.getUTF8String(0)
        val tix = r.getInt(1)
        val role = if (r.isNullAt(2)) null else r.getUTF8String(2)
        val text = if (r.isNullAt(3)) null else r.getUTF8String(3)
        val tool = if (r.isNullAt(4)) null else r.getUTF8String(4)
        val dl =
          if (v1) Tokenizer.docLengthU8(text)
          else az.docLength(if (text == null) null else text.toString)
        dlAcc.add(dl)
        if (needHash) hashAcc.add(RowHash.turnHashRaw(conv, tix, role, text, tool))
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](id, (id / segSize).toInt, conv, tix, role, text, tool, dl,
            RowHash.contentHashRaw(role, text, tool)))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }

    // staging: corpus + ids (atomic publish). One file per sort
    // partition — NOT partitionBy(segment): segment is monotone
    // within every sorted file, so parquet file/row-group min/max
    // stats prune segment filters exactly as well as directory
    // partitioning would, without the dynamic-partition write (which
    // costs a per-task sort + one file handle per segment and a
    // driver-side commit that grows with nSegments — ruinous once
    // nSegments is sized for cache-resident encoder maps). doc_stats
    // is this same table read with column pruning.
    val stagingTmp = Paths.get(cfg.outDir, "_tmp_staging_docs")
    Manifest.deleteRecursively(stagingTmp)
    val (_, tStag) = timedMs {
      org.apache.spark.sql.graft.ColumnBridge
        .internalDF(spark, stagingRows, StagingSchema)
        .write.mode("overwrite").parquet(stagingTmp.toString)
    }
    dbg(s"phaseA staging-write ${tStag}ms")
    Manifest.publishDir(stagingTmp, Paths.get(stagingDir(cfg.outDir)))

    // avgdl — defined as sum(dl)/n_docs in double (the dictionary is
    // derived AFTER phase B from the encoded posting blocks, so the
    // corpus is tokenized exactly twice: dl here, postings in B)
    val avgdl = if (nDocs == 0) 1.0 else dlAcc.value.toDouble / nDocs

    Manifest.writeAtomic(Manifest.phaseAPath(manifestDir(cfg.outDir)), Map(
      "status" -> Manifest.Complete,
      "n_docs" -> nDocs.toString,
      "avgdl" -> avgdl.toString,
      "seg_size" -> segSize.toString,
      "n_segments_effective" -> nSegEff.toString,
      "content_hash" -> (if (needHash) hashAcc.value.toString else srcHash),
      "analyzer" -> cfg.analyzer.id,
      "store_positions" -> cfg.storePositions.toString,
      "index_version" -> IndexFormat.Version.toString,
      "tokenizer_version" -> Tokenizer.Version.toString,
      "wall_ms" -> (System.currentTimeMillis() - t0).toString))
    (nDocs, avgdl, segSize, nSegEff)
  }

  /** Post-wave finalize: dictionary (term → global df, cf) aggregated
    * from the posting-block footers — sum(n_docs) and sum(block_cf)
    * per term, a shuffle over BLOCK ROWS (≈ postings/128), never over
    * the token stream — then corpus_stats, then the finalize manifest
    * as the commit point. Returns n_terms. */
  private def finalizeStats(spark: SparkSession, cfg: BuildConfig,
                            nDocs: Long, avgdl: Double, nSegEff: Int): Long = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val p = if (cfg.sortPartitions > 0) cfg.sortPartitions
            else spark.sparkContext.defaultParallelism
    // explicit schema: an all-empty-text corpus leaves only empty
    // segment=N dirs under postingsDir, and schema INFERENCE over them
    // throws AnalysisException — with the schema given, the read just
    // yields 0 rows and the dictionary comes out empty (EdgeCasesSpec)
    val hasPostings = nSegEff > 0 && Files.exists(Paths.get(postingsDir(cfg.outDir)))

    // n_terms rides the dictionary write as an Observation (one row per
    // written row) — the separate count job it replaces re-read the
    // freshly written dictionary for a number the write already knew
    val obs = org.apache.spark.sql.Observation()
    writeAtomic(spark, cfg.outDir, "dictionary") { tmp =>
      val dict =
        if (hasPostings)
          spark.read.schema(PostingSchema).parquet(postingsDir(cfg.outDir))
            .groupBy("term")
            .agg(sum(col("n_docs").cast("long")).as("df"), sum("block_cf").as("cf"))
        else Seq.empty[DictEntry].toDS().toDF()
      dict.repartitionByRange(math.max(1, p / 4), col("term"))
        .sortWithinPartitions("term")
        .observe(obs, count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(tmp)
    }
    val nTerms = obs.get("n").asInstanceOf[Long]

    writeAtomic(spark, cfg.outDir, "corpus_stats") { tmp =>
      Seq(CorpusStats(nDocs, avgdl, nTerms, IndexFormat.Version, Tokenizer.Version,
        cfg.analyzer.id)).toDS()
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }
    Manifest.writeAtomic(Manifest.finalizePath(manifestDir(cfg.outDir)), Map(
      "status" -> Manifest.Complete,
      "n_terms" -> nTerms.toString,
      "wall_ms" -> (System.currentTimeMillis() - t0).toString))
    nTerms
  }

  private def dbg(msg: => String): Unit =
    if (sys.env.contains("GRAFT_BUILD_TIMING")) System.err.println(s"[build] $msg")

  private def timedMs[T](f: => T): (T, Long) = {
    val t = System.currentTimeMillis(); val r = f
    (r, System.currentTimeMillis() - t)
  }

  /** Build + atomically publish one wave of segments. `attemptOf` maps
    * a segment to its attempt ordinal (prior recorded failures + 1),
    * recorded in the ledger row. */
  private def buildWave(spark: SparkSession, cfg: BuildConfig,
                        wave: Seq[Int], attemptOf: Int => Int): Unit = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val staging = readStaging(spark, cfg.outDir)
      .filter(col("segment").isInCollection(wave)) // file/row-group pruning

    // per-segment lineage counters ride the encode job as accumulators
    // (one update per successful result-stage task) — no separate
    // metrics aggregation jobs
    val az = cfg.analyzer
    val poison = cfg.poisonSegments
    val turnsAcc = new SegCounter; val tokensAcc = new SegCounter
    val blocksAcc = new SegCounter
    spark.sparkContext.register(turnsAcc, "graft.turns")
    spark.sparkContext.register(tokensAcc, "graft.tokens")
    spark.sparkContext.register(blocksAcc, "graft.blocks")

    // Shuffle DOC rows, never token rows: the segment repartition
    // moves the compact text corpus (one row per turn) and a LOCAL
    // doc_id sort restores each segment's document order — both ~100x
    // smaller than exchanging/sorting the exploded token stream, which
    // profiling showed costs microseconds per posting in UnsafeRow
    // serialization + external-sort memory stalls. Tokenization and
    // posting-list construction then happen streaming inside the
    // encoder: docIds arrive ascending per segment, so each term's
    // postings are built by APPEND (no sort over tokens at all).
    //
    // RANGE partition, not hash: hashing `wave.size` distinct segment
    // ids into `wave.size` buckets leaves ~1/e of the buckets empty
    // and piles 3-4 segments onto the stragglers (balls-in-bins), so
    // past ~N/4 cores the stage tail IS the stage. Range bounds place
    // exactly one segment per partition; equal keys never split, which
    // is the encoder's only requirement.
    val encoded: Dataset[PostingBlockRow] = staging
      .select($"doc_id", $"segment", $"text", $"dl")
      .repartitionByRange(wave.size, col("segment"))
      .sortWithinPartitions("segment", "doc_id")
      .as[(Long, Int, String, Int)]
      .mapPartitions { docs =>
        val counted = docs.map { d =>
          if (poison.contains(d._2))
            throw new RuntimeException(s"poisoned segment ${d._2} (test hook)")
          turnsAcc.add(d._2 -> 1L); tokensAcc.add(d._2 -> d._4.toLong); d
        }
        encodeDocs(counted, az, cfg.maxOpenTerms, cfg.maxBufferedPostings,
          cfg.storePositions).map { b =>
          blocksAcc.add(b.segment -> 1L); b
        }
      }
      // local BLOCK-row sort (postings/128 rows — cheap) so each
      // parquet file is term-clustered: query-time term filters prune
      // whole row groups via min/max stats instead of scanning the
      // segment
      .sortWithinPartitions("segment", "term", "block_id")

    val waveTmp = Paths.get(cfg.outDir, "_tmp_wave")
    Manifest.deleteRecursively(waveTmp)
    val (_, tEnc) = timedMs {
      encoded.write.partitionBy("segment").mode("overwrite").parquet(waveTmp.toString)
    }
    dbg(s"wave tokenize+shuffle+encode+write ${tEnc}ms")
    val ingest = turnsAcc.value; val tokens = tokensAcc.value
    val written = blocksAcc.value

    // atomic per-segment data publish, then ONE ledger append as the
    // wave's commit point: a kill mid-publish leaves no ledger rows, so
    // the whole wave re-plans and the idempotent overwrites make the
    // replay safe. The ledger is a table (one JSONL file per wave) —
    // resume planning reads waves-count files, never a directory of
    // 2^20 per-segment manifests.
    val wallMs = System.currentTimeMillis() - t0
    wave.foreach { seg =>
      val src = waveTmp.resolve(s"segment=$seg")
      val dest = Paths.get(postingsDir(cfg.outDir), s"segment=$seg")
      if (Files.exists(src)) Manifest.publishDir(src, dest)
      else {
        // segment with no postings. A STALE re-plan can legitimately
        // rebuild a previously-populated segment down to zero postings
        // (a delta deleted or blanked every doc in it) — the old
        // parquet files must not survive to serve ghost postings.
        Manifest.deleteRecursively(dest)
        Files.createDirectories(dest)
      }
    }
    Manifest.appendLedger(manifestDir(cfg.outDir), wave.map { seg => Map(
      "segment" -> seg.toString,
      "status" -> Manifest.Complete,
      "turns_read" -> ingest.getOrElse(seg, 0L).toString,
      "tokens_emitted" -> tokens.getOrElse(seg, 0L).toString,
      "postings_written" -> written.getOrElse(seg, 0L).toString,
      "attempts" -> attemptOf(seg).toString,
      "snapshot_id" -> t0.toString,
      "wall_ms" -> wallMs.toString)
    })
    Manifest.deleteRecursively(waveTmp)
  }

  /** Open posting buffer for one term within the current segment.
    * Arrays grow geometrically from 4 slots: Zipfian vocabularies are
    * tail-heavy (most terms have df ≈ 1-2 per segment), so per-term
    * cost stays ~100 B instead of the full-block ~2.2 KB — worst-case
    * task memory is bounded by `maxBufferedPostings`, not
    * vocab × BlockSize. */
  private final class TermBuf {
    var term: String = _
    var blockId = 0
    var ids = new Array[Long](4)
    var tfs = new Array[Int](4)
    var dls = new Array[Int](4)
    // concatenated token positions of the buffered postings (format
    // v3); run boundaries are the tfs — grows independently since a
    // posting contributes tf positions
    var pos = new Array[Int](4)
    var pn = 0
    var n = 0
    def grow(): Unit = {
      val cap = math.min(PostingCodec.BlockSize, ids.length << 1)
      ids = java.util.Arrays.copyOf(ids, cap)
      tfs = java.util.Arrays.copyOf(tfs, cap)
      dls = java.util.Arrays.copyOf(dls, cap)
    }
    def addPos(p: Int): Unit = {
      if (pn == pos.length) pos = java.util.Arrays.copyOf(pos, pos.length << 1)
      pos(pn) = p; pn += 1
    }
  }

  /** Open-addressing term → [[TermBuf]] table for one segment, probed
    * by token CONTENT (builder chars + an incrementally-computed
    * String-compatible hash): the `sb.toString` per token OCCURRENCE
    * the previous per-doc HashMap path paid — ~10⁹ transient strings
    * per bench build, the top allocation site of the encode profile —
    * now happens once per DISTINCT term per segment, at insertion.
    * Linear probing at ≤ 0.5 load; the key lives in `TermBuf.term`. */
  private final class TermTable {
    private var tab = new Array[TermBuf](1 << 12)
    var size = 0
    @inline private def spread(h: Int): Int = h ^ (h >>> 16)
    private def growTable(): Unit = {
      val old = tab
      tab = new Array[TermBuf](old.length << 1)
      val mask = tab.length - 1
      var i = 0
      while (i < old.length) {
        val b = old(i)
        if (b != null) {
          var j = spread(b.term.hashCode) & mask
          while (tab(j) != null) j = (j + 1) & mask
          tab(j) = b
        }
        i += 1
      }
    }
    /** Probe by builder content; `h` must equal what String.hashCode
      * yields for the builder's chars. */
    def probe(sb: java.lang.StringBuilder, h: Int): TermBuf = {
      if ((size + 1) * 2 > tab.length) growTable()
      val mask = tab.length - 1
      var j = spread(h) & mask
      while (true) {
        val b = tab(j)
        if (b == null) {
          val nb = new TermBuf
          nb.term = sb.toString
          tab(j) = nb; size += 1
          return nb
        }
        if (b.term.length == sb.length && b.term.contentEquals(sb)) return b
        j = (j + 1) & mask
      }
      throw new IllegalStateException("unreachable")
    }
    /** Probe by an already-materialized term string (non-V1 chains). */
    def probeString(t: String): TermBuf = {
      if ((size + 1) * 2 > tab.length) growTable()
      val mask = tab.length - 1
      var j = spread(t.hashCode) & mask
      while (true) {
        val b = tab(j)
        if (b == null) {
          val nb = new TermBuf
          nb.term = t
          tab(j) = nb; size += 1
          return nb
        }
        if (b.term == t) return b
        j = (j + 1) & mask
      }
      throw new IllegalStateException("unreachable")
    }
    /** Non-empty buffers in sorted term order (flush determinism). */
    def drainSorted: Iterator[TermBuf] = {
      val out = new scala.collection.mutable.ArrayBuffer[TermBuf](size)
      var i = 0
      while (i < tab.length) {
        val b = tab(i)
        if (b != null && b.n > 0) out += b
        i += 1
      }
      out.sortInPlaceBy(_.term).iterator
    }
  }

  /**
   * Streaming posting-list builder over DOC rows sorted by
   * (segment, doc_id): tokenizes each doc and APPENDS to per-term
   * buffers — docIds arrive ascending within a segment, so posting
   * lists are sorted by construction with no token-level sort or
   * shuffle. A term's block is emitted the moment it reaches
   * [[PostingCodec.BlockSize]] postings; partial tail blocks flush at
   * each segment boundary in sorted term order (determinism).
   *
   * Memory: HARD-BOUNDED. Open buffers are O(per-segment vocabulary)
   * in the common case (`nSegments` sizes them cache-resident; Heaps'
   * law: vocab grows ~√tokens per segment) and buffers grow
   * geometrically from 4 slots, so a tail term (df ≈ 1-2) costs
   * ~100 B, not a full 2.2 KB block. When a pathological segment
   * exceeds `maxOpenTerms` open terms OR `maxBufferedPostings` raw
   * buffered postings (~16 B each), ALL open buffers flush mid-segment
   * (a Lucene-style memory flush): posting lists stay docId-sorted
   * because block doc ranges remain disjoint and increasing — readers
   * order blocks by max_doc_id — at the cost of under-full tail blocks
   * per flush. Worst-case task memory ≈ maxBufferedPostings × 16 B
   * (default ~64 MB) regardless of corpus or vocabulary shape.
   */
  private[index] def encodeDocs(docs: Iterator[(Long, Int, String, Int)],
                                az: Analyzer = Analyzer.V1,
                                maxOpenTerms: Int = 1 << 19,
                                maxBufferedPostings: Long = 1L << 22,
                                storePositions: Boolean = true): Iterator[PostingBlockRow] =
    new Iterator[PostingBlockRow] {
      // default (V1) chain: tokenize INLINE, streaming each occurrence
      // straight into the term table — no per-doc term→positions map,
      // no string per occurrence (see [[TermTable]]). Non-V1 chains
      // (stop/stem rewrite tokens) keep the analyzer-map path.
      private val inlineV1 = az.id == Analyzer.V1.id
      private var table = new TermTable
      private var nBuffered = 0L
      private var nBufferedPos = 0L
      private var curSeg = Int.MinValue
      private var pending: (Long, Int, String, Int) = _
      private var segFlush: Iterator[PostingBlockRow] = Iterator.empty
      private val ready = new java.util.ArrayDeque[PostingBlockRow]()
      private val sb = new java.lang.StringBuilder(16)

      private def encodeBlock(term: String, seg: Int, b: TermBuf): PostingBlockRow = {
        val ids = java.util.Arrays.copyOf(b.ids, b.n)
        val tfs = java.util.Arrays.copyOf(b.tfs, b.n)
        val dls = java.util.Arrays.copyOf(b.dls, b.n)
        var maxTf = 0
        var minDl = Int.MaxValue
        var cf = 0L
        var i = 0
        while (i < b.n) {
          if (tfs(i) > maxTf) maxTf = tfs(i)
          if (dls(i) < minDl) minDl = dls(i)
          cf += tfs(i)
          i += 1
        }
        // positions: delta within each posting's run, first absolute
        // (the buffered ints are absolute; runs delimited by tfs).
        // storePositions=false buffers none → empty column
        val posDeltas = new Array[Long](b.pn)
        if (b.pn > 0) {
          var o = 0
          i = 0
          while (i < b.n) {
            var j = 0
            var prev = 0
            while (j < tfs(i)) {
              val p = b.pos(o)
              posDeltas(o) = if (j == 0) p.toLong else (p - prev).toLong
              prev = p; o += 1; j += 1
            }
            i += 1
          }
        }
        val row = PostingBlockRow(term, seg, b.blockId, b.n, ids(b.n - 1),
          maxTf, minDl,
          VByte.encode(VByte.deltas(ids)), VByte.encodeInts(tfs),
          VByte.encodeInts(dls), VByte.encode(posDeltas), cf)
        b.blockId += 1
        b.n = 0
        b.pn = 0
        row
      }

      /** Lazily drain a finished segment's partial blocks in sorted
        * term order; the iterator owns the old table, `table` is
        * replaced so the next segment starts fresh. */
      private def startSegFlush(seg: Int): Unit = {
        val old = table
        table = new TermTable
        nBuffered = 0L
        nBufferedPos = 0L
        if (old.size == 0) { segFlush = Iterator.empty; return }
        segFlush = old.drainSorted.map(b => encodeBlock(b.term, seg, b))
      }

      /** Open a new posting in `b` (flushing a full block first — a
        * block is emitted when the NEXT posting arrives rather than
        * the moment it fills; block contents are identical and the
        * wave's (segment, term, block_id) sort fixes row order). */
      private def openPosting(b: TermBuf, docId: Long, dl: Int, seg: Int): Unit = {
        if (b.n == PostingCodec.BlockSize) {
          nBuffered -= b.n; nBufferedPos -= b.pn
          ready.addLast(encodeBlock(b.term, seg, b))
        }
        if (b.n == b.ids.length) b.grow()
        b.ids(b.n) = docId; b.tfs(b.n) = 1; b.dls(b.n) = dl; b.n += 1
        nBuffered += 1
      }

      /** Whole-posting append for the analyzer-map (non-V1) path. */
      private def addWhole(b: TermBuf, tf: Int, posBuf: graft.analysis.Tokenizer.IntBuf,
                           docId: Long, dl: Int, seg: Int): Unit = {
        openPosting(b, docId, dl, seg)
        b.tfs(b.n - 1) = tf
        if (posBuf != null) {
          var j = 0
          while (j < tf) { b.addPos(posBuf.a(j)); j += 1 }
          nBufferedPos += tf
        }
      }

      private def process(row: (Long, Int, String, Int)): Unit = {
        val (docId, seg, text, dl) = row
        if (inlineV1) {
          // one fused scan: classify chars, build the token in `sb`
          // with a String-compatible incremental hash, stream each
          // occurrence into the table. Positions are indices in the
          // analyzed stream, ascending per doc by construction.
          if (text != null && !text.isEmpty) {
            val n = text.length
            var i = 0
            var p = 0
            var h = 0
            sb.setLength(0)
            while (i <= n) {
              val c = if (i < n) text.charAt(i) else 0.toChar
              val lc =
                if (c >= 'a' && c <= 'z') c
                else if (c >= 'A' && c <= 'Z') (c + 32).toChar
                else if (c >= '0' && c <= '9') c
                else 0.toChar
              if (lc != 0) { sb.append(lc); h = h * 31 + lc }
              else if (sb.length > 0) {
                val b = table.probe(sb, h)
                if (b.n > 0 && b.ids(b.n - 1) == docId) b.tfs(b.n - 1) += 1
                else openPosting(b, docId, dl, seg)
                if (storePositions) { b.addPos(p); nBufferedPos += 1 }
                p += 1; sb.setLength(0); h = 0
              }
              i += 1
            }
          }
        } else if (storePositions) {
          az.termPositions(text).foreach { case (t, pb) =>
            addWhole(table.probeString(t), pb.n, pb, docId, dl, seg) }
        } else {
          az.termFreqs(text).foreach { case (t, tf) =>
            addWhole(table.probeString(t), tf, null, docId, dl, seg) }
        }
        // memory cap: pathological vocabulary (open-term count) OR raw
        // buffered-posting volume → flush every open buffer now (doc
        // boundary keeps block doc ranges disjoint). The posting-volume
        // trigger hard-bounds task memory (~16 B/posting + 4 B/buffered
        // position — the position cap is 4x the posting cap, so both
        // budgets top out around the same byte volume) even when a few
        // hot terms hold near-full blocks across a huge vocab.
        if (table.size >= maxOpenTerms || nBuffered >= maxBufferedPostings ||
            nBufferedPos >= 4L * maxBufferedPostings)
          startSegFlush(seg)
      }

      private def advance(): Unit = {
        while (ready.isEmpty && !segFlush.hasNext && (pending != null || docs.hasNext)) {
          val row = if (pending != null) { val x = pending; pending = null; x }
                    else docs.next()
          if (row._2 != curSeg && curSeg != Int.MinValue && table.size > 0) {
            pending = row // replay after the finished segment drains
            val finished = curSeg
            curSeg = row._2
            startSegFlush(finished)
          } else {
            curSeg = row._2
            process(row)
          }
        }
        if (ready.isEmpty && !segFlush.hasNext && pending == null && !docs.hasNext &&
            table.size > 0) {
          startSegFlush(curSeg)
        }
      }

      override def hasNext: Boolean = {
        if (!ready.isEmpty || segFlush.hasNext) return true
        advance()
        !ready.isEmpty || segFlush.hasNext
      }
      override def next(): PostingBlockRow = {
        if (!hasNext) throw new NoSuchElementException
        if (!ready.isEmpty) ready.pollFirst()
        else segFlush.next()
      }
    }

  private def writeAtomic(spark: SparkSession, outDir: String, name: String)
                         (write: String => Unit): Unit = {
    val tmp = Paths.get(outDir, s"_tmp_$name")
    Manifest.deleteRecursively(tmp)
    write(tmp.toString)
    Manifest.publishDir(tmp, Paths.get(outDir, name))
  }

  /** Ingestion-equality invariant (input_hint): per-turn text equality
    * between the indexed staging copy and the source, under stable
    * (conv_id, turn_idx) identity. Returns the number of violations. */
  def verifyIngestion(spark: SparkSession, outDir: String, source: Dataset[Turn]): Long = {
    val staged = readStaging(spark, outDir)
      .select(col("conv_id"), col("turn_idx"), col("text").as("staged_text"))
    source.select(col("conv_id"), col("turn_idx"), col("text"))
      .join(staged, Seq("conv_id", "turn_idx"), "full_outer")
      .filter(col("text").isNull || col("staged_text").isNull ||
        col("text") =!= col("staged_text"))
      .count()
  }
}
