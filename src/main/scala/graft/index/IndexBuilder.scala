package graft.index

import graft.analysis.Tokenizer
import graft.model._
import graft.store.Manifest
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import java.nio.file.{Files, Paths}

/** One (term, docId) posting before encoding. */
case class TokenRow(term: String, segment: Int, doc_id: Long, tf: Int, dl: Int)

case class BuildConfig(outDir: String,
                       nSegments: Int = 32,
                       waveSize: Int = 16,
                       sortPartitions: Int = 0, // 0 → defaultParallelism
                       resume: Boolean = true,
                       failAfterWaves: Int = -1) // test hook: simulated kill

case class BuildReport(nDocs: Long, avgdl: Double, nTerms: Long,
                       segmentsBuilt: Int, segmentsSkipped: Int, wallMs: Long)

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
 * partitioned by segment (partition-prunable for Phase B and resume),
 * doc_stats, the global dictionary (term → df, cf), corpus_stats, and
 * a phaseA manifest carrying an order-insensitive corpus content hash
 * (xor of xxhash64(conv_id, turn_idx, text)) for change detection —
 * the reference's `jj_scanner_doc_hash` analog
 * (`ScannerImpl.java:380-417`).
 *
 * == Phase B (postings, per-segment, in waves) ==
 * For each wave of segments not yet COMPLETE: read staging (partition
 * pruning selects only the wave's segments) → tokenize →
 * (term, segment, docId, tf, dl) → `repartition($"segment")` +
 * `sortWithinPartitions(segment, term, doc_id)` → streaming block
 * encoder (`mapPartitions`, O(blockSize) memory) → write partitioned
 * by segment → atomic per-segment publish + manifest row.
 *
 * == Why this scales ==
 * There is NO global repartition-by-term shuffle: the segment IS the
 * docId-range salt of SURVEY.md §2.7 applied uniformly, so a head term
 * with df ≈ N is split across every segment with at most segSize
 * postings per segment — skew is structurally bounded, and per-term
 * segment postings concatenate in segment order into globally
 * docId-sorted lists. The only corpus-wide shuffles are the Phase-A
 * range sort and the dictionary groupBy (map-side partial agg). Wave
 * size bounds the working set; killed builds resume by manifest
 * anti-planning, and replays are idempotent (overwrite-by-partition).
 */
object IndexBuilder {

  def stagingDir(outDir: String) = s"$outDir/_staging/docs"
  def manifestDir(outDir: String) = s"$outDir/_manifest"
  def postingsDir(outDir: String) = s"$outDir/postings"
  def docStatsDir(outDir: String) = s"$outDir/doc_stats"
  def dictionaryDir(outDir: String) = s"$outDir/dictionary"
  def corpusStatsDir(outDir: String) = s"$outDir/corpus_stats"

  def build(spark: SparkSession, turns: Dataset[Turn], cfg: BuildConfig): BuildReport = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val mdir = manifestDir(cfg.outDir)

    // ---- change detection: order-insensitive corpus hash ----
    val hashRow = turns.agg(
      coalesce(sum(lit(1L)), lit(0L)).as("n"),
      coalesce(expr("bit_xor(xxhash64(conv_id, turn_idx, text))"), lit(0L)).as("h")
    ).head()
    val srcCount = hashRow.getLong(0)
    val srcHash = hashRow.getLong(1).toString

    val phaseAPath = Manifest.phaseAPath(mdir)
    val prior = Manifest.read(phaseAPath)
    val phaseAValid = cfg.resume && prior.exists(m =>
      m.get("status").contains(Manifest.Complete) &&
        m.get("content_hash").contains(srcHash) &&
        Files.exists(Paths.get(stagingDir(cfg.outDir))))

    val (nDocs, avgdl, nTerms, segSize, nSegEff) =
      if (phaseAValid) {
        val m = prior.get
        (m("n_docs").toLong, m("avgdl").toDouble, m("n_terms").toLong,
          m("seg_size").toLong, m("n_segments_effective").toInt)
      } else {
        // source changed or fresh build → reset everything
        Manifest.deleteRecursively(Paths.get(cfg.outDir))
        phaseA(spark, turns, cfg, srcHash, srcCount)
      }

    // ---- Phase B: postings in waves, resume-aware ----
    val complete = Manifest.completeSegments(mdir)
    val allSegments = (0 until nSegEff).toVector
    val pending = allSegments.filterNot(complete)
    var wavesDone = 0
    pending.grouped(math.max(1, cfg.waveSize)).foreach { wave =>
      if (cfg.failAfterWaves >= 0 && wavesDone >= cfg.failAfterWaves)
        throw new SimulatedKill(wavesDone)
      buildWave(spark, cfg, wave, avgdl)
      wavesDone += 1
    }

    BuildReport(nDocs, avgdl, nTerms, pending.size, complete.size,
      System.currentTimeMillis() - t0)
  }

  /** Phase A. Returns (nDocs, avgdl, nTerms, segSize, effective segment count). */
  private def phaseA(spark: SparkSession, turns: Dataset[Turn], cfg: BuildConfig,
                     srcHash: String, srcCount: Long): (Long, Double, Long, Long, Int) = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val p = if (cfg.sortPartitions > 0) cfg.sortPartitions
            else spark.sparkContext.defaultParallelism

    val sorted = turns
      .repartitionByRange(p, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition counts → dense offsets (docID stability:
    // range partitions are globally ordered and keys are unique, so the
    // assigned id equals the row's rank in the total order regardless
    // of p — SURVEY.md §7.5)
    val counts = sorted.mapPartitions { it =>
      Iterator.single((TaskContext.getPartitionId(), it.size.toLong))
    }.collect().sortBy(_._1)
    val nDocs = counts.map(_._2).sum
    require(nDocs == srcCount, s"sorted count $nDocs != source count $srcCount")
    val offsets = new Array[Long](counts.length.max(1))
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val segSize = math.max(1L, (nDocs + cfg.nSegments - 1) / cfg.nSegments)
    val nSegEff = if (nDocs == 0) 0 else (((nDocs - 1) / segSize) + 1).toInt
    val offB = spark.sparkContext.broadcast(offsets)

    // pass 2: assign ids + doc length
    val docTurns: Dataset[DocTurn] = sorted.mapPartitions { it =>
      val off = offB.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { t =>
        val id = off + i; i += 1
        DocTurn(id, (id / segSize).toInt, t.conv_id, t.turn_idx, t.role,
          t.text, t.tool, Tokenizer.docLength(t.text))
      }
    }

    // staging: corpus + ids, partitioned by segment (atomic publish)
    val stagingTmp = Paths.get(cfg.outDir, "_tmp_staging_docs")
    Manifest.deleteRecursively(stagingTmp)
    docTurns.write.partitionBy("segment").mode("overwrite").parquet(stagingTmp.toString)
    Manifest.publishDir(stagingTmp, Paths.get(stagingDir(cfg.outDir)))
    sorted.unpersist()

    val staging = spark.read.parquet(stagingDir(cfg.outDir))

    // doc_stats
    writeAtomic(spark, cfg.outDir, "doc_stats") { tmp =>
      staging.select("doc_id", "conv_id", "turn_idx", "dl", "segment")
        .repartitionByRange(math.max(1, p / 4), col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(tmp)
    }

    // dictionary: global df/cf per term (map-side partial agg absorbs
    // the head-term skew; term-range-sorted files for scan pruning)
    writeAtomic(spark, cfg.outDir, "dictionary") { tmp =>
      staging.select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (_, text) =>
          Tokenizer.termFreqs(text).iterator.map { case (t, tf) => (t, tf.toLong) }
        }.toDF("term", "tf")
        .groupBy("term").agg(count(lit(1)).as("df"), sum("tf").as("cf"))
        .repartitionByRange(math.max(1, p / 4), col("term"))
        .sortWithinPartitions("term")
        .write.mode("overwrite").parquet(tmp)
    }
    val nTerms = spark.read.parquet(dictionaryDir(cfg.outDir)).count()

    // corpus_stats — avgdl defined as sum(dl)/n_docs in double
    val dlSum = staging.agg(coalesce(sum("dl"), lit(0L))).head().getLong(0)
    val avgdl = if (nDocs == 0) 1.0 else dlSum.toDouble / nDocs
    writeAtomic(spark, cfg.outDir, "corpus_stats") { tmp =>
      Seq(CorpusStats(nDocs, avgdl, nTerms, 1, Tokenizer.Version)).toDS()
        .coalesce(1).write.mode("overwrite").parquet(tmp)
    }

    Manifest.writeAtomic(Manifest.phaseAPath(manifestDir(cfg.outDir)), Map(
      "status" -> Manifest.Complete,
      "n_docs" -> nDocs.toString,
      "avgdl" -> avgdl.toString,
      "n_terms" -> nTerms.toString,
      "seg_size" -> segSize.toString,
      "n_segments_effective" -> nSegEff.toString,
      "content_hash" -> srcHash,
      "tokenizer_version" -> Tokenizer.Version.toString,
      "wall_ms" -> (System.currentTimeMillis() - t0).toString))
    (nDocs, avgdl, nTerms, segSize, nSegEff)
  }

  /** Build + atomically publish one wave of segments. */
  private def buildWave(spark: SparkSession, cfg: BuildConfig,
                        wave: Seq[Int], avgdl: Double): Unit = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val staging = spark.read.parquet(stagingDir(cfg.outDir))
      .filter(col("segment").isInCollection(wave)) // partition pruning

    // ingest metrics per segment (one cheap agg over pruned staging)
    val ingest = staging.groupBy("segment")
      .agg(count(lit(1)).as("turns"), sum("dl").as("tokens"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap

    val tokenRows: Dataset[TokenRow] = staging
      .select($"doc_id", $"segment", $"text", $"dl")
      .as[(Long, Int, String, Int)]
      .flatMap { case (docId, seg, text, dl) =>
        Tokenizer.termFreqs(text).iterator.map { case (t, tf) =>
          TokenRow(t, seg, docId, tf, dl)
        }
      }

    val encoded: Dataset[PostingBlockRow] = tokenRows
      .repartition(wave.size, col("segment"))
      .sortWithinPartitions("segment", "term", "doc_id")
      .mapPartitions(encodePartition(_, avgdl))

    val waveTmp = Paths.get(cfg.outDir, "_tmp_wave")
    Manifest.deleteRecursively(waveTmp)
    encoded.write.partitionBy("segment").mode("overwrite").parquet(waveTmp.toString)

    // postings counts per segment from the freshly written footers
    val written = spark.read.parquet(waveTmp.toString)
      .groupBy("segment").agg(count(lit(1)).as("blocks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // atomic per-segment publish + manifest commit point
    val wallMs = System.currentTimeMillis() - t0
    wave.foreach { seg =>
      val src = waveTmp.resolve(s"segment=$seg")
      val dest = Paths.get(postingsDir(cfg.outDir), s"segment=$seg")
      if (Files.exists(src)) Manifest.publishDir(src, dest)
      else Files.createDirectories(dest) // segment with no postings
      val (turns, tokens) = ingest.getOrElse(seg, (0L, 0L))
      Manifest.writeAtomic(Manifest.segPath(manifestDir(cfg.outDir), seg), Map(
        "segment" -> seg.toString,
        "status" -> Manifest.Complete,
        "turns_read" -> turns.toString,
        "tokens_emitted" -> tokens.toString,
        "postings_written" -> written.getOrElse(seg, 0L).toString,
        "attempts" -> "1",
        "snapshot_id" -> t0.toString,
        "wall_ms" -> wallMs.toString))
    }
    Manifest.deleteRecursively(waveTmp)
  }

  /** Streaming block encoder over rows sorted by (segment, term,
    * doc_id): O(BlockSize) memory, emits a block every 128 postings or
    * at each (segment, term) boundary. */
  private[index] def encodePartition(rows: Iterator[TokenRow], avgdl: Double): Iterator[PostingBlockRow] =
    new Iterator[PostingBlockRow] {
      private val B = PostingCodec.BlockSize
      private val ids = new Array[Long](B)
      private val tfs = new Array[Int](B)
      private val dls = new Array[Int](B)
      private var n = 0
      private var curTerm: String = _
      private var curSeg: Int = -1
      private var blockId = 0
      private var pendingRow: TokenRow = _
      private var out: PostingBlockRow = _

      private def flush(): Unit = {
        val bIds = java.util.Arrays.copyOf(ids, n)
        val bTfs = java.util.Arrays.copyOf(tfs, n)
        val bDls = java.util.Arrays.copyOf(dls, n)
        var maxTfn = 0.0
        var i = 0
        while (i < n) {
          val t = graft.query.BM25.tfNorm(bTfs(i), bDls(i), avgdl)
          if (t > maxTfn) maxTfn = t
          i += 1
        }
        out = PostingBlockRow(curTerm, curSeg, blockId, n, bIds(n - 1), maxTfn,
          VByte.encode(VByte.deltas(bIds)), VByte.encodeInts(bTfs),
          VByte.encodeInts(bDls))
        blockId += 1
        n = 0
      }

      private def advance(): Unit = {
        while (out == null && (pendingRow != null || rows.hasNext)) {
          val r = if (pendingRow != null) { val x = pendingRow; pendingRow = null; x }
                  else rows.next()
          if (curTerm == null) { curTerm = r.term; curSeg = r.segment }
          if (r.term != curTerm || r.segment != curSeg) {
            pendingRow = r
            if (n > 0) flush()
            curTerm = r.term; curSeg = r.segment; blockId = 0
          } else {
            ids(n) = r.doc_id; tfs(n) = r.tf; dls(n) = r.dl; n += 1
            if (n == B) flush()
          }
        }
        if (out == null && n > 0) flush()
      }

      override def hasNext: Boolean = { if (out == null) advance(); out != null }
      override def next(): PostingBlockRow = {
        if (!hasNext) throw new NoSuchElementException
        val r = out; out = null; r
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
    val staged = spark.read.parquet(stagingDir(outDir))
      .select(col("conv_id"), col("turn_idx"), col("text").as("staged_text"))
    source.select(col("conv_id"), col("turn_idx"), col("text"))
      .join(staged, Seq("conv_id", "turn_idx"), "full_outer")
      .filter(col("text").isNull || col("staged_text").isNull ||
        col("text") =!= col("staged_text"))
      .count()
  }
}
