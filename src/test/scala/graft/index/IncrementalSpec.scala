package graft.index

import graft.SparkFunSuite
import graft.model.Turn
import graft.query.IndexReader
import graft.sources.SyntheticTranscripts
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * Incremental maintenance invariants (FIXTURES.md §4 extension):
 * update/delete/append → only touched segments rebuild, untouched
 * posting files stay byte-identical on disk, docIDs of unchanged docs
 * are stable, and the updated index is query-indistinguishable from a
 * from-scratch build over the same corpus (scores bit-identical).
 */
class IncrementalSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private lazy val v1 = SyntheticTranscripts.generate(spark, 42L, nConvs = 400, maxTurns = 8)

  /** v2 = v1 with one conversation deleted, one turn's text updated,
    * and 20 new conversations appended (keys sort after existing). */
  private lazy val v2: Dataset[Turn] = {
    val updated = v1
      .filter(col("conv_id") =!= "conv-000005")
      .withColumn("text",
        when(col("conv_id") === "conv-000010" && col("turn_idx") === 0,
          lit("freshly updated turn contents zebraword"))
          .otherwise(col("text"))).as[Turn]
    val appended = SyntheticTranscripts.generate(spark, 99L, nConvs = 20, maxTurns = 5)
      .withColumn("conv_id", concat(lit("zz-"), col("conv_id"))).as[Turn]
    updated.unionByName(appended).as[Turn]
  }

  /** v3 = v2 with a further update inside an already-overlaid segment
    * and more appended conversations (exercises overlay replacement). */
  private lazy val v3: Dataset[Turn] = {
    val updated = v2.withColumn("text",
      when(col("conv_id") === "conv-000010" && col("turn_idx") === 1,
        lit("second round update quaggaword"))
        .otherwise(col("text"))).as[Turn]
    val appended = SyntheticTranscripts.generate(spark, 7L, nConvs = 10, maxTurns = 4)
      .withColumn("conv_id", concat(lit("zzz-"), col("conv_id"))).as[Turn]
    updated.unionByName(appended).as[Turn]
  }

  private def postingFiles(dir: String): Map[String, (Long, java.nio.file.attribute.FileTime)] =
    Files.walk(Paths.get(IndexBuilder.postingsDir(dir))).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString -> ((Files.size(p), Files.getLastModifiedTime(p)))).toMap

  private def queriesEqual(a: IndexReader, b: IndexReader): Unit = {
    for (q <- Seq("assistant tool error", "user assistant", "zebraword",
      "la ma na", "browser", "quaggaword", "timeout error")) {
      // k >> hits so tie-breaks at the k boundary can't differ (inc and
      // full builds assign different docIDs; identity is conv/turn)
      val ha = a.searchRanked(q, 10000).map(h => (h.conv_id, h.turn_idx, h.score)).toSet
      val hb = b.searchRanked(q, 10000).map(h => (h.conv_id, h.turn_idx, h.score)).toSet
      assert(ha == hb, s"query '$q'")
    }
  }

  test("atomicSet: field patch via the delta path — touched segments only, equals full rebuild") {
    val dir = tmpDir("atom-idx"); val fullDir = tmpDir("atom-full")
    val cfg = BuildConfig(dir, nSegments = 8, waveSize = 8, autoCompactFraction = 0)
    IndexBuilder.build(spark, v1, cfg)
    val before = postingFiles(dir)
    val word = "atomically patched contents xylophoneword"
    val sets = Seq(("conv-000010", 0, word)).toDF("conv_id", "turn_idx", "text")
    Incremental.atomicSet(spark, cfg, sets)
    val touched = IndexBuilder.overlaidSegments(dir)
    assert(touched.nonEmpty && touched.size < 8,
      "a one-doc patch must not touch every segment")
    val after = postingFiles(dir)
    val untouchedFiles = before.keys.filterNot { p =>
      touched.exists(s => p.contains(s"segment=$s/"))
    }
    assert(untouchedFiles.nonEmpty)
    untouchedFiles.foreach { f =>
      assert(after.get(f).contains(before(f)), s"untouched posting file rewritten: $f")
    }
    // equals a from-scratch build over the manually patched corpus
    val patched = v1.withColumn("text",
      when(col("conv_id") === "conv-000010" && col("turn_idx") === 0, lit(word))
        .otherwise(col("text"))).as[Turn]
    IndexBuilder.build(spark, patched, BuildConfig(fullDir, nSegments = 8, waveSize = 8))
    val ri = new IndexReader(spark, dir); val rf = new IndexReader(spark, fullDir)
    queriesEqual(ri, rf)
    val hi = ri.searchRanked("xylophoneword", 100).map(h => (h.conv_id, h.turn_idx, h.score))
    val hf = rf.searchRanked("xylophoneword", 100).map(h => (h.conv_id, h.turn_idx, h.score))
    assert(hi.nonEmpty && hi.toSet == hf.toSet)
    // a NULL set keeps the current value — the delta sees no change
    val nullSets = Seq(("conv-000020", 0, null: String)).toDF("conv_id", "turn_idx", "text")
    assert(Incremental.atomicSet(spark, cfg, nullSets).segmentsBuilt == 0)
  }

  test("atomicSet staging is O(patch): only the patched keys' rows are checkpointed") {
    val dir = tmpDir("atom-opatch")
    val cfg = BuildConfig(dir, nSegments = 8, waveSize = 8, autoCompactFraction = 0)
    IndexBuilder.build(spark, v1, cfg)
    val corpusN = v1.count()
    val sets = Seq(
      ("conv-000010", 0, "opatch one"),
      ("conv-000011", 0, "opatch two"),
      ("conv-000011", 0, "opatch two duplicate"), // duplicate key: deduped, not fanned out
      ("conv-does-not-exist", 0, "dropped")       // absent key: silently dropped
    ).toDF("conv_id", "turn_idx", "text")
    val (turns, staged) = Incremental.patchedCorpus(spark, cfg, sets)
    // the materialized (checkpointed) side is the PATCH, not the corpus
    assert(staged.count() == 2,
      "staged rows must equal the distinct-in-corpus patch size")
    assert(turns.count() == corpusN, "patched view keeps every corpus row exactly once")
    assert(turns.filter(col("text").startsWith("opatch")).count() == 2)
  }

  test("delta: update+delete+append rebuilds only touched segments; equals full rebuild") {
    val incDir = tmpDir("inc-idx"); val fullDir = tmpDir("inc-full")
    val cfgInc = BuildConfig(incDir, nSegments = 8, waveSize = 8)
    val rep1 = IndexBuilder.build(spark, v1, cfgInc)
    assert(rep1.segmentsBuilt == 8)
    val before = postingFiles(incDir)
    // docID of an untouched doc, for stability
    val probeId = IndexBuilder.readDocs(spark, incDir)
      .filter(col("conv_id") === "conv-000200" && col("turn_idx") === 0)
      .select("doc_id").as[Long].head()

    val rep2 = IndexBuilder.build(spark, v2, cfgInc)
    val touched = IndexBuilder.overlaidSegments(incDir)
    assert(touched.nonEmpty && rep2.segmentsBuilt == touched.size)
    assert(touched.size < 8, "a small delta must not touch every segment")

    // untouched segments' posting files byte-identical (same file set,
    // size, mtime — never rewritten)
    val after = postingFiles(incDir)
    val untouchedFiles = before.keys.filterNot { path =>
      touched.exists(s => path.contains(s"segment=$s/"))
    }
    assert(untouchedFiles.nonEmpty)
    untouchedFiles.foreach { f =>
      assert(after.get(f).contains(before(f)), s"untouched posting file rewritten: $f")
    }

    // unchanged docs keep their docIDs
    val probeId2 = IndexBuilder.readDocs(spark, incDir)
      .filter(col("conv_id") === "conv-000200" && col("turn_idx") === 0)
      .select("doc_id").as[Long].head()
    assert(probeId2 == probeId)

    // updated view passes ingestion equality; deleted conv gone
    assert(IndexBuilder.verifyIngestion(spark, incDir, v2) == 0L)
    assert(IndexBuilder.readDocs(spark, incDir)
      .filter(col("conv_id") === "conv-000005").count() == 0)

    // equals a from-scratch build over v2: same corpus stats (exact)
    // and identical (conv, turn, score) result sets
    IndexBuilder.build(spark, v2, BuildConfig(fullDir, nSegments = 8, waveSize = 8))
    val ri = new IndexReader(spark, incDir)
    val rf = new IndexReader(spark, fullDir)
    assert(ri.stats.n_docs == rf.stats.n_docs)
    assert(ri.stats.avgdl == rf.stats.avgdl) // bit-equal doubles
    assert(ri.stats.n_terms == rf.stats.n_terms)
    queriesEqual(ri, rf)

    // metadata-FILTERED search reads the staging VIEW (base + overlays):
    // results over the delta'd index equal the full rebuild's
    val fi = ri.searchWhere("assistant tool error", col("role") === "assistant", 10000)
    val ff = rf.searchWhere("assistant tool error", col("role") === "assistant", 10000)
    def keyed(r: IndexReader, hits: Vector[graft.model.QueryHit]) = {
      val ids = hits.map(_.doc_id).toSet
      IndexBuilder.readDocs(spark, if (r eq ri) incDir else fullDir)
        .filter(col("doc_id").isInCollection(ids))
        .select("doc_id", "conv_id", "turn_idx")
        .as[(Long, String, Int)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    }
    val mi = keyed(ri, fi); val mf = keyed(rf, ff)
    assert(fi.map(h => (mi(h.doc_id), h.score)).toSet ==
      ff.map(h => (mf(h.doc_id), h.score)).toSet)
  }

  test("second delta on top of overlays (overlay replacement) still equals full rebuild") {
    val incDir = tmpDir("inc2-idx"); val fullDir = tmpDir("inc2-full")
    val cfg = BuildConfig(incDir, nSegments = 8, waveSize = 8)
    IndexBuilder.build(spark, v1, cfg)
    IndexBuilder.build(spark, v2, cfg)
    val rep3 = IndexBuilder.build(spark, v3, cfg)
    assert(rep3.segmentsBuilt > 0)
    assert(IndexBuilder.verifyIngestion(spark, incDir, v3) == 0L)
    IndexBuilder.build(spark, v3, BuildConfig(fullDir, nSegments = 8, waveSize = 8))
    val ri = new IndexReader(spark, incDir)
    val rf = new IndexReader(spark, fullDir)
    assert(ri.stats.n_docs == rf.stats.n_docs && ri.stats.avgdl == rf.stats.avgdl)
    queriesEqual(ri, rf)
  }

  test("compact folds overlays into base; view, queries, and further deltas unchanged") {
    val dir = tmpDir("inc-compact")
    val cfg = BuildConfig(dir, nSegments = 8, waveSize = 8)
    IndexBuilder.build(spark, v1, cfg)
    IndexBuilder.build(spark, v2, cfg)
    assert(IndexBuilder.overlaidSegments(dir).nonEmpty)
    val rdr = new IndexReader(spark, dir)
    val before = rdr.searchRanked("assistant tool error", 10000)
      .map(h => (h.conv_id, h.turn_idx, h.score)).toSet

    val folded = Incremental.compact(spark, dir)
    assert(folded > 0)
    assert(IndexBuilder.overlaidSegments(dir).isEmpty)
    assert(IndexBuilder.verifyIngestion(spark, dir, v2) == 0L)
    val after = new IndexReader(spark, dir).searchRanked("assistant tool error", 10000)
      .map(h => (h.conv_id, h.turn_idx, h.score)).toSet
    assert(after == before)
    // a delta applied on top of the compacted base still works
    val rep3 = IndexBuilder.build(spark, v3, cfg)
    assert(rep3.segmentsBuilt > 0)
    assert(IndexBuilder.verifyIngestion(spark, dir, v3) == 0L)
    // compacting twice is a no-op
    IndexBuilder.build(spark, v3, BuildConfig(dir, nSegments = 8, waveSize = 8))
    Incremental.compact(spark, dir)
    assert(Incremental.compact(spark, dir) == 0)
  }

  test("delta invalidates the finalize commit point (stale dictionary cannot survive a crash)") {
    val dir = tmpDir("inc-fin")
    val cfg = BuildConfig(dir, nSegments = 8, waveSize = 8)
    IndexBuilder.build(spark, v1, cfg)
    val finPath = graft.store.Manifest.finalizePath(IndexBuilder.manifestDir(dir))
    assert(Files.exists(finPath))
    // simulate the crash window: the delta lands (overlays + STALE +
    // manifest), then the process dies before Phase B / finalize
    val h = v2.agg(org.apache.spark.sql.functions.expr(
      "bit_xor(xxhash64(conv_id, turn_idx, role, text, tool))")).head().getLong(0).toString
    Incremental.delta(spark, v2, cfg, h)
    assert(!Files.exists(finPath), "stale finalize manifest must be invalidated by the delta")
    // the resumed build must re-derive dictionary/corpus_stats
    val rep = IndexBuilder.build(spark, v2, cfg)
    assert(rep.segmentsBuilt > 0)
    val fullDir = tmpDir("inc-fin-full")
    IndexBuilder.build(spark, v2, BuildConfig(fullDir, nSegments = 8, waveSize = 8))
    val ri = new IndexReader(spark, dir); val rf = new IndexReader(spark, fullDir)
    assert(ri.stats.n_docs == rf.stats.n_docs && ri.stats.avgdl == rf.stats.avgdl &&
      ri.stats.n_terms == rf.stats.n_terms)
  }

  test("delta that empties a whole segment clears its old postings (no ghosts)") {
    val incDir = tmpDir("inc-empty-seg"); val fullDir = tmpDir("inc-empty-seg-full")
    val cfg = BuildConfig(incDir, nSegments = 8, waveSize = 8)
    IndexBuilder.build(spark, v1, cfg)
    // delete EVERY doc of one middle segment (by (conv_id, turn_idx) key)
    val segKeys = IndexBuilder.readDocs(spark, incDir)
      .filter(col("segment") === 2).select("conv_id", "turn_idx")
    assert(segKeys.count() > 0)
    val v2d = v1.join(segKeys, Seq("conv_id", "turn_idx"), "left_anti").as[Turn]
    IndexBuilder.build(spark, v2d, cfg)
    // the rebuilt-to-zero segment must hold NO posting files — pre-fix,
    // the old parquet survived and served ghost postings for deleted docs
    val segDir = Paths.get(IndexBuilder.postingsDir(incDir), "segment=2")
    val ghost = Files.walk(segDir).iterator().asScala
      .count(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
    assert(ghost == 0, s"segment=2 still holds $ghost posting files after losing all docs")
    // and queries (incl. searchRanked's doc join) equal a full rebuild
    IndexBuilder.build(spark, v2d, BuildConfig(fullDir, nSegments = 8, waveSize = 8))
    val ri = new IndexReader(spark, incDir); val rf = new IndexReader(spark, fullDir)
    assert(ri.stats.n_docs == rf.stats.n_docs && ri.stats.avgdl == rf.stats.avgdl &&
      ri.stats.n_terms == rf.stats.n_terms)
    queriesEqual(ri, rf)
  }

  test("recoverCompact repairs a crash inside compact's rename window") {
    val dir = tmpDir("inc-compact-crash")
    val cfg = BuildConfig(dir, nSegments = 8, waveSize = 8)
    IndexBuilder.build(spark, v1, cfg)
    IndexBuilder.build(spark, v2, cfg)
    assert(IndexBuilder.overlaidSegments(dir).nonEmpty)
    val base = Paths.get(IndexBuilder.stagingDir(dir))
    val old = Paths.get(dir, "_staging", "docs_precompact")
    val tmp = Paths.get(dir, "_tmp_compact")

    // --- crash state A: merged copy complete, base renamed away, new
    // base not yet renamed in (the exact instant between the two
    // ATOMIC_MOVEs) ---
    IndexBuilder.readStaging(spark, dir)
      .repartitionByRange(4, col("segment"), col("doc_id"))
      .sortWithinPartitions("segment", "doc_id")
      .write.parquet(tmp.toString)
    Files.move(base, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(!Files.exists(base))
    // the next staging read (build and queries route through it) must
    // finish the swap from the complete merged copy
    assert(IndexBuilder.readStaging(spark, dir).count() == v2.count())
    assert(Files.exists(base) && !Files.exists(old) && !Files.exists(tmp))
    assert(IndexBuilder.overlaidSegments(dir).isEmpty) // folded in
    assert(IndexBuilder.verifyIngestion(spark, dir, v2) == 0L)

    // --- crash state B: base renamed away but the merged copy is
    // incomplete (no _SUCCESS) → restore the pre-compact base; the
    // overlays are still live and the view is unchanged ---
    IndexBuilder.build(spark, v3, cfg) // fresh overlays on the compacted base
    assert(IndexBuilder.overlaidSegments(dir).nonEmpty)
    Files.createDirectories(tmp) // partial merge, no _SUCCESS
    Files.move(base, old, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    assert(IndexBuilder.readStaging(spark, dir).count() == v3.count())
    assert(Files.exists(base) && !Files.exists(old) && !Files.exists(tmp))
    assert(IndexBuilder.overlaidSegments(dir).nonEmpty) // kept
    assert(IndexBuilder.verifyIngestion(spark, dir, v3) == 0L)

    // --- crash state C: both renames done, cleanup not (base live,
    // precompact copy and overlays still on disk) → a later build/
    // compact drops the stale copy but keeps the overlay dir (its
    // entries may include LIVE post-crash deltas) ---
    Incremental.compact(spark, dir)
    Files.createDirectories(old.resolve("leftover"))
    val rep = IndexBuilder.build(spark, v3, cfg) // triggers recovery
    assert(!Files.exists(old))
    assert(rep.nDocs == v3.count())
    assert(IndexBuilder.verifyIngestion(spark, dir, v3) == 0L)
  }

  test("delta from an empty index = initial load; rerun of same source is a no-op") {
    val dir = tmpDir("inc-empty")
    val cfg = BuildConfig(dir, nSegments = 4, waveSize = 4)
    IndexBuilder.build(spark, spark.emptyDataset[Turn], cfg)
    // append everything to the empty index via the delta path
    val rep = IndexBuilder.build(spark, v1, cfg)
    assert(rep.nDocs == v1.count())
    val rdr = new IndexReader(spark, dir)
    assert(rdr.search("assistant", 5).nonEmpty)
    // same source again → pure resume, nothing rebuilt
    val rep2 = IndexBuilder.build(spark, v1, cfg)
    assert(rep2.segmentsBuilt == 0)
  }
}
