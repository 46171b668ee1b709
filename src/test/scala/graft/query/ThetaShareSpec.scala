package graft.query

import graft.SparkFunSuite
import graft.index.{BuildConfig, IndexBuilder}
import graft.model.Turn
import org.apache.spark.sql.functions._

/**
 * Two-level merge + θ sharing (SURVEY.md §2.7 query path at scale):
 * grouping many segments per query task must (a) keep every search
 * flavor BIT-IDENTICAL to the flat per-segment evaluation, and (b)
 * bound the driver collect at O(k · tasks), not O(k · segments) — the
 * property that keeps query cost flat as segment counts grow 100×.
 */
class ThetaShareSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  private val nSegments = 256

  private lazy val dir: String = {
    val d = tmpDir("theta-idx")
    val rng = new java.util.SplittableRandom(777)
    val vocab = Array.tabulate(120)(i => s"v$i")
    val turns = Vector.tabulate(2048) { i =>
      val n = 5 + rng.nextInt(25)
      val words = (0 until n).map(_ => vocab(rng.nextInt(vocab.length)))
      // every doc gets a common pair so grouped tasks all contribute
      val t = (words :+ "alpha" :+ "beta").mkString(" ")
      Turn(f"c$i%06d", 0, "doc", t, "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    }
    IndexBuilder.build(spark, turns.toDS(),
      BuildConfig(d, nSegments = nSegments, waveSize = nSegments))
    d
  }

  // grouped: 4 tasks over 256 segments; flat: one task per segment
  private lazy val grouped = new IndexReader(spark, dir, queryTasks = 4)
  private lazy val flat = new IndexReader(spark, dir, queryTasks = 1 << 20)

  private val queries = Seq("alpha beta", "v0 v1 v2", "v100 v5", "v7", "v33 v66 v99")

  test("grouping resolves to the intended task counts") {
    assert(grouped.groupSize == 64)
    assert(flat.groupSize == 1)
  }

  test("search is bit-identical grouped vs flat; collect is O(k·tasks)") {
    for (q <- queries) {
      assert(grouped.search(q, 10) == flat.search(q, 10), s"query '$q'")
    }
    // every doc matches "alpha beta": the flat path collects k rows from
    // each of the 256 segments; the grouped path at most k per TASK
    val gRows = grouped.searchCollect("alpha beta", 10).length
    val fRows = flat.searchCollect("alpha beta", 10).length
    assert(gRows <= 10 * 4, s"grouped collect $gRows rows > k*tasks")
    assert(fRows > 10 * 64, s"flat collect only $fRows rows — corpus no longer exercises the bound")
    assert(grouped.search("alpha beta", 10) == flat.search("alpha beta", 10))
  }

  test("boolean, phrase, filtered, and batched paths are bit-identical grouped vs flat") {
    assert(grouped.searchBoolean("alpha v1", "v2", 10) ==
      flat.searchBoolean("alpha v1", "v2", 10))
    assert(grouped.searchPhrase("alpha beta", 10) == flat.searchPhrase("alpha beta", 10))
    assert(grouped.searchWhere("alpha beta", pmod(col("doc_id"), lit(3)) === 0, 10) ==
      flat.searchWhere("alpha beta", pmod(col("doc_id"), lit(3)) === 0, 10))
    val batch = queries.zipWithIndex.map { case (q, i) => s"q$i" -> q }
    assert(grouped.searchMany(batch, 10).toSet == flat.searchMany(batch, 10).toSet)
  }

  test("θ carried across segments equals θ-cold per segment at large k too") {
    // k larger than any single segment's hit count forces heap-not-full
    // seeding paths (seed = -inf until the task heap fills)
    assert(grouped.search("v0 v1", 500) == flat.search("v0 v1", 500))
    assert(grouped.searchPhrase("alpha beta", 3000) == flat.searchPhrase("alpha beta", 3000))
  }
}
