package graft.sources

import graft.model.Turn
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Deterministic seeded generator for the transcript corpus
 * (FIXTURES.md §1): zipfian vocabulary (~5k terms, s≈1.1) plus
 * rare-tail terms, with hot role/tool tokens folded into the text so
 * the head-term skew path is exercised (the `role` values appear in
 * nearly every turn, df ≈ N — SURVEY.md §7.5).
 *
 * Mirrors the reference's test strategy of a fixed corpus with
 * exactly-known counts (44 Shakespeare files,
 * `/root/reference/code/ingest/src/test/resources/test-data/`).
 *
 * Determinism: each turn's content is a pure function of (seed,
 * conv_id, turn_idx) — a dedicated splittable PRNG is seeded per turn,
 * so generation is identical at any parallelism and any partitioning.
 * Generation is distributed: `spark.range` over conversations, then a
 * flatMap per conversation — no driver-side materialization, scales to
 * arbitrarily many turns.
 */
object SyntheticTranscripts {

  private val Roles = Array("user", "assistant", "system", "tool")
  private val Tools = Array("", "bash", "search", "editor", "browser")

  /** ~5k-term zipfian vocabulary: deterministic pseudo-words. */
  private val VocabSize = 5000
  private val ZipfS = 1.1

  private def word(i: Int): String = {
    // short deterministic pseudo-word: base-20 consonant-vowel pairs
    val cons = "bcdfghjklmnpqrstvwxz"
    val vow = "aeiou"
    val sb = new StringBuilder
    var x = i + 7
    do {
      sb.append(cons.charAt(x % cons.length))
      sb.append(vow.charAt((x / cons.length) % vow.length))
      x /= (cons.length * vow.length)
    } while (x > 0)
    sb.toString
  }

  // cumulative zipf weights for inverse-CDF sampling (built once per
  // executor via lazy val; ~5k doubles)
  private lazy val zipfCdf: Array[Double] = {
    val w = Array.tabulate(VocabSize)(i => 1.0 / math.pow(i + 1.0, ZipfS))
    val total = w.sum
    val cdf = new Array[Double](VocabSize)
    var acc = 0.0
    var i = 0
    while (i < VocabSize) { acc += w(i) / total; cdf(i) = acc; i += 1 }
    cdf
  }

  private def sampleZipf(rng: java.util.SplittableRandom): Int = {
    val u = rng.nextDouble()
    val idx = java.util.Arrays.binarySearch(zipfCdf, u)
    val i = if (idx >= 0) idx else -idx - 1
    math.min(i, VocabSize - 1)
  }

  /** Pure per-turn generation — the unit of determinism. */
  def makeTurn(seed: Long, conv: Long, turnIdx: Int): Turn = {
    val rng = new java.util.SplittableRandom(
      seed * 1000003L + conv * 31L + turnIdx)
    val role = Roles(rng.nextInt(Roles.length))
    val tool = Tools(rng.nextInt(Tools.length))
    val nTokens = 5 + rng.nextInt(196) // 5..200 tokens/turn
    val sb = new StringBuilder
    sb.append(role) // hot head token folded into text
    if (tool.nonEmpty && rng.nextInt(3) == 0) { sb.append(' '); sb.append(tool) }
    var i = 0
    while (i < nTokens) {
      sb.append(' ')
      if (rng.nextInt(1000) == 0) { // rare tail term, df ~ 1
        sb.append("rare"); sb.append(conv); sb.append('x'); sb.append(turnIdx)
      } else sb.append(word(sampleZipf(rng)))
      i += 1
    }
    val ts = new java.sql.Timestamp(
      1767225600000L + conv * 3600000L + turnIdx * 15000L) // 2026-01-01 UTC base
    Turn(f"conv-$conv%06d", turnIdx, role, sb.toString, tool, ts)
  }

  /** Distributed generation of `nConvs` conversations with
    * `turnsPerConv(conv)` turns each (default 1..maxTurns cyclic). */
  def generate(spark: SparkSession, seed: Long, nConvs: Long,
               maxTurns: Int = 10, partitions: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, nConvs, 1, partitions).as[Long].flatMap { conv =>
      val nTurns = 1 + (conv % maxTurns).toInt
      (0 until nTurns).iterator.map(t => makeTurn(seed, conv, t))
    }
  }
}
