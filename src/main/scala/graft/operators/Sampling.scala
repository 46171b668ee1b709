package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data mixing — the
 * "X% of web, Y% of code" stage of a pretraining pipeline. All
 * sampling here is HASH-based, never `rand()`: a row's fate depends
 * only on its id, so samples are reproducible at any parallelism,
 * stable across reruns/retries (a re-executed task keeps the same
 * rows — `df.sample` does not guarantee that under task retry), and
 * auditable by an external engine.
 *
 * Scale shape: pure map-side filters — no shuffle, no state; rates
 * compose with partition pruning and pushdown like any predicate.
 */
object Sampling {

  /** Number of hash buckets a fraction is quantized to (1/1000
    * granularity — the published data-mixing recipes quote rates at
    * this precision or coarser). */
  val Buckets = 1000

  /** The row's sampling bucket in [0, [[Buckets]]): production form
    * xxhash64 (codegen'd); crossEngine form the polynomial hash an
    * external SQL engine reproduces —
    * `pmod(polyHash(cast(id as string)), 1000)`. */
  def bucketOf(id: Column, crossEngine: Boolean): Column = {
    val h = if (crossEngine) Hashing.polyHash(id.cast("string")) else xxhash64(id)
    pmod(h, lit(Buckets.toLong))
  }

  /** Keep a deterministic `fraction` of rows by id-hash bucket. */
  def sampleByHash(df: DataFrame, idCol: String, fraction: Double,
                   crossEngine: Boolean = false): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(bucketOf(col(idCol), crossEngine) <
      lit(math.round(fraction * Buckets)))
  }

  /** Stratified sampling: per-stratum keep rates (data mixing). Rows
    * whose stratum is absent from `fractions` keep `defaultFraction`.
    * The rate lookup is a CASE expression — map-side, broadcast-free
    * (mixing tables are tens of strata, not data). */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 fractions: Map[String, Double],
                 defaultFraction: Double = 0.0,
                 crossEngine: Boolean = false): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq)
      .forall(f => f >= 0.0 && f <= 1.0), "fractions must be in [0,1]")
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(math.round(defaultFraction * Buckets)): Column) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(math.round(f * Buckets))).otherwise(acc)
    }
    df.filter(bucketOf(col(idCol), crossEngine) < threshold)
  }

  /** Per-group document caps — the "at most N documents per domain"
    * stage of a crawl-derived pretraining pipeline (the Gopher /
    * FineWeb per-domain cap): within each `groupCol` value keep the
    * top `n` rows under the caller's DETERMINISTIC `rankCols` order
    * (quality desc + a unique tie-break — an ambiguous order would
    * make the kept set parallelism-dependent). One rank window
    * partitioned by the group — the shuffle carries each group's rows
    * to one task, bounded by the largest group, and nothing global.
    * A hot group (one domain = half the crawl) should be pre-capped
    * with [[sampleByHash]] before this window; the cap itself cannot
    * avoid materializing the group's rows in its task. */
  /** Temperature-based source mixing (the multilingual/multi-source
    * sampling stage of mT5/CC-style pipelines): the largest source
    * keeps everything, smaller sources keep a fraction that FALLS
    * SLOWER than their share — keep_rate(s) = √n_s / max_s √n_s
    * (temperature α = 0.5; relative upsampling of the tail sources) —
    * realized deterministically per document by comparing a
    * cross-engine hash uniform u(id) = (polyHash("mix-<id>-salt") mod
    * 1e6)/1e6 against the rate (the salt SUFFIX matters: it multiplies
    * every id-digit difference by 257^5 mod p, giving consecutive ids
    * avalanche-spread u values — the bare hash of a short numeric
    * string clusters, and an affine rehash steps consecutive ids by a
    * near-multiple of 1e6). α is fixed at 0.5 because √ is IEEE
    * correctly-rounded in every engine (pow(x, α) is not), so the
    * keep/drop decision is bit-reproducible by the SQL oracle.
    * One count aggregate + one broadcast join + a stateless filter —
    * nothing shuffles the corpus. */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String): DataFrame = {
    val counts = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val scaleRow = counts.agg(max(sqrt(col("n_s")))).head()
    // empty input: the max aggregate is NULL — return the (empty)
    // frame in the output shape instead of NPE-ing on getDouble
    if (scaleRow.isNullAt(0))
      return df.select(col(idCol), col(srcCol),
        lit(0.0).as("keep_rate")).limit(0)
    val scale = scaleRow.getDouble(0)
    df.join(broadcast(counts), Seq(srcCol))
      .withColumn("keep_rate", sqrt(col("n_s")) / lit(scale))
      .withColumn("u",
        (Hashing.polyHash(concat(lit("mix-"), col(idCol).cast("string"),
          lit("-salt"))) % 1000000L).cast("double") / 1000000.0)
      .filter(col("u") < col("keep_rate"))
      .select(col(idCol), col(srcCol), round(col("keep_rate"), 6).as("keep_rate"))
  }

  def capPerGroup(df: DataFrame, groupCol: String,
                  rankCols: Seq[Column], n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    require(rankCols.nonEmpty, "capPerGroup needs a deterministic order")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(rankCols: _*)
    df.withColumn("_cap_rn", row_number().over(w))
      .filter(col("_cap_rn") <= n)
      .drop("_cap_rn")
  }
}

/**
 * Sequence packing — the concat-and-chunk step that turns a filtered
 * corpus into fixed-budget training sequences: documents are laid out
 * in a deterministic order within each shard and cut into
 * `budget`-token bins; a document's bin is where its first token
 * lands. Emitted as (bin, bin_offset) coordinates so the downstream
 * tokenizer/writer can materialize sequences without re-deriving the
 * layout.
 *
 * Scale shape: one window aggregation partitioned by the SHARD column
 * (prefix sum per shard) — shards are the unit of parallelism exactly
 * as in the on-disk layout, so no global ordering and no single-task
 * window. Never call this with a constant shard column on a large
 * corpus: that is a single-partition window by construction.
 */
object Packing {

  /** Assign each row its bin = floor(tokens_before / budget) and
    * bin_offset = tokens_before % budget, where tokens_before is the
    * prefix sum of `tokensCol` over ascending `orderCol` within
    * `shardCol` (exclusive of the row itself). */
  def packByBudget(df: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val before = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.withColumn("tokens_before", before)
      .withColumn("bin", floor(col("tokens_before") / budget).cast("long"))
      .withColumn("bin_offset", pmod(col("tokens_before"), lit(budget)))
  }
}
