package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`), pure
 * `functions._` expressions (whole-stage codegen; no UDFs):
 *
 *  - brute-force cosine top-k — the exact baseline; a single
 *    narrow map over the corpus, then a k-row ordered take;
 *  - random-hyperplane LSH bucketing — the scale path: candidate
 *    generation by shared bucket, exact re-rank within buckets.
 *
 * The dot product folds over `zip_with` in left-to-right element order
 * with double accumulation — deterministic at any parallelism.
 */
object Similarity {

  /** Σ a_i·b_i with double accumulation (deterministic fold order).
    * Native codegen'd loop ([[graft.functions.DotExpr]]); [[dotDecl]]
    * is the declarative reference form it must match bit-for-bit
    * (DotExprSpec pins the equivalence; every cosine oracle proves it
    * cross-engine). */
  def dot(a: Column, b: Column): Column = graft.functions.DotExpr(a, b)

  /** Declarative (pure functions._) reference implementation. */
  def dotDecl(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k by cosine against one query vector.
    * Returns (rank, id, cosine). Tie-break: cosine desc, id asc. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    df.select(col(idCol).as("id"), cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cosine").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("cosine"))
  }

  /** Deterministic pseudo-random plane component r_{j,i} ∈ [-0.5, 0.5):
    * pure integer arithmetic (multiplicative hash mod P, then a
    * 5-digit mantissa), so an external SQL engine reproduces it
    * bit-for-bit — the DuckDB oracle mirrors this exactly. Overflow-
    * safe under ANSI: (j·100003 + 17 + i·257) < ~1e7, × 2654435761
    * < ~3e16 ≪ 2^63. */
  private[operators] def planeComponent(j: Int, i: Column): Column = {
    val h = pmod((lit(j.toLong * 100003L + 17L) + i.cast("long") * 257L)
      * lit(2654435761L), lit(Hashing.P))
    (pmod(h, lit(100000L)).cast("double") / 100000.0) - 0.5
  }

  /** Random-hyperplane bucket id (Charikar '02 SRP-LSH): bit j = sign
    * of <v, r_j> with deterministic pseudo-random plane r_j derived
    * from (j, dim) by arithmetic — no stored plane matrix, identical
    * on every executor (and in the cross-engine oracle). */
  def hyperplaneBucket(v: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val prods = zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") * planeComponent(j, i))
      val s = aggregate(prods, lit(0.0), (acc, p) => acc + p)
      when(s > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /**
   * ANN top-k via LSH buckets with multi-probe fallback: the query's
   * bucket plus all buckets at Hamming distance 1 are probed (exact
   * cosine re-rank inside). At 1000 executors the probe is a
   * partition-pruned scan of a bucket-partitioned table, not a full
   * corpus pass. Recall is approximate by construction — the
   * brute-force path is the exactness baseline.
   */
  /**
   * IVF-flat ANN: the corpus is assigned to nearest-centroid buckets
   * (an inverted file over vector space); a query probes only the
   * `nprobe` centroid lists nearest to it, with exact cosine re-rank
   * inside. Centroids default to a deterministic data sample (every
   * `centroidStep`-th id — the standard cheap baseline; a k-means
   * refinement would slot into the same assign/probe plumbing).
   *
   * Scale shape: centroids are tiny (collected + inlined as literals,
   * broadcast-free), assignment is ONE narrow map pass, and at scale
   * the assigned table is written bucket-partitioned so a query reads
   * nprobe partitions — never the full corpus. Assignment tie-break is
   * deterministic (earliest/lowest centroid id on equal similarity),
   * and every arithmetic step is oracle-mirrorable in plain SQL.
   */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int,
              centroidStep: Int = 50, nprobe: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents: Array[(Long, Seq[Float])] =
      df.filter(pmod(col(idCol), lit(centroidStep)) === 0)
        .select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
    require(cents.nonEmpty, s"no centroids: no $idCol % $centroidStep == 0 rows")

    // bucket = argmax over centroids of cos(v, c); array_position finds
    // the FIRST max, so ties go to the lowest cid (deterministic,
    // matches the SQL oracle). Built as one similarity ARRAY — a
    // when/otherwise fold would duplicate its accumulator twice per
    // level and blow the expression tree up exponentially in the
    // centroid count.
    val cidsLit = typedLit(cents.map(_._1).toSeq)
    def bucketOf(v: Column): Column = {
      val sims = array(cents.map { case (_, cv) => cosine(v, typedLit(cv)) }: _*)
      val pos = array_position(sims, array_max(sims))
      when(pos > 0, element_at(cidsLit, pos.cast("int"))).otherwise(lit(-1L))
    }

    // probe set: nprobe centroids nearest to the query, computed with
    // the same left-fold double arithmetic the executors (and the
    // oracle) use
    def dotD(a: Array[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def normD(a: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val qn = normD(query.toSeq)
    // contract: vectors are nonzero (cosine of a zero vector is NaN in
    // any engine); defensively rank NaN last so a degenerate centroid
    // can never enter the probe set
    val probes = cents.map { case (cid, cv) =>
      val s = dotD(query, cv) / (normD(cv) * qn)
      (cid, if (s.isNaN) Double.NegativeInfinity else s)
    }.sortBy { case (cid, s) => (-s, cid) }.take(nprobe).map(_._1)

    val q = typedLit(query.toSeq)
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", bucketOf(col("v")))
      .filter(col("bucket").isInCollection(probes))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  def annTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, planes: Int = 12): DataFrame = {
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
    // compute query bucket with the same expression over a 1-row frame
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = Seq(query.toSeq).toDF("v")
    val qBucket = qdf.select(hyperplaneBucket(col("v"), planes)).head().getLong(0)
    val probes = qBucket +: (0 until planes).map(j => qBucket ^ (1L << j))
    val q = typedLit(query.toSeq)
    bucketed.filter(col("bucket").isInCollection(probes))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
