package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`Array[Float]`):
 *
 *  - brute-force cosine top-k — the exact baseline; a single
 *    narrow map over the corpus, then a k-row ordered take;
 *  - persisted IVF-flat index — the scale path: the corpus is
 *    assigned ONCE to nearest-centroid buckets and written
 *    bucket-partitioned; a query reads only its `nprobe` partitions;
 *  - persisted SRP-LSH (random hyperplane) index — same
 *    build-once/probe-partitions shape with Hamming-1 multi-probe.
 *
 * Both index builds are one narrow map pass over the corpus (no
 * shuffle beyond the partitioned write), and both query paths are
 * partition-pruned scans + an exact cosine re-rank — never a full
 * corpus pass per query (the round-2 one-shot forms recomputed the
 * whole assignment per query; SimilarityIndexSpec pins the pruning).
 *
 * The dot product folds in left-to-right element order with double
 * accumulation — deterministic at any parallelism and bit-identical
 * to the DuckDB oracles' `list_reduce` mirror.
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

  // ------------------------------------------------------------------
  // Driver-side probe arithmetic: the SAME left-fold double dot the
  // executors (and the oracle) use, so probe selection is
  // engine-independent.
  // ------------------------------------------------------------------
  private def dotD(a: Array[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def normD(a: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  // ==================================================================
  // Persisted IVF-flat index
  // ==================================================================

  def ivfCentroidsDir(dir: String): String = s"$dir/centroids"
  def ivfAssignedDir(dir: String): String = s"$dir/assigned"

  /**
   * Build a persisted IVF-flat index under `outDir`:
   *
   *  - `centroids/` — `numCentroids` rows `(cid, cv)`, a fixed-size
   *    deterministic pseudo-random sample of the corpus (hash-ordered
   *    by `(id · 2654435761) mod P`, ties by id — SQL-mirrorable, and
   *    independent of corpus size: the round-2 every-`step`-th-id rule
   *    grew the centroid count, and the per-centroid literal
   *    expression tree, linearly with the corpus). `kmeansIters > 0`
   *    refines them with spherical Lloyd iterations.
   *  - `assigned/` — the full corpus as `(id, v)` written
   *    `partitionBy(bucket)` where bucket = argmax-cosine centroid id
   *    (ties → lowest cid), computed by the native
   *    [[graft.functions.ArgMaxCosExpr]] (one codegen'd loop; the
   *    centroid matrix ships as plan data, not literal sub-trees).
   *
   * One narrow map pass over the corpus; queries then read `nprobe`
   * bucket partitions — never the full corpus.
   */
  def ivfBuild(df: DataFrame, idCol: String, vecCol: String, outDir: String,
               numCentroids: Int = 64, kmeansIters: Int = 0): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val sampled: Array[(Long, Seq[Float])] =
      df.select(col(idCol).cast("long").as("cid"), col(vecCol).as("cv"))
        .orderBy(pmod(col("cid") * lit(2654435761L), lit(Hashing.P)).asc,
          col("cid").asc)
        .limit(numCentroids)
        .as[(Long, Seq[Float])].collect().sortBy(_._1)
    require(sampled.nonEmpty, "ivfBuild: empty corpus")

    // Optional spherical k-means refinement (Lloyd iterations): assign
    // to argmax-cosine centroid, recenter each centroid on the MEAN of
    // its bucket (cosine is scale-invariant in the centroid, so the
    // unnormalized mean maximizes Σ cos for a fixed assignment — the
    // objective is monotone non-decreasing per iteration,
    // SimilarityIndexSpec pins it). Each iteration is one narrow
    // assignment map + one (bucket, pos)-grouped aggregation; the
    // k·dim partial sums collected to the driver are tiny. Empty
    // buckets keep their previous centroid. kmeansIters = 0 keeps the
    // raw sample — the gate path, mirrored exactly by the DuckDB
    // oracle (k-means centroids are training artifacts an external
    // engine reproduces from the PERSISTED centroids table instead).
    var matrix = sampled.map(_._2.toArray)
    val cids: Seq[Long] =
      if (kmeansIters == 0) sampled.map(_._1).toSeq
      else {
        for (_ <- 1 to kmeansIters) {
          val sums = df
            .select(graft.functions.ArgMaxCosExpr(col(vecCol), matrix).as("b"),
              posexplode(col(vecCol)).as(Seq("pos", "x")))
            .groupBy("b", "pos")
            .agg(sum(col("x").cast("double")).as("sx"), count(lit(1)).as("n"))
            .as[(Int, Int, Double, Long)].collect()
          val next = matrix.map(_.clone())
          sums.groupBy(_._1).foreach { case (b, rows) =>
            val dim = matrix(b).length
            val c = new Array[Float](dim)
            rows.foreach { case (_, pos, sx, n) => c(pos) = (sx / n).toFloat }
            next(b) = c
          }
          matrix = next
        }
        matrix.indices.map(_.toLong)
      }
    cids.zip(matrix.map(_.toSeq)).toDF("cid", "cv").coalesce(1)
      .write.mode("overwrite").parquet(ivfCentroidsDir(outDir))

    // repartition on the bucket before the partitioned write: without
    // it every write task emits a file into every bucket directory
    // (tasks × buckets small files at scale); clustered, each bucket's
    // rows land in few files
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("bucket", element_at(typedLit(cids),
        graft.functions.ArgMaxCosExpr(col("v"), matrix) + 1))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(ivfAssignedDir(outDir))
  }

  /**
   * Incrementally maintain a persisted IVF index: upsert changed/new
   * vectors and delete removed ids, rewriting ONLY the touched bucket
   * partitions (dynamic partition overwrite — the IVF analog of the
   * fulltext index's touched-segment overlays). Centroids stay fixed
   * from the initial build (standard IVF practice: assignment is
   * deterministic given centroids, so an upserted index equals a full
   * re-assignment of the final corpus — IvfUpsertSpec pins the
   * equality; re-train centroids by rebuilding when drift warrants).
   *
   * Scale shape: the new rows' assignment is one narrow map; the
   * rewrite reads only the touched buckets (partition-pruned), not the
   * corpus.
   */
  def ivfUpsert(upserts: DataFrame, idCol: String, vecCol: String,
                dir: String, deleteIds: Seq[Long] = Seq.empty): Unit = {
    val spark = upserts.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(ivfCentroidsDir(dir))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val cids = cents.map(_._1).toSeq
    val matrix = cents.map(_._2.toArray)
    val assigned = upserts
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("bucket", element_at(typedLit(cids),
        graft.functions.ArgMaxCosExpr(col("v"), matrix) + 1))
    upsertAssigned(spark, dir, ivfAssignedDir(dir), assigned, deleteIds)
  }

  /** [[ivfUpsert]] for the SRP index: same touched-bucket-only merge,
    * bucket = the persisted plane count's hyperplane hash. */
  def annUpsert(upserts: DataFrame, idCol: String, vecCol: String,
                dir: String, deleteIds: Seq[Long] = Seq.empty): Unit = {
    val spark = upserts.sparkSession
    import spark.implicits._
    val planes = spark.read.parquet(annMetaDir(dir)).as[Int].head()
    val assigned = upserts
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
    upsertAssigned(spark, dir, annAssignedDir(dir), assigned, deleteIds)
  }

  /** Merge freshly-assigned rows (id, v, bucket) + deletions into a
    * bucket-partitioned assignment table, rewriting only the touched
    * bucket partitions (staged dynamic partition overwrite). */
  private def upsertAssigned(spark: SparkSession, dir: String,
                             assignedDir: String, assigned: DataFrame,
                             deleteIds: Seq[Long]): Unit = {
    import spark.implicits._
    // touched buckets: where upserted rows now land, plus wherever the
    // upserted/deleted ids lived before (an update can MOVE a vector
    // across buckets; its old copy must go)
    val movedIds = assigned.select("id").as[Long].collect() ++ deleteIds
    val old = spark.read.parquet(assignedDir)
    val oldHomes = old.filter(col("id").isInCollection(movedIds))
      .select("bucket").distinct().as[Long].collect()
    val newHomes = assigned.select("bucket").distinct().as[Long].collect()
    val touched = (oldHomes ++ newHomes).distinct.toSeq
    if (touched.isEmpty) return

    val merged = old
      .filter(col("bucket").isInCollection(touched)) // partition-pruned read
      .filter(!col("id").isInCollection(movedIds))   // drop stale copies
      .select("id", "v", "bucket")
      .unionByName(assigned.select("id", "v", "bucket"))

    // stage the merged touched-bucket rows OUT of the table first: the
    // overwrite cannot read the path it rewrites (and a lazy re-read
    // after the write would see the new state)
    val tmp = s"$dir/_tmp_upsert"
    merged.repartition(col("bucket"))
      .write.mode("overwrite").parquet(tmp)
    val staged = spark.read.parquet(tmp)
    val remaining = staged.select("bucket").distinct().as[Long].collect().toSet

    val sess = spark.newSession() // isolated conf for the dynamic overwrite
    sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    sess.read.parquet(tmp)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(assignedDir)

    // dynamic overwrite only rewrites partitions PRESENT in the output:
    // a touched bucket left with zero rows (every vector deleted or
    // moved away) must be cleared explicitly or its stale copies keep
    // serving — the same ghost-rows mode the fulltext builder's
    // zero-posting rebuild fix closed
    touched.filterNot(remaining).foreach { b =>
      graft.store.Manifest.deleteRecursively(
        java.nio.file.Paths.get(assignedDir, s"bucket=$b"))
    }
    graft.store.Manifest.deleteRecursively(java.nio.file.Paths.get(tmp))
  }

  /** Query a persisted IVF index: probe the `nprobe` centroid lists
    * nearest to the query (partition-pruned read of the assigned
    * table), exact cosine re-rank inside. Returns (id, cosine),
    * tie-break (cosine desc, id asc). */
  def ivfQuery(spark: SparkSession, dir: String, query: Array[Float],
               k: Int, nprobe: Int = 3): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(ivfCentroidsDir(dir))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val qn = normD(query.toSeq)
    // contract: vectors are nonzero (cosine of a zero vector is NaN in
    // any engine); defensively rank NaN last so a degenerate centroid
    // can never enter the probe set
    val probes = cents.map { case (cid, cv) =>
      val s = dotD(query, cv) / (normD(cv) * qn)
      (cid, if (s.isNaN) Double.NegativeInfinity else s)
    }.sortBy { case (cid, s) => (-s, cid) }.take(nprobe).map(_._1)

    val q = typedLit(query.toSeq)
    spark.read.parquet(ivfAssignedDir(dir))
      .filter(col("bucket").isInCollection(probes))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }

  // ==================================================================
  // Persisted SRP-LSH (random hyperplane) index
  // ==================================================================

  def annAssignedDir(dir: String): String = s"$dir/assigned"
  def annMetaDir(dir: String): String = s"$dir/meta"

  /** Build a persisted SRP-LSH index: the corpus as `(id, v)` written
    * `partitionBy(bucket)` with bucket = [[hyperplaneBucket]] (plane
    * count persisted in `meta/`). One narrow map pass. */
  def annBuild(df: DataFrame, idCol: String, vecCol: String, outDir: String,
               planes: Int = 12): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    Seq(planes).toDF("planes").coalesce(1)
      .write.mode("overwrite").parquet(annMetaDir(outDir))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes))
      .repartition(col("bucket")) // cluster the partitioned write (see ivfBuild)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(annAssignedDir(outDir))
  }

  /** Query a persisted SRP index: the query's bucket plus all buckets
    * at Hamming distance 1 are probed (partition-pruned read), exact
    * cosine re-rank inside. Recall is approximate by construction —
    * [[bruteForceTopK]] is the exactness baseline. */
  def annQuery(spark: SparkSession, dir: String, query: Array[Float],
               k: Int): DataFrame = {
    import spark.implicits._
    val planes = spark.read.parquet(annMetaDir(dir)).as[Int].head()
    // query bucket via the same declarative expression over a 1-row
    // frame — identical arithmetic to the build (and the oracle)
    val qdf = Seq(query.toSeq).toDF("v")
    val qBucket = qdf.select(hyperplaneBucket(col("v"), planes)).head().getLong(0)
    val probes = qBucket +: (0 until planes).map(j => qBucket ^ (1L << j))
    val q = typedLit(query.toSeq)
    spark.read.parquet(annAssignedDir(dir))
      .filter(col("bucket").isInCollection(probes))
      .select(col("id"), cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
  }
}
