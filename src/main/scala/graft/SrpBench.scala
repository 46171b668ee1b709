package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused micro-benchmark: the SRP bucket kernel — native fused-loop
  * [[graft.functions.SrpBucketExpr]] vs the declarative per-plane
  * `zip_with`/`aggregate` form it replaced (the annBuild/annUpsert
  * assignment pass). Alternating same-window passes over a
  * deterministic synthetic embedding table isolate the kernel cost
  * from host-load drift; a parity count guards the comparison. */
object SrpBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val planes = args.drop(2).headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic pseudo-random vectors, generated on the fly (the
    // kernel is compute-bound; generation cost is identical across arms)
    val emb = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => (pmod((col("id") * 31L + d.cast("long") * 13L) * 2654435761L,
          lit(101L)).cast("double") / 50.0 - 1.0).cast("float")).as("v"))
      .persist()
    emb.count() // materialize outside the timed region

    def time(tag: String, c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val s = emb.select(c.as("b")).agg(sum("b")).head().getLong(0)
      println(f"$tag: wall=${(System.nanoTime() - t0) / 1e9}%.2f s checksum=$s")
      s
    }
    var ok = true
    for (round <- Seq("warm", "a", "b")) {
      val sn = time(s"native_$round", Similarity.hyperplaneBucket(col("v"), planes))
      val sd = time(s"decl_$round", Similarity.hyperplaneBucketDecl(col("v"), planes))
      ok &= sn == sd
    }
    println(s"parity: ${if (ok) "OK" else "MISMATCH"}")
    spark.stop()
  }
}
