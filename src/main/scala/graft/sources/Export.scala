package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Terminal export sink: deterministic sharded parquet (the training-
 * shard endpoint of a data pipeline — the reference's terminal "send"
 * steps generalized to files, `SendToSolrCloudProcessor`'s batch-and-
 * flush shape without the server). Shard assignment is an EXPLICIT
 * arithmetic key (id mod nShards), never `repartitionByRange`'s
 * sampled boundaries and never `rand()` — so the same corpus exports
 * the same shards at any parallelism, on any engine, across retries
 * (the same stability contract as [[graft.operators.Sampling]]).
 *
 * Scale shape: one narrow projection + a dynamic-partition parquet
 * write; no shuffle is required for correctness (rows can land in a
 * shard directory from any task), and readers prune by shard
 * directory. At 100 TB, shard count is the parallelism knob for the
 * downstream trainer, not for this write.
 */
object Export {

  /** Write `df` as parquet partitioned by `shard = idCol mod nShards`
    * under `outDir` (overwrite), then read it back — the returned
    * frame is what a downstream consumer sees, so callers can verify
    * round-trip fidelity directly. */
  def exportShards(df: DataFrame, idCol: String, outDir: String,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("shard", pmod(col(idCol).cast("long"), lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
  }
}
