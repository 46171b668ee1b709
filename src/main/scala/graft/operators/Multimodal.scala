package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns for training-data pipelines: image/audio/video
 * payloads are opaque `binary` columns with a typed metadata struct;
 * decode / feature-extract / resize / frame-sample run as
 * `mapPartitions` over Arrow-sized batches of rows.
 *
 * The REAL media codecs are not available in this environment, so the
 * decode kernel is a clearly-marked deterministic stand-in
 * ([[fakeDecode]]) — everything around it (schema contract, batch
 * shape, partitioning, null/corrupt handling, feature vector layout)
 * is the production plumbing and is what the tests pin down. Swapping
 * in a JNI/FFmpeg/ImageIO kernel changes ONE function.
 *
 * Scale shape: all kernels are per-partition streaming (no
 * collect, no per-row JVM↔native chatter assumed); payload bytes stay
 * in the executor; a 100 TB corpus partitions by file/row-group like
 * any other binary column.
 */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("format", StringType),       // container/codec tag
    StructField("width", IntegerType),       // image/video
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType), // audio
    StructField("duration_ms", LongType)))   // audio/video

  /** Wrap raw bytes + caller-known metadata into the standard media
    * column pair (payload: binary, meta: MediaMetaType). */
  def asMediaColumns(df: DataFrame, bytesCol: String, mediaType: String,
                     format: String): DataFrame =
    df.withColumn("media_meta", struct(
      lit(mediaType).as("media_type"), lit(format).as("format"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(IntegerType).as("sample_rate"),
      lit(null).cast(LongType).as("duration_ms")))
      .withColumnRenamed(bytesCol, "payload")

  /**
   * Deterministic decode stand-in: "decodes" a payload into a fixed
   * number of channel statistics derived from the bytes (so tests are
   * exact and parallelism-independent). Production kernel: replace
   * the body with ImageIO/FFmpeg and keep the signature.
   */
  private[operators] def fakeDecode(payload: Array[Byte], nFeatures: Int): Array[Float] = {
    val out = new Array[Float](nFeatures)
    if (payload == null || payload.isEmpty) return out
    // exact integer channel sums, one double division at the end —
    // bit-reproducible by any engine (the DuckDB oracle mirrors it)
    val sums = new Array[Long](nFeatures)
    var i = 0
    while (i < payload.length) {
      sums(i % nFeatures) += (payload(i) & 0xff)
      i += 1
    }
    val per = math.max(1, payload.length / nFeatures)
    var j = 0
    while (j < nFeatures) { out(j) = (sums(j) / 255.0 / per).toFloat; j += 1 }
    out
  }

  /** Decode + feature-extract: payload → fixed-width Float vector.
    * Corrupt/null payloads yield a null vector plus an error tag
    * instead of failing the task (the reference marks ERROR status per
    * doc, `TikaProcessor.java:50-100`). The decode kernel runs as a
    * typed scalar UDF (`binary → struct<features, error>`) — the plan
    * stays a single Project over the scan (no RDD round-trip, no
    * InternalRow↔Row re-encode; Tungsten layout preserved end-to-end;
    * the kernel itself is opaque to codegen, as any native decoder
    * would be). */
  def extractFeatures(df: DataFrame, nFeatures: Int = 16): DataFrame = {
    val decode = udf { payload: Array[Byte] =>
      try {
        if (payload == null) (null: Seq[Float], "null payload")
        else (fakeDecode(payload, nFeatures).toSeq, null: String)
      } catch { case e: Exception => (null: Seq[Float], e.getMessage) }
    }
    df.withColumn("_decoded", decode(col("payload")))
      .withColumn("features", col("_decoded._1"))
      .withColumn("decode_error", col("_decoded._2"))
      .drop("_decoded")
  }

  /** Image resize plan: records the target geometry next to the
    * payload (the genuine pixel work lives in the decode kernel).
    * Keeps aspect ratio like every standard thumbnailer. */
  def resizePlan(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("resize_target",
      struct(lit(maxSide).as("max_side"),
        coalesce(col("media_meta.width"), lit(maxSide)).as("src_width"),
        coalesce(col("media_meta.height"), lit(maxSide)).as("src_height")))

  /** Video frame sampling: one output row per sampled frame index at
    * `everyMs` intervals of the clip duration — the row-explosion
    * pattern a real sampler uses, with the frame payload left to the
    * decode kernel. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_idx", explode(sequence(lit(0L),
        greatest(floor(coalesce(col("media_meta.duration_ms"), lit(0L)) / lit(everyMs)).cast("long"), lit(0L)))))
      .withColumn("frame_ts_ms", col("frame_idx") * lit(everyMs))

  /** Build a demo media table from any table's string column (bytes =
    * UTF-8 of the text) — lets every operator above run and be
    * asserted on the standard test tables without real media. */
  def demoMediaTable(spark: SparkSession, df: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    asMediaColumns(
      df.select(col(idCol).as("media_id"),
        encode(col(textCol), "UTF-8").as("bytes")),
      "bytes", "image", "fake/utf8")
}
