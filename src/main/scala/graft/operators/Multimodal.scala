package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** M5 — multimodal column plumbing (engine extension).
  *
  * Media (image/audio/video) ride through the engine as opaque `binary`
  * columns plus a typed metadata struct — exactly how the reference treats
  * event bodies (`Event.body: Array[Byte]`,
  * `/root/reference/.../HiveBatchedSink.scala:308` + pluggable serde).
  * The Spark-side plumbing here — schema, batching, partition-friendly
  * derived keys — is real; the actual media decode is STUBBED (this
  * container has no image/audio libs) behind the pluggable
  * [[graft.functions.BinaryCodec]] surface: the default column-expression
  * probe codec stands in for the real thing, and the batched
  * `mapPartitions` adapter ([[graft.functions.BatchedByteProbeCodec]])
  * demonstrates exactly where a native vectorized decode drops in.
  */
object Multimodal {

  /** Synthesize a multimodal table from `documents`: payload = utf-8 bytes
    * of the text (standing in for media bytes), plus typed metadata. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        (col("doc_id") % 640 + 32).cast("int").as("width"),
        (col("doc_id") % 480 + 24).cast("int").as("height"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        col("source")).as("meta"))

  /** X11 — metadata + codec-decoded features, the full multimodal pass:
    * scan → decode → typed features → partitionable output. The decode step
    * is pluggable ([[graft.functions.BinaryCodec]], mirror of the text
    * [[graft.functions.Serde]] surface); the default is the in-container
    * column-expression stub (this container has no media libraries — a
    * real deployment swaps in a `mapPartitions` codec like
    * [[graft.functions.BatchedByteProbeCodec]] demonstrates). */
  def mediaFeatures(spark: SparkSession, sfDir: String,
                    codec: graft.functions.BinaryCodec =
                      graft.functions.ByteProbeCodec): DataFrame =
    codec.decode(mediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("meta.mime").as("mime"),
        col("meta.width").cast("long").as("width"),
        col("meta.height").cast("long").as("height"),
        col("f.n_bytes").as("n_bytes"), col("f.b0").as("b0"), col("f.b4").as("b4"))
      .orderBy(col("media_id"))

  /** X11b — resize planning: target dimensions fitting 224×224 with aspect
    * ratio preserved — the real preprocessing math every image pipeline
    * runs before the (here stubbed) byte-level resample. Pure integer/
    * double column math, fused with the scan. */
  def resizePlan(spark: SparkSession, sfDir: String, fit: Int = 224): DataFrame = {
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    val scale = least(lit(fit.toDouble) / w, lit(fit.toDouble) / h)
    mediaTable(spark, sfDir)
      .select(col("media_id"), w.as("width"), h.as("height"),
        greatest(floor(w * scale), lit(1L)).cast("long").as("out_w"),
        greatest(floor(h * scale), lit(1L)).cast("long").as("out_h"))
      .orderBy(col("media_id"))
  }

  /** Frame sampling plumbing: explode a deterministic frame index per media
    * row (1 frame / 32 bytes) — the generator shape a video pipeline uses,
    * without a real decoder. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    mediaTable(spark, sfDir)
      .select(col("media_id"),
        explode(sequence(lit(0L), (octet_length(col("payload")) / 32).cast("long"))).as("frame_no"))
      .groupBy(col("media_id")).agg(count(lit(1)).as("n_frames"))
      .orderBy(col("media_id"))
}
