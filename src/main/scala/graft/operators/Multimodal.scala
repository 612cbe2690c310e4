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
  * derived keys — is real, and so are two decodes: the from-scratch
  * 24-bit BMP pixel parser ([[graft.functions.BmpPixelCodec]], x11c —
  * container/stride/row-flip) and the truecolor PNG reader
  * ([[graft.functions.PngPixelCodec]], x11d — CRC-validated chunks, zlib
  * inflation, scanline-filter reconstruction), both behind the same
  * pluggable [[graft.functions.BinaryCodec]] seam a native JNI/ffmpeg
  * codec would use. Formats genuinely needing external libraries (JPEG's
  * DCT entropy coding, audio/video containers) remain represented by the
  * column-expression probe codec and the batched `mapPartitions` adapter
  * ([[graft.functions.BatchedByteProbeCodec]]), which demonstrate the
  * identical drop-in shape.
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

  /** Synthesize a REAL image table: one valid 24-bit BMP per document, with
    * dimensions and pixel values closed-form in `doc_id`
    * ([[graft.functions.BmpSynth]]) so the decoded statistics are
    * SQL-oracle-checkable. Generated in the batched `mapPartitions` shape —
    * payload synthesis is the fixture side of the codec adapter, not an
    * operator. */
  def bmpMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val base = Tables.documents(spark, sfDir).select(col("doc_id").as("media_id"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType))))
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, graft.functions.BmpSynth.render(id))
      }
    }(enc)
  }

  /** X11c — REAL image decode end-to-end: synthesize a BMP per document,
    * parse it back with the from-scratch pixel decoder
    * ([[graft.functions.BmpPixelCodec]] — header validation, stride
    * padding, bottom-up row flip), and emit pixel-derived statistics. The
    * oracle recomputes every value from the closed-form pixel function
    * with a lateral `range(w·h)` join — a wrong stride, a missed row
    * flip, or a mis-read header diverges immediately (`wsum_r` and
    * `first_r` are position-sensitive on purpose). This replaces the
    * byte-probe stub as the [EXT] multimodal capability: the plumbing AND
    * the decode are real; only the *format* is chosen for a
    * zero-dependency container. */
  def imageDecode(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.BmpPixelCodec().decode(bmpMediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("f.width").as("width"),
        col("f.height").as("height"), col("f.n_pixels").as("n_pixels"),
        col("f.sum_r").as("sum_r"), col("f.sum_g").as("sum_g"),
        col("f.sum_b").as("sum_b"), col("f.wsum_r").as("wsum_r"),
        col("f.first_r").as("first_r"))
      .orderBy(col("media_id"))

  /** One valid truecolor PNG per document — real DEFLATE compression and
    * per-row filter rotation ([[graft.functions.PngSynth]]), pixels still
    * closed-form in `doc_id` so the oracle stays SQL-stateable. */
  def pngMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val base = Tables.documents(spark, sfDir).select(col("doc_id").as("media_id"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType))))
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, graft.functions.PngSynth.render(id))
      }
    }(enc)
  }

  /** X11d — REAL compressed-image decode end-to-end: encode a PNG per
    * document (zlib DEFLATE, scanline filters rotating through all five
    * types), decode it back with the from-scratch reader
    * ([[graft.functions.PngPixelCodec]] — CRC-validated chunk framing,
    * `Inflater` decompression, Sub/Up/Average/Paeth reconstruction) and
    * emit the same position-pinning statistics as x11c. Where BMP proved
    * the container/stride plumbing, this proves the *compression* path —
    * the closest a zero-dependency container gets to a production codec:
    * a wrong inverse filter or a mis-framed IDAT stream shifts `wsum_r`
    * immediately while the closed-form oracle stands still. */
  def imageDecodePng(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.PngPixelCodec().decode(pngMediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("f.width").as("width"),
        col("f.height").as("height"), col("f.n_pixels").as("n_pixels"),
        col("f.sum_r").as("sum_r"), col("f.sum_g").as("sum_g"),
        col("f.sum_b").as("sum_b"), col("f.wsum_r").as("wsum_r"),
        col("f.first_r").as("first_r"))
      .orderBy(col("media_id"))

  /** One valid baseline JPEG per document — a REAL encode (FDCT, Annex-K
    * quantization, canonical Huffman entropy coding), per-8×8-block
    * constant pixels so the LOSSY round trip stays closed-form
    * ([[graft.functions.JpegSynth]]). */
  def jpegMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val base = Tables.documents(spark, sfDir).select(col("doc_id").as("media_id"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType))))
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, graft.functions.JpegSynth.render(id))
      }
    }(enc)
  }

  /** X11f — ENTROPY-CODED image decode end-to-end: encode a baseline JPEG
    * per document and decode it back with the from-scratch reader
    * ([[graft.functions.JpegGrayCodec]] — DHT-built canonical Huffman
    * tables, bit-level entropy decode with byte-unstuffing, DC DPCM,
    * zigzag dequantization, 2-D IDCT). The codec ladder's last rung: BMP
    * proved container plumbing, PNG lossless compression, WAV/AVI chunk
    * walks — JPEG is the *lossy, entropy-coded* format, and the
    * per-block-constant synthesis makes even its loss closed-form (the
    * Annex-K DC quantizer divides the DC scale), so a SQL oracle
    * hash-checks a genuinely lossy decode. */
  def imageDecodeJpeg(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.JpegGrayCodec().decode(jpegMediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("f.width").as("width"),
        col("f.height").as("height"), col("f.n_pixels").as("n_pixels"),
        col("f.sum_g").as("sum_g"), col("f.wsum_g").as("wsum_g"),
        col("f.first_g").as("first_g"))
      .orderBy(col("media_id"))

  /** One valid mono 16-bit PCM WAV per document, waveform closed-form in
    * `doc_id` ([[graft.functions.WavSynth]]). */
  def wavMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val base = Tables.documents(spark, sfDir).select(col("doc_id").as("media_id"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType))))
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, graft.functions.WavSynth.render(id))
      }
    }(enc)
  }

  /** X11e — REAL audio decode end-to-end, completing the multimodal triad:
    * synthesize a RIFF/WAVE PCM file per document, parse it back with the
    * from-scratch reader ([[graft.functions.WavSampleCodec]] — chunk walk,
    * format validation, little-endian signed-16 sample extraction) and
    * emit sample statistics (sum, energy, position-weighted sum) that the
    * closed-form oracle recomputes exactly. `wsum_s`/`first_s` pin sample
    * order and endianness the way `wsum_r`/`first_r` pin row order for
    * images. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.WavSampleCodec().decode(wavMediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("f.n_samples").as("n_samples"),
        col("f.sample_rate").as("sample_rate"), col("f.sum_s").as("sum_s"),
        col("f.sum_sq").as("sum_sq"), col("f.wsum_s").as("wsum_s"),
        col("f.first_s").as("first_s"))
      .orderBy(col("media_id"))

  /** One valid AVI (uncompressed DIB frames) per document, everything
    * closed-form in `doc_id` ([[graft.functions.AviSynth]]). */
  def aviMediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val base = Tables.documents(spark, sfDir).select(col("doc_id").as("media_id"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType))))
    base.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, graft.functions.AviSynth.render(id))
      }
    }(enc)
  }

  /** X12b — REAL video frame sampling: parse the AVI container's chunk
    * tree ([[graft.functions.AviFrameCodec]] — `avih` header, `movi`
    * frame list), sample every 2nd frame and decode ONLY the sampled DIB
    * frames — the touch-a-subset shape production video ingestion uses,
    * upgrading x12's byte-count stand-in to a container-aware sampler.
    * `wsum_r_sampled` weights each frame's red sum by the FRAME index, so
    * sampling the wrong frames diverges even when per-frame pixel math is
    * right; a frame chunk whose size disagrees with the advertised
    * dimensions rejects the whole payload (p1c contract). */
  def videoFrameSample(spark: SparkSession, sfDir: String): DataFrame =
    graft.functions.AviFrameCodec().decode(aviMediaTable(spark, sfDir), "payload", "f")
      .select(col("media_id"), col("f.n_frames").as("n_frames"),
        col("f.width").as("width"), col("f.height").as("height"),
        col("f.n_sampled").as("n_sampled"),
        col("f.sum_r_sampled").as("sum_r_sampled"),
        col("f.wsum_r_sampled").as("wsum_r_sampled"),
        col("f.first_r").as("first_r"))
      .orderBy(col("media_id"))

  /** X46 — joint multimodal curation: the keep/drop decision a
    * text+image+audio training-pair pipeline actually ships, computed
    * from DECODED features — x8's text quality, the PNG decoder's pixel
    * count, the WAV decoder's per-sample energy (integer division, so the
    * keep flag is bit-stable cross-engine) — joined on the document key.
    * Three per-doc tables equi-join on `doc_id` and share its hash
    * partitioning; nothing here is per-pair or quadratic, so the
    * composition costs three decodes plus two co-partitioned joins at any
    * corpus size. */
  def multimodalCuration(spark: SparkSession, sfDir: String): DataFrame = {
    val img = imageDecodePng(spark, sfDir)
      .select(col("media_id").as("doc_id"), col("n_pixels"))
    val aud = audioDecode(spark, sfDir)
      .select(col("media_id").as("doc_id"),
        expr("sum_sq div n_samples").as("energy_per_sample"))
    val q = TextAnalysis.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality"))
    q.join(img, "doc_id").join(aud, "doc_id")
      .select(col("doc_id"), col("quality"), col("n_pixels"),
        col("energy_per_sample"),
        (col("quality") >= 0.5 && col("n_pixels") >= 400L &&
          col("energy_per_sample") >= 358000000L).as("keep"))
      .orderBy(col("doc_id"))
  }
}
