package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** [EXT] — a REAL audio decode behind the pluggable [[BinaryCodec]] seam:
  * a from-scratch RIFF/WAVE PCM parser (pure JVM, zero dependencies),
  * completing the multimodal triad next to the BMP (x11c) and PNG (x11d)
  * image decoders. The format (RIFF container, `fmt ` chunk describing
  * PCM encoding, `data` chunk of little-endian signed 16-bit samples) is
  * public and stable; parsing it exercises the chunk-walking,
  * format-validation and sample-extraction work any audio ingestion
  * adapter owns, and emits *sample-derived* features (sum, energy, a
  * position-weighted sum, the first sample) an oracle can state in closed
  * form when the waveform is synthesized deterministically
  * ([[WavSynth]]).
  *
  * Mirrors the reference's pluggable body-deserializer seam
  * (`/root/reference/src/main/scala/org/apache/flume/sink/hive/batch/serde/TextDeserializer.scala:44-68`)
  * with audio bytes instead of text lines.
  */
object Wav {
  /** `wsum_s` (Σ t·s(t)) and `first_s` pin sample order and byte
    * endianness — `sum_s` alone would pass on a byte-swapped read whose
    * errors cancel. `sum_sq` is the (un-normalized) energy every
    * loudness/VAD filter starts from. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType), StructField("sample_rate", LongType),
    StructField("sum_s", LongType), StructField("sum_sq", LongType),
    StructField("wsum_s", LongType), StructField("first_s", LongType)))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse a mono 16-bit PCM WAV; None on anything else (wrong container
    * magic, non-PCM encoding, other widths/channel counts, truncated
    * chunks) — the p1c malformed-row contract. */
  def decode(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var sampleRate = 0L; var fmtOk = false
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (!fmtOk || dataOff < 0)) {
      val ct = tag(bytes, off); val len = i32(bytes, off + 4)
      // bounds math in Long: len near 2^31 would wrap the Int sum negative,
      // pass the check, and let `off += 8 + len` walk to a negative offset
      if (len < 0 || off.toLong + 8 + len > bytes.length) return None
      ct match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = u16(bytes, off + 8)
          val channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12).toLong & 0xFFFFFFFFL
          val bits = u16(bytes, off + 22)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          fmtOk = true
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // ancillary chunks (LIST, fact, ...) skipped
      }
      off += 8 + len + (len & 1) // chunks are word-aligned; odd sizes padded
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return None
    val n = dataLen / 2
    var sumS, sumSq, wsumS, firstS = 0L
    var t = 0
    while (t < n) {
      val o = dataOff + 2 * t
      val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort.toLong
      sumS += s; sumSq += s * s; wsumS += t.toLong * s
      if (t == 0) firstS = s
      t += 1
    }
    Some(Row(n.toLong, sampleRate, sumS, sumSq, wsumS, firstS))
  }
}

/** Deterministic WAV synthesis: length, rate and every sample are
  * closed-form in the id — `s(t) = ((31·id + 17·t) mod 65536) − 32768`
  * over `n = id mod 2000 + 500` samples at
  * `rate = 8000 + (id mod 8)·1000` Hz — so a SQL oracle can state the
  * decoded statistics without any audio library. */
object WavSynth {
  def nSamples(id: Long): Int = (id % 2000 + 500).toInt
  def sampleRate(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  def sample(id: Long, t: Long): Int = ((31 * id + 17 * t) % 65536 - 32768).toInt

  def render(id: Long): Array[Byte] = {
    val n = nSamples(id); val rate = sampleRate(id)
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    def tag(o: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, o, 4)
    }
    tag(0, "RIFF"); put32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); put32(16, 16)
    put16(20, 1); put16(22, 1)           // PCM, mono
    put32(24, rate); put32(28, rate * 2) // sample rate, byte rate
    put16(32, 2); put16(34, 16)          // block align, bits/sample
    tag(36, "data"); put32(40, dataLen)
    var t = 0
    while (t < n) {
      put16(44 + 2 * t, sample(id, t) & 0xFFFF)
      t += 1
    }
    out
  }
}

/** Batched adapter around the real [[Wav.decode]] — identical drop-in
  * shape to [[BmpPixelCodec]]/[[PngPixelCodec]]. */
final case class WavSampleCodec(batchSize: Int = 256) extends BinaryCodec {
  def this() = this(256)
  val featureSchema: StructType = Wav.FeatureSchema
  private val nullRow = Row(null, null, null, null, null, null)
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val feat =
            try Wav.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
            catch { case scala.util.control.NonFatal(_) => nullRow }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
