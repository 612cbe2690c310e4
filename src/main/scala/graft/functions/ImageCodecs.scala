package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** [EXT] — a REAL image decode behind the pluggable [[BinaryCodec]] seam:
  * a from-scratch 24-bit uncompressed BMP parser (pure JVM, zero external
  * dependencies), replacing the byte-probe stand-in for the one format a
  * container without media libraries can still decode honestly. The format
  * (`BITMAPFILEHEADER` + `BITMAPINFOHEADER`, BGR pixel rows stored
  * bottom-up, each row zero-padded to a 4-byte boundary) is public and
  * stable; parsing it exercises everything a native codec adapter must get
  * right — header validation, stride/padding math, row-order flip — while
  * emitting *pixel-derived* features (channel sums, a position-weighted
  * sum, the top-left pixel) that an oracle can state in closed form when
  * the pixels are synthesized deterministically ([[BmpSynth]]).
  *
  * Mirrors the reference's pluggable body-deserializer seam
  * (`/root/reference/src/main/scala/org/apache/flume/sink/hive/batch/serde/TextDeserializer.scala:44-68`)
  * with media bytes instead of text lines.
  */
object Bmp {
  /** Features a real decode yields: dimensions plus order-sensitive pixel
    * statistics. `wsum_r` (Σ i·R(i) over top-down row-major index i) and
    * `first_r` (R of the top-left pixel) pin the bottom-up row flip and
    * the stride math — channel sums alone would pass on a vertically
    * flipped or padding-shifted read. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("wsum_r", LongType), StructField("first_r", LongType)))

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Row stride: pixel bytes padded up to a 4-byte boundary. */
  def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** Parse a 24bpp uncompressed BMP; None on anything that is not one
    * (wrong magic, truncated, other bpp/compression) — the adapter maps
    * that to a null feature struct, the same contract as the serde's
    * malformed-row classification (p1c). */
  def decode(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = i32(bytes, 10)
    val w = i32(bytes, 18)
    val h = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    if (w <= 0 || h <= 0 || bpp != 24 || compression != 0) return None
    val st = stride(w)
    if (dataOffset < 54 || dataOffset.toLong + st.toLong * h > bytes.length)
      return None
    var sumR, sumG, sumB, wsumR = 0L
    var firstR = 0L
    var y = 0
    while (y < h) {
      // logical row y (top-down) is stored as row (h-1-y) from the data
      // offset (bottom-up storage)
      val rowOff = dataOffset + (h - 1 - y) * st
      var x = 0
      while (x < w) {
        val o = rowOff + x * 3
        val b = bytes(o) & 0xFF
        val g = bytes(o + 1) & 0xFF
        val r = bytes(o + 2) & 0xFF
        val i = y.toLong * w + x
        sumR += r; sumG += g; sumB += b
        wsumR += i * r
        if (i == 0L) firstR = r
        x += 1
      }
      y += 1
    }
    Some(Row(w.toLong, h.toLong, w.toLong * h,
      sumR, sumG, sumB, wsumR, firstR))
  }
}

/** Deterministic BMP synthesis for the fixture corpus: dimensions and every
  * pixel are closed-form functions of the id, so a SQL oracle can state
  * the decoded statistics without any image library —
  * `R(i) = (7·id + 3·i) mod 256`, `G(i) = (11·id + 5·i) mod 256`,
  * `B(i) = (13·id + 7·i) mod 256` over the top-down row-major pixel index
  * `i`, at `width = id mod 64 + 8` (odd widths exercise row padding) and
  * `height = id mod 48 + 8`. */
object BmpSynth {
  def width(id: Long): Int = (id % 64 + 8).toInt
  def height(id: Long): Int = (id % 48 + 8).toInt

  def render(id: Long): Array[Byte] = {
    val w = width(id); val h = height(id)
    val st = Bmp.stride(w)
    val size = 54 + st * h
    val out = new Array[Byte](size) // zero-filled → padding bytes are 0
    def put16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
    }
    def put32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      out(o + 2) = ((v >> 16) & 0xFF).toByte; out(o + 3) = ((v >> 24) & 0xFF).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, size); put32(10, 54)        // file size, pixel-data offset
    put32(14, 40)                        // BITMAPINFOHEADER size
    put32(18, w); put32(22, h)           // positive height → bottom-up
    put16(26, 1); put16(28, 24)          // planes, bpp
    put32(30, 0); put32(34, st * h)      // BI_RGB, image size
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * st
      var x = 0
      while (x < w) {
        val i = y.toLong * w + x
        val o = rowOff + x * 3
        out(o) = ((13 * id + 7 * i) % 256).toByte     // B
        out(o + 1) = ((11 * id + 5 * i) % 256).toByte // G
        out(o + 2) = ((7 * id + 3 * i) % 256).toByte  // R
        x += 1
      }
      y += 1
    }
    out
  }
}

/** The batched `mapPartitions` adapter ([[BatchedByteProbeCodec]]'s shape)
  * around the real [[Bmp.decode]]: payloads are handed to the parser in
  * bounded batches, null/non-BMP payloads yield a null feature struct. */
final case class BmpPixelCodec(batchSize: Int = 256) extends BinaryCodec {
  def this() = this(256)
  val featureSchema: StructType = Bmp.FeatureSchema
  private val nullRow = Row(null, null, null, null, null, null, null, null)
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val feat = Bmp.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
