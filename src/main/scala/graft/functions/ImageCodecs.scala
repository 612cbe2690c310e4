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

  /** Row stride: pixel bytes padded up to a 4-byte boundary. Callers must
    * reject widths where `width*3+3` would overflow Int ([[strideOverflows]])
    * before using this — a wrapped-negative stride turns downstream Long
    * bounds checks into no-ops. */
  def stride(width: Int): Int = (width * 3 + 3) & ~3

  /** True when [[stride]] would wrap negative (w ≥ 715,827,883). */
  def strideOverflows(width: Int): Boolean = width.toLong * 3 + 3 > Int.MaxValue

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
    // a crafted header with w ≥ 715,827,883 would wrap stride negative and
    // defeat the Long bounds check below — reject implausible widths first
    if (strideOverflows(w)) return None
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

/** [EXT] — a REAL compressed-format decode, still zero-dependency: a
  * from-scratch PNG reader for 8-bit truecolor (color type 2,
  * non-interlaced) images. Exercises the full stack a native codec
  * adapter owns — chunk framing with CRC-32 validation (`java.util.zip
  * .CRC32`), zlib inflation of the IDAT stream (`java.util.zip.Inflater`
  * — DEFLATE is the real compression, not a stand-in), and all five
  * scanline filters (None/Sub/Up/Average/Paeth) reconstructed with the
  * spec's byte arithmetic. Emits the same position-pinning feature struct
  * as [[Bmp]] (PNG stores rows top-down, so a sign error in the filter
  * reconstruction — not row order — is what `wsum_r` catches here).
  * Format per the public PNG specification (RFC 2083 / ISO 15948). */
object Png {
  private val Sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Parse an 8-bit truecolor non-interlaced PNG; None on anything else
    * (bad signature, chunk CRC mismatch, other color type / depth,
    * truncated or over-long inflated stream) — the p1c malformed-row
    * contract. */
  def decode(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null || bytes.length < 8 + 25 + 12) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Sig(i)) return None; i += 1 }
    var off = 8
    var w = 0; var h = 0; var seenIhdr = false; var seenEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32()
    while (!seenEnd) {
      if (off + 12 > bytes.length) return None
      val len = be32(bytes, off)
      // bounds math in Long: len near 2^31 would wrap `off + 12 + len`
      // negative in Int and pass, then crc.update throws out-of-bounds
      if (len < 0 || off.toLong + 12 + len > bytes.length) return None
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      crc.reset(); crc.update(bytes, off + 4, 4 + len)
      if (crc.getValue != (be32(bytes, off + 8 + len).toLong & 0xFFFFFFFFL))
        return None // corrupt chunk
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(bytes, off + 8); h = be32(bytes, off + 12)
          val depth = bytes(off + 16) & 0xFF; val color = bytes(off + 17) & 0xFF
          val interlace = bytes(off + 20) & 0xFF
          if (w <= 0 || h <= 0 || depth != 8 || color != 2 || interlace != 0)
            return None
          seenIhdr = true
        case "IDAT" => if (!seenIhdr) return None else idat.write(bytes, off + 8, len)
        case "IEND" => seenEnd = true
        case _ => () // ancillary chunks skipped (CRC still validated)
      }
      off += 12 + len
    }
    if (!seenIhdr) return None
    // validate the decode buffer size in Long BEFORE allocating: a ~60-byte
    // payload with a valid CRC can otherwise demand a multi-GB array (or
    // overflow rowBytes*h into a NegativeArraySizeException). DEFLATE can
    // expand at most ~1032:1, so the raw scanline stream cannot usefully
    // exceed that ratio of the IDAT bytes actually present.
    val rawLen = (1L + 3L * w) * h
    val maxInflated = idat.size().toLong * 1032 + 64
    if (rawLen > Int.MaxValue || rawLen > maxInflated) return None
    val rowBytes = 1 + 3 * w
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        // n == 0 while unfinished means truncated input OR a preset-
        // dictionary demand (FDICT) — PNG forbids the latter; treating
        // both as malformed also keeps this loop provably terminating
        if (n == 0) return None
        got += n
      }
      if (got != raw.length || inf.inflate(new Array[Byte](1)) != 0)
        return None // short or over-long pixel stream
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // reconstruct scanlines in place: cur[k] += f(left, up, upleft) mod 256
    var sumR, sumG, sumB, wsumR, firstR = 0L
    var y = 0
    while (y < h) {
      val ro = y * rowBytes
      val filter = raw(ro) & 0xFF
      if (filter > 4) return None
      var k = 0
      while (k < 3 * w) {
        val x = raw(ro + 1 + k) & 0xFF
        val a = if (k >= 3) raw(ro + 1 + k - 3) & 0xFF else 0
        val b = if (y > 0) raw(ro + 1 + k - rowBytes) & 0xFF else 0
        val c = if (y > 0 && k >= 3) raw(ro + 1 + k - rowBytes - 3) & 0xFF else 0
        val v = filter match {
          case 0 => x
          case 1 => (x + a) & 0xFF
          case 2 => (x + b) & 0xFF
          case 3 => (x + (a + b) / 2) & 0xFF
          case 4 => (x + paeth(a, b, c)) & 0xFF
        }
        raw(ro + 1 + k) = v.toByte
        k += 1
      }
      var px = 0
      while (px < w) {
        val o = ro + 1 + px * 3
        val r = raw(o) & 0xFF; val g = raw(o + 1) & 0xFF; val bb = raw(o + 2) & 0xFF
        val idx = y.toLong * w + px
        sumR += r; sumG += g; sumB += bb; wsumR += idx * r
        if (idx == 0L) firstR = r
        px += 1
      }
      y += 1
    }
    Some(Row(w.toLong, h.toLong, w.toLong * h, sumR, sumG, sumB, wsumR, firstR))
  }
}

/** Deterministic PNG synthesis: same closed-form pixel functions as
  * [[BmpSynth]] (`R(i) = (7·id + 3·i) mod 256` etc. over top-down
  * row-major i) at `width = id mod 56 + 8`, `height = id mod 40 + 8`,
  * but encoded for real — row `y` is written with filter type `y mod 5`,
  * so every inverse filter in [[Png.decode]] is exercised on every image
  * taller than 4 rows, and the scanline stream is DEFLATE-compressed with
  * `java.util.zip.Deflater` (the decoder inflates real zlib output, not a
  * fixture's). */
object PngSynth {
  def width(id: Long): Int = (id % 56 + 8).toInt
  def height(id: Long): Int = (id % 40 + 8).toInt

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    val t = typ.getBytes("US-ASCII")
    out.write(be32(data.length), 0, 4)
    out.write(t, 0, 4); out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    out.write(be32(crc.getValue), 0, 4)
  }

  def render(id: Long): Array[Byte] = {
    val w = width(id); val h = height(id)
    val rowBytes = 1 + 3 * w
    val raw = new Array[Byte](rowBytes * h)     // reconstructed scanlines
    val filt = new Array[Byte](rowBytes * h)    // filtered (encoded) form
    var y = 0
    while (y < h) {
      val ro = y * rowBytes
      var px = 0
      while (px < w) {
        val i = y.toLong * w + px
        val o = ro + 1 + px * 3
        raw(o) = ((7 * id + 3 * i) % 256).toByte
        raw(o + 1) = ((11 * id + 5 * i) % 256).toByte
        raw(o + 2) = ((13 * id + 7 * i) % 256).toByte
        px += 1
      }
      val f = y % 5
      filt(ro) = f.toByte
      var k = 0
      while (k < 3 * w) {
        val x = raw(ro + 1 + k) & 0xFF
        val a = if (k >= 3) raw(ro + 1 + k - 3) & 0xFF else 0
        val b = if (y > 0) raw(ro + 1 + k - rowBytes) & 0xFF else 0
        val c = if (y > 0 && k >= 3) raw(ro + 1 + k - rowBytes - 3) & 0xFF else 0
        val v = f match {
          case 0 => x
          case 1 => (x - a) & 0xFF
          case 2 => (x - b) & 0xFF
          case 3 => (x - (a + b) / 2) & 0xFF
          case 4 => (x - paeth(a, b, c)) & 0xFF
        }
        filt(ro + 1 + k) = v.toByte
        k += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(filt); deflater.finish()
    val zs = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zs.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), 0, 8)
    val ihdr = new Array[Byte](13)
    def put32(o: Int, v: Int): Unit = {
      ihdr(o) = ((v >> 24) & 0xFF).toByte; ihdr(o + 1) = ((v >> 16) & 0xFF).toByte
      ihdr(o + 2) = ((v >> 8) & 0xFF).toByte; ihdr(o + 3) = (v & 0xFF).toByte
    }
    put32(0, w); put32(4, h)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", zs.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

/** Batched adapter around the real [[Png.decode]] — identical drop-in
  * shape to [[BmpPixelCodec]]. */
final case class PngPixelCodec(batchSize: Int = 256) extends BinaryCodec {
  def this() = this(256)
  val featureSchema: StructType = Bmp.FeatureSchema
  private val nullRow = Row(null, null, null, null, null, null, null, null)
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          // defense-in-depth: decode validates its input, but one hostile
          // payload must degrade to the null struct, never kill the task
          val feat =
            try Png.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
            catch { case scala.util.control.NonFatal(_) => nullRow }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
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
          val feat =
            try Bmp.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
            catch { case scala.util.control.NonFatal(_) => nullRow }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
