package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** [EXT] — REAL video-container frame sampling behind the pluggable
  * [[BinaryCodec]] seam: a from-scratch AVI (RIFF) reader that walks the
  * container's chunk tree — `LIST hdrl` → `avih` main header, `LIST movi`
  * → `00db` uncompressed DIB frames — and samples every second frame,
  * decoding only the sampled ones. That is the actual shape of video
  * ingestion at scale (parse the container index, touch a subset of
  * frames, never inflate the rest), which x12's byte-probe stand-in could
  * only gesture at. Frames are bottom-up BGR DIBs with 4-byte row
  * padding, so the sampled-frame decode reuses the exact stride/row-flip
  * discipline [[Bmp]] proved. Format per the public AVI/RIFF
  * specification (msdn AVI RIFF form). */
object Avi {
  /** `wsum_r` here weights each sampled frame's red sum by its FRAME
    * index — a sampler that reads the wrong frames (off-by-one, wrong
    * stride between chunks) diverges immediately even when the per-frame
    * pixel math is right. `first_r` is frame 0, pixel (0,0). */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("n_frames", LongType), StructField("width", LongType),
    StructField("height", LongType), StructField("n_sampled", LongType),
    StructField("sum_r_sampled", LongType),
    StructField("wsum_r_sampled", LongType), StructField("first_r", LongType)))

  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Parse an AVI with uncompressed 24bpp DIB frames; sample every 2nd
    * frame (0, 2, 4, …). None on anything that is not one — wrong RIFF
    * form, missing `avih`/`movi`, frame chunk size disagreeing with the
    * advertised dimensions — the p1c malformed-row contract. */
  def decode(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null || bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
    var w = 0; var h = 0; var declaredFrames = -1
    var moviOff = -1; var moviEnd = -1
    // one linear walk of the top-level and LIST chunks we care about;
    // depth-capped so a crafted LIST-in-LIST chain cannot overflow the
    // stack (real AVIs nest hdrl/strl 2-3 deep)
    def walk(off0: Int, end: Int, depth: Int): Unit = {
      if (depth > 16) return
      var off = off0
      while (off + 8 <= end) {
        val ct = tag(bytes, off); val len = i32(bytes, off + 4)
        // Long math: len near 2^31 would wrap the Int sum and pass
        if (len < 0 || off.toLong + 8 + len > end) return
        if (ct == "LIST" && len >= 4) {
          val listType = tag(bytes, off + 8)
          if (listType == "movi") { moviOff = off + 12; moviEnd = off + 8 + len }
          else walk(off + 12, off + 8 + len, depth + 1) // descend into hdrl/strl
        } else if (ct == "avih" && len >= 40) {
          declaredFrames = i32(bytes, off + 8 + 16)
          w = i32(bytes, off + 8 + 32); h = i32(bytes, off + 8 + 36)
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
    }
    walk(12, bytes.length, 0)
    if (w <= 0 || h <= 0 || declaredFrames < 0 || moviOff < 0) return None
    // reject header dims whose stride or frame size would wrap Int — a
    // wrapped-negative frameBytes defeats every later `len != frameBytes`
    if (Bmp.strideOverflows(w)) return None
    val st = Bmp.stride(w)
    if (st.toLong * h > Int.MaxValue) return None
    val frameBytes = st * h
    var nFrames = 0L; var nSampled = 0L
    var sumR, wsumR, firstR = 0L
    var off = moviOff
    while (off + 8 <= moviEnd) {
      val ct = tag(bytes, off); val len = i32(bytes, off + 4)
      if (len < 0 || off.toLong + 8 + len > moviEnd) return None
      if (ct == "00db" || ct == "00dc") {
        if (len != frameBytes) return None // frame disagrees with header
        val f = nFrames
        if (f % 2 == 0) { // sample every 2nd frame; decode ONLY those
          nSampled += 1
          var y = 0
          while (y < h) {
            val rowOff = off + 8 + (h - 1 - y) * st // bottom-up rows
            var x = 0
            while (x < w) {
              val r = bytes(rowOff + x * 3 + 2) & 0xFF
              sumR += r; wsumR += f * r.toLong
              if (f == 0L && y == 0 && x == 0) firstR = r
              x += 1
            }
            y += 1
          }
        }
        nFrames += 1
      }
      off += 8 + len + (len & 1)
    }
    if (nFrames != declaredFrames.toLong) return None
    Some(Row(nFrames, w.toLong, h.toLong, nSampled, sumR, wsumR, firstR))
  }
}

/** Deterministic AVI synthesis: frame count, dimensions and every pixel
  * closed-form in the id — frame `f`, top-down row-major pixel index `i`:
  * `R = (7·id + 3·i + 19·f) mod 256` (G/B analogous with 11/5/23 and
  * 13/7/29) at `n_frames = id mod 12 + 4`, `width = id mod 24 + 8`,
  * `height = id mod 16 + 8` — so the sampled-frame statistics are
  * SQL-oracle-stateable. The container is spec-shaped: `hdrl` LIST with a
  * 56-byte `avih`, `movi` LIST of `00db` DIB frames (bottom-up BGR,
  * 4-byte-padded rows). */
object AviSynth {
  def nFrames(id: Long): Int = (id % 12 + 4).toInt
  def width(id: Long): Int = (id % 24 + 8).toInt
  def height(id: Long): Int = (id % 16 + 8).toInt

  def render(id: Long): Array[Byte] = {
    val nf = nFrames(id); val w = width(id); val h = height(id)
    val st = Bmp.stride(w)
    val frameBytes = st * h
    val avihLen = 56
    val hdrlLen = 4 + 8 + avihLen            // 'hdrl' + avih chunk
    val moviLen = 4 + nf * (8 + frameBytes)  // 'movi' + frame chunks
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = new Array[Byte](8 + riffLen)
    var off = 0
    def tag(s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, off, 4); off += 4
    }
    def put32(v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
      out(off + 2) = ((v >> 16) & 0xFF).toByte; out(off + 3) = ((v >> 24) & 0xFF).toByte
      off += 4
    }
    tag("RIFF"); put32(riffLen); tag("AVI ")
    tag("LIST"); put32(hdrlLen); tag("hdrl")
    tag("avih"); put32(avihLen)
    val avihStart = off
    put32(33333); put32(0); put32(0); put32(0) // usec/frame, maxrate, pad, flags
    put32(nf); put32(0); put32(1); put32(0)    // totalframes, initial, streams, bufsize
    put32(w); put32(h)
    off = avihStart + avihLen                  // reserved dwords stay zero
    tag("LIST"); put32(moviLen); tag("movi")
    var f = 0
    while (f < nf) {
      tag("00db"); put32(frameBytes)
      var y = 0
      while (y < h) {
        val rowOff = off + (h - 1 - y) * st
        var x = 0
        while (x < w) {
          val i = y.toLong * w + x
          val o = rowOff + x * 3
          out(o) = ((13 * id + 7 * i + 29 * f) % 256).toByte     // B
          out(o + 1) = ((11 * id + 5 * i + 23 * f) % 256).toByte // G
          out(o + 2) = ((7 * id + 3 * i + 19 * f) % 256).toByte  // R
          x += 1
        }
        y += 1
      }
      off += frameBytes
      f += 1
    }
    out
  }
}

/** Batched adapter around the real [[Avi.decode]] — identical drop-in
  * shape to the image/audio codecs. */
final case class AviFrameCodec(batchSize: Int = 256) extends BinaryCodec {
  def this() = this(256)
  val featureSchema: StructType = Avi.FeatureSchema
  private val nullRow = Row(null, null, null, null, null, null, null)
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val feat =
            try Avi.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
            catch { case scala.util.control.NonFatal(_) => nullRow }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
