package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** [EXT] — a REAL entropy-coded image decode behind the pluggable
  * [[BinaryCodec]] seam: a from-scratch BASELINE JPEG reader (ITU-T T.81
  * sequential DCT, 8-bit; grayscale, 4:4:4 and 4:2:0 YCbCr layouts,
  * DRI restart intervals) —
  * the one rung the codec ladder lacked: BMP proved container/stride
  * plumbing, PNG proved lossless compression (DEFLATE + filters), WAV/AVI
  * proved chunked media walks; JPEG adds *entropy coding* — canonical
  * Huffman tables built from the stream's own DHT segments, bit-level
  * decoding with byte-stuffing, DC DPCM prediction, zigzag dequantization
  * and the 2-D inverse DCT. All pure JVM, zero dependencies.
  *
  * Decode is streaming per block: features (pixel sums) accumulate as each
  * 8×8 block is reconstructed, so no full-image buffer is ever allocated —
  * a crafted header cannot demand width×height memory (the x11 adversarial
  * posture; dimensions are additionally capped against a sane bound).
  *
  * Mirrors the reference's pluggable body-deserializer seam
  * (`/root/reference/src/main/scala/org/apache/flume/sink/hive/batch/serde/TextDeserializer.scala:44-68`)
  * with entropy-coded image bytes instead of text lines.
  */
object Jpeg {

  /** Same position-pinning discipline as [[Bmp.FeatureSchema]], grayscale:
    * `wsum_g` (Σ i·g(i) over top-down row-major i) catches block-order or
    * IDCT placement errors that channel sums alone cannot. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("n_pixels", LongType),
    StructField("sum_g", LongType), StructField("wsum_g", LongType),
    StructField("first_g", LongType)))

  /** Natural-order index for each zigzag position (T.81 Figure A.6). */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) premultiplied by C(u) — the separable IDCT basis. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table per T.81 Annex C: codes assigned in order of
    * length from the 16 BITS counts; decode via the spec's
    * mincode/maxcode/valptr walk (Annex F.2.2.3). */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len)) & 0xFF
  }

  /** MSB-first entropy-segment bit reader with 0xFF00 byte-unstuffing; any
    * marker byte or EOF mid-read surfaces as -1 (→ malformed). */
  private final class BitReader(bytes: Array[Byte], var pos: Int, end: Int) {
    private var cur = 0
    private var nbits = 0
    var hitMarker = false
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= end) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= end) return -1
          val b2 = bytes(pos) & 0xFF
          if (b2 == 0x00) { pos += 1 } // stuffed 0xFF data byte
          else { hitMarker = true; pos -= 1; return -1 } // a real marker
          b = 0xFF
        }
        cur = b; nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        val b = readBit(); if (b < 0) return Int.MinValue
        v = (v << 1) | b; i += 1
      }
      v
    }
    /** Byte-align and consume the expected RSTn marker (T.81 F.2.1.3.1:
      * restart intervals reset the entropy coder and DC prediction).
      * False on anything but the expected marker — malformed. */
    def syncRestart(expected: Int): Boolean = {
      nbits = 0 // discard pad bits to the byte boundary
      if (pos + 2 > end) return false
      if ((bytes(pos) & 0xFF) != 0xFF) return false
      if ((bytes(pos + 1) & 0xFF) != 0xD0 + expected) return false
      pos += 2
      true
    }

    def decode(h: Huff): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        val b = readBit(); if (b < 0) return -1
        code = (code << 1) | b; len += 1
        if (h.maxCode(len) >= 0 && code <= h.maxCode(len) && code >= h.minCode(len))
          return h.value(len, code)
      }
      -1
    }
  }

  /** T.81 F.2.2.1 EXTEND: map a magnitude-category bit pattern to its
    * signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private def u16be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  /** Parse a baseline (SOF0) 8-bit JPEG: grayscale, 3-component 4:4:4,
    * or 3-component 4:2:0 (the near-universal real-world layout — luma
    * 2×2 blocks per 16×16 MCU, chroma subsampled 2× per axis), including
    * DRI restart intervals (RSTn markers re-sync the entropy coder and
    * reset every DC prediction — the structure real encoders emit for
    * error resilience); None on anything else — wrong magic,
    * progressive/extended SOFs, other sampling layouts, 16-bit quant
    * tables, truncated segments, invalid Huffman codes, out-of-sequence
    * restart markers, coefficient overruns — the p1c malformed-row
    * contract. Features come from the full-resolution luma plane; chroma
    * blocks are entropy-decoded (the interleaved bitstream demands it)
    * but skip the IDCT — decode only what you need. All
    * offset math is in Long where a segment length participates (the
    * Int-overflow posture the chunk codecs hardened). */
  def decode(bytes: Array[Byte]): Option[Row] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None
    var off = 2
    val qts = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0
    var nComp = 0
    val compId = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compTq = new Array[Int](3)
    val compTd = new Array[Int](3)
    val compTa = new Array[Int](3)
    var restartInterval = 0
    var sofSeen = false
    var scanStart = -1
    // marker segment walk up to SOS
    while (scanStart < 0) {
      if (off + 4 > bytes.length) return None
      if ((bytes(off) & 0xFF) != 0xFF) return None
      val marker = bytes(off + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { off += 2 }
      else if (marker == 0xD9) return None // EOI before any scan
      else {
        val len = u16be(bytes, off + 2)
        if (len < 2 || off.toLong + 2 + len > bytes.length) return None
        val seg = off + 4
        val segEnd = off + 2 + len
        marker match {
          case 0xC0 => // SOF0 baseline, 1 (grayscale) or 3 (4:4:4) components
            if (sofSeen || len < 2 + 6 + 3) return None
            val precision = bytes(seg) & 0xFF
            h = u16be(bytes, seg + 1); w = u16be(bytes, seg + 3)
            nComp = bytes(seg + 5) & 0xFF
            if (precision != 8 || (nComp != 1 && nComp != 3) ||
              w <= 0 || h <= 0) return None
            if (len < 2 + 6 + 3 * nComp) return None
            // cap decode work against a sane bound; the per-block loop
            // below is additionally bounded by the entropy bytes present
            if (w.toLong * h > 16_000_000L) return None
            var ci = 0
            while (ci < nComp) {
              compId(ci) = bytes(seg + 6 + 3 * ci) & 0xFF
              val hv = bytes(seg + 7 + 3 * ci) & 0xFF
              compH(ci) = (hv >> 4) & 0x0F; compV(ci) = hv & 0x0F
              compTq(ci) = bytes(seg + 8 + 3 * ci) & 0xFF
              if (compTq(ci) > 3) return None
              ci += 1
            }
            // the two real layouts: no subsampling (grayscale / 4:4:4),
            // or 4:2:0 (luma 2x2, chroma 1x1) — anything else rejects
            val s444 = (0 until nComp).forall(c => compH(c) == 1 && compV(c) == 1)
            val s420 = nComp == 3 && compH(0) == 2 && compV(0) == 2 &&
              (1 until 3).forall(c => compH(c) == 1 && compV(c) == 1)
            if (!s444 && !s420) return None
            sofSeen = true
          case 0xC4 => // DHT (possibly several tables in one segment)
            var p = seg
            while (p < segEnd) {
              if (p + 17 > segEnd) return None
              val tc = (bytes(p) >> 4) & 0x0F
              val th = bytes(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xFF)
              val total = bits.sum
              if (total == 0 || total > 256 || p + 17 + total > segEnd) return None
              val vals = java.util.Arrays.copyOfRange(bytes, p + 17, p + 17 + total)
              if (tc == 0) dcTabs(th) = new Huff(bits, vals)
              else acTabs(th) = new Huff(bits, vals)
              p += 17 + total
            }
          case 0xDB => // DQT (possibly several tables)
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) >> 4) & 0x0F
              val tq = bytes(p) & 0x0F
              if (pq != 0 || tq > 3) return None // 8-bit tables only
              if (p + 1 + 64 > segEnd) return None
              qts(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xFF)
              p += 65
            }
          case 0xDA => // SOS: one interleaved scan of all components
            if (!sofSeen || len < 2 + 1 + 2 * nComp + 3) return None
            val ns = bytes(seg) & 0xFF
            if (ns != nComp) return None
            var ci = 0
            while (ci < nComp) {
              // baseline interleaved scans list components in SOF order
              if ((bytes(seg + 1 + 2 * ci) & 0xFF) != compId(ci)) return None
              compTd(ci) = (bytes(seg + 2 + 2 * ci) >> 4) & 0x0F
              compTa(ci) = bytes(seg + 2 + 2 * ci) & 0x0F
              if (compTd(ci) > 3 || compTa(ci) > 3) return None
              ci += 1
            }
            scanStart = segEnd
          case 0xDD => // DRI: restart interval in MCUs (0 disables)
            if (len != 4) return None
            restartInterval = u16be(bytes, seg)
          case m if m >= 0xC1 && m <= 0xCF && m != 0xC4 && m != 0xC8 =>
            return None // progressive/extended/arithmetic SOFs
          case _ => () // APPn, COM, others: skipped
        }
        off = segEnd
      }
    }
    val compQts = new Array[Array[Int]](nComp)
    val compDc = new Array[Huff](nComp)
    val compAc = new Array[Huff](nComp)
    var ci = 0
    while (ci < nComp) {
      compQts(ci) = qts(compTq(ci))
      compDc(ci) = dcTabs(compTd(ci))
      compAc(ci) = acTabs(compTa(ci))
      if (compQts(ci) == null || compDc(ci) == null || compAc(ci) == null)
        return None
      ci += 1
    }

    // MCU grid from the sampling factors: 8 px per block times the max
    // factor per axis (8x8 for 4:4:4/grayscale, 16x16 for 4:2:0)
    val hMax = (0 until nComp).map(compH(_)).max
    val vMax = (0 until nComp).map(compV(_)).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val br = new BitReader(bytes, scanStart, bytes.length)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val preds = new Array[Int](nComp)
    var sumG = 0L; var wsumG = 0L; var firstG = 0L
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.syncRestart((mcu / restartInterval - 1) % 8)) return None
          java.util.Arrays.fill(preds, 0) // RSTn resets every DC prediction
        }
        mcu += 1
        // one interleaved MCU: Hc x Vc blocks per component in raster
        // order (T.81 A.2.3); features accumulate from component 0
        // (gray, or luma — full resolution by construction)
        var c = 0
        while (c < nComp) {
          val qt = compQts(c); val dcTab = compDc(c); val acTab = compAc(c)
          var bv = 0
          while (bv < compV(c)) {
            var bh = 0
            while (bh < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              // DC: category + offset bits, DPCM against the previous block
              val t = br.decode(dcTab)
              if (t < 0 || t > 11) return None
              val diffBits = br.receive(t)
              if (diffBits == Int.MinValue) return None
              preds(c) += extend(diffBits, t)
              coef(0) = preds(c) * qt(0)
              // AC: (run, size) symbols to 63, EOB/ZRL per F.2.2.2
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decode(acTab)
                if (rs < 0) return None
                val r = (rs >> 4) & 0x0F; val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  if (k > 63) return None
                  val vb = br.receive(sz)
                  if (vb == Int.MinValue) return None
                  coef(Zigzag(k)) = extend(vb, sz) * qt(k)
                  k += 1
                }
              }
              if (c == 0) {
                // separable 2-D IDCT: rows then columns, level shift + clamp
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    var acc = 0.0
                    var u = 0
                    while (u < 8) {
                      val cu = coef(y * 8 + u)
                      if (cu != 0) acc += Cos(x)(u) * cu
                      u += 1
                    }
                    tmp(y * 8 + x) = acc * 0.5
                    x += 1
                  }
                  y += 1
                }
                val x0 = (mx * compH(0) + bh) * 8
                val y0 = (my * compV(0) + bv) * 8
                var x = 0
                while (x < 8) {
                  var yy = 0
                  while (yy < 8) {
                    var acc = 0.0
                    var v = 0
                    while (v < 8) { acc += Cos(yy)(v) * tmp(v * 8 + x); v += 1 }
                    // tiny guard past the epsilon of the double basis so
                    // values that are exact integers in real arithmetic
                    // (the DC-only case) round identically to the
                    // closed-form oracle
                    val p0 = math.floor(acc * 0.5 + 128.0 + 0.5 + 1e-9).toInt
                    val p = if (p0 < 0) 0 else if (p0 > 255) 255 else p0
                    val px = x0 + x; val py = y0 + yy
                    if (px < w && py < h) {
                      val i = py.toLong * w + px
                      sumG += p; wsumG += i * p
                      if (i == 0L) firstG = p
                    }
                    yy += 1
                  }
                  x += 1
                }
              }
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    Some(Row(w.toLong, h.toLong, w.toLong * h, sumG, wsumG, firstG))
  }
}

/** Deterministic baseline-JPEG synthesis: a REAL encoder (forward DCT,
  * quantization with the T.81 Annex K luminance table, zigzag run-length +
  * canonical Huffman entropy coding with the Annex K tables, byte
  * stuffing), produced two ways:
  *
  *  - [[render]]: per-8×8-block CONSTANT pixels, value
  *    `(37·id + 11·blockIndex) mod 256` at `width = 8·(id mod 6 + 2)`,
  *    `height = 8·(id mod 4 + 2)`. Constant blocks quantize to a lone DC
  *    coefficient, and the Annex K DC quantizer (16) divides the DC scale
  *    (8), so the lossy round trip is CLOSED-FORM:
  *    `p' = clamp(2·floor((p−128)/2 + 0.5) + 128, 0, 255)` — a SQL oracle
  *    can state the decoded statistics of a genuinely lossy codec.
  *  - [[renderPatterned]]: full-gradient pixels exercising AC
  *    coefficients, ZRL runs and the complete IDCT — checked
  *    differentially against ImageIO in the spec (±1/pixel, the
  *    standard's decoder-accuracy latitude).
  */
object JpegSynth {
  import Jpeg.Zigzag

  /** T.81 Annex K.1 luminance quantization table (natural order here;
    * written to DQT in zigzag order). qt(0)=16 is what makes the DC-only
    * round trip closed-form. */
  private val QLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.3.1: luminance DC code counts + values. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2: luminance AC code counts + values. */
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  /** (code, length) per symbol from the canonical BITS/VALS assignment. */
  private def codeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) { out(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out.toMap
  }
  private val DcCodes = codeTable(DcBits, DcVals)
  private val AcCodes = codeTable(AcBits, AcVals)

  /** T.81 Annex K.2 chrominance quantization table (natural order). */
  private val QChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K.3.3 / K.3.4: chrominance DC and AC code counts + values. */
  private val DcBitsC = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC: Array[Int] = (0 to 11).toArray
  private val AcBitsC = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val DcCodesC = codeTable(DcBitsC, DcValsC)
  private val AcCodesC = codeTable(AcBitsC, AcValsC)

  /** cos((2x+1)·u·π/16) basis (no C factor) and the C(u) normalizers —
    * precomputed once; the per-block FDCT is separable (rows then
    * columns, 2·8³ multiply-adds) instead of the direct 8⁴ form with
    * cos() in the inner loop. */
  private val CosB: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }
  private val CFac: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0xFF, 8 - n); () } // pad with 1s
  }

  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  def width(id: Long): Int = 8 * (id % 6 + 2).toInt
  def height(id: Long): Int = 8 * (id % 4 + 2).toInt
  def blockValue(id: Long, blockIndex: Long): Int =
    ((37 * id + 11 * blockIndex) % 256).toInt

  /** The closed-form decoded value of a constant block — the oracle's
    * formula, in one place for the spec to pin. */
  def decodedValue(p: Int): Int = {
    val dcq = math.floor((p - 128).toDouble / 2 + 0.5).toInt
    math.min(255, math.max(0, 2 * dcq + 128))
  }

  def render(id: Long): Array[Byte] =
    encode(width(id), height(id), (x, y) => {
      val b = (y / 8).toLong * (width(id) / 8) + (x / 8)
      blockValue(id, b)
    })

  /** Gradient pixels (`(7·id + 3·i) mod 256`, the fixture's shared pixel
    * formula) — dense ACs for the differential spec. */
  def renderPatterned(id: Long): Array[Byte] =
    encode(width(id), height(id),
      (x, y) => ((7 * id + 3 * (y.toLong * width(id) + x)) % 256).toInt)

  /** One encode plane: its pixel source (in PLANE coordinates — quarter
    * resolution for 4:2:0 chroma), quant table (natural order) + DQT id,
    * Huffman code tables + DHT id, and sampling factors. */
  private final case class Plane(pixel: (Int, Int) => Int, qt: Array[Int],
                                 qtId: Int, dc: Map[Int, (Int, Int)],
                                 ac: Map[Int, (Int, Int)], tabId: Int,
                                 hS: Int = 1, vS: Int = 1)

  /** Real baseline encoder: FDCT per block (doubles), Annex-K quantization
    * (half-up with an epsilon guard so exact-integer ratios — the
    * constant-block DC case — never round against the closed form),
    * DC DPCM, AC run-length with ZRL/EOB, canonical Huffman, stuffing.
    * Grayscale (one luma plane). */
  def encode(w: Int, h: Int, pixel: (Int, Int) => Int,
             restartInterval: Int = 0): Array[Byte] =
    encodePlanes(w, h,
      Seq(Plane(pixel, QLuma, 0, DcCodes, AcCodes, 0)), restartInterval)

  /** 3-component 4:4:4 YCbCr: the planes are given DIRECTLY in YCbCr
    * (synthesis picks closed-form planes, no RGB conversion exists in the
    * encoder), luma with the K.1/K.3.1-2 tables, both chroma planes with
    * the K.2/K.3.3-4 tables — the table layout every libjpeg-compatible
    * encoder ships. JFIF APP0 is included so readers interpret component
    * ids 1/2/3 as YCbCr. */
  def encodeColor(w: Int, h: Int, yP: (Int, Int) => Int,
                  cbP: (Int, Int) => Int, crP: (Int, Int) => Int,
                  restartInterval: Int = 0): Array[Byte] =
    encodePlanes(w, h, Seq(
      Plane(yP, QLuma, 0, DcCodes, AcCodes, 0),
      Plane(cbP, QChroma, 1, DcCodesC, AcCodesC, 1),
      Plane(crP, QChroma, 1, DcCodesC, AcCodesC, 1)), restartInterval)

  /** 4:2:0 — the layout virtually all real-world JPEGs use: luma at full
    * resolution (2×2 blocks per 16×16 MCU), each chroma plane subsampled
    * 2× per axis (its pixel function is DEFINED at quarter resolution —
    * synthesis picks the closed-form plane directly, no downsampling
    * filter exists in the encoder). */
  def encodeColor420(w: Int, h: Int, yP: (Int, Int) => Int,
                     cbP: (Int, Int) => Int, crP: (Int, Int) => Int,
                     restartInterval: Int = 0): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, "4:2:0 synth dims are multiples of 16")
    encodePlanes(w, h, Seq(
      Plane(yP, QLuma, 0, DcCodes, AcCodes, 0, hS = 2, vS = 2),
      Plane(cbP, QChroma, 1, DcCodesC, AcCodesC, 1),
      Plane(crP, QChroma, 1, DcCodesC, AcCodesC, 1)), restartInterval)
  }

  private def encodePlanes(w: Int, h: Int, planes: Seq[Plane],
                           restartInterval: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "synth dims are multiples of 8")
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); out.write((body.length + 2) >> 8); out.write((body.length + 2) & 0xFF)
      body.foreach(out.write)
    }
    marker(0xD8) // SOI
    if (nc == 3) // JFIF 1.1, no thumbnail: ids 1/2/3 are YCbCr by convention
      seg(0xE0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // one DQT per distinct table id, zigzag order
    planes.map(p => (p.qtId, p.qt)).distinct.foreach { case (id, qt) =>
      seg(0xDB, Array(id) ++ (0 until 64).map(i => qt(Zigzag(i))))
    }
    seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc) ++
      planes.zipWithIndex.flatMap { case (p, ci) =>
        Seq(ci + 1, (p.hS << 4) | p.vS, p.qtId) })
    // DHT per distinct table id: DC class then AC class
    planes.map(_.tabId).distinct.foreach { id =>
      if (id == 0) {
        seg(0xC4, Array(0x00 | id) ++ DcBits ++ DcVals)
        seg(0xC4, Array(0x10 | id) ++ AcBits ++ AcVals)
      } else {
        seg(0xC4, Array(0x00 | id) ++ DcBitsC ++ DcValsC)
        seg(0xC4, Array(0x10 | id) ++ AcBitsC ++ AcValsC)
      }
    }
    if (restartInterval > 0)
      seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF)) // DRI
    seg(0xDA, Array(nc) ++
      planes.zipWithIndex.flatMap { case (p, ci) =>
        Seq(ci + 1, (p.tabId << 4) | p.tabId) } ++ Seq(0, 63, 0))
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val tmpRow = new Array[Double](64)
    val fdct = new Array[Double](64)
    val preds = new Array[Int](nc)
    val hMax = planes.map(_.hS).max
    val vMax = planes.map(_.vS).max
    var mcu = 0
    var by = 0
    while (by < h / (8 * vMax)) {
      var bx = 0
      while (bx < w / (8 * hMax)) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush() // pad to the byte boundary before the marker
          marker(0xD0 + (mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(preds, 0)
        }
        mcu += 1
        var ci = 0
        while (ci < nc) {
          val pl = planes(ci)
          var bv = 0
          while (bv < pl.vS) {
          var bh = 0
          while (bh < pl.hS) {
          val px0 = (bx * pl.hS + bh) * 8
          val py0 = (by * pl.vS + bv) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              block(y * 8 + x) = pl.pixel(px0 + x, py0 + y) - 128.0
              x += 1
            }
            y += 1
          }
          // separable FDCT over the precomputed basis: rows then columns
          var yy = 0
          while (yy < 8) {
            var u = 0
            while (u < 8) {
              var acc = 0.0
              var xx = 0
              while (xx < 8) { acc += block(yy * 8 + xx) * CosB(xx)(u); xx += 1 }
              tmpRow(yy * 8 + u) = acc
              u += 1
            }
            yy += 1
          }
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var acc = 0.0
              var y2 = 0
              while (y2 < 8) { acc += tmpRow(y2 * 8 + u) * CosB(y2)(v); y2 += 1 }
              fdct(v * 8 + u) = 0.25 * CFac(u) * CFac(v) * acc
              u += 1
            }
            v += 1
          }
          val q = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val nat = Zigzag(i)
            q(i) = math.floor(fdct(nat) / pl.qt(nat) + 0.5 + 1e-9).toInt
            i += 1
          }
          // DC
          val diff = q(0) - preds(ci); preds(ci) = q(0)
          val t = category(diff)
          val (dc, dl) = pl.dc(t)
          bw.put(dc, dl)
          if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
          // AC with ZRL + EOB
          var run = 0
          var k = 1
          while (k < 64) {
            if (q(k) == 0) run += 1
            else {
              while (run > 15) { val (z, zl) = pl.ac(0xF0); bw.put(z, zl); run -= 16 }
              val sct = category(q(k))
              val (c, cl) = pl.ac((run << 4) | sct)
              bw.put(c, cl)
              bw.put(if (q(k) < 0) q(k) + (1 << sct) - 1 else q(k), sct)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (e, el) = pl.ac(0x00); bw.put(e, el) }
          bh += 1
          }
          bv += 1
          }
          ci += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }
}

/** Batched adapter around the real [[Jpeg.decode]] — identical drop-in
  * shape to the other media codecs, NonFatal-hardened per row. */
final case class JpegGrayCodec(batchSize: Int = 256) extends BinaryCodec {
  def this() = this(256)
  val featureSchema: StructType = Jpeg.FeatureSchema
  private val nullRow = Row(null, null, null, null, null, null)
  def decode(df: DataFrame, payloadCol: String, out: String): DataFrame = {
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = Encoders.row(df.schema.add(out, featureSchema))
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val feat =
            try Jpeg.decode(r.getAs[Array[Byte]](idx)).getOrElse(nullRow)
            catch { case scala.util.control.NonFatal(_) => nullRow }
          Row.fromSeq(r.toSeq :+ feat)
        }
      }
    }(enc)
  }
}
