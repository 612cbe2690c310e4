package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text tokenization / shingling / portable hashing — the building blocks
  * for the dedup and text-analysis operator families (engine extensions;
  * the reference has no text processing — its bodies are opaque bytes,
  * `/root/reference/.../serde/TextDeserializer.scala:68`).
  *
  * Everything here is built from codegen'd higher-order functions — no
  * UDFs — so shingling/hashing fuses with the scan at 100 TB.
  */
object TextFns {

  /** Whitespace tokens, lowercased. `trim` guards against boundary empties
    * so engines that drop/keep trailing empty splits agree. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** n-token shingles: ["a b c", "b c d", ...]; empty array if < n tokens. */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(toks) - (n - 1))
    when(size(toks) >= n,
      transform(idx, i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Portable polynomial string hash: fold (acc*31 + codepoint) mod p over
    * the characters. Unlike murmur/xxhash it is trivially reproducible in
    * any engine (the DuckDB oracle computes the identical fold), which is
    * what makes hash-keyed operators cross-checkable. Native codegen'd
    * single pass ([[graft.expressions.PolyHash]]); the previous
    * column-expression fold re-seeked the string per character. */
  val HashP = 1000000007L
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.PolyHash(org.apache.spark.sql.graft.bridge.expression(s)))

  /** Fast non-portable string hash for internal keys (LSH buckets, minhash
    * bases): Spark's codegen'd xxhash64. The approximate operators carry no
    * oracle, so cross-engine portability buys nothing there — only speed
    * matters, and xxhash64 is a single fixed-width mix per value vs
    * polyHash's per-character fold. */
  def fastHash(s: Column): Column = xxhash64(s)

  /** Distinct n-token shingle *hashes* without materializing shingle
    * strings: hash every token once, then fold adjacent token hashes with
    * chained xxhash64. Native codegen'd single pass
    * ([[graft.expressions.ShingleHashes]]) — the HOF chain it replaces
    * ([[shingleHashesHof]], kept as the differential-test reference)
    * evaluated ~3 interpreted lambda frames per token and dominated the
    * dedup family's shared index build. The shingle *set* is identical to
    * the string form modulo 64-bit hash collisions (~2⁻⁶⁴ per pair —
    * immaterial for near-dup detection). */
  def shingleHashes(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.ShingleHashes(
        org.apache.spark.sql.graft.bridge.expression(toks), n))

  /** The higher-order-function reference form of [[shingleHashes]] — a
    * spec asserts the native expression matches it element-for-element.
    * (zip_with pads the shorter shifted array with nulls; those tail
    * entries are incomplete shingles and are sliced off. On a null token
    * array the HOF form yields empty while the native yields null — both
    * are dropped by the `size > 0` filter every caller applies.) */
  private[graft] def shingleHashesHof(toks: Column, n: Int): Column = {
    val th = transform(toks, t => xxhash64(t))
    val full = (1 until n).foldLeft(th) { (acc, j) =>
      zip_with(acc, slice(th, lit(j + 1), greatest(size(toks), lit(0))),
        (a, b) => xxhash64(a, b))
    }
    when(size(toks) >= n,
      array_distinct(slice(full, lit(1), size(toks) - (n - 1))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** MinHash signature (k values) of a distinct-shingle-hash array — the
    * classic construction (Broder '97) with the hash family h_i(x) =
    * xxhash64(x, i): k independent cheap rehashes of the 8-byte base hash,
    * better mixed than an affine family and fully codegen'd. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleHashes, h => xxhash64(h, lit(i))))
    }: _*)

  /** 32-bit SimHash from an array of term hashes: bit j of the result is
    * the sign of Σ_terms (2·bit_j(h)−1). Charikar '02. Native codegen'd
    * two-level loop ([[graft.expressions.SimHash32]]); the HOF fold it
    * replaces ([[simhash32Hof]], the differential-test reference) evaluated
    * an interpreted 32-element `transform` per term. */
  def simhash32(termHashes: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.SimHash32(
        org.apache.spark.sql.graft.bridge.expression(termHashes)))

  /** The higher-order-function reference form of [[simhash32]]: one
    * `aggregate` folds every term into a 32-counter array (the round-1
    * form ran 32 separate aggregates = 32 scans of every array), then the
    * counters collapse into bits via their sign. */
  private[graft] def simhash32Hof(termHashes: Column): Column = {
    val masks = array((0 until 32).map(j => lit(1L << j)): _*)
    val counts = aggregate(
      termHashes,
      array_repeat(lit(0L), 32),
      (acc, h) => transform(acc, (cnt, i) =>
        cnt + when(h.bitwiseAND(element_at(masks, i + 1)) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, masks, (c, m) => when(c > 0, m).otherwise(0L)),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two simhashes (popcount of xor). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** JVM replica of [[graft.expressions.PolyHash]]'s fold — same UTF-16
    * char walk, same modulus — for per-partition imperative code. */
  def polyHashLocal(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) { acc = (acc * 31L + s.charAt(i)) % 1000000007L; i += 1 }
    acc
  }

  /** JVM replica of the winnowing span selection behind
    * `TextAnalysis.spanIndex`, rule for rule: per-position `kGram`-char
    * [[polyHashLocal]] hashes, each full `winnow`-window selects its
    * FIRST-minimum position (the batch builder's (kh, p) struct-min),
    * anchors dedupe and span-fitting ones fingerprint their
    * `spanLen`-char span. Returns (1-based position, span hash) pairs —
    * spec-pinned row-identical to the batch index on the fixture. Used
    * by the streaming probe (t13) and the incremental index builder,
    * where an interpreted higher-order-function form profiled ~100×
    * slower (per-slice lambda frames; this loop is O(positions·winnow)
    * native integer work). */
  def winnowSpansLocal(text: String, spanLen: Int = 64, winnow: Int = 16,
                       kGram: Int = 8): Seq[(Int, Long)] = {
    val n = text.length
    if (n < spanLen) return Nil
    val nK = n - kGram + 1
    val kh = new Array[Long](nK)
    var i = 0
    while (i < nK) { kh(i) = polyHashLocal(text.substring(i, i + kGram)); i += 1 }
    val anchors = scala.collection.mutable.SortedSet.empty[Int]
    var x = 0
    while (x <= nK - winnow) {
      var best = x
      var j = x + 1
      while (j < x + winnow) {
        if (kh(j) < kh(best)) best = j // strict <: first minimum wins
        j += 1
      }
      anchors += best
      x += 1
    }
    anchors.iterator
      .filter(p => p + spanLen <= n)
      .map(p => (p + 1, polyHashLocal(text.substring(p, p + spanLen))))
      .toSeq
  }

  /** Content-defined chunking (the Rabin/rolling-hash splitter behind
    * RAG chunk pipelines and CDC dedup stores, cf. LBFS SOSP 2001): a
    * chunk boundary falls BEFORE every 1-based position whose `kGram`-char
    * [[polyHashLocal]] is ≡ 0 mod `divisor`, so boundaries move with the
    * content — an insertion reshuffles only its own chunk's split points,
    * never the fixed-offset grid a byte-window splitter would shift
    * corpus-wide. Returns (start, len, chunk hash) per chunk; a doc
    * shorter than `kGram` is one chunk. Pure per-doc function — the same
    * stream/batch/incremental-identical property as [[winnowSpansLocal]]. */
  def cdcChunksLocal(text: String, kGram: Int = 8,
                     divisor: Long = 64L): Seq[(Int, Int, Long)] = {
    val n = text.length
    if (n == 0) return Nil
    val nK = n - kGram + 1
    val bounds = scala.collection.mutable.ArrayBuffer[Int](1)
    var i = 1 // position 1 (i=0) never cuts: it would yield an empty chunk
    while (i < nK) {
      if (polyHashLocal(text.substring(i, i + kGram)) % divisor == 0L)
        bounds += i + 1
      i += 1
    }
    bounds += n + 1
    bounds.iterator.sliding(2).withPartial(false).map { w =>
      val (a, b) = (w.head, w.last)
      (a, b - a, polyHashLocal(text.substring(a - 1, b - 1)))
    }.toSeq
  }
}
