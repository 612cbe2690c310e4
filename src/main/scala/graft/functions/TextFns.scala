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
    * what makes hash-keyed operators cross-checkable. */
  val HashP = 1000000007L
  def polyHash(s: Column): Column =
    aggregate(
      sequence(lit(1), length(s)),
      lit(0L),
      (acc, i) => (acc * 31L + ascii(s.substr(i, lit(1)))) % HashP)

  /** Deterministic affine hash family h_i(x) = (a_i*x + b_i) mod p over
    * already-hashed shingles — the classic minhash construction
    * (Broder '97). Constants from a fixed LCG so every run/engine agrees. */
  def affine(i: Int): (Long, Long) = {
    def lcg(seed: Long): Long = (seed * 6364136223846793005L + 1442695040888963407L) >>> 11
    val a = (lcg(2 * i + 1) % (HashP - 1)) + 1
    val b = lcg(2 * i + 2) % HashP
    (a.abs, b.abs)
  }

  /** MinHash signature (k values) of a distinct-shingle-hash array. */
  def minhashSig(shingleHashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      val (a, b) = affine(i)
      array_min(transform(shingleHashes, h => (lit(a) * h + lit(b)) % HashP))
    }: _*)

  /** 32-bit SimHash from an array of term hashes: bit j of the result is the
    * sign of Σ_terms (2·bit_j(h)−1). Charikar '02, expressed as nested
    * higher-order functions (no UDF). */
  def simhash32(termHashes: Column): Column =
    (0 until 32).map { j =>
      val bitSum = aggregate(termHashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Hamming distance between two simhashes (popcount of xor). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
