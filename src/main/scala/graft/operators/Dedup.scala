package graft.operators

import graft.Tables
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M5 — deduplication family over `documents` / `embeddings` (engine
  * extension for LLM-data pipelines; the reference's nearest concept is
  * key-based upsert, `dao/HiveSinkDetailDao.scala:73-98`).
  *
  * Scale design: every variant is a groupBy/self-join on a *derived
  * bounded key* (text hash, LSH band, sign bucket) — never an all-pairs
  * cross join — so the shuffle volume is O(n·k), not O(n²), at 100 TB.
  */
object Dedup {

  /** X1 — exact dedup: keeper (min doc_id) per identical text. The hash
    * groupBy form of `dropDuplicates("text")`, made deterministic by
    * choosing the min-id row. Grouping by the full text shuffles the
    * text once; at scale group by a hash of the text instead and keep the
    * text only for collision verification. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy(col("keeper_id"))

  /** Distinct 3-token-shingle hashes per doc — shared by minhash/jaccard. */
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_distinct(TextFns.shingles(TextFns.tokens(col("text")), 3)).as("sh"))
      .where(size(col("sh")) > 0)

  /** X2 — MinHash+LSH near-dup candidate pairs (shingle→minhash→band→
    * bucket-join). k=16 hashes, 8 bands × 2 rows: catches J≳0.5 pairs with
    * high probability. Output: candidate pairs + estimated Jaccard
    * (matching signature fraction). Only pairs agreeing on some band are
    * ever joined — the LSH property that makes this O(n) at scale. */
  def minhashLsh(spark: SparkSession, sfDir: String, k: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val sigs = shingled(spark, sfDir)
      .select(col("doc_id"),
        TextFns.minhashSig(transform(col("sh"), s => TextFns.polyHash(s)), k).as("sig"))
    val nBands = k / rowsPerBand
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    val l = banded.select(col("band"), col("key"), col("doc_id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("key"), col("doc_id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "key")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b), x => x))
          .cast("double") / k).as("est_jaccard"))
      .groupBy(col("id1"), col("id2"))
      .agg(max(col("est_jaccard")).as("est_jaccard"))
      .where(col("est_jaccard") >= 0.5)
      .orderBy(col("id1"), col("id2"))
  }

  /** X3 — SimHash near-dup: 32-bit simhash over token hashes; pairs within
    * Hamming distance ≤ 3 found via 4-chunk banding (pigeonhole: any pair
    * with ≤3 differing bits agrees on ≥1 of 4 byte-chunks), so again a
    * bucket-join, not all-pairs. */
  def simhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // 3-token shingles, not unigrams: fixture docs share one small vocab, so
    // unigram simhashes collapse onto a few values and the "near-dup" set
    // explodes; shingles keep the fingerprint discriminative.
    val hashed = shingled(spark, sfDir)
      .select(col("doc_id"),
        TextFns.simhash32(transform(col("sh"), t => TextFns.polyHash(t))).as("simhash"))
    val chunked = hashed.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 8).bitwiseAND(0xFFL).as("key"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.key"))
    val l = chunked.select(col("chunk"), col("key"), col("doc_id").as("id1"), col("simhash").as("h1"))
    val r = chunked.select(col("chunk"), col("key"), col("doc_id").as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk", "key")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), TextFns.hamming(col("h1"), col("h2")).as("hamming"))
      .groupBy(col("id1"), col("id2")).agg(min(col("hamming")).as("hamming"))
      .where(col("hamming") <= 3)
      .orderBy(col("id1"), col("id2"))
  }

  /** X4 — exact n-gram Jaccard near-dup: candidate pairs = pairs sharing at
    * least one shingle (inverted-index join), exact J = |∩|/|∪| from the
    * shared-shingle counts. The exact verifier that backs the approximate
    * variants. */
  def ngramJaccard(spark: SparkSession, sfDir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingled(spark, sfDir)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = posting.as("a").join(posting.as("b"), col("a.s") === col("b.s"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .select(col("id1"), col("id2"),
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** X5 — embedding-cosine near-dup pairs (exact, bounded self-join).
    * For the fixture's 500-vector table an exact self-join is the honest
    * baseline; `embedCosineLsh` below is the 100 TB path. */
  def embedCosine(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(VectorFns.cosine(col("a.embedding"), col("b.embedding")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** X5b — the scale path: random-hyperplane sign buckets (12 bits) shard
    * the space; only same-bucket pairs are compared. Recall < 1 by design;
    * precision 1 (exact cosine verified within bucket). */
  def embedCosineLsh(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        VectorFns.signBucket(col("embedding"), 64, 12).as("bucket"))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(VectorFns.cosine(col("a.embedding"), col("b.embedding")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }
}
