package graft.operators

import graft.Tables
import graft.functions.{TextFns, VectorFns}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Distinct 3-token-shingle hashes per doc — the shared index behind
    * x2/x3/x4. Memoized + persisted per (session, sfDir): each query's DAG
    * references it from several branches (posting explode, signature
    * computation, pair verification), and Spark recomputes unpersisted
    * branches from the scan — profiling showed the shingling chain
    * re-running up to 4× per query and across all three queries. At 100 TB
    * this is exactly the materialized shingle index a curation pipeline
    * would build once and reuse; MEMORY_AND_DISK spills instead of OOMing. */
  private val shCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def shingled(spark: SparkSession, sfDir: String): DataFrame =
    shCache.getOrElseUpdate((spark, sfDir), {
      val df = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          TextFns.shingleHashes(TextFns.tokens(col("text")), 3).as("sh"))
        .where(size(col("sh")) > 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df
    })

  /** X2 — MinHash+LSH near-dup candidate pairs (shingle→minhash→band→
    * bucket-join). k=16 hashes, 8 bands × 2 rows: catches J≳0.5 pairs with
    * high probability. Output: candidate pairs + estimated Jaccard
    * (matching signature fraction). Only pairs agreeing on some band are
    * ever joined — the LSH property that makes this O(n) at scale. Internal
    * hashing is xxhash64 (no oracle → portability buys nothing); the band
    * key is itself an 8-byte hash so the shuffle rows stay narrow. */
  def minhashLsh(spark: SparkSession, sfDir: String, k: Int = 16, rowsPerBand: Int = 2): DataFrame = {
    val sigs = shingled(spark, sfDir)
      .select(col("doc_id"), TextFns.minhashSig(col("sh"), k).as("sig"))
    val nBands = k / rowsPerBand
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))
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
      .select(col("doc_id"), TextFns.simhash32(col("sh")).as("simhash"))
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

  /** X4 — exact n-gram Jaccard near-dup with ppjoin-style prefix filtering
    * (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection"). The naive inverted-index self-join explodes on hot
    * shingles — near-quadratic posting-list blowup, the classic skew cliff
    * at 100×. Instead each doc joins only on its *prefix*: its
    * `n - ⌈t·n⌉ + 1` globally-rarest shingles (rare-first canonical order =
    * ascending document frequency). Any pair with J ≥ t shares ≥ ⌈t·n⌉
    * elements, so by pigeonhole the prefixes must intersect — lossless —
    * while hot shingles land in suffixes and never seed the join. The exact
    * J is then verified per candidate pair via `array_intersect` on the
    * full shingle sets (hash-based, O(n1+n2) per pair). */
  def ngramJaccard(spark: SparkSession, sfDir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingled(spark, sfDir)
    val posting = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = posting.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
    // ceil(t*n - 1e-9): FP guard may only lengthen the prefix (more
    // candidates), never shorten it (missed pairs).
    val prefix = posting.join(dfreq, "s")
      .withColumn("rnk", row_number().over(byDoc.orderBy(col("df"), col("s"))))
      .withColumn("n", count(lit(1)).over(byDoc))
      .where(col("rnk") <= col("n") - ceil(lit(threshold) * col("n") - 1e-9) + 1)
      .select(col("doc_id"), col("s"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .select(col("id1"), col("id2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("double").as("i"),
        size(col("sh1")).as("n1"), size(col("sh2")).as("n2"))
      .select(col("id1"), col("id2"),
        round(col("i") / (col("n1") + col("n2") - col("i")), 6).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** X5 — exact embedding-cosine near-dup within label blocks. The
    * unrestricted exact form (`embedCosineAllPairs`) is an O(n²)
    * BroadcastNestedLoopJoin — 214 s at sf0.1 and 10⁴× the work at 100× —
    * so the *declared* exact operator audits near-dups within the
    * deterministic shards a curation pipeline already has (the `label`
    * column): an equi-join on label that Catalyst plans as a hash join,
    * O(Σ block²) with bounded blocks. Norms are precomputed per row (not
    * per pair), so each pair costs one fused dot product. Global
    * approximate near-dup across blocks is `embedCosineLsh` (X5b). */
  def embedCosine(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(VectorFns.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** X13 — duplicate clusters: connected components over the near-dup
    * graph (x4's J ≥ 0.8 pairs), so a curation pipeline can keep one doc
    * per cluster instead of dropping only pairwise losers. Iterative
    * min-label propagation (the hash-to-min pattern): every doc starts as
    * its own label; each round propagates the minimum label across edges
    * until fixpoint. Rounds = graph diameter (near-dup clusters are tiny —
    * 2-4 rounds in practice); each round is one shuffle join, fully
    * distributed, with per-round persist + unpersist so lineage stays flat.
    * Docs outside any pair are their own singleton cluster. */
  def dupClusters(spark: SparkSession, sfDir: String, threshold: Double = 0.8): DataFrame = {
    val pairs = ngramJaccard(spark, sfDir, threshold).select(col("id1"), col("id2"))
    // symmetric edge list (propagation runs both directions)
    val edges = pairs.union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      .toDF("src", "dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Iterate over GRAPH NODES only — the dup graph is a small fraction of
    // the corpus; the full table joins in exactly once, at the end.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Labels only ever decrease (least), so Σ cluster_id strictly decreases
    // while anything changes — one scalar aggregate per round replaces a
    // join-based change count.
    var prevSum = Long.MaxValue
    var sum_ = labels.agg(sum(col("cluster_id"))).head().getLong(0)
    while (sum_ < prevSum) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels.join(viaNeighbor, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prevSum = sum_
      sum_ = next.agg(sum(col("cluster_id"))).head().getLong(0)
      labels.unpersist()
      labels = next
    }
    edges.unpersist()
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(labels.withColumnRenamed("cluster_id", "lbl"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** The unrestricted exact all-pairs baseline — test-only ground truth for
    * the LSH recall check; deliberately not a declared query (quadratic). */
  def embedCosineAllPairs(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), VectorFns.norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(VectorFns.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  /** X5b — the scale path: random-hyperplane sign buckets (12 bits) shard
    * the space; only same-bucket pairs are compared. Recall < 1 by design;
    * precision 1 (exact cosine verified within bucket). */
  def embedCosineLsh(spark: SparkSession, sfDir: String, threshold: Double = 0.4): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        VectorFns.norm(col("embedding")).as("nrm"),
        VectorFns.signBucket(col("embedding"), 64, 12).as("bucket"))
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(VectorFns.dot(col("a.embedding"), col("b.embedding"))
          / (col("a.nrm") * col("b.nrm")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }
}
