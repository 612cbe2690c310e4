package graft.operators

import graft.Tables
import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M5 — keyword retrieval over `documents` (engine extension for LLM-data
  * pipelines; the reference has no search surface — its nearest concept is
  * the category classifier, `serde/TextDeserializer.scala`). Curation
  * pipelines run exactly this shape constantly: "pull the top documents
  * matching these probe terms" for audit samples, targeted decontamination
  * and mixture debugging.
  */
object Search {

  /** X20 — BM25 top-k document retrieval for a bounded query-term set
    * (Robertson–Spärck Jones idf, k1/b defaults from the literature).
    *
    * Scale design: the term set is bounded (a query, not a corpus), so
    * per-doc term frequencies are codegen'd `filter` counts fused with the
    * scan — no posting-list explode, no shuffle for the score. Corpus
    * stats (N, avgdl, per-term df) are ONE partial-final aggregate
    * collected as a single metadata row and inlined as literals (same
    * pattern as x6's probe vector / x15's N) — the scoring pass is then
    * Scan → Project → Filter → TakeOrderedAndProject: top-k without a
    * global sort, two scans total, zero joins. */
  def bm25TopK(spark: SparkSession, sfDir: String,
               terms: Seq[String] = Seq("spark", "join", "window"),
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scored(spark, sfDir, terms, k1, b)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)

  /** The full scored set behind [[bm25TopK]] (every doc with bm25 > 0) —
    * the candidate-generation leg reused by [[hybridTopK]]. */
  private[graft] def bm25Scored(spark: SparkSession, sfDir: String,
                                terms: Seq[String] = Seq("spark", "join", "window"),
                                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
      .select(col("doc_id") +: size(col("tk")).cast("double").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), w => w === lit(t))).cast("double").as(s"tf$i")
        }: _*)
    // one aggregate row: corpus size, mean doc length, per-term doc freq.
    // dl/tf are integer-valued doubles, so the sums are order-independent
    // (exact in FP) and the derived literals are bit-stable across runs.
    val statsRow = tf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0, 1.0).otherwise(0.0)).as(s"df$i")): _*).head()
    val nDocs = statsRow.getDouble(0)
    // empty corpus → avgdl is null and no doc can score; return the empty
    // result with the right schema instead of NPE-ing on the null fetch
    if (nDocs == 0.0) {
      return tf.select(
        col("doc_id") +:
          terms.zipWithIndex.map { case (t, i) =>
            col(s"tf$i").cast("long").as(s"tf_$t") } :+
          lit(0.0).as("bm25"): _*)
        .limit(0)
    }
    val avgdl = statsRow.getDouble(1)
    // Per-term BM25 contribution, parenthesized identically to the oracle
    // SQL so the FP result is bit-equal cross-engine before rounding.
    def contrib(i: Int): Column = {
      val df = statsRow.getDouble(2 + i)
      lit(math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))) *
        (col(s"tf$i") * lit(k1 + 1)) /
        (col(s"tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    }
    tf.select(
        col("doc_id") +:
          terms.zipWithIndex.map { case (t, i) =>
            col(s"tf$i").cast("long").as(s"tf_$t") } :+
          round(terms.indices.map(contrib).reduce(_ + _), 6).as("bm25"): _*)
      .where(col("bm25") > 0)
  }

  /** X29 — hybrid retrieval: BM25 keyword leg + embedding-cosine leg,
    * fused by reciprocal-rank fusion (RRF, Cormack et al. '09 —
    * Σ 1/(rrfK + rank), the standard score-free fusion every
    * retrieve-then-rerank stack runs). Each leg is a full corpus-scale
    * scoring scan ending in TakeOrderedAndProject(candidates); from
    * there everything stays in-engine: per-leg ranks are a row_number
    * over the ≤ `cand`-row candidate set (a single-partition window
    * over bounded metadata — the corpus-scale work already ended at the
    * top-k), and the fusion is a full-outer join of the two short lists
    * with the RRF expression, so the whole query is one declarative
    * plan with no driver collect. Ranks use the ROUNDED scores (ties
    * broken by id) so both engines order identically; the only
    * driver-side value is the 1-row probe vector literal (the x6
    * pattern). */
  def hybridTopK(spark: SparkSession, sfDir: String,
                 terms: Seq[String] = Seq("spark", "join", "window"),
                 probeId: Long = 0L, cand: Int = 50, k: Int = 10,
                 rrfK: Int = 60): DataFrame = {
    import graft.functions.VectorFns
    import org.apache.spark.sql.expressions.Window
    val kw = bm25Scored(spark, sfDir, terms)
      .select(col("doc_id"), col("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(cand)
      .select(col("doc_id").as("kid"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .cast("long").as("r1"))
    val probe = typedLit(Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === probeId)
      .select(col("embedding")).head().getSeq[Float](0))
    val vec = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") =!= probeId)
      .select(col("vec_id"),
        round(VectorFns.cosine(col("embedding"), probe), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(cand)
      .select(col("vec_id").as("vid"),
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id")))
          .cast("long").as("r2"))
    kw.join(vec, col("kid") === col("vid"), "full_outer")
      .select(
        coalesce(col("kid"), col("vid")).as("doc_id"),
        col("r1").as("kw_rank"), col("r2").as("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("r1")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("r2")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
