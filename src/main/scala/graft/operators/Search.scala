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

  /** The per-doc term-frequency pass: codegen'd filter counts fused with
    * the scan (no posting-list explode). */
  private[graft] def tfPass(docs: DataFrame, terms: Seq[String]): DataFrame = docs
    .select(col("doc_id"), TextFns.tokens(col("text")).as("tk"))
    .select(col("doc_id") +: size(col("tk")).cast("double").as("dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(col("tk"), w => w === lit(t))).cast("double").as(s"tf$i")
      }: _*)

  /** The MAINTAINED per-term document-frequency table (term → df over the
    * whole vocabulary) — BM25's corpus statistic as a stored artifact
    * (VERDICT r12 #6), not a per-query recompute: built once per corpus
    * version through the durable index cache (the ivfPqIndex discipline),
    * probed at query time for the bounded query-term set. df is a group
    * count, so appends FOLD by addition ([[bm25FoldTermDf]]) — a delta
    * batch updates the artifact without rescanning the corpus. */
  private[graft] def bm25TermDf(spark: SparkSession, sfDir: String): DataFrame =
    DfCache.memoizeDisk(spark, s"bm25_df:$sfDir",
      Seq(s"$sfDir/documents.parquet")) {
      bm25TermDfOf(Tables.documents(spark, sfDir))
    }

  /** [[bm25TermDf]]'s build over any `documents`-shaped slice. */
  private[graft] def bm25TermDfOf(docs: DataFrame): DataFrame =
    bm25TermDfOfTk(docs.select(TextFns.tokens(col("text")).as("tk")))

  /** The same build over rows that already CARRY their token array (`tk`)
    * — the shared-derivation entry the x94/t26 orchestrator uses so the
    * batch is tokenized once for every stats consumer. */
  private[graft] def bm25TermDfOfTk(withTk: DataFrame): DataFrame = withTk
    .select(explode(array_distinct(col("tk"))).as("term"))
    .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** The maintained scalar stats (corpus size, total token length): one
    * row, both values long group-sums, so appends fold by addition. avgdl
    * is DERIVED at query time (total_len / n_docs) — a sum of
    * integer-valued doubles is exact in FP, so the derived value is
    * bit-equal to the inline `avg(dl)` the oracle computes. */
  private[graft] def bm25Scalars(spark: SparkSession, sfDir: String): DataFrame =
    DfCache.memoizeDisk(spark, s"bm25_scalars:$sfDir",
      Seq(s"$sfDir/documents.parquet")) {
      bm25ScalarsOf(Tables.documents(spark, sfDir))
    }

  /** [[bm25Scalars]]'s build over any `documents`-shaped slice. */
  private[graft] def bm25ScalarsOf(docs: DataFrame): DataFrame =
    bm25ScalarsOfTk(docs.select(TextFns.tokens(col("text")).as("tk")))

  /** [[bm25ScalarsOf]] over rows already carrying `tk` (see
    * [[bm25TermDfOfTk]]). */
  private[graft] def bm25ScalarsOfTk(withTk: DataFrame): DataFrame = withTk
    .select(size(col("tk")).cast("long").as("dl"))
    .agg(count(lit(1)).as("n_docs"),
      coalesce(sum(col("dl")), lit(0L)).as("total_len"))

  /** Fold an append batch's stats into the stored artifact — pure state
    * merges (df/count/length sums), O(vocabulary + 1), never a corpus
    * rescan; append ≡ rebuild is spec-pinned (SearchSpec). */
  private[graft] def bm25FoldTermDf(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta).groupBy(col("term")).agg(sum(col("df")).as("df"))

  private[graft] def bm25FoldScalars(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))

  /** RETRACT a delete batch's stats from the stored artifact — the delete
    * twin of [[bm25FoldTermDf]]: df is a group count, so subtraction is
    * exact, and a term whose df reaches zero leaves the vocabulary table
    * (artifact hygiene — a dead term must not linger as a zero row).
    * `doomedDelta` is [[bm25TermDfOf]] of the DELETED docs only, so the
    * fold is O(vocabulary + delete batch), never a corpus rescan. */
  private[graft] def bm25RetractTermDf(base: DataFrame, doomedDelta: DataFrame): DataFrame =
    base.join(doomedDelta.withColumnRenamed("df", "d_df"), Seq("term"), "left")
      .select(col("term"), (col("df") - coalesce(col("d_df"), lit(0L))).as("df"))
      .where(col("df") > 0)

  /** [[bm25RetractTermDf]]'s scalar sibling: both stats tables are ONE
    * bounded row, so the subtraction runs driver-side (O(1) metadata —
    * the same class as the probe-vector collects) and returns a literal
    * single-row frame. Long sums subtract exactly, so the derived avgdl
    * is bit-equal to the survivor-corpus recompute. */
  private[graft] def bm25RetractScalars(spark: SparkSession, base: DataFrame,
      doomedDelta: DataFrame): DataFrame = {
    import spark.implicits._
    val b = base.head(); val d = doomedDelta.head()
    Seq((b.getLong(0) - d.getLong(0), b.getLong(1) - d.getLong(1)))
      .toDF("n_docs", "total_len")
  }

  /** The full scored set behind [[bm25TopK]] (every doc with bm25 > 0) —
    * the candidate-generation leg reused by [[hybridTopK]]. Corpus stats
    * come from the MAINTAINED artifacts; the query-time driver values are
    * one scalar row plus ≤ |terms| df rows, inlined as codegen literals
    * (for a bounded term set, literals fused into the scan beat a
    * broadcast join — the x6 probe-vector idiom). */
  private[graft] def bm25Scored(spark: SparkSession, sfDir: String,
                                terms: Seq[String] = Seq("spark", "join", "window"),
                                k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25ScoredAgainst(tfPass(Tables.documents(spark, sfDir), terms), terms,
      bm25TermDf(spark, sfDir), bm25Scalars(spark, sfDir), k1, b)

  /** Score a term-frequency pass against explicit stats tables — shared by
    * the maintained-artifact path ([[bm25Scored]]) and the append-fold
    * path ([[bm25AppendTopK]]). */
  private[graft] def bm25ScoredAgainst(tf: DataFrame, terms: Seq[String],
      termDf: DataFrame, scalars: DataFrame,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sc = scalars.head()
    val nDocs = sc.getLong(0).toDouble
    // empty corpus → no doc can score; return the empty result with the
    // right schema instead of dividing by a zero avgdl
    if (nDocs == 0.0) {
      return tf.select(
        col("doc_id") +:
          terms.zipWithIndex.map { case (t, i) =>
            col(s"tf$i").cast("long").as(s"tf_$t") } :+
          lit(0.0).as("bm25"): _*)
        .limit(0)
    }
    val avgdl = sc.getLong(1).toDouble / nDocs
    // bounded probe of the vocabulary-sized artifact: ≤ |terms| rows
    val dfByTerm = termDf.where(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Per-term BM25 contribution, parenthesized identically to the oracle
    // SQL so the FP result is bit-equal cross-engine before rounding.
    def contrib(i: Int): Column = {
      val df = dfByTerm.getOrElse(terms(i), 0L).toDouble
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

  /** X78 — BM25 over APPEND-FOLDED stats: the corpus lands as two batches
    * (even/odd doc_id, the x6h discipline); the second batch's stats fold
    * into the first's by pure state merge — no rescan of already-counted
    * documents — and the query scores against the folded artifact. The
    * oracle is x20's monolithic-stats query verbatim: hash equality states
    * fold(stats(A), stats(B)) ≡ stats(A ∪ B) end-to-end through the
    * scoring arithmetic. */
  def bm25AppendTopK(spark: SparkSession, sfDir: String,
                     terms: Seq[String] = Seq("spark", "join", "window"),
                     k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val batchA = docs.where(pmod(col("doc_id"), lit(2L)) === 0L)
    val batchB = docs.where(pmod(col("doc_id"), lit(2L)) =!= 0L)
    val termDf = bm25FoldTermDf(bm25TermDfOf(batchA), bm25TermDfOf(batchB))
    val scalars = bm25FoldScalars(bm25ScalarsOf(batchA), bm25ScalarsOf(batchB))
    bm25ScoredAgainst(tfPass(docs, terms), terms, termDf, scalars)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** X81's tombstone set: a ~9% id-hash sample of the corpus (modulus
    * chosen so the fixture deletion evicts a top-k document at both gate
    * SFs — and shifts every survivor's score through n_docs/avgdl). */
  private[graft] def x81Tombstone: Column =
    TextFns.polyHash(col("doc_id").cast("string")) % 11 === 0

  /** X81 — BM25 over RETRACTION-folded stats: the delete twin of x78,
    * closing the retrieval-stats leg of the corpus-maintenance story. A
    * delete batch's stats (df per term, doc count, length sum — all
    * group-homomorphisms) SUBTRACT from the stored artifacts
    * ([[bm25TermDf]]/[[bm25Scalars]], READ back, never recomputed)
    * without rescanning the surviving corpus; terms whose df reaches
    * zero leave the vocabulary. Deletes move the ranking two ways — a
    * doomed doc vanishes from the candidates, and every survivor's
    * score shifts through n_docs/avgdl/df — so the oracle (x20's
    * monolithic query restated over the survivor corpus) exercises the
    * whole arithmetic: hash equality states
    * retract(stats(C), stats(D)) ≡ stats(C \ D) through the scoring.
    * Reference anchor: the bookkeeping delete-then-reinsert update shape
    * of `dao/HiveSinkDetailDao.scala:73-98`, generalized to a
    * subtractive fold. */
  def bm25DeleteTopK(spark: SparkSession, sfDir: String,
                     terms: Seq[String] = Seq("spark", "join", "window"),
                     k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val doomed = docs.where(x81Tombstone)
    val termDf = bm25RetractTermDf(bm25TermDf(spark, sfDir), bm25TermDfOf(doomed))
    val scalars = bm25RetractScalars(spark, bm25Scalars(spark, sfDir),
      bm25ScalarsOf(doomed))
    bm25ScoredAgainst(tfPass(docs.where(!x81Tombstone), terms), terms,
        termDf, scalars)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** X82's insert split: a third of the corpus arrives as the insert
    * batch; the stored two-thirds carry x81's tombstones. */
  private[graft] def x82IsInsert: Column =
    TextFns.polyHash(col("doc_id").cast("string")) % 3 === 2

  /** X82 — BM25 over UPSERT-folded stats, completing the retrieval-stats
    * maintenance algebra the way x79 completed the aggregate's: ONE
    * maintenance pass carries both an insert batch (x78's append fold)
    * and a delete batch inside stored history (x81's retraction), and
    * the stored artifacts — materialized once and READ back, never
    * recomputed — absorb both by pure state arithmetic:
    * df' = df − df(doomed) + df(inserts), likewise the scalars. All
    * state is group counts/long sums, so the composition is exact and
    * order-free; zero-df terms leave the vocabulary. The oracle is
    * x20's monolithic query over (stored survivors ∪ inserts), so the
    * green hash states
    * fold(retract(stats(S), stats(D)), stats(I)) ≡ stats((S \ D) ∪ I)
    * through the scoring arithmetic — the reference's bookkeeping
    * upsert (`dao/HiveSinkDetailDao.scala:73-98`) generalized to
    * retrieval statistics. */
  def bm25UpsertTopK(spark: SparkSession, sfDir: String,
                     terms: Seq[String] = Seq("spark", "join", "window"),
                     k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val stored = docs.where(!x82IsInsert)
    val inserts = docs.where(x82IsInsert)
    val doomed = stored.where(x81Tombstone)
    // the stored artifacts (scratch twins of the durable x78 memos: this
    // fixture's stored corpus is a SPLIT of the full table, so the
    // full-corpus memos are the wrong base here)
    val store = Tables.scratchDir("graft_x82_stats_").toString
    bm25TermDfOf(stored).coalesce(1)
      .write.mode("overwrite").parquet(s"$store/df")
    bm25ScalarsOf(stored).coalesce(1)
      .write.mode("overwrite").parquet(s"$store/scalars")
    val termDf = bm25FoldTermDf(
      bm25RetractTermDf(spark.read.parquet(s"$store/df"), bm25TermDfOf(doomed)),
      bm25TermDfOf(inserts))
    val scalars = bm25FoldScalars(
      bm25RetractScalars(spark, spark.read.parquet(s"$store/scalars"),
        bm25ScalarsOf(doomed)),
      bm25ScalarsOf(inserts))
    bm25ScoredAgainst(tfPass(docs.where(x82IsInsert || !x81Tombstone), terms),
        terms, termDf, scalars)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
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
