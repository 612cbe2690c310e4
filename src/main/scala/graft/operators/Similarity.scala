package graft.operators

import graft.Tables
import graft.functions.VectorFns
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M5 — similarity search over the `embeddings` table (engine extension).
  *
  * Scale design: the query vector (or centroid set) is tiny → broadcast;
  * the corpus side is scanned once with the dot product fused into the
  * scan stage, and top-k is `TakeOrderedAndProject` (per-partition heaps,
  * no global sort). IVF restricts the scan to the nearest partitions.
  */
object Similarity {

  /** The probe vector, fetched once (1 row — the query vector every vector
    * search system ships to workers) and inlined as a literal, so the main
    * scan needs no join at all: Scan → Project → TakeOrderedAndProject. */
  private def probeVec(spark: SparkSession, sfDir: String, queryId: Long) =
    typedLit(Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0))

  /** X6 — exact brute-force cosine top-k: the correctness baseline every
    * ANN variant is judged against. One scan, the dot product fused into
    * it, one per-partition-heap top-k. */
  def bruteTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val q = probeVec(spark, sfDir, queryId)
    Tables.embeddings(spark, sfDir)
      .where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(VectorFns.cosine(col("embedding"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** X6b — IVF-style ANN: coarse-quantize the corpus by `label` (stand-in
    * for k-means cells: centroids = per-cell mean), probe the `nprobe`
    * nearest cells, then exact-rank within them. At 100 TB the corpus is
    * *partitioned by cell* on disk, so the probe prunes partitions at the
    * scan — this query is shaped to keep that property. */
  def ivfTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L,
              k: Int = 10, nprobe: Int = 3): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val dim = 64
    // centroids: element-wise mean per label (aggregate each position)
    val centroids = e.groupBy(col("label"))
      .agg(array((0 until dim).map(i =>
        avg(element_at(VectorFns.asDouble(col("embedding")), i + 1))): _*).as("centroid"))
    val q = probeVec(spark, sfDir, queryId)
    val probedCells = centroids
      .select(col("label"), VectorFns.cosine(col("centroid"), q).as("csim"))
      .orderBy(col("csim").desc, col("label"))
      .limit(nprobe)
      .select(col("label"))
    e.where(col("vec_id") =!= queryId)
      .join(broadcast(probedCells), "label")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(VectorFns.cosine(col("embedding"), q), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** X6d — batched exact top-k: score the corpus against N probe vectors
    * in ONE scan (the eval-harness shape — a query batch, not a single
    * vector). The probe batch is bounded metadata (N rows), inlined as a
    * literal array and `explode`d against each corpus row — so the plan
    * is Scan → Generate → Window(per-probe heap-rank), with no join
    * operator at all: the same ship-the-queries-to-the-data shape as x6,
    * amortizing the corpus scan across the whole batch. Per-probe rank
    * partitions on probe_id — N-way parallel, never single-partition. */
  def batchTopK(spark: SparkSession, sfDir: String, nProbes: Int = 10,
                k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes: Seq[(Long, Seq[Float])] = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < nProbes)
      .select(col("vec_id"), col("embedding"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    Tables.embeddings(spark, sfDir)
      .where(col("vec_id") >= nProbes)
      .select(col("vec_id"), col("embedding"),
        explode(typedLit(probes)).as("p"))
      .select(col("p._1").as("probe_id"), col("vec_id"),
        round(VectorFns.cosine(col("embedding"), col("p._2")), 6).as("cosine"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("vec_id"), col("cosine"))
      .orderBy(col("probe_id"), col("rnk"))
  }

  /** X35 — int8 scalar quantization of the embedding column: per-vector
    * min/max affine mapping to 0..255, the storage/shuffle-width lever for
    * vector search at scale (4× narrower than float32 — the difference
    * between shipping 256 B and 64 B per vector through every ANN
    * shuffle/broadcast; FAISS's `SQ8`). Emits the codebook params, an
    * integer checksum of the codes (exact oracle anchor), and the mean
    * absolute reconstruction error, which is bounded by
    * `(max−min)/255/2` per component — asserted by spec.
    *
    * Determinism: the code is `floor(t·255 + 0.5)` — explicit half-up in
    * exact double arithmetic, bit-identical across engines, instead of
    * `round()` whose tie-breaking is dialect-specific. Constant vectors
    * (max == min) map to code 0 with scale 1 (no div-by-zero). */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val v = VectorFns.asDouble(col("embedding"))
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = when(col("mx") === col("mn"), lit(1.0))
      .otherwise(col("mx") - col("mn"))
    val code = transform(v, x =>
      floor((x - col("mn")) / col("sc") * 255.0 + 0.5).cast("long"))
    val dequant = (c: org.apache.spark.sql.Column) =>
      col("mn") + c.cast("double") / 255.0 * col("sc")
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), mn.as("mn"), mx.as("mx"))
      .withColumn("sc", scale)
      .withColumn("q", code)
      .select(col("vec_id"),
        round(col("mn"), 6).as("qmin"),
        round(col("mx"), 6).as("qmax"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("code_sum"),
        round(
          aggregate(zip_with(VectorFns.asDouble(col("embedding")), col("q"),
            (x, c) => abs(x - dequant(c))), lit(0.0), (a, e) => a + e)
            / size(col("q")), 6).as("mean_abs_err"))
      .orderBy(col("vec_id"))
  }

  /** Pairwise label-centroid similarity matrix — a tiny all-pairs on an
    * already-reduced aggregate (10×10), the legitimate use of cross join. */
  def centroidMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = 64
    val c = Tables.embeddings(spark, sfDir).groupBy(col("label"))
      .agg(array((0 until dim).map(i =>
        avg(element_at(VectorFns.asDouble(col("embedding")), i + 1))): _*).as("centroid"))
    c.as("a").join(c.as("b"), col("a.label") < col("b.label"))
      .select(col("a.label").cast("long").as("l1"), col("b.label").cast("long").as("l2"),
        round(VectorFns.cosine(col("a.centroid"), col("b.centroid")), 6).as("cosine"))
      .orderBy(col("l1"), col("l2"))
  }
}
