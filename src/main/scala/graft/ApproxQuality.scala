package graft

import graft.operators.{Counters, Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality evidence for the approximate-operator family — the seven rows
  * the correctness gate records as `no_oracle` by design (a7b, a12, x2,
  * x3, x5b, x22b, x41 — the x6 family graduated to full retrained DuckDB
  * oracles; its overlap metrics stay here as extra evidence): each is
  * measured here against its EXACT in-engine baseline and the numbers
  * are emitted as `APPROX_QUALITY.json` by [[Verify]], so the no-oracle
  * rows carry regenerated-per-round evidence instead of only in-suite
  * assertions. The artifact's `per_query` block ([[perQuery]]) keys the
  * verdicts by declared query name, and `tools/merge_floors.py` joins
  * them into `CORRECTNESS_r{N}.json`'s no-oracle rows so one artifact
  * carries the whole correctness story. A spec pins floors on the same
  * numbers so a quality regression fails the build, not just the report.
  *
  * Every metric is driver-bounded at the verify scale factor: near-dup
  * pair sets (tens of rows), top-k lists, per-category scalars. The one
  * quadratic baseline (`embedCosineAllPairs`) is the reason this runs at
  * the VERIFY sf, never the bench sf.
  */
object ApproxQuality {

  /** (metric → value) rows; deterministic order for stable JSON diffs. */
  def metrics(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    // x2/x3 — recall of the exact J≥0.8 near-dup pairs (x4's verified set)
    // through minhash banding / simhash hamming≤3 chunk banding
    val exactJ = pairSet(Dedup.ngramJaccard(spark, sfDir, 0.8))
    val mh = pairSet(Dedup.minhashLsh(spark, sfDir))
    val sh = pairSet(Dedup.simhashDedup(spark, sfDir))
    def recall(found: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 1.0 else truth.intersect(found).size.toDouble / truth.size

    // x5b — recall AND precision vs the exact all-pairs cosine baseline
    // (precision is 1.0 by construction: cosine is exact within buckets)
    val exactCos = pairSet(Dedup.embedCosineAllPairs(spark, sfDir, 0.4))
    val lshCos = pairSet(Dedup.embedCosineLsh(spark, sfDir, 0.4))
    val x5bPrecision =
      if (lshCos.isEmpty) 1.0 else lshCos.intersect(exactCos).size.toDouble / lshCos.size

    // x6b — overlap@10 with the exact brute-force top-10
    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val brute = ids(Similarity.bruteTopK(spark, sfDir, 0L, 10))
    val ivf = ids(Similarity.ivfTopK(spark, sfDir, 0L, 10, 4))
    val x6bOverlap = brute.intersect(ivf).size.toDouble / brute.size

    // x6g — overlap@10 of the composed IVF-PQ (+refine) with the exact
    // integer-L2 top-10 (the rerank metric); both approximation sources
    // (cell pruning, code quantization) are in the loop
    val bruteL2 = ids(Similarity.bruteL2TopK(spark, sfDir, 0L, 10))
    val ivfpq = ids(Similarity.ivfPqTopK(spark, sfDir, 0L, 10, 4))
    val x6gOverlap = bruteL2.intersect(ivfpq).size.toDouble / bruteL2.size

    // a7b — HLL++ max relative error vs exact per-category distinct users
    val exactUsers = Counters.distinctCounts(spark, sfDir).collect()
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1)).toMap
    val approxUsers = Counters.approxDistinct(spark, sfDir).collect()
      .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1)).toMap
    val a7bErr = exactUsers.map { case (c, e) =>
      math.abs(approxUsers(c) - e).toDouble / math.max(e, 1L) }.max

    // a12 — DataSketches HLL union estimate vs exact (per category + ALL,
    // on the category-defaulted key the sketch query groups by)
    val catOrDefault = graft.functions.Headers.categoryOrDefault(col("event_type"))
    val exactByCat = Tables.events(spark, sfDir)
      .groupBy(catOrDefault.as("category"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    val a12Err = Counters.hllSketchUsers(spark, sfDir).collect().map { r =>
      val e = if (r.getString(0) == "ALL") exactAll else exactByCat(r.getString(0))
      math.abs(r.getLong(1) - e).toDouble / math.max(e, 1L)
    }.max

    // x22b — sketch percentile max relative deviation from the exact form
    def quants(df: DataFrame): Map[String, Seq[Double]] = df.collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val eq = quants(TextAnalysis.lengthQuantiles(spark, sfDir))
    val aq = quants(TextAnalysis.lengthQuantilesApprox(spark, sfDir))
    val x22bErr = eq.map { case (lang, es) =>
      es.zip(aq(lang)).map { case (e, a) => math.abs(e - a) / math.max(e, 1.0) }.max
    }.max

    // x41 — exact JVM differential: the engine's per-partition deflate
    // must equal an independent driver-side deflate row-for-row (no SQL
    // deflate exists, so this differential IS x41's oracle; 0 mismatches
    // is an exact-parity claim, not a floor)
    val engineRatio = TextAnalysis.compressionRatio(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val deflater = new java.util.zip.Deflater(6)
    val dbuf = new Array[Byte](1 << 16)
    val x41Mismatches = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect().count { r =>
        val raw = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        deflater.reset(); deflater.setInput(raw); deflater.finish()
        var n = 0L
        while (!deflater.finished()) n += deflater.deflate(dbuf)
        engineRatio.get(r.getLong(0)) !=
          Some((raw.length.toLong, n, n * 1000000L / math.max(raw.length.toLong, 1L)))
      }

    Seq(
      "x2_minhash_recall_at_j08" -> recall(mh, exactJ),
      "x3_simhash_recall_at_j08" -> recall(sh, exactJ),
      "x4_exact_pairs" -> exactJ.size.toDouble,
      "x5b_embed_lsh_recall" -> recall(lshCos, exactCos),
      "x5b_embed_lsh_precision" -> x5bPrecision,
      "x5b_exact_pairs" -> exactCos.size.toDouble,
      "x6b_ivf_overlap_at_10" -> x6bOverlap,
      "x6g_ivfpq_overlap_at_10" -> x6gOverlap,
      "a7b_hllpp_max_rel_err" -> a7bErr,
      "a12_hll_sketch_max_rel_err" -> a12Err,
      "x22b_quantile_max_rel_dev" -> x22bErr,
      "x41_deflate_differential_mismatches" -> x41Mismatches.toDouble)
  }

  /** The quality bars each metric must clear — the SINGLE source of truth:
    * `DedupSimilaritySpec` asserts exactly these, and [[json]] writes them
    * into `APPROX_QUALITY.json` next to the measurements, so the artifact
    * is self-describing and the gate can never drift from the report.
    * Floors are set to DEMAND quality (raised whenever an operator is
    * improved), not to ratify the current measurement — round 7 raised
    * x5b/x6b/x6g/a7b/x22b to within a small honest margin of the
    * measured values at both verify SFs. */
  val bounds: Seq[(String, String, Double)] = Seq(
    ("x2_minhash_recall_at_j08", ">=", 0.95),
    ("x3_simhash_recall_at_j08", ">=", 0.85),
    ("x5b_embed_lsh_recall", ">=", 0.85),
    ("x5b_embed_lsh_precision", ">=", 0.95),
    ("x6b_ivf_overlap_at_10", ">=", 0.85),
    ("x6g_ivfpq_overlap_at_10", ">=", 0.85),
    ("a7b_hllpp_max_rel_err", "<=", 0.02),
    ("a12_hll_sketch_max_rel_err", "<=", 0.05),
    ("x22b_quantile_max_rel_dev", "<=", 0.06),
    ("x41_deflate_differential_mismatches", "<=", 0.0))

  /** Declared-query-name → quality-metric mapping for the rows the
    * correctness gate records as `no_oracle`: the [[json]] artifact's
    * `per_query` block keys the floor evidence by the EXACT query name,
    * so each no-oracle row in `CORRECTNESS_r{N}.json` has a one-join
    * pointer to its measured value + verdict (`approx_floor_ok`) —
    * `tools/merge_floors.py` performs that join mechanically. */
  val perQuery: Seq[(String, Seq[String])] = Seq(
    "x2_dedup_minhash" -> Seq("x2_minhash_recall_at_j08"),
    "x3_dedup_simhash" -> Seq("x3_simhash_recall_at_j08"),
    "x5b_embed_neardup_lsh" ->
      Seq("x5b_embed_lsh_recall", "x5b_embed_lsh_precision"),
    "a7b_approx_distinct" -> Seq("a7b_hllpp_max_rel_err"),
    "a12_hll_sketch_union" -> Seq("a12_hll_sketch_max_rel_err"),
    "x22b_length_quantiles_approx" -> Seq("x22b_quantile_max_rel_dev"),
    "x41_compression_ratio" -> Seq("x41_deflate_differential_mismatches"))

  def boundHolds(name: String, value: Double): Boolean =
    bounds.find(_._1 == name).forall {
      case (_, ">=", b) => value >= b
      case (_, "<=", b) => value <= b
      case _ => true
    }

  def json(spark: SparkSession, sfDir: String): String = {
    def fmt(v: Double): String =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toString
    val measured = metrics(spark, sfDir)
    val mm = measured.toMap
    val ms = measured
      .map { case (k, v) => s""""$k": ${fmt(v)}""" }
      .mkString(",\n  ")
    val bs = bounds
      .map { case (k, op, b) => s""""$k": "$op $b"""" }
      .mkString(",\n    ")
    val pq = perQuery.map { case (query, names) =>
      val ok = names.forall(n => boundHolds(n, mm(n)))
      val vals = names.map(n => s""""$n": ${fmt(mm(n))}""").mkString(", ")
      s""""$query": {"approx_floor_ok": $ok, $vals}"""
    }.mkString(",\n    ")
    s"""{\n  $ms,\n  "bounds": {\n    $bs\n  },\n  "per_query": {\n    $pq\n  },\n  "sf": "$sfDir"\n}\n"""
  }
}
