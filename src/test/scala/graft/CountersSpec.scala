package graft

import graft.operators.Counters
import org.apache.spark.sql.functions._

/** A-family unit tests: completeness thresholds, upsert latest-wins,
  * partial→final merge equivalence (SURVEY.md §5.2-5.3). */
class CountersSpec extends SparkSpec {
  import spark.implicits._

  test("completeness threshold n-1 / n / n+1 (A5, HiveSinkDetailDao.scala:42-61)") {
    val all = Counters.completeness(spark, sf, n = 1).count()
    val some = Counters.completeness(spark, sf, n = 5).count()
    val none = Counters.completeness(spark, sf, n = 6).count()
    assert(all >= some && some >= none)
    assert(none == 0) // only 5 synthetic hosts exist
  }

  test("upsert latest-wins (T7): one row per key, max ts kept") {
    val up = Counters.upsertLatest(spark, sf)
    val keys = up.groupBy($"user_id", $"event_type").count().where($"count" > 1).count()
    assert(keys == 0)
    val direct = Tables.events(spark, sf)
      .groupBy($"user_id", $"event_type")
      .agg(max(graft.functions.Times.epochSeconds($"ts")).as("m"))
    val joined = up.join(direct, Seq("user_id", "event_type"))
      .where($"last_epoch" =!= $"m").count()
    assert(joined == 0)
  }

  test("window counts partial→final equals direct total (A2/A3)") {
    val total = Counters.windowCounts(spark, sf).agg(sum("cnt")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
    val catTotal = Counters.categoryWindowCounts(spark, sf).agg(sum("cnt")).head.getLong(0)
    assert(catTotal == total)
  }

  test("a2c hopping windows tile the tumbling counts (size/slide = 2)") {
    val hop = Counters.hoppingCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tumb = Counters.windowCounts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each hop window [s, s+600) is exactly tumbling bucket s + bucket s+300
    hop.foreach { case (s, (e, n)) =>
      assert(e == s + 600, "window length must be 10 minutes")
      assert(n == tumb.getOrElse(s, 0L) + tumb.getOrElse(s + 300, 0L),
        s"window $s count $n != tumbling sum")
    }
    // every event lands in exactly size/slide = 2 windows
    assert(hop.values.map(_._2).sum == 2 * tumb.values.sum)
  }

  test("x64 funnel: sequencing, window edges and first-qualifying semantics") {
    // u1 full conversion; u2 click only BEFORE its view; u3 click exactly at
    // the 72 h edge (in) then purchase 1 s past its edge (out); u4 never
    // views; u5's first purchase precedes its click (skipped), second counts
    val ev = Seq(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (2L, "click", 90L), (2L, "view", 100L),
      (3L, "view", 100L), (3L, "click", 100L + 259200L),
      (3L, "purchase", 100L + 259200L + 259201L),
      (4L, "click", 10L), (4L, "purchase", 20L),
      (5L, "view", 100L), (5L, "click", 200L),
      (5L, "purchase", 150L), (5L, "purchase", 250L)
    ).toDF("user_id", "event_type", "t")
    val rows = Counters.funnelStepsOf(ev).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows("view") == ((4L, 0L)))          // u1,u2,u3,u5
    assert(rows("click") == ((3L, 259400L)))    // u1(100)+u3(259200)+u5(100)
    assert(rows("purchase") == ((2L, 150L)))    // u1(100)+u5(50)
  }

  test("x65 cohort cells: offset-0 completeness and event conservation") {
    val ev = Seq((1L, 10L), (1L, 11L), (1L, 13L),
      (2L, 10L), (2L, 10L), (2L, 11L), (3L, 12L)).toDF("user_id", "d")
    val cells = Counters.cohortRetentionOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(cells == Map(
      (10L, 0L) -> ((2L, 3L)), (10L, 1L) -> ((2L, 2L)),
      (10L, 3L) -> ((1L, 1L)), (12L, 0L) -> ((1L, 1L))))
    // on the fixture: every user is active at offset 0, and cells conserve
    // the total event count
    val fix = Counters.cohortRetention(spark, sf)
    val atZero = fix.where($"day_offset" === 0).agg(sum("active_users")).head.getLong(0)
    assert(atZero == Tables.events(spark, sf).select($"user_id").distinct().count())
    assert(fix.agg(sum("n_events")).head.getLong(0) == Tables.events(spark, sf).count())
  }

  test("a2d interpolation: holes bridge linearly, ends clamp, observed rows untouched") {
    // cat A observed at buckets 0 (cnt 10) and 900 (cnt 40): two holes at
    // 300/600 interpolate 20/30; cat B observed only at 300: single point
    val obs = Seq(("A", 0L, 10L), ("A", 900L, 40L), ("B", 300L, 7L))
      .toDF("category", "b", "cnt")
    val got = Counters.interpTimelineOf(obs).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(got == Map(
      ("A", 0L) -> ((true, 10L)), ("A", 300L) -> ((false, 20L)),
      ("A", 600L) -> ((false, 30L)), ("A", 900L) -> ((true, 40L)),
      ("B", 300L) -> ((true, 7L))))
    // fixture invariants: observed rows reproduce a3's counts exactly, and
    // every interpolated value lies within its category's observed range
    val fix = Counters.interpTimeline(spark, sf)
    val a3 = Counters.categoryWindowCounts(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0)) -> r.getLong(2)).toMap
    val rows = fix.collect()
    rows.filter(_.getBoolean(2)).foreach { r =>
      assert(a3((r.getString(0), r.getLong(1))) == r.getLong(3)) }
    val range = rows.filter(_.getBoolean(2)).groupBy(_.getString(0))
      .view.mapValues(rs => (rs.map(_.getLong(3)).min, rs.map(_.getLong(3)).max)).toMap
    rows.filterNot(_.getBoolean(2)).foreach { r =>
      val (lo, hi) = range(r.getString(0))
      assert(r.getLong(3) >= lo && r.getLong(3) <= hi,
        s"interpolated ${r.getLong(3)} escapes [$lo,$hi]")
    }
  }

  test("a2e anomaly flags: spike flags, the exact-kσ boundary does not, warm-up never") {
    val base = 1000000000L
    // series c: trailing window {8,12,8,12} → mean 10, σ = 2 (n·ss − s² =
    // 4·416 − 1600 = 64); cnt 16 sits EXACTLY at 3σ (24² = 576 = 9·64, a
    // strict > must not fire) while 17 exceeds it (28² = 784 > 576)
    val series = Seq(
      ("a", 0, 10L), ("a", 1, 10L), ("a", 2, 10L), ("a", 3, 10L), ("a", 4, 100L),
      ("b", 0, 8L), ("b", 1, 12L), ("b", 2, 8L), ("b", 3, 12L), ("b", 4, 16L),
      ("c", 0, 8L), ("c", 1, 12L), ("c", 2, 8L), ("c", 3, 12L), ("c", 4, 17L),
      ("d", 0, 5L), ("d", 1, 500L))
      .map { case (c, i, n) => (c, base + i * 300L, n) }
      .toDF("category", "bucket_epoch", "cnt")
    val got = Counters.anomalyFlagsOf(series, 4, 3, 3).collect()
      .map(r => (r.getString(0), (r.getLong(1) - base) / 300) -> r.getLong(4)).toMap
    assert(got(("a", 4)) == 1L, "zero-variance spike must flag")
    assert(got(("b", 4)) == 0L, "exactly kσ must NOT flag (strict inequality)")
    assert(got(("c", 4)) == 1L, "beyond kσ must flag")
    assert(got(("d", 1)) == 0L, "warm-up buckets (trail_n < minN) never flag")
    assert(got.valuesIterator.count(_ == 1L) == 2, "nothing else flags")
  }

  test("a2e: the decimal z-test is exact where Long cross-products wrap") {
    // per-bucket counts around 10^10: cnt² ≈ 10^20 overflows a Long SUM
    // (wraps at ~9.2·10^18) and (n·x−s)² overflows the Long product —
    // both sides now run in decimal(38,0), so the engine must agree with
    // an exact BigInt reference on a boundary the old math got wrong
    val base = 1000000000L
    val big = 10000000000L // 1e10
    // trailing window {big, big+4, big, big+4}: n·ss−s² = 64 exactly —
    // the 1e20-scale terms cancel, so any wrap destroys the variance.
    // dev(x) = 4x − (4·big+8): x = big+9 → dev 28, 784 > 9·64 = 576 →
    // flags; x = big+8 → dev 24, 576 = 576 sits EXACTLY at kσ and the
    // strict > must not fire
    val series = Seq(
      ("h", 0, big), ("h", 1, big + 4), ("h", 2, big), ("h", 3, big + 4),
      ("h", 4, big + 9),
      ("i", 0, big), ("i", 1, big + 4), ("i", 2, big), ("i", 3, big + 4),
      ("i", 4, big + 8))
      .map { case (c, j, n) => (c, base + j * 300L, n) }
      .toDF("category", "bucket_epoch", "cnt")
    val got = Counters.anomalyFlagsOf(series, 4, 3, 3).collect()
      .map(r => (r.getString(0), (r.getLong(1) - base) / 300) -> r.getLong(4)).toMap
    // independent exact reference in BigInt over the same windows
    def ref(window: Seq[Long], x: Long): Long = {
      val n = BigInt(window.size)
      val s = window.map(BigInt(_)).sum
      val ss = window.map(v => BigInt(v) * v).sum
      val dev = n * x - s
      if (window.size >= 3 && dev * dev > 9 * (n * ss - s * s)) 1L else 0L
    }
    val w = Seq(big, big + 4, big, big + 4)
    assert(ref(w, big + 9) == 1L && ref(w, big + 8) == 0L,
      "the fixture must straddle the flag boundary")
    assert(got(("h", 4)) == 1L, "beyond kσ at 1e10 scale must flag (Long math wrapped here)")
    assert(got(("i", 4)) == 0L, "exactly kσ at 1e10 scale must not flag")
  }

  test("x76: merged base+delta aggregate equals the monolithic recompute row-for-row") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Headers, Times}
    val merged = operators.Counters.aggDeltaMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // the monolithic form: one aggregate over ALL events, no split, no
    // stored base, no merge — what the incremental path must reproduce
    val full = Tables.events(spark, sf)
      .select(Headers.categoryOrDefault(col("event_type")).as("category"),
        Times.epochSeconds(col("ts")).as("es"),
        floor(col("value") * 1000000L + lit(0.5)).cast("long").as("v_micro"))
      .groupBy(col("category"), (col("es") - (col("es") % 300L)).as("bucket"))
      .agg(count(lit(1)).as("n"), max(col("es")).as("mx"),
        sum(col("v_micro")).as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged == full)
    // the fixture must actually split: both sides of the cut non-empty,
    // or the merge never exercised (guards a degenerate cut)
    val es = Tables.events(spark, sf)
      .select(Times.epochSeconds(col("ts")).as("es"))
      .agg(min(col("es")), max(col("es"))).head()
    val cut = es.getLong(0) + 2 * ((es.getLong(1) - es.getLong(0)) / 3)
    val sides = Tables.events(spark, sf)
      .select(Times.epochSeconds(col("ts")).as("es"))
      .agg(sum(when(col("es") < cut, 1L).otherwise(0L)),
        sum(when(col("es") >= cut, 1L).otherwise(0L))).head()
    assert(sides.getLong(0) > 0 && sides.getLong(1) > 0,
      s"degenerate cut: base=${sides.getLong(0)} delta=${sides.getLong(1)}")
  }

  test("x22b sketch quantiles track the exact form (a7b pattern for percentiles)") {
    val exact = operators.TextAnalysis.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val approx = operators.TextAnalysis.lengthQuantilesApprox(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (lang, es) =>
      es.zip(approx(lang)).foreach { case (e, a) =>
        // sketch returns an actual data value near the exact (interpolated)
        // rank; on token-count data adjacent values differ by a few tokens
        assert(math.abs(e - a) <= math.max(5.0, 0.1 * e),
          s"$lang: approx $a too far from exact $e")
      }
    }
  }
}
