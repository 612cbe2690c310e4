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
