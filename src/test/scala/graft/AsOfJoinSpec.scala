package graft

import org.apache.spark.sql.functions._

/** Edge semantics of the native as-of operator (plans.AsOfJoin): the merge
  * contract a window-function emulation gets for free must hold in the
  * hand-written physical operator too. */
class AsOfJoinSpec extends SparkSpec {

  private def asof(leftRows: Seq[(Long, Long, String)],
                   rightRows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val left = leftRows.toDF("k", "t", "tag")
      .select(col("k").as("lk"), col("t").as("lt"), col("tag"))
    val right = rightRows.toDF("k", "t", "v")
      .select(col("k").as("rk"), col("t").as("rt"), col("v"))
    plans.AsOfJoin(left, right, left("lk"), right("rk"),
        left("lt"), right("rt"), right("v"), as = "asof_v")
      .select(col("tag"), col("asof_v"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
  }

  test("as-of picks the latest right at-or-before, ties inclusive") {
    val got = asof(
      leftRows = Seq((1L, 10L, "before"), (1L, 20L, "tie"), (1L, 35L, "after")),
      rightRows = Seq((1L, 20L, 200L), (1L, 30L, 300L)))
    // t=10: no right yet; t=20: the equal-time right COUNTS (<=);
    // t=35: latest of the two
    assert(got == Map("before" -> None, "tie" -> Some(200L), "after" -> Some(300L)))
  }

  test("as-of carries per key and never leaks across keys") {
    val got = asof(
      leftRows = Seq((1L, 50L, "k1"), (2L, 50L, "k2-none"), (3L, 50L, "k3")),
      rightRows = Seq((1L, 10L, 100L), (3L, 10L, 900L), (3L, 20L, 901L)))
    assert(got == Map("k1" -> Some(100L), "k2-none" -> None, "k3" -> Some(901L)))
  }

  test("as-of with empty right side yields all nulls") {
    val got = asof(Seq((1L, 10L, "a"), (2L, 20L, "b")), Seq.empty)
    assert(got == Map("a" -> None, "b" -> None))
  }

  test("as-of result equals the window-function form on the fixture") {
    val native = operators.Relational.asofJoinNative(spark, sf)
    val window = operators.Relational.asofJoin(spark, sf)
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    assert(native.count() > 0)
  }
}
