package graft

import org.apache.spark.sql.functions._

/** The two remaining 100 TB surfaces not exercised by declared queries:
  *
  *  - **Bucketed co-located joins** — the charter's "pre-partition once,
  *    join many times" lever: both fact tables written `bucketBy` the join
  *    key means repeated joins plan NO shuffle exchange on either side.
  *    At 100 TB this converts every recurring fact⋈fact join from a full
  *    cluster shuffle into a local per-bucket merge.
  *  - **The SQL entry point** — every declared operator is DataFrame-first,
  *    but the engine is also usable through `spark.sql` over registered
  *    views; the two surfaces must agree exactly (same Catalyst plans
  *    underneath).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed co-located join plans no shuffle on the join keys") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a shuffle-class join so the bucketing (not a broadcast) is
      // what eliminates the exchanges; AQE off so the assert sees the
      // static plan
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      Tables.lineitem(spark, sf).write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, sf).write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        s"probe side still shuffles despite bucketing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"build side still shuffles despite bucketing:\n$plan")
      // and the co-located join is still the same join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        expected.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("spark.sql over registered views matches the DataFrame surface") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    val sqlForm = spark.sql(
      """SELECT o_orderpriority, count(*) AS n_items,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    val dfForm = operators.Relational.innerJoinAgg(spark, sf)
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }
}
