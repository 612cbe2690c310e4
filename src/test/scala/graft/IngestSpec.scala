package graft

import graft.operators.Ingest
import org.apache.spark.sql.functions._

/** End-to-end pipeline test (SURVEY.md §5.4): land → read back → counts
  * equal source; re-run idempotent (the exactly-once property the reference
  * lacks, HiveBatchedSink.scala:335 FIXME). */
class IngestSpec extends SparkSpec {

  test("flagship lands partitioned ORC and accounts for every event") {
    val result = Ingest.flagship(spark, sf)
    val landedTotal = result.agg(sum("n_events")).head.getLong(0)
    val srcTotal = Tables.events(spark, sf).count()
    assert(landedTotal == srcTotal)
    assert(result.count() > 0)
  }

  test("re-landing is idempotent (dynamic partition overwrite)") {
    val out = java.nio.file.Files.createTempDirectory("graft_idem").toString
    Ingest.land(spark, sf, out)
    val first = spark.read.orc(out).count()
    Ingest.land(spark, sf, out)
    val second = spark.read.orc(out).count()
    assert(first == second)
  }

  test("landing layout is partition-pruned on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Ingest.land(spark, sf, out)
    val one = spark.read.orc(out).where(col("logdate") === "202401010000")
    val scan = one.queryExecution.executedPlan.toString
    // The partition predicate must reach the scan as a PartitionFilter
    // carrying the logdate literal — a post-scan Filter means every
    // partition was read and the test must fail.
    assert(scan.contains("PartitionFilters"), s"no PartitionFilters in plan:\n$scan")
    assert(raw"PartitionFilters: \[[^\]]*202401010000".r.findFirstIn(scan).isDefined,
      s"logdate literal not pushed into PartitionFilters:\n$scan")
    val direct = Tables.events(spark, sf)
      .where(graft.functions.Times.logdate(col("ts")) === "202401010000").count()
    assert(one.count() == direct)
  }
}
