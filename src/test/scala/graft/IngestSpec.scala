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
    val out = graft.Tables.scratchDir("graft_idem").toString
    Ingest.land(spark, sf, out)
    val first = spark.read.orc(out).count()
    Ingest.land(spark, sf, out)
    val second = spark.read.orc(out).count()
    assert(first == second)
  }

  test("compaction collapses small files, preserves rows, cleans up") {
    import graft.sources.Landing
    val out = graft.Tables.scratchDir("graft_compact_spec").toString
    Ingest.enriched(spark, sf).repartition(8)
      .write.mode("overwrite").partitionBy("logdate").orc(out)
    val before = Landing.partitionFileStats(spark, out)
    val fragmented = before.count(_._2 > 1)
    assert(fragmented > 0, s"fixture should land some fragmentation, got $before")
    val rowsBefore = spark.read.orc(out).count()
    val report = Landing.compactPartitions(spark, out, "logdate")
    assert(report.size == fragmented)
    assert(report.forall(_._3 == 1),
      s"every compacted partition should hold one file: $report")
    val after = Landing.partitionFileStats(spark, out)
    assert(after.forall(_._2 == 1))
    assert(spark.read.orc(out).count() == rowsBefore)
    // staging/trash must be gone — the swap completed and cleaned up
    val root = new org.apache.hadoop.fs.Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root.getParent,
      "." + root.getName + "_compact_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root.getParent,
      "." + root.getName + "_compact_trash")))
    // idempotent: nothing left to compact
    assert(Landing.compactPartitions(spark, out, "logdate").isEmpty)
  }

  test("compaction restores a partition stranded in trash by a crashed swap") {
    import graft.sources.Landing
    import org.apache.hadoop.fs.Path
    val out = graft.Tables.scratchDir("graft_crash_spec").toString
    Ingest.enriched(spark, sf).repartition(4)
      .write.mode("overwrite").partitionBy("logdate").orc(out)
    val rowsBefore = spark.read.orc(out).count()
    val root = new Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between the two swap renames: one partition's only
    // copy sits in the trash dir, gone from the live tree
    val victim = Landing.partitionFileStats(spark, out).head._1
    val trash = new Path(root.getParent, "." + root.getName + "_compact_trash")
    fs.mkdirs(trash)
    require(fs.rename(new Path(root, victim), new Path(trash, victim)))
    assert(spark.read.orc(out).count() < rowsBefore) // partition really gone
    // re-running compaction must restore the stranded copy BEFORE cleaning,
    // then proceed; no rows may be lost
    Landing.compactPartitions(spark, out, "logdate")
    assert(spark.read.orc(out).count() == rowsBefore)
    assert(!fs.exists(trash))
  }

  test("compaction is single-flight: a held lock refuses the run; a finished run releases it") {
    import graft.sources.Landing
    import org.apache.hadoop.fs.Path
    val out = graft.Tables.scratchDir("graft_lock_spec").toString
    Ingest.enriched(spark, sf).repartition(4)
      .write.mode("overwrite").partitionBy("logdate").orc(out)
    val root = new Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new Path(root.getParent, "." + root.getName + "_compact_lock")
    // a concurrent (or hard-crashed) run holds the lock: refuse LOUDLY —
    // two compactions sharing staging/trash could destroy a mid-swap
    // partition's only copy
    fs.create(lock, false).close()
    val e = intercept[IllegalArgumentException](
      Landing.compactPartitions(spark, out, "logdate"))
    assert(e.getMessage.contains("lock"), s"unexpected message: ${e.getMessage}")
    fs.delete(lock, false)
    // with the lock clear the run proceeds and releases it afterwards
    val report = Landing.compactPartitions(spark, out, "logdate")
    assert(report.nonEmpty)
    assert(!fs.exists(lock), "a completed run must release the lock")
  }

  test("retention drops expired partitions transactionally and is idempotent") {
    import graft.sources.Landing
    import org.apache.hadoop.fs.Path
    val out = graft.Tables.scratchDir("graft_retain_spec").toString
    Ingest.enriched(spark, sf)
      .withColumn("logday", substring(col("logdate"), 1, 8))
      .write.mode("overwrite").partitionBy("logday").orc(out)
    val days = Landing.partitionFileStats(spark, out).map(_._1.split("=")(1)).sorted
    assert(days.size >= 3, s"fixture spans $days")
    val cutoff = days(1) // keep from the second day on
    val expectKept = spark.read.orc(out)
      .where(col("logday").cast("string") >= cutoff).count()
    val dropped = Landing.dropPartitionsBefore(spark, out, "logday", cutoff)
    assert(dropped == Seq(s"logday=${days.head}"))
    assert(spark.read.orc(out).count() == expectKept)
    // idempotent: nothing else expires
    assert(Landing.dropPartitionsBefore(spark, out, "logday", cutoff).isEmpty)
    // crash recovery: a partition stranded in retention trash by a crash
    // is purged (NOT restored) by the next run
    val root = new Path(out)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new Path(root.getParent, "." + root.getName + "_retention_trash")
    fs.mkdirs(trash)
    require(fs.rename(new Path(root, s"logday=${days(1)}"), new Path(trash, s"logday=${days(1)}")))
    Landing.dropPartitionsBefore(spark, out, "logday", cutoff)
    assert(!fs.exists(trash))
    assert(spark.read.orc(out).select("logday").distinct().count() == days.size - 2)
  }

  test("landing layout is partition-pruned on read") {
    val out = graft.Tables.scratchDir("graft_prune").toString
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
