// Plan-capture script (guide ?1/?7.2): runs each named declared query
// (fixture setup executes, so the final DataFrame reflects the maintained
// artifact) and writes its `.explain("formatted")` text to
// $PLAN_DIR/<query>_$PLAN_SUFFIX.txt -- the committed before/after plan
// evidence for the optimization rounds.
//
// Usage:
//   PLAN_QUERIES=t24_...,t26_... PLAN_DIR=/root/repo/plans/r18 \
//   SF_DIR=/root/testdata/sf0.001 PLAN_SUFFIX=before \
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --driver-class-path /root/repo/target/scala-2.13/classes \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --conf spark.sql.shuffle.partitions=8 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.adaptive.enabled=true \
//     --conf spark.ui.enabled=false \
//     -i /root/repo/tools/dump_plans.scala < /dev/null
{
  val sfDir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.001")
  val outDir = sys.env.getOrElse("PLAN_DIR", "/root/repo/plans/r18")
  val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
  val names = sys.env.getOrElse("PLAN_QUERIES", "").split(",").map(_.trim)
    .filter(_.nonEmpty).toSeq
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
  spark.sparkContext.setLogLevel("ERROR")
  graft.Tables.ensureParquetConf(spark)
  names.foreach { name =>
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))
    try {
      val df = fn(spark, sfDir)
      val text = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        text.getBytes("UTF-8"))
      println(s"[plans] wrote $name ($suffix)")
    } catch { case e: Throwable =>
      println(s"[plans] FAILED $name: ${e.getMessage}")
    }
  }
}
System.exit(0)
