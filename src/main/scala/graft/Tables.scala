package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loader. All operators take `(SparkSession, sfDir)` and load
  * their inputs here, so the same code runs at every scale factor — and, on a
  * real cluster, against any parquet root (s3://…, hdfs://…).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for: read nanos as long (SPARK-40819). Applied once per session by the
    * entry points (Bench/Verify/SparkSpec/entry) rather than as a hidden
    * side effect of every table load. */
  def ensureParquetConf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Scratch root for `spark.local.dir` (shuffle/spill/state-store working
    * files): tmpfs when the machine has one (`/dev/shm`), the JVM tmpdir
    * otherwise. Context-creation-time conf, so the entry points pass it to
    * their builders; cluster deployments set their own fast local dirs
    * (NVMe) the same way. */
  def scratchLocalDir(): String = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) shm.toPath
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    val dir = java.nio.file.Files.createTempDirectory(base, "graft_local_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Nanos arrive as long (see ensureParquetConf); truncate to a microsecond
    // TIMESTAMP — exactly what engines with µs timestamps (DuckDB included)
    // do on read, so semantics agree. Integer `div` (not `/`): nano epochs
    // exceed double's 2^53 exact range.
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def events(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
