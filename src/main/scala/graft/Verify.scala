package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.local.dir", Tables.scratchLocalDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.ensureParquetConf(spark)
    Tables.keepScratch(outDir) // the dump must survive the scratch reaper
    Tables.registerScratchReaper()
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a11,x31 dumps a subset — local iteration on new
    // queries without re-running all ~100 (driver never sets it)
    SparkEntry.selectedQueries
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // A thrown query must still appear in the correctness report as a
        // FAILURE (round 7 had 4 queries silently vanish from the
        // denominator): dump a one-row (err) placeholder — the driver's
        // DuckDB compare then reports rows/schema mismatch with the
        // exception text in the parquet instead of dropping the row.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        try {
          import spark.implicits._
          Seq(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(500)}")
            .toDF("err").coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(s"[verify] $name err-row dump failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Quality evidence for the no-oracle approximate operators — skipped
    // under a SPARK_GRAFT_ONLY subset run (local iteration) so the subset
    // path stays fast; the driver's full run always regenerates it, into
    // the dump dir AND the repo root (committed as a round artifact).
    if (sys.env.get("SPARK_GRAFT_ONLY").forall(_.trim.isEmpty)) {
      try {
        val aq = ApproxQuality.json(spark, sfDir)
        Files.writeString(Paths.get(s"$outDir/APPROX_QUALITY.json"), aq)
        Files.writeString(Paths.get("APPROX_QUALITY.json"), aq)
      } catch { case e: Throwable =>
        System.err.println(s"[verify] approx-quality report failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
