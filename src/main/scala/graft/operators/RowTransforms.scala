package graft.operators

import graft.Tables
import graft.functions.{Headers, Paths, Times}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1/M2 — the projection / filter / row-transform family (SURVEY.md §2.2),
  * each reference mechanism as one codegen'd projection.
  */
object RowTransforms {

  /** P1 — serde parse: opaque JSON body → typed fields
    * (`serde/TextDeserializer.scala:44-68` surface). */
  def serdeParse(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("body", Ingest.propsSerde.parse(col("props")))
      .select(col("event_id"), col("event_type"), col("body.k").as("k"))
      .orderBy(col("event_id"))

  /** P1b — the delimited-serde path: the closest shape to a hand-written
    * `TextDeserializer` subclass (`serde/TextDeserializer.scala:68`) —
    * positional split + per-field casts against a declared schema. The
    * body is synthesized from event columns so the parse is verifiable:
    * serialize → parse must recover the original fields. */
  def delimitedParse(spark: SparkSession, sfDir: String): DataFrame = {
    val serde = graft.functions.DelimitedSerde(Seq(
      "category" -> org.apache.spark.sql.types.StringType,
      "val" -> org.apache.spark.sql.types.DoubleType), "|")
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        concat_ws("|", col("event_type"), col("value").cast("string")).as("body"))
      .withColumn("parsed", serde.parse(col("body")))
      .select(col("event_id"), col("parsed.category").as("category"),
        col("parsed.val").as("val"))
      .orderBy(col("event_id"))
  }

  /** P1c — the serde ERROR path: a production deserializer must classify
    * malformed input, not throw on it (the reference's P7 does exactly
    * this for timestamps — `util/TimedUtils.scala:82-93` maps unparsable
    * to `"invalid_timestamp"`; its JSON serde surface has no equivalent,
    * a gap a real pipeline hits on the first corrupt message). Corruption
    * is synthesized deterministically (every 10th event gets a leading
    * byte prepended — PREpended on purpose: Spark's Jackson tolerates
    * trailing garbage after a complete value while DuckDB's `json_valid`
    * does not, so only leading corruption classifies identically in both
    * engines). Malformed rows classify `is_valid=false` with null fields
    * and flow on — the engine-side analogue of PERMISSIVE mode, selectable
    * back out with one filter instead of killing the batch. */
  def malformedClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = when(col("event_id") % 10 === 0, concat(lit("x"), col("props")))
      .otherwise(col("props"))
    Tables.events(spark, sfDir)
      .select(col("event_id"), raw.as("raw"))
      .select(col("event_id"),
        get_json_object(col("raw"), "$").isNotNull.as("is_valid"),
        get_json_object(col("raw"), "$.k").cast("long").as("k_num"))
      .orderBy(col("event_id"))
  }

  /** P2 — path/partition template render (BucketPath.escapeString analogue,
    * `HiveBatchedSink.scala:311-315`). */
  def pathRender(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        Paths.renderPath("logs", Paths.renderSpec(
          "logdate" -> Times.logdate(col("ts")),
          "category" -> Headers.categoryOrDefault(col("event_type")))).as("path"))
      .orderBy(col("event_id"))

  /** P3/P4 — time floor + string↔epoch conversions
    * (`util/TimedUtils.scala:44-49`, `util/CommonUtils.scala:30-40`). */
  def timeConvert(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        Times.epochSeconds(col("ts")).as("epoch"),
        Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"),
        Times.fiveMinStr(col("ts")).as("five_min_str"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"))
      .orderBy(col("event_id"))

  /** P2∘P5 — spec render/parse round trip (`util/HiveUtils.scala:126-139`):
    * extractors recover exactly what the renderer wrote. */
  def partitionExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val spec = Paths.renderSpec(
      "logdate" -> Times.logdate(col("ts")),
      "category" -> Headers.categoryOrDefault(col("event_type")))
    Tables.events(spark, sfDir)
      .select(col("event_id"), spec.as("spec"),
        Paths.partitionValue(spec, "logdate").as("logdate_v"),
        Paths.partitionValue(spec, "category").as("category_v"))
      .orderBy(col("event_id"))
  }

  /** P6 — JSON encoding of the counter map entries
    * (`util/TimedUtils.scala:51-53` Gson analogue), built portably by
    * concatenation so byte-identical across engines. */
  def jsonEncode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("category"),
        Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"))
      .agg(count(lit(1)).as("cnt"), max(Times.epochSeconds(col("ts"))).as("last_epoch"))
      .select(col("category"), col("bucket_epoch"),
        concat(lit("{\"count\":"), col("cnt").cast("string"),
          lit(",\"timestamp\":"), col("last_epoch").cast("string"), lit("}")).as("counter_json"))
      .orderBy(col("category"), col("bucket_epoch"))

  /** P7 — header classification / defaulting (`util/TimedUtils.scala:82-93`).
    * Fixture events have no nulls, so nulls are synthesized via `nullif`
    * to exercise the sentinel paths deterministically. */
  def categoryDefault(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(Headers.categoryOrDefault(nullif(col("event_type"), lit("error"))).as("category"))
      .groupBy(col("category")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("category"))

  /** P7b — the timestamp-header sentinel paths (`util/TimedUtils.scala:85-93`):
    * missing header → "no_timestamp", unparsable → "invalid_timestamp", else
    * the 5-min bucket string. Raw headers are synthesized per event_type so
    * all three branches are exercised deterministically. */
  def timestampClassify(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_id"),
        when(col("event_type") === "error", lit(null).cast("string"))
          .when(col("event_type") === "click", lit("oops"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")).as("tsraw"))
      .select(col("event_id"), col("tsraw"),
        Headers.timestampClass(col("tsraw")).as("ts_class"))
      .orderBy(col("event_id"))

  /** P8 — filter/predicate + projection, shaped so both land in the
    * parquet scan (PushedFilters + pruned ReadSchema). */
  def filterProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") < lit("1996-01-01").cast("timestamp")
        && col("l_discount") >= 0.02 && col("l_discount") <= 0.08)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
}
