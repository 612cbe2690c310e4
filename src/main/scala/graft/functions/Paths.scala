package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-path template rendering and spec parsing.
  *
  * The reference renders `%Y%m%d`-style time escapes and `%{header}`
  * references into `<root>/<k=v/...>/<filePrefix>` per event
  * (`/root/reference/.../HiveBatchedSink.scala:311-315` via Flume's
  * BucketPath) and parses specs back with substring scans
  * (`util/HiveUtils.scala:126-139`). Here both directions are plain
  * Catalyst string expressions, evaluated per-row inside codegen; at
  * scale Spark's `partitionBy` consumes the rendered columns directly,
  * so no path string ever needs to exist in the hot path.
  */
object Paths {

  /** Hive-style partition-value escaping (percent-encoding of the characters
    * that are structural in a `k=v/k2=v2` spec), so render∘parse = id for any
    * value. Hive's FileUtils.escapePathName does the same for its partition
    * paths; the reference inherits it via BucketPath/metastore. `%` must be
    * escaped first on the way in and last on the way out. */
  def escapeValue(v: Column): Column =
    translateSeq(v, Seq("%" -> "%25", "/" -> "%2F", "=" -> "%3D"))

  def unescapeValue(v: Column): Column =
    translateSeq(v, Seq("%2F" -> "/", "%3D" -> "=", "%25" -> "%"))

  private def translateSeq(v: Column, subs: Seq[(String, String)]): Column =
    subs.foldLeft(v) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** P2: render a `k1=v1/k2=v2` partition spec from (key, value-column) pairs. */
  def renderSpec(parts: (String, Column)*): Column =
    concat_ws("/", parts.map { case (k, v) => concat_ws("=", lit(k), escapeValue(v)) }: _*)

  /** P2: full path `<root>/<spec>` (HiveBatchedSink.scala:314). */
  def renderPath(root: String, spec: Column): Column =
    concat_ws("/", lit(root), spec)

  /** P5: `getPartitionValue(spec, key)` (HiveUtils.scala:126-133) —
    * the value after `key=` up to the next `/`. Empty string if absent. */
  def partitionValue(spec: Column, key: String): Column =
    unescapeValue(regexp_extract(spec, java.util.regex.Pattern.quote(key) + "=([^/]*)", 1))

  /** P5: `getPartitionValues(spec)` (HiveUtils.scala:135-139) —
    * all right-hand sides in order. `try_element_at` keeps malformed
    * segments (no `=`) as null instead of throwing under ANSI mode. */
  def partitionValues(spec: Column): Column =
    transform(split(spec, "/"), kv => unescapeValue(try_element_at(split(kv, "="), lit(2))))

  /** Spec as a map (engine extra; `str_to_map` is the natural Spark form). */
  def partitionMap(spec: Column): Column = str_to_map(spec, lit("/"), lit("="))
}
