package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time bucketing / conversion column functions.
  *
  * Re-expresses the reference's time handling as codegen'd Catalyst
  * expressions instead of per-event `SimpleDateFormat` calls:
  *  - 5-min bucket floor `floor(ts/300000)*300000` →
  *    `/root/reference/.../util/TimedUtils.scala:44-49`
  *  - configurable rounding unit/value →
  *    `HiveBatchedSink.scala:258-271`, `util/CommonUtils.scala:35-40`
  *  - `logdate` partition-value format `yyyyMMddHHmm` →
  *    `Config.scala:66` (DEFAULT_DTE_LOGDATE_FORMAT)
  *  - time string ↔ epoch conversions → `util/CommonUtils.scala:30-33`
  *
  * All of these stay inside whole-stage codegen (no UDFs), so at 100 TB the
  * bucketing is a free map-side projection fused with the scan.
  */
object Times {

  /** Epoch seconds of the floor-aligned bucket containing `ts`.
    * Exact analogue of TimedUtils.scala:45 floor semantics. */
  def bucketEpoch(ts: Column, seconds: Long): Column =
    (floor(unix_timestamp(ts) / seconds) * seconds).cast("long")

  /** Bucket start as a timestamp. */
  def bucketStart(ts: Column, seconds: Long): Column =
    timestamp_seconds(bucketEpoch(ts, seconds))

  /** The reference's hard-coded 5-minute counter bucket (TimedUtils.scala:29). */
  def fiveMinBucket(ts: Column): Column = bucketStart(ts, 300L)

  /** convertTimestampToFiveMinStr analogue: "yyyyMMddHHmm" of the 5-min floor
    * (TimedUtils.scala:44-49). */
  def fiveMinStr(ts: Column): Column =
    date_format(fiveMinBucket(ts), "yyyyMMddHHmm")

  /** The `logdate` partition value for a configurable round window
    * (Config.scala:66 format; HiveBatchedSink.scala:258-271 rounding). */
  def logdate(ts: Column, roundSeconds: Long = 300L): Column =
    date_format(bucketStart(ts, roundSeconds), "yyyyMMddHHmm")

  /** convertTimeStringToTimestamp analogue (CommonUtils.scala:30-33). */
  def parseTime(s: Column, fmt: String): Column = to_timestamp(s, fmt)

  /** Whole epoch seconds (truncating, like `getTime/1000`). */
  def epochSeconds(ts: Column): Column = unix_timestamp(ts)
}
