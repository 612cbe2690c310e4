package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P7 — header classification / defaulting.
  *
  * The reference buckets events under sentinel categories when headers are
  * missing or unparsable (`/root/reference/.../util/TimedUtils.scala:82-93`):
  * missing `category` → "no_category", missing `timestamp` → "no_timestamp",
  * unparsable `timestamp` → "invalid_timestamp". Expressed as codegen'd
  * conditional expressions.
  */
object Headers {
  val NoCategory = "no_category"
  val NoTimestamp = "no_timestamp"
  val InvalidTimestamp = "invalid_timestamp"

  /** TimedUtils.scala:82-84 — default missing category. */
  def categoryOrDefault(category: Column): Column =
    coalesce(category, lit(NoCategory))

  /** TimedUtils.scala:85-93 — classify a raw timestamp header into the
    * 5-min bucket string or a sentinel. `try_to_timestamp` mirrors the
    * reference's catch-NumberFormatException path. */
  def timestampClass(tsRaw: Column): Column =
    when(tsRaw.isNull, lit(NoTimestamp))
      .when(try_to_timestamp(tsRaw).isNull, lit(InvalidTimestamp))
      .otherwise(Times.fiveMinStr(try_to_timestamp(tsRaw)))
}
