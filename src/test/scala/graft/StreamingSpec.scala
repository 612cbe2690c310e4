package graft

import graft.streaming.StreamingIngest
import org.apache.spark.sql.functions._

/** M4 — streaming semantics tests (SURVEY.md §5.5): streaming results equal
  * batch results; the landing stream is checkpointed/exactly-once. */
class StreamingSpec extends SparkSpec {

  test("streaming 5-min×category counts equal the batch aggregation") {
    val stream = StreamingIngest.streamCounts(spark, sf).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(graft.functions.Times.bucketEpoch(col("ts"), 300L).as("bucket_epoch"),
        col("event_type").as("category"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("bucket_epoch"), col("category"))
      .collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("session_window stream matches batch gaps-and-islands session counts") {
    val streamed = StreamingIngest.sessionWindowStream(spark, sf, 1800L)
      .select(col("user_id"), col("n_sessions")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = StreamingIngest.sessionize(spark, sf, 1800L)
      .select(col("user_id"), col("n_sessions")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("landStream lands every event exactly once (checkpointed)") {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_land").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    StreamingIngest.landStream(spark, sf, out, ckpt)
    val landed = spark.read.orc(out).count()
    assert(landed == Tables.events(spark, sf).count())
    // second run with same checkpoint: no new data → no duplicates
    StreamingIngest.landStream(spark, sf, out, ckpt)
    assert(spark.read.orc(out).count() == landed)
  }
}
