package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** T6 — the fleet-completeness watermark as a `StreamingQueryListener`.
  *
  * The reference runs a leader thread that polls ZooKeeper membership and a
  * JDBC bookkeeping table every 5 s to decide which logdates are complete,
  * then notifies a scheduler per finished logdate
  * (`/root/reference/.../HiveBatchedSink.scala:177-227`,
  * `dao/HiveSinkDetailDao.scala:42-70`). In Spark's single-coordinator
  * model the equivalent signal already exists: a time partition is complete
  * once the event-time watermark passes its window end. This listener
  * watches `QueryProgressEvent.eventTime.watermark`, compares it against
  * the logdates the landing epilogue registered, and fires `onComplete`
  * exactly once per finished partition — the entire ZK/JDBC polling
  * protocol collapses into one driver callback. */
final class CompletenessListener(roundSeconds: Long = 300L)(onComplete: String => Unit)
  extends StreamingQueryListener {

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMddHHmm")
  private val pending = new ConcurrentHashMap[String, Long]() // logdate → window-end epoch
  private val fired = ConcurrentHashMap.newKeySet[String]()

  /** Register a landed partition (the epilogue calls this per micro-batch;
    * idempotent across batches and restarts). */
  def registerLanded(logdate: String): Unit =
    if (!fired.contains(logdate)) {
      val end = LocalDateTime.parse(logdate, fmt).toEpochSecond(ZoneOffset.UTC) + roundSeconds
      pending.putIfAbsent(logdate, end)
    }

  /** Completed logdates so far (notification order not guaranteed). */
  def completed: Set[String] = {
    val b = Set.newBuilder[String]
    fired.forEach(ld => b += ld)
    b.result()
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryIdle(e: StreamingQueryListener.QueryIdleEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val wmStr = e.progress.eventTime.get("watermark")
    if (wmStr != null && wmStr.nonEmpty) {
      val wm = Instant.parse(wmStr).getEpochSecond
      pending.forEach { (ld, end) =>
        if (end <= wm && fired.add(ld)) {
          pending.remove(ld)
          onComplete(ld)
        }
      }
    }
  }
}
