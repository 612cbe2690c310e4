package graft.streaming

import java.time.format.DateTimeFormatter
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Durable record of which logdates have already been notified — the
  * reference's `state='CHECKED'` column (`dao/HiveSinkDetailDao.scala:64-70`).
  * Backing it with the bookkeeping table ([[JdbcCompletenessStore]]) makes
  * the exactly-once-per-logdate guarantee hold across coordinator restarts,
  * not just within one process. */
trait CompletenessStore {
  /** Logdates notified by any prior run (read once at listener start). */
  def loadChecked(): Set[String]
  /** Durably mark a logdate notified (idempotent). */
  def markChecked(logdate: String): Unit
}

/** [[CompletenessStore]] over the JDBC bookkeeping table: `markChecked`
  * flips the (name, logdate) rows' state to CHECKED — one UPDATE, same
  * statement the reference's leader issues after its scheduler call. */
final class JdbcCompletenessStore(url: String, name: String)
  extends CompletenessStore {
  override def loadChecked(): Set[String] =
    graft.sources.Bookkeeping.checkedLogdates(url, name)
  override def markChecked(logdate: String): Unit =
    graft.sources.Bookkeeping.markChecked(url, name, logdate)
}

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
  * protocol collapses into one driver callback.
  *
  * Exactly-once scope: within a process by the in-memory fired set; across
  * restarts only when a [[CompletenessStore]] is supplied — already-CHECKED
  * logdates then seed the fired set, and each notify is durably marked
  * right after the callback returns (notify-then-mark, the reference's
  * order: a crash in that window re-notifies once on restart — the same
  * at-least-once edge the reference's leader has). */
final class CompletenessListener(roundSeconds: Long = 300L,
                                 store: Option[CompletenessStore] = None)(
    onComplete: String => Unit)
  extends StreamingQueryListener {

  private val fmt = DateTimeFormatter.ofPattern("yyyyMMddHHmm")
  private val pending = new ConcurrentHashMap[String, Long]() // logdate → window-end epoch
  private val fired = ConcurrentHashMap.newKeySet[String]()
  store.foreach(_.loadChecked().foreach(fired.add))

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
    if (wmStr != null && wmStr.nonEmpty)
      advanceWatermark(Instant.parse(wmStr).getEpochSecond)
  }

  /** Fire every pending logdate whose window end the watermark has passed
    * (extracted from [[onQueryProgress]] so the restart contract is testable
    * without fabricating listener-bus events). */
  private[graft] def advanceWatermark(wm: Long): Unit =
    pending.forEach { (ld, end) =>
      if (end <= wm && fired.add(ld)) {
        pending.remove(ld)
        onComplete(ld)
        store.foreach(_.markChecked(ld))
      }
    }
}
