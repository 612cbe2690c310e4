package graft.sources

import java.net.{HttpURLConnection, URI}

/** S8 — the HTTP completion-notification sink.
  *
  * The reference POSTs `<url>/<logid>/<logdate>` to an external scheduler
  * when a partition completes, swallowing and logging errors so a dead
  * scheduler never stalls ingestion (`/root/reference/.../util/DTEUtils.scala:23-33`).
  * Spark-native home: a driver-side side effect in the `foreachBatch`
  * epilogue / StreamingQueryListener — never on executors, so the fan-out
  * is one call per completed partition, not per row. */
object Notify {

  /** POST `<base>/<logId>/<logdate>`; returns the status code, or -1 on
    * error (swallowed + logged, like the reference). */
  def post(base: String, logId: String, logdate: String,
           timeoutMs: Int = 5000): Int =
    try {
      val url = URI.create(s"${base.stripSuffix("/")}/$logId/$logdate").toURL
      val conn = url.openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setDoOutput(false)
      val code = conn.getResponseCode
      conn.disconnect()
      code
    } catch {
      case e: Exception =>
        System.err.println(s"[graft] notify $base/$logId/$logdate failed: ${e.getMessage}")
        -1
    }
}
