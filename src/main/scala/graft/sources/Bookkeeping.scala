package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S7 — the JDBC bookkeeping channel.
  *
  * The reference keeps its fleet-progress table in an external RDBMS through
  * a raw DriverManager connection (`/root/reference/.../util/DBManager.scala:20-42`)
  * and hand-built SQL (`dao/HiveSinkDetailDao.scala:73-98` — string
  * interpolation, injectable). Spark-native mapping:
  *
  *  - bulk table I/O → `df.write.jdbc` / `spark.read.jdbc` (partitionable
  *    reads at scale; the bookkeeping table itself is metadata-sized)
  *  - the per-close `exists ? UPDATE : INSERT` callback
  *    (`callback/UpdateSinkDetailCallback.scala:29-58`) → driver-side
  *    PreparedStatement upsert over the micro-batch's bounded set of
  *    (logdate, hostname) rows — parameterized, fixing the injection defect.
  *
  * Tests run against embedded Derby (in /opt/spark/jars); any JDBC URL works.
  */
object Bookkeeping {

  val Table = "hive_sink_detail"

  def derbyUrl(dir: String): String = s"jdbc:derby:$dir;create=true"

  private def connProps = new Properties() // driver resolved by URL from the classpath

  /** Bulk write (overwrite) — S7 `df.write.jdbc`. String columns are pinned
    * to VARCHAR: Derby's default mapping is CLOB, which cannot appear in
    * comparisons/GROUP BY — useless for a bookkeeping key table. */
  def write(df: DataFrame, url: String, table: String = Table): Unit = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR(1024)")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (stringCols.nonEmpty) w.option("createTableColumnTypes", stringCols.mkString(", "))
     else w).jdbc(url, table, connProps)
  }

  /** Bulk read — S7 `spark.read.jdbc`. */
  def read(spark: SparkSession, url: String, table: String = Table): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** One bookkeeping row, `dao/HiveSinkDetailDao.scala:29` shape. */
  final case class Detail(name: String, logdate: String, hostname: String,
                          receivecount: Long, sinkcount: Long,
                          updatetime: Long, state: String)

  /** Create the bookkeeping table if absent (idempotent). Attempt-then-
    * verify, NOT a `getTables` probe: metadata-catalog name casing
    * differs per vendor (Derby upper-cases, Postgres lower-cases), so a
    * cased probe reports "absent" forever on the other vendor and every
    * later call crashes on CREATE — the exact trap [[upsertCommitted]]'s
    * comment documents; both sites now use the same portable pattern. */
  def ensureTable(url: String, table: String = Table): Unit = {
    val conn = DriverManager.getConnection(url)
    try createIfAbsent(conn,
      s"""CREATE TABLE $table (
          name VARCHAR(128), logdate VARCHAR(32), hostname VARCHAR(128),
          receivecount BIGINT, sinkcount BIGINT, updatetime BIGINT,
          state VARCHAR(16), PRIMARY KEY (name, logdate, hostname))""", table)
    finally conn.close()
  }

  /** Portable create-if-absent: attempt the CREATE, and on failure verify
    * the table actually answers a SELECT before swallowing — a real
    * failure (permissions, connection) must surface, not be eaten. */
  private def createIfAbsent(conn: java.sql.Connection, createSql: String,
                             table: String): Unit = {
    val st = conn.createStatement()
    try st.execute(createSql)
    catch { case e: java.sql.SQLException =>
      val probe = conn.createStatement()
      try probe.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close()
      catch { case _: java.sql.SQLException => throw e }
      finally probe.close()
    }
    finally st.close()
  }

  /** T7 — `exists ? UPDATE : INSERT` per (name, logdate, hostname), exactly
    * the reference callback (`UpdateSinkDetailCallback.scala:29-58`,
    * `HiveSinkDetailDao.scala:73-98`) but parameterized. The row set per
    * call is a micro-batch's partitions — bounded metadata, not data. */
  def upsert(url: String, rows: Seq[Detail], table: String = Table): Unit = {
    if (rows.isEmpty) return
    val conn = DriverManager.getConnection(url)
    try upsertRows(conn, rows, table) finally conn.close()
  }

  /** The shared UPDATE-else-INSERT row loop (used by both the plain and the
    * transactional upsert — one copy, one place to change the SQL). */
  private def upsertRows(conn: java.sql.Connection, rows: Seq[Detail],
                         table: String): Unit = {
    // state CASE: a late micro-batch for an already-notified logdate must
    // not clobber the durable 'CHECKED' transition back to 'NEW' — that
    // would make a restarted coordinator re-notify (the exact failure the
    // durable state exists to prevent)
    val upd = conn.prepareStatement(
      s"""UPDATE $table SET receivecount = receivecount + ?, sinkcount = sinkcount + ?,
          updatetime = ?,
          state = CASE WHEN state = 'CHECKED' THEN state ELSE ? END
          WHERE name = ? AND logdate = ? AND hostname = ?""")
    val ins = conn.prepareStatement(
      s"INSERT INTO $table VALUES (?, ?, ?, ?, ?, ?, ?)")
    try rows.foreach { r =>
      upd.setLong(1, r.receivecount); upd.setLong(2, r.sinkcount)
      upd.setLong(3, r.updatetime); upd.setString(4, r.state)
      upd.setString(5, r.name); upd.setString(6, r.logdate); upd.setString(7, r.hostname)
      if (upd.executeUpdate() == 0) {
        ins.setString(1, r.name); ins.setString(2, r.logdate); ins.setString(3, r.hostname)
        ins.setLong(4, r.receivecount); ins.setLong(5, r.sinkcount)
        ins.setLong(6, r.updatetime); ins.setString(7, r.state)
        ins.executeUpdate()
      }
    } finally { upd.close(); ins.close() }
  }

  /** Exactly-once form of [[upsert]] for streaming replays: the counter
    * accumulation and a (name, batchid) commit record are one transaction,
    * so an at-least-once `foreachBatch` replay (crash after upsert, before
    * sink commit) cannot double-accumulate — the replay's insert hits the
    * commit table's primary key, the transaction rolls back, and the call
    * reports `false` (already committed). The reference has no such guard:
    * its callback chain re-runs wholesale on a Flume transaction retry. */
  def upsertCommitted(url: String, runName: String, batchId: Long,
                      rows: Seq[Detail], table: String = Table): Boolean = {
    val conn = DriverManager.getConnection(url)
    try {
      createIfAbsent(conn,
        """CREATE TABLE batch_commits (
            name VARCHAR(128), batchid BIGINT, PRIMARY KEY (name, batchid))""",
        "batch_commits")
      conn.setAutoCommit(false)
      // EVERY exit from the open transaction must be an explicit commit or
      // rollback: closing a connection with an in-flight transaction is
      // vendor-defined (commit-on-close drivers would durably write the
      // commit record WITHOUT the counter accumulation — the replay probe
      // would then skip the batch forever and its counts would be lost;
      // Derby instead throws from close(), masking the real error), so a
      // throw from any statement below rolls back before propagating.
      try {
        // replay probe inside the transaction: SELECT then INSERT is portable
        // (no reliance on a vendor-specific duplicate-key exception type);
        // a racing concurrent inserter still trips the PK below and is
        // caught as the generic SQLException
        val sel = conn.prepareStatement(
          "SELECT 1 FROM batch_commits WHERE name = ? AND batchid = ?")
        val replay =
          try {
            sel.setString(1, runName); sel.setLong(2, batchId)
            val rs = sel.executeQuery()
            try rs.next() finally rs.close()
          } finally sel.close()
        if (replay) { conn.rollback(); return false }
        val ins = conn.prepareStatement("INSERT INTO batch_commits VALUES (?, ?)")
        val fresh =
          try { ins.setString(1, runName); ins.setLong(2, batchId); ins.executeUpdate(); true }
          catch {
            // only an integrity violation (SQLState class 23) means a racing
            // inserter beat us to the PK = genuine replay. Anything else —
            // lock timeout, deadlock victim, dropped connection — must
            // propagate so the caller's batch retries instead of silently
            // reporting "already committed" and losing the accumulation.
            case e: java.sql.SQLException
                if Option(e.getSQLState).exists(_.startsWith("23")) => false
          }
          finally ins.close()
        if (!fresh) { conn.rollback(); return false }
        upsertRows(conn, rows, table)
        conn.commit()
        true
      } catch { case e: Throwable =>
        try conn.rollback()
        catch { case suppressed: java.sql.SQLException => e.addSuppressed(suppressed) }
        throw e
      }
    } finally conn.close()
  }

  /** T6 — the durable completeness transition: mark every row of a
    * notified (name, logdate) `CHECKED`, exactly the reference's
    * post-notify state flip (`dao/HiveSinkDetailDao.scala:64-70`, invoked
    * from `HiveBatchedSink.scala:205-227`) so a restarted coordinator
    * never re-notifies a logdate it already reported. One parameterized
    * UPDATE — atomic per statement, idempotent on replay. */
  def markChecked(url: String, name: String, logdate: String,
                  table: String = Table): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        s"UPDATE $table SET state = 'CHECKED' WHERE name = ? AND logdate = ?")
      val n = try {
        st.setString(1, name); st.setString(2, logdate); st.executeUpdate()
      } finally st.close()
      if (n == 0) {
        // no detail row yet (coordinator can fire before any host row on a
        // replay) — record the transition on a coordinator marker row so
        // durability never silently no-ops; reuse upsertRows so the INSERT
        // SQL keeps its single owner (idempotent: a replayed mark matches
        // the marker row's UPDATE and the CASE keeps it CHECKED)
        upsertRows(conn, Seq(Detail(name, logdate, "_coordinator",
          0L, 0L, System.currentTimeMillis(), "CHECKED")), table)
      }
    } finally conn.close()
  }

  /** The restart-side read of [[markChecked]]: logdates already notified in
    * any prior run (`dao/HiveSinkDetailDao.scala:42-61` reads the same
    * state column to skip finished work). */
  def checkedLogdates(url: String, name: String,
                      table: String = Table): Set[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.prepareStatement(
        s"SELECT logdate FROM $table WHERE name = ? AND state = 'CHECKED'")
      try {
        st.setString(1, name)
        val rs = st.executeQuery()
        val b = Set.newBuilder[String]
        try { while (rs.next()) b += rs.getString(1) } finally rs.close()
        b.result()
      } finally st.close()
    } finally conn.close()
  }

  /** A5 over JDBC: the reference's completeness probe executed where the
    * bookkeeping lives (`HiveSinkDetailDao.scala:42-61`). */
  def completeness(spark: SparkSession, url: String, n: Int,
                   table: String = Table): DataFrame =
    graft.operators.Counters.completenessOf(read(spark, url, table), n)
}
