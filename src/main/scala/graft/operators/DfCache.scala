package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of memoized persisted DataFrames (the shared
  * shingle/prefix/pair indexes, ntile's pinned range partitioning). One
  * registry instead of a cache map per operator so (a) `putIfAbsent` makes
  * concurrent first access race-safe and (b) a single [[evict]] releases
  * everything a session pinned. Entries otherwise live for the session;
  * long-lived processes that cycle sessions call [[evict]] (exposed as
  * `Dedup.evictCaches`). */
private[graft] object DfCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Drop entries whose session's SparkContext has stopped — their blocks
    * died with the executors, and the strong (session, DataFrame) refs
    * would otherwise pin dead sessions for the JVM's life in long-lived
    * processes that cycle sessions. Runs on every [[memoize]] (bounded:
    * one isStopped flag read per entry), so leaks self-heal on the next
    * access by any live session; unpersist is skipped — there is nothing
    * left to unpersist on a stopped context, and calling it would throw. */
  private def purgeStopped(): Unit =
    cache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }

  def memoize(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    purgeStopped()
    cache.get((spark, key)) match {
      case Some(df) => df
      case None =>
        val df = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cache.putIfAbsent((spark, key), df) match {
          // A concurrent first access builds the same deterministic plan, and
          // CacheManager dedupes persist() by plan equality — both DataFrames
          // share ONE cache entry. The loser must NOT unpersist: uncaching is
          // also plan-keyed, so that would evict the winner's entry too and
          // silently un-memoize the index for the rest of the session.
          case Some(winner) => winner
          case None => df
        }
    }
  }

  def evict(spark: SparkSession): Unit =
    cache.filterInPlace { case ((s, _), df) =>
      if (s eq spark) { df.unpersist(); false } else true }
}
