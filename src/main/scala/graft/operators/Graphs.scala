package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Iterative graph analytics over the event stream. x13's connected
  * components covers the *structural* fixpoint (set-stable labels); this adds
  * the *numeric* fixpoint family — power iteration — whose per-round shape
  * (join ranks to edges, re-aggregate by destination, iterate with truncated
  * lineage) is the Spark-native form of every PageRank/HITS/label-score
  * pipeline. The reference has no graph surface (its topology is a fixed
  * Flume channel fan-in, `/root/reference/src/main/scala/org/apache/flume/sink/hive/batch/HiveBatchedSink.scala`);
  * this is engine-extension territory for curation pipelines (e.g. ranking
  * crawl sources by link authority before sampling).
  *
  * Scale design: the *graph build* is the heavy part (one window shuffle over
  * the raw events, one groupBy to collapse multiplicity into integer edge
  * weights) and runs exactly once; the *iteration* runs on the aggregated
  * edge list — |event types|² at most here, |unique links| in a web graph —
  * which is orders of magnitude smaller than the input. Every round is one
  * shuffle on the edge key (the dangling mass, when present, rides along as
  * a broadcast 1-row DataFrame — no per-round driver action), and every 2nd
  * round is lineage-truncated ([[Dedup.snapshot]]) so the plan never grows
  * with the iteration count.
  *
  * Determinism: ranks are **fixed-point integers** (units of 1e-12), all
  * arithmetic is 64-bit integer multiply/floor-divide — bit-identical across
  * engines by construction, where a floating-point power iteration would
  * diverge from the oracle in the low bits (summation order).
  */
object Graphs {

  /** 1e12 fixed-point scale: rank 1.0 ≡ 1e12. The contribution term
    * multiplies a rank (≤ Scale, since total mass is Scale) by an edge
    * weight, so exactness requires `max(w) < 2^63 / Scale ≈ 9.2e6`
    * transitions on any single aggregated edge — enforced loudly in
    * [[pagerank]] (silent 64-bit wrap-around would diverge from the
    * oracle's checked arithmetic). Corpora beyond that bound should
    * pre-scale edge weights (divide every w AND outw by a common
    * per-source factor) or lower Scale. */
  val Scale: Long = 1000000000000L

  /** The event-type transition multigraph: edge (src→dst, w) = number of
    * times a user's event of type `src` was immediately followed by one of
    * type `dst` (per-user order by ts, event_id tiebreak). */
  private[graft] def transitionEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // event_type IS NOT NULL is pinned on BOTH sides (engine + oracle):
    // a NULL node would never match the rank equi-joins and the final
    // ORDER BY would diverge (Spark NULLS FIRST vs DuckDB NULLS LAST) —
    // fixture-independent rather than fixture-lucky
    Tables.events(spark, sfDir)
      .where(col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** X31 — weighted PageRank over the event-type transition graph, `iters`
    * fixed power-iteration rounds, damping 0.85, uniform teleport, dangling
    * mass redistributed uniformly. Output `(node, rank_e12)` with ranks in
    * 1e-12 units (BIGINT — exact oracle match).
    *
    * Update rule (all integer ops, `div` = floor division):
    * {{{
    *   base      = (15 * Scale) div (100 * N)
    *   contrib_e = (rank(src) * w_e) div outw(src)         // per edge
    *   rank'(v)  = base + (85 * (Σ contrib(v) + dm div N)) div 100
    * }}}
    * where `dm` is the summed rank of dangling nodes (no out-edges),
    * computed as a 1-row aggregate DataFrame and broadcast-joined into the
    * update on a constant key — the round stays fully lazy either way. */
  def pagerank(spark: SparkSession, sfDir: String, iters: Int = 10): DataFrame = {
    val edges = Dedup.snapshot(spark, transitionEdges(spark, sfDir))
    // fixed-point range guard (see [[Scale]]): fail loudly instead of
    // silently wrapping rank·w past 2^63 — one bounded 1-row read on the
    // already-materialized edge snapshot
    val maxW = edges.agg(coalesce(max(col("w")), lit(0L))).head().getLong(0)
    require(maxW <= Long.MaxValue / Scale,
      s"pagerank fixed-point range exceeded: max edge weight $maxW > ${Long.MaxValue / Scale}; " +
        "pre-scale edge weights or lower Graphs.Scale")
    val outw = Dedup.snapshot(spark,
      edges.groupBy(col("src").as("node")).agg(sum(col("w")).as("ow")))
    val nodes = Dedup.snapshot(spark,
      Tables.events(spark, sfDir).where(col("event_type").isNotNull)
        .select(col("event_type").as("node")).distinct())
    // N = |event types| and the dangling-node check in ONE bounded 1-row
    // read (a handful of categories here; a dimension cardinality, not row
    // data, in any real deployment). Dangling topology is a property of
    // the GRAPH, not of the round: a dangling-free graph (every node has
    // out-edges — the common case for transition graphs) needs NO
    // per-round driver action, so the iteration composes into a few jobs;
    // with dangling nodes the per-round 1-row mass read forces evaluation,
    // so each round snapshots (the general form).
    val stats = nodes.join(outw, Seq("node"), "left")
      .agg(count(lit(1)).as("n"),
        count(when(col("ow").isNull, lit(1))).as("nd")).head()
    val n = stats.getLong(0)
    // empty graph (no events at all): empty rank table, not a div-by-zero
    if (n == 0L) {
      return nodes.select(col("node"), lit(0L).as("rank_e12"))
    }
    val hasDangling = stats.getLong(1) > 0
    val base = (15L * Scale) / (100L * n)
    // dangling mass carried as a 1-row DataFrame broadcast-joined on a
    // constant key: the round composes lazily (no per-round driver read,
    // no per-round job launch), dangling or not — the only actions inside
    // the loop are the every-2nd-round lineage snapshots
    val danglingMass: DataFrame => DataFrame = ranks =>
      ranks.join(outw, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
        .select(lit(1).as("jk"), col("dm"))
    // The ITERATION runs on the aggregated edge list (|V|²-bounded, tiny
    // next to the corpus), so the corpus-sized shuffle width is pure
    // scheduling overhead here — scope it down for the loop, the same
    // size-to-the-data knob the streaming demos use for state stores. On a
    // cluster this is "size the iteration's parallelism to the graph".
    val key = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.getOption(key)
    spark.conf.set(key, "8")
    var ranks = nodes.select(col("node"), lit(Scale / n).as("rank"))
    try {
      for (k <- 1 to iters) {
        val contrib = ranks
          .join(edges, ranks("node") === edges("src"))
          .join(outw.withColumnRenamed("node", "onode"), col("src") === col("onode"))
          .select(col("dst"), expr("rank * w div ow").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("c"))
        val joined = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        ranks =
          if (hasDangling)
            joined.withColumn("jk", lit(1))
              .join(broadcast(danglingMass(ranks)), Seq("jk"))
              .select(nodes("node"),
                (lit(base) +
                  expr(s"(85 * (coalesce(c, 0L) + dm div ${n}L)) div 100")).as("rank"))
          else
            joined.select(nodes("node"),
              (lit(base) + expr("(85 * coalesce(c, 0L)) div 100")).as("rank"))
        // truncate lineage every 2nd round — AQE re-plans each composed
        // round at every stage boundary, so deeper unsnapshotted chains
        // cost more optimizer time than they save
        if (k % 2 == 0 || k == iters)
          ranks = Dedup.snapshot(spark, ranks)
      }
    } finally prevParts match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    ranks.select(col("node"), col("rank").as("rank_e12")).orderBy(col("node"))
  }

  /** The matching DuckDB oracle — the same integer update rule unrolled
    * `iters` times (generated, not hand-maintained). Every per-round CTE is
    * `AS MATERIALIZED`: DuckDB inlines plain CTEs, and each round references
    * its predecessor twice (dangling mass + contributions), so the inlined
    * expression tree would grow 2^iters — materialization keeps the oracle
    * linear in the iteration count, exactly like the engine's per-round
    * snapshots. */
  def pagerankOracleSql(iters: Int = 10): String = {
    val head =
      s"""WITH nodes AS MATERIALIZED (SELECT DISTINCT event_type AS node FROM events
                   WHERE event_type IS NOT NULL),
         ncnt AS MATERIALIZED (SELECT count(*) AS n FROM nodes),
         seq AS (SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
                 FROM events WHERE event_type IS NOT NULL),
         edges AS MATERIALIZED (SELECT event_type AS src, nxt AS dst, count(*) AS w
                   FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
         outw AS MATERIALIZED (SELECT src AS node, sum(w) AS ow FROM edges GROUP BY 1),
         r0 AS MATERIALIZED (SELECT node, ($Scale // n) AS rank FROM nodes, ncnt)"""
    val steps = (1 to iters).map { k =>
      val p = k - 1
      s""",
         d$k AS MATERIALIZED (SELECT COALESCE(sum(rank), 0) AS dm
                 FROM r$p LEFT JOIN outw USING (node) WHERE ow IS NULL),
         c$k AS MATERIALIZED (SELECT e.dst AS node, sum((r.rank * e.w) // o.ow) AS c
                 FROM r$p r JOIN edges e ON r.node = e.src
                 JOIN outw o ON o.node = e.src GROUP BY 1),
         r$k AS MATERIALIZED (SELECT n.node,
                 ((15 * $Scale) // (100 * nc.n))
                   + (85 * (COALESCE(c.c, 0) + d.dm // nc.n)) // 100 AS rank
                 FROM nodes n CROSS JOIN ncnt nc CROSS JOIN d$k d
                 LEFT JOIN c$k c ON n.node = c.node)"""
    }.mkString
    // CAST: DuckDB SUM(BIGINT) yields HUGEINT, so the uncast rank would
    // arrive as decimal128(38,0) while the engine emits int64 — the typed
    // hash would mismatch on identical values (round-5 red row)
    head + steps +
      s"\nSELECT node, CAST(rank AS BIGINT) AS rank_e12 FROM r$iters ORDER BY node"
  }
}
