package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the native graft expressions, so
  * `spark.sql("SELECT graft_polyhash(text) ...")` works anywhere the
  * DataFrame API does — pure-SQL users (the reference's Hive-QL audience)
  * get the same codegen'd kernels as `TextFns`/`VectorFns` callers.
  *
  * Two entry points, same registrations:
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection hook, applied at
  *    session build);
  *  - live session: `GraftExtensions.register(spark)` for an already-built
  *    session (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // the custom-operator ladder (plans.AsOfJoin): optimizer rule joins the
    // operator-optimization fixed point (cooperates with builtin pushdown),
    // strategy maps the logical node to the merge operator
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOf)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  /** `graft_shingle_hashes(tokens, n)`'s window width must be a foldable
    * int literal — it shapes codegen, not per-row data. */
  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity gate: a clear "expects N arguments" error instead of the raw
    * IndexOutOfBounds a bare `args(i)` would leak to SQL users. */
  private def arity(fn: String, n: Int)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      if (args.length != n) throw new IllegalArgumentException(
        s"$fn expects $n argument(s), got ${args.length}")
      b(args)
    }

  /** (identifier, doc, builder) triples in `injectFunction`'s shape. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_polyhash"),
      info("graft_polyhash", "graft_polyhash(str) - portable polynomial hash ((acc*31+cp) mod 1e9+7)"),
      arity("graft_polyhash", 1)(args => expressions.PolyHash(args.head))),
    (FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(tokens, n) - distinct hashes of n-token shingles"),
      arity("graft_shingle_hashes", 2)(args => expressions.ShingleHashes(
        args.head, intLit(args(1), "graft_shingle_hashes", "n")))),
    (FunctionIdentifier("graft_simhash32"),
      info("graft_simhash32", "graft_simhash32(term_hashes) - 32-bit simhash of a term-hash array"),
      arity("graft_simhash32", 1)(args => expressions.SimHash32(args.head))),
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays (null on length mismatch)"),
      arity("graft_dot", 2)(args => expressions.DotProduct(args.head, args(1)))),
    // aggregate builders return the bare AggregateFunction — the analyzer
    // wraps it in AggregateExpression, exactly as for builtin max/count
    (FunctionIdentifier("graft_count_max"),
      info("graft_count_max", "graft_count_max(x) - struct(cnt, max_ts): count + max in one fused buffer"),
      arity("graft_count_max", 1)(args => expressions.CountMax(args.head))),
    // generator builders likewise return the bare Generator — the analyzer
    // extracts it into a Generate node (LATERAL VIEW / select position)
    (FunctionIdentifier("graft_shingle_terms"),
      info("graft_shingle_terms", "graft_shingle_terms(tokens, n) - one row (pos, shingle) per n-token window"),
      arity("graft_shingle_terms", 2)(args => expressions.ShingleTerms(
        args.head, intLit(args(1), "graft_shingle_terms", "n")))))

  /** Register on an already-built session (the extensions hook only runs at
    * session construction). Idempotent: re-registration replaces / skips.
    * Note the live-session seam: `spark.experimental.extraOptimizations`
    * runs as its own batch AFTER the main operator-optimization fixed
    * point, so a filter moved through the as-of node here stops below the
    * node instead of continuing into the scan — still a win, but sessions
    * built with `spark.sql.extensions=graft.GraftExtensions` get the full
    * fixed-point cooperation. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (id, inf, builder) =>
      reg.registerFunction(id, inf, builder)
    }
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(graft.plans.PushFilterThroughAsOf))
      exp.extraOptimizations = exp.extraOptimizations :+ graft.plans.PushFilterThroughAsOf
  }
}
