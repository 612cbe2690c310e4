package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, CreateNamedStruct, Expression, Greatest, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Native `(count, max)` aggregate — the reference's per-logdate accumulator
  * (`TimestampCount`: event count + latest timestamp, merged pairwise across
  * writers, `/root/reference/src/main/scala/org/apache/flume/sink/hive/batch/util/TimedUtils.scala:40-56`)
  * as a single Catalyst [[DeclarativeAggregate]].
  *
  * Why declarative instead of a Scala `Aggregator`/UDAF: the buffer is two
  * expressions (`cnt`, `mx`), so update and merge stay inside whole-stage
  * codegen with map-side partial aggregation for free — the two-phase
  * partial/final plan IS the reference's merge protocol, chosen by the
  * engine instead of hand-rolled `ConcurrentHashMap` merging. One fused
  * buffer also beats declaring `count(x) + max(x)` separately when the
  * caller needs the pair consumed as one value (the reference's JSON
  * encoding of the pair, `TimedUtils.scala:51-53`).
  *
  * Null semantics match SQL aggregates: null inputs are skipped by both
  * legs (`count(x)`-not-`count(*)`, max ignores nulls; empty group →
  * `(0, null)`).
  */
case class CountMax(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "graft_count_max"

  override def nullable: Boolean = false

  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("max_ts", child.dataType)))

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  private lazy val cnt =
    AttributeReference("cnt", LongType, nullable = false)()
  private lazy val mx =
    AttributeReference("mx", child.dataType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(cnt, mx)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal.create(null, child.dataType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), cnt, Add(cnt, Literal(1L))),
    Greatest(Seq(mx, child)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(cnt.left, cnt.right),
    Greatest(Seq(mx.left, mx.right)))

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("cnt"), cnt, Literal("max_ts"), mx))

  override protected def withNewChildInternal(newChild: Expression): CountMax =
    copy(child = newChild)
}
