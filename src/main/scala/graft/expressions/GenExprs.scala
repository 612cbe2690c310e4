package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [EXT] — native table-generating function (UDTF): one input row of
  * tokens → one output row per n-token shingle, with its position.
  *
  * Completes the engine's native-extension triple alongside the scalar
  * expressions ([[PolyHash]]/[[ShingleHashes]]/…) and the declarative
  * aggregate ([[CountMax]]): a custom Catalyst [[Generator]], the
  * `explode`-class operator, planned through `GenerateExec` exactly like
  * the built-ins — no RDD `flatMap`, no UDF row boxing in the surrounding
  * plan (the generator itself is `CodegenFallback`; its children and
  * consumers stay codegen'd, and `GenerateExec` fuses into the enclosing
  * WholeStageCodegen as the built-in generators do).
  *
  * Versus composing `posexplode(transform(sequence(...)))`: one pass, no
  * intermediate array-of-structs materialized per row — on wide documents
  * the built-in chain allocates the full shingle array before exploding,
  * this streams them. The reference has no generator surface (bodies are
  * opaque bytes, `serde/TextDeserializer.scala`); [EXT] substrate.
  *
  * Null handling: a null token array generates nothing (explode
  * semantics); null *elements* cannot occur from `split` but are rendered
  * as empty strings rather than NPE-ing.
  */
case class ShingleTerms(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def prettyName: String = "graft_shingle_terms"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Iterator.empty
    else {
      val a = arr.asInstanceOf[ArrayData]
      val m = a.numElements()
      if (m < n) Iterator.empty
      else (0 to m - n).iterator.map { i =>
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          val t = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
          if (t != null) sb.append(t.toString)
          j += 1
        }
        InternalRow(i.toLong, UTF8String.fromString(sb.toString))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleTerms =
    copy(child = newChild)
}
