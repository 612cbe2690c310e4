package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** [EXT] — native codegen'd distinct n-token shingle hashing.
  *
  * Bit-identical to the higher-order-function chain it replaces
  * (`TextFns.shingleHashes`): per-token `xxhash64(tok)` =
  * `XXH64.hashUTF8String(tok, 42)`, then the (n−1)-step zip_with fold where
  * each step re-seeds — `step(acc, next) = hashLong(next, hashLong(acc, 42))`
  * — and finally `array_distinct`'s first-occurrence-order dedup. A
  * differential spec asserts array equality (values AND order) against the
  * HOF form. The difference is execution: the HOF chain evaluates ~3
  * interpreted lambda frames per token per document; this is one tight loop
  * inside whole-stage codegen (the shingle index build was the dominant
  * cost of the dedup family's shared scan).
  *
  * The reference has no text processing (bodies are opaque bytes,
  * `/root/reference/.../serde/TextDeserializer.scala:68`); this is the
  * engine's [EXT] dedup substrate.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // xxhash64's fixed seed

  /** Static so generated code can call it without a reference object. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val L = toks.numElements()
    if (L < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](L)
    var i = 0
    while (i < L) {
      val s = toks.getUTF8String(i)
      // a null token leaves the seed untouched, exactly like xxhash64(null)
      th(i) = if (s == null) Seed else XXH64.hashUTF8String(s, Seed)
      i += 1
    }
    val out = new Array[Long](L - n + 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    var k = 0
    i = 0
    while (i <= L - n) {
      var h = th(i)
      var j = 1
      while (j < n) { h = XXH64.hashLong(th(i + j), XXH64.hashLong(h, Seed)); j += 1 }
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** [EXT] — native codegen'd 32-bit SimHash over an array of term hashes
  * (Charikar '02): bit j of the result is the sign of Σ_terms (2·bit_j(h)−1).
  *
  * Bit-identical to the single-pass `aggregate` fold in
  * `TextFns.simhash32` (integer arithmetic only), but that fold still
  * evaluates an interpreted 32-element `transform` per term (~32 lambda
  * frames each); this is one two-level loop in codegen. Differential spec
  * asserts equality against the HOF form.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash32"

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.SimHash32.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def compute(hashes: ArrayData): Long = {
    val counts = new Array[Int](32)
    val m = hashes.numElements()
    var i = 0
    while (i < m) {
      // a null element's bitwiseAND is null, so the HOF's when() falls to
      // otherwise(-1) for every bit — replicated here exactly
      if (hashes.isNullAt(i)) {
        var j = 0
        while (j < 32) { counts(j) -= 1; j += 1 }
      } else {
        val h = hashes.getLong(i)
        var j = 0
        while (j < 32) {
          counts(j) += (if ((h & (1L << j)) != 0) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var bits = 0L
    var j = 0
    while (j < 32) { if (counts(j) > 0) bits |= (1L << j); j += 1 }
    bits
  }
}
