package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns via codegen'd higher-order
  * functions (`zip_with`/`aggregate`) — the Spark-native representation for
  * embedding columns (engine extension; no analogue in the reference).
  *
  * Floats are widened to double *before* accumulating so results are
  * IEEE-deterministic for a fixed element order (array order is fixed, so
  * unlike a shuffled SUM this is reproducible across runs and engines).
  */
object VectorFns {

  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product via the native codegen'd expression
    * ([[graft.expressions.DotProduct]]) — bit-identical to the
    * higher-order-function fold it replaces, ~10× faster (tight primitive
    * loop inside whole-stage codegen vs an interpreted lambda frame per
    * element). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.graft.bridge.expression(a),
        org.apache.spark.sql.graft.bridge.expression(b)))

  def sqNorm(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(sqNorm(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH bucket: sign bits of `nBits` fixed pseudo-random
    * projections, packed into a long. Deterministic (projection vectors from
    * a fixed xorshift over (bit, dim, seed)), so bucketing is stable across
    * runs — the scale path for cosine near-dup / ANN (bucket-join instead
    * of all-pairs). Distinct `seed`s give independent hyperplane tables for
    * multi-table LSH (OR-amplification: K tables of B bits each catch a
    * pair colliding in ANY table, trading K× join legs for recall on
    * mid-similarity pairs a single table misses). */
  def signBucket(v: Column, dim: Int, nBits: Int, seed: Int = 0): Column = {
    def proj(bit: Int, d: Int): Double = {
      var x = (bit + seed * 10007).toLong * 2654435761L + d.toLong * 40503L + 12345L
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      // map to (-1, 1)
      (x % 1000003L).toDouble / 1000003.0
    }
    val bits = (0 until nBits).map { b =>
      val pv = typedLit((0 until dim).map(d => proj(b, d)))
      when(dot(v, pv) > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }
}
