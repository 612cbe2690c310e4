package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregation helpers.
  *
  * Double summation is not associative, so a shuffled/partial-final
  * aggregate of doubles is nondeterministic at the last few ulps — enough
  * to break hash-compared results between runs (and between engines).
  * Summing through DECIMAL is exact and order-independent; we cast the
  * final result back to double. This is also the right call at 100 TB:
  * a 1000-executor partial-final sum gives a *different* double answer
  * every run otherwise.
  */
object Num {
  private val D = DecimalType(28, 4)

  /** Exact, order-independent sum of a double expression → double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Deterministic mean: exact decimal sum ÷ count, then rounded. */
  def davg(c: Column, scale: Int = 4): Column =
    round(sum(c.cast(D)).cast("double") / count(c).cast("double"), scale)

  /** Exact running/windowed sum of doubles (same trick over a window). */
  def dsumCast(c: Column): Column = c.cast(D)
}
