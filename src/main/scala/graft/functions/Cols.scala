package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared across operators.
  *
  * Money/measure aggregation policy (SURVEY §6): per-row arithmetic happens
  * in double (IEEE-deterministic, identical across engines), the per-row
  * result is cast to decimal(38,9) (deterministic rounding), and the SUM
  * runs over decimals — exact and order-independent, so results are stable
  * under any partitioning at any scale AND bit-equal to the DuckDB oracle.
  */
object Cols {
  val Dec38_9: DecimalType = DecimalType(38, 9)

  /** Cast to the canonical exact-aggregation decimal. */
  def dec(c: Column): Column = c.cast(Dec38_9)

  val decZero: Column = lit(0).cast(Dec38_9)

  /** Exact, order-independent sum of a double expression. */
  def dsum(c: Column): Column = sum(dec(c))

  /** Cross-engine-stable mean: exact decimal sum, then one double divide. */
  def davg(c: Column): Column =
    round(dsum(c).cast("double") / count(lit(1)), 6)
}
