package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One registered query: the Spark plan builder, an optional DuckDB
  * oracle SQL (omitted → the driver falls back to a rows-only check),
  * and whether it belongs to the headline bench set.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

/** Cross-engine determinism helpers.
  *
  * Floating-point SUM/AVG are order-dependent; Spark's partial
  * aggregation over 32 partitions and DuckDB's single-threaded scan
  * will not add doubles in the same order. Casting each addend to a
  * DECIMAL first makes the sum exact (decimal addition is
  * associative), and the final DECIMAL→DOUBLE cast is deterministic —
  * so both engines produce bit-identical doubles. Per-row arithmetic
  * (a*b, a-b) is already deterministic IEEE-754 and needs no such
  * treatment.
  */
object Det {
  /** Exact sum of a double column: cast addends to DECIMAL(18,s), sum,
    * cast back to double. Order-independent across engines. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact average via exact sum / count. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlSum(expr: String, scale: Int = 4): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,$scale))) AS DOUBLE)"

  def sqlAvg(expr: String, scale: Int = 4): String =
    s"(${sqlSum(expr, scale)} / COUNT($expr))"
}
