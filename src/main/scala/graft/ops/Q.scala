package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** One engine query: a Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Column names MUST match between `run`'s output and `sql` — the
  * driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    sql: Option[String] = None)

/** Cross-engine determinism helpers.
  *
  * The driver compares Spark results against DuckDB by value hash, so
  * floating-point arithmetic must be bit-identical across engines. The
  * rules used throughout the query library:
  *
  *  - Source doubles in the testdata are 2-decimal (money/rates) or
  *    integral; casting them to a small DECIMAL is exact in both
  *    engines (no rounding ties possible at 2 decimals).
  *  - All SUMs run over DECIMAL (exact, associative — safe under
  *    Spark's parallel partial aggregation AND DuckDB's vectorized
  *    aggregation), then the exact result is cast to DOUBLE once.
  *  - Ratios/averages divide two already-identical doubles (IEEE
  *    division is deterministic); built-in AVG over doubles is never
  *    used cross-engine (accumulation order differs).
  *  - Window orderings always include a unique tie-break key.
  */
object D {
  val money: DecimalType = DecimalType(12, 2) // prices, quantities, values
  val rate: DecimalType = DecimalType(3, 2) // discounts, taxes (0.00–0.99)

  /** Exact money: CAST(x AS DECIMAL(12,2)). */
  def m(c: Column): Column = c.cast(money)

  /** Exact rate: CAST(x AS DECIMAL(3,2)). */
  def r(c: Column): Column = c.cast(rate)

  /** Final cast of an exact decimal aggregate to DOUBLE. */
  def dbl(c: Column): Column = c.cast("double")
}
