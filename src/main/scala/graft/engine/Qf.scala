package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers shared by operators to keep results bit-identical with the
  * DuckDB oracle (see SURVEY.md §5):
  *
  *  - money/quantity aggregates run over DECIMAL(12,2) (exact, associative,
  *    order-independent) and are cast to DOUBLE only at the very end, so
  *    Spark's parallel partial aggregation and DuckDB's sequential sum
  *    produce the same bits;
  *  - averages are expressed as `CAST(decimal_sum AS DOUBLE) / count` so
  *    both engines perform one identical IEEE division;
  *  - dates/timestamps are exported as formatted strings or epoch integers.
  */
object Qf {
  val D12: DecimalType = DecimalType(12, 2)

  /** Exact 2-decimal view of a money/quantity double. */
  def dec(c: Column): Column = c.cast(D12)

  def dbl(c: Column): Column = c.cast("double")

  /** Decimal-exact sum exported as double. */
  def dsum(c: Column): Column = dbl(sum(dec(c)))

  /** Order-independent average: one IEEE division of exact operands. */
  def davg(c: Column): Column = dbl(sum(dec(c))) / count(lit(1))

  /** ISO day string (matches DuckDB strftime('%Y-%m-%d')). */
  def dayStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
