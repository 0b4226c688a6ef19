package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Hash-stable numeric aggregates.
  *
  * Summing doubles is order-dependent in IEEE 754, and Spark's
  * partition order differs from a single-threaded oracle — the last
  * ulp of a plain `sum(double)` is nondeterministic. The driver
  * hash-compares values, so every money-style aggregate goes through
  * exact decimal arithmetic: cast each addend to DECIMAL(18,6)
  * (deterministic per-row rounding, identical in Spark and DuckDB),
  * sum exactly, cast the total back to double. Result is bit-identical
  * regardless of partitioning — and still whole-stage-codegen'd.
  */
object NumericAgg {
  /** Exact-decimal sum, returned as double. Oracle SQL shape:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast(DoubleType)

  /** Exact-decimal mean, returned as double. Oracle SQL shape:
    * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)`. */
  def davg(c: Column): Column =
    dsum(c) / count(lit(1))
}
