package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers (SURVEY.md §2 determinism rules).
  *
  * The driver hash-compares every query result against a DuckDB oracle
  * run on the same parquet, so float aggregates must be bit-identical
  * across two engines AND across Spark's own partition-dependent
  * summation orders.
  */
object Det {

  /** Order-independent float sum: exact DECIMAL accumulation, then a
    * single double conversion at the end. A plain `sum(double)` differs
    * between engines (and between Spark partitionings of the same data)
    * by up to ~sqrt(n)·eps·Σ|x| — at price-column magnitudes that is
    * larger than the 1e-4 rounding granularity the oracle compares at.
    * DECIMAL(20,6) is exact for every testdata column (≤2 real decimal
    * places) and sums are associative in decimal, so Spark's
    * partial+final aggregation stays exact and any partitioning yields
    * the same value. Mirror in oracle SQL:
    * `CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE)`.
    */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(20, 6))).cast(DoubleType)

  /** Deterministic mean built on [[exactSum]]; mirror in oracle SQL as
    * `round(CAST(sum(CAST(x AS DECIMAL(20,6))) AS DOUBLE)/count(*), 4)`.
    */
  def exactAvg(c: Column): Column = exactSum(c) / count(lit(1))

  /** 4-dp rounding applied to every float output (determinism rule 2). */
  def round4(c: Column): Column = round(c, 4)
}
