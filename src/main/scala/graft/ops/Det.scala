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

  /** Order-independent float sum: exact DECIMAL accumulation. A plain
    * `sum(double)` differs between engines (and between Spark
    * partitionings of the same data) by up to ~sqrt(n)·eps·Σ|x| — at
    * price-column magnitudes that is larger than the 1e-4 rounding
    * granularity the oracle compares at. DECIMAL(20,6) is exact for
    * every testdata column and decimal addition is associative, so
    * partial+final aggregation stays exact under any partitioning.
    */
  def sumDec(c: Column): Column = sum(c.cast(DecimalType(20, 6)))

  /** Rounded exact sum. Rounding happens IN DECIMAL SPACE (half-up on
    * the exact value) and only then converts to double — rounding the
    * double instead diverges between engines on exact .xxxx5 ties:
    * Spark's round(double) rounds the shortest decimal representation,
    * DuckDB the exact binary value. Oracle mirror:
    * `CAST(round(sum(CAST(x AS DECIMAL(20,6))), 4) AS DOUBLE)`.
    */
  def dsum4(c: Column): Column = round(sumDec(c), 4).cast(DoubleType)

  /** Rounded exact mean: decimal-division quotient (Spark rounds it
    * half-up at ≥14 guard digits — exact for any expansion that could
    * tie at 4 dp) rounded half-up at 4 dp, then one double cast.
    * DuckDB's decimal division degrades to DOUBLE, so the oracle mirror
    * is the equivalent exact integer formula
    * `CAST((2*CAST(sum(CAST(x AS DECIMAL(20,6)))*1000000 AS HUGEINT) +
    * count(*)*100) // (2*count(*)*100) AS DOUBLE)/10000.0`
    * (half-up rounding of N/D as (2N+D)//(2D); positive sums only).
    */
  def davg4(c: Column): Column =
    round(sumDec(c) / count(lit(1)), 4).cast(DoubleType)

  /** Weighted rounded exact mean: Σ(w·x)/Σw with x collapsed to
    * DECIMAL(20,6) terms (callers floor x to ≤6 dp first — the q71
    * convention) and integer weights, so both the numerator and the
    * denominator are exact under any partitioning; quotient rounded
    * half-up at 4 dp like [[davg4]]. Oracle mirror: the davgS-style
    * sign-correct integer formula with N = sum(w·x)·10⁶ as HUGEINT
    * and D = sum(w)·100.
    */
  def wavg4(w: Column, c: Column): Column =
    round(sum(c.cast(DecimalType(20, 6)) * w) / sum(w), 4).cast(DoubleType)

  /** Wide variant of [[dsum4]] for second-moment sums (x², x·y):
    * price-squared rows reach ~10¹⁰ and 100 TB row counts push the
    * exact sum past DECIMAL(20,6)'s 10¹⁴ capacity; DECIMAL(28,6)
    * holds 10²² — enough for ~10¹² rows of squared price columns —
    * and still fits DuckDB's INT128 decimals. Oracle mirror:
    * `CAST(round(sum(CAST(x AS DECIMAL(28,6))), 4) AS DOUBLE)`.
    */
  def dsum4w(c: Column): Column =
    round(sum(c.cast(DecimalType(28, 6))), 4).cast(DoubleType)

  /** 4-dp rounding for DOUBLE-sourced values (ratios, cosines):
    * `floor(x·10⁴ + 0.5)/10⁴` — pure double arithmetic that both
    * engines evaluate identically on identical inputs, immune to the
    * shortest-string-vs-binary tie divergence of round(double). Mirror
    * verbatim in oracle SQL: `floor((x)*10000 + 0.5)/10000`.
    */
  def roundD4(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  /** Integer FLOOR-division SQL fragment for a positive literal
    * divisor. BOTH engines' native integer division truncates toward
    * zero — Spark's `div` (the Hive convention) and DuckDB's integer
    * `//` alike (verified on DuckDB 1.0.0: `-5 // 2 = -2`) — but
    * bucketing semantics (day/hour of a pre-epoch µs, negative prefix
    * sums) need FLOOR, so neither bare operator is the right engine
    * expression. `a − pmod(a, d)` is the exact floor multiple
    * (pmod ∈ [0, d)), and `div` of an exact multiple is floor; all
    * arithmetic stays in Long — no double round-trip, so it is exact
    * past 2^53 where `floor(a / d)` is not. Oracle mirror on a
    * possibly-negative dividend: the same pmod-expanded form,
    * `(a - (((a % d) + d) % d)) // d` (SparkEntry's `fdiv`); a bare
    * `//` mirrors correctly ONLY where the dividend is provably
    * non-negative.
    */
  def floorDivExpr(a: String, d: Long): String =
    s"((($a) - pmod(($a), ${d}L)) div ${d}L)"
}
