package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** The exact-integer arithmetic idioms every oracle-checked statistic
  * is built from, factored to one place (r7 consolidation): quantized
  * inputs → DECIMAL(38,0) moment sums → one double division at the
  * end. The 38-digit product-sum is overflow-proof for micro-quantized
  * (1e6-scale) values over trillions of rows and is bit-reproducible
  * across partitionings — the property all 427 oracle hashes rest on.
  * The DuckDB twin of [[m2]] is `SUM(CAST(a AS HUGEINT) * b)`
  * ([[sqlM2]]). Call sites that need a different moment subset or
  * centered algebra keep their local formulas; this pins only the
  * shared building blocks, so a future fix to the idiom lands
  * everywhere at once.
  */
object Exact {

  /** Exact second-moment product-sum Σ a·b: the left factor widens to
    * DECIMAL(38,0) so the multiply never overflows int64.
    *
    * PERF (r7, q441): do NOT feed this from a window operator at data
    * scale. Precision-38 decimal aggregation abandons the fast
    * hash-agg path, and after a window the combination measured
    * 60-109 s on 10M rows where long sums took 8 s. When a per-GROUP
    * bound exists that keeps Σ a·b inside int64 (e.g. a span bound:
    * Σ v·gap ≤ v_max · total_span — hash-agg partials are per
    * (group, partition), so the group bound covers them), prefer a
    * plain long product-sum with the bound argued in a comment. m2 is
    * for post-aggregation moments and scan-side sums, where it stays
    * on the fast path. */
  def m2(a: Column, b: Column): Column = sum(a.cast("decimal(38,0)") * b)

  /** String-column convenience — `m2("x", "y")` ≡ Σ x·y exactly. */
  def m2(a: String, b: String): Column = m2(col(a), col(b))

  /** The canonical 6-moment OLS aggregate over quantized (x, y):
    * n, Σx, Σy, Σx², Σxy, Σy² — feed to `.agg(ms.head, ms.tail: _*)`.
    * Downstream slope/intercept/r algebra stays at the call site (it
    * legitimately differs: centered vs uncentered, guarded vs not). */
  def olsMoments(x: Column = col("x"), y: Column = col("y")): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(x).as("sx"), sum(y).as("sy"),
    m2(x, x).as("sxx"), m2(x, y).as("sxy"), m2(y, y).as("syy"))

  /** DuckDB twin of [[m2]] (HUGEINT = decimal128, same exactness). */
  def sqlM2(a: String, b: String): String =
    s"SUM(CAST($a AS HUGEINT) * $b)"

  /** Ceil-rank percentile predicate over a cumulative count: the
    * smallest bin where cum ≥ ⌈p·n/100⌉ is the exact lower p-th
    * percentile of the binned distribution — integer arithmetic both
    * engines evaluate identically (the SQL twin is the same text with
    * `//`). Use as `cum.filter(Exact.ceilRank(col("cum"), p, "n"))`
    * then `agg(min(bin))`. */
  def ceilRank(cum: Column, p: Int, n: String): Column =
    cum >= org.apache.spark.sql.functions.expr(s"($p * $n + 99) div 100")
}
