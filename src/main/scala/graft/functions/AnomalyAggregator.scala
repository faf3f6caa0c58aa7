package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically-stable running moments (Welford), mergeable in parallel
  * (Chan et al.) — O(1) state per key, the property that lets the
  * streaming twin hold 100M keys without per-key history buffers. */
final case class WelfordState(n: Long, mean: Double, m2: Double) {

  def add(x: Double): WelfordState = {
    val n1 = n + 1
    val d = x - mean
    val mean1 = mean + d / n1
    WelfordState(n1, mean1, m2 + d * (x - mean1))
  }

  def combine(o: WelfordState): WelfordState = {
    if (n == 0) o
    else if (o.n == 0) this
    else {
      val nT = n + o.n
      val d = o.mean - mean
      WelfordState(nT, mean + d * o.n / nT,
        m2 + o.m2 + d * d * n * o.n / nT)
    }
  }

  def stddevSamp: Double = if (n < 2) Double.NaN else math.sqrt(m2 / (n - 1))
}

/** Aggregation buffer: the PRIOR history's moments plus the newest point
  * held out. Forward-only Welford — the current point is folded into
  * `prior` only when the next one arrives, so `finish` scores `last`
  * against exactly its predecessors with no reverse-update (a reverse
  * Welford loses ~1e-7 precision, enough to flip rounding cuts against
  * the SQL oracle). */
final case class AnomalyBuf(prior: WelfordState, last: Double, hasLast: Boolean) {
  def priorWithLast: WelfordState = if (hasLast) prior.add(last) else prior
}

/** The ROW-valued result of the anomaly scorer, mirroring the shape the
  * reference consumes as `report.is_anomaly`
  * (flink_statements.tf:191-202, :257). */
final case class AnomalyReport(
    is_anomaly: Boolean,
    expected: Option[Double],
    lower: Option[Double],
    upper: Option[Double],
    n_training: Long)

/** M1 — `ML_DETECT_ANOMALIES(value, config)` parity baseline
  * (reference: flink_statements.tf:191-202; Confluent built-in,
  * closed-source, so SURVEY.md §7.3 pins deterministic semantics):
  * after a warm-up of `minTrainingSize` prior points, flag the newest
  * point when it falls outside the `confidencePercentage` two-sided
  * prediction interval `mean ± z·stddev` of its prior history.
  *
  * A typed [[Aggregator]]: use over a cumulative per-key ordered window
  * (batch O1) or inside the streaming state processor. Registered for
  * SQL via [[MLFunctions.register]]. Note: `merge` assumes the right
  * buffer is the later span (true for ordered window frames and the
  * streaming processor; in an unordered groupBy the "newest point" is
  * not well-defined).
  */
class AnomalyAggregator(minTrainingSize: Int, confidencePercentage: Double)
    extends Aggregator[Double, AnomalyBuf, AnomalyReport] {

  private val z = Stats.normalQuantile(0.5 + confidencePercentage / 200.0)

  override def zero: AnomalyBuf =
    AnomalyBuf(WelfordState(0, 0.0, 0.0), 0.0, hasLast = false)

  override def reduce(b: AnomalyBuf, x: Double): AnomalyBuf =
    AnomalyBuf(b.priorWithLast, x, hasLast = true)

  override def merge(a: AnomalyBuf, b: AnomalyBuf): AnomalyBuf =
    if (!b.hasLast) AnomalyBuf(a.prior.combine(b.prior), a.last, a.hasLast)
    else AnomalyBuf(a.priorWithLast.combine(b.prior), b.last, b.hasLast)

  override def finish(b: AnomalyBuf): AnomalyReport = {
    if (!b.hasLast) return AnomalyReport(is_anomaly = false, None, None, None, 0)
    val prior = b.prior
    val sigma = prior.stddevSamp
    val warm = prior.n >= minTrainingSize && !sigma.isNaN && sigma > 0.0
    if (!warm)
      AnomalyReport(is_anomaly = false,
        if (prior.n > 0) Some(prior.mean) else None, None, None, prior.n)
    else AnomalyReport(
      is_anomaly = math.abs(b.last - prior.mean) > z * sigma,
      Some(prior.mean),
      Some(prior.mean - z * sigma),
      Some(prior.mean + z * sigma),
      prior.n)
  }

  override def bufferEncoder: Encoder[AnomalyBuf] = Encoders.product[AnomalyBuf]
  override def outputEncoder: Encoder[AnomalyReport] = Encoders.product[AnomalyReport]
}

/** Distribution helpers, double-precision-exact (public algorithms). */
object Stats {

  /** erf via the all-positive scaled Maclaurin series
    * erf(x) = (2x/√π)·e^(−x²)·Σ (2x²)ⁿ / (1·3·⋯·(2n+1)) — no
    * cancellation, converges to machine precision for the |x| ≤ ~6
    * range quantile refinement needs. */
  def erf(x: Double): Double = {
    val ax = math.abs(x)
    if (ax > 6.0) return if (x > 0) 1.0 else -1.0
    val x2 = 2.0 * x * x
    var term = 1.0
    var sum = 1.0
    var n = 1
    while (term > 1e-18 * sum && n < 200) {
      term *= x2 / (2 * n + 1)
      sum += term
      n += 1
    }
    val r = 2.0 * ax * math.exp(-x * x) * sum / math.sqrt(math.Pi)
    if (x < 0) -r else r
  }

  /** Standard normal CDF (absolute accuracy ~1e-16 — enough for the
    * Newton polish, which only needs Φ(x)−p at non-tail p). */
  def normalCdf(x: Double): Double = 0.5 + 0.5 * erf(x / math.sqrt(2.0))

  /** Standard normal PDF. */
  private def normalPdf(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.Pi)

  /** Inverse standard-normal CDF: Acklam's rational approximation
    * (|ε| < 1.15e-9) polished with two Newton steps against the
    * Cody-precision CDF — accurate to the last double ulp, so `z`
    * constants match SQL oracles bit-for-bit. */
  def normalQuantile(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"p must be in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    var x =
      if (p < pLow) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
      } else if (p <= 1 - pLow) {
        val q = p - 0.5
        val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
      }
    var i = 0
    while (i < 2) {
      val e = normalCdf(x) - p
      x -= e / normalPdf(x)
      i += 1
    }
    x
  }
}
