package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** ARIMA-family upgrades for M1/M2 (reference:
  * flink_statements.tf:191-202, 305-316 — Confluent's built-ins are
  * closed-source ARIMA variants; SURVEY.md §7.3 pins deterministic
  * public-algorithm semantics instead). Round 5's baselines model each
  * key as i.i.d. around a mean (M1) or a linear trend (M2); the
  * aggregators here model the serial correlation those baselines
  * ignore: an AR(1) process `y_t = c + φ·y_{t-1} + ε` fit by OLS on
  * lag-1 pairs, and simple exponential smoothing (ETS(A,N,N)).
  *
  * All state is O(1) co-moment form (parallel-mergeable, bounded
  * buffers — the property that keeps a 100M-key groupBy map-side
  * combinable at cluster scale). Same [[Aggregator]] interface as the
  * round-5 [[AnomalyAggregator]]/[[ForecastAggregator]] so the batch
  * window path, the groupBy path, and the streaming state processors
  * can swap models without re-plumbing.
  */
object TimeModels {
  /** Sentinel for "no lag-1 predecessor" (first row of a key): NaN
    * never occurs in the driver's vitals data, and a NaN pair must not
    * enter the regression state. */
  val NoPrev: Double = Double.NaN
}

/** AR(1) fit summary derived from a [[RegState]] over (y_{t-1}, y_t)
  * pairs: slope φ, intercept c, and residual variance σ² = SSE/(n−2)
  * (OLS with 2 estimated parameters). */
private[graft] object Ar1Fit {
  /** (phi, c, sigma, valid): valid requires n ≥ max(minTrain, 3) pairs,
    * x-variance > 0 (φ defined) and σ > 0 (interval defined). */
  def apply(s: RegState, minTrain: Int): (Double, Double, Double, Boolean) = {
    val minN = math.max(minTrain, 3)
    if (s.n < minN || s.mXX <= 0.0) return (0.0, 0.0, 0.0, false)
    val phi = s.mXY / s.mXX
    val c = s.meanY - phi * s.meanX
    val sse = math.max(0.0, s.mYY - s.mXY * s.mXY / s.mXX)
    val sigma = math.sqrt(sse / (s.n - 2))
    (phi, c, sigma, sigma > 0.0)
  }
}

/** The ROW-valued AR(1) anomaly verdict (mirrors [[AnomalyReport]]'s
  * shape so downstream alert filters are model-agnostic). */
final case class Ar1Report(
    is_anomaly: Boolean,
    expected: Option[Double],
    lower: Option[Double],
    upper: Option[Double],
    n_pairs: Long)

/** Buffer: regression state over PRIOR lag-pairs plus the newest
  * (prev, value) pair held out — forward-only like [[AnomalyBuf]], so
  * `finish` scores the last row against exactly its predecessors and a
  * glitch never trains its own detector. `lastPrev` is NaN for a key's
  * first row (no predecessor). */
final case class Ar1Buf(prior: RegState, lastPrev: Double, lastVal: Double,
    hasLast: Boolean) {
  def priorWithLast: RegState =
    if (hasLast && !lastPrev.isNaN) prior.add(lastPrev, lastVal) else prior
}

/** M1 upgrade — AR(1) residual anomaly detection: fit `y_t = c +
  * φ·y_{t-1}` by OLS on the key's prior lag-1 pairs, flag the newest
  * point when its one-step-ahead residual `y_t − (c + φ·y_{t-1})` falls
  * outside the `confidencePercentage` two-sided band `± z·σ`. For φ→0
  * this degrades exactly to the round-5 mean/stddev detector; for the
  * autocorrelated vitals the reference simulates it tracks the local
  * level instead of the global mean, which is what an ARIMA(1,0,0)
  * built-in would do.
  *
  * Input: (prev, value) where prev = lag(value) over the key's event
  * order, NaN-encoded when absent ([[TimeModels.NoPrev]]). Apply over a
  * cumulative ordered frame (batch) or fold in event order (streaming);
  * `merge` assumes the right buffer is the later span, same caveat as
  * [[AnomalyAggregator]].
  */
class Ar1AnomalyAggregator(minTrainingSize: Int, confidencePercentage: Double)
    extends Aggregator[(Double, Double), Ar1Buf, Ar1Report] {

  private val z = Stats.normalQuantile(0.5 + confidencePercentage / 200.0)

  override def zero: Ar1Buf =
    Ar1Buf(RegState(0, 0, 0, 0, 0, 0, 0, 0), TimeModels.NoPrev, 0.0, hasLast = false)

  override def reduce(b: Ar1Buf, pv: (Double, Double)): Ar1Buf =
    Ar1Buf(b.priorWithLast, pv._1, pv._2, hasLast = true)

  override def merge(a: Ar1Buf, b: Ar1Buf): Ar1Buf =
    if (!b.hasLast) Ar1Buf(a.prior.combine(b.prior), a.lastPrev, a.lastVal, a.hasLast)
    else Ar1Buf(a.priorWithLast.combine(b.prior), b.lastPrev, b.lastVal, b.hasLast)

  override def finish(b: Ar1Buf): Ar1Report = {
    val np = b.prior.n
    if (!b.hasLast || b.lastPrev.isNaN)
      return Ar1Report(is_anomaly = false, None, None, None, np)
    val (phi, _, sigma, valid) = Ar1Fit(b.prior, minTrainingSize)
    if (!valid) return Ar1Report(is_anomaly = false, None, None, None, np)
    // centered form (meanY + φ·(prev − meanX)) is algebraically c +
    // φ·prev but avoids intercept cancellation for large levels
    val expected = b.prior.meanY + phi * (b.lastPrev - b.prior.meanX)
    Ar1Report(
      is_anomaly = math.abs(b.lastVal - expected) > z * sigma,
      Some(expected), Some(expected - z * sigma), Some(expected + z * sigma),
      np)
  }

  override def bufferEncoder: Encoder[Ar1Buf] = Encoders.product[Ar1Buf]
  override def outputEncoder: Encoder[Ar1Report] = Encoders.product[Ar1Report]
}

/** One AR(1) forecast step: horizon h, point forecast, and the
  * WIDENING `confidencePercentage` interval — Var[h] = σ²·Σ_{j<h} φ^{2j},
  * the AR(1) h-step error variance, which is what distinguishes an
  * ARIMA-family forecast from round 5's constant-width trend bands. */
final case class Ar1Step(h: Int, forecast_value: Double,
    lower_bound: Double, upper_bound: Double, n_pairs: Long)

/** Buffer: regression state over ALL lag-pairs plus the key's LAST
  * value by (tsMicros, tieBreak) total order — fully associative (max
  * under a total order + co-moment combine), safe in any merge order,
  * so the groupBy path map-side-combines like any built-in aggregate. */
final case class Ar1FBuf(fit: RegState, lastTs: Long, lastId: Long,
    lastVal: Double, hasAny: Boolean)

/** M2 upgrade — AR(1) h-step forecast from the key's last observation:
  * ŷ(h) = c·Σ_{j<h} φ^j + φ^h·y_n, bounds ŷ ± z·σ·sqrt(Σ_{j<h} φ^{2j}).
  *
  * Input: (prev, value, tsMicros, tieBreak); prev NaN-encoded when
  * absent. Emits one row per horizon step 1..horizon (empty until
  * warm), exploded by the caller like [[ForecastAggregator]]'s output.
  */
class Ar1ForecastAggregator(minTrainingSize: Int, horizon: Int,
    confidencePercentage: Double)
    extends Aggregator[(Double, Double, Long, Long), Ar1FBuf, Array[Ar1Step]] {

  private val z = Stats.normalQuantile(0.5 + confidencePercentage / 200.0)

  override def zero: Ar1FBuf = Ar1FBuf(RegState(0, 0, 0, 0, 0, 0, 0, 0), 0L, 0L, 0.0, hasAny = false)

  override def reduce(b: Ar1FBuf, r: (Double, Double, Long, Long)): Ar1FBuf = {
    val (prev, v, ts, id) = r
    val fit = if (prev.isNaN) b.fit else b.fit.add(prev, v)
    if (!b.hasAny || ts > b.lastTs || (ts == b.lastTs && id > b.lastId))
      Ar1FBuf(fit, ts, id, v, hasAny = true)
    else Ar1FBuf(fit, b.lastTs, b.lastId, b.lastVal, hasAny = true)
  }

  override def merge(a: Ar1FBuf, b: Ar1FBuf): Ar1FBuf = {
    val fit = a.fit.combine(b.fit)
    if (!b.hasAny) Ar1FBuf(fit, a.lastTs, a.lastId, a.lastVal, a.hasAny)
    else if (!a.hasAny || b.lastTs > a.lastTs ||
      (b.lastTs == a.lastTs && b.lastId > a.lastId))
      Ar1FBuf(fit, b.lastTs, b.lastId, b.lastVal, hasAny = true)
    else Ar1FBuf(fit, a.lastTs, a.lastId, a.lastVal, hasAny = true)
  }

  override def finish(b: Ar1FBuf): Array[Ar1Step] = {
    val (phi, c, sigma, valid) = Ar1Fit(b.fit, minTrainingSize)
    if (!b.hasAny || !valid) return Array.empty
    val out = new Array[Ar1Step](horizon)
    var phih = 1.0   // φ^h, built by repeated multiplication
    var sumj = 0.0   // Σ_{j<h} φ^j
    var sumj2 = 0.0  // Σ_{j<h} φ^{2j}
    var h = 1
    while (h <= horizon) {
      sumj += phih
      sumj2 += phih * phih
      phih *= phi
      val fc = c * sumj + phih * b.lastVal
      val hw = z * sigma * math.sqrt(sumj2)
      out(h - 1) = Ar1Step(h, fc, fc - hw, fc + hw, b.fit.n)
      h += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Ar1FBuf] = Encoders.product[Ar1FBuf]
  override def outputEncoder: Encoder[Array[Ar1Step]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Ar1Step]]()
}

/** Buffer for ETS(A,A) Holt linear trend. `l`/`b` are the plain
  * sequential recurrence (bit-exact on the ordered-window path). For
  * merging, the span's effect on an incoming state is tracked as an
  * AFFINE map: one Holt step is v' = A·v + u·y with constant
  * A = [[1−α, 1−α], [−γα, 1−γα]], u = [α, γα], so a span of steps
  * composes to v_out = M·v_in + c with M, c accumulated by step
  * composition — the property that makes a 2-D linear state-space
  * model mergeable (and hence map-side combinable) at all. `firstY`
  * seeds the key's state (l=firstY, b=0). */
final case class HoltBuf(n: Long, firstY: Double, l: Double, b: Double,
    m00: Double, m01: Double, m10: Double, m11: Double,
    c0: Double, c1: Double)

/** ETS(A,A) — Holt's linear trend: l' = α·y + (1−α)(l+b),
  * b' = γ(l'−l) + (1−γ)b, seeded (l,b) = (y₁, 0). `finish` returns
  * (level, trend); the h-step forecast is level + h·trend. Sequential
  * use is the bit-exact plain recurrence; merged use composes the
  * spans' affine maps (exact in real arithmetic, output-rounding
  * covers the FP re-association). */
class HoltAggregator(alpha: Double, gamma: Double)
    extends Aggregator[Double, HoltBuf, (Double, Double)] {

  override def zero: HoltBuf = HoltBuf(0L, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

  override def reduce(buf: HoltBuf, x: Double): HoltBuf = {
    if (buf.n == 0L) HoltBuf(1L, x, x, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    else {
      val l1 = alpha * x + (1.0 - alpha) * (buf.l + buf.b)
      val b1 = gamma * (l1 - buf.l) + (1.0 - gamma) * buf.b
      // compose one step onto the span map: M' = A·M, c' = A·c + u·x
      val (a00, a01, a10, a11) = (1.0 - alpha, 1.0 - alpha, -gamma * alpha, 1.0 - gamma * alpha)
      HoltBuf(buf.n + 1, buf.firstY, l1, b1,
        a00 * buf.m00 + a01 * buf.m10, a00 * buf.m01 + a01 * buf.m11,
        a10 * buf.m00 + a11 * buf.m10, a10 * buf.m01 + a11 * buf.m11,
        a00 * buf.c0 + a01 * buf.c1 + alpha * x,
        a10 * buf.c0 + a11 * buf.c1 + gamma * alpha * x)
    }
  }

  override def merge(a: HoltBuf, bb: HoltBuf): HoltBuf = {
    if (a.n == 0) bb
    else if (bb.n == 0) a
    else {
      // bb's own first element was folded as a SEED; replay it as a
      // regular STEP of the combined sequence, then apply bb's span map
      val (a00, a01, a10, a11) = (1.0 - alpha, 1.0 - alpha, -gamma * alpha, 1.0 - gamma * alpha)
      // step map for bb.firstY composed under bb.(M,c):
      val s00 = bb.m00 * a00 + bb.m01 * a10
      val s01 = bb.m00 * a01 + bb.m01 * a11
      val s10 = bb.m10 * a00 + bb.m11 * a10
      val s11 = bb.m10 * a01 + bb.m11 * a11
      val sc0 = bb.m00 * (alpha * bb.firstY) + bb.m01 * (gamma * alpha * bb.firstY) + bb.c0
      val sc1 = bb.m10 * (alpha * bb.firstY) + bb.m11 * (gamma * alpha * bb.firstY) + bb.c1
      val m00 = s00 * a.m00 + s01 * a.m10
      val m01 = s00 * a.m01 + s01 * a.m11
      val m10 = s10 * a.m00 + s11 * a.m10
      val m11 = s10 * a.m01 + s11 * a.m11
      val c0 = s00 * a.c0 + s01 * a.c1 + sc0
      val c1 = s10 * a.c0 + s11 * a.c1 + sc1
      // recover (l, b) by applying the merged map to the seed
      val l = m00 * a.firstY + c0
      val b = m10 * a.firstY + c1
      HoltBuf(a.n + bb.n, a.firstY, l, b, m00, m01, m10, m11, c0, c1)
    }
  }

  override def finish(buf: HoltBuf): (Double, Double) =
    if (buf.n == 0) (Double.NaN, Double.NaN) else (buf.l, buf.b)

  override def bufferEncoder: Encoder[HoltBuf] = Encoders.product[HoltBuf]
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}

/** Buffer for ETS(A,N,N): `level` is the plain sequential fold
  * `l ← l + α·(y − l)` seeded with the key's FIRST value — bit-exact
  * against any engine that folds the same doubles in the same order.
  * `zAll` is the same fold seeded with 0, which makes spans mergeable:
  * fold0(P ++ Q) = (1−α)^|Q|·fold0(P) + fold0(Q), and the seeded level
  * is recoverable as zAll + (1−α)^n·first (exact algebra; the merged
  * path re-associates floating point, covered by output rounding). */
final case class EtsBuf(n: Long, first: Double, level: Double, zAll: Double)

/** ETS(A,N,N) — simple exponential smoothing: the final level after
  * folding the key's values in event order; the 1-step forecast IS the
  * level. Sequential use (ordered window frame, streaming fold) keeps
  * the bit-exact plain recurrence; merged use (plain groupBy) is exact
  * in real arithmetic via the zAll identity. */
class EtsAggregator(alpha: Double) extends Aggregator[Double, EtsBuf, Double] {

  override def zero: EtsBuf = EtsBuf(0L, 0.0, 0.0, 0.0)

  override def reduce(b: EtsBuf, x: Double): EtsBuf = {
    val z1 = b.zAll + alpha * (x - b.zAll)
    if (b.n == 0L) EtsBuf(1L, x, x, z1)
    else EtsBuf(b.n + 1, b.first, b.level + alpha * (x - b.level), z1)
  }

  override def merge(a: EtsBuf, b: EtsBuf): EtsBuf = {
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val zAll = math.pow(1.0 - alpha, b.n.toDouble) * a.zAll + b.zAll
      EtsBuf(n, a.first, zAll + math.pow(1.0 - alpha, n.toDouble) * a.first, zAll)
    }
  }

  override def finish(b: EtsBuf): Double =
    if (b.n == 0) Double.NaN else b.level

  override def bufferEncoder: Encoder[EtsBuf] = Encoders.product[EtsBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
