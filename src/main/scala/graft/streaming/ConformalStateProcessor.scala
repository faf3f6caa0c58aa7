package graft.streaming

import graft.functions.{ConfBuf, RollingConformal}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}

/** Rolling-conformal variant of the streaming pipeline: each closed
  * window's move is judged against the adaptive ±q̂ interval built
  * from the last 64 moves — distribution-free anomaly detection with a
  * FINITE-SAMPLE ~10% nominal miss rate, no Gaussian assumption (the
  * Welford/AR(1)/Holt models all assume one). Fifth model swap on the
  * protected `closeBucket` template; state is one [[ConfBuf]] and
  * every fold goes through [[RollingConformal]]'s pure recurrence, so
  * the spec replays it bit-for-bit.
  *
  * Mapping onto the shared score row: `expected` = previous level,
  * `lower`/`upper` (and the forecast bounds) = previous level ± q̂,
  * `is_anomaly` = move outside q̂ once ≥ `minTraining` moves are
  * banked, `is_alert` = such a surprise landing under the alert
  * threshold (the declining-vitals side).
  */
class ConformalHealthStateProcessor(windowMs: Long, minTraining: Int,
    confidencePercentage: Double, alertThreshold: Double, originMs: Long)
    extends HealthStateProcessor(windowMs, minTraining, confidencePercentage,
      alertThreshold, originMs) {

  @transient private var conf: ValueState[ConfBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    super.init(outputMode, timeMode)
    conf = getHandle.getValueState("conf", Encoders.product[ConfBuf], TTLConfig.NONE)
  }

  override protected def closeBucket(key: Int, b: BucketAcc): HealthScore = {
    val avg = b.sum / b.count
    val prev = Option(conf.get()).getOrElse(RollingConformal.zero)
    val mv = RollingConformal.moveMicro(prev, avg)
    val q = RollingConformal.qhatMicro(prev)
    val m = prev.ring.length
    conf.update(RollingConformal.push(prev, avg))
    val warm = m >= minTraining && q.isDefined
    val breach = warm && (for (qq <- q; d <- mv) yield d > qq).contains(true)
    val lo = if (warm) Some(prev.last - q.get / 1e6) else None
    val up = if (warm) Some(prev.last + q.get / 1e6) else None
    HealthScore(key, b.startMs, b.count, avg,
      is_anomaly = breach,
      expected = if (prev.last.isNaN) None else Some(prev.last),
      lower = lo, upper = up,
      n_training = m,
      forecast_ms = None, forecast_value = None,
      lower_bound = lo, upper_bound = up, rmse = None,
      is_alert = breach && avg < alertThreshold)
  }
}
