package graft.streaming

import graft.functions.{Ar1AnomalyAggregator, Ar1Buf, Ar1Fit, TimeModels}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}

/** The ARIMA-family variant of the streaming pipeline: identical
  * watermark/bucket/timer machinery (inherited), with the per-window
  * scoring swapped from Welford z-score + OLS trend to the AR(1)
  * residual model of q160/q161 — the demonstration that the batch
  * Aggregators and the streaming state processor share one model
  * implementation. The state IS the batch aggregator's buffer
  * ([[Ar1Buf]]), and every fold goes through the aggregator's own
  * `reduce`/`finish`, so streaming output is bit-identical to the batch
  * query on the same window-averaged series (pinned by
  * StreamingAr1Spec).
  *
  * Alerting mirrors statement [4] with the AR(1) 1-step forecast
  * `c + φ·avg` (fit over ALL pairs including the just-closed window,
  * matching [[graft.functions.Ar1ForecastAggregator]] at h = 1).
  */
class Ar1HealthStateProcessor(windowMs: Long, minTraining: Int,
    confidencePercentage: Double, alertThreshold: Double, originMs: Long)
    extends HealthStateProcessor(windowMs, minTraining, confidencePercentage,
      alertThreshold, originMs) {

  @transient private var ar1: ValueState[Ar1Buf] = _

  private val agg = new Ar1AnomalyAggregator(minTraining, confidencePercentage)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    super.init(outputMode, timeMode)
    ar1 = getHandle.getValueState("ar1", Encoders.product[Ar1Buf], TTLConfig.NONE)
  }

  override protected def closeBucket(key: Int, b: BucketAcc): HealthScore = {
    val avg = b.sum / b.count
    val buf0 = Option(ar1.get()).getOrElse(agg.zero)
    // the batch fold: prev = the previous window's average (NaN for the
    // key's first window), exactly lag(avg) over the window series
    val prev = if (buf0.hasLast) buf0.lastVal else TimeModels.NoPrev
    val buf1 = agg.reduce(buf0, (prev, avg))
    ar1.update(buf1)
    val rep = agg.finish(buf1)

    // statement [4] twin: 1-step AR(1) forecast from this window's
    // value, fit over all pairs including the one just folded
    val fitState = buf1.priorWithLast
    val (phi, c, sigma, valid) = Ar1Fit(fitState, minTraining)
    val (fMs, fVal, fLo, fHi, fRmse, alert) =
      if (valid) {
        val fc = c + phi * avg
        (Some(b.startMs + windowMs), Some(fc), Some(fc - z * sigma),
          Some(fc + z * sigma), Some(sigma), fc < alertThreshold)
      } else (None, None, None, None, None, false)

    HealthScore(key, b.startMs, b.count, avg, rep.is_anomaly,
      rep.expected, rep.lower, rep.upper, rep.n_pairs,
      fMs, fVal, fLo, fHi, fRmse, alert)
  }
}
