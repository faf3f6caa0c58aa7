package graft.streaming

import graft.functions.{HoltAggregator, HoltBuf}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}

/** The trend-aware streaming variant: ETS(A,A) Holt per-window scoring
  * on the inherited watermark/bucket/timer machinery. The state IS the
  * batch [[HoltAggregator]]'s buffer and every fold goes through the
  * aggregator's own `reduce`, so streaming (level, trend) is
  * bit-identical to the batch q165 fold on the same window-averaged
  * series.
  *
  * Alerting mirrors statement [4] with the 1-step Holt forecast
  * `level + trend < threshold` — for a declining vital, the trend term
  * fires EARLIER than a level-only model, which is the clinical point
  * of trend smoothing. Anomaly flagging (n/a for pure ETS — no error
  * model) stays off; this processor is the forecast/alert half of the
  * model family, [[Ar1HealthStateProcessor]] is the anomaly half.
  */
class HoltHealthStateProcessor(windowMs: Long, minTraining: Int,
    confidencePercentage: Double, alertThreshold: Double, originMs: Long,
    alpha: Double = 0.3, gamma: Double = 0.1)
    extends HealthStateProcessor(windowMs, minTraining, confidencePercentage,
      alertThreshold, originMs) {

  @transient private var holt: ValueState[HoltBuf] = _

  private val agg = new HoltAggregator(alpha, gamma)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    super.init(outputMode, timeMode)
    holt = getHandle.getValueState("holt", Encoders.product[HoltBuf], TTLConfig.NONE)
  }

  override protected def closeBucket(key: Int, b: BucketAcc): HealthScore = {
    val avg = b.sum / b.count
    val buf = agg.reduce(Option(holt.get()).getOrElse(agg.zero), avg)
    holt.update(buf)
    val (level, trend) = agg.finish(buf)
    val warm = buf.n >= minTraining
    val fc = level + trend
    HealthScore(key, b.startMs, b.count, avg,
      is_anomaly = false,
      expected = if (warm) Some(level) else None,
      lower = None, upper = None,
      n_training = buf.n,
      forecast_ms = if (warm) Some(b.startMs + windowMs) else None,
      forecast_value = if (warm) Some(fc) else None,
      lower_bound = None, upper_bound = None, rmse = None,
      is_alert = warm && fc < alertThreshold)
  }
}
