package graft.streaming

import graft.functions.{PageHinkley, PhBuf}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TTLConfig, ValueState}

/** The drift-detection variant of the streaming pipeline: Page–Hinkley
  * mean-shift testing per window-averaged series, on the inherited
  * watermark/bucket/timer machinery — the streaming counterpart of
  * batch q167's CUSUM changepoint (CUSUM locates a shift in a FIXED
  * series retrospectively; PH flags it ONLINE with O(1) state and a
  * reset-free running-minimum formulation). Third model swap on the
  * protected `closeBucket` template, after AR(1) and Holt — state is
  * one [[PhBuf]] and every fold goes through [[PageHinkley.step]], so
  * the spec can replay the identical recurrence bit-for-bit.
  *
  * Mapping onto the shared score row: `is_anomaly` = either-side drift
  * alarm, `expected` = the running mean the test normalizes against,
  * `is_alert` = DOWNWARD drift alarm (the declining-vitals side the
  * reference's statement [4] cares about).
  */
class PhHealthStateProcessor(windowMs: Long, minTraining: Int,
    confidencePercentage: Double, alertThreshold: Double, originMs: Long,
    delta: Double = 0.5, lambda: Double = 15.0)
    extends HealthStateProcessor(windowMs, minTraining, confidencePercentage,
      alertThreshold, originMs) {

  @transient private var ph: ValueState[PhBuf] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    super.init(outputMode, timeMode)
    ph = getHandle.getValueState("ph", Encoders.product[PhBuf], TTLConfig.NONE)
  }

  override protected def closeBucket(key: Int, b: BucketAcc): HealthScore = {
    val avg = b.sum / b.count
    val buf = PageHinkley.step(Option(ph.get()).getOrElse(PageHinkley.zero),
      avg, delta)
    ph.update(buf)
    val warm = buf.n >= minTraining
    val up = PageHinkley.incStat(buf) > lambda
    val down = PageHinkley.decStat(buf) > lambda
    HealthScore(key, b.startMs, b.count, avg,
      is_anomaly = warm && (up || down),
      expected = if (warm) Some(buf.sum / buf.n) else None,
      lower = None, upper = None,
      n_training = buf.n,
      forecast_ms = None, forecast_value = None,
      lower_bound = None, upper_bound = None, rmse = None,
      is_alert = warm && down)
  }
}
