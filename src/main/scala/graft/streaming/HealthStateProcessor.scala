package graft.streaming

import graft.functions.{RegState, Stats, WelfordState}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One scored, window-aggregated point of the streaming pipeline — the
  * union of the reference's statement [2] (flagged), [3] (filter) and
  * [4] (forecast + alert) outputs for a single closed window. */
final case class HealthScore(
    patient_id: Int,
    window_start_ms: Long,
    n_events: Long,
    observed_value: Double,
    is_anomaly: Boolean,
    expected: Option[Double],
    lower: Option[Double],
    upper: Option[Double],
    n_training: Long,
    forecast_ms: Option[Long],
    forecast_value: Option[Double],
    lower_bound: Option[Double],
    upper_bound: Option[Double],
    rmse: Option[Double],
    is_alert: Boolean)

/** A raw keyed observation entering the streaming pipeline. */
final case class VitalPoint(patient_id: Int, event_time: java.sql.Timestamp,
    value: Double)

private[streaming] final case class BucketAcc(startMs: Long, sum: Double, count: Long)

/** The whole reference pipeline (flink_statements.tf statements
  * [2]→[4]) as ONE per-key stateful operator on `transformWithState` —
  * Spark has no streaming OVER aggregate (SURVEY.md §7.4), so the
  * per-key event-ordered cumulative M1/M2 state is hand-built here:
  *
  *  1. out-of-order events buffer in a ListState until the watermark
  *     passes them, then fold in event-time order (event-time
  *     correctness under any arrival order — the reference's Kafka
  *     source is round-robin partitioned, §3.2);
  *  2. tumbling `windowMs` buckets aggregate AVG (statement [2]'s
  *     1-second TUMBLE); a bucket closes when the watermark passes its
  *     end — Flink TUMBLE emission semantics;
  *  3. each closed window is scored against the Welford prior model
  *     (M1, z-score prediction interval, warm-up `minTraining`);
  *  4. normal windows (statement [3]'s is_anomaly = FALSE filter) feed
  *     the OLS trend state and emit a 1-step forecast with bounds (M2)
  *     and the `forecast < alertThreshold` alert flag (statement [4]).
  *
  * State per key is O(1) beyond the watermark-bounded pending buffer
  * (delay × event rate): one BucketAcc + WelfordState + RegState — the
  * property that holds at 100 M keys. Fusing the four statements into
  * one operator keeps the whole chain to a single shuffle and a single
  * state store; the reference's four separate Flink jobs re-shuffle the
  * same patient_id key three times.
  */
class HealthStateProcessor(windowMs: Long, minTraining: Int,
    confidencePercentage: Double, alertThreshold: Double, originMs: Long)
    extends StatefulProcessor[Int, VitalPoint, HealthScore] {

  @transient private var pending: ListState[VitalPoint] = _
  @transient private var bucket: ValueState[BucketAcc] = _
  @transient private var model: ValueState[WelfordState] = _
  @transient private var trend: ValueState[RegState] = _
  @transient private var armedTimer: ValueState[Long] = _

  protected val z: Double = Stats.normalQuantile(0.5 + confidencePercentage / 200.0)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState("pending", Encoders.product[VitalPoint], TTLConfig.NONE)
    bucket = getHandle.getValueState("bucket", Encoders.product[BucketAcc], TTLConfig.NONE)
    model = getHandle.getValueState("model", Encoders.product[WelfordState], TTLConfig.NONE)
    trend = getHandle.getValueState("trend", Encoders.product[RegState], TTLConfig.NONE)
    armedTimer = getHandle.getValueState("armedTimer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def bucketStartOf(ts: Long): Long =
    ts - java.lang.Math.floorMod(ts - originMs, windowMs)

  override def handleInputRows(key: Int, rows: Iterator[VitalPoint],
      timerValues: TimerValues): Iterator[HealthScore] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    // Late-data semantics: Spark's stateful operators drop rows with
    // ts <= watermark BEFORE the processor sees them (verified by
    // StreamingHealthSpec's late-event test), so every delivered row is
    // on-time by construction — slightly stricter than Flink's TUMBLE
    // rule (drop only once the window fired), and equivalent to the
    // reference's drop-late default for any in-delay arrival. The guard
    // below is defense-in-depth only: it would refuse any row whose
    // window already fired, so a closed window can never reopen.
    rows.filter(p => bucketStartOf(p.event_time.getTime) + windowMs > wm)
      .foreach(pending.appendValue)
    drainAndRearm(key, wm)
  }

  override def handleExpiredTimer(key: Int, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[HealthScore] =
    drainAndRearm(key, timerValues.getCurrentWatermarkInMs())

  /** Drain, then re-arm an event-time timer at the open bucket's end (or
    * the earliest still-pending event) so the state keeps making
    * progress on watermark advance alone, with no further input for
    * this key. */
  private def drainAndRearm(key: Int, watermarkMs: Long): Iterator[HealthScore] = {
    val out = drain(key, watermarkMs)
    val nextDue =
      Option(bucket.get()).map(_.startMs + windowMs) ++
        pending.get().map(_.event_time.getTime).minOption
    val prev = if (armedTimer.exists()) Some(armedTimer.get()) else None
    nextDue.minOption match {
      case Some(t0) =>
        val t = math.max(t0, watermarkMs + 1)
        // keep exactly one pending timer per key — re-arming every batch
        // without deleting would grow timer state with batch count
        if (!prev.contains(t)) {
          prev.filter(_ > watermarkMs).foreach(getHandle.deleteTimer)
          getHandle.registerTimer(t)
          armedTimer.update(t)
        }
      case None =>
        prev.filter(_ > watermarkMs).foreach(getHandle.deleteTimer)
        armedTimer.clear()
    }
    out.iterator
  }

  /** Fold every pending event with ts <= watermark, in event-time order,
    * through bucket assignment and model scoring; close any bucket whose
    * end the watermark has passed. */
  private def drain(key: Int, watermarkMs: Long): Seq[HealthScore] = {
    val all = pending.get().toSeq
    val (ripe, wait) = all.partition(_.event_time.getTime <= watermarkMs)
    if (ripe.isEmpty && !Option(bucket.get()).exists(_.startMs + windowMs <= watermarkMs))
      return Nil
    pending.clear()
    if (wait.nonEmpty) pending.appendList(wait.toArray)

    val out = Seq.newBuilder[HealthScore]
    ripe.sortBy(_.event_time.getTime).foreach { p =>
      val start = bucketStartOf(p.event_time.getTime)
      Option(bucket.get()) match {
        case Some(b) if b.startMs == start =>
          bucket.update(BucketAcc(b.startMs, b.sum + p.value, b.count + 1))
        case Some(b) =>
          out += closeBucket(key, b)
          bucket.update(BucketAcc(start, p.value, 1))
        case None =>
          bucket.update(BucketAcc(start, p.value, 1))
      }
    }
    Option(bucket.get()).foreach { b =>
      if (b.startMs + windowMs <= watermarkMs) {
        out += closeBucket(key, b)
        bucket.clear()
      }
    }
    out.result()
  }

  /** Statement [2b]+[3]+[4] for one closed window. Protected so model
    * variants ([[Ar1HealthStateProcessor]]) can swap the scoring while
    * inheriting the watermark/bucket/timer machinery unchanged — the
    * "same Aggregator interface" property the batch side has. */
  protected def closeBucket(key: Int, b: BucketAcc): HealthScore = {
    val avg = b.sum / b.count
    val prior = Option(model.get()).getOrElse(WelfordState(0, 0.0, 0.0))
    val sigma = prior.stddevSamp
    val warm = prior.n >= minTraining && !sigma.isNaN && sigma > 0.0
    val flagged = warm && math.abs(avg - prior.mean) > z * sigma
    model.update(prior.add(avg))

    var fMs: Option[Long] = None
    var fVal, fLo, fHi, fRmse: Option[Double] = None
    var alert = false
    if (!flagged) {
      val x = (b.startMs - originMs) / 86400000.0
      val reg = Option(trend.get()).getOrElse(RegState(0, 0, 0, 0, 0, 0, 0, 0)).add(x, avg)
      trend.update(reg)
      if (reg.n >= math.max(minTraining, 3).toLong && reg.mXX > 0.0) {
        val slope = reg.mXY / reg.mXX
        val step = (reg.maxX - reg.minX) / (reg.n - 1)
        val xh = reg.maxX + step
        val v = reg.meanY + slope * (xh - reg.meanX)
        val mse = math.max(0.0, reg.mYY - reg.mXY * reg.mXY / reg.mXX) / reg.n
        val rmse = math.sqrt(mse)
        fMs = Some(b.startMs + windowMs)
        fVal = Some(v)
        fLo = Some(v - z * rmse)
        fHi = Some(v + z * rmse)
        fRmse = Some(rmse)
        alert = v < alertThreshold
      }
    }
    HealthScore(key, b.startMs, b.count, avg, flagged,
      if (prior.n > 0) Some(prior.mean) else None,
      if (warm) Some(prior.mean - z * sigma) else None,
      if (warm) Some(prior.mean + z * sigma) else None,
      prior.n, fMs, fVal, fLo, fHi, fRmse, alert)
  }
}
