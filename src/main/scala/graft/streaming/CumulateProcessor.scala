package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One keyed event entering the cumulate windower. */
final case class CumEvent(event_type: String, event_time: java.sql.Timestamp,
    event_us: Long, vm: Long)

/** A CLOSED cumulate window [window_start_us, window_end_us). */
final case class CumulateOut(event_type: String, window_start_us: Long,
    window_end_us: Long, n_events: Long, sum_micro: Long, avg_value: Double)

private final case class StepAcc(n: Long, sm: Long)

/** Streaming CUMULATE windows — the q179 twin, run with Flink's TVF
  * emission semantics: within each `steps·stepUs` period, the expanding
  * window [period_start, period_start + j·step) emits exactly when the
  * event-time watermark passes its END. State per key is one bounded
  * (count, integer-micro sum) accumulator PER STEP of each open period
  * — never a row buffer — merged j ways at emission, so memory is
  * O(open periods × steps) regardless of event rate. Arrival order
  * cannot change any output: step accumulators are commutative, and an
  * event's windows all end strictly after its timestamp, so a window
  * that has already fired can only have been reachable by rows the
  * watermark filter already dropped as late.
  *
  * Timer keys are window ends (exact ms — steps are whole seconds);
  * re-registering the same expiry is idempotent in the timer state, so
  * every event of a period can safely arm the same boundaries.
  */
class CumulateProcessor(stepUs: Long, steps: Int)
    extends StatefulProcessor[String, CumEvent, CumulateOut] {
  require(stepUs % 1000 == 0, "step must be whole milliseconds (timer granularity)")
  private val sizeUs = stepUs * steps

  @transient private var acc: MapState[Long, StepAcc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    acc = getHandle.getMapState("cum", Encoders.scalaLong,
      Encoders.product[StepAcc], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[CumEvent],
      timerValues: TimerValues): Iterator[CumulateOut] = {
    rows.foreach { e =>
      val pstart = Math.floorDiv(e.event_us, sizeUs) * sizeUs
      val idx = ((e.event_us - pstart) / stepUs).toInt
      val k = pstart + idx // pstart is a multiple of sizeUs >> steps: collision-free
      // arm ALL the period's boundaries exactly once, on first sight of
      // the period: later (possibly out-of-order) events find them
      // armed, and empty windows cost nothing (n = 0 emits nothing)
      val periodSeen = (0 until steps).exists(i => acc.containsKey(pstart + i))
      val cur = if (acc.containsKey(k)) acc.getValue(k) else StepAcc(0L, 0L)
      acc.updateValue(k, StepAcc(cur.n + 1, cur.sm + e.vm))
      if (!periodSeen) {
        var j = 1
        while (j <= steps) {
          getHandle.registerTimer((pstart + j * stepUs) / 1000)
          j += 1
        }
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CumulateOut] = {
    val endUs = expiredTimerInfo.getExpiryTimeInMs() * 1000
    val pstart = Math.floorDiv(endUs - 1, sizeUs) * sizeUs
    val j = ((endUs - pstart) / stepUs).toInt
    var n = 0L; var sm = 0L; var i = 0
    while (i < j) {
      if (acc.containsKey(pstart + i)) {
        val a = acc.getValue(pstart + i); n += a.n; sm += a.sm
      }
      i += 1
    }
    val out =
      if (n > 0) {
        // q141's exact-average convention: integer micro sum, one
        // division, the house FLOOR rounding
        val avg = math.floor(sm / (n * 1000000.0) * 10000 + 0.500001) / 10000
        Iterator.single(CumulateOut(key, pstart, endUs, n, sm, avg))
      } else Iterator.empty
    if (j == steps) (0 until steps).foreach(i => acc.removeKey(pstart + i))
    out
  }
}

/** Composition helper: events stream → closed cumulate windows. */
object StreamingCumulate {
  def cumulate(events: DataFrame, stepUs: Long = 3600000000L, steps: Int = 6,
      watermarkDelay: String = "10 seconds"): Dataset[CumulateOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("event_time"),
        col("event_us").cast("long").as("event_us"),
        col("vm").cast("long").as("vm"))
      .withWatermark("event_time", watermarkDelay)
      .as[CumEvent]
      .groupByKey(_.event_type)
      .transformWithState(new CumulateProcessor(stepUs, steps),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[CumulateOut])
  }
}
