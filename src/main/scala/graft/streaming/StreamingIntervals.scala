package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One interval entering the overlap sweep; `event_time` is the START
  * instant (ms grain, for the watermark), `start_us`/`end_us` the exact
  * integer-microsecond bounds, start ≤ end. */
final case class IntervalIn(supp: Long, event_time: java.sql.Timestamp,
    start_us: Long, end_us: Long)

/** Running overlap totals after admitting one interval: `n_so_far`
  * intervals processed for the key, `overlap_pairs` among them. The
  * LAST emission per key equals the batch q438 totals. */
final case class IntervalOut(supp: Long, start_us: Long, end_us: Long,
    n_so_far: Long, overlap_pairs: Long)

private final case class PendEnds(items: List[Long])
private final case class SweepState(n: Long, nonOverlap: Long, dropped: Long)

/** Streaming interval-overlap counting — the q438 twin, run as a
  * watermark-ordered sweep. Intervals buffer per key until the
  * event-time watermark passes their START; they are then admitted in
  * (start, end) order, exactly the batch event order, so the emissions
  * are arrival-order invariant and FINAL (an interval that could still
  * change a processed start's count would have to start earlier — the
  * watermark already ruled it late).
  *
  * State per key is bounded by peak concurrency, not history: admitted
  * intervals keep only their END, and every end older than the start
  * being admitted is folded into a single dropped COUNTER and removed
  * (ends are nondecreasing relative to future starts, so the counter
  * stays correct forever — the same identity the batch sweep rides:
  * non-overlapping pairs = Σ ends-strictly-before-each-start, and
  * overlap_pairs = C(n,2) − that sum).
  */
class IntervalSweepProcessor
    extends StatefulProcessor[Long, IntervalIn, IntervalOut] {

  @transient private var pending: MapState[Long, PendEnds] = _
  @transient private var active: ValueState[PendEnds] = _
  @transient private var totals: ValueState[SweepState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getMapState("pending", Encoders.scalaLong,
      Encoders.product[PendEnds], TTLConfig.NONE)
    active = getHandle.getValueState("active", Encoders.product[PendEnds],
      TTLConfig.NONE)
    totals = getHandle.getValueState("totals", Encoders.product[SweepState],
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[IntervalIn],
      timerValues: TimerValues): Iterator[IntervalOut] = {
    rows.foreach { e =>
      val cur = if (pending.containsKey(e.start_us)) pending.getValue(e.start_us).items
                else Nil
      pending.updateValue(e.start_us, PendEnds(e.end_us :: cur))
      // fire strictly after the start's millisecond: watermark ≥ ms+1
      // implies no interval starting ≤ this µs can still arrive on time
      getHandle.registerTimer(e.start_us / 1000 + 1)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[IntervalOut] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000
    val ripe = {
      val it = pending.keys(); val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) { val t = it.next(); if (t < wmUs) b += t }
      b.sortInPlace().toArray
    }
    if (ripe.isEmpty) return Iterator.empty
    var st = Option(totals.get()).getOrElse(SweepState(0L, 0L, 0L))
    var act = Option(active.get()).getOrElse(PendEnds(Nil)).items
    val out = scala.collection.mutable.ArrayBuffer.empty[IntervalOut]
    ripe.foreach { s =>
      // fold ends strictly before this start into the dropped counter —
      // they are non-overlapping with EVERY interval from here on
      val (gone, kept) = act.partition(_ < s)
      act = kept
      st = st.copy(dropped = st.dropped + gone.size)
      pending.getValue(s).items.sorted.foreach { e =>
        st = SweepState(st.n + 1, st.nonOverlap + st.dropped, st.dropped)
        out += IntervalOut(key, s, e,
          st.n, st.n * (st.n - 1) / 2 - st.nonOverlap)
        act = e :: act
      }
      pending.removeKey(s)
    }
    totals.update(st)
    active.update(PendEnds(act))
    out.iterator
  }
}

/** Composition helper: interval stream → watermarked keyed sweep. */
object StreamingIntervals {
  def sweep(intervals: DataFrame,
      watermarkDelay: String = "10 seconds"): Dataset[IntervalOut] = {
    val spark = intervals.sparkSession
    import spark.implicits._
    intervals
      .select(col("supp").cast("long").as("supp"), col("event_time"),
        col("start_us").cast("long").as("start_us"),
        col("end_us").cast("long").as("end_us"))
      .withWatermark("event_time", watermarkDelay)
      .as[IntervalIn]
      .groupByKey(_.supp)
      .transformWithState(new IntervalSweepProcessor,
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[IntervalOut])
  }
}
