package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One keyed value event entering the incremental-aggregate view. */
final case class AggEvent(user_id: Long, vm: Long, value: Double)

/** The maintained per-user view row — the q141 output shape. */
final case class AggSnapshot(user_id: Long, n_events: Long, sum_micro: Long,
    min_value: Double, max_value: Double, avg_value: Double)

private final case class AggSt(n: Long, sm: Long, mn: Double, mx: Double)

/** Streaming incremental-aggregate maintenance — the materialized-view
  * primitive q141 proves in batch (merge(partials) ≡ recompute), run
  * CONTINUOUSLY: per-user (count, integer-micro sum, min, max) folds
  * each arriving micro-batch into O(1) running state and emits the
  * refreshed view row. Aggregates are commutative/associative, so no
  * ordering buffer and no watermark are needed — arrival order can
  * never change the result (the parity spec feeds shuffled chunks).
  * avg repeats q141's exact arithmetic: integer micro-sum divided at
  * the end, r6-rounded with the house FLOOR formula. At 100 TB this
  * is the O(delta) refresh that replaces a nightly full recompute.
  */
class IncrementalAggProcessor
    extends StatefulProcessor[Long, AggEvent, AggSnapshot] {

  @transient private var st: ValueState[AggSt] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("agg", Encoders.product[AggSt], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[AggEvent],
      timerValues: TimerValues): Iterator[AggSnapshot] = {
    var s = Option(st.get()).getOrElse(
      AggSt(0L, 0L, Double.MaxValue, Double.MinValue))
    rows.foreach { e =>
      s = AggSt(s.n + 1, s.sm + e.vm, math.min(s.mn, e.value),
        math.max(s.mx, e.value))
    }
    st.update(s)
    // q141's avg: sum_micro / (n * 1e6), then Num.r6's FLOOR formula
    val avg = math.floor(s.sm / (s.n * 1000000.0) * 1000000 + 0.500001) / 1000000
    Iterator.single(AggSnapshot(key, s.n, s.sm, s.mn, s.mx, avg))
  }
}

/** Composition helper: events stream → per-user maintained view. */
object StreamingIncrementalAgg {
  def aggregate(events: DataFrame): Dataset[AggSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        floor(col("value") * 1000000 + lit(0.5)).cast("long").as("vm"),
        col("value").cast("double").as("value"))
      .as[AggEvent]
      .groupByKey(_.user_id)
      .transformWithState(new IncrementalAggProcessor(), TimeMode.None(),
        OutputMode.Append(), Encoders.product[AggSnapshot])
  }
}

/** One keyed behavioral event entering the sessionizer (same µs-exact
  * convention as [[FunnelEvent]]). */
final case class SessEvent(user_id: Long, event_time: java.sql.Timestamp,
    event_us: Long, event_id: Long, event_type: String)

/** A CLOSED session: its start, size, and time-ordered path string. */
final case class SessionOut(user_id: Long, session_start_us: Long,
    n_events: Long, path: String)

private final case class OpenSess(start_us: Long, last_us: Long,
    n: Long, path: String)

/** Streaming sessionization with a fixed inactivity gap — the q116
  * session-path twin. Same two-phase shape as [[FunnelProcessor]]:
  * out-of-order events buffer in a watermark-bounded ListState, fold
  * in (event_us, event_id) order once ripe (so arrival order never
  * changes a path), and a session CLOSES — emitting its path — when a
  * ripe successor arrives ≥ gap later, or when the watermark itself
  * passes last_event + gap (no future on-time event can extend it).
  * State per key is one open session + the pending buffer; the path
  * string is bounded by session length, not history length — q116's
  * scale property, held continuously.
  */
class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, SessEvent, SessionOut] {

  @transient private var pending: ListState[SessEvent] = _
  @transient private var open: ValueState[OpenSess] = _
  @transient private var armedTimer: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    pending = getHandle.getListState("pending",
      Encoders.product[SessEvent], TTLConfig.NONE)
    open = getHandle.getValueState("open", Encoders.product[OpenSess],
      TTLConfig.NONE)
    armedTimer = getHandle.getValueState("armedTimer", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[SessEvent],
      timerValues: TimerValues): Iterator[SessionOut] = {
    rows.foreach(pending.appendValue)
    drainAndRearm(key, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
    drainAndRearm(key, timerValues.getCurrentWatermarkInMs())

  private def drainAndRearm(key: Long, wm: Long): Iterator[SessionOut] = {
    val out = drain(key, wm)
    // wake at the earliest still-buffered event AND at the open
    // session's expiry, whichever is sooner — progress continues on
    // watermark advance alone
    val prev = if (armedTimer.exists()) Some(armedTimer.get()) else None
    val wakeAt = (pending.get().map(_.event_time.getTime).minOption.toSeq ++
      Option(open.get()).map(o => (o.last_us + gapUs) / 1000 + 1).toSeq)
      .minOption
    wakeAt match {
      case Some(t0) =>
        val t = math.max(t0, wm + 1)
        if (!prev.contains(t)) {
          prev.filter(_ > wm).foreach(getHandle.deleteTimer)
          getHandle.registerTimer(t)
          armedTimer.update(t)
        }
      case None =>
        prev.filter(_ > wm).foreach(getHandle.deleteTimer)
        armedTimer.clear()
    }
    out.iterator
  }

  private def drain(key: Long, wm: Long): Seq[SessionOut] = {
    val all = pending.get().toSeq
    val (ripe, wait) = all.partition(_.event_time.getTime <= wm)
    val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    if (ripe.nonEmpty) {
      pending.clear()
      if (wait.nonEmpty) pending.appendList(wait.toArray)
      var o = Option(open.get())
      // q116's gaps-and-islands rule: a gap >= gapUs starts a new session
      ripe.sortBy(e => (e.event_us, e.event_id)).foreach { e =>
        o match {
          case Some(s) if e.event_us - s.last_us < gapUs =>
            o = Some(OpenSess(s.start_us, e.event_us, s.n + 1,
              s.path + "->" + e.event_type))
          case Some(s) =>
            closed += SessionOut(key, s.start_us, s.n, s.path)
            o = Some(OpenSess(e.event_us, e.event_us, 1L, e.event_type))
          case None =>
            o = Some(OpenSess(e.event_us, e.event_us, 1L, e.event_type))
        }
      }
      o.foreach(open.update)
    }
    // close the idle open session once no on-time event can extend it:
    // any future ripe event has event_us > wm·1000 >= last_us + gapUs,
    // so it would start a new session anyway
    Option(open.get()).foreach { s =>
      if (wm * 1000 >= s.last_us + gapUs &&
          !pending.get().hasNext) {
        closed += SessionOut(key, s.start_us, s.n, s.path)
        open.clear()
      }
    }
    closed.toSeq
  }
}

/** Composition helper: events stream → watermark → closed sessions. */
object StreamingSessions {
  def sessionize(events: DataFrame, gapUs: Long = 3600000000L,
      watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("event_time"),
        col("event_us").cast("long").as("event_us"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .withWatermark("event_time", watermarkDelay)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[SessionOut])
  }
}
