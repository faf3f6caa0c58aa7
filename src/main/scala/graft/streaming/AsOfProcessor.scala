package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One tagged row of the unioned probe/quote stream: `is_quote = false`
  * rows are probes awaiting enrichment, `true` rows are the dimension
  * (quote) updates they enrich from. `us` is the exact event time in
  * integer microseconds; `event_time` carries the same instant at ms
  * grain for the watermark. */
final case class AsOfInput(k: Long, is_quote: Boolean, id: Long,
    event_time: java.sql.Timestamp, us: Long, value: Double)

/** An enriched probe: the latest quote of the same key at-or-before the
  * probe's time (DuckDB `ASOF LEFT JOIN ... ON p.ts >= q.ts`, the exact
  * contract of the batch `graft.plans.AsOfJoin`). Unmatched → None. */
final case class AsOfOut(k: Long, id: Long, us: Long, value: Double,
    matched_us: Option[Long], matched_value: Option[Double])

private final case class ProbeEntry(id: Long, value: Double)
private final case class ProbeList(items: List[ProbeEntry])

/** Streaming point-in-time (as-of) enrichment — the streaming twin of
  * the native batch operator `graft.plans.AsOfJoinExec`, with the
  * event-time emission rule a feature-store pipeline needs to be
  * lookahead-free AND final: a probe is emitted only once the shared
  * watermark has passed its timestamp, at which point every quote
  * at-or-before that instant has either arrived or is late by
  * definition — so the enrichment emitted is the one the batch backfill
  * would compute, and it never needs retraction. (Emitting eagerly on
  * arrival instead would bind probes to a transient "latest so far"
  * quote — a result that depends on arrival order; this operator's
  * outputs are arrival-order invariant by construction.)
  *
  * State per key is bounded by the watermark horizon on both sides:
  * probes buffer only until their timer fires (≤ delay), and quotes
  * older than the newest quote at-or-before the watermark are pruned on
  * every timer — no future probe (necessarily ≥ watermark, older rows
  * are dropped as late) can ever match them. The per-timer match scan
  * is O(quotes in horizon) with one row of output state, the same
  * two-rows-of-state shape as the batch merge.
  *
  * Ties: among quotes sharing (k, us), the last PROCESSED wins —
  * callers wanting determinism keep quote (k, us) unique, the same
  * contract as the batch operator and q18's composed variant.
  */
class AsOfProcessor extends StatefulProcessor[Long, AsOfInput, AsOfOut] {

  @transient private var quotes: MapState[Long, Double] = _
  @transient private var probes: MapState[Long, ProbeList] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    quotes = getHandle.getMapState("quotes", Encoders.scalaLong,
      Encoders.scalaDouble, TTLConfig.NONE)
    probes = getHandle.getMapState("probes", Encoders.scalaLong,
      Encoders.product[ProbeList], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[AsOfInput],
      timerValues: TimerValues): Iterator[AsOfOut] = {
    rows.foreach { e =>
      if (e.is_quote) quotes.updateValue(e.us, e.value)
      else {
        val cur = if (probes.containsKey(e.us)) probes.getValue(e.us).items
                  else Nil
        probes.updateValue(e.us, ProbeList(ProbeEntry(e.id, e.value) :: cur))
        // fire strictly after the probe's millisecond: watermark ≥ ms+1
        // implies no quote ≤ the probe's µs can still arrive on time
        getHandle.registerTimer(e.us / 1000 + 1)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[AsOfOut] = {
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000
    // snapshot the quote timeline once per timer (sorted ascending)
    val qts = {
      val it = quotes.keys(); val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) b += it.next()
      b.sortInPlace().toArray
    }
    def latestAtOrBefore(ts: Long): Option[Long] = {
      // binary search: greatest qts <= ts
      var lo = 0; var hi = qts.length - 1; var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (qts(mid) <= ts) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      if (ans < 0) None else Some(qts(ans))
    }
    // drain every buffered probe the watermark has passed
    val ripe = {
      val it = probes.keys(); val b = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (it.hasNext) { val t = it.next(); if (t < wmUs) b += t }
      b.sortInPlace().toArray
    }
    val out = ripe.iterator.flatMap { pts =>
      val entries = probes.getValue(pts).items.reverse // arrival order
      probes.removeKey(pts)
      val m = latestAtOrBefore(pts)
      entries.map(p => AsOfOut(key, p.id, pts, p.value,
        m, m.map(quotes.getValue)))
    }.toList // materialize BEFORE pruning quotes below
    // prune quotes that no future probe (≥ watermark, by lateness rule)
    // can match: everything strictly older than the newest quote ≤ wm
    latestAtOrBefore(wmUs).foreach { keep =>
      qts.iterator.takeWhile(_ < keep).foreach(quotes.removeKey)
    }
    out.iterator
  }
}

/** Composition helpers: tagged stream (or probe + quote streams) →
  * watermarked keyed enrichment. */
object StreamingAsOf {

  /** `tagged` must carry the [[AsOfInput]] columns. */
  def enrich(tagged: DataFrame,
      watermarkDelay: String = "10 seconds"): Dataset[AsOfOut] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged
      .select(col("k").cast("long").as("k"), col("is_quote"),
        col("id").cast("long").as("id"), col("event_time"),
        col("us").cast("long").as("us"), col("value").cast("double").as("value"))
      .withWatermark("event_time", watermarkDelay)
      .as[AsOfInput]
      .groupByKey(_.k)
      .transformWithState(new AsOfProcessor(), TimeMode.EventTime(),
        OutputMode.Append(), Encoders.product[AsOfOut])
  }

  /** Two-stream form: probes(k, id, event_time, us, value) enriched by
    * quotes(k, event_time, us, value). The union shares one watermark,
    * so emission is final across BOTH sides. */
  def enrich(probes: DataFrame, quotes: DataFrame,
      watermarkDelay: String): Dataset[AsOfOut] =
    enrich(
      probes.select(col("k"), lit(false).as("is_quote"), col("id"),
        col("event_time"), col("us"), col("value"))
        .unionByName(quotes.select(col("k"), lit(true).as("is_quote"),
          lit(-1L).as("id"), col("event_time"), col("us"), col("value"))),
      watermarkDelay)
}
