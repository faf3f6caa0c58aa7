package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One keyed observation for the streaming heavy-hitter sketch. */
final case class HHEvent(event_type: String, user_id: Long)

/** A heavy-hitter snapshot row: the state of one tracked counter after
  * `n_seen` observations of the key's stream. `est_count` carries the
  * Space-Saving guarantee: true_count <= est_count <= true_count +
  * (n_seen / capacity). The latest snapshot per key (max `n_seen`) is
  * the current top-k table. */
final case class HHSnapshot(event_type: String, n_seen: Long, rank: Int,
    user_id: Long, est_count: Long)

/** Streaming top-k heavy hitters per key via the Space-Saving sketch
  * (Metwally et al., "Efficient computation of frequent and top-k
  * elements in data streams"): at most `capacity` counters per key —
  * when a new item arrives at a full table it REPLACES the minimum
  * counter and inherits its count + 1. O(capacity) state per key
  * forever, which is the property that matters on an unbounded
  * stream: an exact per-user count table grows with the user universe;
  * this never does. Every item whose true frequency exceeds
  * n_seen/capacity is guaranteed present in the table regardless of
  * arrival order; with fewer distinct items than `capacity` the counts
  * are exact (both properties are pinned by StreamingTopKSpec).
  *
  * Emits the current top-`k` per key after every input batch; the
  * snapshot with the highest `n_seen` is the live table. Ties on
  * count break by user_id (deterministic eviction and ranking).
  */
class TopKProcessor(capacity: Int, k: Int)
    extends StatefulProcessor[String, HHEvent, HHSnapshot] {

  @transient private var counts: MapState[Long, Long] = _
  @transient private var seen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState("counts", Encoders.scalaLong,
      Encoders.scalaLong, TTLConfig.NONE)
    seen = getHandle.getValueState("seen", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[HHEvent],
      timerValues: TimerValues): Iterator[HHSnapshot] = {
    // the per-key table is <= capacity entries — small enough to fold
    // in memory per batch and write back once
    val table = scala.collection.mutable.Map.empty[Long, Long]
    counts.iterator().foreach(p => table.update(p._1, p._2))
    var n = if (seen.exists()) seen.get() else 0L
    rows.foreach { e =>
      n += 1
      table.get(e.user_id) match {
        case Some(c) => table.update(e.user_id, c + 1)
        case None if table.size < capacity => table.update(e.user_id, 1L)
        case None =>
          // evict the deterministic minimum (count, then user_id) and
          // inherit its count: the Space-Saving overestimate bound
          val (mu, mc) = table.minBy { case (u, c) => (c, u) }
          table.remove(mu)
          table.update(e.user_id, mc + 1)
      }
    }
    seen.update(n)
    table.foreach { case (u, c) => counts.updateValue(u, c) }
    counts.keys().filterNot(table.contains).toList
      .foreach(counts.removeKey)
    table.toSeq.sortBy { case (u, c) => (-c, u) }.take(k).zipWithIndex
      .map { case ((u, c), i) => HHSnapshot(key, n, i + 1, u, c) }
      .iterator
  }
}

object StreamingTopK {
  /** Wires [[TopKProcessor]] over a stream with `event_type` and
    * `user_id` columns. */
  def topK(df: DataFrame, capacity: Int = 64, topK: Int = 5): Dataset[HHSnapshot] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("event_type"), col("user_id").cast("long"))
      .as[HHEvent]
      .groupByKey(_.event_type)
      .transformWithState(new TopKProcessor(capacity, topK),
        TimeMode.None(), OutputMode.Update())
  }
}
