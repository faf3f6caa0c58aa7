package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The built-in Structured Streaming operator surface beyond the fused
  * health processor (SURVEY.md §2.2's streaming rows): native tumbling /
  * sliding / session window aggregation in append mode, stream-stream
  * joins with watermark bounds, and within-watermark deduplication.
  * Each is a thin, tested composition — the engine work is Spark's; the
  * value here is the watermark/emission semantics pinned by the specs.
  */
object StreamingOps {

  /** Tumbling (or sliding, if `slide` differs) event-time window
    * aggregate, append mode: emits once the watermark passes window
    * end — the reference's TUMBLE emission. */
  def windowedAgg(events: DataFrame, key: String, ts: String, value: String,
      width: String, slide: Option[String] = None,
      watermarkDelay: String = "10 seconds"): DataFrame = {
    val win = slide.map(sl => window(col(ts), width, sl))
      .getOrElse(window(col(ts), width))
    events.withWatermark(ts, watermarkDelay)
      .groupBy(col(key), win.as("w"))
      .agg(count(lit(1)).as("n_events"), avg(col(value)).as("avg_value"),
        min(col(value)).as("min_value"), max(col(value)).as("max_value"))
      .select(col(key), col("w.start").as("window_start"),
        col("n_events"), col("avg_value"), col("min_value"), col("max_value"))
  }

  /** Session windows (inactivity gap) in append mode. */
  def sessionAgg(events: DataFrame, key: String, ts: String, value: String,
      gap: String, watermarkDelay: String = "10 seconds"): DataFrame =
    events.withWatermark(ts, watermarkDelay)
      .groupBy(col(key), session_window(col(ts), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col(value)).as("sum_value"))
      .select(col(key), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Stream-stream inner join: each left event pairs with right events
    * of the same key within `toleranceSeconds` — both sides watermarked
    * so state is bounded and eventually purged. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
      toleranceSeconds: Long, watermarkDelay: String = "10 seconds",
      ts: String = "event_time", value: String = "value"): DataFrame = {
    val l = left.withColumnRenamed(ts, "event_time")
      .withWatermark("event_time", watermarkDelay)
    val r = right.select(col(key).as("r_key"),
        col(ts).as("r_time"), col(value).as("r_value"))
      .withWatermark("r_time", watermarkDelay)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_time") >= col("event_time") - expr(s"INTERVAL $toleranceSeconds SECONDS") &&
        col("r_time") <= col("event_time") + expr(s"INTERVAL $toleranceSeconds SECONDS"))
  }

  /** Within-watermark deduplication on (key, ts): duplicates arriving
    * inside the watermark delay are dropped exactly once; state for old
    * keys is purged as the watermark advances. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String], ts: String,
      watermarkDelay: String = "30 seconds"): DataFrame =
    events.withWatermark(ts, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)
}
