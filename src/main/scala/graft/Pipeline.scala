package graft

import graft.ops.Health
import graft.streaming.{HealthScore, StreamingHealth}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four statements composed end-to-end on its OWN data
  * model (`Schemas.HealthEvent` + the 10-row patients dim) — the batch
  * twin for tests/backfills and the streaming deployment shape.
  *
  *   [1] enriched_events          (flink_statements.tf:117-131)
  *   [2] enriched_events_flagged  (:173-211) — 1 s TUMBLE avg + M1
  *   [3] filtered_enriched_events (:253-257)
  *   [4] heartbeat_alerts         (:299-333) — M2 forecast, alert < 40
  */
object Pipeline {

  val AlertThresholdBpm = 40.0 // flink_statements.tf:333
  val MinTrainingSize = 30     // flink_statements.tf:195
  val WindowMs = 1000L         // flink_statements.tf:181

  /** [1] */
  def enrichedEvents(events: DataFrame, spark: SparkSession): DataFrame =
    Health.enrich(events, Schemas.patientsDf(spark), "patient_id", "patient_id")

  /** [2] batch: per-second smoothing then cumulative anomaly scoring on
    * the smoothed series. */
  def flaggedEvents(events: DataFrame, minTraining: Int = MinTrainingSize): DataFrame = {
    val windowed = Health.windowedAvg(events, "patient_id", "event_time",
      "vitals.heart_rate", "1 second")
    Health.detectAnomalies(windowed, "patient_id", "window_start", "avg_value",
      "window_start", minTraining)
      .select(col("patient_id"), col("window_start").as("event_timestamp"),
        col("avg_value").as("observed_value"), col("report"))
  }

  /** [2] as SQL — near-verbatim the reference statement's shape
    * (flink_statements.tf:173-211: CTE over a 1 s TUMBLE aggregate, then
    * the ML function as an OVER aggregate, then the rename projection),
    * runnable because [[GraftExtensions.install]] registers
    * `ml_detect_anomalies` as a SQL window function. Proven equivalent
    * to [[flaggedEvents]] in PipelineSpec. */
  def flaggedEventsSql(events: DataFrame, spark: SparkSession): DataFrame = {
    GraftExtensions.install(spark)
    events.createOrReplaceTempView("events_v")
    spark.sql("""
      WITH windowed_vitals AS (
        SELECT patient_id,
          window(event_time, '1 second').start AS event_timestamp,
          AVG(vitals.heart_rate) AS avg_heart_rate
        FROM events_v
        GROUP BY patient_id, window(event_time, '1 second')
      )
      SELECT patient_id, event_timestamp,
        avg_heart_rate AS observed_value,
        ml_detect_anomalies(avg_heart_rate) OVER (
          PARTITION BY patient_id ORDER BY event_timestamp
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS report
      FROM windowed_vitals""")
  }

  /** [3] */
  def filteredEvents(flagged: DataFrame): DataFrame = Health.filterNormal(flagged)

  /** [4] */
  def heartbeatAlerts(filtered: DataFrame,
      minTraining: Int = MinTrainingSize): DataFrame =
    Health.alerts(
      Health.forecast(filtered, "patient_id", "event_timestamp",
        "observed_value", "event_timestamp", minTraining),
      AlertThresholdBpm)
      .select(col("patient_id"), col("event_timestamp"),
        col("observed_value").as("current_value"), col("forecast_value"))

  /** The full batch chain [2]→[4]. */
  def alertsBatch(events: DataFrame,
      minTraining: Int = MinTrainingSize): DataFrame =
    heartbeatAlerts(filteredEvents(flaggedEvents(events, minTraining)), minTraining)

  /** The full streaming chain [1]∥([2]→[4]) — note statement [2] reads
    * the RAW events again, not enriched_events (the reference's
    * dead-end-output shape, SURVEY.md §0.1), so enrichment and scoring
    * are parallel consumers here too. */
  def streaming(events: DataFrame, spark: SparkSession,
      watermarkDelay: String = "10 seconds",
      minTraining: Int = MinTrainingSize): (DataFrame, Dataset[HealthScore]) = {
    val enriched = StreamingHealth.enrich(events, Schemas.patientsDf(spark),
      "patient_id", "patient_id")
    val scored = StreamingHealth.score(
      events.select(col("patient_id"), col("event_time"),
        col("vitals.heart_rate").cast("double").as("value")),
      watermarkDelay, WindowMs, minTraining,
      alertThreshold = AlertThresholdBpm,
      originMs = Health.OriginMs)
    (enriched, scored)
  }
}
