package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The full reference pipeline in one plan (flink_statements.tf
    * statements [1]→[4]): enrichment lookup join, per-key anomaly report
    * (ML_DETECT_ANOMALIES baseline), per-key 1-step trend forecast
    * (ML_FORECAST baseline). Warm-up is shortened to 5 points because
    * sf0.001 has only ~6 events per key. Emits every scored event (the
    * unfiltered union of statements [2]+[4] outputs), so rows > 0 by
    * construction. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val dim = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    val enriched = ops.Health.enrich(Tables.events(spark, d), dim, "user_id", "c_custkey")
    val flagged = ops.Health.detectAnomalies(enriched, "user_id", "ts", "value",
      "event_id", minTraining = 5)
    ops.Health.forecast(flagged, "user_id", "ts", "value", "event_id", minTraining = 5)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        col("c_name").as("name"), col("event_type"),
        col("report.is_anomaly").as("is_anomaly"),
        col("report.expected").as("expected"),
        col("forecast_value"), col("lower_bound"), col("upper_bound"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
