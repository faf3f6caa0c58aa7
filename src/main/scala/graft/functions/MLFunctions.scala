package graft.functions

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Column/SQL surface for the M1/M2 ML functions, mirroring the
  * reference's call shape (`ML_DETECT_ANOMALIES(value, config)` /
  * `ML_FORECAST(value, ts, config)`, flink_statements.tf:191-202,
  * 305-316) with the JSON-config keys becoming typed parameters.
  *
  * Usage (batch, O1 cumulative frame):
  * {{{
  * val detect = MLFunctions.detectAnomalies(30, 95.0)
  * df.withColumn("report", detect(col("value"))
  *     .over(Window.partitionBy("patient_id").orderBy("ts")
  *       .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  * }}}
  */
object MLFunctions {

  def detectAnomalies(minTrainingSize: Int = 30,
      confidencePercentage: Double = 95.0): UserDefinedFunction =
    udaf(new AnomalyAggregator(minTrainingSize, confidencePercentage),
      Encoders.scalaDouble)

  def forecast(minTrainingSize: Int = 30, horizon: Int = 1,
      confidencePercentage: Double = 95.0): UserDefinedFunction =
    udaf(new ForecastAggregator(minTrainingSize, horizon, confidencePercentage),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))

  /** SQL registration: `ml_detect_anomalies(value)` /
    * `ml_forecast(t, value)` with the reference's default config
    * (minTrainingSize=30, confidence=95, horizon=1). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("ml_detect_anomalies", detectAnomalies())
    spark.udf.register("ml_forecast", forecast())
  }
}
