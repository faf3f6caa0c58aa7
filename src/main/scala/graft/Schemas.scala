package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's data model as typed Scala + StructType constants.
  *
  * Health event: the 3-level Avro record of `schema.tf:4-151` (nested
  * device_metadata and vitals.blood_pressure), with event time carried
  * as an explicit column (the reference reads it from the Kafka record
  * timestamp `$rowtime`, flink_statements.tf:119 — Spark has no implicit
  * rowtime, SURVEY.md §1.1).
  */
object Schemas {

  final case class BloodPressure(systolic: Int, diastolic: Int)
  final case class Vitals(
      heart_rate: Int,
      blood_oxygen_spO2: Int,
      blood_pressure: BloodPressure,
      body_temperature_c: Float)
  final case class DeviceMetadata(
      device_type: String,
      battery_level: Int,
      sensor_status: String)
  final case class HealthEvent(
      event_id: String,
      patient_id: Int,
      device_metadata: DeviceMetadata,
      vitals: Vitals,
      event_time: java.sql.Timestamp)

  val healthEvent: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("patient_id", IntegerType, nullable = false),
    StructField("device_metadata", StructType(Seq(
      StructField("device_type", StringType, nullable = false),
      StructField("battery_level", IntegerType, nullable = false),
      StructField("sensor_status", StringType, nullable = false))), nullable = false),
    StructField("vitals", StructType(Seq(
      StructField("heart_rate", IntegerType, nullable = false),
      StructField("blood_oxygen_spO2", IntegerType, nullable = false),
      StructField("blood_pressure", StructType(Seq(
        StructField("systolic", IntegerType, nullable = false),
        StructField("diastolic", IntegerType, nullable = false))), nullable = false),
      StructField("body_temperature_c", FloatType, nullable = false))), nullable = false),
    StructField("event_time", TimestampType, nullable = false)))

  final case class Patient(patient_id: Int, name: String, age: Int)

  /** The reference's 10-row `patients` dimension, verbatim
    * (db.tf:104-115). */
  val patients: Seq[Patient] = Seq(
    Patient(1, "John Doe", 45), Patient(2, "Jane Smith", 32),
    Patient(3, "Michael Brown", 50), Patient(4, "Emily Davis", 88),
    Patient(5, "Daniel Wilson", 60), Patient(6, "Sarah Johnson", 41),
    Patient(7, "David Miller", 37), Patient(8, "Laura Garcia", 69),
    Patient(9, "Robert Miller", 55), Patient(10, "Anna Lopez", 34))

  def patientsDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    patients.toDF()
  }
}
