package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and read only through
  * here, so the same code runs at any scale factor. At cluster scale the
  * same call reads a partitioned table directory; nothing here assumes
  * single-file inputs.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark rejects
    * by default (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and truncate
    * to microseconds — exactly what DuckDB does on read, so the oracle
    * sees identical values. Integer `div`, never `/` (a double would lose
    * precision above 2^53 ns).
    *
    * NOTE the conf below is a deliberate SESSION-WIDE setting, not a
    * scoped one: Spark consults it when the physical scan is built (at
    * action time), so a save/restore around this lazy read would race
    * with execution. Consequence for callers: any later parquet read of
    * a TIMESTAMP(NANOS) column in the same session yields LongType nanos
    * instead of an AnalysisException — fine here because `events` is the
    * only nanos table in the driver's data, and every read goes through
    * this loader which normalizes to a proper microsecond timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // INT64 TIMESTAMP(NANOS): read as raw nanos, truncate to micros
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      // TIMESTAMP_MICROS isAdjustedToUTC=0 reads as NTZ in Spark 4; the
      // driver's generator writes UTC wall-clock, and every session here
      // pins spark.sql.session.timeZone=UTC, so the cast is exact and
      // downstream unix_micros(ts) sees the same instants DuckDB does.
      case TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
