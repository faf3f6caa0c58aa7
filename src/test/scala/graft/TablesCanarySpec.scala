package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift canary: the driver regenerates /root/testdata between
  * rounds and has already shipped `events.ts` as INT64 TIMESTAMP(NANOS)
  * (rounds 1-4) and TIMESTAMP_MICROS isAdjustedToUTC=0 → TIMESTAMP_NTZ
  * (round 5, which crashed 18 queries because the loader only handled
  * the nanos case). This spec makes the NEXT such regen fail one named
  * test instead of half the registry: it asserts the loader yields a
  * proper TimestampType for every SF on disk, and pins the
  * normalization on deliberately-poisoned fixtures for all three
  * physical encodings.
  */
class TablesCanarySpec extends SparkSpec {

  test("canary: Tables.events yields TimestampType ts at every SF on disk") {
    for (d <- Seq("0.001", "0.01", "0.1")) {
      val ev = Tables.events(spark, sf(d))
      assert(ev.schema("ts").dataType == TimestampType,
        s"sf$d events.ts read as ${ev.schema("ts").dataType} — driver data regen changed the physical type; extend Tables.events")
      // unix_micros is the call 17 sites make; it must analyze and run
      val n = ev.select(unix_micros(col("ts"))).limit(1).count()
      assert(n == 1)
    }
  }

  test("loader normalizes a TIMESTAMP_NTZ fixture (round-5 poison)") {
    val dir = java.nio.file.Files.createTempDirectory("canary_ntz").toString
    import spark.implicits._
    // 2024-01-01T00:00:01 wall-clock, no zone — exactly what Spark 4
    // infers from TIMESTAMP_MICROS isAdjustedToUTC=0
    val ntz = Seq("2024-01-01T00:00:01", "2024-01-01T00:00:02").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"), lit(1).as("patient_id"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    ntz.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // exact under the UTC session: wall-clock second 1 of 2024 == epoch micros
    val micros = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(micros.sameElements(Array(1704067201000000L, 1704067202000000L)))
  }

  test("loader still normalizes an INT64-nanos fixture (rounds 1-4 encoding)") {
    val dir = java.nio.file.Files.createTempDirectory("canary_nanos").toString
    import spark.implicits._
    // the legacy nanosAsLong read surfaces LongType; the loader must
    // truncate nanos→micros with integer div
    val asLong = Seq(1704067201123456789L, 1704067202987654321L).toDF("ts")
      .withColumn("patient_id", lit(1))
    asLong.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    val micros = ev.select(unix_micros(col("ts"))).as[Long].collect().sorted
    assert(micros.sameElements(Array(1704067201123456L, 1704067202987654L)))
  }

  test("loader passes a proper TIMESTAMP (UTC-adjusted) fixture through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("canary_tz").toString
    import spark.implicits._
    val tz = Seq("2024-01-01 00:00:01").toDF("s")
      .select(col("s").cast(TimestampType).as("ts"), lit(1).as("patient_id"))
    tz.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.select(unix_micros(col("ts"))).as[Long].head() == 1704067201000000L)
  }
}
