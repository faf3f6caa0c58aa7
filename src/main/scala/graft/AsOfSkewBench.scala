package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilience evidence for the native as-of join: plants a hot
  * key in the events table (every even event_id reassigned to one
  * user, so one key carries ~half of all probes AND ~half of all
  * quotes — the one-viral-instrument tick-data shape), then times the
  * plain `plans.AsOfJoin` against `joinSalted` (salt 8, only the hot
  * key salted). The plain join's hot key sorts+merges in ONE task; the
  * salted variant spreads it 8 ways at the cost of replicating only
  * the hot key's quotes. Result equality is asserted before any
  * timing. Prints one JSON line:
  * {"metric":"asof_skew_ratio","value":salted/plain,...}
  */
object AsOfSkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // the explicit salt is the portable plan; AQE skew handling only
      // splits exchanges feeding ITS known joins, not custom execs —
      // but disable it anyway so the comparison is pure
      .config("spark.sql.adaptive.skewJoin.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.events(spark, sfDir).localCheckpoint()
    val hotUser = 7L
    val probes = events.select(
      when(col("event_id") % 2 === 0, lit(hotUser))
        .otherwise(col("user_id")).as("user_id"),
      col("event_id"), col("ts"))
    val quotes = events.filter(col("event_type") === "purchase").select(
      when(col("event_id") % 2 === 0, lit(hotUser))
        .otherwise(col("user_id")).as("user_id"),
      col("ts"), col("value"))
      // the operator's documented determinism contract: one quote per
      // (key, ts) — the planted hot key merges many users' purchases,
      // which DO collide on exact timestamps at 10M events
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    val cols = Seq("ts" -> "qts", "value" -> "qv")
    val share = probes.groupBy(col("user_id")).count()
      .agg(max(col("count")).cast("double") / sum(col("count")))
      .head().getDouble(0)

    def plain() = plans.AsOfJoin.join(probes, quotes, "user_id", "ts", cols)
    def salted() = plans.AsOfJoin.joinSalted(probes, quotes, "user_id", "ts",
      cols, salt = 8, hotKeys = Seq(hotUser), saltBy = "event_id")

    // equality first: same matched quote per probe (compare a stable
    // aggregate fingerprint — sums over 10M rows, order-free)
    def fp(df: DataFrame) = df.agg(
      count(lit(1)),
      // decimal sums, NOT long/double: 10M rows x 1.7e15 µs overflows
      // BIGINT, and a double sum is association-order-dependent across
      // plans — both would fail equality on identical row sets
      sum(unix_micros(col("qts")).cast("decimal(38,0)")),
      sum(col("qv").cast("decimal(28,6)")),
      sum(when(col("qts").isNull, 1L).otherwise(0L))).head().toSeq
    require(fp(plain()) == fp(salted()), "salted as-of diverged from plain")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(df: => DataFrame): Double = { time(df); math.min(time(df), time(df)) }
    val tPlain = best2(plain())
    val tSalted = best2(salted())
    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"asof_skew_ratio","value":${s3(tSalted / tPlain)},""" +
      s""""plain":${s3(tPlain)},"salted":${s3(tSalted)},""" +
      s""""max_key_share":${s3(share)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
