package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the trend/split operators (value parity vs DuckDB is
  * covered by the oracle gate; these pin the relations the oracle
  * can't see). */
class TrendSpec extends SparkSpec {

  test("q145 OLS: matches a double-precision least-squares fit per segment") {
    val fit = Registry.queries("q145_ols_trend")(spark, sf()).cache()
    assert(fit.count() == 5, "one row per market segment")
    // brute-force reference in plain doubles: same data, naive formula —
    // the exact-integer path must land within float tolerance of it
    val o = Tables.orders(spark, sf()).select(col("o_custkey"),
      datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("double").as("x"),
      col("o_totalprice").as("usd"))
    val c = Tables.customer(spark, sf()).select(col("c_custkey"), col("c_mktsegment"))
    val ref = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("double").as("n"), sum(col("x")).as("sx"),
        sum(col("usd") * 100).as("sy"), sum(col("x") * col("usd") * 100).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("c_mktsegment"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope_ref"))
    val joined = fit.join(ref, "c_mktsegment")
      .select(abs(col("slope_cents_per_day") - col("slope_ref")).as("err"))
    assert(joined.filter(col("err") > 0.01).count() == 0,
      "integer-exact slope diverged from the double-precision reference")
    fit.unpersist()
  }

  test("q146 EWMA: one row per user, value inside the user's last-8 range") {
    val e = Registry.queries("q146_ewma")(spark, sf()).cache()
    val users = Tables.events(spark, sf()).select(col("user_id")).distinct().count()
    assert(e.count() == users, "exactly one EWMA row per user")
    // a convex combination of the last 8 values must lie inside their range
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id")).rowsBetween(-7, 0)
    val rng = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("lo", min(col("value")).over(w))
      .withColumn("hi", max(col("value")).over(w))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("lo"), col("hi"))
    val bad = e.join(rng, "user_id")
      .filter(col("ewma") < col("lo") - 1e-4 || col("ewma") > col("hi") + 1e-4)
    assert(bad.count() == 0, "EWMA escaped the last-8-value range")
    e.unpersist()
  }

  test("q146 EWMA weights: newest value dominates (weight ratio 4/3 per step)") {
    // hand-compute for the single busiest user from collected events
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
    val busiest = ev.groupBy("user_id").count()
      .orderBy(col("count").desc, col("user_id")).head.getLong(0)
    val hist = ev.filter(col("user_id") === busiest)
      .orderBy(col("us"), col("event_id")).collect()
      .map(r => math.floor(r.getDouble(3) * 1e6 + 0.5).toLong)
    val last8 = hist.takeRight(8).reverse // index 0 = newest
    val ws = Array.tabulate(last8.length)(k =>
      math.pow(3, k).toLong * math.pow(4, 7 - k).toLong)
    val expected = last8.zip(ws).map { case (v, wk) => v * wk }.sum.toDouble /
      (ws.sum * 1e6)
    val got = Registry.queries("q146_ewma")(spark, sf())
      .filter(col("user_id") === busiest).head.getDouble(2)
    assert(math.abs(got - expected) < 1e-4,
      s"EWMA $got != hand-computed $expected for user $busiest")
  }

  test("q147 split audit: events conserved, leakage matches direct recount") {
    val a = Registry.queries("q147_time_split_audit")(spark, sf()).cache()
    val rows = a.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val total = Tables.events(spark, sf()).count()
    assert(rows("train")._1 + rows("test")._1 == total, "events not conserved")
    // the p80 cut must put 75-85% of events in train (ties allowed)
    val share = rows("train")._1.toDouble / total
    assert(share >= 0.75 && share <= 0.85, s"train share $share not ~0.8")
    assert(rows("train")._3 == rows("test")._3, "leak count differs per row")
    // direct leakage recount
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val cut = ev.agg(floor(percentile(col("us"), lit(0.8))).cast("long"))
      .head.getLong(0)
    val direct = ev.groupBy("user_id")
      .agg(max(when(col("us") <= cut, 1L).otherwise(0L)).as("tr"),
        max(when(col("us") > cut, 1L).otherwise(0L)).as("te"))
      .filter(col("tr") === 1 && col("te") === 1).count()
    assert(rows("train")._3 == direct, "leak count != direct recount")
    a.unpersist()
  }
}
