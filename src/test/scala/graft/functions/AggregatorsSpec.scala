package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  private def detect(xs: Seq[Double], minTrain: Int = 5): Seq[AnomalyReport] = {
    val agg = new AnomalyAggregator(minTrain, 95.0)
    xs.scanLeft(agg.zero)((b, x) => agg.reduce(b, x)).tail.map(agg.finish)
  }

  test("M1: never flags during warm-up") {
    val noisy = Seq(10.0, 11.0, 9.0, 12.0, 8.0, 500.0)
    val reports = detect(noisy, minTrain = 10) // warm-up longer than series
    assert(reports.forall(!_.is_anomaly))
  }

  test("M1: flags an injected spike after warm-up, not the normal points") {
    val xs = Seq.tabulate(30)(i => 10.0 + (i % 3)) ++ Seq(100.0, 10.0)
    val reports = detect(xs)
    assert(reports(30).is_anomaly, "spike must be flagged")
    assert(reports.zipWithIndex.filter(_._2 != 30).forall(!_._1.is_anomaly),
      "normal points must not be flagged")
  }

  test("M1: constant series has zero variance and never flags") {
    val reports = detect(Seq.fill(50)(42.0))
    assert(reports.forall(!_.is_anomaly))
    assert(reports.last.expected.contains(42.0))
  }

  test("M1: CI bounds straddle the mean and widen with confidence") {
    val xs = Seq.tabulate(40)(i => 10.0 + (i % 5))
    val r95 = {
      val a = new AnomalyAggregator(5, 95.0)
      a.finish(xs.foldLeft(a.zero)(a.reduce))
    }
    val r99 = {
      val a = new AnomalyAggregator(5, 99.0)
      a.finish(xs.foldLeft(a.zero)(a.reduce))
    }
    assert(r95.lower.get < r95.expected.get && r95.expected.get < r95.upper.get)
    assert(r99.upper.get - r99.lower.get > r95.upper.get - r95.lower.get)
  }

  test("M1: merge(split) == reduce(all) — parallel-safe state") {
    val xs = Seq.tabulate(100)(i => math.sin(i) * 10 + 50)
    val agg = new AnomalyAggregator(5, 95.0)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = xs.splitAt(37)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(math.abs(whole.prior.mean - merged.prior.mean) < 1e-9)
    assert(math.abs(whole.prior.m2 - merged.prior.m2) < 1e-6)
    assert(whole.prior.n == merged.prior.n && whole.last == merged.last)
  }

  test("M2: perfect linear ramp forecasts the exact next value, rmse ~ 0") {
    val agg = new ForecastAggregator(3, 1, 95.0)
    val b = (1 to 20).foldLeft(agg.zero)((s, i) => agg.reduce(s, (i.toDouble, 2.0 * i + 5)))
    val Array(row) = agg.finish(b)
    assert(math.abs(row.forecast_timestamp - 21.0) < 1e-9)
    assert(math.abs(row.forecast_value - 47.0) < 1e-9)
    assert(row.rmse < 1e-6)
  }

  test("M2: bounds contain the point forecast; horizon emits h rows") {
    val agg = new ForecastAggregator(3, 4, 95.0)
    val xs = (1 to 30).map(i => (i.toDouble, 50.0 + 3 * i + (i % 7)))
    val b = xs.foldLeft(agg.zero)((s, tv) => agg.reduce(s, tv))
    val rows = agg.finish(b)
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.lower_bound <= r.forecast_value && r.forecast_value <= r.upper_bound)
    }
    assert(rows(1).forecast_timestamp > rows(0).forecast_timestamp)
  }

  test("M2: below minimum training emits nothing") {
    val agg = new ForecastAggregator(30, 1, 95.0)
    val b = (1 to 10).foldLeft(agg.zero)((s, i) => agg.reduce(s, (i.toDouble, i * 1.0)))
    assert(agg.finish(b).isEmpty)
  }

  test("udaf over a cumulative window matches the SQL z-score baseline") {
    val df = graft.Tables.events(spark, sf())
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrior = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val detectFn = MLFunctions.detectAnomalies(10, 95.0)
    val z = Stats.normalQuantile(0.5 + 95.0 / 200.0)
    val both = df
      .withColumn("report", detectFn($"value").over(w))
      .withColumn("mu", avg($"value").over(wPrior))
      .withColumn("sigma", stddev_samp($"value").over(wPrior))
      .withColumn("n", count($"value").over(wPrior))
      .withColumn("sql_flag",
        $"n" >= 10 && $"sigma".isNotNull && $"sigma" > 0 &&
          abs($"value" - $"mu") > lit(z) * $"sigma")
      .select($"report.is_anomaly".as("agg_flag"), $"sql_flag",
        $"report.expected", $"mu", $"report.n_training", $"n")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getBoolean(0) == r.getBoolean(1), s"flag mismatch: $r")
      assert(r.getLong(4) == r.getLong(5), s"n mismatch: $r")
      if (!r.isNullAt(1) && r.getLong(5) > 0)
        assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9, s"mu mismatch: $r")
    }
  }

  test("normal quantile matches known values to ~ulp") {
    assert(math.abs(Stats.normalQuantile(0.975) - 1.959963984540054) < 1e-14)
    assert(math.abs(Stats.normalQuantile(0.995) - 2.5758293035489004) < 5e-14)
    assert(math.abs(Stats.normalQuantile(0.5)) < 1e-14)
    assert(math.abs(Stats.normalCdf(1.959963984540054) - 0.975) < 1e-15)
    // the engine-wide constant is the function's own output (bit-identical
    // across Spark exprs, Aggregators, and interpolated oracle SQL)
    assert(graft.ops.Health.Z95 == Stats.normalQuantile(0.975))
  }
}
