package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** Property pins for the ARIMA-family M1/M2 upgrades (q160-q162):
  * warm-up discipline, CI coverage on a known AR(1) process, widening
  * h-step bounds, and the merge identities that make the buffers safe
  * under map-side combine. */
class TimeModelsSpec extends SparkSpec {

  /** Deterministic AR(1) series y_t = c + phi*y_{t-1} + sigma*eps_t with
    * a fixed-seed Gaussian (Box-Muller over a SplitMix-ish LCG). */
  private def ar1Series(n: Int, c: Double, phi: Double, sigma: Double,
      seed: Long = 42L): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val out = new Array[Double](n)
    var y = c / (1 - phi) // start at the stationary mean
    var i = 0
    while (i < n) {
      y = c + phi * y + sigma * rng.nextGaussian()
      out(i) = y
      i += 1
    }
    out
  }

  private def foldAnomaly(xs: Array[Double], minTrain: Int = 30): Seq[Ar1Report] = {
    val agg = new Ar1AnomalyAggregator(minTrain, 95.0)
    var buf = agg.zero
    val reports = Vector.newBuilder[Ar1Report]
    var prev = Double.NaN
    for (x <- xs) {
      buf = agg.reduce(buf, (prev, x))
      reports += agg.finish(buf)
      prev = x
    }
    reports.result()
  }

  test("warm-up: no anomaly flag and no interval before minTrain prior pairs") {
    val xs = ar1Series(200, c = 20.0, phi = 0.7, sigma = 2.0)
    val reps = foldAnomaly(xs, minTrain = 30)
    reps.zipWithIndex.foreach { case (r, i) =>
      // row i has i-1 prior pairs (rows 2..i); below the warm-up no
      // flag and no bounds may be emitted
      if (r.n_pairs < 30) {
        assert(!r.is_anomaly, s"flag before warm-up at row $i")
        assert(r.expected.isEmpty && r.lower.isEmpty && r.upper.isEmpty)
      }
      assert(r.n_pairs == math.max(0, i - 1), s"pair count at row $i")
    }
    assert(reps.exists(_.expected.nonEmpty), "never warmed up")
  }

  test("CI coverage: ~5% of a true AR(1) process falls outside the 95% band") {
    val xs = ar1Series(3000, c = 12.0, phi = 0.6, sigma = 1.5, seed = 7L)
    val reps = foldAnomaly(xs, minTrain = 30).filter(_.expected.nonEmpty)
    assert(reps.size > 2500)
    val outRate = reps.count(_.is_anomaly).toDouble / reps.size
    // 95% two-sided band: expect ~0.05; generous tolerance for finite n
    assert(outRate > 0.01 && outRate < 0.10, s"out-of-CI rate $outRate")
    // a genuine level shock IS flagged: append a 10-sigma jump
    val agg = new Ar1AnomalyAggregator(30, 95.0)
    var buf = agg.zero
    var prev = Double.NaN
    for (x <- xs) { buf = agg.reduce(buf, (prev, x)); prev = x }
    buf = agg.reduce(buf, (prev, xs.last + 15.0))
    assert(agg.finish(buf).is_anomaly, "10-sigma shock not flagged")
  }

  test("AR(1) fit recovers phi and the forecast bounds widen with horizon") {
    val xs = ar1Series(5000, c = 8.0, phi = 0.7, sigma = 1.0, seed = 11L)
    val agg = new Ar1ForecastAggregator(30, 5, 95.0)
    var buf = agg.zero
    var prev = Double.NaN
    var i = 0
    while (i < xs.length) {
      buf = agg.reduce(buf, (prev, xs(i), i.toLong, i.toLong))
      prev = xs(i)
      i += 1
    }
    val phi = buf.fit.mXY / buf.fit.mXX
    assert(math.abs(phi - 0.7) < 0.05, s"recovered phi $phi")
    val steps = agg.finish(buf)
    assert(steps.length == 5)
    val widths = steps.map(s => s.upper_bound - s.lower_bound)
    widths.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, s"bounds must widen: ${widths.toSeq}")
    }
    // h-step forecast decays toward the stationary mean c/(1-phi)
    val mean = 8.0 / (1 - 0.7)
    val d1 = math.abs(steps(0).forecast_value - mean)
    val d5 = math.abs(steps(4).forecast_value - mean)
    assert(d5 <= d1 + 1e-9, "forecast must contract toward the mean")
  }

  test("Ar1FBuf merge is order-independent and matches the sequential fit") {
    val xs = ar1Series(400, c = 5.0, phi = 0.5, sigma = 1.0, seed = 3L)
    val agg = new Ar1ForecastAggregator(30, 3, 95.0)
    def fold(lo: Int, hi: Int): Ar1FBuf = {
      var buf = agg.zero
      var i = lo
      while (i < hi) {
        val prev = if (i == 0) Double.NaN else xs(i - 1)
        buf = agg.reduce(buf, (prev, xs(i), i.toLong, i.toLong))
        i += 1
      }
      buf
    }
    val whole = fold(0, 400)
    val merged = agg.merge(agg.merge(fold(0, 97), fold(97, 215)), fold(215, 400))
    assert(merged.fit.n == whole.fit.n)
    assert(math.abs(merged.fit.mXY / merged.fit.mXX -
      whole.fit.mXY / whole.fit.mXX) < 1e-9)
    assert(merged.lastVal == whole.lastVal && merged.lastTs == whole.lastTs)
    val a = agg.finish(whole); val b = agg.finish(merged)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x.forecast_value - y.forecast_value) < 1e-8)
    }
  }

  test("EtsBuf: sequential fold is the plain recurrence; merge matches it") {
    val xs = ar1Series(300, c = 10.0, phi = 0.4, sigma = 2.0, seed = 9L)
    val agg = new EtsAggregator(0.3)
    // plain reference fold
    var ref = xs(0)
    for (x <- xs.drop(1)) ref = ref + 0.3 * (x - ref)
    var buf = agg.zero
    for (x <- xs) buf = agg.reduce(buf, x)
    assert(agg.finish(buf) == ref, "sequential path must be bit-exact")
    // merged spans agree to fp-roundoff (exact in real arithmetic)
    def span(lo: Int, hi: Int): EtsBuf = {
      var b = agg.zero
      var i = lo
      while (i < hi) { b = agg.reduce(b, xs(i)); i += 1 }
      b
    }
    val m = agg.merge(span(0, 120), span(120, 300))
    assert(math.abs(agg.finish(m) - ref) < 1e-9)
    val m2 = agg.merge(agg.merge(span(0, 50), span(50, 51)), span(51, 300))
    assert(math.abs(agg.finish(m2) - ref) < 1e-9)
  }

  test("HoltBuf: sequential fold is the plain recurrence; affine merge matches it") {
    val xs = ar1Series(500, c = 6.0, phi = 0.5, sigma = 1.5, seed = 13L)
      .zipWithIndex.map { case (x, i) => x + 0.05 * i } // add a real trend
    val agg = new HoltAggregator(0.3, 0.1)
    // plain reference fold
    var l = xs(0); var b = 0.0
    for (x <- xs.drop(1)) {
      val l1 = 0.3 * x + (1.0 - 0.3) * (l + b)
      b = 0.1 * (l1 - l) + (1.0 - 0.1) * b
      l = l1
    }
    var buf = agg.zero
    for (x <- xs) buf = agg.reduce(buf, x)
    val (sl, sb) = agg.finish(buf)
    assert(sl == l && sb == b, "sequential path must be bit-exact")
    // trend recovery needs signal >> noise (gamma=0.1 averages ~10
    // level-diffs, each carrying alpha*sigma noise): low-noise ramp
    var rbuf = agg.zero
    val rng2 = new scala.util.Random(1L)
    for (i <- 0 until 400)
      rbuf = agg.reduce(rbuf, 2.0 + 0.5 * i + 0.05 * rng2.nextGaussian())
    val (_, rTrend) = agg.finish(rbuf)
    assert(math.abs(rTrend - 0.5) < 0.05, s"trend $rTrend on a 0.5/step ramp")
    // merged spans agree to fp-roundoff (exact in real arithmetic)
    def span(lo: Int, hi: Int) = {
      var s = agg.zero
      var i = lo
      while (i < hi) { s = agg.reduce(s, xs(i)); i += 1 }
      s
    }
    val m = agg.merge(agg.merge(span(0, 88), span(88, 231)), span(231, 500))
    val (ml, mb) = agg.finish(m)
    assert(math.abs(ml - l) < 1e-8 && math.abs(mb - b) < 1e-8,
      s"merged ($ml,$mb) vs sequential ($l,$b)")
    // single-element spans (the degenerate merge path)
    val m2 = agg.merge(agg.merge(span(0, 1), span(1, 2)), span(2, 500))
    val (m2l, m2b) = agg.finish(m2)
    assert(math.abs(m2l - l) < 1e-8 && math.abs(m2b - b) < 1e-8)
  }

  test("CUSUM locates a planted level shift; seasonal profile is mean-zero") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // planted shift: mean 10 for t < 300, mean 14 after — the scaled
    // CUSUM statistic peaks AT the change point
    val rng = new scala.util.Random(23L)
    val rows = (0 until 600).map { t =>
      val mu = if (t < 300) 10.0 else 14.0
      (1L, new java.sql.Timestamp(1704067200000L + t * 1000L), t.toLong,
        mu + 0.3 * rng.nextGaussian())
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("user_id"))
    val peak = df
      .withColumn("vq", floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("p", sum(col("vq")).over(cum))
      .withColumn("t", row_number().over(ord).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("tot", sum(col("vq")).over(whole))
      .withColumn("absc", abs(col("n") * col("p") - col("t") * col("tot")))
      .orderBy(col("absc").desc).select(col("event_id")).head().getLong(0)
    assert(math.abs(peak - 299) <= 5, s"CUSUM peak at $peak, planted at 299")

    // q166 on driver data: per event_type, the seasonal components are
    // mean-zero by construction (deviations from the trend)
    val q166 = Registry.all.find(_.name == "q166_seasonal_decompose").get
      .run(spark, sf()).collect()
    q166.groupBy(_.getString(0)).foreach { case (et, rs) =>
      val weighted = rs.map(r => r.getAs[Double]("seasonal") * r.getAs[Long]("n_buckets")).sum
      val n = rs.map(_.getAs[Long]("n_buckets")).sum
      assert(math.abs(weighted / n) < 0.5, s"seasonal not mean-centered for $et")
    }
  }

  test("periodogram recovers a planted 24-hour cycle") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 31 days of hourly points with a clean daily sinusoid + noise
    val rng = new scala.util.Random(31L)
    val rows = (0 until 744).map { h =>
      (7L, new java.sql.Timestamp(1704067200000L + h * 3600_000L), h.toLong,
        70.0 + 8.0 * math.sin(2 * math.Pi * h / 24.0) + 0.5 * rng.nextGaussian())
    }
    val df = rows.toDF("user_id", "ts", "event_id", "value")
    val ordw = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
    val byU = Window.partitionBy(col("user_id"))
    // mean-centered exactly as q168 does (n*yq - tot): without
    // centering, the 70-unit DC mean leaks into the non-integer-cycle
    // 168 h bin and dominates the true 24 h signal
    val hourly = df
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(avg(col("value")).as("hv"))
      .select(col("user_id"),
        (row_number().over(ordw) - 1).cast("long").as("t"),
        floor(col("hv") * lit(1000.0) + lit(0.5)).cast("long").as("yq"))
      .withColumn("c", count(lit(1)).over(byU) * col("yq") - sum(col("yq")).over(byU))
    val periods = spark.createDataFrame(Seq(Tuple1(12L), Tuple1(24L), Tuple1(168L))).toDF("p")
    val ang = lit(2 * math.Pi) * col("t") / col("p")
    val spec = hourly.crossJoin(broadcast(periods))
      .withColumn("cq", floor(cos(ang) * lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("sq", floor(sin(ang) * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy(col("p"))
      .agg((sum((col("c") * col("cq")).cast("decimal(38,0)")).cast("double") *
        sum((col("c") * col("cq")).cast("decimal(38,0)")).cast("double") +
        sum((col("c") * col("sq")).cast("decimal(38,0)")).cast("double") *
        sum((col("c") * col("sq")).cast("decimal(38,0)")).cast("double")).as("power"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(spec(24L) > 10 * spec(12L) && spec(24L) > 10 * spec(168L),
      s"24h power must dominate: $spec")
  }

  test("q160/q161/q162 run on driver data and respect warm-up at sf0.001") {
    val byName = Registry.all.map(q => q.name -> q).toMap
    val q160 = byName("q160_ar1_anomaly").run(spark, sf())
    val rows = q160.collect()
    assert(rows.length == 1000)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_pairs")
      if (np < 30) assert(!r.getAs[Boolean]("is_anomaly"))
    }
    val q161 = byName("q161_ar1_forecast").run(spark, sf()).collect()
    // ~67 events/key at sf0.001 -> every key warms; 15 keys x 3 horizons
    assert(q161.length == 45, s"got ${q161.length}")
    val q162 = byName("q162_ets_level").run(spark, sf()).collect()
    assert(q162.length == 15)
    q162.foreach(r => assert(!r.getAs[Double]("ets_level").isNaN))
  }
}
