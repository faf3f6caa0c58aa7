package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 47: q350 Durbin–Watson, q351 runs
  * test, q352 KPSS.
  */
class StationaritySpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_st").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  import java.sql.Timestamp
  private val dayUs = 86400000000L
  /** counts(i) events on day i, one event per second from midnight. */
  private def eventsWithDailyCounts(counts: Seq[Int]) = {
    import spark.implicits._
    var id = 0L
    counts.zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map { k =>
        id += 1
        (id, new Timestamp((day.toLong * dayUs + k * 1000000L) / 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q350: an alternating saw around a flat trend pins DW near 4") {
    // residuals alternate +5/-5 around mean -> e_t - e_{t-1} = ±10,
    // DW = sum(10^2)*(n-1)/ (sum 5^2 * n) -> ~ 4 (n-1)/n
    val ev = eventsWithDailyCounts(Seq.fill(10)(Seq(15, 5)).flatten)
    val r = byName("q350_durbin_watson").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 20L)
    // an even-length alternating series has a small negative OLS slope
    // (-50/665 here), not exactly zero
    assert(math.abs(r.getAs[Double]("slope")) < 0.1)
    val dw = r.getAs[Double]("dw_stat")
    assert(dw > 3.5 && dw <= 4.2, s"dw=$dw")
  }

  test("q351: perfectly alternating days maximize runs; two blocks minimize them") {
    // 21 days: 10 alternating (20, 4) pairs + one median day (12) that
    // the equal-to-median exclusion rule drops
    val alt = eventsWithDailyCounts(Seq.fill(10)(Seq(20, 4)).flatten :+ 12)
    val r1 = byName("q351_runs_test").run(spark, plantDir("events" -> alt)).head()
    assert(r1.getAs[Long]("n_above") == 10L && r1.getAs[Long]("n_below") == 10L)
    assert(r1.getAs[Long]("n_runs") == 20L)
    assert(r1.getAs[Double]("z_runs") > 3.0) // far more runs than random

    val blocks = eventsWithDailyCounts(Seq.fill(10)(4) ++ Seq.fill(10)(20) :+ 12)
    val r2 = byName("q351_runs_test").run(spark, plantDir("events" -> blocks)).head()
    assert(r2.getAs[Long]("n_runs") == 2L)
    assert(r2.getAs[Double]("z_runs") < -3.0) // clumped
  }

  test("q352: white noise reads stationary; a level shift does not") {
    // deterministic "noise": period-4 pattern, mean-reverting
    val noise = eventsWithDailyCounts(Seq.fill(15)(Seq(10, 14, 9, 13)).flatten)
    val r1 = byName("q352_kpss").run(spark, plantDir("events" -> noise)).head()
    assert(r1.getAs[Long]("n_days") == 60L)
    assert(r1.getAs[Boolean]("level_stationary_5pct"),
      s"kpss=${r1.getAs[Double]("kpss_stat")}")

    // hard level shift: 30 days at 10, 30 days at 100
    val shift = eventsWithDailyCounts(Seq.fill(30)(10) ++ Seq.fill(30)(100))
    val r2 = byName("q352_kpss").run(spark, plantDir("events" -> shift)).head()
    assert(!r2.getAs[Boolean]("level_stationary_5pct"),
      s"kpss=${r2.getAs[Double]("kpss_stat")}")
    assert(r2.getAs[Double]("kpss_stat") > r1.getAs[Double]("kpss_stat"))
  }
}
