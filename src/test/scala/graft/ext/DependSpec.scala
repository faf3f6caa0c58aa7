package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 32: q303 two-factor OLS, q304
  * overdispersion, q305 entropy rate, q306 Chatterjee's xi.
  */
class DependSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dp").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  test("q303: the exact plane y = 100*x1 + 50*x2 is recovered with R2 = 1") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, dd: Long, u: Long, v: Double) =
      (id, new Timestamp(base + dd * day + id * 1000L), u, "view", v, "{}")
    // daily (x1,x2,y-cents): (1,1,150),(2,1,250),(2,2,300),(3,2,400)
    val rows = Seq(
      ev(1, 0, 1, 1.50),
      ev(2, 1, 1, 1.25), ev(3, 1, 1, 1.25),
      ev(4, 2, 1, 1.50), ev(5, 2, 2, 1.50),
      ev(6, 3, 1, 1.00), ev(7, 3, 1, 1.50), ev(8, 3, 2, 1.50))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q303_ols_two_factor").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_days") == 4L)
    assert(math.abs(r.getAs[Double]("beta_volume") - 100.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("beta_users") - 50.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-3)
    assert(math.abs(r.getAs[Double]("r2") - 1.0) < 1e-6)
  }

  test("q304: constant, varying, and single-burst types pin the dispersion ratios") {
    import spark.implicits._
    import java.sql.Timestamp
    var id = 0L
    def evs(dd: Long, t: String, k: Int) = (1 to k).map { _ =>
      id += 1
      (id, new Timestamp(base + dd * day + id * 1000L), 1L, t, 1.0, "{}")
    }
    // A: (2,2,2); B: (1,2,3); C: (0,3,0) via zero-fill
    val rows = (evs(0, "A", 2) ++ evs(1, "A", 2) ++ evs(2, "A", 2) ++
      evs(0, "B", 1) ++ evs(1, "B", 2) ++ evs(2, "B", 3) ++
      evs(1, "C", 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q304_overdispersion").run(spark, plantDir("events" -> rows))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("A").getAs[Double]("var_mean_ratio") == 0.0)
    assert(out("A").getAs[Double]("dispersion_chi2") == 0.0)
    assert(math.abs(out("B").getAs[Double]("var_mean_ratio") - 0.5) < 1e-9)
    assert(math.abs(out("B").getAs[Double]("dispersion_chi2") - 1.0) < 1e-9)
    assert(math.abs(out("C").getAs[Double]("var_mean_ratio") - 3.0) < 1e-9)
    assert(math.abs(out("C").getAs[Double]("dispersion_chi2") - 6.0) < 1e-9)
  }

  test("q305: the A A B A chain's entropy rate is pi_A * ln 2") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(("A", 0L), ("A", 1L), ("B", 2L), ("A", 3L)).zipWithIndex.map {
      case ((t, off), i) => (i.toLong + 1, new Timestamp(base + off * 1000L), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q305_entropy_rate").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_states") == 2L)
    // rows: A -> (1/2,1/2) has H=ln2, B -> (1) has H=0; pi_A = 2/3
    assert(math.abs(r.getAs[Double]("entropy_rate_nats") - 2.0 / 3 * math.log(2)) < 2e-3)
  }

  test("q306: perfectly monotone spend gives xi = 1 - 3/(n+1) = 0.5 at n=5") {
    import spark.implicits._
    import java.sql.Timestamp
    var id = 0L
    val rows = (0 until 5).flatMap { dd =>
      (0 to dd).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // x = (1..5), y = (100..500) cents: rank walk steps all 1
    val r = byName("q306_xi_correlation").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(math.abs(r.getAs[Double]("xi") - 0.5) < 1e-9)
  }
}
