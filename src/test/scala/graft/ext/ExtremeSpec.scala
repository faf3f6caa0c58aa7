package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 43: q339 GPD POT, q340 spectral
  * entropy, q341 winsorized correlation.
  */
class ExtremeSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ex").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  private def series(xs: Seq[Int], value: Int => Double = _ => 1.0) = {
    var id = 0L
    xs.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new java.sql.Timestamp(base + dd * day + id * 1000L), 1L, "view",
          value(dd), "{}")
      }
    }
  }

  private def r4(v: Double) = math.floor(v * 1e4 + 0.500001) / 1e4

  test("q339: 18x10 + {20,30} pins the MoM GPD fit and the 100-day level") {
    import spark.implicits._
    val ev = series(Seq.fill(18)(10) ++ Seq(20, 30))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q339_gpd_pot").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("threshold") == 10L)
    assert(r.getAs[Long]("n_exceed") == 2L)
    // exceedances {10, 20}: m=15, v=50 -> xi=-1.75, sigma=41.25
    assert(math.abs(r.getAs[Double]("gpd_xi") - -1.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("gpd_sigma") - 41.25) < 1e-9)
    val ret = 10.0 + 41.25 / -1.75 * (math.exp(-1.75 * math.log(100.0 * 2 / 20)) - 1.0)
    assert(r.getAs[Double]("return_100d") == r4(ret))
  }

  test("q340: a strict period-2 alternator concentrates spectral power") {
    import spark.implicits._
    val ev = series(Seq.tabulate(16)(i => if (i % 2 == 0) 10 else 20))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q340_spectral_entropy").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_freqs") == 16L)
    assert(r.getAs[Double]("spectral_entropy") < 0.3) // near-degenerate spectrum
    assert(r.getAs[Double]("forecastability") > 0.85)
  }

  test("q341: a clamp that lands back on the line keeps winsorized r at 1") {
    import spark.implicits._
    // constant per-event value: y = 100x, so the p5/p95 clamp maps
    // (20, 2000) to (19, 1900) — still on the line
    val ev = series((1 to 20).toSeq)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q341_winsorized_corr").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 20L)
    assert(math.abs(r.getAs[Double]("winsorized_r") - 1.0) < 1e-9)
  }
}
