package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 34: q310 exponential-mixture EM,
  * q311 Hill tail index, q312 IACT, q313 CVaR.
  */
class TailSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tl").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  test("q310: a 12:4 mix of 30s and 300min gaps separates the two rates") {
    import spark.implicits._
    import java.sql.Timestamp
    // one user; 12 fast gaps (30 s -> bucket 0, x=0.5) then 4 slow
    // gaps (300 min -> x=300.5)
    var t = base
    val stamps = Seq(t) ++ (1 to 12).map { _ => t += 30000L; t } ++
      (1 to 4).map { _ => t += 300L * 60000L; t }
    val ev = stamps.zipWithIndex.map { case (ms, i) =>
      (i.toLong + 1, new Timestamp(ms), 1L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q310_exp_mixture_em").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_gaps") == 16L)
    val (w, l1, l2) = (r.getAs[Double]("weight_fast"),
      r.getAs[Double]("lambda_fast"), r.getAs[Double]("lambda_slow"))
    assert(w > 0.55 && w < 0.95)            // true fast share 0.75
    assert(l1 > 10 * l2)                    // components separated
    assert(l1 > 0.5 && l1 < 2.5)            // fast midpoint 0.5 -> ~2/min
    assert(l2 > 0.001 && l2 < 0.02)         // slow midpoint 300.5 -> ~1/300
  }

  test("q311: lengths 1100..1300 pin the Hill alpha against the same quantized sum") {
    import spark.implicits._
    // 201 ranked docs 1300..1100 plus filler below the threshold
    val docs = ((0 to 200).map(i => (i.toLong + 1, "t", "en", "a", 1300L - i)) ++
      (1 to 50).map(i => (i.toLong + 500, "t", "en", "a", 100L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q311_hill_tail").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("k") == 200L)
    assert(r.getAs[Long]("x_threshold") == 1100L)
    val sl = (0 until 200).map { i =>
      math.floor(math.log((1300.0 - i) / 1100.0) * 1e9 + 0.5).toLong
    }.sum
    val exp = math.floor(200.0 / (sl / 1e9) * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Double]("hill_alpha") == exp)
  }

  test("q312: a ramp has positive short-lag ACF; an alternator cuts at lag 0") {
    import spark.implicits._
    import java.sql.Timestamp
    var id = 0L
    def series(xs: Seq[Int]) = xs.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val ramp = byName("q312_iact").run(spark,
      plantDir("events" -> series((1 to 8).map(_ * 2)))).head()
    assert(ramp.getAs[Long]("n_days") == 8L)
    assert(ramp.getAs[Long]("cutoff_lag") >= 1L)
    assert(ramp.getAs[Double]("tau") > 1.0)
    assert(ramp.getAs[Double]("ess_days") < 8.0)
    id = 0L
    val alt = byName("q312_iact").run(spark,
      plantDir("events" -> series(Seq(10, 20, 10, 20, 10, 20)))).head()
    // rho_1 < 0: the initial positive sequence is empty -> tau undefined
    assert(alt.getAs[Long]("cutoff_lag") == 0L)
    assert(alt.isNullAt(alt.fieldIndex("tau")))
  }

  test("q313: 40 linear spend days put VaR at day 2's level and CVaR at 1.5") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (1 to 40).map(i =>
      (i.toLong, new Timestamp(base + (i - 1) * day + 1000L), 1L, "view",
        i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q313_cvar").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 40L)
    assert(r.getAs[Long]("n_tail") == 2L)
    assert(math.abs(r.getAs[Double]("var95") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("cvar95") - 1.5) < 1e-9)
  }
}
