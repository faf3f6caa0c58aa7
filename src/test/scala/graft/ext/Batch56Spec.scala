package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 56: q395 Newey–West HAC SE, q396
  * Cronbach's alpha, q397 Mahalanobis day scan, q398 Sen's slope.
  */
class Batch56Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b56").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String = "view", v: Double = 1.0) = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, v, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def dailySeries(counts: Seq[Int], value: Int => Double = _ => 1.0) =
    toEvents(counts.zipWithIndex.flatMap { case (k, day) =>
      (1 to k).map(i => evAt(i.toLong, base + day * dayMs, v = value(day)))
    })

  test("q395: an alternating 8-day series pins SE ratio = sqrt(0.2)") {
    // dev = ±40: Γ0=12800, Γ1=-11200, Γ2=9600, Γ3=-8000, Γ4=6400
    // → 5S·n³ = 12800, ratio = sqrt(2560/12800)
    val r = byName("q395_newey_west")
      .run(spark, plantDir("events" -> dailySeries(Seq(10, 20, 10, 20, 10, 20, 10, 20)))).head()
    assert(r.getAs[Long]("n_days") == 8L)
    assert(math.abs(r.getAs[Double]("se_iid") - 1.767767) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_nw") - 0.790569) < 1e-9)
    assert(math.abs(r.getAs[Double]("se_ratio") - 0.4472) < 1e-9)
  }

  test("q396: weeks that differ only in level have alpha = 1 exactly") {
    // complete dy-div-7 weeks start at offset 3 (base weekday = 4)
    val rows = (3 until 24).flatMap { o =>
      val week = (o - 3) / 7
      val k = 10 * (week + 1)
      (1 to k).map(i => evAt(i.toLong, base + o * dayMs))
    }
    val r = byName("q396_cronbach_alpha")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_weeks") == 3L)
    assert(r.getAs[Double]("cronbach_alpha") == 1.0)
  }

  test("q397: the off-line (volume,spend) day outranks the on-line scaled day") {
    // baseline days walk up the diagonal (volume = spend), so the
    // sample covariance learns the line; day 8 extends the line
    // (large but consistent), day 9 breaks it (volume 10, spend 50)
    val counts = Seq(10, 12, 14, 16, 18, 20, 22, 24, 30, 10)
    val rows = dailySeries(counts,
      value = day => if (day == 9) 5.0 else 1.0)
    val out = byName("q397_mahalanobis_days")
      .run(spark, plantDir("events" -> rows)).collect()
    assert(out.length == 5)
    val top = out.head
    assert(top.getAs[Long]("day") == base / dayMs + 9)
    assert(top.getAs[Long]("volume") == 10L)
    assert(top.getAs[Long]("spend_dollars") == 50L)
    // the doubled-but-proportional day is less anomalous than the
    // off-line day
    val d8 = out.find(_.getAs[Long]("day") == base / dayMs + 8).get
    assert(top.getAs[Double]("mahalanobis_d2") > d8.getAs[Double]("mahalanobis_d2"))
  }

  test("q398: +2/day everywhere pins Sen slope 2.0 (14 per week) over 45 pairs") {
    val r = byName("q398_sen_slope")
      .run(spark, plantDir("events" -> dailySeries((0 until 10).map(10 + 2 * _)))).head()
    assert(r.getAs[Long]("n_pairs") == 45L)
    assert(r.getAs[Double]("slope_per_day") == 2.0)
    assert(r.getAs[Double]("slope_per_week") == 14.0)
  }
}
