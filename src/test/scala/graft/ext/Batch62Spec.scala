package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 62: q419 circadian Rayleigh, q420
  * stickiness, q421 power-user curve, q422 growth accounting.
  */
class Batch62Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b62").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val dayMs = 86400000L
  // 1704067200000 is a UTC midnight, so time-of-day offsets are exact
  private val base = 1704067200000L
  private var id = 0L
  private def evAt(u: Long, ms: Long) = {
    id += 1; (id, new java.sql.Timestamp(ms), u, "view", 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q419: a 05:00/07:00 split pins mean hour 6 and R = cos(pi/12)") {
    val rows = (1 to 8).map(i => evAt(i.toLong, base + 5 * 3600000L)) ++
      (9 to 16).map(i => evAt(i.toLong, base + 7 * 3600000L))
    val r = byName("q419_circadian_rayleigh")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_events") == 16L)
    assert(math.abs(r.getAs[Double]("resultant_r") - math.cos(math.Pi / 12)) < 1e-3)
    assert(math.abs(r.getAs[Double]("mean_hour") - 6.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("rayleigh_z") - 16 * 0.965926 * 0.965926) < 0.05)
    // R in the high-concentration branch but below the NULL clamp
    assert(!r.isNullAt(r.fieldIndex("kappa_vm")))
    assert(r.getAs[Double]("kappa_vm") > 10.0)
  }

  test("q419: a single-phase day degenerates to R = 1 and NULL kappa") {
    val rows = (1 to 4).map(i => evAt(i.toLong, base + 6 * 3600000L))
    val r = byName("q419_circadian_rayleigh")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Double]("resultant_r") == 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa_vm")))
  }

  private lazy val windowDir: String = {
    // 30 days 0..29; window = days 2..29. u1 active all 28 window days,
    // u2 on the 14 even window days, u3 only on day 0 (outside)
    val rows = (2 to 29).map(day => evAt(1L, base + day * dayMs)) ++
      (2 to 29).filter(_ % 2 == 0).map(day => evAt(2L, base + day * dayMs)) :+
      evAt(3L, base)
    plantDir("events" -> toEvents(rows))
  }

  test("q420: 28/14 active days over 2 window users pin stickiness 0.75") {
    val r = byName("q420_stickiness").run(spark, windowDir).head()
    assert(r.getAs[Long]("n_active_days") == 28L)
    assert(r.getAs[Double]("avg_dau") == 1.5)
    assert(r.getAs[Long]("mau") == 2L)
    assert(r.getAs[Double]("stickiness") == 0.75)
  }

  test("q421: the L28 histogram splits the window users at 14 and 28 days") {
    val rows = byName("q421_power_user_curve").run(spark, windowDir)
      .collect().map(r => r.getAs[Long]("n_active_days") -> r).toMap
    assert(rows.keySet == Set(14L, 28L))
    assert(rows(14L).getAs[Long]("n_users") == 1L)
    assert(rows(28L).getAs[Double]("share") == 0.5)
  }

  test("q422: churn, resurrection and a new joiner decompose three weeks exactly") {
    val wk = 7 * dayMs
    // w0: {1,2,3}; w1: {1,4}; w2: {1,3}
    val rows = Seq(evAt(1L, base), evAt(2L, base), evAt(3L, base),
      evAt(1L, base + wk), evAt(4L, base + wk),
      evAt(1L, base + 2 * wk), evAt(3L, base + 2 * wk))
    val out = byName("q422_growth_accounting")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
    assert(out.length == 3)
    val (w0, w1, w2) = (out(0), out(1), out(2))
    assert(w0.getAs[Long]("n_new") == 3L && w0.isNullAt(w0.fieldIndex("n_churned")))
    assert(w1.getAs[Long]("n_new") == 1L)
    assert(w1.getAs[Long]("n_retained") == 1L)
    assert(w1.getAs[Long]("n_churned") == 2L)
    assert(w1.getAs[Double]("quick_ratio") == 0.5)
    assert(w2.getAs[Long]("n_resurrected") == 1L)
    assert(w2.getAs[Long]("n_churned") == 1L)
    assert(w2.getAs[Double]("quick_ratio") == 1.0)
  }
}
