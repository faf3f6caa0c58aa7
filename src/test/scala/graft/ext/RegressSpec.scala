package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 40: q330 Granger, q331 Cook's
  * distance, q332 Breusch–Pagan. The expected statistics replicate
  * the engine's exact closed forms in plain Scala.
  */
class RegressSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rg").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  /** Build one event row per (day, centsEach) with `x` events. */
  private def mkEvents(xs: Seq[Int], cents: Seq[Long]) = {
    var id = 0L
    xs.zip(cents).zipWithIndex.flatMap { case ((x, c), dd) =>
      val per = c / x
      (1 to x).map { _ =>
        id += 1
        (id, new java.sql.Timestamp(base + dd * day + id * 1000L), 1L, "view",
          per / 100.0, "{}")
      }
    }
  }

  private def r4(v: Double) = math.floor(v * 1e4 + 0.500001) / 1e4
  private def r6(v: Double) = math.floor(v * 1e6 + 0.500001) / 1e6

  test("q330: the Granger F matches the replicated two-model closed form") {
    import spark.implicits._
    val xs = Seq(1, 2, 4, 1, 5, 3, 2)
    val ys = Seq(300L, 200L, 400L, 100L, 500L, 900L, 200L)
    val ev = mkEvents(xs, ys)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q330_granger").run(spark, plantDir("events" -> ev)).head()
    // lagged triples (y_t, y_{t-1}, x_{t-1}) for t = 2..7
    val rows = (1 until 7).map(t => (ys(t).toDouble, ys(t - 1).toDouble, xs(t - 1).toDouble))
    val n = rows.size.toDouble
    val (s1, s2, sy) = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._1).sum)
    val a11 = rows.map(r0 => r0._2 * r0._2).sum - s1 * s1 / n
    val a22 = rows.map(r0 => r0._3 * r0._3).sum - s2 * s2 / n
    val a12 = rows.map(r0 => r0._2 * r0._3).sum - s1 * s2 / n
    val b1 = rows.map(r0 => r0._2 * r0._1).sum - s1 * sy / n
    val b2 = rows.map(r0 => r0._3 * r0._1).sum - s2 * sy / n
    val ayy = rows.map(r0 => r0._1 * r0._1).sum - sy * sy / n
    val det = a11 * a22 - a12 * a12
    val rssf = ayy - ((b1 * a22 - b2 * a12) / det) * b1 -
      ((b2 * a11 - b1 * a12) / det) * b2
    val rssr = ayy - b1 * b1 / a11
    assert(r.getAs[Long]("n_days") == 6L)
    assert(math.abs(r.getAs[Double]("granger_f") - r4((rssr - rssf) * 3.0 / rssf)) < 1e-9)
  }

  test("q331: the single bent day carries the top Cook's distance") {
    import spark.implicits._
    val ev = mkEvents(Seq(1, 2, 3, 4, 5),
      Seq(100L, 200L, 300L, 400L, 1000L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q331_cooks_distance").run(spark, plantDir("events" -> ev))
      .collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[Long]("day") == 19727L) // the x=5, y=1000 day
    val ds = rows.map(_.getAs[Double]("cooks_d"))
    assert(ds.sliding(2).forall(p => p(0) >= p(1)))
    rows.foreach { rr =>
      val h = rr.getAs[Double]("leverage")
      assert(h > 0.0 && h < 1.0)
    }
  }

  test("q332: the BP statistic matches the replicated auxiliary regression") {
    import spark.implicits._
    val xs = Seq(1, 2, 3, 4)
    val ys = Seq(150L, 180L, 330L, 380L)
    val ev = mkEvents(xs, ys)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q332_breusch_pagan").run(spark, plantDir("events" -> ev)).head()
    val n = 4.0
    val (sx, sy) = (xs.sum.toDouble, ys.sum.toDouble)
    val cxx = xs.map(x => x.toDouble * x).sum - sx * sx / n
    val cxy = xs.zip(ys).map { case (x, y) => x.toDouble * y }.sum - sx * sy / n
    val (mx, my) = (sx / n, sy / n)
    val e2 = xs.zip(ys).map { case (x, y) =>
      val e = y.toDouble - my - (cxy / cxx) * (x - mx)
      math.floor(e * e * 1e2 + 0.5)
    }
    val se = e2.sum
    val sxe = xs.zip(e2).map { case (x, e) => x * e }.sum
    val see = e2.map(e => e * e).sum
    val bp = n * (sxe - sx * se / n) * (sxe - sx * se / n) /
      (cxx * (see - se * se / n))
    assert(r.getAs[Long]("n_days") == 4L)
    assert(math.abs(r.getAs[Double]("bp_stat") - r4(bp)) < 1e-9)
  }
}
