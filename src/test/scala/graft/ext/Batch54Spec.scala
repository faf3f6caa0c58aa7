package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 54: q387 Bartels rank von Neumann,
  * q388 turning points, q389 odds ratio / relative risk, q390
  * Cox–Stuart trend test.
  */
class Batch54Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b54").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String = "view") = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def dailySeries(counts: Seq[Int]) = toEvents(
    counts.zipWithIndex.flatMap { case (k, day) =>
      (1 to k).map(i => evAt(i.toLong, base + day * dayMs))
    })

  test("q387: ranks 1,3,2,4 pin RVN = 36/20 = 1.8, z = -0.2673") {
    val r = byName("q387_bartels_rvn")
      .run(spark, plantDir("events" -> dailySeries(Seq(10, 30, 20, 40)))).head()
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("nb2") == 36L)
    assert(r.getAs[Long]("d2") == 20L)
    assert(math.abs(r.getAs[Double]("rvn") - 1.8) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_rvn") - (-0.2673)) < 1e-9)
  }

  test("q388: a 5-day zigzag has all 3 interior days as turning points") {
    val r = byName("q388_turning_points")
      .run(spark, plantDir("events" -> dailySeries(Seq(10, 20, 10, 20, 10)))).head()
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_turning") == 3L)
    assert(r.getAs[Double]("expected") == 2.0)
    // z = 1 / sqrt(51/90)
    assert(math.abs(r.getAs[Double]("z_tp") - 1.3284) < 1e-9)
  }

  test("q389: odd-id purchasers replicate the local 2x2 and Woolf CI exactly") {
    // arms come from md5("ab|<uid>"); replicate the hash locally so the
    // expected cells are known without trusting the engine under test
    def arm(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"ab|$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      val purch = u % 2 == 1
      Seq(evAt(u, base)) ++ (if (purch) Seq(evAt(u, base + 1000, "purchase")) else Nil)
    }
    val a = users.count(u => arm(u) == 1 && u % 2 == 1).toLong
    val b = users.count(u => arm(u) == 1 && u % 2 == 0).toLong
    val c = users.count(u => arm(u) == 0 && u % 2 == 1).toLong
    val dd = users.count(u => arm(u) == 0 && u % 2 == 0).toLong
    val r = byName("q389_odds_ratio")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("a") == a && r.getAs[Long]("b") == b)
    assert(r.getAs[Long]("c") == c && r.getAs[Long]("d") == dd)
    def r4(x: Double) = math.floor(x * 10000 + 0.500001) / 10000
    val or = a.toDouble * dd / (b.toDouble * c)
    assert(r.getAs[Double]("odds_ratio") == r4(or))
    assert(r.getAs[Double]("relative_risk") ==
      r4((a.toDouble / (a + b)) / (c.toDouble / (c + dd))))
    val lnq = math.floor(math.log(or) * 1e12 + 0.5) / 1e12
    val seq = math.floor(math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd)
      * 1e12 + 0.5) / 1e12
    assert(r.getAs[Double]("or_ci_lo") == r4(math.exp(lnq - 1.96 * seq)))
    assert(r.getAs[Double]("or_ci_hi") == r4(math.exp(lnq + 1.96 * seq)))
  }

  test("q389: universal conversion empties cells b/d -> NULL estimates") {
    val rows = (1L to 8L).flatMap(u =>
      Seq(evAt(u, base), evAt(u, base + 1000, "purchase")))
    val r = byName("q389_odds_ratio")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("b") == 0L && r.getAs[Long]("d") == 0L)
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
    assert(r.isNullAt(r.fieldIndex("or_ci_hi")))
  }

  test("q390: a strictly increasing dozen pins z = 2.0412, trend increasing") {
    val r = byName("q390_cox_stuart")
      .run(spark, plantDir("events" -> dailySeries((10 until 22).map(identity)))).head()
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Long]("n_plus") == 6L)
    // z = (6 - 0.5 - 3)/sqrt(1.5)
    assert(math.abs(r.getAs[Double]("z_cs") - 2.0412) < 1e-9)
    assert(r.getAs[String]("trend") == "increasing")
  }
}
