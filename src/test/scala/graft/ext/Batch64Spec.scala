package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 64: q427 Menzerath–Altmann, q428
  * Taylor's law, q429 price endings, q430 order weekday seasonality.
  */
class Batch64Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b64").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q427: word length halving as tokens double pins b = -1, r = -1") {
    import spark.implicits._
    // mean word length via (n_chars - nt + 1)/nt: 8, 4, 2 as nt = 2,4,8
    val d = Seq(
      (1L, "a b", "en", "s", 17L),
      (2L, "a b c d", "en", "s", 19L),
      (3L, "a b c d e f g h", "en", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q427_menzerath").run(spark, plantDir("documents" -> d)).head()
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Double]("menzerath_b") == -1.0)
    assert(r.getAs[Double]("pearson_r") == -1.0)
  }

  test("q428: variance scaling as mean^2 pins the Taylor slope at 2") {
    import spark.implicits._
    val base = 1704067200000L
    val dayMs = 86400000L
    var id = 0L
    def burst(t: String, day: Int, k: Int) = (1 to k).map { _ =>
      id += 1
      (id, new java.sql.Timestamp(base + day * dayMs), 1L, t, 1.0, "{}")
    }
    // daily counts: a=(2,4) b=(4,8) c=(8,16): var = m^2 * 2/9-ish —
    // exactly collinear in ln-ln with slope 2
    val rows = (burst("a", 0, 2) ++ burst("a", 1, 4) ++
      burst("b", 0, 4) ++ burst("b", 1, 8) ++
      burst("c", 0, 8) ++ burst("c", 1, 16))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q428_taylor_law").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Double]("taylor_slope") == 2.0)
    // ln a = mean(ln v) - 2 mean(ln m) = 3 ln2 - 2 ln6 = ln(2/9)
    assert(math.abs(r.getAs[Double]("ln_a_intercept") - math.log(2.0 / 9.0)) < 1e-3)
  }

  test("q429: 6x.99 + 2x.00 + 2x.50 endings pin chi2 = 430 over 100 cells") {
    import spark.implicits._
    val li = ((1 to 6).map(_ => (1.0, 1.99)) ++
      (1 to 2).map(_ => (1.0, 3.00)) ++ (1 to 2).map(_ => (1.0, 2.50)))
      .toDF("l_quantity", "l_extendedprice")
    val r = byName("q429_price_endings").run(spark, plantDir("lineitem" -> li)).head()
    assert(r.getAs[Long]("n_lines") == 10L)
    assert(r.getAs[Double]("share_99") == 0.6)
    assert(r.getAs[Double]("share_00") == 0.2)
    // (5.9^2 + 2*1.9^2 + 97*0.1^2)/0.1
    assert(math.abs(r.getAs[Double]("chi2_uniform") - 430.0) < 1e-6)
  }

  test("q430: 7 Thursday orders vs 1 Friday pin the peak and an empty trough") {
    import spark.implicits._
    val day = 86400000L
    val t0 = 1704067200000L // epoch-day 19723, weekday (dy%7) = 4
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    // 7 orders on a wd-0 day (t0 + 3d), 1 on the next day (wd 1)
    val orders = ((1 to 7).map(i => (i.toLong, ts(t0 + 3 * day))) :+
      (8L, ts(t0 + 4 * day)))
      .toDF("o_orderkey", "o_orderdate")
    val r = byName("q430_order_weekday").run(spark, plantDir("orders" -> orders)).head()
    assert(r.getAs[Long]("n_orders") == 8L)
    assert(r.getAs[Long]("peak_wd") == 0L)
    assert(r.getAs[Double]("peak_share") == 0.875)
    assert(r.getAs[Long]("trough_wd") == 2L) // first weekday with zero orders
    assert(r.getAs[Double]("trough_share") == 0.0)
    val e = 8.0 / 7.0
    val chi2 = (math.pow(7 - e, 2) + math.pow(1 - e, 2) + 5 * e * e) / e
    assert(math.abs(r.getAs[Double]("chi2_uniform") - chi2) < 1e-3)
  }
}
