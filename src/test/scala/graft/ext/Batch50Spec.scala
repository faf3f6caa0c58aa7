package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 53: q371 seasonal MASE, q372 Hoover,
  * q373 negative sampling, q374 Atkinson.
  */
class Batch50Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b50").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def ev(u: Long, dd: Long) = {
    id += 1; (id, new java.sql.Timestamp(base + dd * dayMs + 1000L), u, "view", 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q371: a ramp pins MAE 1 vs 7 and MASE 1/7") {
    val rows = (0L until 14L).flatMap(d => (0L to d).map(_ => ev(1, d)))
    val r = byName("q371_seasonal_mase")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_scored") == 7L)
    assert(r.getAs[Double]("mae_persistence") == 1.0)
    assert(r.getAs[Double]("mae_seasonal") == 7.0)
    assert(r.getAs[Double]("mase") == 0.1429)
  }

  test("q372: (1,1,1,5) users pin Hoover 0.375") {
    val rows = Seq(ev(1, 0), ev(2, 0), ev(3, 0)) ++ (1 to 5).map(_ => ev(4, 0))
    val r = byName("q372_hoover")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_users") == 4L && r.getAs[Long]("n_events") == 8L)
    assert(r.getAs[Double]("hoover") == 0.375)
    assert(r.getAs[Double]("share_above_mean") == 0.25)
  }

  test("q374: (1,4) users pin Atkinson 0.1 / 0.2") {
    val rows = Seq(ev(1, 0)) ++ (1 to 4).map(_ => ev(2, 0))
    val r = byName("q374_atkinson")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Double]("atkinson_half") == 0.1)
    assert(r.getAs[Double]("atkinson_one") == 0.2)
    assert(r.getAs[Double]("ede_half_ratio") == 0.9)
  }

  test("q373: smoothing boosts the rare token and shaves the common one") {
    import spark.implicits._
    val d = Seq((1L, "a a a a b b c", "en", "x", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q373_negative_sampling")
      .run(spark, plantDir("documents" -> d)).collect()
    assert(rows.length == 3)
    val m = rows.map(r => r.getAs[String]("token") -> r).toMap
    assert(rows.head.getAs[String]("token") == "a")
    val z = math.floor(math.exp(0.75 * math.log(4)) * 1e6 + 0.5) +
      math.floor(math.exp(0.75 * math.log(2)) * 1e6 + 0.5) + 1e6
    val pa = math.floor(math.exp(0.75 * math.log(4)) * 1e6 + 0.5) / z
    assert(math.abs(m("a").getAs[Double]("p_neg") - pa) < 1e-5)
    assert(m("a").getAs[Double]("boost") < 1.0)
    assert(m("c").getAs[Double]("boost") > 1.0)
    assert(m("a").getAs[Long]("n_vocab") == 3L)
  }
}
