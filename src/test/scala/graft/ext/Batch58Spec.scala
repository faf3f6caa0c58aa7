package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 58: q403 Markov stationary
  * distribution, q404 Gries DP dispersion, q405 Dunning G² keyness,
  * q406 Nelson–Aalen hazard.
  */
class Batch58Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b58").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String) = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def r4(x: Double) = math.floor(x * 10000 + 0.500001) / 10000

  test("q403: a deterministic 2-cycle has pi = (1/2, 1/2) and zero entropy rate") {
    val rows = (0 until 7).map(i =>
      evAt(1L, base + i * 1000, if (i % 2 == 0) "a" else "b"))
    val out = byName("q403_markov_stationary")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.keySet == Set("a", "b"))
    assert(out("a").getAs[Double]("pi") == 0.5)
    assert(out("b").getAs[Double]("pi") == 0.5)
    assert(out("a").getAs[Double]("h_row") == 0.0)
    assert(out("a").getAs[Double]("h_contrib") == 0.0)
  }

  test("q404: a source-exclusive token pins DP = 0.5 against equal-size parts") {
    import spark.implicits._
    val d = Seq(
      (1L, "x x x y", "en", "srcA", 7L),
      (2L, "y y y y", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q404_token_dispersion").run(spark, plantDir("documents" -> d))
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    // x lives only in srcA (half the corpus): DP = (|1-.5|+|0-.5|)/2
    assert(rows("x").getAs[Double]("dp") == 0.5)
    // y: 1/5 vs 4/5 across equal halves: DP = (0.3+0.3)/2
    assert(rows("y").getAs[Double]("dp") == 0.3)
    assert(rows("y").getAs[Long]("cnt") == 5L)
  }

  test("q405: the exclusive token is srcA's top keyword with G2 = 6 ln 2 * ...") {
    import spark.implicits._
    val d = Seq(
      (1L, "k k k c c", "en", "srcA", 9L),
      (2L, "c c c c c", "en", "srcB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q405_keyness_g2").run(spark, plantDir("documents" -> d)).collect()
    val a1 = rows.filter(_.getAs[String]("source") == "srcA").head
    assert(a1.getAs[String]("keyword") == "k")
    assert(a1.getAs[Long]("cnt_out") == 0L)
    // b = 0 side contributes exactly 0: G2 = 2 * 3 * ln(3/1.5)
    val g2k = 2.0 * math.floor(3 * math.log(2.0) * 1e9 + 0.5) / 1e9
    assert(a1.getAs[Double]("g2") == r4(g2k))
    val b1 = rows.filter(_.getAs[String]("source") == "srcB").head
    assert(b1.getAs[String]("keyword") == "c")
    val t1 = math.floor(5 * math.log(5.0 / 3.5) * 1e9 + 0.5)
    val t2 = math.floor(2 * math.log(2.0 / 3.5) * 1e9 + 0.5)
    assert(b1.getAs[Double]("g2") == r4(2.0 * (t1 + t2) / 1e9))
  }

  test("q406: 2 observed + 1 censored pin H = 1/3 then 5/6 and exp(-H) survival") {
    val rows = Seq(
      evAt(1L, base, "view"), evAt(1L, base + 60000L, "view"),
      evAt(2L, base, "view"), evAt(2L, base + 120000L, "view"),
      evAt(3L, base, "view"))
    val out = byName("q406_nelson_aalen")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("dur_min") == 1L)
    assert(out(0).getAs[Long]("n_risk") == 3L)
    assert(out(0).getAs[Double]("cum_hazard") == 0.333333)
    assert(out(0).getAs[Double]("surv_fh") == 0.716531)
    assert(out(1).getAs[Long]("n_risk") == 2L)
    assert(out(1).getAs[Double]("cum_hazard") == 0.833333)
    assert(out(1).getAs[Double]("surv_fh") == 0.434598)
  }
}
