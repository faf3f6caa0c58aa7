package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 52: q367 hyperplane MMD, q368 Pettitt,
  * q369 Simpson audit, q370 block bootstrap.
  */
class Batch49Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b49").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def vec(assign: (Int, Float)*): Array[Float] = {
    val v = new Array[Float](64)
    assign.foreach { case (i, x) => v(i) = x }
    v
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def ev(dd: Long, t: String, v: Double = 1.0) = {
    id += 1; (id, new java.sql.Timestamp(base + dd * dayMs + 1000L), 1L, t, v, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q367: identical halves read MMD 0; opposite rays read MMD 4") {
    import spark.implicits._
    val same = (0 until 3).flatMap(i => Seq(
      (i.toLong, vec(0 -> 1f, i + 1 -> 2f), 0),
      (100L + i, vec(0 -> 1f, i + 1 -> 2f), 7)))
      .toDF("vec_id", "embedding", "label")
    val r1 = byName("q367_mmd_hyperplane")
      .run(spark, plantDir("embeddings" -> same)).head()
    assert(r1.getAs[Long]("n_a") == 3L && r1.getAs[Long]("n_b") == 3L)
    assert(r1.getAs[Double]("mmd2") == 0.0)

    val rays = ((0 until 4).map(i => (i.toLong, vec(0 -> 1f), 0)) ++
      (0 until 4).map(i => (100L + i, vec(0 -> -1f), 7)))
      .toDF("vec_id", "embedding", "label")
    val r2 = byName("q367_mmd_hyperplane")
      .run(spark, plantDir("embeddings" -> rays)).head()
    assert(r2.getAs[Double]("mmd2") == 4.0)
  }

  test("q368: a clean step at day 10 of 20 pins K=100 and the argmax day") {
    val rows = (0L until 10L).flatMap(d => (1 to 2).map(_ => ev(d, "view"))) ++
      (10L until 20L).flatMap(d => (1 to 10).map(_ => ev(d, "view")))
    val r = byName("q368_pettitt").run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("k_stat") == 100L)
    assert(r.getAs[Long]("cp_day") == base / dayMs + 9L)
    val p = 2.0 * math.exp(-6.0 * 100.0 * 100.0 / (8000.0 + 400.0))
    assert(math.abs(r.getAs[Double]("p_approx") - p) < 1e-5)
  }

  test("q369: a planted anticorrelated stratum flags against a positive pool") {
    // wdA: (x,y) = (2,10),(3,5) -> corr -1; wdB: (2,6),(3,12) -> corr +1
    val rows = Seq(
      ev(0, "purchase", 10.0), ev(0, "view"),
      ev(7, "purchase", 5.0), ev(7, "view"), ev(7, "view"),
      ev(1, "purchase", 6.0), ev(1, "view"),
      ev(8, "purchase", 12.0), ev(8, "view"), ev(8, "view"))
    val out = byName("q369_simpson_audit")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
    assert(out.length == 2)
    val wdA = ((base / dayMs) % 7).toInt
    val m = out.map(r => r.getAs[Long]("weekday") -> r).toMap
    val a = m(wdA.toLong)
    assert(a.getAs[Double]("corr_stratum") == -1.0)
    assert(a.getAs[Double]("corr_pooled") > 0.0)
    assert(a.getAs[Boolean]("sign_flip"))
    val b = m(((base / dayMs + 1) % 7))
    assert(b.getAs[Double]("corr_stratum") == 1.0)
    assert(!b.getAs[Boolean]("sign_flip"))
  }

  test("q370: a 21-day ramp pins the iid SE; block SE is same-order positive") {
    val rows = (0L until 21L).flatMap(d => (0L to d).map(_ => ev(d, "view")))
    val r = byName("q370_block_bootstrap")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days") == 21L)
    assert(r.getAs[Double]("mean_daily") == 11.0)
    val seIid = math.sqrt(770.0 / 20 / 21)
    assert(math.abs(r.getAs[Double]("se_iid") - seIid) < 1e-5)
    val seBlock = r.getAs[Double]("se_block")
    assert(seBlock > 0.3 * seIid && seBlock < 3 * seIid)
    assert(math.abs(r.getAs[Double]("se_ratio") - seBlock / seIid) < 1e-3)
  }
}
