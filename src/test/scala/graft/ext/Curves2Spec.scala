package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 30: q295 gains/lift, q296 isotonic
  * PAV, q297 Hedges' g, q298 partial correlation.
  */
class Curves2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_c2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q295: top-5-of-10 positives give lift 2 above the median, decaying after") {
    import spark.implicits._
    // scores 10..1; en on 10..6 -> decile k threshold 11-k,
    // gain = min(k,5)/5, lift = 2 for k<=5 then 10/k
    val docs = (1 to 10).map(v =>
      (v.toLong, "t", if (v >= 6) "en" else "de", "a", v.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q295_gains_curve").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.size == 10)
    (1 to 10).foreach { k =>
      val r = rows(k.toLong)
      assert(r.getAs[Long]("threshold") == 11L - k)
      assert(r.getAs[Long]("n_captured") == k.toLong)
      val expGain = math.min(k, 5).toDouble / 5
      assert(math.abs(r.getAs[Double]("gain") - expGain) < 1e-4)
      val expLift = if (k <= 5) 2.0 else 10.0 / k
      assert(math.abs(r.getAs[Double]("lift") - expLift) < 1e-4)
    }
  }

  test("q296: PAV pools the 0.5, 0.0 violation into a flat 0.25 then jumps to 1") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    def ev(id: Long, v: Double, t: String) =
      (id, new Timestamp(base + id * 1000L), 1L, t, v, "{}")
    // v=0: rate 1/2; v=1: rate 0/2; v=2: rate 2/2 -> iso (0.25, 0.25, 1.0)
    val rows = Seq(
      ev(1, 0.0, "purchase"), ev(2, 0.0, "view"),
      ev(3, 1.0, "view"), ev(4, 1.0, "view"),
      ev(5, 2.0, "purchase"), ev(6, 2.0, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q296_isotonic_calibration").run(spark, plantDir("events" -> rows))
      .collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 10L, 19L))
    val iso = out.map(_.getAs[Double]("iso_rate"))
    assert(math.abs(iso(0) - 0.25) < 1e-6)
    assert(math.abs(iso(1) - 0.25) < 1e-6)
    assert(math.abs(iso(2) - 1.0) < 1e-6)
    // isotonic: never decreasing
    assert(iso.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
  }

  test("q297: en {2,4} vs other {6,10} pin d = -2.2361 and g = d*4/7") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t", "en", "a", 2L), (2L, "t", "en", "a", 4L),
      (3L, "t", "de", "a", 6L), (4L, "t", "de", "a", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q297_hedges_g").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_en") == 2L)
    assert(r.getAs[Long]("n_other") == 2L)
    // d = (3-8)/sqrt(5) = -2.23607; J = 1 - 3/7
    assert(math.abs(r.getAs[Double]("cohens_d") - -2.2361) < 1e-9)
    assert(math.abs(r.getAs[Double]("hedges_g") - -1.2778) < 1e-9)
  }

  test("q298: spend tracking volume with orthogonal users gives partial r = 1") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    val day = 86400000L
    def ev(id: Long, dd: Long, u: Long, v: Double) =
      (id, new Timestamp(base + dd * day + id * 1000L), u, "view", v, "{}")
    // x=(1,2,3), y=(100,300,500) cents, z=(1,2,1): rxy=1, rxz=ryz=0
    val rows = Seq(
      ev(1, 0, 1, 1.0),
      ev(2, 1, 1, 1.0), ev(3, 1, 2, 2.0),
      ev(4, 2, 1, 2.0), ev(5, 2, 1, 2.0), ev(6, 2, 1, 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q298_partial_correlation").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_days") == 3L)
    assert(math.abs(r.getAs[Double]("r_xy") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("r_xz")) < 1e-6)
    assert(math.abs(r.getAs[Double]("r_yz")) < 1e-6)
    assert(math.abs(r.getAs[Double]("r_xy_given_z") - 1.0) < 1e-6)
  }
}
