package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 35: q314 Fleiss' kappa, q315
  * Anderson–Darling, q316 energy distance.
  */
class AgreeSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ag").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  private def counts(perTypeDaily: Map[String, Seq[Int]]) = {
    var id = 0L
    perTypeDaily.toSeq.flatMap { case (t, daily) =>
      daily.zipWithIndex.flatMap { case (c, dd) =>
        (1 to c).map { _ =>
          id += 1
          (id, new java.sql.Timestamp(base + dd * day + id * 1000L), 1L, t, 1.0, "{}")
        }
      }
    }
  }

  test("q314: two raters with identical tercile patterns agree at kappa = 1") {
    import spark.implicits._
    val ev = counts(Map(
      "t1" -> Seq(1, 1, 2, 2, 3, 3),
      "t2" -> Seq(1, 1, 2, 2, 3, 3)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q314_fleiss_kappa").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[Long]("n_raters") == 2L)
    assert(math.abs(r.getAs[Double]("fleiss_kappa") - 1.0) < 1e-4)
    // rotated tercile pattern: raters never share a category
    val ev2 = counts(Map(
      "t1" -> Seq(1, 1, 2, 2, 3, 3),
      "t2" -> Seq(3, 3, 1, 1, 2, 2)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = byName("q314_fleiss_kappa").run(spark, plantDir("events" -> ev2)).head()
    assert(r2.getAs[Double]("fleiss_kappa") < -0.4) // full disagreement
  }

  test("q315: two hand-placed gaps reproduce the quantized AD statistic exactly") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(
      (1L, new Timestamp(base), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(base + 30000L), 1L, "view", 1.0, "{}"),
      (3L, new Timestamp(base + 120000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q315_anderson_darling").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_gaps") == 2L)
    // buckets: x=0.5 (a=0,t=1), x=1.5 (a=1,t=1); lambda = 2/2 = 1
    def q9(v: Double) = math.floor(v * 1e9 + 0.5)
    val st = 1 * q9(math.log(1 - math.exp(-0.5))) + 3 * q9(-0.5) +
      3 * q9(math.log(1 - math.exp(-1.5))) + 1 * q9(-1.5)
    val exp = math.floor((-2.0 - st / 1e9 / 2.0) * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Double]("ad_stat") == exp)
  }

  test("q316: en {1,3} vs other {2,4} pin E_xy = 1.5 and D^2 = 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 3L),
      (3L, "t", "de", "a", 2L), (4L, "t", "de", "a", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q316_energy_distance").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_en") == 2L)
    assert(r.getAs[Long]("n_other") == 2L)
    assert(math.abs(r.getAs[Double]("e_xy") - 1.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("energy_d2") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("energy_stat") - 1.0) < 1e-9)
  }
}
