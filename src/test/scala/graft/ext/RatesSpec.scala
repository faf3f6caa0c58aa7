package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 39: q327 negative-binomial fit,
  * q328 rate ratio, q329 Cramér–von Mises.
  */
class RatesSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rt").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val day = 86400000L

  test("q327: daily counts (0,2,4) fit NB r=2 with zero prob 1/4; constants get NULL r") {
    import spark.implicits._
    import java.sql.Timestamp
    var id = 0L
    def evs(t: String, dd: Long, k: Int) = (1 to k).map { _ =>
      id += 1
      (id, new Timestamp(base + dd * day + id * 1000L), 1L, t, 1.0, "{}")
    }
    // A: (0,2,4) via zero-fill; B: (1,1,1)
    val ev = (evs("A", 1, 2) ++ evs("A", 2, 4) ++
      evs("B", 0, 1) ++ evs("B", 1, 1) ++ evs("B", 2, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q327_negbin_fit").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val a = rows("A")
    assert(math.abs(a.getAs[Double]("mean_daily") - 2.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("nb_r") - 2.0) < 1e-9)
    assert(math.abs(a.getAs[Double]("zero_nb") - 0.25) < 1e-6)
    assert(math.abs(a.getAs[Double]("zero_obs") - 1.0 / 3) < 1e-6)
    assert(rows("B").isNullAt(rows("B").fieldIndex("nb_r")))
  }

  test("q328: one event per user forces rate ratio 1 and z = 0 on any arm split") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = (1 to 20).map(u =>
      (u.toLong, new Timestamp(base + u * 1000L), u.toLong, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q328_rate_ratio").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("c0") + r.getAs[Long]("c1") == 20L)
    assert(r.getAs[Long]("u0") == r.getAs[Long]("c0"))
    assert(r.getAs[Long]("u1") == r.getAs[Long]("c1"))
    assert(math.abs(r.getAs[Double]("rate_ratio") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("wald_z")) < 1e-9)
  }

  test("q329: en {1,2} vs other {3,4} pin the CvM statistic at 0.375") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 2L),
      (3L, "t", "de", "a", 3L), (4L, "t", "de", "a", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q329_cramer_von_mises").run(spark, plantDir("documents" -> docs))
      .head()
    assert(r.getAs[Long]("n_en") == 2L)
    // (4/16) * (0.25 + 1 + 0.25 + 0) = 0.375
    assert(math.abs(r.getAs[Double]("cvm_stat") - 0.375) < 1e-6)
  }
}
