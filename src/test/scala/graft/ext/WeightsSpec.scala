package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 33: q307 ESS, q308 burstiness,
  * q309 Dickey–Fuller.
  */
class WeightsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_wt").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q307: uniform weights give ESS = n; a 1:3 split gives ESS = 1.6") {
    import spark.implicits._
    val docs = ((1 to 4).map(i => (i.toLong, "t", "en", "a", 1L)) ++
      Seq((5L, "t", "en", "b", 1L), (6L, "t", "en", "b", 3L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q307_ess").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(math.abs(rows("a").getAs[Double]("ess") - 4.0) < 1e-9)
    assert(math.abs(rows("a").getAs[Double]("ess_ratio") - 1.0) < 1e-9)
    assert(math.abs(rows("b").getAs[Double]("ess") - 1.6) < 1e-9)
    assert(math.abs(rows("b").getAs[Double]("ess_ratio") - 0.8) < 1e-9)
  }

  test("q308: 'x x y' + 'x z' pin x's adaptation at 1/2 and the tie order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y", "en", "a", 5L), (2L, "x z", "en", "a", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q308_token_burstiness").run(spark, plantDir("documents" -> docs))
      .collect()
    assert(rows.map(_.getAs[String]("token")).toSeq == Seq("x", "y", "z"))
    val x = rows.head
    assert(x.getAs[Long]("total") == 3L && x.getAs[Long]("df1") == 2L &&
      x.getAs[Long]("df2") == 1L)
    assert(math.abs(x.getAs[Double]("adaptation") - 0.5) < 1e-9)
    assert(math.abs(x.getAs[Double]("mean_k_given_present") - 1.5) < 1e-9)
    assert(rows(1).getAs[Double]("adaptation") == 0.0)
  }

  test("q309: the oscillating series (10,20,12,18,12) pins beta = -63/34") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    val day = 86400000L
    var id = 0L
    val rows = Seq(10, 20, 12, 18, 12).zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q309_dickey_fuller").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_diffs") == 4L)
    val beta = -63.0 / 34
    // replicate the engine's closed form: sxy=-126, sxx=68, syy=235
    val rss = 235.0 - beta * -126.0
    val t = beta / math.sqrt((rss / 2.0) / 68.0)
    def r6(v: Double) = math.floor(v * 1e6 + 0.500001) / 1e6
    def r4(v: Double) = math.floor(v * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Double]("beta") == r6(beta))
    assert(r.getAs[Double]("df_tstat") == r4(t))
    // beta < -1: strong oscillation has no defined AR(1) half-life
    assert(r.isNullAt(r.fieldIndex("half_life_days")))
  }
}
