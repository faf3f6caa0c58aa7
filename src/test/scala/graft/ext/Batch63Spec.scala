package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 63: q423 EB shrinkage, q424 gains
  * table, q425 average precision, q426 Spiegelhalter Z.
  */
class Batch63Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b63").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private lazy val blobDir: String = {
    import spark.implicits._
    val emb = ((0 until 8).map(i => (i.toLong, Array(0f, 10f), 9)) ++
      (8 until 16).map(i => (i.toLong, Array(10f, 0f), 0)))
      .toDF("vec_id", "embedding", "label")
    plantDir("embeddings" -> emb)
  }

  test("q423: a 5x0.25 / 5x0.75 rate split pins alpha = beta = 1.3") {
    import spark.implicits._
    val base = 1704067200000L
    val dayMs = 86400000L
    var id = 0L
    // 10 users, 4 exposure days each; users 1-5 purchase on 1 day,
    // users 6-10 on 3 days -> rates {0.25, 0.75}, mu=0.5, ab=2.6
    val rows = (1L to 10L).flatMap { u =>
      (0 until 4).map { day =>
        val purchases = if (u <= 5) 1 else 3
        id += 1
        (id, new java.sql.Timestamp(base + day * dayMs), u,
          if (day < purchases) "purchase" else "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q423_eb_shrinkage").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_users") == 10L)
    assert(r.getAs[Double]("mean_rate") == 0.5)
    assert(math.abs(r.getAs[Double]("var_rate") - 0.069444) < 1e-9)
    assert(r.getAs[Double]("alpha") == 1.3)
    assert(r.getAs[Double]("beta") == 1.3)
    // |2.3/6.6 - 0.25| = 0.098485
    assert(math.abs(r.getAs[Double]("mean_abs_shrinkage") - 0.098485) < 1e-6)
  }

  test("q424: the perfect classifier fills decile 5 with every positive at lift 2") {
    val rows = byName("q424_gains_table").run(spark, blobDir).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.keySet == Set(5L, 10L))
    assert(rows(5L).getAs[Long]("n_pos") == 8L)
    assert(rows(5L).getAs[Double]("cum_capture") == 1.0)
    assert(rows(5L).getAs[Double]("cum_lift") == 2.0)
    assert(rows(10L).getAs[Long]("n_pos") == 0L)
    assert(rows(10L).getAs[Double]("cum_lift") == 1.0)
  }

  test("q425: perfect separation pins average precision 1.0") {
    val r = byName("q425_average_precision").run(spark, blobDir).head()
    assert(r.getAs[Long]("n_pos") == 8L)
    assert(r.getAs[Double]("base_rate") == 0.5)
    assert(r.getAs[Double]("avg_precision") == 1.0)
  }

  test("q426: the near-perfect classifier is nearly calibrated (|Z| small)") {
    val r = byName("q426_spiegelhalter_z").run(spark, blobDir).head()
    assert(r.getAs[Long]("n_points") == 16L)
    val z = r.getAs[Double]("z_calibration")
    assert(math.abs(z) < 0.2, s"Z = $z")
  }
}
