package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 55: q391 Brier decomposition, q392
  * source HHI, q393 forecast scorecard, q394 Youden's J.
  */
class Batch55Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b55").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  // orthogonal separable blobs: positives along (0,1), negatives along
  // (1,0) — the centroid classifier is perfect, margins are exactly ±1
  private lazy val blobDir: String = {
    import spark.implicits._
    val emb = ((0 until 8).map(i => (i.toLong, Array(0f, 10f), 9)) ++
      (8 until 16).map(i => (i.toLong, Array(10f, 0f), 0)))
      .toDF("vec_id", "embedding", "label")
    plantDir("embeddings" -> emb)
  }

  test("q391: a perfect half-half classifier has Brier~0, RES = UNC = 0.25") {
    val r = byName("q391_brier_decomposition").run(spark, blobDir).head()
    assert(r.getAs[Long]("n_points") == 16L)
    assert(r.getAs[Double]("brier") < 0.001)
    assert(r.getAs[Double]("reliability") < 0.001)
    assert(r.getAs[Double]("resolution") == 0.25)
    assert(r.getAs[Double]("uncertainty") == 0.25)
  }

  test("q394: perfect separation pins J = 1 at threshold 0.999") {
    val r = byName("q394_youden_j").run(spark, blobDir).head()
    assert(r.getAs[Double]("youden_j") == 1.0)
    assert(r.getAs[Double]("tpr") == 1.0)
    assert(r.getAs[Double]("fpr") == 0.0)
    assert(r.getAs[Double]("threshold") == 0.999)
  }

  test("q392: 3-vs-1 doc split pins HHI = 0.625, effective sources 1.6") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b", "en", "srcA", 3L), (2L, "c d", "en", "srcA", 3L),
      (3L, "e f", "en", "srcA", 3L), (4L, "g h", "en", "srcB", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q392_hhi_sources").run(spark, plantDir("documents" -> d)).head()
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Double]("hhi_docs") == 0.625)
    assert(r.getAs[Double]("eff_sources_docs") == 1.6)
    assert(r.getAs[Double]("hhi_tokens") == 0.625)
    assert(r.getAs[Double]("eff_sources_tokens") == 1.6)
  }

  test("q393: an exact period-7 series scores zero everywhere, U2 = 0") {
    import spark.implicits._
    val base = 1704067200000L
    val dayMs = 86400000L
    var id = 0L
    val week = Seq(10, 14, 12, 16, 11, 15, 13)
    val rows = (0 until 21).flatMap { day =>
      (1 to week(day % 7)).map { _ =>
        id += 1
        (id, new java.sql.Timestamp(base + day * dayMs), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q393_forecast_scorecard").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_scored") == 14L)
    assert(r.getAs[Double]("smape") == 0.0)
    assert(r.getAs[Double]("wape") == 0.0)
    assert(r.getAs[Double]("rmse_seasonal") == 0.0)
    assert(r.getAs[Double]("theil_u2") == 0.0)
  }
}
