package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 46: q347 hubness, q348 Davies–Bouldin,
  * q349 anisotropy.
  */
class EmbedQualitySpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_eq").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q347: an isolated far point is the lone antihub; no mega-hubs in a 16-point cloud") {
    import spark.implicits._
    // 15 points on a tight unit-circle arc + 1 isolated point at 3 rad:
    // every 10-NN list stays inside the cluster, so the far point has
    // k-occurrence 0 (the antihub) and nobody reaches the 2k hub bar.
    def at(theta: Double) = Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
    val emb = ((0 until 15).map(k => (k.toLong, at(k * 0.01), 0)) :+
      (15L, at(3.0), 0)).toDF("vec_id", "embedding", "label")
    val r = byName("q347_hubness").run(spark, plantDir("embeddings" -> emb)).head()
    assert(r.getAs[Long]("n_points") == 16L)
    assert(math.abs(r.getAs[Double]("antihub_share") - 1.0 / 16) < 1e-4)
    assert(r.getAs[Double]("hub_share") == 0.0)
    // arc interior points are in nearly every list; far point in none
    assert(r.getAs[Long]("max_occ") >= 11L)
    assert(!r.getAs[Double]("skew_kocc").isNaN)
  }

  test("q348: two tight separated label pairs pin S=0.1, DB=0.05 exactly") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(0.2f, 0.0f), 0),
      (2L, Array(4.0f, 0.0f), 1), (3L, Array(4.2f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val rows = byName("q348_davies_bouldin").run(spark, plantDir("embeddings" -> emb))
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") == 2L)
      assert(math.abs(r.getAs[Double]("s_intra") - 0.1) < 1e-4)
      assert(math.abs(r.getAs[Double]("db_term") - 0.05) < 1e-4)
      assert(math.abs(r.getAs[Double]("db_index") - 0.05) < 1e-4)
    }
  }

  test("q349: identical directions read cos=1; half-orthogonal mix reads 1/3") {
    import spark.implicits._
    val same = (0 until 4).map(k => (k.toLong, Array(2.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label") // non-unit input: normalization is the query's job
    val r1 = byName("q349_anisotropy").run(spark, plantDir("embeddings" -> same)).head()
    assert(r1.getAs[Long]("n_vectors") == 4L)
    assert(math.abs(r1.getAs[Double]("mean_pairwise_cos") - 1.0) < 1e-6)

    val mix = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0), (3L, Array(0.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r2 = byName("q349_anisotropy").run(spark, plantDir("embeddings" -> mix)).head()
    // 4 of 12 ordered pairs have cos 1, 8 have cos 0 -> 1/3
    assert(math.abs(r2.getAs[Double]("mean_pairwise_cos") - 1.0 / 3) < 1e-6)
  }
}
