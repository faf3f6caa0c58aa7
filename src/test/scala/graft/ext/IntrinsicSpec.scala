package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 45: q345 TwoNN intrinsic dimension,
  * q346 participation inequality.
  */
class IntrinsicSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_in").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q345: a unit-circle arc reads as low-dimensional; exact duplicates drop out") {
    import spark.implicits._
    def onCircle(k: Int) = Array(math.cos(k * 0.1).toFloat, math.sin(k * 0.1).toFloat)
    val emb = (0 until 10).map(k => (k.toLong, onCircle(k), 0))
      .toDF("vec_id", "embedding", "label")
    val r = byName("q345_twonn_id").run(spark, plantDir("embeddings" -> emb)).head()
    assert(r.getAs[Long]("n_points") == 10L)
    // interior points have TWO equidistant neighbors (mu = 1, ln 0);
    // only the two arc endpoints contribute ln(d(0.2)/d(0.1)) ~ ln 4,
    // so ID ~ 10 / (2 ln 4) ~ 3.6
    val id = r.getAs[Double]("twonn_id")
    assert(id > 3.0 && id < 4.2)
    // add an exact duplicate of vec 0: both copies have d1 = 0 -> excluded
    val emb2 = ((0 until 10).map(k => (k.toLong, onCircle(k), 0)) :+
      (10L, onCircle(0), 0)).toDF("vec_id", "embedding", "label")
    val r2 = byName("q345_twonn_id").run(spark, plantDir("embeddings" -> emb2)).head()
    assert(r2.getAs[Long]("n_points") == 9L)
  }

  test("q346: one whale and one dolphin out of 20 users pin the 1%/10% shares") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    var id = 0L
    def evs(u: Long, k: Int) = (1 to k).map { _ =>
      id += 1
      (id, new Timestamp(base + id * 1000L), u, "view", 1.0, "{}")
    }
    val ev = (evs(1L, 100) ++ evs(2L, 50) ++
      (3 to 20).flatMap(u => evs(u.toLong, 1)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q346_participation").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_users") == 20L)
    assert(r.getAs[Long]("n_events") == 168L)
    assert(r.getAs[Long]("n_top1pct") == 1L)
    assert(math.abs(r.getAs[Double]("share_top1pct") - 100.0 / 168) < 1e-4)
    assert(r.getAs[Long]("n_top10pct") == 2L)
    assert(math.abs(r.getAs[Double]("share_top10pct") - 150.0 / 168) < 1e-4)
  }
}
