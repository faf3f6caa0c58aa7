package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 57: q399 Jonckheere–Terpstra, q400
  * records test, q401 kNN label-noise audit, q402 hash uniformity.
  */
class Batch57Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b57").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def evAt(u: Long, ms: Long) = {
    id += 1; (id, new java.sql.Timestamp(ms), u, "view", 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def r4(x: Double) = math.floor(x * 10000 + 0.500001) / 10000

  test("q399: level-stepped weeks pin JT2 = 294 and the classical z") {
    // complete dy-div-7 weeks start at offset 3; weeks at levels
    // 10 < 20 < 30 make every cross-week pair concordant
    val rows = (3 until 24).flatMap { o =>
      val k = 10 * ((o - 3) / 7 + 1)
      (1 to k).map(i => evAt(i.toLong, base + o * dayMs))
    }
    val r = byName("q399_jonckheere")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_weeks") == 3L)
    assert(r.getAs[Long]("jt2") == 294L)
    val z = (294 / 2.0 - (441.0 - 147.0) / 4.0) /
      math.sqrt((441.0 * 45.0 - 147.0 * 17.0) / 72.0)
    assert(r.getAs[Double]("z_jt") == r4(z))
  }

  test("q400: a strictly increasing run is all records; z matches harmonic moments") {
    val rows = (0 until 10).flatMap { day =>
      (1 to 10 + day).map(i => evAt(i.toLong, base + day * dayMs))
    }
    val r = byName("q400_records_test")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_records") == 10L)
    val hq = (1 to 10).map(t => math.floor(1e12 / t + 0.5).toLong).sum
    val h2q = (1 to 10).map(t => math.floor(1e12 / (t.toLong * t) + 0.5).toLong).sum
    val z = (10.0 - hq / 1e12) / math.sqrt((hq - h2q) / 1e12)
    assert(r.getAs[Double]("z_records") == r4(z))
  }

  test("q401: a mislabeled point inside the wrong cluster is the lone suspect") {
    import spark.implicits._
    def at(theta: Double) = Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
    // cluster A: 12 points near angle 0 labeled 0, plus ONE label-7
    // interloper in their middle; cluster B: 12 points near 1.5 rad
    // labeled 7
    val emb = ((0 until 12).map(k => (k.toLong, at(k * 0.01), 0)) :+
      (12L, at(0.055), 7)) ++
      (13 until 25).map(k => (k.toLong, at(1.5 + (k - 13) * 0.01), 7))
    val r = byName("q401_knn_label_audit")
      .run(spark, plantDir("embeddings" -> emb.toDF("vec_id", "embedding", "label")))
      .collect().map(x => x.getAs[Int]("label") -> x).toMap
    assert(r(7).getAs[Long]("n_points") == 13L)
    assert(r(7).getAs[Long]("n_suspect") == 1L)
    assert(r(0).getAs[Double]("mean_agreement") >= 0.9)
    assert(r(0).getAs[Long]("n_suspect") == 0L)
  }

  test("q402: the engine's D matches a local md5 replication exactly") {
    def h60(sv: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val users = (1L to 200L)
    val rows = users.map(u => evAt(u, base))
    val r = byName("q402_hash_uniformity")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_users") == 200L)
    // local replication of the 1024-bucket sup
    val gs = users.map(u => h60(s"ab|$u") / 1125899906842624L)
    val hist = gs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val devByG = { var c = 0L
      hist.keys.toSeq.sorted.map { g => c += hist(g)
        (g, math.abs(1024 * c - (g + 1) * 200)) }.toMap }
    val maxDev = devByG.values.max
    val argmax = devByG.filter(_._2 == maxDev).keys.min
    assert(r.getAs[Long]("argmax_bucket") == argmax)
    val d = math.floor(maxDev.toDouble / (200.0 * 1024.0) * 1e6 + 0.500001) / 1e6
    assert(r.getAs[Double]("d_stat") == d)
  }
}
