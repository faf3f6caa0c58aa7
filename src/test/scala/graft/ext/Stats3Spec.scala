package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 27: q282 Yule's K, q283 HBOS, q284
  * Kruskal–Wallis, q285 Brown–Forsythe, q286 Kendall tau-b. Textbook
  * hand-derived expectations.
  */
class Stats3Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_s3").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q282: repeated vs uniform vocab pin Yule's K at 3750 and 0") {
    import spark.implicits._
    // a: counts (3,1): K = 1e4*(9+1-4)/16 = 3750; b: all singletons: K = 0
    val docs = Seq(
      (1L, "x x x y", "en", "a", 7L),
      (2L, "x y z w", "en", "b", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q282_yules_k").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("n_tokens") == 4L)
    assert(rows("a").getAs[Long]("vocab") == 2L)
    assert(math.abs(rows("a").getAs[Double]("yules_k") - 3750.0) < 1e-6)
    assert(math.abs(rows("b").getAs[Double]("yules_k") - 0.0) < 1e-6)
  }

  test("q283: the lone hour-1 event carries the top HBOS score") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L // midnight UTC -> hour buckets start at 0
    val ev = Seq(
      (1L, new Timestamp(base), 1L, "view", 0.0, "{}"),
      (2L, new Timestamp(base + 60000L), 1L, "view", 1.0, "{}"),
      (3L, new Timestamp(base + 120000L), 1L, "view", 2.0, "{}"),
      (4L, new Timestamp(base + 180000L), 1L, "view", 3.0, "{}"),
      (5L, new Timestamp(base + 3600000L), 1L, "view", 4.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q283_hbos").run(spark, plantDir("events" -> ev)).collect()
    assert(rows.length == 5)
    // every value bin is a singleton (p=1/5); hours: 4 at h0, 1 at h1
    val top = rows.head
    assert(top.getAs[Long]("event_id") == 5L)
    assert(top.getAs[Long]("hr") == 1L)
    assert(top.getAs[Long]("vbin") == 19L) // value==vmax clamps into the last bin
    val expTop = math.floor(2.0 * math.log(5.0) * 1e6 + 0.5) / 1e6
    assert(math.abs(top.getAs[Double]("hbos_score") - expTop) < 1e-9)
    val expRest = math.floor((math.log(5.0) + math.log(5.0 / 4.0)) * 1e6 + 0.5) / 1e6
    assert(rows.tail.map(_.getAs[Long]("event_id")).toSeq == Seq(1L, 2L, 3L, 4L))
    rows.tail.foreach(r =>
      assert(math.abs(r.getAs[Double]("hbos_score") - expRest) < 1e-9))
  }

  test("q284: the textbook 2x2 rank split gives H = 2.4, untouched by ties") {
    import spark.implicits._
    // a: lengths {1,2} (ranks 1,2), b: {3,4} (ranks 3,4):
    // H = 12/(4*5) * (2*1 + 2*1) = 2.4, no ties -> h_adj == h_stat
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 2L),
      (3L, "t", "en", "b", 3L), (4L, "t", "en", "b", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q284_kruskal_wallis").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 4L)
    assert(math.abs(r.getAs[Double]("h_stat") - 2.4) < 1e-4)
    assert(math.abs(r.getAs[Double]("h_adj") - 2.4) < 1e-4)
  }

  test("q285: hand-computed deviation sums pin the Brown-Forsythe W") {
    import spark.implicits._
    // a: {1,2,3} med 2, z=(1,0,1); b: {10,20,30,40} med 25, z=(15,5,5,15)
    // SSB = 3*(2/3-6)^2 + 4*(10-6)^2 = 149.3333; SSW = 2/3 + 100
    // W = (5/1) * SSB/SSW = 7.4172 (r4)
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 2L), (3L, "t", "en", "a", 3L),
      (4L, "t", "en", "b", 10L), (5L, "t", "en", "b", 20L),
      (6L, "t", "en", "b", 30L), (7L, "t", "en", "b", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q285_brown_forsythe").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_total") == 7L)
    assert(math.abs(r.getAs[Double]("w_stat") - 7.4172) < 1e-9)
  }

  test("q286: a tied daily spend drops one pair and shrinks the tau denominator") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L // a day boundary
    val day = 86400000L
    val ev = Seq(
      // d0: x=1, y=100; d1: x=2, y=300; d2: x=3, y=300
      (1L, new Timestamp(base), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(base + day), 1L, "view", 1.0, "{}"),
      (3L, new Timestamp(base + day + 1000L), 1L, "view", 2.0, "{}"),
      (4L, new Timestamp(base + 2 * day), 1L, "view", 1.0, "{}"),
      (5L, new Timestamp(base + 2 * day + 1000L), 1L, "view", 1.0, "{}"),
      (6L, new Timestamp(base + 2 * day + 2000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q286_kendall_tau").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("concordant") == 2L)
    assert(r.getAs[Long]("discordant") == 0L)
    // tau-b = (2-0)/sqrt((3-0)*(3-1)) = 2/sqrt(6) = 0.816497 (r6)
    assert(math.abs(r.getAs[Double]("tau_b") - 0.816497) < 1e-9)
  }
}
