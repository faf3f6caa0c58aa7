package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 54: q375 skyline, q376 retention
  * half-life, q377 gap burstiness, q378 seasonal Mann–Kendall.
  */
class Batch51Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b51").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String = "view") = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q375: hand cells pin the three-step Pareto staircase") {
    import spark.implicits._
    def doc(i: Long, text: String, len: Long) = (i, text, "en", "x", len)
    val d = Seq(
      doc(1, "a b c", 10),               // ttr 1.0  -> front
      doc(2, "a a", 20),                 // ttr 0.5  -> front (longest)
      doc(3, "a a b b a", 5),            // ttr 0.4  -> dominated by (10,1.0)
      doc(4, "a b c a a a a a a a", 20), // ttr 0.3  -> same-len dominated
      doc(5, "a a", 15),                 // ttr 0.5  -> dominated by (20,0.5)
      doc(6, "a b c d a", 15))           // ttr 0.8  -> front
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q375_skyline").run(spark, plantDir("documents" -> d)).collect()
    assert(rows.map(r => (r.getAs[Long]("len"), r.getAs[Long]("ttr"))).toSeq ==
      Seq((10L, 1000000L), (15L, 800000L), (20L, 500000L)))
    assert(rows.forall(_.getAs[Long]("n_docs") == 1L))
  }

  test("q376: a halving retention curve pins half-life 1 week") {
    val wkMs = 604800000L
    val rows =
      (1L to 8L).map(u => evAt(u, base)) ++
        (1L to 4L).map(u => evAt(u, base + wkMs)) ++
        (1L to 2L).map(u => evAt(u, base + 2 * wkMs)) ++
        Seq(evAt(1L, base + 3 * wkMs))
    val r = byName("q376_retention_halflife")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_offsets") == 4L)
    assert(math.abs(r.getAs[Double]("decay_slope") + math.log(2)) < 1e-5)
    assert(r.getAs[Double]("halflife_weeks") == 1.0)
  }

  test("q377: regular gaps read B=-1; a 10/30 mix pins B=-1/3") {
    val rows = Seq(
      evAt(1, base, "A"), evAt(1, base + 10000L, "A"), evAt(1, base + 20000L, "A"),
      evAt(1, base, "B"), evAt(1, base + 10000L, "B"), evAt(1, base + 40000L, "B"))
    val out = byName("q377_gap_burstiness")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
    val m = out.map(r => r.getAs[String]("event_type") -> r).toMap
    assert(m("A").getAs[Double]("burstiness") == -1.0)
    assert(m("A").getAs[Double]("cv") == 0.0)
    assert(m("B").getAs[Double]("mean_gap_s") == 20.0)
    assert(m("B").getAs[Double]("cv") == 0.5)
    assert(m("B").getAs[Double]("burstiness") == -0.3333)
  }

  test("q378: a monotone month pins S=42, Var18=1092, increasing") {
    val rows = (0L until 28L).flatMap(d => (0L to d).map(_ => evAt(1, base + d * dayMs)))
    val r = byName("q378_mk_seasonal")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days") == 28L)
    assert(r.getAs[Long]("s_stat") == 42L)
    assert(r.getAs[Long]("var18") == 1092L)
    val z = math.floor(41.0 / math.sqrt(1092.0 / 18.0) * 10000 + 0.500001) / 10000
    assert(r.getAs[Double]("z") == z)
    assert(r.getAs[String]("trend") == "increasing")
  }
}
