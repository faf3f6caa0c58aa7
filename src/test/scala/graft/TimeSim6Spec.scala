package graft

import org.apache.spark.sql.functions._

/** Property pins for the Hurst (q241), MMR (q242) and ANOVA (q243)
  * batch. */
class TimeSim6Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts6").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  /** One event per hour for 256 hours with the given value series. */
  private def hourlyEvents(et: String, vals: Seq[Double]) = {
    import spark.implicits._
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 3600000L),
        1L, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q241: a linear trend scores H near 1; an alternating series near 0") {
    val trend = hourlyEvents("trend", (0 until 256).map(_.toDouble))
    val alt = hourlyEvents("alt", (0 until 256).map(i => if (i % 2 == 0) 10.0 else 20.0))
    val out = byName("q241_hurst_rs")
      .run(spark, plantDir("events" ->
        trend.unionByName(alt)))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("hurst")).toMap
    assert(out("trend") > 0.9, s"linear trend must be persistent: $out")
    assert(out("alt") < 0.15, s"alternating series must be anti-persistent: $out")
    // R/S must grow with block size for the trending series
    val row = byName("q241_hurst_rs")
      .run(spark, plantDir("events" -> trend)).collect().head
    assert(row.getAs[Double]("rs64") > row.getAs[Double]("rs8"))
  }

  test("q242: a redundant near-copy of the top hit loses to a diverse pick") {
    import spark.implicits._
    // probe = e0. c1 (id 10) and c2 (id 11) are near-copies of each
    // other at rel 0.8; d (id 20) is less relevant (0.7) but far from
    // c1 (sim 0.56). Pure relevance ranks c1, c2, d; MMR round 2:
    // mmr(c2) = .7*.8 - .3*.999 = 0.26 < mmr(d) = .7*.7 - .3*.56 = 0.32,
    // so the order must be c1, d, c2. With only 3 candidates the pool
    // exhausts at rank 3 — rounds 4-10 must add nothing (edge pin).
    def vec(xs: (Int, Float)*) = {
      val a = Array.fill(64)(0.0f); xs.foreach { case (i, x) => a(i) = x }; a
    }
    val rows = Seq(
      (1L, vec(0 -> 1.0f), 0),
      (10L, vec(0 -> 0.8f, 1 -> 0.6f), 0),
      (11L, vec(0 -> 0.8f, 1 -> 0.6f, 2 -> 0.03f), 0),
      (20L, vec(0 -> 0.7f, 2 -> 0.714f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = byName("q242_mmr_selection").run(spark, plantDir("embeddings" -> rows))
      .collect().map(r => r.getAs[Int]("rank") ->
        (r.getAs[Long]("vec_id"), r.getAs[Double]("rel"),
          r.getAs[Double]("max_sim"))).toMap
    assert(out.keySet == Set(1, 2, 3), s"pool exhausts at 3: $out")
    assert(out(1)._1 == 10L && out(1)._3 == 0.0, s"got $out")
    assert(out(2)._1 == 20L,
      s"rank 2 must be the diverse candidate, not the near-copy: $out")
    assert(out(3)._1 == 11L)
    assert(math.abs(out(1)._2 - 0.8) < 1e-3 && math.abs(out(2)._2 - 0.7) < 1e-3)
    assert(out(3)._3 > 0.99, s"the near-copy's redundancy must be visible: $out")
  }

  test("q243: separated groups score a large F; identical groups score F=0") {
    import spark.implicits._
    // 315 = 15*21 ids: i%21 is perfectly uniform, so the (i%7) noise
    // term is identically distributed across the three i%3 groups
    def docs(shift: Long) = (1L to 315L).map { i =>
      val src = s"s${i % 3}"
      val len = 100 + (i % 7) + (if (i % 3 == 0) shift else 0L)
      (i, "x", "en", src, len)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val sep = byName("q243_anova_f").run(spark, plantDir("documents" -> docs(50)))
      .collect().head
    assert(sep.getAs[Long]("n_docs") == 315 && sep.getAs[Long]("n_sources") == 3)
    assert(sep.getAs[Double]("f_stat") > 100.0, s"got $sep")
    assert(sep.getAs[Double]("eta_sq") > 0.5)
    val same = byName("q243_anova_f").run(spark, plantDir("documents" -> docs(0)))
      .collect().head
    // identical length DISTRIBUTIONS across groups: between-group sums
    // vanish up to the micro quantizer
    assert(same.getAs[Double]("f_stat") < 0.1, s"got $same")
  }
}
