package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 59: q407 Little's-law concurrency,
  * q408 norm profile, q409 time-to-convert, q410 per-source dup rate.
  */
class Batch59Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b59").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String = "view") = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q407: a 2h session over a 3h span pins L = 2/3 = lambda*W, peak 2") {
    val hour = 3600000L
    val rows = Seq(
      evAt(1L, base), evAt(1L, base + 2 * hour),   // one 2h session
      evAt(2L, base + hour))                       // one 0-duration session
    val r = byName("q407_littles_law")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_sessions") == 2L)
    assert(r.getAs[Long]("span_hours") == 3L)
    assert(math.abs(r.getAs[Double]("lambda_per_hr") - 0.6667) < 1e-9)
    assert(r.getAs[Double]("mean_dur_min") == 60.0)
    assert(math.abs(r.getAs[Double]("time_avg_concurrent") - 0.666667) < 1e-9)
    assert(r.getAs[Long]("peak_hourly_concurrent") == 2L)
    // Little's identity through the independent lambda*W path
    assert(r.getAs[Double]("little_lw") == r.getAs[Double]("time_avg_concurrent"))
  }

  test("q408: norms {5,1,0,1} pin mean 1.75, grid percentiles, near-zero 1/4") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(3f, 4f), 0), (2L, Array(0.6f, 0.8f), 0),
      (3L, Array(0f, 0f), 0), (4L, Array(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = byName("q408_norm_profile").run(spark, plantDir("embeddings" -> emb)).head()
    assert(r.getAs[Long]("n_vectors") == 4L)
    assert(r.getAs[Double]("mean_norm") == 1.75)
    assert(r.getAs[Double]("p05_norm") == 0.0)
    assert(r.getAs[Double]("p50_norm") == 1.0)
    assert(r.getAs[Double]("p95_norm") == 5.0)
    assert(r.getAs[Double]("near_zero_share") == 0.25)
  }

  test("q409: converts at 0/1.5/3h pin share 0.75 and hour-grid percentiles") {
    val rows = Seq(
      evAt(1L, base), evAt(1L, base + 5400000L, "purchase"),   // 1.5h -> hr 1
      evAt(2L, base), evAt(2L, base + 3 * 3600000L, "purchase"), // hr 3
      evAt(3L, base),                                           // never
      evAt(4L, base, "purchase"))                               // hr 0
    val r = byName("q409_time_to_convert")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_users") == 4L)
    assert(r.getAs[Long]("n_converted") == 3L)
    assert(r.getAs[Double]("conversion_share") == 0.75)
    assert(math.abs(r.getAs[Double]("mean_hours") - 1.3333) < 1e-9)
    assert(r.getAs[Long]("p25_hours") == 0L)
    assert(r.getAs[Long]("p50_hours") == 1L)
    assert(r.getAs[Long]("p75_hours") == 3L)
    assert(r.getAs[Long]("p90_hours") == 3L)
  }

  test("q410: formatting twins count as within-dups; the shared doc as cross-source") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b", "en", "srcA", 3L), (2L, "A   b!!", "en", "srcA", 7L),
      (3L, "c", "en", "srcA", 1L),
      (4L, "c", "en", "srcB", 1L), (5L, "d", "en", "srcB", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q410_dup_by_source").run(spark, plantDir("documents" -> d))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("srcA").getAs[Long]("n_docs") == 3L)
    assert(rows("srcA").getAs[Long]("n_distinct") == 2L)
    assert(math.abs(rows("srcA").getAs[Double]("within_dup_share") - 0.3333) < 1e-9)
    assert(math.abs(rows("srcA").getAs[Double]("cross_source_share") - 0.3333) < 1e-9)
    assert(rows("srcB").getAs[Double]("within_dup_share") == 0.0)
    assert(rows("srcB").getAs[Double]("cross_source_share") == 0.5)
  }
}
