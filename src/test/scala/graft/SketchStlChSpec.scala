package graft

import org.apache.spark.sql.functions._

/** Planted-fixture pins for q261 AMS F2, q262 language confusion,
  * q263 STL strengths and q264 Calinski–Harabasz.
  */
class SketchStlChSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ssc").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L // ms

  test("q261: a single user makes every estimator exact -> rel_err 0") {
    import spark.implicits._
    val ev = (1 to 7).map(i =>
      (i.toLong, new java.sql.Timestamp(base), 42L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q261_ams_f2").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_users") == 1L)
    assert(r.getAs[Long]("f2_exact") == 49L)
    // every counter is +-7, every estimator 49: median exact
    assert(math.abs(r.getAs[Double]("f2_est") - 49.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("rel_err")) < 1e-9)
  }

  test("q262: planted marker docs land in the right confusion cells") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat", "en", "web", 11L),   // correct en
      (2L, "der hund und", "en", "web", 13L),  // labeled en, guessed de
      (3L, "x q z", "de", "web", 5L))          // labeled de, guessed unknown
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q262_lang_confusion")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => (r.getAs[String]("labeled_lang"),
        r.getAs[String]("guessed_lang")) -> r).toMap
    assert(rows(("en", "en")).getAs[Long]("n") == 1L)
    assert(rows(("en", "en")).getAs[Boolean]("correct"))
    assert(rows(("en", "de")).getAs[Long]("n") == 1L)
    assert(!rows(("en", "de")).getAs[Boolean]("correct"))
    assert(math.abs(rows(("en", "de")).getAs[Double]("share_of_labeled") - 0.5) < 1e-6)
    assert(rows(("de", "unknown")).getAs[Long]("n") == 1L)
  }

  private def hourlyEvents(hours: Int, value: Int => Double) = {
    import spark.implicits._
    (0 until hours).map { h =>
      (h.toLong, new java.sql.Timestamp(base + h * 3600000L), 1L, "view",
        value(h), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q263: linear trend scores trend~1; hour-of-day spikes score seasonal~1") {
    val trend = byName("q263_stl_strength")
      .run(spark, plantDir("events" -> hourlyEvents(240, h => h * 1.0))).head()
    assert(trend.getAs[Double]("trend_strength") > 0.9, s"$trend")
    val spiky = byName("q263_stl_strength")
      .run(spark, plantDir("events" ->
        hourlyEvents(240, h => if (h % 24 == 0) 50.0 else 10.0))).head()
    assert(spiky.getAs[Double]("seasonal_strength") > 0.9, s"$spiky")
    // constant series: all variances 0 -> both strengths NULL
    val const = byName("q263_stl_strength")
      .run(spark, plantDir("events" -> hourlyEvents(48, _ => 3.0))).head()
    assert(const.isNullAt(const.fieldIndex("trend_strength")))
    assert(const.isNullAt(const.fieldIndex("seasonal_strength")))
  }

  test("q264: two separated label clusters give the hand-computed CH=200") {
    import spark.implicits._
    def vec(x: Float) = Array.tabulate(64)(j => if (j == 0) x else 0.0f)
    val emb = Seq(
      (1L, vec(0.9f), 0), (2L, vec(1.1f), 0),
      (3L, vec(-0.9f), 1), (4L, vec(-1.1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = byName("q264_calinski_harabasz")
      .run(spark, plantDir("embeddings" -> emb)).head()
    assert(r.getAs[Long]("n_vectors") == 4L && r.getAs[Long]("k_labels") == 2L)
    // SSB = 2*1^2 + 2*1^2 = 4; SSW = 2*(0.1^2+0.1^2) = 0.04
    assert(math.abs(r.getAs[Double]("ssb") - 4.0) < 1e-3)
    assert(math.abs(r.getAs[Double]("ssw") - 0.04) < 1e-3)
    // CH = (4/1)/(0.04/2) = 200
    assert(math.abs(r.getAs[Double]("ch_index") - 200.0) < 1.0)
  }

  test("q437: GK quantile sketch sits inside its rank bound on planted uniform groups") {
    import spark.implicits._
    // two groups of distinct uniform prices: every within-bound boolean
    // must be TRUE (the GK guarantee is n/1000, far wider than exact on
    // 2000 distinct values), and group counts are pinned
    val li = (1 to 2000).map(i =>
      (if (i % 2 == 0) "A" else "B", 100.0 + i))
      .toDF("l_returnflag", "l_extendedprice")
    val rows = byName("q437_approx_quantile").run(spark, plantDir("lineitem" -> li)).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 1000L)
      assert(r.getAs[Boolean]("p50_within_bound"))
      assert(r.getAs[Boolean]("p90_within_bound"))
    }
    // the rank check itself is falsifiable: an extreme value at p50's
    // target rank window would fail — replicate the operator's integer
    // arithmetic on a deliberately wrong "approx" answer (the maximum):
    // lt+1 = 1000 > target(500) + slack(2) — the boolean flips
    val n = 1000L; val target = (1 * n + 1) / 2; val slack = n / 1000 + 1
    val ltMax = n - 1
    assert(!(ltMax + 1 <= target + slack), "a max-value p50 must violate the bound")
  }
}
