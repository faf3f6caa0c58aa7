package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 41: q333 rank turbulence, q334 JSD
  * matrix, q335 discounted LTV.
  */
class LexicalSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lx").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q333: hand-ranked halves pin RTD = 1.5 with y as the top mover") {
    import spark.implicits._
    // half0 (doc 2): y2 x1 -> ranks y=1, x=2; half1 (docs 1,3): x3 z1
    // -> ranks x=1, z=2; union 3: terms x=0.5, y=0.75, z=0.25
    val docs = Seq(
      (1L, "x x x", "en", "a", 5L),
      (2L, "y y x", "en", "a", 5L),
      (3L, "z", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q333_rank_turbulence").run(spark, plantDir("documents" -> docs))
      .head()
    assert(r.getAs[Long]("n_tokens_union") == 3L)
    assert(math.abs(r.getAs[Double]("rtd") - 1.5) < 1e-9)
    assert(r.getAs[String]("top_token") == "y")
    assert(math.abs(r.getAs[Double]("top_contrib") - 0.75) < 1e-9)
  }

  test("q334: disjoint vocabularies give JSD = ln 2; identical ones give 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x", "en", "a", 3L),
      (2L, "y y", "en", "b", 3L),
      (3L, "x x", "en", "c", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q334_jsd_matrix").run(spark, plantDir("documents" -> docs))
      .collect().map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Double]("jsd")).toMap
    assert(rows.size == 3)
    assert(math.abs(rows(("a", "b")) - math.log(2)) < 1e-6)
    assert(math.abs(rows(("b", "c")) - math.log(2)) < 1e-6)
    assert(rows(("a", "c")) == 0.0)
  }

  test("q335: half the users churn after week 0, discounting the week-1 cell to 0.45") {
    import spark.implicits._
    import java.sql.Timestamp
    val week = 604800000000L / 1000L // ms
    val base = (1704067200000L / week) * week // align to a week boundary
    val ev = Seq(
      (1L, new Timestamp(base), 1L), (2L, new Timestamp(base + week), 1L),
      (3L, new Timestamp(base + 1000L), 2L))
      .map { case (id, ts, u) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q335_ltv_discounted").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("week_offset") -> r).toMap
    assert(rows.keySet == Set(0L, 1L))
    assert(rows(0L).getAs[Long]("retained") == 2L)
    assert(math.abs(rows(0L).getAs[Double]("retention") - 1.0) < 1e-9)
    assert(rows(1L).getAs[Long]("retained") == 1L)
    assert(math.abs(rows(1L).getAs[Double]("discounted") - 0.45) < 1e-6)
  }
}
