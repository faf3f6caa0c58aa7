package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 28: q287 Cochran–Armitage, q288
  * Friedman, q289 Cliff's delta, q290 Cramér's V, q291 RBO. Textbook
  * hand-derived expectations.
  */
class RankTestsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rk").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L // midnight UTC
  private def tsAt(hour: Long, idx: Long) =
    new java.sql.Timestamp(base + hour * 3600000L + idx * 1000L)

  test("q287: purchase share rising 0/2, 1/2, 2/2 across hours gives Z = 2") {
    import spark.implicits._
    // T = 5 - 0.5*6 = 2; Var = 0.25*(10 - 36/6) = 1 -> Z = 2
    val rows = Seq(
      (1L, tsAt(0, 0), 1L, "view", 1.0, "{}"), (2L, tsAt(0, 1), 1L, "view", 1.0, "{}"),
      (3L, tsAt(1, 0), 1L, "view", 1.0, "{}"), (4L, tsAt(1, 1), 1L, "purchase", 1.0, "{}"),
      (5L, tsAt(2, 0), 1L, "purchase", 1.0, "{}"), (6L, tsAt(2, 1), 1L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q287_cochran_armitage").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Long]("n_cases") == 3L)
    assert(math.abs(r.getAs[Double]("z_trend") - 2.0) < 1e-9)
  }

  test("q288: a perfectly consistent 3x3 rank table gives Friedman chi2 = 6") {
    import spark.implicits._
    val day = 86400000L
    // each day: view 3 events, click 2, purchase 1 -> ranks 3/2/1 every day
    val ev = (0 until 3).flatMap { dd =>
      (1 to 3).map(i => (dd * 10L + i, new java.sql.Timestamp(base + dd * day + i * 1000L),
        1L, "view", 1.0, "{}")) ++
      (4 to 5).map(i => (dd * 10L + i, new java.sql.Timestamp(base + dd * day + i * 1000L),
        1L, "click", 1.0, "{}")) ++
      Seq((dd * 10L + 6, new java.sql.Timestamp(base + dd * day + 6000L),
        1L, "purchase", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q288_friedman").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_treatments") == 3L)
    assert(r.getAs[Long]("n_blocks") == 3L)
    assert(math.abs(r.getAs[Double]("chi2_friedman") - 6.0) < 1e-4)
  }

  test("q289: en {2,3} vs other {1,2} dominance pins delta at 0.75") {
    import spark.implicits._
    // pairs: (2,1)+ (2,2)0 (3,1)+ (3,2)+ -> (3-0)/4
    val docs = Seq(
      (1L, "t", "en", "a", 2L), (2L, "t", "en", "a", 3L),
      (3L, "t", "de", "a", 1L), (4L, "t", "de", "a", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q289_cliffs_delta").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_en") == 2L)
    assert(r.getAs[Long]("n_other") == 2L)
    assert(math.abs(r.getAs[Double]("cliffs_delta") - 0.75) < 1e-9)
  }

  test("q290: a perfectly associated 2x2 grid (with zero cells) gives V = 1") {
    import spark.implicits._
    // A only in hour 0, B only in hour 1: all four e = 1, chi2 = 4, V = 1;
    // the two ZERO cells contribute e each — the densified grid matters
    val ev = Seq(
      (1L, tsAt(0, 0), 1L, "A", 1.0, "{}"), (2L, tsAt(0, 1), 1L, "A", 1.0, "{}"),
      (3L, tsAt(1, 0), 1L, "B", 1.0, "{}"), (4L, tsAt(1, 1), 1L, "B", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q290_cramers_v").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_total") == 4L)
    assert(math.abs(r.getAs[Double]("chi2") - 4.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("cramers_v") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("cramers_v_corrected") - 1.0) < 1e-6)
  }

  test("q291: doc-count [a,b,c] vs char-count [b,a,c] rankings give RBO 0.9") {
    import spark.implicits._
    // m = (2,2,3) -> X = (0,2,3); terms 0 + 0.9 + 0.81; RBO = 0.171 + 0.729
    val docs = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 1L), (3L, "t", "en", "a", 1L),
      (4L, "t", "en", "b", 10L), (5L, "t", "en", "b", 10L),
      (6L, "t", "en", "c", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q291_rbo").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_sources") == 3L)
    assert(math.abs(r.getAs[Double]("rbo_ext") - 0.9) < 1e-6)
  }
}
