package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for q253 Chao1 richness, q254 source-ablation
  * OOV and q255 Kaplan–Meier: each statistic hand-recomputed.
  */
class RichnessAblationKmSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rak").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q253: 'a a b c' -> chao1 3.5, coverage 0.5, undetected 1/7") {
    import spark.implicits._
    // counts a:2, b:1, c:1 -> D=3, N1=2, N2=1, N=4
    val docs = Seq((1L, "a a b c", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q253_chao1").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Long]("n_distinct") == 3L)
    assert(r.getAs[Long]("n_singletons") == 2L)
    assert(r.getAs[Long]("n_doubletons") == 1L)
    // chao1 = 3 + 2*1/(2*(1+1)) = 3.5
    assert(math.abs(r.getAs[Double]("chao1") - 3.5) < 1e-5)
    assert(math.abs(r.getAs[Double]("coverage") - 0.5) < 1e-5)
    assert(math.abs(r.getAs[Double]("undetected_share") - 0.5 / 3.5) < 1e-5)
  }

  test("q254: lone-source tokens charge their source's ablation") {
    import spark.implicits._
    // train: doc 1 (src a) 'x y', doc 2 (src b) 'x z'; held: doc 3 'x y z w'
    val docs = Seq(
      (1L, "x y", "en", "a", 3L),
      (2L, "x z", "en", "b", 3L),
      (3L, "x y z w", "en", "a", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q254_source_ablation")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.keySet == Set("a", "b"))
    val a = rows("a")
    assert(a.getAs[Long]("n_held_tokens") == 4L)
    assert(a.getAs[Long]("n_oov_added") == 1L) // 'y' lives only in a
    assert(math.abs(a.getAs[Double]("oov_rate_base") - 0.25) < 1e-5) // 'w'
    assert(math.abs(a.getAs[Double]("oov_rate_ablated") - 0.5) < 1e-5)
    assert(math.abs(rows("b").getAs[Double]("oov_lift") - 0.25) < 1e-5) // 'z'
  }

  test("q255: two-death cohort matches the hand-folded product limit") {
    import spark.implicits._
    val base = 1704067200000000L
    // u1's second event at minute 1, u2's at minute 2:
    //  t=1: n=2, d=1 -> S=1/2, se = 0.5*sqrt(1/2) = 0.35355
    //  t=2: n=1, d=1 -> extinction: S=0, se NULL
    val ev = Seq(
      (1L, new java.sql.Timestamp(base / 1000), 1L, "view", 1.0, "{}"),
      (2L, new java.sql.Timestamp((base + 60000000L) / 1000), 1L, "view", 1.0, "{}"),
      (3L, new java.sql.Timestamp(base / 1000), 2L, "view", 1.0, "{}"),
      (4L, new java.sql.Timestamp((base + 120000000L) / 1000), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q255_kaplan_meier")
      .run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("dur_min") -> r).toMap
    val t1 = rows(1L)
    assert(t1.getAs[Long]("n_risk") == 2L && t1.getAs[Long]("n_events") == 1L)
    assert(math.abs(t1.getAs[Double]("survival") - 0.5) < 1e-4)
    assert(math.abs(t1.getAs[Double]("greenwood_se") - 0.5 * math.sqrt(0.5)) < 1e-4)
    val t2 = rows(2L)
    assert(t2.getAs[Double]("survival") == 0.0)
    assert(t2.isNullAt(t2.fieldIndex("greenwood_se")))
  }
}
