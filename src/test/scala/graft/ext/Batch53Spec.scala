package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 53: q383 Good–Turing spectrum, q384
  * eigenvector centrality, q385 Ansari–Bradley scale test, q386
  * log-normal fit.
  */
class Batch53Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b53").toString
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

  test("q383: +100/-50/0 weekly gaps pin W2+=4, z=0.4472") {
    // base epoch-day has weekday 4; the first COMPLETE dy-div-7 week
    // starts at offset 3. Week 1: weekend 20/day (D=+100); week 2:
    // weekend 5/day (D=-50); week 3: flat 10s (D=0, dropped).
    val rows = (3 until 24).flatMap { o =>
      val wd = (base / dayMs + o) % 7
      val week = (o - 3) / 7
      val k =
        if (wd == 2 || wd == 3) (if (week == 0) 20 else if (week == 1) 5 else 10)
        else 10
      (1 to k).map(i => evAt(i.toLong, base + o * dayMs))
    }
    val r = byName("q383_wilcoxon_signed")
      .run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_weeks") == 2L)
    assert(r.getAs[Long]("n_pos") == 1L)
    assert(r.getAs[Long]("n_neg") == 1L)
    assert(r.getAs[Long]("w2_plus") == 4L)
    // z = (4 - 3)/sqrt(60/12) = 1/sqrt(5)
    assert(math.abs(r.getAs[Double]("z_wilcoxon") - 0.4472) < 1e-9)
  }

  test("q384: a 5-node star pins the exact oscillation state S/2 center, S/8 leaves") {
    import spark.implicits._
    // star 1-{2,3,4,5}, each edge 3 shared orders; the star is
    // bipartite so the power iteration alternates between two exact
    // integer states — 5 rounds lands on center S/2, leaves S/8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    var ok = 0L
    val li = edges.flatMap { case (u, v) =>
      (1 to 3).flatMap { _ => ok += 1; Seq((ok, u), (ok, v)) }
    }.toDF("l_orderkey", "l_suppkey")
    val rows = byName("q384_eigenvector_centrality")
      .run(spark, plantDir("lineitem" -> li)).collect()
    assert(rows.map(_.getAs[Long]("node")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.head.getAs[Long]("score_q") == 500000000L)
    assert(rows.tail.forall(_.getAs[Long]("score_q") == 125000000L))
    assert(rows.head.getAs[Double]("score") == 0.5)
  }

  test("q385: extreme-vs-middle lengths pin AB2=12, z=-2.3664") {
    import spark.implicits._
    // A = {1,2,9,10} (dispersed), B = {4,5,6,7} (concentrated):
    // both-ends scores give A the minima -> z < 0 (A wider than B)
    val docs = (Seq(1L, 2L, 9L, 10L).map(l => ("srcA", l)) ++
      Seq(4L, 5L, 6L, 7L).map(l => ("srcB", l))).zipWithIndex
      .map { case ((src, l), i) => (i.toLong, "t", "en", src, l) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q385_ansari_bradley").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n1") == 4L)
    assert(r.getAs[Long]("n2") == 4L)
    assert(r.getAs[Long]("ab2") == 12L)
    assert(math.abs(r.getAs[Double]("z_scale") - (-2.3664)) < 1e-9)
  }

  test("q386: lengths {1,10,100} pin mu=sigma=ln 10, median 10, skew 0") {
    import spark.implicits._
    val d = Seq((1L, "t", "en", "s", 1L), (2L, "t", "en", "s", 10L),
      (3L, "t", "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q386_lognormal_fit").run(spark, plantDir("documents" -> d)).head()
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(math.abs(r.getAs[Double]("mu_ln") - 2.302585) < 1e-9)
    assert(math.abs(r.getAs[Double]("sigma_ln") - 2.302585) < 1e-9)
    assert(r.getAs[Double]("median_fit") == 10.0)
    assert(r.getAs[Double]("skew_ln") == 0.0)
  }
}
