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

  test("q383: 'a a a b b c' pins the full r=0..5 spectrum, missing mass 1/6") {
    import spark.implicits._
    val d = Seq((1L, "a a a b b c", "en", "x", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q383_good_turing").run(spark, plantDir("documents" -> d))
      .collect().map(r => r.getAs[Long]("r") -> r).toMap
    assert(rows.keySet == (0L to 5L).toSet)
    // N=6, N1=N2=N3=1: p_gt(0) = 1/6 is the unseen mass
    assert(rows(0L).getAs[Long]("n_r") == 0L)
    assert(rows(0L).isNullAt(rows(0L).fieldIndex("r_star")))
    assert(math.abs(rows(0L).getAs[Double]("p_gt") - 0.166667) < 1e-9)
    assert(rows(1L).getAs[Double]("r_star") == 2.0)   // 2*N2/N1
    assert(math.abs(rows(1L).getAs[Double]("p_gt") - 0.333333) < 1e-9)
    assert(rows(2L).getAs[Double]("r_star") == 3.0)   // 3*N3/N2
    assert(rows(3L).getAs[Double]("r_star") == 0.0)   // N4 = 0
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("r_star")))
    assert(rows(5L).getAs[Double]("p_gt") == 0.0)
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
