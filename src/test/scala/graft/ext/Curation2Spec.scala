package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 37: q320 cluster power law, q321
  * LOO influence, q322 bigram coverage, q323 positional bias.
  */
class Curation2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cu").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q320: cluster sizes (3,2,1) pin the MLE alpha and dup mass 1/2") {
    import spark.implicits._
    val docs = (Seq.fill(3)("a b") ++ Seq.fill(2)("c") ++ Seq("d")).zipWithIndex
      .map { case (t, i) => (i.toLong + 1, t, "en", "a", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q320_cluster_size_powerlaw").run(spark, plantDir("documents" -> docs))
      .head()
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(r.getAs[Long]("n_clusters") == 3L)
    assert(r.getAs[Long]("n_dup_clusters") == 2L)
    def q9(v: Double) = math.floor(v * 1e9 + 0.5)
    val sl = q9(math.log(3.0 / 1.5)) + q9(math.log(2.0 / 1.5))
    val exp = math.floor((1.0 + 2.0 / (sl / 1e9)) * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Double]("powerlaw_alpha") == exp)
    assert(math.abs(r.getAs[Double]("dup_mass") - 0.5) < 1e-9)
  }

  test("q321: dropping the short source lifts the mean by +10; the long one by -5") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t", "en", "a", 10L), (2L, "t", "en", "a", 20L),
      (3L, "t", "en", "b", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q321_loo_influence").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(math.abs(rows("a").getAs[Double]("mean_len") - 15.0) < 1e-9)
    assert(math.abs(rows("a").getAs[Double]("loo_shift") - 10.0) < 1e-9)
    assert(math.abs(rows("b").getAs[Double]("loo_shift") - -5.0) < 1e-9)
  }

  test("q322: a 13-bigram corpus covers 27/30 at top-10 and all at top-50") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.fill(10)("a b").mkString(" "), "en", "a", 1L),
      (2L, (0 to 11).map(i => s"c$i").mkString(" "), "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q322_bigram_coverage").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[Long]("top_n") -> r).toMap
    assert(rows(10L).getAs[Long]("n_distinct") == 13L)
    assert(math.abs(rows(10L).getAs[Double]("coverage") - 0.9) < 1e-6)
    Seq(50L, 100L, 500L, 1000L).foreach { n =>
      assert(math.abs(rows(n).getAs[Double]("coverage") - 1.0) < 1e-9)
    }
  }

  test("q323: start/middle/end tokens pin biases -0.5, 0, +0.5") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s m e", "en", "a", 5L), (2L, "s m e", "en", "a", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q323_positional_bias").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("token") -> r).toMap
    assert(rows.keySet == Set("s", "m", "e"))
    assert(math.abs(rows("s").getAs[Double]("position_bias") - -0.5) < 1e-9)
    assert(math.abs(rows("m").getAs[Double]("position_bias")) < 1e-9)
    assert(math.abs(rows("e").getAs[Double]("position_bias") - 0.5) < 1e-9)
    assert(rows("e").getAs[Long]("n_occ") == 2L)
  }
}
