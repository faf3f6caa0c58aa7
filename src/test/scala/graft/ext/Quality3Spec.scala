package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 25: q276 Flesch readability, q277
  * exponential-gap KS, q278 Hill diversity. Hand-derived expectations.
  */
class Quality3Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q3").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q276: hand-counted words/sentences/syllables pin the Flesch score") {
    import spark.implicits._
    // 'go on. we sit.' -> w=4, sents=2, syllable groups: o,o,e,i = 4
    // FRE = 206.835 - 1.015*(4/2) - 84.6*(4/4) = 120.205
    val docs = Seq((1L, "go on. we sit.", "en", "a", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q276_readability").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_docs") == 1L)
    assert(math.abs(r.getAs[Double]("avg_flesch") - 120.205) < 1e-3)
    assert(math.abs(r.getAs[Double]("easy_share") - 1.0) < 1e-9)
  }

  test("q277: constant gaps maximize KS distance to the fitted exponential") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    // 13 events exactly 1 minute apart -> 12 gaps, all in bucket 1
    // (gap=60000000us // 60000000 = 1): F_emp(edge 2min)=1,
    // F_mod = 1-exp(-(1/60000000)*120000000) = 1-exp(-2)
    val ev = (0 until 13).map(i =>
      (i.toLong, new Timestamp(base + i * 60000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q277_exp_gap_ks").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_gaps") == 12L)
    assert(math.abs(r.getAs[Double]("mean_gap_min") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ks_exp") - math.exp(-2.0)) < 1e-4)
  }

  test("q278: uniform and skewed token distributions pin the Hill numbers") {
    import spark.implicits._
    // src a: 'x y z w' uniform over 4 -> D0=D1=D2... but Simpson needs
    // repeats, so double each: 'x x y y z z w w': N=8, each c=2
    // H = ln 4 -> D1 = 4; D2 = N(N-1)/sum(c(c-1)) = 56/8 = 7
    val docs = Seq(
      (1L, "x x y y z z w w", "en", "a", 15L),
      // src b: 'x x x y': N=4, c=(3,1): H=-(3/4)ln(3/4)-(1/4)ln(1/4)
      // D2 = 12/6 = 2
      (2L, "x x x y", "en", "b", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q278_hill_diversity").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = rows("a")
    assert(a.getAs[Long]("n_tokens") == 8L)
    assert(a.getAs[Long]("d0_richness") == 4L)
    assert(math.abs(a.getAs[Double]("d1_shannon") - 4.0) < 1e-3)
    assert(math.abs(a.getAs[Double]("d2_simpson") - 7.0) < 1e-3)
    assert(math.abs(a.getAs[Double]("evenness") - 1.0) < 1e-3)
    val b = rows("b")
    val h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert(math.abs(b.getAs[Double]("d1_shannon") - math.exp(h)) < 1e-3)
    assert(math.abs(b.getAs[Double]("d2_simpson") - 2.0) < 1e-3)
  }
}
