package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for the batch-22/23 diagnostics: q265 Spearman,
  * q266 Hellinger/TV, q267 PACF, q268 Jarque–Bera, q269 naive Bayes,
  * q270 decision stump. Expected values are hand-derived (or, for the
  * PACF/JB recursions, re-folded in plain Scala from first principles —
  * NOT by calling the code under test).
  */
class ClassifyStats2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cs2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def doc(id: Long, text: String, src: String, nChars: Long) =
    (id, text, "en", src, nChars)

  test("q265: perfectly monotone and anti-monotone sources pin rho = ±1") {
    import spark.implicits._
    // src a: token count rises with n_chars -> rho = 1
    // src b: token count falls as n_chars rises -> rho = -1
    val docs = Seq(
      doc(1, "t", "a", 10), doc(2, "t t", "a", 20), doc(3, "t t t", "a", 30),
      doc(4, "t t t", "b", 10), doc(5, "t t", "b", 20), doc(6, "t", "b", 30))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q265_spearman").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("spearman_rho")).toMap
    assert(math.abs(rows("a") - 1.0) < 1e-9)
    assert(math.abs(rows("b") + 1.0) < 1e-9)
  }

  test("q266: disjoint two-language sources pin BC=sqrt(1/2), TV=1/2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "en", "a", 1L), (2L, "x", "en", "a", 1L),
      (3L, "x", "fr", "b", 1L), (4L, "x", "fr", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q266_hellinger_tv").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // p_a = (en 1, fr 0), q = (1/2, 1/2): BC = sqrt(1/2)
    val bc = math.sqrt(0.5)
    assert(math.abs(rows("a").getAs[Double]("bhattacharyya") - bc) < 1e-4)
    assert(math.abs(rows("a").getAs[Double]("hellinger") - math.sqrt(1 - bc)) < 1e-4)
    assert(math.abs(rows("a").getAs[Double]("tv_dist") - 0.5) < 1e-4)
    assert(math.abs(rows("b").getAs[Double]("tv_dist") - 0.5) < 1e-4)
  }

  test("q267: PACF matches a plain-Scala Durbin-Levinson fold") {
    import spark.implicits._
    import java.sql.Timestamp
    // one event per hour, values chosen aperiodic; n = 10 buckets
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val base = 1704067200000L // 2024-01-01 00:00 UTC
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new Timestamp(base + i * 3600000L), 1L, "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q267_pacf").run(spark, plantDir("events" -> ev)).head()
    // independent fold: centered integers, integer product sums, DL
    val yq = vals.map(v => math.floor(v * 1000.0 + 0.5).toLong)
    val n = yq.length
    val tot = yq.sum
    val c = yq.map(y => n * y - tot)
    def corr(k: Int): Double = {
      val num = (0 until n - k).map(i => BigInt(c(i)) * BigInt(c(i + k))).sum
      val den = c.map(x => BigInt(x) * BigInt(x)).sum
      num.toDouble / den.toDouble
    }
    val (r1, r2, r3) = (corr(1), corr(2), corr(3))
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val a21 = r1 - phi22 * r1
    val phi33 = (r3 - a21 * r2 - phi22 * r1) / (1.0 - a21 * r1 - phi22 * r2)
    assert(r.getAs[Long]("n_buckets") == 10L)
    assert(math.abs(r.getAs[Double]("pacf1") - r1) < 1e-4 + 1e-9)
    assert(math.abs(r.getAs[Double]("pacf2") - phi22) < 1e-4 + 1e-9)
    assert(math.abs(r.getAs[Double]("pacf3") - phi33) < 1e-4 + 1e-9)
  }

  test("q268: symmetric two-point mass pins skew 0, kurtosis 1, JB = n/24") {
    import spark.implicits._
    // n_chars alternating 200/400: m1=0 about the 300 shift, m2=100^2,
    // m3=0 (skew 0), m4=100^4 -> kurtosis 1, JB = n/6 * (0 + 4/4) ...
    // (g2-3)^2/4 = 1 -> JB = n/6
    val docs = (1 to 12).map(i =>
      doc(i.toLong, "t", "a", if (i % 2 == 0) 200 else 400))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q268_jarque_bera").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n") == 12L)
    assert(math.abs(r.getAs[Double]("skewness") - 0.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("kurtosis") - 1.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("jb_stat") - 2.0) < 1e-4)
    assert(!r.getAs[Boolean]("reject_normal"))
  }

  test("q269: separable vocabularies classify the hold-out perfectly; OOV-only docs drop") {
    import spark.implicits._
    // train (id%10<7): a says x, b says z; eval: 7 'x x'->a, 8 'z z'->b,
    // 9 'qq qq' is all-OOV and must vanish from the scored set
    val docs = Seq(
      doc(1, "x x x", "a", 5), doc(2, "x x y", "a", 5),
      doc(3, "z z z", "b", 5), doc(4, "z z w", "b", 5),
      doc(7, "x x", "a", 3), doc(8, "z z", "b", 3), doc(9, "qq qq", "a", 5))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q269_naive_bayes").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("a").getAs[Long]("n_eval") == 1L) // doc 9 dropped (all OOV)
    assert(rows("a").getAs[Long]("n_correct") == 1L)
    assert(rows("b").getAs[Long]("n_eval") == 1L)
    assert(math.abs(rows("b").getAs[Double]("accuracy") - 1.0) < 1e-9)
  }

  test("q270: separable classes pin gain 0.5 and perfect hold-out accuracy") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    // low values never purchase, high values always purchase; ids cover
    // both split halves
    val ev = (0 until 20).map { i =>
      val purchase = i % 2 == 1
      (i.toLong, new Timestamp(base + i * 60000L), 1L,
        if (purchase) "purchase" else "view",
        if (purchase) 9.0 else 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q270_decision_stump").run(spark, plantDir("events" -> ev)).head()
    // train = ids {0..6, 10..16}: 8 views, 6 purchases -> parent Gini
    // = 1 - (6/14)^2 - (8/14)^2 = 24/49; children pure -> gain = 24/49
    assert(math.abs(r.getAs[Double]("gini_gain") - 24.0 / 49.0) < 1e-5)
    assert(!r.getAs[Boolean]("left_label"))
    assert(r.getAs[Boolean]("right_label"))
    assert(r.getAs[Long]("n_eval") == 6L)
    assert(math.abs(r.getAs[Double]("accuracy") - 1.0) < 1e-9)
  }
}
