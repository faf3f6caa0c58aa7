package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 42: q336 UMass coherence, q337
  * successor entropy, q338 Ljung–Box.
  */
class CoherenceSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ch").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def q9(v: Double) = math.floor(v * 1e9 + 0.5)
  private def r4(v: Double) = math.floor(v * 1e4 + 0.500001) / 1e4

  test("q336: three docs pin the UMass sum at ln(2/3) + ln(1/2)") {
    import spark.implicits._
    // top: a(3), b(2), c(1); codoc (a,b)=2, (a,c)=1, (b,c)=0
    // pairs: (b,a) ln(3/3)=0; (c,a) ln(2/3); (c,b) ln(1/2)
    val docs = Seq(
      (1L, "a b", "en", "s", 3L), (2L, "a c", "en", "s", 3L),
      (3L, "a b", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q336_umass_coherence").run(spark, plantDir("documents" -> docs))
      .head()
    assert(r.getAs[Long]("n_pairs") == 3L)
    val exp = r4((q9(0.0) + q9(math.log(2.0 / 3)) + q9(math.log(0.5))) / 1e9)
    assert(r.getAs[Double]("umass_coherence") == exp)
  }

  test("q337: 'a b a c a b' gives token a two successors at entropy H(2/3,1/3)") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c a b", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q337_successor_entropy").run(spark, plantDir("documents" -> docs))
      .collect()
    val a = rows.head
    assert(a.getAs[String]("token") == "a")
    assert(a.getAs[Long]("n_follows") == 3L)
    assert(a.getAs[Long]("n_successors") == 2L)
    val sh = q9(-(2.0 / 3) * math.log(2.0 / 3)) + q9(-(1.0 / 3) * math.log(1.0 / 3))
    assert(a.getAs[Double]("successor_entropy") == r4(sh / 1e9))
    // single-successor tokens carry zero entropy
    rows.tail.foreach(t => assert(t.getAs[Double]("successor_entropy") == 0.0))
  }

  test("q338: the Ljung-Box Q matches a plain-Scala replication of the pipeline") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    val day = 86400000L
    val xs = Seq(10, 12, 9, 14, 11, 10, 13, 9, 12, 11, 10, 14, 9, 13, 11)
    var id = 0L
    val ev = xs.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q338_ljung_box").run(spark, plantDir("events" -> ev)).head()
    // replicate: AR(1) on (x_t, x_{t-1}), centi-quantized residuals,
    // lagged rho over positions, nano-quantized Q terms
    val pairs = xs.tail.zip(xs.init).map { case (y, xl) => (y.toDouble, xl.toDouble) }
    val n = pairs.size.toDouble
    val (sy, sx) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxx = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._2 * p._1).sum
    val phi = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    val (mx, my) = (sx / n, sy / n)
    val e = pairs.map { case (y, xl) => math.floor((y - my - phi * (xl - mx)) * 1e2 + 0.5) }
    val (se, see) = (e.sum, e.map(v => v * v).sum)
    val st = (1 to 10).map { k =>
      val prods = e.dropRight(k).zip(e.drop(k))
      val sp = prods.map { case (u, v) => u * v }.sum
      val np = prods.size.toDouble
      val rho = (sp - np * (se / n) * (se / n)) / (see - se * se / n)
      math.floor(rho * rho / (n - k) * 1e9 + 0.5)
    }.sum
    assert(r.getAs[Long]("n_resid") == 14L)
    assert(r.getAs[Long]("n_lags") == 10L)
    assert(r.getAs[Double]("ljung_box_q") == r4(n * (n + 2.0) * st / 1e9))
  }
}
