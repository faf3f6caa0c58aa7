package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 31: q299 Kneser–Ney, q300 trigram
  * motifs, q301 Page–Hinkley, q302 Kendall's W.
  */
class MotifsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_mo").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L // epoch day 19723, midnight UTC

  test("q299: 'x y x y' pins the interpolated KN probabilities by hand") {
    import spark.implicits._
    // bigrams (x,y)x2 (y,x)x1; P(y|x)=1.25/2+0.75*0.5*0.5=0.8125;
    // P(x|y)=0.25+0.75*0.5=0.625
    val docs = Seq((1L, "x y x y", "en", "a", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q299_kneser_ney").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_bigrams") == 3L)
    val expNll = (2 * -math.log(0.8125) + -math.log(0.625)) / 3
    assert(math.abs(r.getAs[Double]("kn_nll") - expNll) < 1e-5)
    assert(math.abs(r.getAs[Double]("kn_ppl") - math.exp(expNll)) < 1e-3)
  }

  test("q300: a strict A-B-C cycle pins trigram lifts at 1, 1, 5/6") {
    import spark.implicits._
    import java.sql.Timestamp
    val types = Seq("A", "B", "C")
    val ev = (0 until 18).map(i =>
      (i.toLong + 1, new Timestamp(base + i * 1000L), 1L, types(i % 3), 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q300_trigram_motifs").run(spark, plantDir("events" -> ev))
      .collect()
    assert(rows.length == 3)
    val key = rows.map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
      r.getAs[String]("c"), r.getAs[Long]("obs"), r.getAs[Double]("lift")))
    // lift(A,B,C) = 6*6/(6*6) = 1; lift(C,A,B) = 5*6/(5*6) = 1;
    // lift(B,C,A) = 5*5/(6*5) = 0.833333
    assert(key(0) == ("A", "B", "C", 6L, 1.0))
    assert(key(1) == ("C", "A", "B", 5L, 1.0))
    assert(key(2)._1 == "B" && math.abs(key(2)._5 - 0.833333) < 1e-9)
  }

  test("q301: a level shift on day 3 of (10,10,22) peaks PH at 8") {
    import spark.implicits._
    import java.sql.Timestamp
    val day = 86400000L
    val ev = (Seq.fill(10)(0L) ++ Seq.fill(10)(1L) ++ Seq.fill(22)(2L))
      .zipWithIndex.map { case (dd, i) =>
        (i.toLong + 1, new Timestamp(base + dd * day + i * 1000L), 1L, "view", 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q301_page_hinkley").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 3L)
    assert(r.getAs[Long]("peak_day") == 19725L)
    // day-3 deviation: 22 - 42/3 = 8; earlier days contribute 0
    assert(math.abs(r.getAs[Double]("ph_max") - 8.0) < 1e-6)
  }

  test("q302: two types agreeing on three hours give W = 1, chi2 = 4") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(id: Long, hr: Long, t: String) =
      (id, new Timestamp(base + hr * 3600000L + id * 1000L), 1L, t, 1.0, "{}")
    // counts: t1 = (1,2,3), t2 = (2,4,6) over hours 0,1,2 -> same ranks
    var id = 0L
    val rows = (Seq(1, 2, 3).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ => id += 1; ev(id, h.toLong, "t1") }
    } ++ Seq(2, 4, 6).zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map { _ => id += 1; ev(id, h.toLong, "t2") }
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q302_kendall_w").run(spark, plantDir("events" -> rows)).head()
    assert(r.getAs[Long]("n_rankers") == 2L)
    assert(r.getAs[Long]("n_items") == 3L)
    assert(math.abs(r.getAs[Double]("kendall_w") - 1.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("chi2_w") - 4.0) < 1e-4)
  }
}
