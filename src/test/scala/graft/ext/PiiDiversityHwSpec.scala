package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-fixture pins for the q247 PII scan (Luhn validity decided by
  * hand-checkable numbers), the q248 distinct-n diversity ratios and
  * the q249 Holt–Winters seasonal forecaster.
  */
class PiiDiversityHwSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q247: plants are found; Luhn separates 4111...1111 from ...1112") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice@example.com today", "en", "web", 30L),
      (2L, "server at 192.168.1.100 is up", "en", "web", 25L),
      (3L, "call 555-867-5309 now", "en", "web", 20L),
      // 4111111111111111 passes Luhn; flipping the last digit fails it
      (4L, "card 4111111111111111 and fake 4111111111111112", "en", "web", 40L),
      (5L, "plain text with no pii at all", "en", "clean", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q247_pii_scan")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val w = rows("web")
    assert(w.getAs[Long]("n_docs") == 4L)
    assert(w.getAs[Long]("docs_email") == 1L)
    assert(w.getAs[Long]("docs_ipv4") == 1L)
    assert(w.getAs[Long]("docs_phone") == 1L)
    assert(w.getAs[Long]("luhn_candidates") == 2L)
    assert(w.getAs[Long]("luhn_valid") == 1L, s"Luhn must accept exactly one: $w")
    assert(math.abs(w.getAs[Double]("pii_doc_share") - 3.0 / 4) < 1e-5)
    val c = rows("clean")
    assert(c.getAs[Long]("luhn_candidates") == 0L &&
      math.abs(c.getAs[Double]("pii_doc_share")) < 1e-9)
  }

  test("q248: 'a a b' yields the hand-counted distinct-n table") {
    import spark.implicits._
    val docs = Seq((1L, "a a b", "en", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q248_distinct_n")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[Int]("n") -> r).toMap
    assert(rows(1).getAs[Long]("total_ngrams") == 3L)
    assert(rows(1).getAs[Long]("distinct_ngrams") == 2L)
    assert(rows(2).getAs[Long]("total_ngrams") == 2L) // "a a", "a b"
    assert(rows(2).getAs[Long]("distinct_ngrams") == 2L)
    assert(rows(3).getAs[Long]("total_ngrams") == 1L) // "a a b"
    assert(rows(3).getAs[Long]("distinct_ngrams") == 1L)
    assert(math.abs(rows(1).getAs[Double]("distinct_ratio") - 2.0 / 3) < 1e-5)
  }

  private def hourlyEvents(hours: Int, value: Int => Double) = {
    import spark.implicits._
    val base = 1704067200000L // 2024-01-01T00:00Z, ms — hod 0
    (0 until hours).map { h =>
      (h.toLong, new java.sql.Timestamp(base + h * 3600000L), 1L, "view",
        value(h), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q249: constant series gives level=v, trend=0, all forecasts=v") {
    val r = byName("q249_holt_winters")
      .run(spark, plantDir("events" -> hourlyEvents(48, _ => 7.5))).head()
    assert(r.getAs[Long]("n_buckets") == 48L)
    assert(math.abs(r.getAs[Double]("level") - 7.5) < 1e-3)
    assert(math.abs(r.getAs[Double]("trend")) < 1e-3)
    Seq("fc1", "fc2", "fc3").foreach { c =>
      assert(math.abs(r.getAs[Double](c) - 7.5) < 1e-3, s"$c: $r")
    }
  }

  test("q249: an hour-0 spike re-seasonalizes the forecast targeting hour 0") {
    // 10 days ending at hod 23 -> fc1 targets hod 0 (spiky), fc2 hod 1
    val spike = (h: Int) => if (h % 24 == 0) 30.0 else 10.0
    val r = byName("q249_holt_winters")
      .run(spark, plantDir("events" -> hourlyEvents(240, spike))).head()
    val fc1 = r.getAs[Double]("fc1")
    val fc2 = r.getAs[Double]("fc2")
    assert(fc1 - fc2 > 10.0, s"hour-0 seasonal must lift fc1 well above fc2: $r")
  }
}
