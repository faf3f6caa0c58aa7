package graft

/** Property pins for the pipeline-ops batch: SimHash calibration
  * (q225), incremental join maintenance (q226) and the filter-cascade
  * funnel (q227). Value parity vs DuckDB is the oracle gate's job;
  * these pin semantics on planted data where the right answer is known
  * by construction. */
class PipelineOpsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_po").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q225: identical docs land at hamming 0 with true_share = 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "A"),
      (2L, "alpha beta gamma delta epsilon", "A"),
      (3L, "one two three four five six seven", "B"))
    val d = plantDir("documents" -> docsDF(docs))
    val out = byName("q225_simhash_calibration").run(spark, d).collect()
    assert(out.length == 1) // only the identical pair survives LSH
    val r = out.head
    assert(r.getAs[Int]("hamming") == 0)
    assert(r.getAs[Long]("n_pairs") == 1 && r.getAs[Long]("n_true") == 1)
    assert(r.getAs[Double]("true_share") == 1.0)
    assert(math.abs(r.getAs[Double]("mean_exact") - 1.0) < 1e-6)
  }

  test("q225 on driver data: hamming bounded by the fingerprint width, shares in [0,1]") {
    val rows = byName("q225_simhash_calibration").run(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Int]("hamming")
      assert(h >= 0 && h <= 32)
      val ts = r.getAs[Double]("true_share")
      assert(ts >= 0.0 && ts <= 1.0)
      assert(r.getAs[Long]("n_true") <= r.getAs[Long]("n_pairs"))
    }
  }

  test("q226: merged base+delta join equals the hand-computed direct join") {
    import spark.implicits._
    val t0 = 1704067200000L
    // user 1 -> segment SA, user 2 -> SB; user 99 has no dim row (inner
    // join drops it on BOTH the engine and oracle side)
    val events = Seq(
      (1L, new java.sql.Timestamp(t0 + 1000), 1L, "view", 1.5, "{}"),   // odd id: delta
      (2L, new java.sql.Timestamp(t0 + 2000), 1L, "view", 2.5, "{}"),   // even id: base
      (3L, new java.sql.Timestamp(t0 + 3000), 2L, "click", 3.0, "{}"),
      (4L, new java.sql.Timestamp(t0 + 4000), 99L, "view", 9.9, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val customers = Seq(
      (1L, "c1", 0, 10.0, "SA"), (2L, "c2", 1, 20.0, "SB"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val d = plantDir("events" -> events, "customer" -> customers)
    val out = byName("q226_incremental_join").run(spark, d).collect()
      .map(r => (r.getAs[String]("c_mktsegment"), r.getAs[String]("event_type")) -> r)
      .toMap
    assert(out.size == 2) // user 99's event joined nothing
    val sa = out(("SA", "view"))
    assert(sa.getAs[Long]("n_events") == 2)
    assert(sa.getAs[Long]("sum_micro") == 4000000L) // 1.5 + 2.5 in micro
    assert(math.abs(sa.getAs[Double]("avg_value") - 2.0) < 1e-6)
    val sb = out(("SB", "click"))
    assert(sb.getAs[Long]("n_events") == 1 &&
      sb.getAs[Long]("sum_micro") == 3000000L)
  }

  test("q227: each planted reject is eaten by exactly its rule, funnel monotone") {
    val clean = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, clean, "A"),                        // passes all three
      (2L, "too short", "A"),                  // fails R1 (2 tokens)
      (3L, "spam spam spam spam spam spam", "A"), // fails R2 (1 distinct of 6)
      (4L, (1 to 6).map(i => ("x" * 19) + ('a' + i).toChar).mkString(" "), "A"))
      // 6 DISTINCT 20-char tokens: passes R1+R2, fails R3 (mean len > 12)
    val d = plantDir("documents" -> docsDF(docs))
    val r = byName("q227_filter_cascade").run(spark, d).collect().head
    assert(r.getAs[String]("source") == "A")
    assert(r.getAs[Long]("n_docs") == 4)
    assert(r.getAs[Long]("pass_len") == 3)
    assert(r.getAs[Long]("pass_len_rep") == 2)
    assert(r.getAs[Long]("pass_all") == 1)
    assert(math.abs(r.getAs[Double]("survival_share") - 0.25) < 1e-6)
  }

  test("q227 on driver data: funnel is monotone non-increasing everywhere") {
    val rows = byName("q227_filter_cascade").run(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, p1, p12, p123) = (r.getAs[Long]("n_docs"), r.getAs[Long]("pass_len"),
        r.getAs[Long]("pass_len_rep"), r.getAs[Long]("pass_all"))
      assert(n >= p1 && p1 >= p12 && p12 >= p123 && p123 >= 0)
    }
  }

  test("q228: single-source corpus has share 1.0 on both sides, zero bias") {
    val docs = (0L until 40L).map(i => (i, s"doc number $i text", "only"))
    val d = plantDir("documents" -> docsDF(docs))
    val r = byName("q228_sample_bias_audit").run(spark, d).collect().head
    assert(r.getAs[String]("source") == "only")
    assert(r.getAs[Long]("n_pop") == 40)
    assert(r.getAs[Double]("pop_share") == 1.0)
    if (!r.isNullAt(r.fieldIndex("sample_share"))) {
      assert(r.getAs[Double]("sample_share") == 1.0)
      assert(r.getAs[Double]("abs_bias") == 0.0)
    }
  }

  test("q228 on driver data: realized global rate is near the nominal 10%") {
    val rows = byName("q228_sample_bias_audit").run(spark, sf("0.01")).collect()
    val pop = rows.map(_.getAs[Long]("n_pop")).sum
    val samp = rows.map(_.getAs[Long]("n_sample")).sum
    val rate = samp.toDouble / pop
    assert(rate > 0.05 && rate < 0.15, s"global rate $rate far from 0.10")
    rows.foreach(r => assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_pop")))
  }

  private def eventsDF(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows.map { case (id, ms, uid, typ, v) =>
      (id, new java.sql.Timestamp(ms), uid, typ, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q230: constant arrivals score fano 0, a burst scores far above 1") {
    val t0 = 1704067200000L
    // "steady": exactly one event per hour for 48 hours -> variance 0
    val steady = (0 until 48).map(h =>
      (h.toLong, t0 + h * 3600_000L, 1L, "steady", 1.0))
    // "burst": 40 events inside one hour + 1 in another -> fano 18.5
    val burst = (0 until 40).map(i =>
      (100L + i, t0 + i * 1000L, 2L, "burst", 1.0)) :+
      (200L, t0 + 10 * 3600_000L, 2L, "burst", 1.0)
    val d = plantDir("events" -> eventsDF(steady ++ burst))
    val out = byName("q230_fano_burstiness").run(spark, d).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("steady").getAs[Double]("fano") == 0.0)
    val f = out("burst").getAs[Double]("fano")
    assert(math.abs(f - 1521.0 / 82.0) < 1e-4, s"burst fano $f")
  }

  test("q231: single-hour traffic has peak_share 1 and chi2 = 23n/24*24/n") {
    val t0 = 1704067200000L // midnight UTC
    val n = 24
    // all events inside hour-of-day 3
    val rows = (0 until n).map(i =>
      (i.toLong, t0 + 3 * 3600_000L + i * 1000L, 1L, "hr", 1.0))
    val d = plantDir("events" -> eventsDF(rows))
    val r = byName("q231_hour_profile").run(spark, d).collect().head
    assert(r.getAs[Long]("peak_hour") == 3)
    assert(r.getAs[Double]("peak_share") == 1.0)
    // chi2 = ((24n-n)^2 + 23*n^2) / (24n) = 23n
    assert(math.abs(r.getAs[Double]("chi2_uniform") - 23.0 * n) < 1e-4)
  }

  test("q232: the first five events of a fresh user are cold, the rest warm") {
    val t0 = 1704067200000L
    val rows = (0 until 10).map(i =>
      (i.toLong, t0 + i * 60_000L, 7L, "view", 1.0))
    val d = plantDir("events" -> eventsDF(rows))
    val r = byName("q232_cold_start_rate").run(spark, d).collect().head
    assert(r.getAs[Long]("n_events") == 10 && r.getAs[Long]("n_cold") == 5)
    assert(r.getAs[Double]("cold_share") == 0.5)
  }

  test("q233: new vocabulary lands in the decile of first appearance") {
    // ids 0..9 put one doc per decile; w0/w1 arrive in decile 0, w2 in
    // decile 1, nothing after that is new
    val docs = Seq((0L, "w0 w1", "A"), (1L, "w0 w2", "A")) ++
      (2L until 10L).map(i => (i, "w0 w1", "A"))
    val d = plantDir("documents" -> docsDF(docs))
    val rows = byName("q233_vocab_growth").run(spark, d).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.size == 10)
    assert(rows(0L).getAs[Long]("new_vocab") == 2)
    assert(rows(1L).getAs[Long]("new_vocab") == 1)
    (2L to 9L).foreach(dec => assert(rows(dec).getAs[Long]("new_vocab") == 0))
    assert(rows(9L).getAs[Long]("cum_vocab") == 3)
    assert(rows(9L).getAs[Long]("cum_tokens") == 20)
  }

  test("q234: a saturated corpus fits beta near 0; driver data sits in (0,1)") {
    val docs = (0L until 20L).map(i => (i, "same old text again", "A"))
    val d = plantDir("documents" -> docsDF(docs))
    val r = byName("q234_heaps_exponent").run(spark, d).collect().head
    assert(math.abs(r.getAs[Double]("heaps_beta")) < 0.05,
      s"saturated beta ${r.getAs[Double]("heaps_beta")}")
    // every-token-new corpus: V grows linearly with N, so beta ≈ 1
    val growing = (0L until 20L).map(i => (i, s"tok${4 * i} tok${4 * i + 1} tok${4 * i + 2} tok${4 * i + 3}", "A"))
    val dg = plantDir("documents" -> docsDF(growing))
    val g = byName("q234_heaps_exponent").run(spark, dg).collect().head
    assert(g.getAs[Double]("heaps_beta") > 0.9,
      s"growing beta ${g.getAs[Double]("heaps_beta")}")
    // the driver generator draws from a FIXED vocabulary, so its corpus
    // is itself saturated (beta 0) — the invariant is the Heaps range
    val dr = byName("q234_heaps_exponent").run(spark, sf("0.01")).collect().head
    val beta = dr.getAs[Double]("heaps_beta")
    assert(beta >= 0.0 && beta < 1.0, s"driver-data beta $beta")
  }

  test("q229: duplicates are charged to the decile where they arrived") {
    // ids 0..9 with mx=9 put one doc per decile; 5..9 repeat id 0's text
    val base = "alpha beta gamma delta"
    val docs = (0L until 5L).map(i => (i, s"$base unique$i", "A")) ++
      (5L until 10L).map(i => (i, s"$base unique0", "A"))
    val d = plantDir("documents" -> docsDF(docs))
    val rows = byName("q229_dup_trend").run(spark, d).collect()
      .map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.size == 10)
    (0L to 4L).foreach { dec =>
      assert(rows(dec).getAs[Long]("n_dupes") == 0, s"decile $dec")
    }
    (5L to 9L).foreach { dec =>
      assert(rows(dec).getAs[Long]("n_dupes") == 1 &&
        rows(dec).getAs[Double]("dup_share") == 1.0, s"decile $dec")
    }
  }
}
