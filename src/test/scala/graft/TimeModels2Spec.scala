package graft

import org.apache.spark.sql.functions._

/** Property pins for the round-6 continuation batch: ACF (q170),
  * repetition filters (q171), Zipf slope (q172), Theil–Sen (q173) and
  * KS drift (q174). Planted-signal tests write a real parquet dir and
  * run the REGISTERED query on it — the same code path the driver
  * gate runs, loader included. */
class TimeModels2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  /** Write the given tables as `<tmp>/<name>.parquet` and return the dir. */
  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_plant").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q170: planted 24-hour sinusoid yields acf(24) near +1 and acf(12) near -1") {
    import spark.implicits._
    val rng = new scala.util.Random(11L)
    val rows = (0 until 744).map { h =>
      (h.toLong, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 7L,
        "hr", 70.0 + 8.0 * math.sin(2 * math.Pi * h / 24.0) + 0.3 * rng.nextGaussian(), "{}")
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val acf = byName("q170_acf").run(spark, d).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Double]("acf")).toMap
    assert(acf(24) > 0.9, s"acf(24)=${acf(24)}")
    assert(acf(12) < -0.9, s"acf(12)=${acf(12)}")
    assert(math.abs(acf(6)) < 0.3, s"acf(6)=${acf(6)} should be near zero (quadrature lag)")
  }

  test("q170 on driver data: |acf| <= 1, n_pairs = n_buckets - lag") {
    val rows = byName("q170_acf").run(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("acf")) <= 1.0001)
      assert(r.getAs[Long]("n_pairs") ==
        r.getAs[Long]("n_buckets") - r.getAs[Int]("lag"))
    }
  }

  test("q173: one gross outlier cannot move the Theil-Sen slope (OLS moves)") {
    import spark.implicits._
    // clean line: value = 10 + 0.5/hour, hourly points; one +500 spike
    val rows = (0 until 32).map { h =>
      val v = 10.0 + 0.5 * h + (if (h == 20) 500.0 else 0.0)
      (h.toLong, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 3L,
        "hr", v, "{}")
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = byName("q173_theil_sen").run(spark, d).collect().head
    assert(r.getAs[Long]("n_points") == 32 && r.getAs[Long]("n_pairs") == 496)
    val slope = r.getAs[Double]("theil_sen_per_hr")
    assert(math.abs(slope - 0.5) < 0.05, s"robust slope $slope, planted 0.5")
    // the OLS slope over the same 32 points IS moved by the spike —
    // that contrast is the reason this operator exists next to q145
    val pts = (0 until 32).map(h => (h.toDouble,
      10.0 + 0.5 * h + (if (h == 20) 500.0 else 0.0)))
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 0.5) > 0.5, s"OLS $ols should be pulled by the spike")
  }

  test("q171: planted repetition saturates both metrics; distinct doc floors them") {
    import spark.implicits._
    val rep = (("x y " * 16).trim) // 32 tokens, top bigram "x y" 16 of 31
    val uniq = (0 until 32).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, rep, "en", "s1", rep.length.toLong),
      (2L, uniq, "en", "s1", uniq.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = plantDir("documents" -> docs)
    val out = byName("q171_repetition").run(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("top_bigram_share"), r.getAs[Double]("dup_5gram_frac"))).toMap
    assert(math.abs(out(1L)._1 - 16.0 / 31.0) < 1e-3)
    assert(out(1L)._2 == 1.0, "every 5-gram of a 2-token loop repeats")
    assert(math.abs(out(2L)._1 - 1.0 / 31.0) < 1e-3)
    assert(out(2L)._2 == 0.0, "no repeated 5-gram in an all-distinct doc")
  }

  test("q172 on driver data: slope is negative, at most 100 ranks enter") {
    val r = byName("q172_zipf_slope").run(spark, sf()).collect().head
    assert(r.getAs[Long]("n_tokens") <= 100)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("q177: strictly increasing series maxes S; constant series zeroes the test") {
    import spark.implicits._
    val rows = (0 until 32).flatMap { h =>
      Seq((h.toLong, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 1L,
        "hr", 10.0 + h, "{}"), // strictly increasing
        (1000L + h, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 2L,
          "hr", 42.0, "{}")) // constant
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = byName("q177_mann_kendall").run(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Long]("s_stat") == 496, "S = C(32,2) for strict increase")
    assert(out(1L).getAs[String]("trend") == "increasing")
    assert(out(2L).getAs[Long]("s_stat") == 0)
    assert(out(2L).getAs[Long]("var18") == 0, "all-tied variance collapses")
    assert(out(2L).getAs[String]("trend") == "none")
  }

  test("q178: a 6-hour planted shift puts the ccf peak at lag 6, |ccf| <= 1") {
    import spark.implicits._
    // type 'aaa' leads: 'bbb' is the same daily sinusoid delayed 6 h
    val rows = (0 until 744).flatMap { h =>
      val base = 50.0 + 10.0 * math.sin(2 * math.Pi * h / 24.0)
      val delayed = 50.0 + 10.0 * math.sin(2 * math.Pi * (h - 6) / 24.0)
      Seq((h.toLong, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 1L,
        "aaa", base, "{}"),
        (10000L + h, new java.sql.Timestamp(1704067200000L + h * 3600_000L), 2L,
          "bbb", delayed, "{}"))
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val ccf = byName("q178_cross_correlation").run(spark, d).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("ccf")).toMap
    ccf.values.foreach(v => assert(math.abs(v) <= 1.0001))
    val best = ccf.maxBy(_._2)
    assert(best._1 == 6L, s"peak at lag ${best._1}, planted 6: $ccf")
    assert(best._2 > 0.9)
    assert(ccf(-6L) < -0.9, "anti-phase at the mirrored lag")
  }

  test("q179 CUMULATE: final window of each period = tumble; counts expand monotonically") {
    val rows = byName("q179_cumulate_windows").run(spark, sf("0.01")).collect()
    assert(rows.nonEmpty)
    val total = rows.filter { r =>
      val st = r.getAs[java.sql.Timestamp]("window_start").getTime
      val en = r.getAs[java.sql.Timestamp]("window_end").getTime
      en - st == 6 * 3600 * 1000L
    }.map(_.getAs[Long]("n_events")).sum
    assert(total == 10000L, s"j=6 windows must cover every event once, got $total")
    rows.groupBy(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("window_start"))).foreach { case (_, rs) =>
      val byEnd = rs.sortBy(_.getAs[java.sql.Timestamp]("window_end").getTime)
        .map(_.getAs[Long]("n_events"))
      assert(byEnd.zip(byEnd.tail).forall { case (a, b) => a <= b },
        s"cumulate counts must be non-decreasing: ${byEnd.mkString(",")}")
    }
  }

  test("q180 JSD: bounded by ln 2; identical sources diverge by 0") {
    import spark.implicits._
    val text = (0 until 20).map(i => s"w${i % 7}").mkString(" ")
    val docs = Seq((1L, text, "en", "a", 100L), (2L, text, "en", "b", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = plantDir("documents" -> docs)
    byName("q180_jsd_drift").run(spark, d).collect().foreach { r =>
      assert(r.getAs[Double]("jsd") == 0.0, s"$r")
    }
    byName("q180_jsd_drift").run(spark, sf("0.01")).collect().foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-6, s"jsd $j out of [0, ln2]")
    }
  }

  test("q174: identical length distributions give ks=0; disjoint give ks=1") {
    import spark.implicits._
    def doc(id: Long, src: String, len: Long) =
      (id, "w " * 10, "en", src, len)
    val same = ((0 until 20).map(i => doc(i, "a", 50 + (i % 5))) ++
      (0 until 20).map(i => doc(100 + i, "b", 50 + (i % 5))))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dSame = plantDir("documents" -> same)
    byName("q174_ks_drift").run(spark, dSame).collect().foreach { r =>
      assert(r.getAs[Double]("ks_stat") == 0.0, s"${r}")
    }
    val disjoint = ((0 until 20).map(i => doc(i, "a", 10 + i)) ++
      (0 until 20).map(i => doc(100 + i, "b", 1000 + i)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dDis = plantDir("documents" -> disjoint)
    byName("q174_ks_drift").run(spark, dDis).collect().foreach { r =>
      assert(r.getAs[Double]("ks_stat") == 1.0, s"${r}")
    }
  }
}
