package graft

import org.apache.spark.sql.functions._

/** Property pins for the data-selection / label-quality batch: DSIR
  * importance weights (q186), label silhouette margins (q187),
  * Mann–Whitney U (q188), 1-NN label noise (q189) and BH-FDR drift
  * control (q190). Value parity vs DuckDB is the oracle gate's job;
  * these pin the semantics on planted data where the right answer is
  * known by construction. */
class LmSim3Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm3").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def embDF(rows: Seq[(Long, Array[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("q186: target-vocabulary docs score positive, alien-vocabulary docs negative") {
    // src0 speaks vocabulary A, every other source vocabulary B — a
    // doc's DSIR score must recover which side it came from
    val vocabA = "alpha beta gamma delta epsilon zeta"
    val vocabB = "one two three four five six"
    val docs = (0L until 10L).map(i => (i, vocabA, "src0")) ++
      (10L until 40L).map(i => (i, vocabB, s"src${1 + i % 3}"))
    val out = byName("q186_dsir_weights")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
    assert(out.length == 40)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val sel = r.getAs[Boolean]("selected")
      val score = r.getAs[Double]("dsir_score")
      if (id < 10) assert(sel && score > 0, s"target doc must be selected: $r")
      else assert(!sel && score < 0, s"alien doc must not be selected: $r")
      assert(r.getAs[Long]("n_tokens") == 6)
    }
  }

  test("q186: score is per-token additive — duplicating a doc's text doubles it") {
    val docs = Seq((0L, "alpha beta", "src0"), (1L, "alpha beta", "srcX"),
      (2L, "alpha beta alpha beta", "srcX"))
    val out = byName("q186_dsir_weights")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("dsir_score"))).toMap
    assert(out(1L)._1 == 2 && out(2L)._1 == 4)
    // same bucket multiset twice ⇒ exactly double the (pre-rounding
    // integer) score; r4 rounding keeps it within a tick
    assert(math.abs(out(2L)._2 - 2 * out(1L)._2) < 3e-4, s"$out")
  }

  test("q187: orthogonal label clusters separate with margin ~1; a planted straddler drops its label") {
    def v(x: Double, y: Double, jitter: Double) =
      Array(x.toFloat, y.toFloat, jitter.toFloat, 0.1f)
    // label 0 along e1, label 1 along e2 (tiny deterministic jitter so
    // cosines are distinct), plus one label-0 point sitting ON the
    // label-1 axis — its margin must be negative
    val clean = (0 until 4).map(i => (i.toLong, v(1.0, 0.02 * i, 0.01), 0)) ++
      (4 until 8).map(i => (i.toLong, v(0.02 * (i - 4), 1.0, 0.01), 1))
    val out1 = byName("q187_label_silhouette")
      .run(spark, plantDir("embeddings" -> embDF(clean))).collect()
      .map(r => r.getAs[Int]("label") ->
        (r.getAs[Double]("avg_margin"), r.getAs[Double]("frac_separated"))).toMap
    assert(out1(0)._1 > 0.5 && out1(0)._2 == 1.0, s"$out1")
    assert(out1(1)._1 > 0.5 && out1(1)._2 == 1.0, s"$out1")

    val straddler = clean :+ (8L, v(0.01, 1.0, 0.01), 0)
    val out2 = byName("q187_label_silhouette")
      .run(spark, plantDir("embeddings" -> embDF(straddler))).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Double]("frac_separated")).toMap
    assert(out2(0) < 1.0, s"straddler must break label 0's separation: $out2")
    assert(out2(1) == 1.0, s"label 1 stays clean: $out2")
  }

  test("q188: a planted distribution shift is significant, the null is not, U stays in bounds") {
    import spark.implicits._
    val arms = (1L to 200L).toDF("user_id").select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def events(shift: Double) = (1L to 200L).flatMap { u =>
      (0 until 20).map { i =>
        val noise = ((u * 31 + i * 7) % 11).toDouble
        (u * 1000 + i, new java.sql.Timestamp(1704067200000L + i * 60000L), u,
          "purchase", 50.0 + noise + (if (arms(u) == 0) shift else 0.0), "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hit = byName("q188_mann_whitney")
      .run(spark, plantDir("events" -> events(25.0))).collect().head
    assert(hit.getAs[Boolean]("significant"), s"shifted arms must flag: $hit")
    val na = hit.getAs[Long]("n_a"); val nb = hit.getAs[Long]("n_b")
    val u = hit.getAs[Double]("u_stat")
    assert(u >= 0 && u <= na.toDouble * nb, s"U out of range: $hit")
    // a +25 shift on arm A means nearly every A value beats every B value
    assert(u > 0.95 * na.toDouble * nb, s"U must be near its maximum: $hit")
    val nul = byName("q188_mann_whitney")
      .run(spark, plantDir("events" -> events(0.0))).collect().head
    assert(!nul.getAs[Boolean]("significant"), s"identical arms must not flag: $nul")
  }

  test("q189: clean clusters have zero noise; one flipped label is flagged exactly once") {
    def ang(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val clean = Seq(0.0, 1.0, 2.0, 3.0).zipWithIndex.map { case (a, i) =>
      (i.toLong, ang(a), 0)
    } ++ Seq(90.0, 89.0, 88.0, 87.0).zipWithIndex.map { case (a, i) =>
      ((i + 4).toLong, ang(a), 1)
    }
    val out1 = byName("q189_knn_label_noise")
      .run(spark, plantDir("embeddings" -> embDF(clean))).collect()
    out1.foreach(r => assert(r.getAs[Long]("n_flagged") == 0 &&
      r.getAs[Double]("noise_rate") == 0.0, s"clean data flagged: $r"))
    // a label-1 point at 10 deg: its NN is the 3-deg label-0 point (flag),
    // while every label-0 point still has a closer label-0 neighbor
    val flipped = clean :+ (8L, ang(10.0), 1)
    val out2 = byName("q189_knn_label_noise")
      .run(spark, plantDir("embeddings" -> embDF(flipped))).collect()
      .map(r => r.getAs[Int]("label") -> r.getAs[Long]("n_flagged")).toMap
    assert(out2 == Map(0 -> 0L, 1 -> 1L), s"exactly the flipped point flags: $out2")
  }

  test("q191: a two-token loop has zero conditional entropy; branching contexts do not") {
    val docs = Seq(
      (0L, ("a b " * 8).trim, "loop"),
      (1L, "a x a y a x a y a x a y", "branch"))
    val out = byName("q191_conditional_entropy")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("h_cond"), r.getAs[Double]("redundancy"))).toMap
    // every 'a' is followed by 'b' and every 'b' by 'a' — fully predictable
    assert(out("loop")._1 == 0.0 && out("loop")._2 == 1.0, s"$out")
    // 'a' branches to x/y: H(W2|W1) = 6·ln2/11
    assert(math.abs(out("branch")._1 - 6 * math.log(2) / 11) < 1e-4, s"$out")
    assert(out("branch")._2 < 1.0)
  }

  test("q192: planted outlier moves the mean but neither robust estimate") {
    import spark.implicits._
    val ev = ((1 to 99).map(_.toDouble) :+ 10000.0).zipWithIndex.map {
      case (v, i) =>
        (i.toLong, new java.sql.Timestamp(1704067200000L + i * 1000L), 1L,
          "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q192_trimmed_means")
      .run(spark, plantDir("events" -> ev)).collect().head
    assert(r.getAs[Long]("n") == 100)
    // lo = 5: trim ranks 1-5 and 96-100; ranks 6..95 are values 6..95
    assert(r.getAs[Double]("mean") == 149.5, s"$r")
    assert(r.getAs[Double]("trimmed_mean") == 50.5, s"$r")
    // winsorize: {1..5}→6, {96,97,98,99,10000}→95 — same 50.5 by design
    assert(r.getAs[Double]("winsorized_mean") == 50.5, s"$r")
  }

  test("q193: a misfiled document is the outlier in its source") {
    val docs = (0L until 6L).map(i => (i, "alpha beta gamma alpha", "srcA")) ++
      Seq((6L, "uno dos tres uno", "srcA")) ++ // misfiled: B's vocabulary
      (7L until 12L).map(i => (i, "uno dos tres dos", "srcB"))
    val out = byName("q193_source_purity")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Double]("centroid_cos"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(byId(6L)._2, s"misfiled doc must flag: ${byId(6L)}")
    (0L until 6L).foreach(i => assert(!byId(i)._2, s"clean doc $i flagged: $byId"))
    assert(byId(6L)._1 < byId(0L)._1, "misfiled doc must score below clean docs")
    (7L until 12L).foreach(i => assert(!byId(i)._2, s"srcB doc $i flagged"))
  }

  test("q194: planted conversion gap is significant, equal rates are not") {
    import spark.implicits._
    val arms = (1L to 200L).toDF("user_id").select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def events(gap: Boolean) = (1L to 200L).map { u =>
      // gap: arm 0 buys high (converts at >=200), arm 1 low. Null case:
      // conversion depends only on user parity — arm-independent AND
      // non-degenerate (an all-converted pool has zero variance, which
      // ANSI mode correctly rejects as 0/0)
      val v = if (gap) { if (arms(u) == 0) 250.0 else 50.0 }
      else { if (u % 2 == 0) 250.0 else 50.0 }
      (u, new java.sql.Timestamp(1704067200000L + u * 1000L), u, "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hit = byName("q194_proportion_ztest")
      .run(spark, plantDir("events" -> events(true))).collect().head
    assert(hit.getAs[Boolean]("significant"), s"$hit")
    assert(hit.getAs[Double]("rate_a") == 1.0 && hit.getAs[Double]("rate_b") == 0.0)
    assert(hit.getAs[Long]("conv_a") == hit.getAs[Long]("n_a"))
    val nul = byName("q194_proportion_ztest")
      .run(spark, plantDir("events" -> events(false))).collect().head
    assert(!nul.getAs[Boolean]("significant"), s"equal rates flagged: $nul")
    assert(math.abs(nul.getAs[Double]("z_stat")) < 1.0, s"$nul")
  }

  test("q195: pre-period covariate recovers theta~2 and shrinks the diff toward the planted shift") {
    import spark.implicits._
    val arms = (1L to 200L).toDF("user_id").select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t0 = 1704067200000L
    val tenDays = 10L * 86400 * 1000
    // pre purchase X, post purchase Y = 2X + 5 for arm 0 (the true
    // treatment effect is exactly +5; X varies independently of arm)
    val ev = (1L to 200L).flatMap { u =>
      val x = 10.0 + (u * 7 % 13).toDouble
      val y = 2 * x + (if (arms(u) == 0) 5.0 else 0.0)
      Seq((u * 10, new java.sql.Timestamp(t0), u, "purchase", x, "{}"),
        (u * 10 + 1, new java.sql.Timestamp(t0 + tenDays), u, "purchase", y, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q195_cuped").run(spark, plantDir("events" -> ev))
      .collect().head
    assert(r.getAs[Long]("n_users") == 200)
    val theta = r.getAs[Double]("theta")
    assert(theta > 1.5 && theta < 2.5, s"theta must recover ~2: $r")
    val adj = r.getAs[Double]("diff_cuped")
    assert(math.abs(adj - 5.0) < 1.0, s"CUPED diff must sit near the true +5: $r")
    assert(r.getAs[Double]("var_reduction") > 0.5, s"$r")
  }

  test("q196: star edges predict exactly the missing pair, scored 1/ln(deg)") {
    import spark.implicits._
    // edges (1,2), (1,3): nodes 2 and 3 are NOT adjacent but share
    // neighbor 1 (deg 2) — the single predicted link, score 1/ln 2
    val li = Seq((1L, 2L), (1L, 3L)).zipWithIndex.flatMap { case ((u, v), ei) =>
      (0 until 3).flatMap(o => Seq((ei * 10L + o, u), (ei * 10L + o, v)))
    }.toDF("l_orderkey", "l_suppkey")
    val out = byName("q196_adamic_adar").run(spark, plantDir("lineitem" -> li))
      .collect()
    assert(out.length == 1, s"exactly one predictable pair: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("u") == 2 && r.getAs[Long]("v") == 3)
    assert(r.getAs[Long]("n_common") == 1)
    assert(math.abs(r.getAs[Double]("aa_score") - 1.0 / math.log(2)) < 1e-4)
  }

  test("q197: distinctive-vocabulary probes rank themselves first; scores descend") {
    // probe docs (ids 0-2) use unique vocab; fillers share another
    val docs = Seq(
      (0L, "qq ww ee rr tt qq ww", "srcP"),
      (1L, "aa ss dd ff gg aa ss", "srcP"),
      (2L, "zz xx cc vv bb zz xx", "srcP")) ++
      (3L until 30L).map(i => (i, "one two three four five six", "srcF"))
    val out = byName("q197_qlm_retrieval")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
    val top = out.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("doc_id")).toMap
    assert(top == Map(0L -> 0L, 1L -> 1L, 2L -> 2L),
      s"each probe must retrieve itself first: $top")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("qlm_score") >= b.getAs[Double]("qlm_score"))
      case _ => }
    }
  }

  test("q198: exclusive lang-source pairing maximizes Cramer's V; a product design zeroes it") {
    // dependent: each lang lives in exactly one source
    val dep = for (l <- 0 until 4; i <- 0 until 25) yield
      (l * 100L + i, "x", s"L$l", s"src$l")
    def docsLS(rows: Seq[(Long, String, String, String)]) = {
      import spark.implicits._
      rows.map { case (id, text, lang, src) => (id, text, lang, src, 1L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    val rd = byName("q198_chi2_independence")
      .run(spark, plantDir("documents" -> docsLS(dep))).collect().head
    assert(rd.getAs[Double]("cramers_v") == 1.0, s"$rd")
    assert(rd.getAs[Long]("dof") == 9)
    // independent: every (lang, source) cell equally filled
    val ind = for (l <- 0 until 4; s0 <- 0 until 4; i <- 0 until 5) yield
      ((l * 16 + s0 * 4) * 100L + i, "x", s"L$l", s"src$s0")
    val ri = byName("q198_chi2_independence")
      .run(spark, plantDir("documents" -> docsLS(ind))).collect().head
    assert(ri.getAs[Double]("chi2") == 0.0 && ri.getAs[Double]("cramers_v") == 0.0,
      s"$ri")
  }

  test("q199: a stable transition pattern scores 1.0; a flipped eval pattern scores 0.0") {
    import spark.implicits._
    val t0 = 1704067200000L
    val day = 86400000L
    // train (days 0-6): view->click->purchase cycles for 10 users;
    // eval (days 9-10, past the 70% cut): view->error cycles — the
    // trained view->click argmax is now always wrong
    val ev = (1L to 10L).flatMap { u =>
      val train = (0 until 9).flatMap { c =>
        Seq("view", "click", "purchase").zipWithIndex.map { case (t, i) =>
          (u * 1000 + c * 10 + i, new java.sql.Timestamp(
            t0 + c * 12 * 3600000L + i * 60000L + u * 7), u, t, 1.0, "{}")
        }
      }
      val eval_ = (0 until 3).flatMap { c =>
        Seq("view", "error").zipWithIndex.map { case (t, i) =>
          (u * 1000 + 500 + c * 10 + i, new java.sql.Timestamp(
            t0 + 9 * day + c * 3600000L + i * 60000L + u * 7), u, t, 1.0, "{}")
        }
      }
      train ++ eval_
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q199_markov_eval").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[String]("from_type") ->
        (r.getAs[String]("pred_type"), r.getAs[Double]("accuracy"))).toMap
    // trained argmax for view is click; every eval view is followed by error
    assert(out("view")._1 == "click" && out("view")._2 == 0.0, s"$out")
    // error rows exist in eval only as from-context across cycles
    // (error -> view), never seen in train — so 'error' has no
    // prediction row; purchase never appears as eval FROM context
    assert(!out.contains("purchase"), s"$out")
  }

  test("q200: hard sources gain weight, easy sources lose it, weights sum to 1") {
    // 'easy' docs repeat one bigram (predictable), 'hard' docs are
    // shared diverse text with branching contexts
    val docs = (0L until 10L).map(i => (i, ("a b " * 10).trim, "easy")) ++
      (10L until 20L).map(i =>
        (i, "a x a y a z b x b y b z c x c y c z", "hard"))
    val out = byName("q200_doremi_step")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("token_share"), r.getAs[Double]("excess_nll"),
          r.getAs[Double]("new_weight"))).toMap
    assert(out("easy")._2 < 0 && out("hard")._2 > 0,
      s"excess must split around the corpus mean: $out")
    assert(out("easy")._3 < out("easy")._1, s"easy must lose weight: $out")
    assert(out("hard")._3 > out("hard")._1, s"hard must gain weight: $out")
    val wsum = out.values.map(_._3).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights must normalize: $wsum")
  }

  test("q201: qhat is the 19th of 20 calibration moves; eval coverage counts exceedances exactly") {
    import spark.implicits._
    val t0 = 1704067200000L
    val day = 86400000L
    // user 1: calibration diffs 1..20 (k = ceil(0.9*21) = 19 -> qhat = 19);
    // eval diffs 1..10 (all within) => coverage 1.0
    // user 2: same calibration; eval diffs include 2 of 10 over 19 => 0.8
    def series(u: Long, evalDiffs: Seq[Int]) = {
      val calDiffs = (1 to 20)
      var v = 1000.0
      val cal = calDiffs.zipWithIndex.map { case (dv, i) =>
        v += (if (i % 2 == 0) dv else -dv)
        (u * 1000 + i, new java.sql.Timestamp(t0 + i * 3600000L), u,
          "purchase", v, "{}")
      }
      val ev = evalDiffs.zipWithIndex.map { case (dv, i) =>
        v += (if (i % 2 == 0) dv else -dv)
        (u * 1000 + 500 + i, new java.sql.Timestamp(t0 + 9 * day + i * 3600000L),
          u, "purchase", v, "{}")
      }
      // the first calibration row is the lag seed (its diff is null)
      (u * 1000 + 999, new java.sql.Timestamp(t0 - 3600000L), u, "purchase",
        1000.0, "{}") +: (cal ++ ev)
    }
    val ev = (series(1L, (1 to 10)) ++
      series(2L, Seq(1, 2, 3, 4, 5, 6, 7, 8, 25, 30)))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q201_conformal_persistence")
      .run(spark, plantDir("events" -> ev)).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_cal"), r.getAs[Double]("qhat"),
          r.getAs[Double]("coverage"))).toMap
    assert(out(1L)._1 == 21 || out(1L)._1 == 20, s"$out") // incl. lag seed diff
    assert(out(1L)._3 == 1.0, s"all eval moves within qhat: $out")
    assert(out(2L)._3 == 0.8, s"exactly 2 of 10 exceed qhat: $out")
    assert(out(1L)._2 == out(2L)._2, "identical calibration, identical qhat")
  }

  test("q202: W1 grows with shift magnitude where KS saturates at 1") {
    def corpus(bLen: Int) =
      (0L until 50L).map(i => (i, "x" * 100, "srcA")) ++
        (50L until 100L).map(i => (i, "x" * bLen, "srcB"))
    def w1(bLen: Int) = byName("q202_wasserstein_drift")
      .run(spark, plantDir("documents" -> docsDF(corpus(bLen)))).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("w1_dist")).toMap
    val near = w1(200)
    // disjoint masses 100 apart: |F1-F2| = 1 on [100, 200) => W1 = 100
    assert(near("srcA") == 100.0 && near("srcB") == 100.0, s"$near")
    val far = w1(300)
    assert(far("srcA") == 200.0, s"doubling the shift doubles W1: $far")
  }

  test("q203: all-distinct tokens gini 0; a 99:1 split gini 0.49 exactly") {
    val docs = Seq(
      (0L, (1 to 10).map(i => s"w$i").mkString(" "), "uni"),
      (1L, (("a " * 99) + "b").trim, "conc"))
    val out = byName("q203_token_gini")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("gini")).toMap
    assert(out("uni") == 0.0, s"$out")
    // ascending x = (1, 99): G = 2*(1*1+2*99)/(2*100) - 3/2 = 0.49
    assert(out("conc") == 0.49, s"$out")
  }

  test("q204: fertility recovers chars-per-token and the en-relative ratio") {
    def docsL(rows: Seq[(Long, String, String)]) = {
      import spark.implicits._
      rows.map { case (id, text, lang) =>
        (id, text, lang, "src0", text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    val docs = (0L until 4L).map(i => (i, "aa bb", "en")) ++
      (4L until 8L).map(i => (i, "abcdef", "zh"))
    val out = byName("q204_token_fertility")
      .run(spark, plantDir("documents" -> docsL(docs))).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("chars_per_token"), r.getAs[Double]("rel_to_en"))).toMap
    assert(out("en") == ((2.5, 1.0)), s"$out")
    assert(out("zh") == ((6.0, 2.4)), s"$out")
  }

  test("q205: zero vector and extreme norm flag; healthy vectors pass") {
    val vecs = (0L until 10L).map(i =>
      (i, Array(1.0f, 0.0f, 0.0f), 0)) ++ Seq(
      (10L, Array(0.0f, 0.0f, 0.0f), 1),
      (11L, Array(0.0f, 10.0f, 0.0f), 2))
    val out = byName("q205_embedding_hygiene")
      .run(spark, plantDir("embeddings" -> embDF(vecs))).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("l2_norm"), r.getAs[Boolean]("is_zero"),
          r.getAs[Boolean]("is_outlier"))).toMap
    assert(out(10L)._2 && out(10L)._1 == 0.0, s"$out")
    assert(out(11L)._3, s"norm-10 among norm-1s must flag at 3 sigma: $out")
    (0L until 10L).foreach { i =>
      assert(out(i)._1 == 1.0 && !out(i)._2 && !out(i)._3, s"$i: ${out(i)}")
    }
  }

  test("q206: planted characteristic terms surface with the right sign") {
    val shared = "the of and to in"
    val docs = (0L until 10L).map(i => (i, s"$shared magicword magicword", "src0")) ++
      (10L until 30L).map(i => (i, s"$shared otherword", s"src${1 + i % 3}"))
    val out = byName("q206_keyness_logodds")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Double]("logodds_z")).toMap
    assert(out.contains("magicword") && out("magicword") > 0,
      s"target-characteristic term must have positive z: $out")
    assert(out.contains("otherword") && out("otherword") < 0,
      s"rest-characteristic term must have negative z: $out")
    assert(math.abs(out("magicword")) >= out.values.map(math.abs).max - 1e-9,
      s"magicword is the most characteristic term: $out")
  }

  test("q207: a persistent shift stops at look 1; the null never crosses Pocock") {
    import spark.implicits._
    val arms = (1L to 200L).toDF("user_id").select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def events(shift: Double) = (1L to 200L).flatMap { u =>
      (0 until 20).map { i =>
        val noise = ((u * 31 + i * 7) % 11).toDouble
        (u * 1000 + i, new java.sql.Timestamp(1704067200000L + i * 3600000L), u,
          "purchase", 50.0 + noise + (if (arms(u) == 0) shift else 0.0), "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val hit = byName("q207_sequential_looks")
      .run(spark, plantDir("events" -> events(25.0))).collect()
    assert(hit.length == 5)
    assert(hit.forall(_.getAs[Boolean]("crossed")),
      s"a constant 25-unit shift crosses at every look: ${hit.toSeq}")
    assert(hit.forall(_.getAs[Int]("first_stop") == 1))
    // sample sizes grow monotonically across looks
    val ns = hit.sortBy(_.getAs[Int]("look")).map(_.getAs[Long]("n_a"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a <= b }, s"${ns.toSeq}")
    val nul = byName("q207_sequential_looks")
      .run(spark, plantDir("events" -> events(0.0))).collect()
    assert(nul.forall(!_.getAs[Boolean]("crossed")), s"${nul.toSeq}")
    assert(nul.forall(_.getAs[Int]("first_stop") == 0))
  }

  test("q208: funnel counts respect event order; Wilson bounds bracket the rates") {
    import spark.implicits._
    val t0 = 1704067200000L
    def e(id: Long, u: Long, t: String, offMin: Int) =
      (id, new java.sql.Timestamp(t0 + offMin * 60000L), u, t, 1.0, "{}")
    val rows =
      (1L to 10L).flatMap(u => Seq(e(u * 10, u, "view", 0),
        e(u * 10 + 1, u, "click", 1), e(u * 10 + 2, u, "purchase", 2))) ++
      (11L to 20L).flatMap(u => Seq(e(u * 10, u, "view", 0),
        e(u * 10 + 1, u, "click", 1))) ++
      (21L to 30L).map(u => e(u * 10, u, "view", 0)) ++
      // user 31: purchase and click BEFORE the view — only step 1 counts
      Seq(e(310, 31L, "purchase", 0), e(311, 31L, "click", 1),
        e(312, 31L, "view", 2))
    val r = byName("q208_funnel_wilson")
      .run(spark, plantDir("events" -> rows.toDF(
        "event_id", "ts", "user_id", "event_type", "value", "props")))
      .collect().head
    assert(r.getAs[Long]("n_view") == 31 && r.getAs[Long]("n_click") == 20 &&
      r.getAs[Long]("n_purchase") == 10, s"$r")
    val (rc, lo2, hi2) = (r.getAs[Double]("rate_click"),
      r.getAs[Double]("click_ci_lo"), r.getAs[Double]("click_ci_hi"))
    assert(lo2 < rc && rc < hi2, s"$r")
    val (rp, lo3, hi3) = (r.getAs[Double]("rate_purchase"),
      r.getAs[Double]("purchase_ci_lo"), r.getAs[Double]("purchase_ci_hi"))
    assert(lo3 < rp && rp < hi3 && rp == 0.5, s"$r")
  }

  test("q209: constant values collapse the bootstrap CI to the mean") {
    import spark.implicits._
    val ev = (1L to 200L).map(i =>
      (i, new java.sql.Timestamp(1704067200000L + i * 1000L), i, "purchase",
        42.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q209_bootstrap_ci").run(spark, plantDir("events" -> ev))
      .collect().head
    assert(r.getAs[Double]("mean") == 42.5)
    assert(r.getAs[Double]("ci_lo") == 42.5 && r.getAs[Double]("ci_hi") == 42.5,
      s"every replicate of a constant is the constant: $r")
    assert(r.getAs[Long]("b_replicates") == 50)
  }

  test("q210: MDE halves when the sample quadruples") {
    import spark.implicits._
    def events(reps: Int) = (1L to 100L).flatMap { u =>
      (0 until reps).map { i =>
        val noise = ((u * 31 + i * 7) % 11).toDouble
        (u * 1000 + i, new java.sql.Timestamp(1704067200000L + i * 60000L), u,
          "purchase", 50.0 + noise, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val small = byName("q210_mde_power")
      .run(spark, plantDir("events" -> events(5))).collect().head
    val big = byName("q210_mde_power")
      .run(spark, plantDir("events" -> events(20))).collect().head
    assert(small.getAs[Double]("mde_abs") > 0)
    val ratio = big.getAs[Double]("mde_abs") / small.getAs[Double]("mde_abs")
    assert(ratio > 0.4 && ratio < 0.6, s"4x data should ~halve MDE: $ratio")
    assert(big.getAs[Long]("n_per_arm_5pct") > 0)
    // required n is a property of the variance/mean, not current n
    val nr = big.getAs[Long]("n_per_arm_5pct").toDouble /
      small.getAs[Long]("n_per_arm_5pct").toDouble
    assert(nr > 0.9 && nr < 1.1, s"n-needed stable across sample sizes: $nr")
  }

  test("q211: risk shares count exactly the members of small classes") {
    import spark.implicits._
    // classes of size 1, 4 and 12 over the (segment, nation) grid
    val rows = Seq.fill(1)(("A", 1)) ++ Seq.fill(4)(("B", 2)) ++
      Seq.fill(12)(("C", 3))
    val cust = rows.zipWithIndex.map { case ((seg, nat), i) =>
      (i.toLong, s"c$i", seg, nat.toLong)
    }.toDF("c_custkey", "c_name", "c_mktsegment", "c_nationkey")
    val r = byName("q211_k_anonymity").run(spark, plantDir("customer" -> cust))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 17 && r.getAs[Long]("n_classes") == 3)
    assert(r.getAs[Long]("min_class") == 1)
    assert(math.abs(r.getAs[Double]("risk_k2") - 1.0 / 17) < 1e-6, s"$r")
    assert(math.abs(r.getAs[Double]("risk_k5") - 5.0 / 17) < 1e-6, s"$r")
    assert(math.abs(r.getAs[Double]("risk_k10") - 5.0 / 17) < 1e-6, s"$r")
  }

  test("q212: equal lengths zero every Theil term; the decomposition adds up") {
    val flat = (0L until 40L).map(i => (i, "x" * 100, s"src${i % 4}"))
    val out1 = byName("q212_theil_decomposition")
      .run(spark, plantDir("documents" -> docsDF(flat))).collect()
    out1.foreach { r =>
      assert(r.getAs[Double]("theil_within") == 0.0 &&
        r.getAs[Double]("between_term") == 0.0 &&
        r.getAs[Double]("theil_total") == 0.0, s"$r")
    }
    // two sources, internally uniform but different lengths: inequality
    // lives entirely BETWEEN sources, and the decomposition must add up
    val split = (0L until 20L).map(i => (i, "x" * 100, "srcA")) ++
      (20L until 40L).map(i => (i, "x" * 300, "srcB"))
    val out2 = byName("q212_theil_decomposition")
      .run(spark, plantDir("documents" -> docsDF(split))).collect()
    val total = out2.head.getAs[Double]("theil_total")
    assert(total > 0)
    val recomposed = out2.map { r =>
      assert(r.getAs[Double]("theil_within") == 0.0, s"$r")
      r.getAs[Double]("between_term") +
        r.getAs[Double]("len_share") * r.getAs[Double]("theil_within")
    }.sum
    assert(math.abs(recomposed - total) < 1e-4,
      s"decomposition must reproduce the total: $recomposed vs $total")
  }

  test("q213: constant guessing scores kappa 0 despite 50% raw agreement; perfect guessing scores 1") {
    def docsL(rows: Seq[(Long, String, String)]) = {
      import spark.implicits._
      rows.map { case (id, text, lang) =>
        (id, text, lang, "src0", text.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    }
    // half labeled en, half de — but every text is English markers, so
    // the guesser answers 'en' constantly: po = 0.5 = pe -> kappa = 0
    val const = (0L until 20L).map(i =>
      (i, "the a the a", if (i % 2 == 0) "en" else "de"))
    val r0 = byName("q213_cohens_kappa")
      .run(spark, plantDir("documents" -> docsL(const))).collect().head
    assert(r0.getAs[Double]("p_observed") == 0.5, s"$r0")
    assert(r0.getAs[Double]("kappa") == 0.0,
      s"constant guessing must earn zero kappa: $r0")
    // texts match their labels: po = 1 -> kappa = 1
    val perfect = (0L until 10L).map(i => (i, "the a the", "en")) ++
      (10L until 20L).map(i => (i, "der die und", "de"))
    val r1 = byName("q213_cohens_kappa")
      .run(spark, plantDir("documents" -> docsL(perfect))).collect().head
    assert(r1.getAs[Double]("p_observed") == 1.0 &&
      r1.getAs[Double]("kappa") == 1.0, s"$r1")
  }

  test("q214: separable clusters land in the extreme bins with matching accuracy") {
    val vecs = (0 until 20).map { i =>
      val pos = i < 10
      // positives along +e1, negatives along -e1, slight jitter
      (i.toLong, Array(if (pos) 1.0f else -1.0f, 0.01f * (i % 5), 0.1f),
        if (pos) 7 else 2)
    }
    val out = byName("q214_ece_calibration")
      .run(spark, plantDir("embeddings" -> embDF(vecs))).collect()
    val byBin = out.map(r => r.getAs[Int]("bin") ->
      (r.getAs[Long]("n_points"), r.getAs[Double]("accuracy"),
        r.getAs[Double]("confidence"))).toMap
    assert(byBin.keySet == Set(0, 9), s"separable data fills only the extremes: $byBin")
    assert(byBin(9)._1 == 10 && byBin(9)._2 == 1.0, s"$byBin")
    assert(byBin(0)._1 == 10 && byBin(0)._2 == 0.0, s"$byBin")
    assert(byBin(9)._3 > 0.9 && byBin(0)._3 < 0.1, s"$byBin")
    val ece = out.head.getAs[Double]("ece")
    assert(ece < 0.1, s"well-calibrated extremes keep ECE small: $ece")
  }

  test("q215: identically-ordered rankers score tau 1; pair accounting is exact") {
    // same length, increasing 'join' term frequency: both BM25 and QLM
    // rank purely by tf, so the rankings coincide
    val docs = (0L until 20L).map { i =>
      val tf = (i + 1).toInt
      val text = (Seq.fill(tf)("join") ++ Seq.fill(40 - tf)("filler"))
        .mkString(" ")
      (i, text, "src0")
    }
    val r = byName("q215_ranker_agreement")
      .run(spark, plantDir("documents" -> docsDF(docs))).collect().head
    val m = r.getAs[Long]("n_common")
    assert(m == 20, s"$r")
    assert(r.getAs[Long]("n_pairs") == m * (m - 1) / 2, s"$r")
    assert(r.getAs[Long]("discordant") == 0 &&
      r.getAs[Double]("kendall_tau") == 1.0, s"$r")
    // driver data: tau well-defined and bounded, accounting consistent
    val d = byName("q215_ranker_agreement").run(spark, sf("0.01"))
      .collect().head
    assert(d.getAs[Long]("concordant") + d.getAs[Long]("discordant") ==
      d.getAs[Long]("n_pairs"), s"$d")
    val tau = d.getAs[Double]("kendall_tau")
    assert(tau >= -1.0 && tau <= 1.0, s"$d")
  }

  test("q190: one drifted source is BH-significant at rank 1; identical sources are not") {
    // 19 sources share one length distribution; srcDRIFT's lengths are
    // disjoint — D = 1 against the pooled rest, p ~ 0
    val same = for (s <- 0 until 19; i <- 0 until 50) yield
      (s * 1000L + i, "x" * (100 + (i % 10)), s"src$s")
    val drift = (0 until 50).map(i => (90000L + i, "x" * (900 + (i % 10)), "srcDRIFT"))
    val out = byName("q190_fdr_drift")
      .run(spark, plantDir("documents" -> docsDF(same ++ drift))).collect()
    assert(out.length == 20)
    val top = out.find(_.getAs[Long]("rank") == 1L).get
    assert(top.getAs[String]("source") == "srcDRIFT")
    assert(top.getAs[Boolean]("bh_significant"))
    assert(top.getAs[Double]("ks_stat") > 0.9)
    out.filter(_.getAs[String]("source") != "srcDRIFT").foreach { r =>
      assert(!r.getAs[Boolean]("bh_significant"),
        s"undrifted source must survive BH: $r")
      // p-values monotone in rank by construction of the step-up order
      assert(r.getAs[Double]("p_value") >= top.getAs[Double]("p_value"))
    }
  }
}
