package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 24: q271 cohort retention, q272
  * mutual information, q273 CMH, q274 McNemar, q275 Gumbel EVT.
  * Expected values hand-derived.
  */
class CohortsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_coh").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val weekUs = 604800000000L

  test("q271: half the cohort returns in week 1, none later") {
    import spark.implicits._
    import java.sql.Timestamp
    // two users start in epoch-week w; only u1 is active in w+1
    val w0 = 2800L * weekUs / 1000L // ms, aligned inside week 2800
    val ev = Seq(
      (1L, new Timestamp(w0), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(w0 + 60000L), 2L, "view", 1.0, "{}"),
      (3L, new Timestamp(w0 + weekUs / 1000L), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q271_cohort_retention").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("wk_offset") -> r).toMap
    assert(rows(0L).getAs[Long]("n_cohort") == 2L)
    assert(rows(0L).getAs[Long]("n_active") == 2L)
    assert(math.abs(rows(0L).getAs[Double]("retention") - 1.0) < 1e-9)
    assert(rows(1L).getAs[Long]("n_active") == 1L)
    assert(math.abs(rows(1L).getAs[Double]("retention") - 0.5) < 1e-9)
    assert(!rows.contains(2L))
  }

  test("q272: perfectly dependent and independent grids pin NMI 1 and MI 0") {
    import spark.implicits._
    // lang determines source exactly: MI = H(lang) = H(source) = ln 2
    val dep = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "a", 1L),
      (3L, "t", "fr", "b", 1L), (4L, "t", "fr", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r1 = byName("q272_mutual_info").run(spark, plantDir("documents" -> dep)).head()
    assert(math.abs(r1.getAs[Double]("mi_nats") - math.log(2.0)) < 1e-4)
    assert(math.abs(r1.getAs[Double]("nmi") - 1.0) < 1e-4)
    // independent: every (lang, source) cell equal -> MI 0
    val ind = Seq(
      (1L, "t", "en", "a", 1L), (2L, "t", "en", "b", 1L),
      (3L, "t", "fr", "a", 1L), (4L, "t", "fr", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r2 = byName("q272_mutual_info").run(spark, plantDir("documents" -> ind)).head()
    assert(math.abs(r2.getAs[Double]("mi_nats")) < 1e-4)
  }

  test("q273: a planted single-stratum 2x2 table matches the hand CMH") {
    import spark.implicits._
    import java.sql.Timestamp
    // Build users whose md5 arm we can read back via the same h60
    // primitive, then give arm0 high values and arm1 low values in one
    // event_type -> strong association.
    import org.apache.spark.sql.functions._
    val uids = (1L to 40L).toDF("user_id")
      .select(col("user_id"),
        (Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 1704067200000L
    // arm0 -> success except its FIRST user; arm1 -> failure except its
    // FIRST user, so every 2x2 cell is non-empty (pooled OR defined)
    val firstByArm = uids.toSeq.sortBy(_._1).groupBy(_._2)
      .map { case (arm, us) => arm -> us.head._1 }
    val ev = uids.toSeq.sortBy(_._1).zipWithIndex.map { case ((u, arm), i) =>
      val success = if (arm == 0L) u != firstByArm(0L) else u == firstByArm(1L)
      (i.toLong, new Timestamp(base + i * 1000L), u, "view",
        if (success) 150.0 else 50.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val n0 = uids.values.count(_ == 0L).toLong
    val n1 = uids.values.count(_ == 1L).toLong
    val (a, b, c, dd) = (n0 - 1, 1L, 1L, n1 - 1)
    val n = n0 + n1
    val r = byName("q273_cmh").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_strata") == 1L)
    val num = a - (a + b).toDouble * (a + c) / n
    val vr = ((a + b).toDouble * (c + dd) * (a + c) * (b + dd)) /
      (n.toDouble * n * (n - 1))
    val chi = math.pow(math.max(math.abs(num) - 0.5, 0.0), 2) / vr
    val or = (a.toDouble * dd / n) / (b.toDouble * c / n)
    assert(math.abs(r.getAs[Double]("cmh_chi2") - chi) < 1e-2)
    assert(math.abs(r.getAs[Double]("pooled_or") - or) < 1e-2)
    assert(r.getAs[Boolean]("significant"))
  }

  test("q274: planted separable vocab makes NB beat the prior baseline") {
    import spark.implicits._
    // train: a is the majority class (3 docs), b has 2; baseline
    // predicts a always. NB separates x/z perfectly.
    val docs = Seq(
      (1L, "x x", "en", "a", 3L), (2L, "x y", "en", "a", 3L),
      (3L, "x x", "en", "a", 3L),
      (4L, "z z", "en", "b", 3L), (5L, "z w", "en", "b", 3L),
      (7L, "x x", "en", "a", 3L), (8L, "z z", "en", "b", 3L),
      (9L, "z w", "en", "b", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = byName("q274_mcnemar").run(spark, plantDir("documents" -> docs)).head()
    assert(r.getAs[Long]("n_eval") == 3L)
    assert(r.getAs[Long]("nb_correct") == 3L)
    assert(r.getAs[Long]("base_correct") == 1L) // only doc 7 is class a
    assert(r.getAs[Long]("b_disc") == 2L)
    assert(r.getAs[Long]("c_disc") == 0L)
    // chi = (|2-0|-1)^2 / 2 = 0.5
    assert(math.abs(r.getAs[Double]("mcnemar_stat") - 0.5) < 1e-9)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("q275: constant block maxima leave zero variance -> filtered; two-level pins moments") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    // 12 hourly blocks alternating max 100 / 200 -> mean 150,
    // var = 12*2500/11, sigma = sd*sqrt(6)/pi
    val ev = (0 until 12).flatMap { h =>
      val mx = if (h % 2 == 0) 100.0 else 200.0
      Seq((h * 2L, new Timestamp(base + h * 3600000L), 1L, "view", mx, "{}"),
        (h * 2L + 1L, new Timestamp(base + h * 3600000L + 1000L), 1L, "view", 10.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q275_gumbel_evt").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_blocks") == 12L)
    assert(math.abs(r.getAs[Double]("mean_block_max") - 150.0) < 1e-9)
    val sd = math.sqrt(12.0 * 2500.0 / 11.0)
    val sigma = sd * math.sqrt(6.0) / math.Pi
    val mu = 150.0 - 0.5772156649015329 * sigma
    val rl = mu - sigma * -4.600149226776579
    assert(math.abs(r.getAs[Double]("gumbel_sigma") - sigma) < 1e-3)
    assert(math.abs(r.getAs[Double]("return_level_100") - rl) < 1e-2)
  }
}
