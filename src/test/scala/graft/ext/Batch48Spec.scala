package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 51: q363 DFA, q364 DiD,
  * q365 pinball loss, q366 ARI/LIX.
  */
class Batch48Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b48").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def ev(u: Long, dd: Long, t: String = "view") = {
    id += 1; (id, new java.sql.Timestamp(base + dd * dayMs + 1000L), u, t, 1.0, "{}")
  }
  private def evV(dd: Long, v: Double) = {
    id += 1; (id, new java.sql.Timestamp(base + dd * dayMs + 1000L), 1L, "view", v, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q363: a constant series has zero fluctuation at every scale and NULL alpha") {
    val rows = (0L until 32L).flatMap(d => Seq(ev(1, d), ev(2, d)))
    val r = byName("q363_dfa").run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days") == 32L)
    assert(r.getAs[Long]("nseg4") == 8L)
    assert(r.getAs[Double]("f4") == 0.0 && r.getAs[Double]("f16") == 0.0)
    assert(r.isNullAt(r.fieldIndex("dfa_alpha")))
  }

  test("q363: a ramp series matches the formula replicated in Scala") {
    // y_d = d+1 over 32 days
    val rows = (0L until 32L).flatMap(d => (0L to d).map(_ => ev(1, d)))
    val r = byName("q363_dfa").run(spark, plantDir("events" -> toEvents(rows))).head()
    // replicate: N=32, S=528, z_t = (sum_{u<=t} (N*y_u) - (t+1)*S) div N
    val n = 32L; val s = (1L to 32L).sum
    val y = (1L to 32L).toArray
    var cum = 0L
    val z = y.map { yi => cum += n * yi - s; cum / n }
    def fOf(w: Int): Double = {
      val segs = z.grouped(w).filter(_.length == w).toArray
      val sxx = w.toLong * (w.toLong * w - 1) / 12
      val rp = segs.map { zs =>
        val sz = zs.sum
        val szz = zs.map(v => BigInt(v) * v).sum
        val sxz = zs.zipWithIndex.map { case (v, i) => BigInt(i) * v }.sum
        BigInt(4) * sxx * (BigInt(w) * szz - BigInt(sz) * sz) -
          BigInt(w) * (2 * sxz - BigInt(w - 1) * sz) * (2 * sxz - BigInt(w - 1) * sz)
      }.sum
      math.sqrt(rp.toDouble / (4.0 * sxx * w * w * segs.length))
    }
    assert(math.abs(r.getAs[Double]("f4") - fOf(4)) < 1e-3)
    assert(math.abs(r.getAs[Double]("f16") - fOf(16)) < 1e-3)
    val alpha = (math.log(fOf(16)) - math.log(fOf(4))) / (2 * math.log(2))
    assert(math.abs(r.getAs[Double]("dfa_alpha") - alpha) < 1e-3)
  }

  /** Test-side twin of Dedup.h60 for picking fixture arms. */
  private def arm(uid: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab|$uid".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (BigInt(hex.substring(0, 15), 16) % 2).toInt
  }

  test("q364: planted 2x2 cells pin DiD = 2.5") {
    val ids = (1L to 200L).toList
    val a0 = ids.filter(arm(_) == 0).take(2)
    val a1 = ids.filter(arm(_) == 1).take(2)
    // days 0..3, mid = 2. arm0: flat 1/day except a2 day1+day3 get 2
    // arm1: pre 1/day; post 3/day except a1(1) day3 gets 5
    def burst(u: Long, dd: Long, k: Int) = (1 to k).map(_ => ev(u, dd))
    val rows =
      a0.flatMap(u => (0L to 3L).flatMap(d => burst(u, d, 1))) ++
        burst(a0(1), 1, 1) ++ burst(a0(1), 3, 1) ++ // a0(1): day1=2, day3=2
        a1.flatMap(u => (0L to 1L).flatMap(d => burst(u, d, 1))) ++
        a1.flatMap(u => (2L to 3L).flatMap(d => burst(u, d, 3))) ++
        burst(a1(0), 3, 2) // a1(0) day3 = 5
    val r = byName("q364_did").run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n00") == 4L && r.getAs[Long]("n11") == 4L)
    assert(r.getAs[Double]("m00") == 1.25 && r.getAs[Double]("m01") == 1.25)
    assert(r.getAs[Double]("m10") == 1.0 && r.getAs[Double]("m11") == 3.5)
    assert(r.getAs[Double]("did") == 2.5)
    assert(r.getAs[Double]("se") > 0.0)
  }

  test("q365: three planted days pin pinball 0.75 / 1.4") {
    val rows = Seq(evV(0, 1.0), evV(0, 2.0), evV(0, 3.0),
      evV(1, 2.0), evV(1, 2.0), evV(1, 2.0), evV(2, 5.0))
    val r = byName("q365_pinball").run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days_scored") == 2L)
    // day1: med 2->2 (0), p90 3->2 (|d|=1); day2: med 2->5 (3), p90 2->5 (9*3)
    assert(r.getAs[Double]("pinball_p50") == 0.75)
    assert(r.getAs[Double]("pinball_p90") == 1.4)
  }

  test("q366: a hand doc pins ARI/LIX; long-word monsters read hard") {
    import spark.implicits._
    val d = Seq(
      (1L, "abcdefg abc de.", "en", "a", 15L),
      (2L, (1 to 10).map(_ => "extralongword").mkString(" ") + ".", "zh", "a", 140L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q366_ari_lix").run(spark, plantDir("documents" -> d))
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    val en = rows("en")
    val expAri = 4.71 * (13.0 / 3) + 0.5 * 3.0 - 21.43
    val expLix = 3.0 + 100.0 * (1.0 / 3)
    assert(math.abs(en.getAs[Double]("avg_ari") - expAri) < 1e-3)
    assert(math.abs(en.getAs[Double]("avg_lix") - expLix) < 1e-3)
    assert(en.getAs[Double]("hard_share") == 0.0)
    val zh = rows("zh")
    assert(zh.getAs[Double]("avg_lix") > 100.0) // 10 + 100
    assert(zh.getAs[Double]("hard_share") == 1.0)
  }
}
