package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 50: q359 participation ratio,
  * q360 temperature mix, q361 SPRT, q362 vocabulary overlap.
  */
class Batch47Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b47").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def vec(assign: (Int, Float)*): Array[Float] = {
    val v = new Array[Float](64)
    assign.foreach { case (i, x) => v(i) = x }
    v
  }

  test("q359: a 1-D line reads PR=1; an isotropic 2-D cross reads PR=2") {
    import spark.implicits._
    val line = Seq(
      (0L, vec(0 -> 1f), 0), (1L, vec(0 -> -1f), 0),
      (2L, vec(0 -> 1f), 0), (3L, vec(0 -> -1f), 0))
      .toDF("vec_id", "embedding", "label")
    val r1 = byName("q359_effective_rank")
      .run(spark, plantDir("embeddings" -> line)).head()
    assert(r1.getAs[Long]("n_vectors") == 4L)
    assert(r1.getAs[Double]("participation_ratio") == 1.0)

    val cross = Seq(
      (0L, vec(0 -> 1f), 0), (1L, vec(0 -> -1f), 0),
      (2L, vec(1 -> 1f), 0), (3L, vec(1 -> -1f), 0))
      .toDF("vec_id", "embedding", "label")
    val r2 = byName("q359_effective_rank")
      .run(spark, plantDir("embeddings" -> cross)).head()
    assert(r2.getAs[Double]("participation_ratio") == 2.0)
    assert(math.abs(r2.getAs[Double]("pr_fraction") - 2.0 / 64) < 1e-6)
  }

  test("q360: an even split is exactly uniform; temperature upweights the minority") {
    import spark.implicits._
    def docs(rows: (Long, String)*) =
      rows.map { case (id, src) => (id, "text", "en", src, 4L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val even = byName("q360_temperature_mix")
      .run(spark, plantDir("documents" -> docs((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(even("a").getAs[Double]("w03") == 0.5)
    assert(even("a").getAs[Double]("up07") == 1.0)

    val skew = byName("q360_temperature_mix")
      .run(spark, plantDir("documents" ->
        docs((1L, "a"), (2L, "b"), (3L, "b"), (4L, "b"))))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = skew("a")
    assert(a.getAs[Double]("share") == 0.25)
    // α < 1 pulls the minority toward uniform: 0.25 < w07 < w03 < 0.5
    assert(a.getAs[Double]("w07") > 0.25 && a.getAs[Double]("w03") > a.getAs[Double]("w07"))
    assert(a.getAs[Double]("w03") < 0.5)
    assert(skew("b").getAs[Double]("up03") < 1.0) // majority downweighted
  }

  /** Test-side twin of Dedup.h60 for picking fixture arms. */
  private def arm(uid: Long): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"ab|$uid".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (BigInt(hex.substring(0, 15), 16) % 2).toInt
  }

  test("q361: planted arms pin the closed-form cumulative LLR day by day") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    val day = 86400000L
    val ids = (1L to 200L).toList
    val arm0 = ids.filter(arm(_) == 0).take(2)
    val arm1 = ids.filter(arm(_) == 1).take(3)
    var id = 0L
    def ev(u: Long, dd: Long, t: String) = { id += 1; (id, new Timestamp(base + dd * day + 1000L), u, t, 1.0, "{}") }
    // arm0 day1: one purchase, one click -> p0 = 1/2
    // arm1 day1: 1 purchase of 3 trials; day2: 1 failure more
    val rows = Seq(
      ev(arm0(0), 1, "purchase"), ev(arm0(1), 1, "click"),
      ev(arm1(0), 1, "purchase"), ev(arm1(1), 1, "click"), ev(arm1(2), 1, "click"),
      ev(arm1(0), 2, "click"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q361_sprt").run(spark, plantDir("events" -> rows)).collect()
    assert(out.length == 2)
    def llr(cs: Long, cf: Long): Double =
      cs * math.log(1.1) + cf * math.log((1.0 - 1.1 * 0.5) / 0.5)
    val d1 = out(0)
    assert(d1.getAs[Long]("n_trials") == 3L && d1.getAs[Long]("n_success") == 1L)
    assert(math.abs(d1.getAs[Double]("cum_llr") - llr(1, 2)) < 1e-5)
    assert(d1.getAs[String]("state") == "continue")
    val d2 = out(1)
    assert(d2.getAs[Long]("n_trials") == 1L && d2.getAs[Long]("n_success") == 0L)
    assert(math.abs(d2.getAs[Double]("cum_llr") - llr(1, 3)) < 1e-5)
  }

  test("q362: shared and disjoint vocabularies pin overlap/dice/jaccard") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y z", "en", "a", 5L),
      (2L, "x y q", "en", "b", 5L),
      (3L, "zz", "en", "c", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q362_vocab_overlap").run(spark, plantDir("documents" -> d)).collect()
    assert(rows.length == 1) // zero-overlap pairs (a,c)/(b,c) omitted
    val r = rows.head
    assert(r.getAs[String]("sa") == "a" && r.getAs[String]("sb") == "b")
    assert(r.getAs[Long]("n_common") == 2L)
    assert(r.getAs[Double]("overlap_coef") == 0.6667)
    assert(r.getAs[Double]("dice") == 0.6667)
    assert(r.getAs[Double]("jaccard") == 0.5)
  }
}
