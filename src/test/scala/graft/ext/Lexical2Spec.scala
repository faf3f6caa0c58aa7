package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 49: q356 MSTTR, q357 Coleman–Liau,
  * q358 Mood's median test.
  */
class Lexical2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lx2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def docs(rows: (Long, String, String, String)*) = {
    import spark.implicits._
    rows.map { case (id, text, lang, src) => (id, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q356: all-distinct segment reads TTR 1; 5-type segment reads 0.2; stubs drop") {
    val allDistinct = (1 to 25).map("w" + _).mkString(" ")        // TTR 1.0
    val repeats = (1 to 25).map(i => "t" + (i % 5)).mkString(" ") // 5 types
    val d = docs(
      (1L, allDistinct + " " + repeats, "en", "a"), // 2 full segments
      (2L, "short text only", "en", "a"),           // no full segment
      (3L, allDistinct, "fr", "b"))
    val rows = byName("q356_msttr").run(spark, plantDir("documents" -> d)).collect()
    val m = rows.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_segments"), r.getAs[Double]("msttr"))).toMap
    assert(m("en") == ((2L, 0.6)))  // (25 + 5) / 50
    assert(m("fr") == ((1L, 1.0)))
  }

  test("q357: a 4-letter-per-word doc pins the CLI closed form") {
    // 25 words x 4 letters, 1 sentence run: L = 400, S = 4
    val text = (1 to 25).map(_ => "abcd").mkString(" ") + "."
    val d = docs((1L, text, "en", "a"))
    val r = byName("q357_coleman_liau").run(spark, plantDir("documents" -> d)).head()
    val expected = 0.0588 * 400.0 - 0.296 * 4.0 - 15.8
    assert(math.abs(r.getAs[Double]("avg_cli") - expected) < 1e-3)
    assert(r.getAs[Long]("n_docs") == 1L)
  }

  test("q358: disjoint length blocks maximize the median chi-square") {
    // source a: lengths 10,11,12,13; source b: 20,21,22,23 -> global
    // lower median 13 (excluded); a has 3 below 0 above, b has 4 above
    val d = docs(
      (1L, "x" * 10, "en", "a"), (2L, "x" * 11, "en", "a"),
      (3L, "x" * 12, "en", "a"), (4L, "x" * 13, "en", "a"),
      (5L, "x" * 20, "en", "b"), (6L, "x" * 21, "en", "b"),
      (7L, "x" * 22, "en", "b"), (8L, "x" * 23, "en", "b"))
    val r = byName("q358_mood_median").run(spark, plantDir("documents" -> d)).head()
    assert(r.getAs[Long]("k_sources") == 2L)
    // 2x2 table (3,0 / 0,4): chi2 = N * (ad-bc)^2 / (r1 r2 c1 c2) = 7
    assert(math.abs(r.getAs[Double]("chi2_stat") - 7.0) < 1e-3)
  }
}
