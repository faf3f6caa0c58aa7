package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 29: q292 Markov stationary, q293
  * quantile normalization, q294 TextRank.
  */
class IterativeSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_it").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q292: chain A->(A|B), B->A converges to the 2/3, 1/3 stationary point") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    // one user, path A A B A: transitions A->A, A->B, B->A
    val ev = Seq(("A", 0L), ("A", 1L), ("B", 2L), ("A", 3L)).zipWithIndex.map {
      case ((t, off), i) => (i.toLong + 1, new Timestamp(base + off * 1000L), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q292_markov_stationary").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows.keySet == Set("A", "B"))
    assert(math.abs(rows("A").getAs[Double]("stationary_p") - 2.0 / 3) < 2e-3)
    assert(math.abs(rows("B").getAs[Double]("stationary_p") - 1.0 / 3) < 2e-3)
    val mass = rows.values.map(_.getAs[Long]("ppb")).sum
    assert(math.abs(mass - 1000000000L) < 100L) // integer rounding only
  }

  test("q293: disjoint 1-10 vs 11-20 sources pin the decile shifts at -q and 10-q") {
    import spark.implicits._
    val docs = ((1 to 10).map(v => (v.toLong, "t", "en", "a", v.toLong)) ++
      (11 to 20).map(v => (v.toLong + 100, "t", "en", "b", v.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q293_quantile_normalize").run(spark, plantDir("documents" -> docs))
      .collect()
    assert(rows.length == 18)
    rows.foreach { r =>
      val (src, q) = (r.getAs[String]("source"), r.getAs[Long]("decile"))
      val (sv, pv) = (r.getAs[Long]("src_value"), r.getAs[Long]("pooled_value"))
      assert(pv == 2 * q) // pooled 1..20: ceil-rank 2q
      if (src == "a") { assert(sv == q); assert(r.getAs[Long]("shift") == -q) }
      else { assert(sv == 10 + q); assert(r.getAs[Long]("shift") == 10 - q) }
    }
  }

  test("q294: the hub token of 'x y x y x z' outranks its neighbors") {
    import spark.implicits._
    val docs = Seq((1L, "x y x y x z", "en", "a", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q294_textrank").run(spark, plantDir("documents" -> docs)).collect()
    assert(rows.map(_.getAs[String]("keyword")).toSeq == Seq("x", "y", "z"))
    val ranks = rows.map(_.getAs[Long]("rank_ppb"))
    assert(ranks(0) > ranks(1) && ranks(1) > ranks(2))
    assert(ranks(0) > 400000000L) // x is the hub: well above uniform 1/3
    // damped mass stays ~1e9 (teleport + rounded redistribution)
    assert(math.abs(ranks.sum - 1000000000L) < 1000000L)
  }
}
