package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for the q250 blocking-quality audit, the q251
  * character-class mix and the q252 truncated Brandes betweenness.
  */
class BlockingCharBetweennessSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bcb").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q250: one blocked match, one unblocked match -> PC 0.5, RR 0.9") {
    import spark.implicits._
    // A-B match AND share a first token (found); D-E match but share
    // no block key (missed); C matches nothing
    val part = Seq("aaaa bb", "aaaa bc", "zzzz yy", "pq rs", "pqx rsx")
      .map(n => (n, 1L)).toDF("p_name", "p_partkey")
    val r = byName("q250_blocking_quality")
      .run(spark, plantDir("part" -> part)).head()
    assert(r.getAs[Long]("n_names") == 5L)
    assert(r.getAs[Long]("total_pairs") == 10L)
    assert(r.getAs[Long]("n_candidates") == 1L)
    assert(r.getAs[Long]("n_true") == 2L, s"A-B and D-E are matches: $r")
    assert(r.getAs[Long]("n_found") == 1L)
    assert(math.abs(r.getAs[Double]("pairs_completeness") - 0.5) < 1e-5)
    assert(math.abs(r.getAs[Double]("pairs_quality") - 1.0) < 1e-5)
    assert(math.abs(r.getAs[Double]("reduction_ratio") - 0.9) < 1e-5)
  }

  test("q251: 'ab1 cd!' decomposes exactly; accents count as non-ASCII") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab1 cd!", "en", "web", 7L),
      (2L, "héllo", "fr", "acc", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q251_charclass_mix")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val w = rows("web")
    assert(w.getAs[Long]("n_chars") == 7L)
    assert(math.abs(w.getAs[Double]("letter_share") - 4.0 / 7) < 1e-5)
    assert(math.abs(w.getAs[Double]("digit_share") - 1.0 / 7) < 1e-5)
    assert(math.abs(w.getAs[Double]("space_share") - 1.0 / 7) < 1e-5)
    assert(math.abs(w.getAs[Double]("punct_other_share") - 1.0 / 7) < 1e-5)
    assert(w.getAs[Long]("nonascii_chars") == 0L)
    assert(rows("acc").getAs[Long]("nonascii_chars") == 1L)
  }

  test("q252: path graph 1-2-3 puts betweenness 2 on the middle node") {
    import spark.implicits._
    // backbone needs >= 3 shared orders per edge; no 1-3 order exists
    val li = (for {
      (o, pair) <- Seq(101L -> (1L, 2L), 102L -> (1L, 2L), 103L -> (1L, 2L),
        104L -> (2L, 3L), 105L -> (2L, 3L), 106L -> (2L, 3L))
      sk <- Seq(pair._1, pair._2)
    } yield (o, sk)).toDF("l_orderkey", "l_suppkey")
    val rows = byName("q252_betweenness")
      .run(spark, plantDir("lineitem" -> li)).collect()
    // seed 1: delta(2) = 1 (path to 3); seed 3: delta(2) = 1; seed 2: none
    assert(rows.length == 1, s"only the middle node brokers: ${rows.toSeq}")
    assert(rows.head.getAs[Long]("node") == 2L)
    assert(math.abs(rows.head.getAs[Double]("betweenness") - 2.0) < 1e-5)
  }
}
