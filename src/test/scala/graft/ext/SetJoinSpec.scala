package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-fixture pins for q435 (prefix-filtered exact Jaccard join)
  * and q436 (sparse TF-IDF top-k cosine), plus the property that makes
  * q435 trustworthy at any scale: its prefix-filtered result equals
  * the brute-force all-pairs join on a corpus the filter actually
  * prunes (the completeness guarantee the oracle checks at sf0.01,
  * re-proven here on adversarial overlap structure).
  */
class SetJoinSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_setjoin").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def doc(id: Long, text: String) =
    (id, text, "en", "s", text.length.toLong)

  test("q435: shared 4-of-6 shingles pass tau=0.6; disjoint doc absent") {
    import spark.implicits._
    // A,B: 7 tokens -> 5 shingles each, 4 shared => J = 4/6 = 0.6667
    val d = Seq(
      doc(1L, "t1 t2 t3 t4 t5 t6 t7"),
      doc(2L, "t1 t2 t3 t4 t5 t6 t8"),
      doc(3L, "u1 u2 u3 u4 u5"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q435_prefix_filter_join").run(spark, plantDir("documents" -> d)).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Long]("n_inter") == 4L)
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Double]("jaccard") == 0.6667)
  }

  test("q435: below-threshold overlap (3 of 7) is excluded by the exact integer test") {
    import spark.implicits._
    // 8 tokens -> 6 shingles each, 3 shared => J = 3/9 = 1/3 < 0.6
    val d = Seq(
      doc(1L, "t1 t2 t3 t4 t5 a1 a2 a3"),
      doc(2L, "t1 t2 t3 t4 t5 b1 b2 b3"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q435_prefix_filter_join").run(spark, plantDir("documents" -> d)).collect()
    assert(rows.isEmpty)
  }

  test("q435 completeness: prefix-filtered result equals brute force on 30 overlapping docs") {
    import spark.implicits._
    // Sliding windows over a shared token stream: doc i covers tokens
    // i..i+11, so adjacent docs overlap 11/13-ish and far docs are
    // disjoint — a corpus where the prefix filter genuinely prunes.
    val docs = (0 until 30).map { i =>
      doc(i.toLong, (i until i + 12).map(j => s"w${j / 3}x${j % 7}").mkString(" "))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = plantDir("documents" -> docs)
    val got = byName("q435_prefix_filter_join").run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // brute force with the same primitives: every id pair, exact Jaccard
    val hashed = Dedup.docShingles(spark.read.parquet(s"$dir/documents.parquet"))
      .select(col("doc_id"), Dedup.hp(col("sh")).as("sh")).distinct()
    val ids = hashed.select(col("doc_id")).distinct()
    val allPairs = ids.select(col("doc_id").as("doc_a"))
      .crossJoin(ids.select(col("doc_id").as("doc_b")))
      .filter(col("doc_a") < col("doc_b"))
    val brute = Dedup.jaccard(allPairs, hashed)
      .filter(col("n_inter") * 5 >= (col("n_a") + col("n_b") - col("n_inter")) * 3)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(brute.nonEmpty, "fixture must contain qualifying pairs")
    assert(got == brute)
  }

  test("q435: verbatim replicas collapse away — output is replication-invariant") {
    import spark.implicits._
    val base = Seq(
      doc(1L, "t1 t2 t3 t4 t5 t6 t7"),
      doc(2L, "t1 t2 t3 t4 t5 t6 t8"),
      doc(3L, "u1 u2 u3 u4 u5"))
    // 3 verbatim copies of every doc at shifted ids (the ScaleUp shape)
    val replicated = (0 until 3).flatMap(i =>
      base.map { case (id, t, l, s0, n) => (id + i * 100L, t, l, s0, n) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q435_prefix_filter_join").run(spark, plantDir("documents" -> replicated)).collect()
    // identical to the unreplicated fixture: one pair, min-id representatives
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("doc_a") == 1L && rows.head.getAs[Long]("doc_b") == 2L)
    assert(rows.head.getAs[Long]("n_inter") == 4L)
  }

  test("q436: proportional mid-frequency docs pin cosine 1.0; df=1 fillers drop out") {
    import spark.implicits._
    // 20 distinct texts => vocab keeps df = 2 (10*df <= 20). Docs 1,2
    // share alpha/beta with PROPORTIONAL tf (1x vs 2x -> cosine exactly
    // 1.0 without being exact duplicates, which rep-collapse would
    // merge); every other doc has unique df=1 fillers.
    val docs = (Seq(
      doc(1L, "alpha beta"),
      doc(2L, "alpha beta alpha beta")) ++
      (3 to 20).map(i => doc(i.toLong, s"f${i}a f${i}b f${i}c")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q436_sparse_topk_cosine").run(spark, plantDir("documents" -> docs)).collect()
    assert(rows.length == 2)
    val r1 = rows.head
    assert(r1.getAs[Long]("doc_id") == 1L && r1.getAs[Long]("neighbor") == 2L)
    assert(r1.getAs[Int]("rk") == 1)
    assert(r1.getAs[Double]("cosine") == 1.0)
    val r2 = rows(1)
    assert(r2.getAs[Long]("doc_id") == 2L && r2.getAs[Long]("neighbor") == 1L)
    assert(r2.getAs[Double]("cosine") == 1.0)
  }

  test("q436: rank order follows shared-weight mass and caps at 3 neighbors") {
    import spark.implicits._
    // 60 distinct texts (so the df cap N/10 = 6 keeps p/q/r). Probe
    // doc 1 = "p q r". Doc 2 is the proportional double (cosine 1.0,
    // distinct text so rep-collapse keeps it); doc 3 shares p,q; doc 4
    // shares p; doc 5 shares p (tie with 4 -> id order breaks it).
    // p: df=5, q: df=3, r: df=2.
    val docs = (Seq(
      doc(1L, "p q r"),
      doc(2L, "p q r p q r"),
      doc(3L, "p q zz3"),
      doc(4L, "p zz4a zz4b"),
      doc(5L, "p zz5a zz5b")) ++
      (6 to 60).map(i => doc(i.toLong, s"f${i}a f${i}b f${i}c")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q436_sparse_topk_cosine").run(spark, plantDir("documents" -> docs)).collect()
    val mine = rows.filter(_.getAs[Long]("doc_id") == 1L)
      .map(r => (r.getAs[Int]("rk"), r.getAs[Long]("neighbor")))
    assert(mine.toSeq == Seq((1, 2L), (2, 3L), (3, 4L)), s"got ${mine.toSeq}")
    // doc 5 exists in scored pairs but rank 4 is cut by the top-3 cap
    assert(!rows.exists(r => r.getAs[Long]("doc_id") == 1L && r.getAs[Long]("neighbor") == 5L))
  }
}
