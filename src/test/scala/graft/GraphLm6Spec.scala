package graft

import org.apache.spark.sql.functions._

/** Property pins for the clustering-coefficient (q238), HITS (q239)
  * and Stupid-Backoff (q240) batch. */
class GraphLm6Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gl6").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  /** lineitem rows realizing the given co-purchase edges: each edge =
    * 3 shared orders (clears the backbone's >= 3 threshold). */
  private def coPurchase(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case ((u, v), ei) =>
      (0 until 3).flatMap(o => Seq((ei * 10L + o, u, 1L), (ei * 10L + o, v, 1L)))
    }.toDF("l_orderkey", "l_suppkey", "l_partkey")
  }

  test("q238: triangle nodes score exactly; pendant node is excluded") {
    // triangle {1,2,3} plus pendant 4 on node 1:
    // C(1) = 2/(3*2) = 1/3, C(2) = C(3) = 1, node 4 has degree 1
    val li = coPurchase(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
    val out = byName("q238_local_clustering")
      .run(spark, plantDir("lineitem" -> li)).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("c_local"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), s"degree-1 node must be absent: $out")
    assert(out(1L) == (3L, 1L, 0.333333), s"got ${out(1L)}") // floor(1/3*1e6+.5)/1e6
    assert(out(2L) == (2L, 1L, 1.0) && out(3L) == (2L, 1L, 1.0))
  }

  test("q239: planted bipartite graph yields the hand-iterated integer scores") {
    import spark.implicits._
    // s1 supplies parts 10,20,30; s2 supplies part 10 (2 lines each):
    // two integer-normalized iterations give h(s1)=0.7, h(s2)=0.3,
    // a(10)=0.428571, a(20)=a(30)=0.285714 (hand-traced div chain)
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L))
      .flatMap { case (s, p) => Seq((s * 100 + p, s, p), (s * 1000 + p, s, p)) }
      .toDF("l_orderkey", "l_suppkey", "l_partkey")
    val out = byName("q239_hits").run(spark, plantDir("lineitem" -> li))
      .collect()
      .map(r => (r.getAs[String]("role"), r.getAs[Long]("id")) ->
        r.getAs[Double]("score")).toMap
    assert(out(("hub", 1L)) == 0.7, s"got $out")
    assert(out(("hub", 2L)) == 0.3)
    assert(out(("authority", 10L)) == 0.428571)
    assert(out(("authority", 20L)) == 0.285714)
    assert(out(("authority", 30L)) == 0.285714)
  }

  test("q240: seen trigrams score log 1 = 0; unseen chains hit the floor") {
    import spark.implicits._
    def doc(id: Long, text: String) = (id, text, "en", "s0", text.length.toLong)
    // train (doc_id % 3 != 0): 2 copies of "a b c d" -> every trained
    // trigram/bigram count = 2, N = 8 unigrams
    val docs = Seq(
      doc(1L, "a b c d"), doc(2L, "a b c d"),
      doc(3L, "a b c x"), // (a,b,c) seen: S=1; (b,c,x): full miss -> 0.08/8
      doc(6L, "a b c d")) // all trigrams seen: S=1 everywhere
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = byName("q240_stupid_backoff").run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_trigrams"), r.getAs[Double]("sb_logscore"),
          r.getAs[Double]("backoff_share"))).toMap
    assert(out.keySet == Set(3L, 6L), s"train docs must not be scored: $out")
    assert(out(6L) == (2L, 0.0, 0.0), s"fully-seen doc must score 0: ${out(6L)}")
    // doc 3: (ln(1) + ln(0.01))/2 = -2.302585 -> r4 floor = -2.3026
    assert(out(3L)._1 == 2L && out(3L)._3 == 0.5)
    assert(math.abs(out(3L)._2 - -2.3026) < 1e-9, s"got ${out(3L)._2}")
  }
}
