package graft

import org.apache.spark.sql.functions._

/** Property pins for the graph-eval / governance / backtest batch:
  * nDCG@10 (q216), degree assortativity (q217), modularity of the LPA
  * partition (q218), l-diversity (q219), the AR(1) rolling-origin
  * backtest (q220) and dedup token savings (q221). Value parity vs
  * DuckDB is the oracle gate's job; these pin semantics on planted
  * data where the right answer is known by construction. */
class GraphEvalSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ge").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  /** lineitem rows that make each (u, v) a backbone edge: 3 orders per
    * edge, each order containing exactly suppliers {u, v}. */
  private def edgeLineitem(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.zipWithIndex.flatMap { case ((u, v), i) =>
      (0 until 3).flatMap { r =>
        val ok = (i * 3 + r + 1).toLong
        Seq((ok, u), (ok, v))
      }
    }.toDF("l_orderkey", "l_suppkey")
  }

  private def docsDF(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("q217: star graph is perfectly disassortative (r = -1)") {
    val star = (2L to 11L).map(k => (1L, k))
    val d = plantDir("lineitem" -> edgeLineitem(star))
    val r = byName("q217_assortativity").run(spark, d).collect().head
    assert(r.getAs[Long]("n_nodes") == 11 && r.getAs[Long]("n_edges") == 10)
    assert(math.abs(r.getAs[Double]("r_assortativity") - (-1.0)) < 1e-6)
  }

  test("q217: degree-regular ring yields NULL r, never NaN") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val d = plantDir("lineitem" -> edgeLineitem(ring))
    val r = byName("q217_assortativity").run(spark, d).collect().head
    assert(r.getAs[Long]("n_edges") == 4)
    assert(r.isNullAt(r.fieldIndex("r_assortativity")))
  }

  test("q218: two disjoint triangles score Q = 0.5; one clique scores Q = 0") {
    val twoTriangles = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L))
    val d1 = plantDir("lineitem" -> edgeLineitem(twoTriangles))
    val r1 = byName("q218_modularity").run(spark, d1).collect().head
    assert(r1.getAs[Long]("m") == 6 && r1.getAs[Long]("n_communities") == 2)
    assert(math.abs(r1.getAs[Double]("modularity") - 0.5) < 1e-6)

    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val d2 = plantDir("lineitem" -> edgeLineitem(k4))
    val r2 = byName("q218_modularity").run(spark, d2).collect().head
    assert(r2.getAs[Long]("n_communities") == 1)
    assert(math.abs(r2.getAs[Double]("modularity")) < 1e-6)
  }

  test("q216: superset-relevance corpus ranks perfectly (ndcg = rr = p = 1)") {
    // rel-3 doc contains every probe term, rel-2 and rel-1 docs proper
    // subsets, same length — BM25 is monotone in the term-superset
    // order here, so the ranking must be ideal
    val docs = Seq(
      (1L, "join scan window", "s0"),
      (2L, "join scan filler", "s0"),
      (3L, "join filler filler", "s0"),
      (4L, "filler filler filler", "s0"),
      (5L, "noise noise noise", "s0"))
    val d = plantDir("documents" -> docsDF(docs))
    val r = byName("q216_ndcg_bm25").run(spark, d).collect().head
    assert(r.getAs[Long]("k_used") == 3) // only term-bearing docs rank
    assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("rr") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_at_k") - 1.0) < 1e-6)
  }

  test("q216: corpus with no rel>=2 doc has rr = 0 but still ideal ndcg") {
    val docs = Seq(
      (1L, "join filler filler", "s0"),
      (2L, "scan filler filler", "s0"),
      (3L, "filler filler filler", "s0"))
    val d = plantDir("documents" -> docsDF(docs))
    val r = byName("q216_ndcg_bm25").run(spark, d).collect().head
    assert(r.getAs[Double]("rr") == 0.0)
    assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-6)
  }

  test("q216: DCG discount literals equal floor(1e6/log2(pos+1) + 0.5)") {
    // the micro-literals are the exactness backbone — a typo here
    // would silently skew every DCG; recompute from the definition
    ext.Retrieval.DcgW.foreach { case (pos, w) =>
      val expect = math.floor(1e6 / (math.log(pos + 1.0) / math.log(2.0)) + 0.5).toLong
      assert(w == expect, s"pos $pos: literal $w != $expect")
    }
  }

  test("q219: planted l=1 classes are counted and attributed") {
    import spark.implicits._
    // class (A,0): 5 members, all delinquent  -> l=1, damaging
    // class (A,1): 5 members, mixed           -> l=2
    // class (B,2): 4 members, all solvent     -> l=1, not delinquent
    val rows =
      (1 to 5).map(i => (i.toLong, s"c$i", 0, -10.0, "A")) ++
      (6 to 10).map(i => (i.toLong, s"c$i", 1, if (i % 2 == 0) -5.0 else 5.0, "A")) ++
      (11 to 14).map(i => (i.toLong, s"c$i", 2, 100.0, "B"))
    val d = plantDir("customer" ->
      rows.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    val r = byName("q219_l_diversity").run(spark, d).collect().head
    assert(r.getAs[Long]("n_classes") == 3 && r.getAs[Long]("n_rows") == 14)
    assert(r.getAs[Long]("min_l") == 1 && r.getAs[Long]("classes_l1") == 2)
    assert(math.abs(r.getAs[Double]("rows_l1_share") - 9.0 / 14.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("rows_all_delinquent_share") - 5.0 / 14.0) < 1e-4)
  }

  test("q220: anti-persistent AR(1) series decisively beats the naive forecast") {
    import spark.implicits._
    // y_t = 50 - 0.8(y_{t-1} - 50) + noise: successive differences are
    // ~3x the model residual, so MASE must come out well under 1
    val rng = new scala.util.Random(7L)
    var y = 50.0
    val rows = (0 until 120).map { i =>
      y = 50.0 - 0.8 * (y - 50.0) + rng.nextGaussian()
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 60000L), 1L, "hr", y, "{}")
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val r = byName("q220_forecast_backtest").run(spark, d).collect().head
    // rows i=31..119 have >= 30 prior lag pairs
    assert(r.getAs[Long]("n_eval") == 89, s"n_eval=${r.getAs[Long]("n_eval")}")
    assert(r.getAs[Double]("mase") < 0.6, s"mase=${r.getAs[Double]("mase")}")
    assert(r.getAs[Double]("model_win_share") > 0.7)
    assert(r.getAs[Double]("mae_model") < r.getAs[Double]("mae_naive"))
  }

  test("q220: constant series yields no evaluable rows (sigma = 0 gate)") {
    import spark.implicits._
    val rows = (0 until 80).map { i =>
      (i.toLong, new java.sql.Timestamp(1704067200000L + i * 60000L), 1L, "hr", 42.0, "{}")
    }
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(byName("q220_forecast_backtest").run(spark, d).collect().isEmpty)
  }

  test("q221: duplicate tokens are charged to the duplicating source") {
    val docs = Seq(
      (1L, "a b c", "A"), // canonical (lowest doc_id)
      (2L, "a b c", "A"), // dupe: 3 tokens
      (3L, "a b c", "A"), // dupe: 3 tokens
      (4L, "x y", "A"),   // unique
      (5L, "p q r s", "B"),  // unique
      (6L, "a b c", "B")) // cross-source dupe, charged to B
    val d = plantDir("documents" -> docsDF(docs))
    val out = byName("q221_dedup_savings").run(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("A")
    assert(a.getAs[Long]("n_docs") == 4 && a.getAs[Long]("n_dupes") == 2)
    assert(a.getAs[Long]("tokens_total") == 11 && a.getAs[Long]("tokens_dupe") == 6)
    assert(math.abs(a.getAs[Double]("savings_share") - 6.0 / 11.0) < 1e-4)
    val b = out("B")
    assert(b.getAs[Long]("n_dupes") == 1 && b.getAs[Long]("tokens_dupe") == 3)
  }

  test("q222: path-graph distances produce the hand-computed harmonic sums") {
    // path 1-2-3-4-5-6: node 3 reaches {2,4} at 1, {1,5} at 2, {6} at 3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val d = plantDir("lineitem" -> edgeLineitem(path))
    val rows = byName("q222_harmonic_centrality").run(spark, d).collect()
      .map(r => r.getAs[Long]("seed") -> r).toMap
    assert(rows.size == 6) // fewer than 20 nodes: every node is a seed
    val n3 = rows(3L)
    assert(n3.getAs[Long]("n1") == 2 && n3.getAs[Long]("n2") == 2 &&
      n3.getAs[Long]("n3") == 1)
    assert(math.abs(n3.getAs[Double]("harmonic") - 3.333333) < 1e-5)
    val n1 = rows(1L) // end node: {2} at 1 hop, {3} at 2, {4} at 3
    assert(n1.getAs[Long]("n1") == 1 && n1.getAs[Long]("n2") == 1 &&
      n1.getAs[Long]("n3") == 1)
    assert(math.abs(n1.getAs[Double]("harmonic") - 1.833333) < 1e-5)
  }

  test("q223: staleness percentiles land on the planted minute buckets") {
    import spark.implicits._
    val t0 = 1704067200000L
    def ev(id: Long, offsetS: Long, typ: String) =
      (id, new java.sql.Timestamp(t0 + offsetS * 1000L), 1L, typ, 1.0, "{}")
    val rows = Seq(
      ev(1, -600, "view"),  // before any purchase: unmatched
      ev(2, 0, "purchase"), // matches itself: staleness 0
      ev(3, 90, "view"),    // 1.5 min  -> bucket 1
      ev(4, 150, "view"),   // 2.5 min  -> bucket 2
      ev(5, 600, "view"))   // 10 min   -> bucket 10
    val d = plantDir("events" ->
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val out = byName("q223_asof_staleness").run(spark, d).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val v = out("view")
    assert(v.getAs[Long]("n_events") == 4 && v.getAs[Long]("n_matched") == 3)
    assert(math.abs(v.getAs[Double]("match_share") - 0.75) < 1e-6)
    // ranks over buckets [1,2,10]: ceil(1.5)=2 -> 2; ceil(2.85)=3 -> 10
    assert(v.getAs[Long]("p50_staleness_min") == 2)
    assert(v.getAs[Long]("p95_staleness_min") == 10)
    val p = out("purchase")
    assert(p.getAs[Long]("p50_staleness_min") == 0 &&
      p.getAs[Long]("p95_staleness_min") == 0)
  }

  test("q224: identical docs land in the matches=8 bucket with zero error") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "A"),
      (2L, "alpha beta gamma delta epsilon", "A"),
      (3L, "one two three four five six seven", "B"))
    val d = plantDir("documents" -> docsDF(docs))
    val out = byName("q224_minhash_calibration").run(spark, d).collect()
    assert(out.length == 1) // only the identical pair survives LSH
    val r = out.head
    assert(r.getAs[Int]("matches") == 8)
    assert(r.getAs[Double]("est_jaccard") == 1.0)
    assert(r.getAs[Long]("n_pairs") == 1)
    assert(math.abs(r.getAs[Double]("mean_exact") - 1.0) < 1e-6)
    assert(r.getAs[Double]("mae") == 0.0)
  }

  test("q224: est_jaccard is matches/8 in every bucket on driver data") {
    val rows = byName("q224_minhash_calibration").run(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("est_jaccard") ==
        r.getAs[Int]("matches") * 0.125)
      assert(r.getAs[Double]("mean_exact") >= 0.0 &&
        r.getAs[Double]("mean_exact") <= 1.0001)
    }
  }
}
