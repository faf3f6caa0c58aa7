package graft

import org.apache.spark.sql.functions._

/** Property pins for the experimentation / sequence batch: Welch A/B
  * (q181), bounded BFS (q182), sliding distinct (q183) and the
  * MATCH_RECOGNIZE-lite pattern (q184). */
class Analytics2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_a2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q181: a planted arm shift is significant; the null case is not") {
    import spark.implicits._
    // recover each user's md5 arm with the SAME hash the query uses
    val users = (1L to 200L).toDF("user_id")
    val arms = users.select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def events(shift: Double) = (1L to 200L).flatMap { u =>
      (0 until 20).map { i =>
        val noise = ((u * 31 + i * 7) % 11).toDouble // deterministic, arm-free
        (u * 1000 + i, new java.sql.Timestamp(1704067200000L + i * 60000L), u,
          "purchase", 50.0 + noise + (if (arms(u) == 0) shift else 0.0), "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val shifted = byName("q181_ab_ttest")
      .run(spark, plantDir("events" -> events(25.0))).collect().head
    assert(shifted.getAs[Boolean]("significant"),
      s"a 25-unit shift on ~2000 samples must be significant: $shifted")
    assert(shifted.getAs[Double]("t_stat") > 1.96)
    assert(shifted.getAs[Double]("mean_a") > shifted.getAs[Double]("mean_b") + 20)
    val nullCase = byName("q181_ab_ttest")
      .run(spark, plantDir("events" -> events(0.0))).collect().head
    assert(!nullCase.getAs[Boolean]("significant"),
      s"identical arms must not flag: $nullCase")
  }

  test("q182: planted star+path graph yields exact hop distances, 5th hop excluded") {
    import spark.implicits._
    // hub 1-{2,3,4} (degree 3 -> seed), then path 4-5-6-7-8; each edge
    // = one supplier pair sharing 3 orders
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L))
    val li = edges.zipWithIndex.flatMap { case ((u, v), ei) =>
      (0 until 3).flatMap(o => Seq((ei * 10L + o, u), (ei * 10L + o, v)))
    }.toDF("l_orderkey", "l_suppkey")
    val out = byName("q182_bfs_hops").run(spark, plantDir("lineitem" -> li))
      .collect().map(r => r.getAs[Long]("node_id") -> r.getAs[Int]("hops")).toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 3,
      7L -> 4), s"got $out — node 8 (5 hops) must be absent")
  }

  test("q183: six-fold event coverage, distinct <= events, on driver data") {
    val rows = byName("q183_sliding_distinct").run(spark, sf("0.01")).collect()
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents == 6 * 10000L,
      s"every event must land in exactly 6 sliding windows, got $totalEvents")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_users") >= 1)
    }
  }

  test("q185: int8 recall bounded and high; top-1 retention implies overlap") {
    val rows = byName("q185_int8_recall").run(spark, sf("0.01")).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      val rec = r.getAs[Double]("recall_at_10")
      assert(n >= 0 && n <= 10 && rec == n / 10.0)
      // 8-bit affine codes must not destroy coarse ranking structure
      assert(rec >= 0.5, s"quantization broke retrieval: $r")
      if (r.getAs[Boolean]("top1_kept")) assert(n >= 1)
    }
  }

  test("q184: strict consecutiveness — an interleaved event breaks the match") {
    import spark.implicits._
    def ev(u: Long, i: Int, et: String) =
      (u * 100 + i, new java.sql.Timestamp(1704067200000L + i * 60000L), u, et, 1.0, "{}")
    val rows = Seq(
      // user 1: two clean consecutive triples
      ev(1, 0, "view"), ev(1, 1, "click"), ev(1, 2, "purchase"),
      ev(1, 3, "view"), ev(1, 4, "click"), ev(1, 5, "purchase"),
      // user 2: same subsequence but interleaved -> zero CEP matches
      ev(2, 0, "view"), ev(2, 1, "error"), ev(2, 2, "click"), ev(2, 3, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q184_match_recognize").run(spark, plantDir("events" -> rows))
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_matches"), Option(r.getAs[java.sql.Timestamp]("first_match_ts")))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2.exists(_.getTime == 1704067200000L))
    assert(out(2L) == (0L, None), "q95's funnel would match this; CEP must not")
  }
}
