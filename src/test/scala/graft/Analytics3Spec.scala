package graft

import org.apache.spark.sql.functions._

/** Property pins for the experimentation-governance batch: SRM check
  * (q235), t-closeness (q236) and the delta-method ratio test (q237). */
class Analytics3Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_a3").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  /** Each user's md5 arm, with the SAME hash the queries use. */
  private def arms(users: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    users.toDF("user_id").select(col("user_id"),
        (ext.Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("q235: balanced arms pass; deleting one arm's users flags SRM") {
    import spark.implicits._
    val armOf = arms(1L to 200L)
    def events(users: Seq[Long]) = users.map { u =>
      (u, new java.sql.Timestamp(1704067200000L), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // hand-recompute the expected chi-square from the recovered arms
    val na = (1L to 200L).count(armOf(_) == 0).toLong
    val nb = 200L - na
    val balanced = byName("q235_srm_check")
      .run(spark, plantDir("events" -> events(1L to 200L)))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    val all = balanced("__all__")
    assert(all.getAs[Long]("n_a") == na && all.getAs[Long]("n_b") == nb)
    val expChi2 = (na - nb).toDouble * (na - nb) / 200.0
    assert(math.abs(all.getAs[Double]("chi2") - expChi2) < 1e-4)
    assert(all.getAs[Boolean]("srm_flag") == (expChi2 > 3.841))
    // drop all but 5 of arm 1: a gross mismatch every SRM check must catch
    val skewedUsers = (1L to 200L).filter(armOf(_) == 0) ++
      (1L to 200L).filter(armOf(_) == 1).take(5)
    val skewed = byName("q235_srm_check")
      .run(spark, plantDir("events" -> events(skewedUsers)))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    assert(skewed("__all__").getAs[Boolean]("srm_flag"),
      s"${na} vs 5 users must flag: ${skewed("__all__")}")
    assert(skewed("view").getAs[Boolean]("srm_flag"))
  }

  test("q236: planted top-decile class scores t=1.5/9; a lone class scores 0") {
    import spark.implicits._
    // class A: balances 1..100 (deciles 1-5 of the 200-row global);
    // class B: 100 ties at 1000 (all land in decile 6). Both classes'
    // EMD vs global = (0.1+0.2+0.3+0.4+0.5)/9 = 1.5/9.
    def cust(seg: String, ids: Seq[Long], bal: Long => Double) = ids.map { i =>
      (i, s"c$i", 1, bal(i), seg)
    }
    val two = (cust("A", 1L to 100L, _.toDouble) ++
      cust("B", 101L to 200L, _ => 1000.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val out = byName("q236_t_closeness").run(spark, plantDir("customer" -> two))
      .collect().map(r => r.getAs[String]("c_mktsegment") ->
        r.getAs[Double]("t_emd")).toMap
    val exp = math.floor(1.5 / 9.0 * 1e6 + 0.500001) / 1e6
    assert(out == Map("A" -> exp, "B" -> exp), s"got $out, want $exp")
    // a single class IS the global distribution: t must be exactly 0
    val one = cust("A", 1L to 100L, _.toDouble)
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val solo = byName("q236_t_closeness").run(spark, plantDir("customer" -> one))
      .collect()
    assert(solo.length == 1 && solo.head.getAs[Double]("t_emd") == 0.0)
    assert(!solo.head.getAs[Boolean]("t_breach"))
  }

  test("q237: a planted per-user ratio shift is significant; the null case is not") {
    import spark.implicits._
    val armOf = arms(1L to 200L)
    // each user: 10 events, 5 purchases; purchase value carries an
    // arm-free deterministic noise term so within-arm variance > 0
    def events(shift: Double) = (1L to 200L).flatMap { u =>
      (0 until 10).map { i =>
        val noise = ((u * 31 + i * 7) % 11).toDouble
        val v = if (i < 5) 50.0 + noise + (if (armOf(u) == 0) shift else 0.0)
          else 1.0
        (u * 1000 + i, new java.sql.Timestamp(1704067200000L + i * 60000L), u,
          if (i < 5) "purchase" else "view", v, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val shifted = byName("q237_delta_ratio")
      .run(spark, plantDir("events" -> events(25.0))).collect().head
    assert(shifted.getAs[Boolean]("significant"), s"got $shifted")
    assert(shifted.getAs[Double]("z_stat") > 1.96)
    // 5 purchases of +25 over 10 events raise revenue/event by 12.5
    assert(math.abs(shifted.getAs[Double]("diff") - 12.5) < 1.5)
    val nullCase = byName("q237_delta_ratio")
      .run(spark, plantDir("events" -> events(0.0))).collect().head
    assert(!nullCase.getAs[Boolean]("significant"),
      s"identical arms must not flag: $nullCase")
    assert(math.abs(nullCase.getAs[Double]("diff")) < 1.0)
  }
}
