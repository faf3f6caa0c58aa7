package graft.plans

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Pins the native as-of join three ways: exact agreement with the
  * composed union+window operator on real data (which is itself
  * DuckDB-ASOF-oracle-exact via q18), hand-checked edge semantics on a
  * planted frame, and the physical shape the operator exists for —
  * one hash exchange per SIDE (the narrow quote relation shuffles at
  * its own width, never unioned into the probe stream). */
class AsOfJoinSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("native as-of join ≡ composed union+window operator on events") {
    val events = Tables.events(spark, sf())
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val probes = events.select(col("user_id"), col("event_id"), col("ts"),
      col("value"))
    val cols = Seq("ts" -> "last_purchase_ts", "value" -> "last_purchase_value")
    val composed = graft.ops.Temporal
      .asofJoin(probes, purchases, "user_id", "ts", "event_id", cols)
      .select("user_id", "event_id", "value", "last_purchase_ts",
        "last_purchase_value")
    val native = AsOfJoin.join(probes, purchases, "user_id", "ts", cols)
      .select("user_id", "event_id", "value", "last_purchase_ts",
        "last_purchase_value")
    val a = composed.collect().toSet
    val b = native.collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("edge semantics: before-first, equal-ts, no-quote key, tie") {
    import spark.implicits._
    val probes = Seq(
      ("u1", 1L, 100L), // before u1's first quote → null
      ("u1", 2L, 200L), // equal ts → matches the 200 quote
      ("u1", 3L, 350L), // between → still the 200 quote
      ("u2", 4L, 500L), // u2 has no quotes → null
      ("u3", 5L, 900L)  // after both u3 quotes → latest (800)
    ).toDF("user_id", "event_id", "pts")
    val quotes = Seq(
      ("u1", 200L, 1.0),
      ("u1", 400L, 2.0),
      ("u3", 700L, 3.0),
      ("u3", 800L, 4.0)
    ).toDF("user_id", "pts", "qv") // key/ts names shared with probes
    val out = AsOfJoin.join(probes, quotes, "user_id", "pts",
      Seq("qv" -> "carried"))
      .orderBy("event_id")
      .select("user_id", "event_id", "carried")
      .collect()
    assert(out.toSeq == Seq(
      Row("u1", 1L, null),
      Row("u1", 2L, 1.0),
      Row("u1", 3L, 1.0),
      Row("u2", 4L, null),
      Row("u3", 5L, 4.0)))
  }

  test("plan shape: AsOfJoinExec with one exchange per side, sorted inputs") {
    val events = Tables.events(spark, sf())
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val probes = events.select(col("user_id"), col("event_id"), col("ts"))
    val joined = AsOfJoin.join(probes, purchases, "user_id", "ts",
      Seq("value" -> "last_purchase_value"))
    joined.collect() // materialize so AQE finalizes the stages
    val nodes = flatten(joined.queryExecution.executedPlan)
    val execs = nodes.collect { case e: AsOfJoinExec => e }
    assert(execs.size == 1, s"expected one AsOfJoinExec:\n${nodes.map(_.nodeName)}")
    // each child subtree carries its own single hash exchange — the
    // quote side shuffles at quote width, the probe side at probe width
    Seq(execs.head.left, execs.head.right).foreach { side =>
      val shuffles = flatten(side).collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.size == 1,
        s"expected exactly one exchange under ${side.nodeName}")
    }
    // EnsureRequirements must have satisfied the (key, ts) ordering
    execs.foreach { e =>
      assert(e.left.outputOrdering.nonEmpty && e.right.outputOrdering.nonEmpty)
    }
  }

  test("composite keys: randomized agreement with a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val probes = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, s"t${rnd.nextInt(4)}", i.toLong,
        rnd.nextInt(500).toLong))
    val quotes = (1 to 120).map(i =>
      (rnd.nextInt(5).toLong, s"t${rnd.nextInt(4)}", rnd.nextInt(500).toLong,
        i.toLong))
      .groupBy(t => (t._1, t._2, t._3)).map(_._2.maxBy(_._4)).toSeq
    val expected = probes.map { case (u, t, id, ts) =>
      val best = quotes.filter(q => q._1 == u && q._2 == t && q._3 <= ts)
        .sortBy(_._3).lastOption
      (u, t, id, best.map(_._4))
    }.toSet
    // two-column key: the logical node takes Seq(keys); the public
    // wrapper is single-key, so build the plan directly
    val pdf = probes.toDF("u", "t", "id", "ts")
    val qdf = quotes.toDF("u", "t", "ts", "payload")
      .select(col("u").as("qu"), col("t").as("qt"), col("ts").as("qts"),
        col("payload"))
    AsOfJoin.install(spark)
    val lp = pdf.queryExecution.analyzed
    val rp = qdf.queryExecution.analyzed
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val plan = AsOfJoinPlan(lp, rp,
      Seq(a(lp, "u"), a(lp, "t")), Seq(a(rp, "qu"), a(rp, "qt")),
      a(lp, "ts"), a(rp, "qts"))
    val got = org.apache.spark.sql.GraftShim.ofRows(spark, plan)
      .select("u", "t", "id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == expected)
  }

  test("salted variant: exact equality with the plain join on skewed data") {
    import spark.implicits._
    // planted skew: one user carries half of all probes
    val events = Tables.events(spark, sf())
    val probes = events.select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(7L)).otherwise(col("user_id")))
    val quotes = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
      // determinism contract: planted skew merges users' purchases,
      // which can collide on ts — dedupe (key, ts) like production
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("value"))
    val cols = Seq("ts" -> "qts", "value" -> "qv")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "event_id", "qts", "qv").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getTimestamp(2).getTime),
         if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val plain = norm(AsOfJoin.join(probes, quotes, "user_id", "ts", cols))
    val salted = norm(AsOfJoin.joinSalted(probes, quotes, "user_id", "ts",
      cols, salt = 8, hotKeys = Seq(7L), saltBy = "event_id"))
    assert(plain.size == salted.size && plain == salted)
    // the hot key must actually have matches for the test to mean much
    assert(plain.exists { case ((u, _), (m, _)) => u == 7L && m.isDefined })
  }

  test("randomized agreement with a brute-force reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val probes = (1 to 400).map(i =>
      (s"k${rnd.nextInt(12)}", i.toLong, rnd.nextInt(1000).toLong))
    val quotes = (1 to 150).map(i =>
      (s"k${rnd.nextInt(12)}", rnd.nextInt(1000).toLong, i.toLong))
      // the operator's tie rule is last-in-sort-order; dedupe (key, ts)
      // like production callers so the reference is well-defined
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    val expected = probes.map { case (k, id, ts) =>
      val best = quotes.filter(q => q._1 == k && q._2 <= ts)
        .sortBy(q => (q._2, q._3)).lastOption
      (k, id, best.map(_._3))
    }.toSet
    val got = AsOfJoin.join(
      probes.toDF("k", "id", "ts"), quotes.toDF("k", "ts", "payload"),
      "k", "ts", Seq("payload" -> "payload"))
      .select("k", "id", "payload").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == expected)
  }
}
