package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-4 operators (value parity vs DuckDB is
  * covered by the oracle gate; these pin the relations the oracle
  * can't see). */
class Corpus2Spec extends SparkSpec {

  test("q96 n-gram Jaccard: symmetric-free ordering, bounds, dup pair sanity") {
    val pairs = Registry.queries("q96_ngram_jaccard")(spark, sf()).cache()
    assert(pairs.count() > 0, "corpus has near-dups; q96 must find some")
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.5 || col("jaccard") > 1.0).count() == 0)
    // exact duplicates (same text, different ids) must score jaccard = 1
    val texts = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val exactDup = texts.as("x").join(texts.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = exactDup.join(pairs.filter(col("jaccard") === 1.0),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0, "an exact duplicate pair scored < 1.0 or was missed")
    pairs.unpersist()
  }

  test("q97 weighted sample: 3 per source, ranks dense, priority ordered") {
    val s = Registry.queries("q97_weighted_sample")(spark, sf()).cache()
    val perSource = s.groupBy("source").agg(count(lit(1)).as("n"),
      min("rk").as("mn"), max("rk").as("mx"))
    assert(perSource.filter(col("n") =!= 3 || col("mn") =!= 1 || col("mx") =!= 3)
      .count() == 0)
    // within a source, rank order must follow (prio_q, doc_id)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("rk")
    val bad = s.withColumn("prev", lag(col("prio_q"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("prio_q"))
    assert(bad.count() == 0, "rank not monotone in quantized priority")
    s.unpersist()
  }

  test("q97 sampling is weight-biased: long docs overrepresented vs uniform") {
    // the expected n_chars of an A-ES draw weighted by n_chars must
    // exceed the corpus mean (length-biased sampling) — a seed-free
    // structural check that the weight actually matters
    val s = Registry.queries("q97_weighted_sample")(spark, sf())
    val picked = s.agg(avg(col("n_chars"))).head.getDouble(0)
    val corpus = Tables.documents(spark, sf()).agg(avg(col("n_chars")))
      .head.getDouble(0)
    assert(picked > corpus * 0.95,
      s"picked mean $picked far below corpus mean $corpus — weights ignored?")
  }

  test("q98 mixing: shares sum to ~1, sqrt temperature compresses spread") {
    val m = Registry.queries("q98_mix_weights")(spark, sf()).cache()
    val sums = m.agg(sum("tok_share"), sum("target_share")).head
    assert(math.abs(sums.getDouble(0) - 1.0) < 1e-3)
    assert(math.abs(sums.getDouble(1) - 1.0) < 1e-3)
    // sqrt flattening: target spread strictly narrower than actual
    val spread = m.agg(max("tok_share") - min("tok_share"),
      max("target_share") - min("target_share")).head
    assert(spread.getDouble(1) <= spread.getDouble(0) + 1e-9)
    // weight > 1 iff source is below-average share (upweight small)
    val wrong = m.filter(
      (col("tok_share") < col("target_share") && col("weight") < 1.0) ||
        (col("tok_share") > col("target_share") && col("weight") > 1.0))
    assert(wrong.count() == 0)
    m.unpersist()
  }

  test("q99 trailing window: >= 1 row in frame, bounded by per-cust total") {
    val t = Registry.queries("q99_trailing_window")(spark, sf()).cache()
    assert(t.filter(col("trail_n") < 1).count() == 0)
    val tot = t.groupBy("o_custkey").agg(count(lit(1)).as("n_orders"),
      max("trail_n").as("mx"))
    assert(tot.filter(col("mx") > col("n_orders")).count() == 0)
    // a frame never includes rows from outside [d-30, d]: recompute one
    // customer's frame by brute force and compare
    val ck = t.select("o_custkey").head.getLong(0)
    val rows = t.filter(col("o_custkey") === ck)
      .select("epoch_day", "trail_n").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val days = rows.map(_._1)
    rows.foreach { case (d, n) =>
      val expect = days.count(x => x >= d - 30 && x <= d)
      assert(n == expect, s"cust $ck day $d: trail_n $n != brute $expect")
    }
    t.unpersist()
  }

  test("q104 cohorts: offset-0 cell equals cohort size, cells never exceed it") {
    val r = Registry.queries("q104_retention_cohorts")(spark, sf()).cache()
    val users = Tables.events(spark, sf()).select("user_id").distinct().count()
    // every user is active in their own cohort week, so the offset-0
    // column sums to the full user universe
    val atZero = r.filter(col("week_offset") === 0).agg(sum("n_active"))
      .head.getLong(0)
    assert(atZero == users)
    val cohortSize = r.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("size"))
    val over = r.join(cohortSize, Seq("cohort_week"))
      .filter(col("n_active") > col("size"))
    assert(over.count() == 0, "a retention cell exceeds its cohort size")
    assert(r.filter(col("week_offset") < 0).count() == 0)
    r.unpersist()
  }

  test("q105 attribution: one row per purchase, lags in [0, 7d], brute-force agrees") {
    val a = Registry.queries("q105_last_touch")(spark, sf()).cache()
    val purchases = Tables.events(spark, sf())
      .filter(col("event_type") === "purchase")
    assert(a.count() == purchases.count())
    assert(a.filter(col("touch_type") =!= "none" &&
      (col("lag_us") < 0 || col("lag_us") > 604800000000L)).count() == 0)
    assert(a.filter(col("touch_type") === "none" && col("lag_us") =!= -1L)
      .count() == 0)
    // brute-force one user's attributions
    val uid = a.select("user_id").head.getLong(0)
    val evs = Tables.events(spark, sf()).filter(col("user_id") === uid)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(e => (e._3, e._1))
    val expect = evs.filter(_._2 == "purchase").map { p =>
      val prior = evs.filter(e => (e._2 == "view" || e._2 == "click") &&
        (e._3 < p._3 || (e._3 == p._3 && e._1 < p._1)))
      val best = prior.lastOption.filter(t => p._3 - t._3 <= 604800000000L)
      (p._1, (best.map(_._2).getOrElse("none"),
        best.map(t => p._3 - t._3).getOrElse(-1L)))
    }.toMap
    val got = a.filter(col("user_id") === uid)
      .select("event_id", "touch_type", "lag_us").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    expect.foreach { case (id, (t, l)) =>
      assert(got(id) == ((t, l)), s"purchase $id: got ${got(id)}, want ($t,$l)")
    }
    a.unpersist()
  }

  test("q106 containment: bounds hold, exact dups fully contained both ways") {
    val c = Registry.queries("q106_containment")(spark, sf()).cache()
    assert(c.filter(col("cont_a_in_b") < 0 || col("cont_a_in_b") > 1.0 ||
      col("cont_b_in_a") < 0 || col("cont_b_in_a") > 1.0).count() == 0)
    val texts = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val exactDup = texts.as("x").join(texts.as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val missed = exactDup.join(
      c.filter(col("cont_a_in_b") === 1.0 && col("cont_b_in_a") === 1.0),
      Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0, "an exact dup pair is not mutually contained")
    c.unpersist()
  }

  test("q100 SCD-2: intervals tile each user's timeline without overlap") {
    val iv = Registry.queries("q100_scd2_intervals")(spark, sf()).cache()
    val n = Tables.events(spark, sf()).count()
    assert(iv.count() == n, "one interval per event")
    // exactly one open (current) interval per user
    val cur = iv.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("nc"))
    assert(cur.filter(col("nc") =!= 1).count() == 0)
    // each non-current interval's valid_to equals the next valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from", "event_id")
    val chained = iv.withColumn("nxt_from", lead(col("valid_from"), 1).over(w))
      .filter(col("nxt_from").isNotNull)
      .filter(col("valid_to") =!= col("nxt_from"))
    assert(chained.count() == 0, "interval chain has a gap or overlap")
    // durations non-negative except the -1 sentinel on the open tail
    assert(iv.filter(!col("is_current") && col("dur_s") < 0).count() == 0)
    assert(iv.filter(col("is_current") && col("dur_s") =!= -1).count() == 0)
    iv.unpersist()
  }

  test("q155 training mix: budgets respected, greedy fill leaves no affordable doc behind") {
    val rows = Registry.queries("q155_training_mix")(spark, sf()).collect()
    val nSources = Tables.documents(spark, sf())
      .select(col("source")).distinct().count()
    assert(rows.length == nSources.toInt, "one manifest row per source, always")
    val totTokens = rows.map(_.getAs[Long]("src_tokens")).sum
    rows.foreach { r =>
      val (b, sel, nSel, nDocs) = (r.getAs[Long]("budget_tokens"),
        r.getAs[Long]("tokens_selected"), r.getAs[Long]("n_selected"),
        r.getAs[Long]("n_docs"))
      assert(sel <= b, s"${r.get(0)}: selected $sel tokens over budget $b")
      assert(nSel <= nDocs)
      assert(r.getAs[Long]("utilization_micro") == sel * 1000000L / b)
      // greedy prefix: if nothing was selected, even the best doc must
      // not fit; if something was, utilization is at least 50% (docs
      // are < 600 tokens, budgets are thousands)
      if (nSel > 0) assert(sel * 2 >= b || nSel == nDocs,
        s"${r.get(0)}: budget $b only $sel filled with docs left over")
    }
    // sqrt-temperature budgets sum to at most the global half-token pot
    assert(rows.map(_.getAs[Long]("budget_tokens")).sum <= totTokens / 2 + nSources)
  }

  test("q157 span risk: every doc rows out, exact dups are fully shared") {
    val rows = Registry.queries("q157_dup_span_risk")(spark, sf()).collect()
    val docs = Tables.documents(spark, sf())
    assert(rows.length == docs.count().toInt, "left join must keep short docs")
    rows.foreach { r =>
      val (n, sh, mx) = (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("max_df"))
      assert(sh <= n)
      assert(n == 0 || mx >= 1)
      assert(r.getAs[Long]("shared_bp") == (if (n == 0) 0L else sh * 10000 / n))
    }
    // a doc whose text appears verbatim under another id shares EVERY span
    val dupIds = docs.select(col("doc_id"), col("text")).as("x")
      .join(docs.select(col("doc_id"), col("text")).as("y"),
        col("x.text") === col("y.text") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    dupIds.filter(byId(_).getAs[Long]("n_spans") > 0).foreach { id =>
      assert(byId(id).getAs[Long]("shared_bp") == 10000L,
        s"doc $id is an exact dup but not fully span-shared")
      assert(byId(id).getAs[String]("risk") == "high")
    }
  }
}
