package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** The remaining classic sketch families, built DETERMINISTIC (seeded
  * md5-derived hashes, the q76-KMV primitive) so — unusually for
  * sketches — they are oracle-exact: Count-Min frequency estimation
  * and Bloom-filter membership with a measured false-positive rate.
  * Together with KMV (q76), HLL++ (q42), MinHash (q34), SimHash (q36)
  * and Space-Saving (streaming TopK) this completes the sketch
  * toolbox a 100 TB pipeline leans on when exact state is too big.
  */
object Sketches {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.expressions.Window

  /** Exact type-7 quantiles of a positive double column `x` with
    * BOUNDED state — the distributed replacement for Spark's
    * collecting `percentile` aggregate (whose buffer holds every
    * input value in one task: fine at sf0.1, an OOM at 100 TB). The
    * double-domain sibling of Trend.exactP80Cut's integer machinery.
    *
    * Two-level equal-width histogram refinement, all declarative:
    *  1. one (min, max, n) aggregate → broadcast; per requested p the
    *     target order statistics k0 = floor((n−1)p), k1 = min(k0+1, n−1);
    *  2. 4096-bin double-width histogram — bin assignment is any
    *     deterministic MONOTONE function of x (it never has to match
    *     the oracle, only order x consistently), so plain double
    *     division is safe here; a cumulative window over the ≤4096-row
    *     histogram (constant-sized frame, never the data) locates the
    *     bins holding each k0/k1;
    *  3. re-bin ONLY those bins 4096 ways again — candidates shrink
    *     by ~16.7M×;
    *  4. rank the tiny candidate set (row_number within its level-2
    *     bin + the bin's exact global offset) and pick ranks k0/k1.
    * Interpolation is v0 + (v1 − v0)·(h − k0) in double — the same
    * arithmetic the r6-rounded DuckDB QUANTILE_CONT twin lands in.
    * Ties are harmless: equal values bin identically, and every
    * tie-break returns the same order statistic.
    */
  private[ext] def exactQuantiles(vals: DataFrame,
      ps: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val B = 4096L
    val b = vals.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))
    val ranks = b.select(col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("h", (col("n") - 1).cast("double") * col("p"))
      .withColumn("k0", floor(col("h")).cast("long"))
      .withColumn("k1", least(col("k0") + 1, col("n") - 1))
      .select(col("p"), col("h"), col("k0"), col("k1"))
    val w1 = (col("mx") - col("mn")) / lit(B.toDouble)
    // degenerate all-equal input → everything in bin 0; edge rows
    // clamp (floor(x==mx quotient) == B) without breaking monotonicity
    val e1 = vals.crossJoin(broadcast(b))
      .withColumn("b1", when(col("mx") === col("mn"), lit(0L))
        .otherwise(greatest(lit(0L), least(lit(B - 1),
          floor((col("x") - col("mn")) / w1).cast("long")))))
    val winAll = Window.orderBy(col("b1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum1 = e1.groupBy(col("b1")).agg(count(lit(1)).as("cnt"))
      .withColumn("cb", coalesce(sum(col("cnt")).over(winAll), lit(0L)))
    def holdsTarget(cb: String, cnt: String) =
      (col(cb) <= col("k0") && col("k0") < col(cb) + col(cnt)) ||
        (col(cb) <= col("k1") && col("k1") < col(cb) + col(cnt))
    val selB1 = cum1.crossJoin(broadcast(ranks))
      .filter(holdsTarget("cb", "cnt"))
      .select(col("b1"), col("cb")).distinct()
    // level-2: same refinement inside the selected bins only; the
    // small negative slack greatest(0, …) guards against FP division
    // rounding putting x a hair below its own bin's left edge
    val w2 = w1 / lit(B.toDouble)
    val e2 = e1.join(broadcast(selB1), "b1")
      .withColumn("b2", when(col("mx") === col("mn"), lit(0L))
        .otherwise(greatest(lit(0L), least(lit(B - 1),
          floor((col("x") - (col("mn") + col("b1") * w1)) / w2)
            .cast("long")))))
    val winBin = Window.partitionBy(col("b1")).orderBy(col("b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum2 = e2.groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("cnt2"), min(col("cb")).as("cb0"))
      .withColumn("cb2", col("cb0") +
        coalesce(sum(col("cnt2")).over(winBin), lit(0L)))
    val selB2 = cum2.crossJoin(broadcast(ranks))
      .filter(holdsTarget("cb2", "cnt2"))
      .select(col("b1"), col("b2"), col("cb2")).distinct()
    val ranked = e2.join(broadcast(selB2), Seq("b1", "b2"))
      .withColumn("gr", row_number().over(
        Window.partitionBy(col("b1"), col("b2")).orderBy(col("x")))
        .cast("long") - 1 + col("cb2"))
    ranked.join(broadcast(ranks),
        col("gr") === col("k0") || col("gr") === col("k1"))
      .groupBy(col("p"), col("h"), col("k0"))
      .agg(min(when(col("gr") === col("k0"), col("x"))).as("v0"),
        min(when(col("gr") === col("k1"), col("x"))).as("v1"))
      .select(col("p"), (col("v0") + (coalesce(col("v1"), col("v0"))
        - col("v0")) * (col("h") - col("k0"))).as("eq"))
  }

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q132
    // Count-Min sketch (depth 4 × width 1024) over event user_ids,
    // then point-estimates for the 10 highest-frequency users vs their
    // true counts. The CMS guarantee (est >= true, overestimate
    // bounded by row collisions) is visible in the output columns.
    // Scale: the sketch build is ONE partial-aggregated pass over a
    // 4×1024-cell key space — constant-size state regardless of the
    // user universe; estimates join a broadcast 10-row probe set
    // against the 4096-row sketch.
    Query(
      "q132_count_min",
      (s, d) => {
        val D = 4; val W = 1024
        val ev = Tables.events(s, d)
          .select(col("user_id").cast("string").as("uid"))
        def hj(j: Int, c: org.apache.spark.sql.Column) =
          Dedup.h60(concat(lit(s"cms$j|"), c)) % W
        val cells = ev.select(explode(array((0 until D).map(j =>
            struct(lit(j).as("depth"), hj(j, col("uid")).as("bucket"))): _*))
            .as("c"))
          .select(col("c.depth"), col("c.bucket"))
          .groupBy(col("depth"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val truth = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
          .orderBy(col("true_n").desc, col("user_id")).limit(10)
        val probes = truth.select(col("user_id"), col("true_n"),
          explode(array((0 until D).map(j =>
            struct(lit(j).as("depth"),
              hj(j, col("user_id").cast("string")).as("bucket"))): _*)).as("c"))
          .select(col("user_id"), col("true_n"),
            col("c.depth"), col("c.bucket"))
        broadcast(probes).join(cells, Seq("depth", "bucket"))
          .groupBy(col("user_id"), col("true_n"))
          .agg(min(col("cnt")).as("cms_est"))
          .select(col("user_id"), col("true_n"), col("cms_est"),
            (col("cms_est") - col("true_n")).as("overestimate"))
          .orderBy(col("true_n").desc, col("user_id"))
      },
      Some {
        def hj(j: Int, e: String) =
          s"${Dedup.sqlH60(s"'cms$j|' || $e")} % 1024"
        val cellUnion = (0 until 4).map(j =>
          s"SELECT $j AS depth, ${hj(j, "CAST(user_id AS VARCHAR)")} AS bucket FROM events")
          .mkString("\n            UNION ALL ")
        val probeUnion = (0 until 4).map(j =>
          s"SELECT user_id, true_n, $j AS depth, ${hj(j, "CAST(user_id AS VARCHAR)")} AS bucket FROM truth")
          .mkString("\n            UNION ALL ")
        s"""
        WITH cells AS (
          SELECT depth, bucket, COUNT(*) AS cnt FROM (
            $cellUnion)
          GROUP BY depth, bucket),
        truth AS (
          SELECT user_id, COUNT(*) AS true_n FROM events
          GROUP BY user_id ORDER BY true_n DESC, user_id LIMIT 10),
        probes AS (
            $probeUnion)
        SELECT user_id, CAST(true_n AS BIGINT) AS true_n,
          CAST(MIN(cnt) AS BIGINT) AS cms_est,
          CAST(MIN(cnt) - true_n AS BIGINT) AS overestimate
        FROM probes JOIN cells USING (depth, bucket)
        GROUP BY user_id, true_n
        ORDER BY true_n DESC, user_id"""
      },
      "Count-Min sketch (4x1024, seeded md5 hashes -> deterministic and oracle-exact): point estimates vs true counts for the top-10 users, overestimate visible"),

    // --------------------------------------------------------------- q133
    // Bloom-filter membership audit: a 2048-bit, 3-hash Bloom filter
    // over supplier keys probed with every customer key — reports
    // probe count, bloom positives, true members (exact anti-join
    // ground truth) and the measured false-positive rate. The
    // pre-join filter primitive (ship the bit set, not the table);
    // deterministic hashes make even the FP count reproducible.
    // Scale: the bit set is a <= m-row table (broadcast); probing is
    // a narrow map + one small join, ground truth one semi join.
    Query(
      "q133_bloom_filter",
      (s, d) => {
        val M = 2048; val K = 3
        def pos(j: Int, c: org.apache.spark.sql.Column) =
          Dedup.h60(concat(lit(s"bloom$j|"), c)) % M
        val bits = Tables.supplier(s, d)
          .select(explode(array((0 until K).map(j =>
            pos(j, col("s_suppkey").cast("string"))): _*)).as("bit"))
          .distinct() // the set bit positions
        val probes = Tables.customer(s, d)
          .select(col("c_custkey"),
            array((0 until K).map(j =>
              pos(j, col("c_custkey").cast("string"))): _*).as("pbits"))
        val tested = probes.select(col("c_custkey"),
            explode(col("pbits")).as("bit"))
          .join(broadcast(bits.withColumn("set", lit(1))), Seq("bit"), "left")
          .groupBy(col("c_custkey"))
          .agg((count(lit(1)) === count(col("set"))).as("bloom_positive"))
        val members = Tables.supplier(s, d)
          .select(col("s_suppkey").as("c_custkey")).distinct()
          .withColumn("is_member", lit(1))
        tested.join(members, Seq("c_custkey"), "left")
          .agg(count(lit(1)).as("n_probes"),
            count(when(col("bloom_positive"), 1)).as("n_bloom_positive"),
            count(col("is_member")).as("n_true_members"),
            count(when(col("bloom_positive") && col("is_member").isNull, 1))
              .as("n_false_positives"))
          .select(col("n_probes"), col("n_bloom_positive"),
            col("n_true_members"), col("n_false_positives"),
            Num.r6(col("n_false_positives")
              / (col("n_probes") - col("n_true_members")).cast("double"))
              .as("fp_rate"))
      },
      Some {
        def pos(j: Int, e: String) =
          s"${Dedup.sqlH60(s"'bloom$j|' || $e")} % 2048"
        val bitUnion = (0 until 3).map(j =>
          s"SELECT ${pos(j, "CAST(s_suppkey AS VARCHAR)")} AS bit FROM supplier")
          .mkString("\n            UNION ALL ")
        val probeBits = (0 until 3).map(j =>
          s"SELECT c_custkey, ${pos(j, "CAST(c_custkey AS VARCHAR)")} AS bit FROM customer")
          .mkString("\n            UNION ALL ")
        s"""
        WITH bits AS (SELECT DISTINCT bit FROM (
            $bitUnion)),
        pb AS (
            $probeBits),
        tested AS (
          SELECT c_custkey,
            COUNT(*) = COUNT(b.bit) AS bloom_positive
          FROM pb LEFT JOIN bits b USING (bit)
          GROUP BY c_custkey),
        members AS (SELECT DISTINCT s_suppkey AS c_custkey, 1 AS is_member
                    FROM supplier)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
          CAST(COUNT(*) FILTER (WHERE bloom_positive) AS BIGINT)
            AS n_bloom_positive,
          CAST(COUNT(is_member) AS BIGINT) AS n_true_members,
          CAST(COUNT(*) FILTER (WHERE bloom_positive AND is_member IS NULL)
            AS BIGINT) AS n_false_positives,
          ${Num.sql("COUNT(*) FILTER (WHERE bloom_positive AND is_member IS NULL) / CAST(COUNT(*) - COUNT(is_member) AS DOUBLE)", 6)} AS fp_rate
        FROM tested LEFT JOIN members USING (c_custkey)"""
      },
      "Bloom-filter membership audit (2048 bits, 3 seeded hashes): customer keys probed against the supplier-key filter with exact ground truth and measured FP rate"),

    // --------------------------------------------------------------- q135
    // AMS (Alon-Matias-Szegedy) second-frequency-moment sketch over
    // event user_ids: 9 independent +/-1 sign hashes, Z_j = sum of
    // signs over ROWS (= sum_x f_x*sigma_j(x)), estimate = median of
    // Z_j^2, reported next to the exact F2 = sum f_x^2. F2 is the
    // self-join size — the quantity a planner needs to cost a
    // skew-prone self join without materializing it. All-integer
    // arithmetic makes the sketch oracle-exact.
    // Scale: per-row constant work into a 9-row aggregate — the
    // sketch state is 9 counters no matter how many keys exist; the
    // exact twin is one partial-aggregated groupBy kept for audit.
    Query(
      "q135_ams_f2",
      (s, d) => {
        val R = 9
        val ev = Tables.events(s, d)
          .select(col("user_id").cast("string").as("uid"))
        val ests = ev.select(explode(array((0 until R).map(j =>
            struct(lit(j).as("sk"),
              (lit(1) - lit(2) * (Dedup.h60(concat(lit(s"ams$j|"), col("uid"))) % 2)
                .cast("int")).as("sgn"))): _*)).as("c"))
          .select(col("c.sk"), col("c.sgn"))
          .groupBy(col("sk")).agg(sum(col("sgn")).as("z"))
          .select((col("z") * col("z")).as("est"))
        val med = ests.agg(sort_array(collect_list(col("est"))).as("es"))
          .select(element_at(col("es"), (R + 1) / 2).as("ams_f2"))
        val exact = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("f"))
          .agg(sum(col("f") * col("f")).as("exact_f2"))
        broadcast(med).crossJoin(exact)
          .select(col("exact_f2").cast("long").as("exact_f2"),
            col("ams_f2").cast("long").as("ams_f2"),
            Num.r6((col("ams_f2") - col("exact_f2"))
              / col("exact_f2").cast("double")).as("rel_err"))
      },
      Some {
        def sgn(j: Int) =
          s"1 - 2 * (${Dedup.sqlH60(s"'ams$j|' || CAST(user_id AS VARCHAR)")} % 2)"
        val branches = (0 until 9).map(j =>
          s"SELECT $j AS sk, ${sgn(j)} AS sgn FROM events")
          .mkString("\n            UNION ALL ")
        s"""
        WITH zs AS (
          SELECT sk, SUM(sgn) AS z FROM (
            $branches)
          GROUP BY sk),
        ests AS (SELECT z * z AS est FROM zs),
        med AS (SELECT est AS ams_f2 FROM ests ORDER BY est LIMIT 1 OFFSET 4),
        exact AS (
          SELECT SUM(f * f) AS exact_f2 FROM (
            SELECT COUNT(*) AS f FROM events GROUP BY user_id))
        SELECT CAST(exact_f2 AS BIGINT) AS exact_f2,
          CAST(ams_f2 AS BIGINT) AS ams_f2,
          ${Num.sql("(ams_f2 - exact_f2) / CAST(exact_f2 AS DOUBLE)", 6)}
            AS rel_err
        FROM med CROSS JOIN exact"""
      },
      "AMS F2 (self-join-size) sketch: median of 9 signed-sum estimators vs the exact second frequency moment, all-integer and oracle-exact"),

    // --------------------------------------------------------------- q136
    // Theta/KMV set operations: k=128 smallest-hash sketches of two
    // order-key sets (high-value orders vs bulk-quantity lineitems),
    // union estimate from the merged sketch, intersection by
    // inclusion-exclusion — distinct-count algebra over sets too big
    // to intersect exactly, the mergeable-sketch primitive of every
    // cross-shard distinct rollup. Exact ground truth alongside.
    // Scale: each sketch is a TakeOrdered(k) over distinct hashes —
    // no global sort, k rows shipped per set; merging sketches (not
    // raw sets) is what makes the union estimate shard-parallel.
    Query(
      "q136_theta_setops",
      (s, d) => {
        val K = 128
        def hs(df: org.apache.spark.sql.DataFrame) = df
          .select(Dedup.h60(concat(lit("kmv|"), col("k").cast("string"))).as("h"))
          .distinct()
        val a = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
          .select(col("o_orderkey").as("k"))
        val b = Tables.lineitem(s, d).filter(col("l_quantity") > 40)
          .select(col("l_orderkey").as("k")).distinct()
        def sketch(h: org.apache.spark.sql.DataFrame, nm: String) =
          h.orderBy(col("h")).limit(K)
            .agg(max(col("h")).as("hk"), count(lit(1)).as("m"))
            .select(when(col("m") < K, col("m"))
              .otherwise(floor(lit((K - 1).toDouble) * pow(lit(2.0), lit(60))
                / col("hk").cast("double")).cast("long"))
              .cast("long").as(s"est_$nm"))
        val exact = a.withColumn("ina", lit(1))
          .join(b.withColumn("inb", lit(1)), Seq("k"), "full")
          .agg(count(col("ina")).as("exact_a"), count(col("inb")).as("exact_b"),
            count(lit(1)).as("exact_union"),
            count(when(col("ina").isNotNull && col("inb").isNotNull, 1))
              .as("exact_inter"))
        broadcast(sketch(hs(a), "a"))
          .crossJoin(broadcast(sketch(hs(b), "b")))
          .crossJoin(broadcast(sketch(hs(a).union(hs(b)).distinct(), "union")))
          .crossJoin(exact)
          .select(col("est_a"), col("exact_a"), col("est_b"), col("exact_b"),
            col("est_union"), col("exact_union"),
            (col("est_a") + col("est_b") - col("est_union")).as("est_inter"),
            col("exact_inter"),
            Num.r6((col("est_union") - col("exact_union"))
              / col("exact_union").cast("double")).as("rel_err_union"))
      },
      Some {
        val h = Dedup.sqlH60("'kmv|' || CAST(k AS VARCHAR)")
        def sk(src: String, nm: String) =
          s"""sk_$nm AS (
          SELECT CAST(CASE WHEN COUNT(*) < 128 THEN COUNT(*)
            ELSE FLOOR(127 * POWER(2, 60) / CAST(MAX(h) AS DOUBLE)) END
            AS BIGINT) AS est_$nm
          FROM (SELECT h FROM $src ORDER BY h LIMIT 128))"""
        s"""
        WITH a AS (
          SELECT DISTINCT o_orderkey AS k FROM orders
          WHERE o_totalprice > 150000),
        b AS (
          SELECT DISTINCT l_orderkey AS k FROM lineitem
          WHERE l_quantity > 40),
        ha AS (SELECT DISTINCT $h AS h FROM a),
        hb AS (SELECT DISTINCT $h AS h FROM b),
        hu AS (SELECT h FROM ha UNION SELECT h FROM hb),
        ${sk("ha", "a")},
        ${sk("hb", "b")},
        ${sk("hu", "union")},
        exact AS (
          SELECT CAST(COUNT(a.k) AS BIGINT) AS exact_a,
            CAST(COUNT(b.k) AS BIGINT) AS exact_b,
            CAST(COUNT(*) AS BIGINT) AS exact_union,
            CAST(COUNT(*) FILTER (WHERE a.k IS NOT NULL AND b.k IS NOT NULL)
              AS BIGINT) AS exact_inter
          FROM a FULL JOIN b ON a.k = b.k)
        SELECT est_a, exact_a, est_b, exact_b, est_union, exact_union,
          CAST(est_a + est_b - est_union AS BIGINT) AS est_inter,
          exact_inter,
          ${Num.sql("(est_union - exact_union) / CAST(exact_union AS DOUBLE)", 6)}
            AS rel_err_union
        FROM sk_a CROSS JOIN sk_b CROSS JOIN sk_union CROSS JOIN exact"""
      },
      "Theta/KMV k=128 set-operation sketches: union estimate from the merged sketch, intersection via inclusion-exclusion, vs exact ground truth"),

    // --------------------------------------------------------------- q137
    // Count-Min inner product = join-cardinality estimation: the size
    // of view-events ⋈ purchase-events on user_id, estimated as
    // min_j sum_w cmsA[j,w]*cmsB[j,w] over 4 depth rows of width-256
    // sketches, next to the exact sum f_view(u)*f_purchase(u). The
    // inner product never undercounts (collisions only add) — the
    // sketch a cost-based planner consults to size a join WITHOUT
    // running it. Narrow width (256) makes the overestimate visible.
    // Scale: both sketches are constant-size (4x256) regardless of
    // key cardinality; the estimate is a 1024-row join — the whole
    // point is that the 100 TB join itself is never materialized.
    Query(
      "q137_cms_join_size",
      (s, d) => {
        val D = 4; val W = 256
        def hj(j: Int, c: org.apache.spark.sql.Column) =
          Dedup.h60(concat(lit(s"cms$j|"), c)) % W
        def cms(et: String, nm: String) = Tables.events(s, d)
          .filter(col("event_type") === et)
          .select(col("user_id").cast("string").as("uid"))
          .select(explode(array((0 until D).map(j =>
            struct(lit(j).as("depth"), hj(j, col("uid")).as("bucket"))): _*))
            .as("c"))
          .select(col("c.depth"), col("c.bucket"))
          .groupBy(col("depth"), col("bucket"))
          .agg(count(lit(1)).as(nm))
        val est = cms("view", "na").join(cms("purchase", "nb"),
            Seq("depth", "bucket"))
          .groupBy(col("depth")).agg(sum(col("na") * col("nb")).as("ip"))
          .agg(min(col("ip")).as("cms_join_size"))
        val exact = Tables.events(s, d)
          .filter(col("event_type").isin("view", "purchase"))
          .groupBy(col("user_id"))
          .agg(count(when(col("event_type") === "view", 1)).as("fv"),
            count(when(col("event_type") === "purchase", 1)).as("fp"))
          .agg(sum(col("fv") * col("fp")).as("exact_join_size"))
        broadcast(est).crossJoin(exact)
          .select(col("exact_join_size").cast("long").as("exact_join_size"),
            col("cms_join_size").cast("long").as("cms_join_size"),
            (col("cms_join_size") - col("exact_join_size")).cast("long")
              .as("overestimate"),
            Num.r6((col("cms_join_size") - col("exact_join_size"))
              / col("exact_join_size").cast("double")).as("rel_err"))
      },
      Some {
        def hj(j: Int) =
          s"${Dedup.sqlH60(s"'cms$j|' || CAST(user_id AS VARCHAR)")} % 256"
        def cells(et: String, nm: String) = {
          val u = (0 until 4).map(j =>
            s"SELECT $j AS depth, ${hj(j)} AS bucket FROM events WHERE event_type = '$et'")
            .mkString("\n            UNION ALL ")
          s"""$nm AS (
          SELECT depth, bucket, COUNT(*) AS cnt FROM (
            $u)
          GROUP BY depth, bucket)"""
        }
        s"""
        WITH ${cells("view", "ca")},
        ${cells("purchase", "cb")},
        est AS (
          SELECT MIN(ip) AS cms_join_size FROM (
            SELECT ca.depth, SUM(ca.cnt * cb.cnt) AS ip
            FROM ca JOIN cb ON ca.depth = cb.depth AND ca.bucket = cb.bucket
            GROUP BY ca.depth)),
        exact AS (
          SELECT SUM(fv * fp) AS exact_join_size FROM (
            SELECT COUNT(*) FILTER (WHERE event_type = 'view') AS fv,
              COUNT(*) FILTER (WHERE event_type = 'purchase') AS fp
            FROM events WHERE event_type IN ('view', 'purchase')
            GROUP BY user_id))
        SELECT CAST(exact_join_size AS BIGINT) AS exact_join_size,
          CAST(cms_join_size AS BIGINT) AS cms_join_size,
          CAST(cms_join_size - exact_join_size AS BIGINT) AS overestimate,
          ${Num.sql("(cms_join_size - exact_join_size) / CAST(exact_join_size AS DOUBLE)", 6)}
            AS rel_err
        FROM est CROSS JOIN exact"""
      },
      "Count-Min inner product estimates the view x purchase join size on user_id without running the join; never undercounts, exact twin alongside"),

    // --------------------------------------------------------------- q138
    // Group-aware K-fold assignment (GroupKFold): every USER — not
    // every row — is hashed into one of 5 folds, so all of a user's
    // events land in the same fold and no user leaks across the
    // train/validation boundary. Reports per-fold user/event counts
    // and the event share. The deterministic hash makes the split
    // reproducible across engines, runs and cluster sizes.
    // Scale: fold id is a narrow per-row expression (no user table
    // materialized, no shuffle beyond the audit's own groupBy).
    Query(
      "q138_group_kfold",
      (s, d) => {
        val fold = Dedup.h60(concat(lit("fold|"),
          col("user_id").cast("string"))) % 5
        val total = Tables.events(s, d).agg(count(lit(1)).as("n_total"))
        Tables.events(s, d)
          .select(fold.as("fold"), col("user_id"))
          .groupBy(col("fold"))
          .agg(count_distinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .crossJoin(broadcast(total))
          .select(col("fold"), col("n_users"), col("n_events"),
            Num.r6(col("n_events") / col("n_total").cast("double"))
              .as("event_share"))
          .orderBy(col("fold"))
      },
      Some {
        val fold = s"${Dedup.sqlH60("'fold|' || CAST(user_id AS VARCHAR)")} % 5"
        s"""
        WITH total AS (SELECT COUNT(*) AS n_total FROM events)
        SELECT $fold AS fold,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          ${Num.sql("COUNT(*) / CAST(n_total AS DOUBLE)", 6)} AS event_share
        FROM events CROSS JOIN total
        GROUP BY $fold, n_total
        ORDER BY fold"""
      },
      "Group-aware 5-fold split: users (and all their events) hash to one fold — the leakage-safe cross-validation assignment, reproducible across engines"),

    // --------------------------------------------------------------- q142
    // Mergeable-histogram quantile estimation: p50/p90/p99 of
    // l_extendedprice interpolated from a 64-bin equal-width
    // histogram (uniform-within-bin assumption), next to the exact
    // type-7 quantile. Per-partition histograms merge by adding
    // counts — THE distributed percentile path when an exact global
    // sort is off the table; the error column shows what the 64-bin
    // resolution costs. Bin math is bit-exact IEEE on both engines,
    // so even the interpolated estimate is oracle-exact.
    // Scale: one scan into a 64-cell aggregate (constant state), a
    // 64-row cumulative window, and a 3-row output — no sort of the
    // data itself anywhere.
    Query(
      "q142_histogram_quantiles",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("x"))
        // cheap codegen'd bounds for the histogram; the EXACT quantiles
        // come from the two-level 4096-bin refinement (bounded state —
        // no task ever buffers the column, unlike Spark's collecting
        // `percentile` aggregate this replaced in round 5)
        val bounds = li.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
          count(lit(1)).as("n"))
        val exacts = exactQuantiles(li, Seq(0.5, 0.9, 0.99))
          .agg(min(when(col("p") === 0.5, col("eq"))).as("q50"),
            min(when(col("p") === 0.9, col("eq"))).as("q90"),
            min(when(col("p") === 0.99, col("eq"))).as("q99"))
          .select(Num.r6(col("q50")).as("e50"),
            Num.r6(col("q90")).as("e90"),
            Num.r6(col("q99")).as("e99"))
        val w = (col("mx") - col("mn")) / lit(64.0)
        val hist = li.crossJoin(broadcast(bounds))
          .select(least(lit(63L), floor((col("x") - col("mn")) / w)
            .cast("long")).as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
        // 64-row bounded frame: the cumulative count per bin
        val cum = hist.withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cum_before", col("cum") - col("cnt"))
        val ps = cum.crossJoin(broadcast(bounds)).crossJoin(broadcast(exacts))
          .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("p"),
            col("bin"), col("cnt"), col("cum_before"),
            col("mn"), col("mx"), col("n"),
            col("e50"), col("e90"), col("e99"))
          .withColumn("r", col("p") * (col("n") - lit(1)).cast("double"))
          .filter(col("cum_before") <= col("r") &&
            col("r") < col("cum_before") + col("cnt"))
        ps.select(col("p"), col("n"),
            Num.r6(col("mn") + col("bin") * ((col("mx") - col("mn")) / lit(64.0))
              + ((col("r") - col("cum_before")) / col("cnt"))
                * ((col("mx") - col("mn")) / lit(64.0))).as("est_quantile"),
            when(col("p") === 0.5, col("e50"))
              .when(col("p") === 0.9, col("e90"))
              .otherwise(col("e99")).as("exact_quantile"))
          .orderBy(col("p"))
      },
      Some(s"""
        WITH li AS (SELECT l_extendedprice AS x FROM lineitem),
        bounds AS (
          SELECT MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n,
            ${Num.sql("QUANTILE_CONT(x, 0.5)", 6)} AS e50,
            ${Num.sql("QUANTILE_CONT(x, 0.9)", 6)} AS e90,
            ${Num.sql("QUANTILE_CONT(x, 0.99)", 6)} AS e99
          FROM li),
        hist AS (
          SELECT LEAST(63, CAST(FLOOR((x - mn) / ((mx - mn) / 64.0)) AS BIGINT))
            AS bin, COUNT(*) AS cnt
          FROM li CROSS JOIN bounds
          GROUP BY 1),
        cum AS (
          SELECT bin, cnt,
            SUM(cnt) OVER (ORDER BY bin) - cnt AS cum_before
          FROM hist),
        ps AS (
          SELECT p, bin, cnt, cum_before, mn, mx, n, e50, e90, e99,
            p * CAST(n - 1 AS DOUBLE) AS r
          FROM cum CROSS JOIN bounds
          CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                             (CAST(0.99 AS DOUBLE))) t(p)
          WHERE cum_before <= p * CAST(n - 1 AS DOUBLE)
            AND p * CAST(n - 1 AS DOUBLE) < cum_before + cnt)
        SELECT p, CAST(n AS BIGINT) AS n,
          ${Num.sql("mn + bin * ((mx - mn) / 64.0) + ((r - cum_before) / cnt) * ((mx - mn) / 64.0)", 6)}
            AS est_quantile,
          CASE WHEN p = 0.5 THEN e50 WHEN p = 0.9 THEN e90 ELSE e99 END
            AS exact_quantile
        FROM ps
        ORDER BY p"""),
      "mergeable 64-bin histogram quantiles (p50/p90/p99 by within-bin interpolation) vs exact type-7 quantiles — the no-global-sort distributed percentile path"),

    // --------------------------------------------------------------- q261
    // AMS F₂ sketch (Alon, Matias & Szegedy 1996): the second
    // frequency moment of the per-user event counts — the self-join
    // size / repeat-concentration number — estimated by 16 parallel
    // ±1-hash counters folded in ONE corpus pass (each counter is a
    // conditional sum over one md5 bit; all 16 share the hash), with
    // the median-of-estimators (mean of the 8th/9th order statistics
    // of 16) against the exact Σf². Counters and squares are pure
    // int64 — at 100× c_j ≤ 10⁷, c_j² ≤ 10¹⁴, exactly representable —
    // so both engines compute the identical estimate.
    Query(
      "q261_ams_f2",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"))
          .withColumn("h", graft.ext.Dedup.h60(
            concat(lit("f2|"), col("user_id").cast("string"))))
        val counters = ev.agg(
          sum(lit(1L) - lit(2L) * shiftright(col("h"), 0).bitwiseAND(lit(1L)))
            .as("c0"),
          (1 until 16).map(j =>
            sum(lit(1L) - lit(2L) * shiftright(col("h"), j)
              .bitwiseAND(lit(1L))).as(s"c$j")): _*)
        val exact = Tables.events(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("f"))
          .agg(count(lit(1)).as("n_users"), sum(col("f")).as("n_events"),
            sum((col("f") * col("f")).cast("decimal(38,0)")).as("f2x"))
        val est = (element_at(col("arr"), 8) + element_at(col("arr"), 9)) /
          lit(2.0)
        counters.crossJoin(broadcast(exact))
          .withColumn("arr", sort_array(array(
            (0 until 16).map(j => col(s"c$j") * col(s"c$j")): _*)))
          .select(col("n_events"), col("n_users"),
            col("f2x").cast("long").as("f2_exact"),
            est.as("f2_est"),
            Num.r6(abs(est - col("f2x").cast("double"))
              / col("f2x").cast("double")).as("rel_err"))
      },
      Some(s"""
        WITH h AS (
          SELECT ${graft.ext.Dedup.sqlH60("'f2|' || CAST(user_id AS VARCHAR)")}
            AS h
          FROM events),
        c AS (
          SELECT ${(0 until 16).map(j =>
            s"CAST(SUM(1 - 2 * ((h >> $j) & 1)) AS BIGINT) AS c$j")
            .mkString(",\n            ")}
          FROM h),
        ex AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
            CAST(SUM(f) AS BIGINT) AS n_events,
            CAST(SUM(f * f) AS BIGINT) AS f2_exact
          FROM (SELECT user_id, COUNT(*) AS f FROM events GROUP BY user_id)),
        a AS (
          SELECT list_sort([${(0 until 16).map(j => s"c$j * c$j")
            .mkString(", ")}]) AS arr
          FROM c)
        SELECT n_events, n_users, f2_exact,
          (arr[8] + arr[9]) / 2.0 AS f2_est,
          ${Num.sql(
            """ABS((arr[8] + arr[9]) / 2.0 - CAST(f2_exact AS DOUBLE))
               / f2_exact""", 6)} AS rel_err
        FROM a CROSS JOIN ex"""),
      "AMS F2 sketch: 16 one-pass +/-1-hash counters, median-of-estimators vs exact sum of squared user frequencies (Alon-Matias-Szegedy 1996)"),

    // --------------------------------------------------------------- q437
    // Quantile sketch, the last sketch family without an oracle gate
    // (HLL q42, KMV q76, CMS q132, Bloom q133, AMS q135, theta q136):
    // Spark's built-in percentile_approx (Greenwald–Khanna) at
    // accuracy = 1000 carries a HARD rank-error guarantee of n/1000,
    // so — exactly like q42 — the output is restructured to what a
    // DuckDB twin can pin: exact group counts plus within-bound
    // booleans. The rank check is pure integer arithmetic: the approx
    // value v sits at some rank in [cnt_lt + 1, cnt_le] (ties), and v
    // is an acceptable p-quantile iff that interval intersects
    // [⌈p·n⌉ − slack, ⌈p·n⌉ + slack] with slack = n div 1000 + 1 (the
    // guarantee plus one for the ceil). A regression in the GK path
    // (or in its partial-merge under different partitionings) flips a
    // boolean and fails the hash compare. Scale shape: one GK pass
    // (mergeable partial aggregates) + one counting pass, both plain
    // hash aggregations on the group key; the rank-check join is
    // 3-row broadcast.
    Query(
      "q437_approx_quantile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
        val ap = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("v"), array(lit(0.5), lit(0.9)), lit(1000)).as("ap"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"), col("n_rows"),
            col("ap").getItem(0).as("v50"), col("ap").getItem(1).as("v90"))
        val ranks = li.join(broadcast(ap), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(sum(when(col("v") < col("v50"), 1L).otherwise(0L)).as("lt50"),
            sum(when(col("v") <= col("v50"), 1L).otherwise(0L)).as("le50"),
            sum(when(col("v") < col("v90"), 1L).otherwise(0L)).as("lt90"),
            sum(when(col("v") <= col("v90"), 1L).otherwise(0L)).as("le90"))
        def within(lt: String, le: String, pNum: Int, pDen: Int) = {
          val target = expr(s"($pNum * n_rows + ${pDen - 1}) div $pDen")
          val slack = expr("n_rows div 1000") + lit(1L)
          (col(lt) + 1 <= target + slack) && (col(le) >= target - slack)
        }
        ap.join(broadcast(ranks), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("n_rows"),
            within("lt50", "le50", 1, 2).as("p50_within_bound"),
            within("lt90", "le90", 9, 10).as("p90_within_bound"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
          TRUE AS p50_within_bound, TRUE AS p90_within_bound
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "Greenwald-Khanna quantile sketch (percentile_approx), oracle-checked against its n/1000 rank-error guarantee at p50/p90"))
}
