package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Round-6 continuation of the data-quality family: distributional
  * audits whose statistic must be cross-engine exact.
  */
object Quality2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q175
    // Benford first-digit audit over order totals — the classic
    // fabricated-data screen: natural multi-scale amounts follow
    // P(d) = log10(1 + 1/d); injected or templated values don't. The
    // leading digit comes from the DECIMAL-CENTS INTEGER rendered as a
    // string (both engines print an int64 identically), never from
    // log10 of a double (whose boundary cells could flip cross-engine).
    // One corpus-linear groupBy(digit) does all the counting; the
    // chi-square total is micro-quantized per digit BEFORE the 9-term
    // sum (the q90/q109 quantize-before-sum pattern), so association
    // order can't surface.
    Query(
      "q175_benford",
      (s, d) => {
        // ONE corpus pass: the ≤9-row digit table is checkpointed so
        // the total / expected / chi-square chain never re-scans orders
        val digits = Tables.orders(s, d)
          .select(substring(
            floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long")
              .cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
          .localCheckpoint()
        val tot = digits.agg(sum(col("n_orders")).as("n"))
        val p = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0))
        val scored = digits.crossJoin(broadcast(tot))
          .withColumn("exp", col("n").cast("double") * p)
          .withColumn("term_micro",
            floor((col("n_orders").cast("double") - col("exp")) *
              (col("n_orders").cast("double") - col("exp")) / col("exp") *
              lit(1000000.0) + lit(0.5)).cast("long"))
        val chi2 = scored.agg(sum(col("term_micro")).as("chi2_micro"))
        scored.crossJoin(broadcast(chi2))
          .select(col("digit"), col("n_orders"),
            Num.r6(col("n_orders").cast("double") / col("n").cast("double"))
              .as("share"),
            Num.r6(p).as("benford_share"),
            Num.r4(col("chi2_micro").cast("double") / lit(1000000.0))
              .as("chi2_total"))
          .orderBy(col("digit"))
      },
      Some("""
        WITH digits AS (
          SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                   AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
            CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1),
        tot AS (SELECT SUM(n_orders) AS n FROM digits),
        scored AS (
          SELECT digit, n_orders, n,
            LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0) AS p,
            CAST(n AS DOUBLE) * (LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0)) AS exp
          FROM digits CROSS JOIN tot),
        terms AS (
          SELECT digit, n_orders, n, p,
            CAST(FLOOR((CAST(n_orders AS DOUBLE) - exp)
                       * (CAST(n_orders AS DOUBLE) - exp) / exp
                       * 1000000.0 + 0.5) AS BIGINT) AS term_micro
          FROM scored),
        chi2 AS (SELECT SUM(term_micro) AS chi2_micro FROM terms)
        SELECT digit, n_orders,
          FLOOR((CAST(n_orders AS DOUBLE) / CAST(n AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS share,
          FLOOR(p * 1000000 + 0.500001) / 1000000 AS benford_share,
          FLOOR((CAST(chi2_micro AS DOUBLE) / 1000000.0)
                * 10000 + 0.500001) / 10000 AS chi2_total
        FROM terms CROSS JOIN chi2
        ORDER BY digit"""),
      "Benford first-digit audit of order totals: integer-string leading digit, micro-quantized chi-square"),

    // ---------------------------------------------------------------- q198
    // Chi-square test of independence between document language and
    // source (are languages distributed evenly across crawl sources?)
    // plus Cramér's V effect size — the categorical-association audit
    // next to q174/q180's distributional drift tests. The full
    // lang × source grid INCLUDES zero cells (their (r·c/N) expectation
    // still contributes); each cell term (o·N − r·c)²/(N·r·c) is the
    // identical IEEE expression from exact integer counts, quantized
    // to micro before the bounded-grid sum.
    Query(
      "q198_chi2_independence",
      (s, d) => {
        val obs = Tables.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint() // bounded (lang × source) grid, one scan
        val rows = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val cols = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
        val tot = obs.agg(sum(col("o")).as("n"),
          countDistinct(col("lang")).as("nl"),
          countDistinct(col("source")).as("ns"))
        val dn = col("o0").cast("double") * col("n").cast("double") -
          col("r").cast("double") * col("c").cast("double")
        val term = dn * dn /
          (col("n").cast("double") * col("r").cast("double") *
            col("c").cast("double"))
        val agg = rows.crossJoin(broadcast(cols))
          .join(obs, Seq("lang", "source"), "left")
          .withColumn("o0", coalesce(col("o"), lit(0L)))
          .crossJoin(broadcast(tot))
          .select(col("n"), col("nl"), col("ns"),
            floor(term * lit(1e6) + lit(0.5)).cast("long").as("tq"))
          .groupBy(col("n"), col("nl"), col("ns"))
          .agg(sum(col("tq")).as("chi2q"))
        val chi2 = col("chi2q").cast("double") / lit(1e6)
        val mindof = least(col("nl") - 1, col("ns") - 1).cast("double")
        agg.select(col("n").as("n_docs"),
          ((col("nl") - 1) * (col("ns") - 1)).as("dof"),
          Num.r4(chi2).as("chi2"),
          Num.r4(sqrt(chi2 / (col("n").cast("double") * mindof)))
            .as("cramers_v"))
      },
      Some("""
        WITH obs AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
          FROM documents GROUP BY lang, source),
        r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY lang),
        c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY source),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                       CAST(COUNT(DISTINCT lang) AS BIGINT) AS nl,
                       CAST(COUNT(DISTINCT source) AS BIGINT) AS ns
                FROM obs),
        grid AS (
          SELECT r.lang, c.source, r.r, c.c, COALESCE(o.o, 0) AS o0
          FROM r CROSS JOIN c
          LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source),
        terms AS (
          SELECT CAST(FLOOR(
            ((CAST(o0 AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
             * (CAST(o0 AS DOUBLE) * n - CAST(r AS DOUBLE) * c)
             / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
            * 1e6 + 0.5) AS BIGINT) AS tq, n, nl, ns
          FROM grid CROSS JOIN tot),
        agg AS (
          SELECT n, nl, ns, SUM(tq) AS chi2q FROM terms GROUP BY n, nl, ns)
        SELECT n AS n_docs, (nl - 1) * (ns - 1) AS dof,
          FLOOR((CAST(chi2q AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS chi2,
          FLOOR(SQRT((CAST(chi2q AS DOUBLE) / 1e6)
                     / (CAST(n AS DOUBLE) * LEAST(nl - 1, ns - 1)))
                * 10000 + 0.500001) / 10000 AS cramers_v
        FROM agg"""),
      "chi-square independence of document language vs source with Cramer's V: exact integer counts, micro-quantized cell terms over the full grid"),

    // ---------------------------------------------------------------- q211
    // k-anonymity audit over the (c_mktsegment, c_nationkey)
    // quasi-identifier: the size of every equivalence class, and the
    // share of CUSTOMERS whose class is smaller than k ∈ {2, 5, 10} —
    // the re-identification risk report a governance pipeline runs
    // before releasing a table. Class sizes are one exact groupBy; the
    // k-thresholds fold over the BOUNDED class-size histogram, so the
    // report costs one corpus pass no matter how many k values.
    Query(
      "q211_k_anonymity",
      (s, d) => {
        val classes = Tables.customer(s, d)
          .groupBy(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("sz"))
          .localCheckpoint() // bounded (segment × nation) grid
        val hist = classes.groupBy(col("sz"))
          .agg(count(lit(1)).as("n_classes"))
        hist.agg(
          sum(col("sz") * col("n_classes")).as("n_rows"),
          sum(col("n_classes")).as("n_classes"),
          min(col("sz")).as("min_class"),
          sum(when(col("sz") < 2, col("sz") * col("n_classes"))
            .otherwise(0L)).as("r2"),
          sum(when(col("sz") < 5, col("sz") * col("n_classes"))
            .otherwise(0L)).as("r5"),
          sum(when(col("sz") < 10, col("sz") * col("n_classes"))
            .otherwise(0L)).as("r10"))
          .select(col("n_rows"), col("n_classes"), col("min_class"),
            Num.r6(col("r2").cast("double") / col("n_rows").cast("double"))
              .as("risk_k2"),
            Num.r6(col("r5").cast("double") / col("n_rows").cast("double"))
              .as("risk_k5"),
            Num.r6(col("r10").cast("double") / col("n_rows").cast("double"))
              .as("risk_k10"))
      },
      Some("""
        WITH classes AS (
          SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS sz
          FROM customer GROUP BY c_mktsegment, c_nationkey),
        hist AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_classes
                 FROM classes GROUP BY sz)
        SELECT CAST(SUM(sz * n_classes) AS BIGINT) AS n_rows,
          CAST(SUM(n_classes) AS BIGINT) AS n_classes,
          MIN(sz) AS min_class,
          FLOOR((CAST(SUM(CASE WHEN sz < 2 THEN sz * n_classes ELSE 0 END)
                      AS DOUBLE) / SUM(sz * n_classes))
                * 1000000 + 0.500001) / 1000000 AS risk_k2,
          FLOOR((CAST(SUM(CASE WHEN sz < 5 THEN sz * n_classes ELSE 0 END)
                      AS DOUBLE) / SUM(sz * n_classes))
                * 1000000 + 0.500001) / 1000000 AS risk_k5,
          FLOOR((CAST(SUM(CASE WHEN sz < 10 THEN sz * n_classes ELSE 0 END)
                      AS DOUBLE) / SUM(sz * n_classes))
                * 1000000 + 0.500001) / 1000000 AS risk_k10
        FROM hist"""),
      "k-anonymity risk report over the (segment, nation) quasi-identifier: share of customers in classes under k for k in {2,5,10}"),

    // ---------------------------------------------------------------- q219
    // l-diversity audit (Machanavajjhala et al. 2006) — the attack
    // k-anonymity misses: a class can be large (k-safe) yet expose its
    // sensitive attribute if EVERY member shares the same value.
    // Same (segment, nation) quasi-identifier as q211; sensitive
    // attribute = delinquency (c_acctbal < 0). Per class l = distinct
    // sensitive values (1 or 2 here); report the share of customers
    // in l=1 classes (attribute disclosure) and, worse, in all-
    // delinquent l=1 classes (the damaging disclosure direction).
    // 100 TB shape: one grouped pass to the bounded (segment ×
    // nation) grid, then driver-free fold — identical to q211.
    Query(
      "q219_l_diversity",
      (s, d) => {
        val cls = Tables.customer(s, d)
          .withColumn("sens", (col("c_acctbal") < 0).cast("int"))
          .groupBy(col("c_mktsegment"), col("c_nationkey"))
          .agg(count(lit(1)).as("sz"),
            countDistinct(col("sens")).as("l"),
            min(col("sens")).as("mn"))
        cls.agg(
          count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          min(col("l")).as("min_l"),
          sum(when(col("l") === 1, 1L).otherwise(0L)).as("classes_l1"),
          sum(when(col("l") === 1, col("sz")).otherwise(0L)).as("r1"),
          sum(when(col("l") === 1 && col("mn") === 1, col("sz"))
            .otherwise(0L)).as("rd"))
          .select(col("n_classes"), col("n_rows"), col("min_l"),
            col("classes_l1"),
            Num.r6(col("r1").cast("double") / col("n_rows").cast("double"))
              .as("rows_l1_share"),
            Num.r6(col("rd").cast("double") / col("n_rows").cast("double"))
              .as("rows_all_delinquent_share"))
      },
      Some("""
        WITH cls AS (
          SELECT c_mktsegment, c_nationkey, CAST(COUNT(*) AS BIGINT) AS sz,
            CAST(COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS l,
            MIN(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS mn
          FROM customer GROUP BY c_mktsegment, c_nationkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
          CAST(SUM(sz) AS BIGINT) AS n_rows,
          MIN(l) AS min_l,
          CAST(COUNT(*) FILTER (WHERE l = 1) AS BIGINT) AS classes_l1,
          FLOOR((CAST(SUM(CASE WHEN l = 1 THEN sz ELSE 0 END) AS DOUBLE)
                 / SUM(sz)) * 1000000 + 0.500001) / 1000000 AS rows_l1_share,
          FLOOR((CAST(SUM(CASE WHEN l = 1 AND mn = 1 THEN sz ELSE 0 END)
                      AS DOUBLE) / SUM(sz)) * 1000000 + 0.500001) / 1000000
            AS rows_all_delinquent_share
        FROM cls"""),
      "l-diversity audit over the q211 quasi-identifier with delinquency as the sensitive attribute: share of customers in l=1 classes"),

    // ---------------------------------------------------------------- q236
    // t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    // attack l-diversity misses: a class can contain BOTH sensitive
    // values yet still leak if its distribution differs sharply from
    // the table's. Same (segment, nation) quasi-identifier as q211/
    // q219; the sensitive attribute is the account-balance DECILE
    // (ordered, so closeness is the earth-mover distance:
    // EMD = (1/(m−1))·Σᵢ|Σ_{j≤i}(p_j − q_j)| over the 9 prefixes).
    // Deciles come from the CENTS-QUANTIZED balance value grid —
    // bounded by the value domain, not the corpus — with every
    // customer sharing a balance landing in the same decile
    // (dec(v) = (cum_below(v)·10) div n + 1), so no raw-row sort or
    // global row_number exists anywhere: the only windows run over
    // the bounded grid (the q142/q192 discipline). Every prefix term
    // is the exact integer |cum_class·n − cum_global·n_class| over
    // the common denominator n_class·n, summed in DECIMAL(38) and
    // divided once.
    Query(
      "q236_t_closeness",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cust = Tables.customer(s, d)
          .select(col("c_mktsegment"), col("c_nationkey"),
            floor(col("c_acctbal") * lit(100.0) + lit(0.5)).cast("long")
              .as("vq"))
        // bounded value grid -> decile map: grid-only window, never rows
        val vals = cust.groupBy(col("vq")).agg(count(lit(1)).as("vc"))
        val n = cust.agg(count(lit(1)).as("n"))
        val decMap = vals
          .withColumn("cumlt", coalesce(sum(col("vc")).over(
            Window.orderBy(col("vq"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .crossJoin(broadcast(n))
          .withColumn("dec", expr("(cumlt * 10) div n + 1"))
          .select(col("vq"), col("dec"))
        val cells = cust.groupBy(col("c_mktsegment"), col("c_nationkey"),
            col("vq"))
          .agg(count(lit(1)).as("vcnt"))
          .join(broadcast(decMap), Seq("vq"))
          .groupBy(col("c_mktsegment"), col("c_nationkey"), col("dec"))
          .agg(sum(col("vcnt")).as("cnt"))
          .localCheckpoint() // bounded (class × decile) grid, one scan
        val classes = cells.groupBy(col("c_mktsegment"), col("c_nationkey"))
          .agg(sum(col("cnt")).as("n_class"))
        val glob = cells.groupBy(col("dec")).agg(sum(col("cnt")).as("gcnt"))
        val spine = s.range(1, 11).select(col("id").as("dec")) // long, like the div above
        val wC = Window.partitionBy(col("c_mktsegment"), col("c_nationkey"))
          .orderBy(col("dec"))
        val grid = classes.crossJoin(broadcast(spine))
          .join(cells, Seq("c_mktsegment", "c_nationkey", "dec"), "left")
          .join(broadcast(glob), Seq("dec"), "left")
          .withColumn("cum1", sum(coalesce(col("cnt"), lit(0L)))
            .over(wC.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cumg", sum(coalesce(col("gcnt"), lit(0L)))
            .over(wC.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("dec") < 10) // 9 prefixes; the full sum is always 0
        grid.crossJoin(broadcast(n))
          .withColumn("num",
            abs(col("cum1").cast("decimal(38,0)") * col("n") -
              col("cumg").cast("decimal(38,0)") * col("n_class")))
          .groupBy(col("c_mktsegment"), col("c_nationkey"),
            col("n_class"), col("n"))
          .agg(sum(col("num")).as("tnum"))
          .select(col("c_mktsegment"), col("c_nationkey"),
            col("n_class").as("n_members"),
            Num.r6(col("tnum").cast("double") /
              (lit(9.0) * col("n_class").cast("double") *
                col("n").cast("double"))).as("t_emd"))
          .withColumn("t_breach", col("t_emd") > lit(0.2))
          .orderBy(col("c_mktsegment"), col("c_nationkey"))
      },
      Some("""
        WITH q AS (
          SELECT c_mktsegment, c_nationkey,
            CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT) AS vq
          FROM customer),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
        vals AS (SELECT vq, CAST(COUNT(*) AS BIGINT) AS vc FROM q GROUP BY vq),
        decmap AS (
          SELECT vq,
            (COALESCE(SUM(vc) OVER (ORDER BY vq
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) * 10)
              // n.n + 1 AS dec
          FROM vals CROSS JOIN n),
        cells AS (
          SELECT c_mktsegment, c_nationkey, dec, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM q JOIN decmap USING (vq) GROUP BY 1, 2, 3),
        classes AS (
          SELECT c_mktsegment, c_nationkey, SUM(cnt) AS n_class
          FROM cells GROUP BY 1, 2),
        gtab AS (SELECT dec, SUM(cnt) AS gcnt FROM cells GROUP BY dec),
        spine AS (SELECT CAST(UNNEST(RANGE(1, 11)) AS BIGINT) AS dec),
        grid AS (
          SELECT cl.c_mktsegment, cl.c_nationkey, cl.n_class, sp.dec,
            SUM(COALESCE(ce.cnt, 0)) OVER (
              PARTITION BY cl.c_mktsegment, cl.c_nationkey
              ORDER BY sp.dec
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
            SUM(COALESCE(g.gcnt, 0)) OVER (
              PARTITION BY cl.c_mktsegment, cl.c_nationkey
              ORDER BY sp.dec
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumg
          FROM classes cl CROSS JOIN spine sp
          LEFT JOIN cells ce ON ce.c_mktsegment = cl.c_mktsegment
            AND ce.c_nationkey = cl.c_nationkey AND ce.dec = sp.dec
          LEFT JOIN gtab g ON g.dec = sp.dec
          QUALIFY sp.dec < 10),
        agg AS (
          SELECT gr.c_mktsegment, gr.c_nationkey, gr.n_class, n.n,
            SUM(ABS(CAST(gr.cum1 AS HUGEINT) * n.n
                    - CAST(gr.cumg AS HUGEINT) * gr.n_class)) AS tnum
          FROM grid gr CROSS JOIN n
          GROUP BY 1, 2, 3, 4)
        SELECT c_mktsegment, c_nationkey,
          CAST(n_class AS BIGINT) AS n_members,
          FLOOR((CAST(tnum AS DOUBLE)
                 / (9.0 * CAST(n_class AS DOUBLE) * CAST(n AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS t_emd,
          (FLOOR((CAST(tnum AS DOUBLE)
                 / (9.0 * CAST(n_class AS DOUBLE) * CAST(n AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000) > 0.2 AS t_breach
        FROM agg ORDER BY c_mktsegment, c_nationkey"""),
      "t-closeness audit over the q211 quasi-identifier: EMD between each class's acctbal-decile distribution and the global one (Li et al. 2007)"),

    // ---------------------------------------------------------------- q246
    // Differential-privacy sensitivity audit (Dwork et al. 2006) for
    // the per-event-type count release: under USER-level adjacency
    // (add/remove one user and ALL their rows) the L1 sensitivity of
    // a count is the maximum per-user contribution, not 1 — the gap
    // between the two is exactly how much noisier a correct user-level
    // Laplace mechanism must be than the naive event-level one. One
    // corpus pass to the (event_type × user) contribution frame; the
    // __all__ row folds user totals from that frame, never a second
    // scan. rel_noise_* = Laplace scale (sensitivity/ε at ε=1) over
    // the true count — the relative error each mechanism pays.
    Query(
      "q246_dp_sensitivity",
      (s, d) => {
        val perUT = Tables.events(s, d)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded (type × user) frame, one scan
        val perType = perUT.groupBy(col("event_type"))
          .agg(sum(col("c")).as("n_events"),
            count(lit(1)).as("n_users"), max(col("c")).as("max_contrib"))
        val overall = perUT.groupBy(col("user_id"))
          .agg(sum(col("c")).as("c"))
          .agg(sum(col("c")).as("n_events"),
            count(lit(1)).as("n_users"), max(col("c")).as("max_contrib"))
          .withColumn("event_type", lit("__all__"))
        perType.unionByName(overall.select(col("event_type"),
            col("n_events"), col("n_users"), col("max_contrib")))
          .select(col("event_type").as("segment"),
            col("n_events"), col("n_users"),
            col("max_contrib").as("max_user_contrib"),
            Num.r6(col("n_events").cast("double") / col("n_users"))
              .as("mean_user_contrib"),
            Num.r6(lit(1.0) / col("n_events")).as("rel_noise_event"),
            Num.r6(col("max_contrib").cast("double") / col("n_events"))
              .as("rel_noise_user"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH per_ut AS (
          SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, user_id),
        per_type AS (
          SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_events,
            CAST(COUNT(*) AS BIGINT) AS n_users,
            CAST(MAX(c) AS BIGINT) AS max_contrib
          FROM per_ut GROUP BY event_type),
        per_user AS (
          SELECT user_id, CAST(SUM(c) AS BIGINT) AS c
          FROM per_ut GROUP BY user_id),
        overall AS (
          SELECT '__all__' AS event_type, CAST(SUM(c) AS BIGINT) AS n_events,
            CAST(COUNT(*) AS BIGINT) AS n_users,
            CAST(MAX(c) AS BIGINT) AS max_contrib
          FROM per_user),
        uni AS (SELECT * FROM per_type UNION ALL SELECT * FROM overall)
        SELECT event_type AS segment, n_events, n_users,
          max_contrib AS max_user_contrib,
          ${Num.sql("CAST(n_events AS DOUBLE) / n_users", 6)}
            AS mean_user_contrib,
          ${Num.sql("1.0 / n_events", 6)} AS rel_noise_event,
          ${Num.sql("CAST(max_contrib AS DOUBLE) / n_events", 6)}
            AS rel_noise_user
        FROM uni ORDER BY segment"""),
      "user-level DP sensitivity audit: max per-user contribution per count cell vs event-level sensitivity 1, with Laplace relative-noise comparison (Dwork et al. 2006)"),

    // ---------------------------------------------------------------- q247
    // PII incidence scan per source: email / IPv4 / phone patterns
    // plus Luhn-validated 13–16-digit runs (the check that separates
    // a real card number from a random digit string) — the release
    // gate a training corpus runs before anything ships. Patterns are
    // deliberately in the RE2 ∩ java.util.regex common subset so both
    // engines match identically. Luhn folds each candidate's digits
    // right-to-left with the double-every-second rule via one HOF over
    // a ≤16-element sequence — candidate cardinality is corpus-sparse,
    // so the interpreted lambda never sees hot-path volume.
    Query(
      "q247_pii_scan",
      (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
        val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
        val docs = Tables.documents(s, d)
        val flags = docs.select(col("source"),
            col("text").rlike(emailRe).as("he"),
            col("text").rlike(ipv4Re).as("hi"),
            col("text").rlike(phoneRe).as("hp"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("he"), 1L).otherwise(0L)).as("docs_email"),
            sum(when(col("hi"), 1L).otherwise(0L)).as("docs_ipv4"),
            sum(when(col("hp"), 1L).otherwise(0L)).as("docs_phone"),
            sum(when(col("he") || col("hi") || col("hp"), 1L).otherwise(0L))
              .as("docs_any"))
        val dig = (i: org.apache.spark.sql.Column) =>
          reverse(col("num")).substr(i, lit(1)).cast("int")
        val luhn = docs
          .select(col("source"),
            explode(expr("regexp_extract_all(text, '[0-9]{13,16}', 0)"))
              .as("num"))
          .withColumn("chk", aggregate(
            sequence(lit(1), length(col("num"))), lit(0),
            (acc, i) => {
              val x = dig(i)
              acc + when(i % 2 === 0,
                when(x * 2 > 9, x * 2 - 9).otherwise(x * 2)).otherwise(x)
            }))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("luhn_candidates"),
            sum(when(col("chk") % 10 === 0, 1L).otherwise(0L)).as("luhn_valid"))
        flags.join(luhn, Seq("source"), "left")
          .select(col("source"), col("n_docs"), col("docs_email"),
            col("docs_ipv4"), col("docs_phone"),
            coalesce(col("luhn_candidates"), lit(0L)).as("luhn_candidates"),
            coalesce(col("luhn_valid"), lit(0L)).as("luhn_valid"),
            Num.r6(col("docs_any").cast("double") / col("n_docs"))
              .as("pii_doc_share"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH f AS (
          SELECT source,
            CASE WHEN regexp_matches(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
              THEN 1 ELSE 0 END AS he,
            CASE WHEN regexp_matches(text,
              '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')
              THEN 1 ELSE 0 END AS hi,
            CASE WHEN regexp_matches(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')
              THEN 1 ELSE 0 END AS hp
          FROM documents),
        agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(he) AS BIGINT) AS docs_email,
            CAST(SUM(hi) AS BIGINT) AS docs_ipv4,
            CAST(SUM(hp) AS BIGINT) AS docs_phone,
            CAST(SUM(CASE WHEN he + hi + hp > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS docs_any
          FROM f GROUP BY source),
        cand AS (
          SELECT source,
            unnest(regexp_extract_all(text, '[0-9]{13,16}')) AS num
          FROM documents),
        chk AS (
          SELECT source, list_sum(
            [CASE WHEN i % 2 = 0 THEN
               (CASE WHEN 2 * CAST(substring(reverse(num), i, 1) AS INT) > 9
                 THEN 2 * CAST(substring(reverse(num), i, 1) AS INT) - 9
                 ELSE 2 * CAST(substring(reverse(num), i, 1) AS INT) END)
             ELSE CAST(substring(reverse(num), i, 1) AS INT) END
             FOR i IN range(1, length(num) + 1)]) AS chk
          FROM cand),
        luhn AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS luhn_candidates,
            CAST(SUM(CASE WHEN chk % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS luhn_valid
          FROM chk GROUP BY source)
        SELECT a.source, n_docs, docs_email, docs_ipv4, docs_phone,
          CAST(COALESCE(luhn_candidates, 0) AS BIGINT) AS luhn_candidates,
          CAST(COALESCE(luhn_valid, 0) AS BIGINT) AS luhn_valid,
          ${Num.sql("CAST(docs_any AS DOUBLE) / n_docs", 6)} AS pii_doc_share
        FROM agg a LEFT JOIN luhn l ON a.source = l.source
        ORDER BY a.source"""),
      "PII incidence per source: email/IPv4/phone regex presence plus Luhn-validated 13-16-digit runs, RE2-and-Java-compatible patterns")
  )
}
