package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Product-analytics and experimentation continuation, batch 24: cohort
  * retention, categorical mutual information, the Cochran–Mantel–
  * Haenszel stratified test, and Gumbel extreme-value return levels.
  * Exactness discipline as everywhere: integer weeks/counts, pico- or
  * micro-quantized per-cell double terms summed as int64 (grid-bounded
  * term counts), identical IEEE expression trees, `Num.r4/r6` last.
  */
object Cohorts {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q271
    // Weekly cohort retention matrix: users are cohorted by the epoch
    // week of their first event (absolute integer weeks — no engine
    // week-truncation semantics involved), and retention at offsets
    // 0–3 is the share of the cohort active in week cohort+offset.
    // Shape: one distinct (user, week) pass + a per-user min — both on
    // the user_id exchange; the (cohort × offset) grid is bounded by
    // the time span, never the row count.
    Query(
      "q271_cohort_retention",
      (s, d) => {
        val wk = Tables.events(s, d)
          .select(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
        val actives = wk.distinct()
        val cohorts = wk.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
        val sizes = cohorts.groupBy(col("cw")).agg(count(lit(1)).as("n_cohort"))
        actives.join(cohorts, Seq("user_id"))
          .select(col("cw"), (col("wk") - col("cw")).as("wk_offset"))
          .filter(col("wk_offset") >= 0 && col("wk_offset") <= 3)
          .groupBy(col("cw"), col("wk_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, Seq("cw"))
          .select(col("cw").as("cohort_wk"), col("wk_offset"), col("n_cohort"),
            col("n_active"),
            Num.r4(col("n_active").cast("double") / col("n_cohort").cast("double"))
              .as("retention"))
          .orderBy(col("cohort_wk"), col("wk_offset"))
      },
      Some("""
        WITH wk AS (
          SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events),
        actives AS (SELECT DISTINCT user_id, wk FROM wk),
        cohorts AS (SELECT user_id, MIN(wk) AS cw FROM wk GROUP BY user_id),
        sizes AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS n_cohort
                  FROM cohorts GROUP BY cw),
        cells AS (
          SELECT cw, wk - cw AS wk_offset, CAST(COUNT(*) AS BIGINT) AS n_active
          FROM actives JOIN cohorts USING (user_id)
          WHERE wk - cw BETWEEN 0 AND 3
          GROUP BY cw, wk - cw)
        SELECT cw AS cohort_wk, wk_offset, n_cohort, n_active,
          FLOOR((CAST(n_active AS DOUBLE) / n_cohort) * 10000 + 0.500001) / 10000
            AS retention
        FROM cells JOIN sizes USING (cw)
        ORDER BY cohort_wk, wk_offset"""),
      "Weekly cohort retention matrix (absolute epoch weeks, offsets 0-3): distinct-activity pass + per-user min, grid-bounded output"),

    // ---------------------------------------------------------------- q272
    // Mutual information (nats) between document language and source,
    // with the entropies and the normalized MI — the effect-size
    // companion to q198's chi-square independence test (chi2 says
    // "dependent", MI says "by how many bits"). Every p·ln(·) term is
    // pico-quantized BEFORE the grid sum (≤ langs×sources terms), so
    // the sums are exact; NMI assembles from the three quantized
    // totals.
    Query(
      "q272_mutual_info",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val joint = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("nls"))
        val byL = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
        val byS = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        val tot = docs.agg(count(lit(1)).as("n"))
        val miq = joint.join(broadcast(byL), Seq("lang"))
          .join(broadcast(byS), Seq("source"))
          .crossJoin(broadcast(tot))
          .select(floor(
            (col("nls").cast("double") / col("n").cast("double")) *
              log((col("n") * col("nls")).cast("double") /
                (col("nl") * col("ns")).cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("tq"))
          .agg(sum(col("tq")).as("miq"))
        val hlq = byL.crossJoin(broadcast(tot))
          .select(floor(-(col("nl").cast("double") / col("n").cast("double")) *
            log(col("nl").cast("double") / col("n").cast("double"))
            * lit(1e12) + lit(0.5)).cast("long").as("tq"))
          .agg(sum(col("tq")).as("hlq"))
        val hsq = byS.crossJoin(broadcast(tot))
          .select(floor(-(col("ns").cast("double") / col("n").cast("double")) *
            log(col("ns").cast("double") / col("n").cast("double"))
            * lit(1e12) + lit(0.5)).cast("long").as("tq"))
          .agg(sum(col("tq")).as("hsq"))
        miq.crossJoin(broadcast(hlq)).crossJoin(broadcast(hsq))
          .crossJoin(broadcast(tot))
          .select(col("n"),
            Num.r6(col("miq").cast("double") / lit(1e12)).as("mi_nats"),
            Num.r6(col("hlq").cast("double") / lit(1e12)).as("h_lang"),
            Num.r6(col("hsq").cast("double") / lit(1e12)).as("h_source"),
            Num.r6((col("miq").cast("double") / lit(1e12)) /
              sqrt((col("hlq").cast("double") / lit(1e12)) *
                (col("hsq").cast("double") / lit(1e12)))).as("nmi"))
      },
      Some("""
        WITH joint AS (
          SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS nls
          FROM documents GROUP BY lang, source),
        byl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
                FROM documents GROUP BY lang),
        bys AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
                FROM documents GROUP BY source),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        miq AS (
          SELECT SUM(CAST(FLOOR(
            (CAST(nls AS DOUBLE) / n) *
            LN(CAST(n * nls AS DOUBLE) / CAST(nl * ns AS DOUBLE))
            * 1e12 + 0.5) AS BIGINT)) AS miq
          FROM joint JOIN byl USING (lang) JOIN bys USING (source)
          CROSS JOIN tot),
        hlq AS (
          SELECT SUM(CAST(FLOOR(
            -(CAST(nl AS DOUBLE) / n) * LN(CAST(nl AS DOUBLE) / n)
            * 1e12 + 0.5) AS BIGINT)) AS hlq
          FROM byl CROSS JOIN tot),
        hsq AS (
          SELECT SUM(CAST(FLOOR(
            -(CAST(ns AS DOUBLE) / n) * LN(CAST(ns AS DOUBLE) / n)
            * 1e12 + 0.5) AS BIGINT)) AS hsq
          FROM bys CROSS JOIN tot)
        SELECT n,
          FLOOR((CAST(miq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS mi_nats,
          FLOOR((CAST(hlq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS h_lang,
          FLOOR((CAST(hsq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS h_source,
          FLOOR(((CAST(miq AS DOUBLE) / 1e12)
                 / SQRT((CAST(hlq AS DOUBLE) / 1e12) * (CAST(hsq AS DOUBLE) / 1e12)))
                * 1000000 + 0.500001) / 1000000 AS nmi
        FROM miq CROSS JOIN hlq CROSS JOIN hsq CROSS JOIN tot"""),
      "Mutual information + NMI between lang and source (pico-quantized exact term sums over the bounded grid)"),

    // ---------------------------------------------------------------- q273
    // Cochran–Mantel–Haenszel test pooled across event-type strata: do
    // the md5 A/B arms (q181's split) differ in the rate of high-value
    // events (value ≥ 100), adjusting for event type? Per-stratum
    // 2×2 tables are exact integers; the E/V/odds terms are
    // micro-quantized per stratum (5 terms) so the pooled sums are
    // exact; the continuity-corrected χ²₁ and the Mantel–Haenszel
    // pooled odds ratio assemble from the quantized totals.
    Query(
      "q273_cmh",
      (s, d) => {
        val tab = Tables.events(s, d)
          .select(col("event_type"),
            (graft.ext.Dedup.h60(
              concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            (floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long") >=
              lit(100000000L)).cast("long").as("succ"))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("arm") === 0 && col("succ") === 1, 1L).otherwise(0L)).as("a"),
            sum(when(col("arm") === 0 && col("succ") === 0, 1L).otherwise(0L)).as("b"),
            sum(when(col("arm") === 1 && col("succ") === 1, 1L).otherwise(0L)).as("c"),
            sum(when(col("arm") === 1 && col("succ") === 0, 1L).otherwise(0L)).as("dd"))
          .withColumn("nk", col("a") + col("b") + col("c") + col("dd"))
          .filter(col("nk") >= 2)
        val terms = tab.select(
          floor((col("a").cast("double") -
            ((col("a") + col("b")) * (col("a") + col("c"))).cast("double") /
              col("nk").cast("double")) * lit(1e6) + lit(0.5)).cast("long").as("numq"),
          floor(((col("a") + col("b")).cast("double") *
            (col("c") + col("dd")).cast("double") *
            (col("a") + col("c")).cast("double") *
            (col("b") + col("dd")).cast("double") /
            (col("nk").cast("double") * col("nk").cast("double") *
              (col("nk") - 1).cast("double"))) * lit(1e6) + lit(0.5))
            .cast("long").as("varq"),
          floor(((col("a") * col("dd")).cast("double") / col("nk").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long").as("ornq"),
          floor(((col("b") * col("c")).cast("double") / col("nk").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long").as("ordq"))
        terms.agg(count(lit(1)).as("n_strata"),
          sum(col("numq")).as("snum"), sum(col("varq")).as("svar"),
          sum(col("ornq")).as("sorn"), sum(col("ordq")).as("sord"))
          .filter(col("svar") > 0 && col("sord") > 0)
          .select(col("n_strata"),
            Num.r4(pow(greatest(abs(col("snum").cast("double") / lit(1e6)) - lit(0.5),
              lit(0.0)), 2) / (col("svar").cast("double") / lit(1e6))).as("cmh_chi2"),
            Num.r4((col("sorn").cast("double") / lit(1e6)) /
              (col("sord").cast("double") / lit(1e6))).as("pooled_or"),
            (pow(greatest(abs(col("snum").cast("double") / lit(1e6)) - lit(0.5),
              lit(0.0)), 2) / (col("svar").cast("double") / lit(1e6)) >
              lit(3.841458820694124)).as("significant"))
      },
      Some(s"""
        WITH tab AS (
          SELECT event_type,
            CAST(SUM(CASE WHEN arm = 0 AND succ THEN 1 ELSE 0 END) AS BIGINT) AS a,
            CAST(SUM(CASE WHEN arm = 0 AND NOT succ THEN 1 ELSE 0 END) AS BIGINT) AS b,
            CAST(SUM(CASE WHEN arm = 1 AND succ THEN 1 ELSE 0 END) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN arm = 1 AND NOT succ THEN 1 ELSE 0 END) AS BIGINT) AS dd
          FROM (
            SELECT event_type,
              ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
              CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) >= 100000000 AS succ
            FROM events)
          GROUP BY event_type),
        sized AS (
          SELECT *, a + b + c + dd AS nk FROM tab WHERE a + b + c + dd >= 2),
        terms AS (
          SELECT
            CAST(FLOOR((CAST(a AS DOUBLE)
              - CAST((a + b) * (a + c) AS DOUBLE) / CAST(nk AS DOUBLE))
              * 1e6 + 0.5) AS BIGINT) AS numq,
            CAST(FLOOR((CAST(a + b AS DOUBLE) * CAST(c + dd AS DOUBLE)
              * CAST(a + c AS DOUBLE) * CAST(b + dd AS DOUBLE)
              / (CAST(nk AS DOUBLE) * CAST(nk AS DOUBLE) * CAST(nk - 1 AS DOUBLE)))
              * 1e6 + 0.5) AS BIGINT) AS varq,
            CAST(FLOOR((CAST(a * dd AS DOUBLE) / CAST(nk AS DOUBLE))
              * 1e6 + 0.5) AS BIGINT) AS ornq,
            CAST(FLOOR((CAST(b * c AS DOUBLE) / CAST(nk AS DOUBLE))
              * 1e6 + 0.5) AS BIGINT) AS ordq
          FROM sized),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
            CAST(SUM(numq) AS BIGINT) AS snum, CAST(SUM(varq) AS BIGINT) AS svar,
            CAST(SUM(ornq) AS BIGINT) AS sorn, CAST(SUM(ordq) AS BIGINT) AS sord
          FROM terms)
        SELECT n_strata,
          FLOOR((POWER(GREATEST(ABS(CAST(snum AS DOUBLE) / 1e6) - 0.5, 0.0), 2)
                 / (CAST(svar AS DOUBLE) / 1e6)) * 10000 + 0.500001) / 10000
            AS cmh_chi2,
          FLOOR(((CAST(sorn AS DOUBLE) / 1e6) / (CAST(sord AS DOUBLE) / 1e6))
                * 10000 + 0.500001) / 10000 AS pooled_or,
          (POWER(GREATEST(ABS(CAST(snum AS DOUBLE) / 1e6) - 0.5, 0.0), 2)
             / (CAST(svar AS DOUBLE) / 1e6) > 3.841458820694124) AS significant
        FROM agg WHERE svar > 0 AND sord > 0"""),
      "Cochran-Mantel-Haenszel test + MH pooled odds ratio across event-type strata for the md5 A/B arms (micro-quantized exact stratum terms)"),

    // ---------------------------------------------------------------- q275
    // Gumbel extreme-value return levels per event type: hourly block
    // maxima fit by the method of moments (σ̂ = s·√6/π, μ̂ = x̄ − γσ̂)
    // and the 100-block return level μ̂ − σ̂·ln(−ln(1−1/100)) — "the
    // hourly peak exceeded once per ~100 hours", the capacity-planning
    // number. Block maxima are exact micro-ints; moments go through
    // DECIMAL sums; the ln(−ln(0.99)) constant is a shared literal so
    // no transcendental runs at query time on either engine.
    Query(
      "q275_gumbel_evt",
      (s, d) => {
        val blocks = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
          .agg(max(floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long")).as("bx"))
        val mom = blocks.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("bx")).as("sm"),
            sum((col("bx") * col("bx")).cast("decimal(38,0)")).as("sq"))
          .filter(col("n_blocks") >= 10)
        val fit = mom
          .withColumn("meanv",
            col("sm").cast("double") / col("n_blocks").cast("double") / lit(1e6))
          .withColumn("varv",
            (col("sq").cast("double") - col("sm").cast("double") *
              col("sm").cast("double") / col("n_blocks").cast("double")) /
              (col("n_blocks") - 1).cast("double") / lit(1e12))
          .filter(col("varv") > 0)
          .withColumn("sigma", sqrt(col("varv")) * sqrt(lit(6.0)) / lit(math.Pi))
          .withColumn("mu", col("meanv") - lit(0.5772156649015329) * col("sigma"))
          .withColumn("rl100", col("mu") - col("sigma") * lit(-4.600149226776579))
        fit.select(col("event_type"), col("n_blocks"),
          Num.r4(col("meanv")).as("mean_block_max"),
          Num.r4(col("sigma")).as("gumbel_sigma"),
          Num.r4(col("mu")).as("gumbel_mu"),
          Num.r4(col("rl100")).as("return_level_100"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH blocks AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS hh,
            MAX(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS bx
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        mom AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_blocks,
            CAST(SUM(bx) AS BIGINT) AS sm,
            SUM(CAST(bx AS HUGEINT) * bx) AS sq
          FROM blocks GROUP BY event_type
          HAVING COUNT(*) >= 10),
        fit0 AS (
          SELECT event_type, n_blocks,
            CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE) / 1e6 AS meanv,
            (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
               / CAST(n_blocks AS DOUBLE)) / CAST(n_blocks - 1 AS DOUBLE) / 1e12
              AS varv
          FROM mom),
        fit1 AS (
          SELECT *, SQRT(varv) * SQRT(6.0) / PI() AS sigma
          FROM fit0 WHERE varv > 0),
        fit2 AS (
          SELECT *, meanv - 0.5772156649015329 * sigma AS mu FROM fit1)
        SELECT event_type, n_blocks,
          FLOOR(meanv * 10000 + 0.500001) / 10000 AS mean_block_max,
          FLOOR(sigma * 10000 + 0.500001) / 10000 AS gumbel_sigma,
          FLOOR(mu * 10000 + 0.500001) / 10000 AS gumbel_mu,
          FLOOR((mu - sigma * -4.600149226776579) * 10000 + 0.500001) / 10000
            AS return_level_100
        FROM fit2 ORDER BY event_type"""),
      "Gumbel method-of-moments fit on hourly block maxima per event type with the 100-block return level (exact integer block maxima, shared transcendental literals)"),

    // ---------------------------------------------------------------- q376
    // Retention half-life: OLS of ln(retention_w) on the week offset
    // w = 0..8 (the q335 curve), slope → half-life = −ln 2 / slope —
    // the single number a growth model quotes from the whole decay
    // curve. Per-offset ln terms are pico-quantized integers BEFORE
    // the ≤9-term regression sums (q334 discipline), so num/den are
    // exact int64 and the slope is one double division. Offsets with
    // zero retained users cannot occur (they'd simply be absent);
    // non-negative slopes → NULL half-life (documented).
    Query(
      "q376_retention_halflife",
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
        val nUsers = first.agg(count(lit(1)).as("nu"))
        val offs = act.join(first, Seq("user_id"))
          .select(col("user_id"), (col("wk") - col("w0")).as("off"))
          .filter(col("off") <= 8)
          .distinct()
          .groupBy(col("off")).agg(count(lit(1)).as("retained"))
        val terms = offs.crossJoin(broadcast(nUsers))
          .select(col("off"),
            floor(log(col("retained").cast("double") / col("nu").cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("lq"))
        terms.agg(count(lit(1)).as("n_offsets"),
            sum(col("off")).as("sw"), sum(col("off") * col("off")).as("sww"),
            sum(col("lq")).as("sl"), sum(col("off") * col("lq")).as("swl"))
          .select(col("n_offsets"),
            Num.r6((col("n_offsets") * col("swl") - col("sw") * col("sl"))
              .cast("double") /
              (col("n_offsets") * col("sww") - col("sw") * col("sw")).cast("double")
              / lit(1e12)).as("decay_slope"),
            when((col("n_offsets") * col("swl") - col("sw") * col("sl")) < 0,
              Num.r4(-log(lit(2.0)) /
                ((col("n_offsets") * col("swl") - col("sw") * col("sl"))
                  .cast("double") /
                  (col("n_offsets") * col("sww") - col("sw") * col("sw"))
                    .cast("double") / lit(1e12))))
              .as("halflife_weeks"))
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
          FROM events),
        first AS (SELECT user_id, MIN(wk) AS w0 FROM act GROUP BY user_id),
        nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM first),
        offs AS (
          SELECT off, CAST(COUNT(*) AS BIGINT) AS retained FROM (
            SELECT DISTINCT act.user_id, wk - w0 AS off
            FROM act JOIN first ON first.user_id = act.user_id
            WHERE wk - w0 <= 8)
          GROUP BY off),
        terms AS (
          SELECT off,
            CAST(FLOOR(LN(CAST(retained AS DOUBLE) / nu) * 1e12 + 0.5)
              AS BIGINT) AS lq
          FROM offs CROSS JOIN nu),
        fit AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_offsets,
            CAST(SUM(off) AS BIGINT) AS sw, CAST(SUM(off * off) AS BIGINT) AS sww,
            CAST(SUM(lq) AS BIGINT) AS sl, CAST(SUM(off * lq) AS BIGINT) AS swl
          FROM terms)
        SELECT n_offsets,
          FLOOR((CAST(n_offsets * swl - sw * sl AS DOUBLE)
                 / CAST(n_offsets * sww - sw * sw AS DOUBLE) / 1e12)
                * 1000000 + 0.500001) / 1000000 AS decay_slope,
          CASE WHEN n_offsets * swl - sw * sl < 0 THEN
            FLOOR((-LN(2.0) / (CAST(n_offsets * swl - sw * sl AS DOUBLE)
                   / CAST(n_offsets * sww - sw * sw AS DOUBLE) / 1e12))
                  * 10000 + 0.500001) / 10000 END AS halflife_weeks
        FROM fit"""),
      "Retention half-life from OLS of ln retention on week offset 0-8 (pico-quantized ln terms, exact integer regression sums, -ln2/slope)"),

    // ---------------------------------------------------------------- q416
    // Customer-migration matrix: classify every user active in the
    // FIRST half of the span into activity terciles (low/mid/high by
    // ceil-rank bounds on the half-1 count histogram), then cross-tab
    // against their second-half segment under the SAME bounds — plus
    // 'churn' for users with no H2 events. The segment-transition
    // view (who upgraded, who left) that q104's cohort retention and
    // q346's static concentration can't show. Halves split at the
    // exact integer µs midpoint (q364's convention); tercile bounds
    // come from a bounded count histogram, never a global user sort;
    // H2-only users are excluded (documented — no H1 segment exists
    // for them).
    Query(
      "q416_segment_migration",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val span = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        val per = ev.crossJoin(broadcast(span))
          .groupBy(col("user_id"))
          .agg(sum(when(col("us") <= expr("mn + (mx - mn) div 2"), 1L)
            .otherwise(0L)).as("c1"),
            sum(when(col("us") > expr("mn + (mx - mn) div 2"), 1L)
              .otherwise(0L)).as("c2"))
          .filter(col("c1") > 0)
          .localCheckpoint() // feeds the histogram AND the cross-tab
        val hist = per.groupBy(col("c1").as("v")).agg(count(lit(1)).as("c"))
        val wc = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wc))
        val nu = cum.agg(max(col("cum")).as("n"))
        val t1 = cum.crossJoin(broadcast(nu))
          .filter(col("cum") >= expr("(n + 2) div 3")).agg(min(col("v")).as("t1"))
        val t2 = cum.crossJoin(broadcast(nu))
          .filter(col("cum") >= expr("(2 * n + 2) div 3")).agg(min(col("v")).as("t2"))
        def seg(c: org.apache.spark.sql.Column,
                lo: org.apache.spark.sql.Column,
                hi: org.apache.spark.sql.Column) =
          when(c === 0, lit("churn")).when(c <= lo, lit("low"))
            .when(c <= hi, lit("mid")).otherwise(lit("high"))
        val tab = per.crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
          .select(seg(col("c1"), col("t1"), col("t2")).as("seg_h1"),
            seg(col("c2"), col("t1"), col("t2")).as("seg_h2"))
          .groupBy(col("seg_h1"), col("seg_h2")).agg(count(lit(1)).as("n_users"))
        val rows = tab.groupBy(col("seg_h1")).agg(sum(col("n_users")).as("rt"))
        tab.join(rows, Seq("seg_h1"))
          .select(col("seg_h1"), col("seg_h2"), col("n_users"),
            Num.r4(col("n_users").cast("double") / col("rt").cast("double"))
              .as("row_share"))
          .orderBy(col("seg_h1"), col("seg_h2"))
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        span AS (SELECT CAST(MIN(us) AS BIGINT) AS mn,
                   CAST(MAX(us) AS BIGINT) AS mx FROM ev),
        per AS (
          SELECT user_id,
            CAST(SUM(CASE WHEN us <= mn + (mx - mn) // 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN us > mn + (mx - mn) // 2 THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
          FROM ev CROSS JOIN span GROUP BY user_id
          HAVING SUM(CASE WHEN us <= mn + (mx - mn) // 2 THEN 1 ELSE 0 END) > 0),
        hist AS (SELECT c1 AS v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM per GROUP BY c1),
        cum AS (SELECT v, SUM(c) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM hist),
        nu AS (SELECT CAST(MAX(cum) AS BIGINT) AS n FROM cum),
        t1 AS (SELECT CAST(MIN(v) AS BIGINT) AS t1 FROM cum CROSS JOIN nu
               WHERE cum >= (n + 2) // 3),
        t2 AS (SELECT CAST(MIN(v) AS BIGINT) AS t2 FROM cum CROSS JOIN nu
               WHERE cum >= (2 * n + 2) // 3),
        tab AS (
          SELECT
            CASE WHEN c1 = 0 THEN 'churn' WHEN c1 <= t1 THEN 'low'
                 WHEN c1 <= t2 THEN 'mid' ELSE 'high' END AS seg_h1,
            CASE WHEN c2 = 0 THEN 'churn' WHEN c2 <= t1 THEN 'low'
                 WHEN c2 <= t2 THEN 'mid' ELSE 'high' END AS seg_h2,
            CAST(COUNT(*) AS BIGINT) AS n_users
          FROM per CROSS JOIN t1 CROSS JOIN t2
          GROUP BY 1, 2),
        rows_ AS (SELECT seg_h1, CAST(SUM(n_users) AS BIGINT) AS rt
                  FROM tab GROUP BY seg_h1)
        SELECT seg_h1, seg_h2, n_users,
          FLOOR((CAST(n_users AS DOUBLE) / rt) * 10000 + 0.500001) / 10000
            AS row_share
        FROM tab JOIN rows_ USING (seg_h1)
        ORDER BY seg_h1, seg_h2"""),
      "Activity-tercile migration matrix across the exact midpoint: ceil-rank tercile bounds from the H1 count histogram, churn column, row shares")
  )
}
