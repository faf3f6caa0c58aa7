package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-model continuation, batch 39: negative-binomial moment fit,
  * the Poisson rate-ratio A/B test on the shared md5 arms, and the
  * two-sample Cramér–von Mises statistic from cumulative histograms.
  */
object Rates {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q327
    // Negative-binomial moment fit per event type on the zero-filled
    // daily grid: r = m²/(v−m), NB zero probability (r/(r+m))^r via
    // EXP/LN, against the observed zero share — the distribution
    // q304's dispersion ratio says you need. Types with v ≤ m report
    // NULL r (Poisson or under-dispersed).
    Query(
      "q327_negbin_fit",
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val days = cell.select(col("day")).distinct()
        val grid = cell.select(col("event_type")).distinct()
          .crossJoin(broadcast(days))
          .join(cell, Seq("event_type", "day"), "left")
          .na.fill(0L, Seq("c"))
        val mo = grid.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            Exact.m2("c", "c").as("sc2"),
            count(when(col("c") === 0, 1)).as("nz"))
          .select(col("event_type"), col("n"), col("nz"),
            (col("sc").cast("double") / col("n").cast("double")).as("m"),
            ((col("sc2").cast("double") - col("sc").cast("double") *
              col("sc").cast("double") / col("n").cast("double")) /
              (col("n").cast("double") - lit(1.0))).as("v"))
        mo.select(col("event_type"), col("n").as("n_days"),
            Num.r4(col("m")).as("mean_daily"),
            when(col("v") > col("m"),
              Num.r4(col("m") * col("m") / (col("v") - col("m")))).as("nb_r"),
            when(col("v") > col("m"),
              Num.r6(exp((col("m") * col("m") / (col("v") - col("m"))) *
                log((col("m") * col("m") / (col("v") - col("m"))) /
                  ((col("m") * col("m") / (col("v") - col("m"))) + col("m"))))))
              .as("zero_nb"),
            Num.r6(col("nz").cast("double") / col("n").cast("double"))
              .as("zero_obs"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH cell AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        grid AS (
          SELECT t.event_type, dd.day, COALESCE(c, 0) AS c
          FROM (SELECT DISTINCT event_type FROM cell) t
          CROSS JOIN (SELECT DISTINCT day FROM cell) dd
          LEFT JOIN cell ON cell.event_type = t.event_type
            AND cell.day = dd.day),
        mo AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE c = 0) AS BIGINT) AS nz,
            CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m,
            (CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
              - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*)) /
              (CAST(COUNT(*) AS DOUBLE) - 1.0) AS v
          FROM grid GROUP BY event_type)
        SELECT event_type, n AS n_days,
          FLOOR(m * 10000 + 0.500001) / 10000 AS mean_daily,
          CASE WHEN v > m
            THEN FLOOR((m * m / (v - m)) * 10000 + 0.500001) / 10000 END AS nb_r,
          CASE WHEN v > m
            THEN FLOOR(EXP((m * m / (v - m)) *
                   LN((m * m / (v - m)) / ((m * m / (v - m)) + m)))
                 * 1000000 + 0.500001) / 1000000 END AS zero_nb,
          FLOOR((CAST(nz AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS zero_obs
        FROM mo ORDER BY event_type"""),
      "Negative-binomial moment fit per event type (r, NB zero prob vs observed zeros) on the zero-filled day grid"),

    // ---------------------------------------------------------------- q328
    // Poisson rate-ratio A/B test on the shared md5 arms: events per
    // exposed user between arm 0 and arm 1, Wald z on the log rate
    // ratio (1/c0 + 1/c1 variance) — the count-metric companion to
    // q181's Welch and q194's proportion z. Exact counts; one LN.
    Query(
      "q328_rate_ratio",
      (s, d) => {
        val armed = Tables.events(s, d)
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            col("user_id"))
        val g = armed.groupBy(col("arm"))
          .agg(count(lit(1)).as("c"), countDistinct(col("user_id")).as("u"))
        val w = g.agg(
          max(when(col("arm") === 0, col("c"))).as("c0"),
          max(when(col("arm") === 0, col("u"))).as("u0"),
          max(when(col("arm") === 1, col("c"))).as("c1"),
          max(when(col("arm") === 1, col("u"))).as("u1"))
        w.select(col("c0"), col("u0"), col("c1"), col("u1"),
            Num.r4((col("c1").cast("double") / col("u1").cast("double")) /
              (col("c0").cast("double") / col("u0").cast("double")))
              .as("rate_ratio"),
            Num.r4(log((col("c1").cast("double") / col("u1").cast("double")) /
              (col("c0").cast("double") / col("u0").cast("double"))) /
              sqrt(lit(1.0) / col("c0").cast("double") +
                lit(1.0) / col("c1").cast("double"))).as("wald_z"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")}
            % 2 AS arm, user_id
          FROM events),
        g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS c,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u
              FROM armed GROUP BY arm),
        w AS (
          SELECT
            MAX(CASE WHEN arm = 0 THEN c END) AS c0,
            MAX(CASE WHEN arm = 0 THEN u END) AS u0,
            MAX(CASE WHEN arm = 1 THEN c END) AS c1,
            MAX(CASE WHEN arm = 1 THEN u END) AS u1
          FROM g)
        SELECT c0, u0, c1, u1,
          FLOOR(((CAST(c1 AS DOUBLE) / u1) / (CAST(c0 AS DOUBLE) / u0))
                * 10000 + 0.500001) / 10000 AS rate_ratio,
          FLOOR((LN((CAST(c1 AS DOUBLE) / u1) / (CAST(c0 AS DOUBLE) / u0)) /
                 SQRT(1.0 / c0 + 1.0 / c1)) * 10000 + 0.500001) / 10000
            AS wald_z
        FROM w"""),
      "Poisson rate-ratio test between md5 A/B arms: events per exposed user, Wald z on the log ratio"),

    // ---------------------------------------------------------------- q329
    // Two-sample Cramér–von Mises between en and non-en document
    // lengths: T = (nm/(n+m)²)·Σ_pooled (F_n(x) − G_m(x))², the
    // quadratic-EDF companion to q174's KS and q315's AD. Per-value
    // EDF gaps come from the cumulative histogram as exact rationals
    // (micro-quantized squares weighted by pooled multiplicity), so
    // T is bit-stable cross-engine.
    Query(
      "q329_cramer_von_mises",
      (s, d) => {
        val hist = Tables.documents(s, d)
          .select((col("lang") === "en").as("isa"), col("n_chars").as("v"))
          .groupBy(col("v"))
          .agg(count(when(col("isa"), 1)).as("ca"),
            count(when(!col("isa"), 1)).as("cb"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cuma", sum(col("ca")).over(wV))
          .withColumn("cumb", sum(col("cb")).over(wV))
        val tot = cum.agg(max(col("cuma")).as("na"), max(col("cumb")).as("nb"))
        val terms = cum.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"),
            ((col("ca") + col("cb")).cast("decimal(38,0)") *
              floor((col("cuma").cast("double") / col("na").cast("double") -
                col("cumb").cast("double") / col("nb").cast("double")) *
                (col("cuma").cast("double") / col("na").cast("double") -
                  col("cumb").cast("double") / col("nb").cast("double"))
                * lit(1e12) + lit(0.5)).cast("long")).as("term"))
          .groupBy(col("na"), col("nb")).agg(sum(col("term")).as("st"))
        terms.select(col("na").as("n_en"), col("nb").as("n_other"),
          Num.r6(col("na").cast("double") * col("nb").cast("double") /
            ((col("na") + col("nb")).cast("double") *
              (col("na") + col("nb")).cast("double")) *
            (col("st").cast("double") / lit(1e12))).as("cvm_stat"))
      },
      Some("""
        WITH hist AS (
          SELECT n_chars AS v,
            CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS cb
          FROM documents GROUP BY n_chars),
        cum AS (
          SELECT v, ca, cb,
            SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
          FROM hist
          WINDOW w AS (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (SELECT CAST(MAX(cuma) AS BIGINT) AS na,
                  CAST(MAX(cumb) AS BIGINT) AS nb FROM cum),
        terms AS (
          SELECT na, nb,
            SUM(CAST(ca + cb AS HUGEINT) *
                CAST(FLOOR((CAST(cuma AS DOUBLE) / na
                    - CAST(cumb AS DOUBLE) / nb) *
                  (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
                  * 1e12 + 0.5) AS BIGINT)) AS st
          FROM cum CROSS JOIN tot GROUP BY na, nb)
        SELECT na AS n_en, nb AS n_other,
          FLOOR((CAST(na AS DOUBLE) * nb /
                 (CAST(na + nb AS DOUBLE) * (na + nb)) *
                 (CAST(st AS DOUBLE) / 1e12)) * 1000000 + 0.500001) / 1000000
            AS cvm_stat
        FROM terms"""),
      "Two-sample Cramer-von Mises between en/other lengths (pooled-weighted quantized EDF-gap squares)"),

    // ---------------------------------------------------------------- q361
    // Wald SPRT audit on the md5 A/B arms: per (user, day) exposure in
    // arm 1, success = a purchase that day; H0: p = p̂0 (arm-0 pooled
    // daily conversion), H1: p = 1.1·p̂0. The cumulative log-likelihood
    // ratio after day t is cumS·ln(p1/p0) + cumF·ln((1−p1)/(1−p0)) —
    // computed from EXACT cumulative integer counts times two log
    // constants in one expression per row (never an iterative double
    // sum), the q335 EXP/LN discipline — against Wald's ±ln 19 bounds
    // (α = β = 0.05). The day window is calendar-bounded (the daily-
    // volume precedent), everything upstream is one linear pass.
    Query(
      "q361_sprt",
      (s, d) => {
        val exposure = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("pur"))
          .groupBy(col("user_id"), col("day"))
          .agg(max(col("pur")).as("succ"))
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
        val p0row = exposure.filter(col("arm") === 0)
          .agg(count(lit(1)).as("n0"), sum(col("succ")).as("s0"))
        val daily = exposure.filter(col("arm") === 1)
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_trials"), sum(col("succ")).as("n_success"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = daily
          .withColumn("cs", sum(col("n_success")).over(w))
          .withColumn("cn", sum(col("n_trials")).over(w))
        cum.crossJoin(broadcast(p0row))
          .withColumn("p0", col("s0").cast("double") / col("n0").cast("double"))
          .withColumn("llr",
            col("cs").cast("double") * log(lit(1.1)) +
              (col("cn") - col("cs")).cast("double") *
                log((lit(1.0) - lit(1.1) * col("p0")) / (lit(1.0) - col("p0"))))
          .select(col("day"), col("n_trials"), col("n_success"),
            Num.r6(col("llr")).as("cum_llr"),
            when(col("llr") >= log(lit(19.0)), lit("accept_h1"))
              .when(col("llr") <= -log(lit(19.0)), lit("accept_h0"))
              .otherwise(lit("continue")).as("state"))
          .orderBy(col("day"))
      },
      Some(s"""
        WITH exposure AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS succ,
            ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")}
              % 2 AS arm
          FROM events GROUP BY user_id, epoch_us(ts) // 86400000000),
        p0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n0, CAST(SUM(succ) AS BIGINT) AS s0
          FROM exposure WHERE arm = 0),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS n_trials,
            CAST(SUM(succ) AS BIGINT) AS n_success
          FROM exposure WHERE arm = 1 GROUP BY day),
        cum AS (
          SELECT day, n_trials, n_success,
            SUM(n_success) OVER w AS cs, SUM(n_trials) OVER w AS cn
          FROM daily
          WINDOW w AS (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        t AS (
          SELECT day, n_trials, n_success,
            CAST(cs AS DOUBLE) * LN(1.1)
              + CAST(cn - cs AS DOUBLE)
                * LN((1.0 - 1.1 * (CAST(s0 AS DOUBLE) / n0))
                     / (1.0 - CAST(s0 AS DOUBLE) / n0)) AS llr
          FROM cum CROSS JOIN p0)
        SELECT day, n_trials, n_success,
          ${Num.sql("llr", 6)} AS cum_llr,
          CASE WHEN llr >= LN(19.0) THEN 'accept_h1'
               WHEN llr <= -LN(19.0) THEN 'accept_h0'
               ELSE 'continue' END AS state
        FROM t ORDER BY day"""),
      "Wald SPRT on the md5 A/B arms (H1 = 1.1x arm-0 conversion): cumulative LLR from exact integer counts times log constants, +/- ln 19 bounds"),

    // ---------------------------------------------------------------- q364
    // Difference-in-differences on the md5 arms: outcome = events per
    // (user, day) exposure cell, periods split at the exact integer
    // calendar midpoint mid = (min_day + max_day + 1) div 2. The 2×2
    // cell means come from exact integer (n, Σy, Σy²) pivoted into ONE
    // row, so DiD = (m̄11−m̄10) − (m̄01−m̄00) and the unpooled-variance
    // Wald SE are single fixed-order double expressions — the causal-
    // inference companion to q195's CUPED (which adjusts; this
    // differences). Everything is one linear pass + a 4-group agg.
    Query(
      "q364_did",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("y"))
        val mid = cells.agg(
          expr("(min(day) + max(day) + 1) div 2").as("mid"))
        val g = cells.crossJoin(broadcast(mid))
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .withColumn("post", when(col("day") >= col("mid"), 1).otherwise(0))
          .groupBy(col("arm"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
        def cell(a: Int, p: Int, c: String) =
          max(when(col("arm") === a && col("post") === p, col(c)))
        val w = g.agg(
          cell(0, 0, "n").as("n00"), cell(0, 0, "sy").as("sy00"), cell(0, 0, "syy").as("syy00"),
          cell(0, 1, "n").as("n01"), cell(0, 1, "sy").as("sy01"), cell(0, 1, "syy").as("syy01"),
          cell(1, 0, "n").as("n10"), cell(1, 0, "sy").as("sy10"), cell(1, 0, "syy").as("syy10"),
          cell(1, 1, "n").as("n11"), cell(1, 1, "sy").as("sy11"), cell(1, 1, "syy").as("syy11"))
        def m(k: String) = col(s"sy$k").cast("double") / col(s"n$k").cast("double")
        def v(k: String) =
          (col(s"syy$k").cast("double")
            - col(s"sy$k").cast("double") * col(s"sy$k").cast("double")
              / col(s"n$k").cast("double")) /
            (col(s"n$k") - 1).cast("double") / col(s"n$k").cast("double")
        w.select(
          col("n00"), col("n01"), col("n10"), col("n11"),
          Num.r6(m("00")).as("m00"), Num.r6(m("01")).as("m01"),
          Num.r6(m("10")).as("m10"), Num.r6(m("11")).as("m11"),
          Num.r6(m("11") - m("10") - (m("01") - m("00"))).as("did"),
          Num.r6(sqrt(v("11") + v("10") + v("01") + v("00"))).as("se"),
          Num.r4((m("11") - m("10") - (m("01") - m("00"))) /
            sqrt(v("11") + v("10") + v("01") + v("00"))).as("t_stat"))
      },
      Some(s"""
        WITH cells AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY user_id, epoch_us(ts) // 86400000000),
        mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM cells),
        g AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")}
              % 2 AS arm,
            CASE WHEN day >= mid THEN 1 ELSE 0 END AS post,
            CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(y * y) AS BIGINT) AS syy
          FROM cells CROSS JOIN mid GROUP BY 1, 2),
        w AS (
          SELECT
            MAX(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n00,
            MAX(CASE WHEN arm = 0 AND post = 0 THEN sy END) AS sy00,
            MAX(CASE WHEN arm = 0 AND post = 0 THEN syy END) AS syy00,
            MAX(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n01,
            MAX(CASE WHEN arm = 0 AND post = 1 THEN sy END) AS sy01,
            MAX(CASE WHEN arm = 0 AND post = 1 THEN syy END) AS syy01,
            MAX(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n10,
            MAX(CASE WHEN arm = 1 AND post = 0 THEN sy END) AS sy10,
            MAX(CASE WHEN arm = 1 AND post = 0 THEN syy END) AS syy10,
            MAX(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n11,
            MAX(CASE WHEN arm = 1 AND post = 1 THEN sy END) AS sy11,
            MAX(CASE WHEN arm = 1 AND post = 1 THEN syy END) AS syy11
          FROM g),
        t AS (
          SELECT n00, n01, n10, n11,
            CAST(sy00 AS DOUBLE) / n00 AS m00, CAST(sy01 AS DOUBLE) / n01 AS m01,
            CAST(sy10 AS DOUBLE) / n10 AS m10, CAST(sy11 AS DOUBLE) / n11 AS m11,
            (CAST(syy00 AS DOUBLE) - CAST(sy00 AS DOUBLE) * CAST(sy00 AS DOUBLE) / n00) / (n00 - 1) / n00 AS v00,
            (CAST(syy01 AS DOUBLE) - CAST(sy01 AS DOUBLE) * CAST(sy01 AS DOUBLE) / n01) / (n01 - 1) / n01 AS v01,
            (CAST(syy10 AS DOUBLE) - CAST(sy10 AS DOUBLE) * CAST(sy10 AS DOUBLE) / n10) / (n10 - 1) / n10 AS v10,
            (CAST(syy11 AS DOUBLE) - CAST(sy11 AS DOUBLE) * CAST(sy11 AS DOUBLE) / n11) / (n11 - 1) / n11 AS v11
          FROM w)
        SELECT n00, n01, n10, n11,
          ${Num.sql("m00", 6)} AS m00, ${Num.sql("m01", 6)} AS m01,
          ${Num.sql("m10", 6)} AS m10, ${Num.sql("m11", 6)} AS m11,
          ${Num.sql("m11 - m10 - (m01 - m00)", 6)} AS did,
          ${Num.sql("SQRT(v11 + v10 + v01 + v00)", 6)} AS se,
          ${Num.sql("(m11 - m10 - (m01 - m00)) / SQRT(v11 + v10 + v01 + v00)", 4)}
            AS t_stat
        FROM t"""),
      "Difference-in-differences on the md5 arms at the exact calendar midpoint: 2x2 exact moment cells pivoted to one row, fixed-order DiD / Wald SE / t"),

    // ---------------------------------------------------------------- q389
    // Odds ratio + relative risk of user-level conversion between the
    // md5 A/B arms (q361's assignment), with the Woolf log-OR 95% CI —
    // the epidemiology-style effect-size readout next to the SPRT
    // (sequential decision, q361) and DiD (time-interacted, q364):
    // arm 1 vs arm 0, conversion = user ever purchased. The 2×2 cells
    // are exact integers; a·d and b·c stay below 2^53 so the double
    // ratio is exact; ln(OR) and the Woolf SE are pico-quantized
    // (q376's rule) before the CI exponentials. Any empty cell yields
    // NULL effect estimates on both engines (no continuity fudge —
    // visible, not hidden).
    Query(
      "q389_odds_ratio",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
        val cells = users.agg(
          count(when(col("arm") === 1 && col("conv") === 1, 1)).as("a"),
          count(when(col("arm") === 1 && col("conv") === 0, 1)).as("b"),
          count(when(col("arm") === 0 && col("conv") === 1, 1)).as("c"),
          count(when(col("arm") === 0 && col("conv") === 0, 1)).as("d"))
        cells
          .withColumn("ok",
            col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0)
          .withColumn("lnor_q", when(col("ok"),
            floor(log(col("a").cast("double") * col("d").cast("double") /
              (col("b").cast("double") * col("c").cast("double")))
              * lit(1e12) + lit(0.5)).cast("long")))
          .withColumn("se_q", when(col("ok"),
            floor(sqrt(lit(1.0) / col("a").cast("double")
              + lit(1.0) / col("b").cast("double")
              + lit(1.0) / col("c").cast("double")
              + lit(1.0) / col("d").cast("double")) * lit(1e12) + lit(0.5))
              .cast("long")))
          .select(col("a"), col("b"), col("c"), col("d"),
            when(col("ok"), Num.r4(col("a").cast("double") * col("d").cast("double")
              / (col("b").cast("double") * col("c").cast("double"))))
              .as("odds_ratio"),
            when(col("ok"), Num.r4((col("a").cast("double")
              / (col("a") + col("b")).cast("double")) /
              (col("c").cast("double") / (col("c") + col("d")).cast("double"))))
              .as("relative_risk"),
            when(col("ok"), Num.r4(exp(col("lnor_q").cast("double") / lit(1e12)
              - lit(1.96) * col("se_q").cast("double") / lit(1e12))))
              .as("or_ci_lo"),
            when(col("ok"), Num.r4(exp(col("lnor_q").cast("double") / lit(1e12)
              + lit(1.96) * col("se_q").cast("double") / lit(1e12))))
              .as("or_ci_hi"))
      },
      Some(s"""
        WITH users AS (
          SELECT user_id,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
            ${graft.ext.Dedup.sqlH60(
              "'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
          FROM events GROUP BY user_id),
        cells AS (
          SELECT
            CAST(COUNT(*) FILTER (WHERE arm = 1 AND conv = 1) AS BIGINT) AS a,
            CAST(COUNT(*) FILTER (WHERE arm = 1 AND conv = 0) AS BIGINT) AS b,
            CAST(COUNT(*) FILTER (WHERE arm = 0 AND conv = 1) AS BIGINT) AS c,
            CAST(COUNT(*) FILTER (WHERE arm = 0 AND conv = 0) AS BIGINT) AS d
          FROM users),
        q AS (
          SELECT a, b, c, d,
            (a > 0 AND b > 0 AND c > 0 AND d > 0) AS ok,
            CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
              CAST(FLOOR(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                * 1e12 + 0.5) AS BIGINT) END AS lnor_q,
            CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
              CAST(FLOOR(SQRT(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
                * 1e12 + 0.5) AS BIGINT) END AS se_q
          FROM cells)
        SELECT a, b, c, d,
          CASE WHEN ok THEN
            FLOOR((CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
              * 10000 + 0.500001) / 10000 END AS odds_ratio,
          CASE WHEN ok THEN
            FLOOR(((CAST(a AS DOUBLE) / (a + b)) / (CAST(c AS DOUBLE) / (c + d)))
              * 10000 + 0.500001) / 10000 END AS relative_risk,
          CASE WHEN ok THEN
            FLOOR(EXP(CAST(lnor_q AS DOUBLE) / 1e12
                      - 1.96 * CAST(se_q AS DOUBLE) / 1e12)
              * 10000 + 0.500001) / 10000 END AS or_ci_lo,
          CASE WHEN ok THEN
            FLOOR(EXP(CAST(lnor_q AS DOUBLE) / 1e12
                      + 1.96 * CAST(se_q AS DOUBLE) / 1e12)
              * 10000 + 0.500001) / 10000 END AS or_ci_hi
        FROM q"""),
      "Odds ratio + relative risk of conversion between md5 A/B arms with Woolf log-OR 95% CI (exact 2x2 cells, pico-quantized ln/SE, NULL on empty cells)"),

    // ---------------------------------------------------------------- q423
    // Empirical-Bayes (beta-binomial, method-of-moments) shrinkage of
    // per-user daily conversion rates: fit α,β to the raw-rate mean
    // and variance over users with ≥ 3 exposure days, then shrink
    // every user toward the prior — the estimator that stops a
    // 1-for-1 user from outranking a 95-for-100 user in any
    // "top converters" list. Rates are nano-quantized per user before
    // the moment sums (exact integers on DECIMAL); degenerate
    // variance (v ≤ 0 or α+β ≤ 0) yields NULL fit on both engines.
    // Reports the fitted prior and the mean absolute shrinkage.
    Query(
      "q423_eb_shrinkage",
      (s, d) => {
        val per = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("pur"))
          .groupBy(col("user_id"), col("day"))
          .agg(max(col("pur")).as("succ"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("succ")).as("x"))
          .filter(col("n") >= 3)
          .withColumn("rq", floor(col("x").cast("double") * lit(1e9)
            / col("n").cast("double") + lit(0.5)).cast("long"))
          .localCheckpoint() // feeds moments AND the shrinkage pass
        val m = per.agg(count(lit(1)).as("k"), sum(col("rq")).as("s1"),
          Exact.m2("rq", "rq").as("s2"))
        val fit = m.select(col("k"),
          (col("s1").cast("double") / col("k").cast("double") / lit(1e9))
            .as("mu"),
          ((col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double")
              / col("k").cast("double"))
            / (col("k") - 1).cast("double") / lit(1e18)).as("v"))
          .select(col("k"), col("mu"), col("v"),
            when(col("v") > 0,
              col("mu") * (lit(1.0) - col("mu")) / col("v") - lit(1.0))
              .as("ab"))
        val good = fit.select(col("k"), col("mu"), col("v"),
          when(col("ab") > 0, col("ab")).as("ab"))
        val shr = per.crossJoin(broadcast(good))
          .filter(col("ab").isNotNull)
          .select(floor(abs(
            (col("x").cast("double") + col("mu") * col("ab"))
              / (col("n").cast("double") + col("ab"))
              - col("x").cast("double") / col("n").cast("double"))
            * lit(1e9) + lit(0.5)).cast("long").as("sq"))
          .agg(count(lit(1)).as("ks"), sum(col("sq")).as("ssq"))
        good.crossJoin(broadcast(shr))
          .select(col("k").as("n_users"),
            Num.r6(col("mu")).as("mean_rate"),
            Num.r6(col("v")).as("var_rate"),
            when(col("ab").isNull, lit(null).cast("double"))
              .otherwise(Num.r4(col("mu") * col("ab"))).as("alpha"),
            when(col("ab").isNull, lit(null).cast("double"))
              .otherwise(Num.r4((lit(1.0) - col("mu")) * col("ab"))).as("beta"),
            when(col("ab").isNull, lit(null).cast("double"))
              .otherwise(Num.r6(col("ssq").cast("double")
                / (col("ks").cast("double") * lit(1e9))))
              .as("mean_abs_shrinkage"))
      },
      Some("""
        WITH per AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(succ) AS BIGINT) AS x,
            CAST(FLOOR(CAST(SUM(succ) AS DOUBLE) * 1e9 / COUNT(*) + 0.5)
              AS BIGINT) AS rq
          FROM (
            SELECT user_id, epoch_us(ts) // 86400000000 AS day,
              MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS succ
            FROM events GROUP BY user_id, epoch_us(ts) // 86400000000)
          GROUP BY user_id HAVING COUNT(*) >= 3),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(rq) AS BIGINT) AS s1,
            SUM(CAST(rq AS HUGEINT) * rq) AS s2
          FROM per),
        fit AS (
          SELECT k,
            CAST(s1 AS DOUBLE) / k / 1e9 AS mu,
            (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1) / 1e18
              AS v
          FROM m),
        good AS (
          SELECT k, mu, v,
            CASE WHEN v > 0 AND mu * (1.0 - mu) / v - 1.0 > 0
              THEN mu * (1.0 - mu) / v - 1.0 END AS ab
          FROM fit),
        shr AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS ks,
            CAST(SUM(CAST(FLOOR(ABS(
              (x + mu * ab) / (n + ab) - CAST(x AS DOUBLE) / n)
              * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS ssq
          FROM per CROSS JOIN good WHERE ab IS NOT NULL)
        SELECT k AS n_users,
          FLOOR(mu * 1000000 + 0.500001) / 1000000 AS mean_rate,
          FLOOR(v * 1000000 + 0.500001) / 1000000 AS var_rate,
          CASE WHEN ab IS NULL THEN NULL
               ELSE FLOOR(mu * ab * 10000 + 0.500001) / 10000 END AS alpha,
          CASE WHEN ab IS NULL THEN NULL
               ELSE FLOOR((1.0 - mu) * ab * 10000 + 0.500001) / 10000
          END AS beta,
          CASE WHEN ab IS NULL THEN NULL
               ELSE FLOOR((CAST(ssq AS DOUBLE) / (ks * 1e9))
                          * 1000000 + 0.500001) / 1000000
          END AS mean_abs_shrinkage
        FROM good CROSS JOIN shr"""),
      "Empirical-Bayes beta-binomial shrinkage of per-user conversion rates: nano-quantized rate moments, MoM alpha/beta, mean absolute shrinkage")
  )
}
