package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank/association-test continuation, batch 28: ordinal trend
  * (Cochran–Armitage), blocked ranks (Friedman), ordinal effect size
  * (Cliff's delta), categorical association strength (Cramér's V),
  * and top-k ranking agreement (rank-biased overlap). All five follow
  * the registry's exactness rules: midranks and deviations become
  * integers before any cross-row sum, bounded-grid terms are
  * micro-quantized, wide second moments ride DECIMAL/HUGEINT, and
  * EXP/LN run on identical doubles on both engines.
  */
object RankTests {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q287
    // Cochran–Armitage trend test: does the purchase share trend
    // across hour-of-day (ordinal scores w = 0..23)? T = Σw·r − p·Σw·n,
    // Var = p(1−p)(Σn·w² − (Σn·w)²/N) — every moment is an exact
    // integer from one 24-cell grid, so Z is a scalar double identical
    // on both engines. The canonical dose-response gate for "is this
    // metric drifting with an ordered exposure".
    Query(
      "q287_cochran_armitage",
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy((expr("unix_micros(ts) div 3600000000") % 24).as("w"))
          .agg(count(lit(1)).as("n"),
            count(when(col("event_type") === "purchase", 1)).as("r"))
        cell.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
            sum(col("w") * col("r")).as("swr"),
            sum(col("w") * col("n")).as("swn"),
            sum(col("w") * col("w") * col("n")).as("swwn"))
          .select(col("nt").as("n_total"), col("rt").as("n_cases"),
            Num.r4(
              (col("swr").cast("double") -
                col("rt").cast("double") / col("nt").cast("double") *
                  col("swn").cast("double")) /
              sqrt(col("rt").cast("double") / col("nt").cast("double") *
                (lit(1.0) - col("rt").cast("double") / col("nt").cast("double")) *
                (col("swwn").cast("double") -
                  col("swn").cast("double") * col("swn").cast("double") /
                    col("nt").cast("double"))))
              .as("z_trend"))
      },
      Some("""
        WITH cell AS (
          SELECT (epoch_us(ts) // 3600000000) % 24 AS w,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS r
          FROM events GROUP BY 1),
        m AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
            CAST(SUM(w * r) AS BIGINT) AS swr,
            CAST(SUM(w * n) AS BIGINT) AS swn,
            CAST(SUM(w * w * n) AS BIGINT) AS swwn
          FROM cell)
        SELECT nt AS n_total, rt AS n_cases,
          FLOOR(((CAST(swr AS DOUBLE) -
                  CAST(rt AS DOUBLE) / nt * CAST(swn AS DOUBLE)) /
                 SQRT(CAST(rt AS DOUBLE) / nt *
                      (1.0 - CAST(rt AS DOUBLE) / nt) *
                      (CAST(swwn AS DOUBLE) -
                       CAST(swn AS DOUBLE) * CAST(swn AS DOUBLE) / nt)))
                * 10000 + 0.500001) / 10000 AS z_trend
        FROM m"""),
      "Cochran-Armitage purchase-share trend across hour-of-day (exact integer moments, scalar Z)"),

    // ---------------------------------------------------------------- q288
    // Friedman test with midranks: blocks = epoch days, treatments =
    // event types, response = daily count (missing cells filled 0 via
    // the bounded day×type grid). Midranks within each block use the
    // 2·midrank integer trick; the tie-robust statistic
    // χ² = (k−1)·Σ(Rj − n(k+1)/2)² / (Σr² − nk(k+1)²/4) is assembled
    // from DECIMAL-summed quantized terms. One scan; everything after
    // is (days × types)-bounded.
    Query(
      "q288_friedman",
      (s, d) => {
        val ev = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val days = ev.select(col("day")).distinct()
        val types = ev.select(col("event_type")).distinct()
        val grid = days.crossJoin(broadcast(types))
          .join(ev, Seq("day", "event_type"), "left")
          .na.fill(0L, Seq("c"))
        val wR = Window.partitionBy(col("day")).orderBy(col("c"))
        val tie = Window.partitionBy(col("day"), col("c"))
        val ranked = grid
          .withColumn("mr2",
            lit(2L) * rank().over(wR) + count(lit(1)).over(tie) - lit(1L))
          .localCheckpoint() // bounded grid feeds Rj sums and Σr²
        val byType = ranked.groupBy(col("event_type"))
          .agg(sum(col("mr2")).as("rj2"), count(lit(1)).as("nblocks"))
        val tot = byType.agg(count(lit(1)).as("k"), max(col("nblocks")).as("n"))
        val sr2 = ranked.agg(
          Exact.m2("mr2", "mr2").as("s4r2"))
        val dev = byType.crossJoin(broadcast(tot))
          .select(col("k"), col("n"),
            // dq = milli-quantized (Rj − n(k+1)/2); Rj = rj2/2
            floor((col("rj2").cast("double") / lit(2.0) -
              col("n").cast("double") * (col("k").cast("double") + lit(1.0)) / lit(2.0))
              * lit(1e3) + lit(0.5)).cast("long").as("dq"))
          .select(col("k"), col("n"),
            (col("dq").cast("decimal(38,0)") * col("dq")).as("term"))
          .groupBy(col("k"), col("n")).agg(sum(col("term")).as("ssdev"))
        dev.crossJoin(broadcast(sr2))
          .select(col("k").as("n_treatments"), col("n").as("n_blocks"),
            Num.r4((col("k").cast("double") - lit(1.0)) *
              (col("ssdev").cast("double") / lit(1e6)) /
              (col("s4r2").cast("double") / lit(4.0) -
                col("n").cast("double") * col("k").cast("double") *
                  (col("k").cast("double") + lit(1.0)) *
                  (col("k").cast("double") + lit(1.0)) / lit(4.0)))
              .as("chi2_friedman"))
      },
      Some("""
        WITH ev AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        grid AS (
          SELECT d.day, t.event_type, COALESCE(c, 0) AS c
          FROM (SELECT DISTINCT day FROM ev) d
          CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
          LEFT JOIN ev ON ev.day = d.day AND ev.event_type = t.event_type),
        ranked AS (
          SELECT day, event_type,
            2 * RANK() OVER (PARTITION BY day ORDER BY c)
              + COUNT(*) OVER (PARTITION BY day, c) - 1 AS mr2
          FROM grid),
        bytype AS (
          SELECT event_type, CAST(SUM(mr2) AS BIGINT) AS rj2,
            CAST(COUNT(*) AS BIGINT) AS nblocks
          FROM ranked GROUP BY event_type),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                  CAST(MAX(nblocks) AS BIGINT) AS n FROM bytype),
        sr2 AS (SELECT SUM(CAST(mr2 AS HUGEINT) * mr2) AS s4r2 FROM ranked),
        dev AS (
          SELECT k, n,
            SUM(CAST(FLOOR((CAST(rj2 AS DOUBLE) / 2.0
                  - CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) / 2.0)
                  * 1e3 + 0.5) AS HUGEINT)
                * CAST(FLOOR((CAST(rj2 AS DOUBLE) / 2.0
                  - CAST(n AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0) / 2.0)
                  * 1e3 + 0.5) AS HUGEINT)) AS ssdev
          FROM bytype CROSS JOIN tot GROUP BY k, n)
        SELECT k AS n_treatments, n AS n_blocks,
          FLOOR(((CAST(k AS DOUBLE) - 1.0) * (CAST(ssdev AS DOUBLE) / 1e6) /
                 (CAST(s4r2 AS DOUBLE) / 4.0 -
                  CAST(n AS DOUBLE) * k * (CAST(k AS DOUBLE) + 1.0)
                    * (CAST(k AS DOUBLE) + 1.0) / 4.0))
                * 10000 + 0.500001) / 10000 AS chi2_friedman
        FROM dev CROSS JOIN sr2"""),
      "Friedman blocked-rank test over day blocks x event-type treatments (midrank ties, DECIMAL moments)"),

    // ---------------------------------------------------------------- q289
    // Cliff's delta ordinal effect size between English and
    // non-English document lengths, computed from the two bounded
    // value histograms: #(a>b) = Σ_v cntA(v)·cumB(<v) — exact integer
    // dominance counts, never an all-pairs join. The standard
    // "how big is the difference really" companion to q188's
    // Mann-Whitney U.
    Query(
      "q289_cliffs_delta",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select((col("lang") === "en").as("isa"), col("n_chars").as("v"))
        val hist = docs.groupBy(col("v"))
          .agg(count(when(col("isa"), 1)).as("ca"),
            count(when(!col("isa"), 1)).as("cb"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cuma", sum(col("ca")).over(wV) - col("ca"))
          .withColumn("cumb", sum(col("cb")).over(wV) - col("cb"))
        cum.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
            Exact.m2("ca", "cumb").as("gt"),
            Exact.m2("cb", "cuma").as("lt"))
          .select(col("na").as("n_en"), col("nb").as("n_other"),
            Num.r6((col("gt").cast("double") - col("lt").cast("double")) /
              (col("na").cast("double") * col("nb").cast("double")))
              .as("cliffs_delta"))
      },
      Some("""
        WITH hist AS (
          SELECT n_chars AS v,
            CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS cb
          FROM documents GROUP BY n_chars),
        cum AS (
          SELECT v, ca, cb,
            SUM(ca) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ca AS cuma,
            SUM(cb) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cb AS cumb
          FROM hist)
        SELECT CAST(SUM(ca) AS BIGINT) AS n_en,
          CAST(SUM(cb) AS BIGINT) AS n_other,
          FLOOR(((CAST(SUM(CAST(ca AS HUGEINT) * cumb) AS DOUBLE)
                  - CAST(SUM(CAST(cb AS HUGEINT) * cuma) AS DOUBLE)) /
                 (CAST(SUM(ca) AS DOUBLE) * CAST(SUM(cb) AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS cliffs_delta
        FROM cum"""),
      "Cliff's delta effect size for en-vs-other doc lengths (histogram dominance counts, no all-pairs)"),

    // ---------------------------------------------------------------- q290
    // Cramér's V (plus the Bergsma bias-corrected variant) for the
    // event_type × hour-of-day contingency grid — "how strongly does
    // traffic mix depend on time". Chi-square is assembled from
    // micro-quantized per-cell terms over the bounded grid; the
    // correction arithmetic is scalar. Complements q198 (which tests
    // lang×source independence) with an effect-size measure.
    Query(
      "q290_cramers_v",
      (s, d) => {
        val obs = Tables.events(s, d)
          .groupBy(col("event_type"),
            (expr("unix_micros(ts) div 3600000000") % 24).as("hr"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint() // bounded grid read thrice
        val rows = obs.groupBy(col("event_type")).agg(sum(col("o")).as("rt"))
        val cols = obs.groupBy(col("hr")).agg(sum(col("o")).as("ct"))
        val tot = obs.agg(sum(col("o")).as("n"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("hr")).as("c"))
        // densify: an unobserved (type, hour) cell still contributes
        // (0−e)²/e = e to chi-square — groupBy alone would drop it
        val dense = rows.select(col("event_type"))
          .crossJoin(broadcast(cols.select(col("hr"))))
          .join(obs, Seq("event_type", "hr"), "left")
          .na.fill(0L, Seq("o"))
        val chi = dense.join(broadcast(rows), Seq("event_type"))
          .join(broadcast(cols), Seq("hr"))
          .crossJoin(broadcast(tot))
          .withColumn("dev", col("o").cast("double") -
            col("rt").cast("double") * col("ct").cast("double") /
              col("n").cast("double"))
          .select(col("n"), col("r"), col("c"),
            floor(col("dev") * col("dev") /
              (col("rt").cast("double") * col("ct").cast("double") /
                col("n").cast("double")) * lit(1e6) + lit(0.5))
              .cast("long").as("termq"))
          .groupBy(col("n"), col("r"), col("c"))
          .agg(sum(col("termq")).as("chi2q"))
        chi.select(col("n").as("n_total"), col("r").as("n_rows"),
            col("c").as("n_cols"),
            Num.r4(col("chi2q").cast("double") / lit(1e6)).as("chi2"),
            Num.r6(sqrt(col("chi2q").cast("double") / lit(1e6) /
              (col("n").cast("double") *
                (least(col("r"), col("c")).cast("double") - lit(1.0)))))
              .as("cramers_v"),
            Num.r6(sqrt(
              greatest(lit(0.0),
                col("chi2q").cast("double") / lit(1e6) / col("n").cast("double") -
                  (col("r").cast("double") - lit(1.0)) *
                    (col("c").cast("double") - lit(1.0)) /
                    (col("n").cast("double") - lit(1.0))) /
              (least(
                col("r").cast("double") -
                  (col("r").cast("double") - lit(1.0)) *
                    (col("r").cast("double") - lit(1.0)) /
                    (col("n").cast("double") - lit(1.0)),
                col("c").cast("double") -
                  (col("c").cast("double") - lit(1.0)) *
                    (col("c").cast("double") - lit(1.0)) /
                    (col("n").cast("double") - lit(1.0))) - lit(1.0))))
              .as("cramers_v_corrected"))
      },
      Some("""
        WITH obs AS (
          SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
            CAST(COUNT(*) AS BIGINT) AS o
          FROM events GROUP BY 1, 2),
        rws AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
                FROM obs GROUP BY event_type),
        cls AS (SELECT hr, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY hr),
        tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
                  CAST(COUNT(DISTINCT hr) AS BIGINT) AS c FROM obs),
        dense AS (
          SELECT rws.event_type, cls.hr, COALESCE(o, 0) AS o
          FROM rws CROSS JOIN cls
          LEFT JOIN obs ON obs.event_type = rws.event_type
            AND obs.hr = cls.hr),
        chi AS (
          SELECT n, r, c,
            CAST(SUM(CAST(FLOOR(
              (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) *
              (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n) /
              (CAST(rt AS DOUBLE) * ct / n) * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS chi2q
          FROM dense JOIN rws USING (event_type) JOIN cls USING (hr)
          CROSS JOIN tot GROUP BY n, r, c)
        SELECT n AS n_total, r AS n_rows, c AS n_cols,
          FLOOR((CAST(chi2q AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS chi2,
          FLOOR(SQRT(CAST(chi2q AS DOUBLE) / 1e6 /
                     (CAST(n AS DOUBLE) * (CAST(LEAST(r, c) AS DOUBLE) - 1.0)))
                * 1000000 + 0.500001) / 1000000 AS cramers_v,
          FLOOR(SQRT(GREATEST(0.0,
                  CAST(chi2q AS DOUBLE) / 1e6 / n -
                  (CAST(r AS DOUBLE) - 1.0) * (CAST(c AS DOUBLE) - 1.0)
                    / (CAST(n AS DOUBLE) - 1.0)) /
                (LEAST(CAST(r AS DOUBLE) -
                    (CAST(r AS DOUBLE) - 1.0) * (CAST(r AS DOUBLE) - 1.0)
                      / (CAST(n AS DOUBLE) - 1.0),
                  CAST(c AS DOUBLE) -
                    (CAST(c AS DOUBLE) - 1.0) * (CAST(c AS DOUBLE) - 1.0)
                      / (CAST(n AS DOUBLE) - 1.0))
                 - 1.0))
                * 1000000 + 0.500001) / 1000000 AS cramers_v_corrected
        FROM chi"""),
      "Cramer's V + Bergsma-corrected V for event_type x hour-of-day (micro-quantized chi-square cells)"),

    // ---------------------------------------------------------------- q291
    // Rank-biased overlap (p = 0.9, extrapolated) between two source
    // rankings: by document count vs by total characters — "do my two
    // size notions agree on which sources dominate". Both rankings
    // are permutations of the bounded source set; a source joins the
    // prefix intersection at depth max(rank_a, rank_b), so X_d is a
    // cumulative count and the depth sum is source-set-bounded.
    // p^(d−1) is EXP((d−1)·LN p) on both engines (the q255 EXP/LN
    // discipline), and each depth term is nano-quantized before the
    // final sum.
    Query(
      "q291_rbo",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("ndocs"), sum(col("n_chars")).as("nchars"))
          .localCheckpoint() // bounded source table ranked twice
        val ra = Window.orderBy(col("ndocs").desc, col("source"))
        val rb = Window.orderBy(col("nchars").desc, col("source"))
        val ranked = bySrc
          .withColumn("rka", row_number().over(ra))
          .withColumn("rkb", row_number().over(rb))
          .select(col("source"),
            greatest(col("rka"), col("rkb")).cast("long").as("m"))
        val k = ranked.agg(max(col("m")).as("k"))
        val depth = ranked.groupBy(col("m")).agg(count(lit(1)).as("joins"))
        val wD = Window.orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // dense depths 1..k: X_d only changes where a source joins, but
        // the term p^(d-1)·X_d/d must be summed at EVERY depth — build
        // the dense axis from the ranked table's row_number itself
        val axis = ranked.select(row_number().over(Window.orderBy(col("source")))
          .as("dd"))
        val xd = axis.join(depth, axis("dd") >= depth("m"), "left")
          .groupBy(col("dd")).agg(coalesce(sum(col("joins")), lit(0L)).as("x"))
        val terms = xd
          .select(floor(exp((col("dd").cast("double") - lit(1.0)) * log(lit(0.9))) *
            col("x").cast("double") / col("dd").cast("double") * lit(1e9)
            + lit(0.5)).cast("long").as("tq"))
          .agg(sum(col("tq")).as("st"))
        terms.crossJoin(broadcast(k))
          .select(col("k").as("n_sources"),
            Num.r6(lit(0.1) * col("st").cast("double") / lit(1e9) +
              exp(col("k").cast("double") * log(lit(0.9))))
              .as("rbo_ext"))
      },
      Some("""
        WITH bysrc AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS ndocs,
            CAST(SUM(n_chars) AS BIGINT) AS nchars
          FROM documents GROUP BY source),
        ranked AS (
          SELECT source,
            GREATEST(
              ROW_NUMBER() OVER (ORDER BY ndocs DESC, source),
              ROW_NUMBER() OVER (ORDER BY nchars DESC, source)) AS m
          FROM bysrc),
        k AS (SELECT CAST(MAX(m) AS BIGINT) AS k FROM ranked),
        depth AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS joins
                  FROM ranked GROUP BY m),
        axis AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY source) AS BIGINT) AS dd
          FROM ranked),
        xd AS (
          SELECT dd, COALESCE(CAST(SUM(joins) AS BIGINT), 0) AS x
          FROM axis LEFT JOIN depth ON dd >= m GROUP BY dd),
        terms AS (
          SELECT CAST(SUM(CAST(FLOOR(
              EXP((CAST(dd AS DOUBLE) - 1.0) * LN(0.9)) *
              CAST(x AS DOUBLE) / dd * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS st
          FROM xd)
        SELECT k AS n_sources,
          FLOOR((0.1 * CAST(st AS DOUBLE) / 1e9 +
                 EXP(CAST(k AS DOUBLE) * LN(0.9)))
                * 1000000 + 0.500001) / 1000000 AS rbo_ext
        FROM terms CROSS JOIN k"""),
      "Rank-biased overlap (p=0.9, extrapolated) between doc-count and char-count source rankings"),

    // ---------------------------------------------------------------- q383
    // Wilcoxon signed-rank test of the weekly weekend-vs-weekday
    // activity gap — the PAIRED nonparametric test the suite lacked
    // next to Kruskal–Wallis (q284, independent k-sample) and Friedman
    // (q288, blocked ranks): each complete calendar week is one pair
    // (mean weekend rate, mean weekday rate). The per-week difference
    // is cleared to the exact integer D_w = 5·Σweekend − 2·Σweekday
    // (mean difference × 10); zero differences drop (standard
    // practice); |D| midranks come from the q368 histogram identity
    // (2r = 2·rank_min + t − 1) so 2·W⁺ is an exact integer, and the
    // tie-corrected permutation variance Var(2W⁺) =
    // (2n(n+1)(2n+1) − Σt(t−1)(t+1)) / 12 uses exact integer sums.
    // Weekend = epoch-day mod 7 ∈ {2,3} (day 0 = Thu ⇒ Sat/Sun). All
    // rank work runs on the week-bounded |D| histogram, never raw
    // events.
    Query(
      "q383_wilcoxon_signed",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val diffs = daily
          .withColumn("w", expr("dy div 7"))
          .withColumn("we", expr("dy % 7 in (2, 3)"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("nd"),
            sum(when(col("we"), col("y")).otherwise(0L)).as("swe"),
            sum(when(!col("we"), col("y")).otherwise(0L)).as("swd"))
          .filter(col("nd") === 7)
          .select(col("w"), (lit(5) * col("swe") - lit(2) * col("swd")).as("dd"))
          .filter(col("dd") =!= 0)
        val hist = diffs.groupBy(abs(col("dd")).as("ad"))
          .agg(count(lit(1)).as("t"),
            count(when(col("dd") > 0, 1)).as("tpos"))
        val wc = Window.orderBy(col("ad"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = hist.withColumn("cum", sum(col("t")).over(wc))
          .localCheckpoint() // week-bounded histogram
        scored
          .select(col("t"), col("tpos"),
            (lit(2) * (col("cum") - col("t")) + col("t") + 1).as("mid2"))
          .agg(sum(col("t")).as("n"),
            sum(col("tpos")).as("n_pos"),
            sum(col("t") - col("tpos")).as("n_neg"),
            sum(col("tpos") * col("mid2")).as("w2"),
            sum(col("t") * (col("t") - 1) * (col("t") + 1)).as("tie"))
          .select(col("n").as("n_weeks"), col("n_pos"), col("n_neg"),
            col("w2").as("w2_plus"),
            when(lit(2) * col("n") * (col("n") + 1) * (lit(2) * col("n") + 1)
              - col("tie") <= 0, lit(null).cast("double"))
              .otherwise(Num.r4((col("w2").cast("double")
                - col("n").cast("double") * (col("n") + 1).cast("double") / 2.0) /
                sqrt((lit(2.0) * col("n").cast("double")
                  * (col("n") + 1).cast("double")
                  * (lit(2.0) * col("n").cast("double") + 1.0)
                  - col("tie").cast("double")) / lit(12.0)))).as("z_wilcoxon"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        diffs AS (
          SELECT w, 5 * swe - 2 * swd AS dd FROM (
            SELECT dy // 7 AS w, CAST(COUNT(*) AS BIGINT) AS nd,
              CAST(SUM(CASE WHEN dy % 7 IN (2, 3) THEN y ELSE 0 END)
                AS BIGINT) AS swe,
              CAST(SUM(CASE WHEN dy % 7 IN (2, 3) THEN 0 ELSE y END)
                AS BIGINT) AS swd
            FROM daily GROUP BY dy // 7)
          WHERE nd = 7 AND 5 * swe - 2 * swd <> 0),
        hist AS (
          SELECT ABS(dd) AS ad, CAST(COUNT(*) AS BIGINT) AS t,
            CAST(COUNT(*) FILTER (WHERE dd > 0) AS BIGINT) AS tpos
          FROM diffs GROUP BY ABS(dd)),
        scored AS (
          SELECT t, tpos,
            SUM(t) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        agg AS (
          SELECT CAST(SUM(t) AS BIGINT) AS n,
            CAST(SUM(tpos) AS BIGINT) AS n_pos,
            CAST(SUM(t - tpos) AS BIGINT) AS n_neg,
            CAST(SUM(tpos * (2 * (cum - t) + t + 1)) AS BIGINT) AS w2,
            CAST(SUM(t * (t - 1) * (t + 1)) AS BIGINT) AS tie
          FROM scored)
        SELECT n AS n_weeks, n_pos, n_neg, w2 AS w2_plus,
          CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tie <= 0 THEN NULL
               ELSE FLOOR(((w2 - CAST(n AS DOUBLE) * (n + 1) / 2.0) /
                           SQRT((2.0 * n * (n + 1) * (2.0 * n + 1) - tie)
                                / 12.0))
                          * 10000 + 0.500001) / 10000 END AS z_wilcoxon
        FROM agg"""),
      "Wilcoxon signed-rank test of weekly weekend-vs-weekday volume: exact integer paired differences (x10), histogram midranks, tie-corrected permutation variance"),

    // ---------------------------------------------------------------- q385
    // Ansari–Bradley two-sample SCALE test between the two largest
    // sources' doc-length distributions — the dispersion counterpart
    // to Mood's median test (q358, location): rank the pooled lengths
    // from BOTH ends (a_i = min(r_i, N+1−r_i), midranks for ties), sum
    // the scores of sample 1, and standardize with the exact
    // permutation moments E[AB] = n1·Σa/N,
    // Var[AB] = n1·n2·(N·Σa² − (Σa)²) / (N²(N−1)) — which absorb ties
    // with no correction table. Everything rides the per-distinct-
    // length histogram (q368's midrank identity 2r = 2·rank_min+t−1),
    // so scores are exact integers in doubled units and the only
    // doubles are the final z. Histogram-sized work, never a pooled
    // row sort.
    Query(
      "q385_ansari_bradley",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("n_chars").as("x"))
        val top2 = docs.groupBy(col("source")).agg(count(lit(1)).as("nd"))
          .orderBy(col("nd").desc, col("source")).limit(2)
          .select(col("source"),
            row_number().over(Window.orderBy(col("nd").desc, col("source")))
              .as("side"))
          .localCheckpoint() // 2 rows
        val pool = docs.join(broadcast(top2), Seq("source"))
        val hist = pool.groupBy(col("x"))
          .agg(count(lit(1)).as("t"),
            count(when(col("side") === 1, 1)).as("t1"))
        val wc = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = hist
          .withColumn("cum", sum(col("t")).over(wc))
          .localCheckpoint() // distinct-length-bounded
        val nRow = scored.agg(max(col("cum")).as("nn"))
        val terms = scored.crossJoin(broadcast(nRow))
          .withColumn("mid2", lit(2) * (col("cum") - col("t")) + col("t") + 1)
          .withColumn("a2", least(col("mid2"), lit(2) * (col("nn") + 1) - col("mid2")))
        terms.agg(max(col("nn")).as("nn"),
            sum(col("t1")).as("n1"),
            sum(col("t") - col("t1")).as("n2"),
            sum(col("t1") * col("a2")).as("ab2"),
            sum(col("t") * col("a2")).as("sa2"),
            sum(col("t").cast("decimal(38,0)") * col("a2") * col("a2")).as("sa2q"))
          .select(col("n1"), col("n2"), col("ab2"),
            Num.r4((col("ab2").cast("double")
              - col("n1").cast("double") * col("sa2").cast("double")
                / col("nn").cast("double")) /
              sqrt(col("n1").cast("double") * col("n2").cast("double")
                * (col("nn").cast("double") * col("sa2q").cast("double")
                  - col("sa2").cast("double") * col("sa2").cast("double"))
                / (col("nn").cast("double") * col("nn").cast("double")
                  * (col("nn") - 1).cast("double")))).as("z_scale"))
      },
      Some("""
        WITH top2 AS (
          SELECT source,
            ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS side
          FROM documents GROUP BY source
          ORDER BY COUNT(*) DESC, source LIMIT 2),
        pool AS (
          SELECT d.n_chars AS x, t.side FROM documents d
          JOIN top2 t ON t.source = d.source),
        hist AS (
          SELECT x, CAST(COUNT(*) AS BIGINT) AS t,
            CAST(COUNT(*) FILTER (WHERE side = 1) AS BIGINT) AS t1
          FROM pool GROUP BY x),
        scored AS (
          SELECT t, t1,
            SUM(t) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        nrow AS (SELECT CAST(MAX(cum) AS BIGINT) AS nn FROM scored),
        terms AS (
          SELECT t, t1,
            LEAST(2 * (cum - t) + t + 1, 2 * (nn + 1) - (2 * (cum - t) + t + 1))
              AS a2
          FROM scored CROSS JOIN nrow),
        agg AS (
          SELECT (SELECT nn FROM nrow) AS nn,
            CAST(SUM(t1) AS BIGINT) AS n1,
            CAST(SUM(t - t1) AS BIGINT) AS n2,
            CAST(SUM(t1 * a2) AS BIGINT) AS ab2,
            CAST(SUM(t * a2) AS BIGINT) AS sa2,
            CAST(SUM(CAST(t AS HUGEINT) * a2 * a2) AS HUGEINT) AS sa2q
          FROM terms)
        SELECT n1, n2, ab2,
          FLOOR(((ab2 - CAST(n1 AS DOUBLE) * sa2 / nn) /
                 SQRT(CAST(n1 AS DOUBLE) * n2
                      * (CAST(nn AS DOUBLE) * CAST(sa2q AS DOUBLE)
                         - CAST(sa2 AS DOUBLE) * sa2)
                      / (CAST(nn AS DOUBLE) * nn * (nn - 1))))
                * 10000 + 0.500001) / 10000 AS z_scale
        FROM agg"""),
      "Ansari-Bradley two-sample scale test on the two largest sources' doc lengths: both-ends midrank scores on the length histogram, exact tie-robust permutation moments"),

    // ---------------------------------------------------------------- q399
    // Jonckheere–Terpstra test for an ORDERED trend across complete
    // calendar weeks: JT = Σ_{weeks i<j} U_ij where U_ij counts
    // cross-week day pairs with the later week's volume higher (ties
    // half-weight). More powerful than Kruskal–Wallis (q284) when the
    // alternative is monotone, and the group-ordered complement to
    // Mann–Kendall (q378). Doubled counts (2·gt + eq) keep JT exact;
    // the z uses the classical no-tie moments E = (N²−Σn²)/4,
    // Var = (N²(2N+3) − Σn²(2n+3))/72 (documented approximation —
    // daily volumes rarely tie). The pair join is over the
    // calendar-bounded day table, never raw events.
    Query(
      "q399_jonckheere",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("dy"))
          .groupBy(col("dy")).agg(count(lit(1)).as("y"))
          .withColumn("w", expr("dy div 7"))
        val full = daily.groupBy(col("w")).agg(count(lit(1)).as("nd"))
          .filter(col("nd") === 7).select(col("w"))
        val kept = daily.join(full, Seq("w")).localCheckpoint()
        val a = kept.select(col("w").as("wa"), col("y").as("ya"))
        val b = kept.select(col("w").as("wb"), col("y").as("yb"))
        val jt = a.join(b, col("wb") > col("wa"))
          .agg(sum(when(col("yb") > col("ya"), 2L)
            .when(col("yb") === col("ya"), 1L).otherwise(0L)).as("jt2"))
        val m = kept.groupBy(col("w")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
            sum(col("n") * col("n")).as("sn2"),
            sum(col("n") * col("n") * (lit(2) * col("n") + 3)).as("sn23"))
        jt.crossJoin(broadcast(m))
          .select(col("k").as("n_weeks"), col("nn").as("n_days"), col("jt2"),
            Num.r4((col("jt2").cast("double") / 2.0
              - (col("nn").cast("double") * col("nn").cast("double")
                - col("sn2").cast("double")) / 4.0) /
              sqrt((col("nn").cast("double") * col("nn").cast("double")
                * (lit(2.0) * col("nn").cast("double") + 3.0)
                - col("sn23").cast("double")) / 72.0)).as("z_jt"))
      },
      Some("""
        WITH daily AS (
          SELECT dy, CAST(COUNT(*) AS BIGINT) AS y, dy // 7 AS w
          FROM (SELECT epoch_us(ts) // 86400000000 AS dy FROM events)
          GROUP BY dy),
        full_w AS (SELECT w FROM daily GROUP BY w HAVING COUNT(*) = 7),
        kept AS (SELECT d.* FROM daily d JOIN full_w USING (w)),
        jt AS (
          SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 2
                          WHEN b.y = a.y THEN 1 ELSE 0 END) AS BIGINT) AS jt2
          FROM kept a JOIN kept b ON b.w > a.w),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS nn,
            CAST(SUM(n * n) AS BIGINT) AS sn2,
            CAST(SUM(n * n * (2 * n + 3)) AS BIGINT) AS sn23
          FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM kept GROUP BY w))
        SELECT k AS n_weeks, nn AS n_days, jt2,
          FLOOR(((CAST(jt2 AS DOUBLE) / 2.0
                  - (CAST(nn AS DOUBLE) * nn - sn2) / 4.0) /
                 SQRT((CAST(nn AS DOUBLE) * nn * (2.0 * nn + 3.0) - sn23)
                      / 72.0)) * 10000 + 0.500001) / 10000 AS z_jt
        FROM jt CROSS JOIN m"""),
      "Jonckheere-Terpstra ordered-trend test across complete weeks: exact doubled cross-week pair counts, classical moments z")
  )
}
