package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonlinear-dynamics continuation, batch 38: empirical tail
  * dependence, recurrence quantification, and sample entropy — the
  * "does my traffic have structure a linear model misses" toolkit.
  * Everything runs on the TIME-bounded positioned daily series
  * (pair counts constant in SF); recurrence/template compares are
  * exact integer |diffs| against deterministic thresholds.
  */
object Dynamics {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q324
    // Empirical tail dependence between daily volume and daily spend:
    // λ_U = P(Y > y₀.₉ | X > x₀.₉) and λ_L = P(Y ≤ y₀.₁ | X ≤ x₀.₁)
    // with exact ceil-rank quantile thresholds — "do extreme days
    // co-occur", which Pearson/Spearman can't see.
    Query(
      "q324_tail_dependence",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint()
        val n = daily.agg(count(lit(1)).as("n"))
        def thr(c: String, q: Int) = {
          val hist = daily.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          val wV = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          hist.withColumn("cum", sum(col("cnt")).over(wV))
            .crossJoin(broadcast(n))
            .filter(col("cum") >= expr(s"($q * n + 9) div 10"))
            .agg(min(col("v")).as(s"${c}q$q"))
        }
        daily.crossJoin(broadcast(thr("x", 9))).crossJoin(broadcast(thr("y", 9)))
          .crossJoin(broadcast(thr("x", 1))).crossJoin(broadcast(thr("y", 1)))
          .agg(count(lit(1)).as("n_days"),
            count(when(col("x") > col("xq9"), 1)).as("nxu"),
            count(when(col("x") > col("xq9") && col("y") > col("yq9"), 1))
              .as("nju"),
            count(when(col("x") <= col("xq1"), 1)).as("nxl"),
            count(when(col("x") <= col("xq1") && col("y") <= col("yq1"), 1))
              .as("njl"))
          .select(col("n_days"), col("nju").as("n_upper_joint"),
            Num.r4(col("nju").cast("double") / col("nxu").cast("double"))
              .as("lambda_upper"),
            Num.r4(col("njl").cast("double") / col("nxl").cast("double"))
              .as("lambda_lower"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        xh AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM daily GROUP BY x),
        yh AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM daily GROUP BY y),
        xc AS (SELECT v, SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM xh),
        yc AS (SELECT v, SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM yh),
        xq9 AS (SELECT MIN(v) AS xq9 FROM xc CROSS JOIN n
                WHERE cum >= (9 * n + 9) // 10),
        yq9 AS (SELECT MIN(v) AS yq9 FROM yc CROSS JOIN n
                WHERE cum >= (9 * n + 9) // 10),
        xq1 AS (SELECT MIN(v) AS xq1 FROM xc CROSS JOIN n
                WHERE cum >= (1 * n + 9) // 10),
        yq1 AS (SELECT MIN(v) AS yq1 FROM yc CROSS JOIN n
                WHERE cum >= (1 * n + 9) // 10)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(COUNT(*) FILTER (WHERE x > xq9 AND y > yq9) AS BIGINT)
            AS n_upper_joint,
          FLOOR((CAST(COUNT(*) FILTER (WHERE x > xq9 AND y > yq9) AS DOUBLE) /
                 COUNT(*) FILTER (WHERE x > xq9)) * 10000 + 0.500001) / 10000
            AS lambda_upper,
          FLOOR((CAST(COUNT(*) FILTER (WHERE x <= xq1 AND y <= yq1) AS DOUBLE) /
                 COUNT(*) FILTER (WHERE x <= xq1)) * 10000 + 0.500001) / 10000
            AS lambda_lower
        FROM daily CROSS JOIN xq9 CROSS JOIN yq9 CROSS JOIN xq1 CROSS JOIN yq1"""),
      "Empirical upper/lower tail dependence of daily volume vs spend (exact ceil-rank decile thresholds)"),

    // ---------------------------------------------------------------- q325
    // Recurrence quantification of daily volume: recurrence rate at
    // ε = range/10 and determinism (share of recurrent pairs that sit
    // on a diagonal line of length ≥ 2 — i.e., the pattern repeats
    // for at least two consecutive days). All pairs i<j over the
    // positioned series; the diagonal test is one self-join on
    // (i+1, j+1).
    Query(
      "q325_rqa",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val t = daily
          .withColumn("r", row_number().over(Window.orderBy(col("day"))).cast("long"))
          .select(col("r"), col("x")).localCheckpoint()
        val eps = t.agg((max(col("x")) - min(col("x"))).as("rng"), count(lit(1)).as("n"))
          .select(expr("rng div 10").as("eps"), col("n"))
        val a = t.select(col("r").as("i"), col("x").as("xi"))
        val b = t.select(col("r").as("j"), col("x").as("xj"))
        val rec = a.join(b, col("j") > col("i"))
          .crossJoin(broadcast(eps))
          .filter(abs(col("xi") - col("xj")) <= col("eps"))
          .select(col("i"), col("j"), col("n"))
          .localCheckpoint() // recurrent pairs, time-bounded
        val nbr = rec.select((col("i") - 1).as("i"), (col("j") - 1).as("j"),
            lit(1).as("up"))
          .union(rec.select(col("i") + 1, col("j") + 1, lit(1)))
          .distinct()
        val det = rec.join(nbr, Seq("i", "j"), "left")
          .agg(max(col("n")).as("n"), count(lit(1)).as("n_rec"),
            count(col("up")).as("n_diag"))
        det.select(col("n").as("n_days"), col("n_rec"),
            Num.r6(lit(2.0) * col("n_rec").cast("double") /
              (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
              .as("recurrence_rate"),
            Num.r6(col("n_diag").cast("double") / col("n_rec").cast("double"))
              .as("determinism"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        t AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS r, x
              FROM daily),
        eps AS (SELECT (MAX(x) - MIN(x)) // 10 AS eps,
                  CAST(COUNT(*) AS BIGINT) AS n FROM t),
        rec AS (
          SELECT a.r AS i, b.r AS j, n
          FROM t a JOIN t b ON b.r > a.r CROSS JOIN eps
          WHERE ABS(a.x - b.x) <= eps),
        nbr AS (
          SELECT DISTINCT i, j FROM (
            SELECT i - 1 AS i, j - 1 AS j FROM rec
            UNION ALL SELECT i + 1, j + 1 FROM rec)),
        det AS (
          SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_rec,
            CAST(COUNT(nbr.i) AS BIGINT) AS n_diag
          FROM rec LEFT JOIN nbr ON nbr.i = rec.i AND nbr.j = rec.j)
        SELECT n AS n_days, n_rec,
          FLOOR((2.0 * n_rec / (CAST(n AS DOUBLE) * (n - 1)))
                * 1000000 + 0.500001) / 1000000 AS recurrence_rate,
          FLOOR((CAST(n_diag AS DOUBLE) / n_rec) * 1000000 + 0.500001) / 1000000
            AS determinism
        FROM det"""),
      "Recurrence quantification of daily volume: rate at eps=range/10 + diagonal-line determinism"),

    // ---------------------------------------------------------------- q326
    // Sample entropy SampEn(m=2, r=0.2σ) of daily volume: template
    // pairs at length 2 (B) and 3 (A) under the Chebyshev distance,
    // SampEn = −ln(A/B) — low values mean the series repeats itself.
    // Lead columns make each template one row; counts are exact, the
    // only transcendental is one LN of an exact ratio.
    Query(
      "q326_sample_entropy",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val wD = Window.orderBy(col("day"))
        val t = daily
          .withColumn("r", row_number().over(wD).cast("long"))
          .withColumn("x1", lead(col("x"), 1).over(wD))
          .withColumn("x2", lead(col("x"), 2).over(wD))
          .localCheckpoint()
        val mo = t.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          Exact.m2("x", "x").as("sxx"))
        // r = 0.2 * population sd (exact moments → identical double)
        val rThr = mo.select(col("n"),
          (lit(0.2) * sqrt((col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n").cast("double")) / col("n").cast("double"))).as("rr"))
        val a2 = t.filter(col("x1").isNotNull)
          .select(col("r").as("i"), col("x").as("xi"), col("x1").as("xi1"),
            col("x2").as("xi2"))
        val b2 = t.filter(col("x1").isNotNull)
          .select(col("r").as("j"), col("x").as("xj"), col("x1").as("xj1"),
            col("x2").as("xj2"))
        val counts = a2.join(b2, col("j") > col("i"))
          .crossJoin(broadcast(rThr))
          .agg(max(col("n")).as("n_days"),
            count(when(greatest(abs(col("xi") - col("xj")),
              abs(col("xi1") - col("xj1"))).cast("double") <= col("rr"), 1))
              .as("b_count"),
            count(when(col("xi2").isNotNull && col("xj2").isNotNull &&
              greatest(abs(col("xi") - col("xj")), abs(col("xi1") - col("xj1")),
                abs(col("xi2") - col("xj2"))).cast("double") <= col("rr"), 1))
              .as("a_count"))
        counts.select(col("n_days"), col("b_count"), col("a_count"),
          when(col("a_count") > 0 && col("b_count") > 0,
            Num.r4(-log(col("a_count").cast("double") /
              col("b_count").cast("double")))).as("sampen"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        t AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS r, x,
            LEAD(x, 1) OVER (ORDER BY day) AS x1,
            LEAD(x, 2) OVER (ORDER BY day) AS x2
          FROM daily),
        mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx FROM t),
        rthr AS (
          SELECT n, 0.2 * SQRT((CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * sx / n) / n) AS rr
          FROM mo),
        counts AS (
          SELECT MAX(n) AS n_days,
            CAST(COUNT(*) FILTER (WHERE
              GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1)) <= rr) AS BIGINT)
              AS b_count,
            CAST(COUNT(*) FILTER (WHERE a.x2 IS NOT NULL AND b.x2 IS NOT NULL
              AND GREATEST(ABS(a.x - b.x), ABS(a.x1 - b.x1),
                ABS(a.x2 - b.x2)) <= rr) AS BIGINT) AS a_count
          FROM t a JOIN t b ON b.r > a.r CROSS JOIN rthr
          WHERE a.x1 IS NOT NULL AND b.x1 IS NOT NULL)
        SELECT n_days, b_count, a_count,
          CASE WHEN a_count > 0 AND b_count > 0
            THEN FLOOR(-LN(CAST(a_count AS DOUBLE) / b_count)
                       * 10000 + 0.500001) / 10000
          END AS sampen
        FROM counts"""),
      "Sample entropy SampEn(m=2, r=0.2 sigma) of daily volume (exact Chebyshev template counts, one LN)"),

    // ---------------------------------------------------------------- q363
    // Detrended fluctuation analysis of daily volume — Hurst's
    // long-memory twin to q241's R/S and q312's IACT, on the integrated
    // profile. The profile is EXACT: z_t = (Σ_{u≤t} N·y_u − (t+1)·S)
    // div N (integer events units; one div-truncation, same on both
    // engines). Non-overlapping windows of n ∈ {4,8,16} observed days
    // are OLS-detrended by the denominator-cleared closed form
    //   R'_g = 4·Sxx·(n·Σz² − (Σz)²) − n·(2·Σxz − (n−1)·Σz)²
    //        = 4·n·Sxx·RSS_g   with   Sxx = n(n²−1)/12 (integer),
    // so every per-window residual power and the cross-window sum are
    // exact DECIMAL(38)/HUGEINT integers — no double enters before the
    // final sqrt: F(n) = √(ΣR' / (4·Sxx·n²·nseg)). The scaling
    // exponent reads off the log-log endpoints (equal ln-spacing makes
    // the 3-point OLS slope equal the endpoint slope):
    // α = (ln F(16) − ln F(4)) / (2 ln 2). Constant series → F = 0 →
    // α NULL (documented). Trailing partial windows drop. The profile
    // is calendar-bounded; the one unbounded pass is the daily groupBy.
    Query(
      "q363_dfa",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val tot = daily.agg(count(lit(1)).as("nd"), sum(col("y")).as("sy"))
        val wOrd = Window.orderBy(col("dy"))
        val prof = daily.crossJoin(broadcast(tot))
          .withColumn("t", row_number().over(wOrd).cast("long") - 1L)
          .withColumn("zn", sum(col("nd") * col("y") - col("sy")).over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("z", expr("zn div nd"))
          .localCheckpoint() // calendar-bounded profile
        val seg = prof.select(col("nd"), col("t"), col("z"),
            explode(array(lit(4L), lit(8L), lit(16L))).as("n"))
          .withColumn("g", expr("t div n"))
          .groupBy(col("n"), col("g"))
          .agg(max(col("nd")).as("nd"), count(lit(1)).as("cnt"),
            sum(col("z")).as("sz"),
            Exact.m2("z", "z").as("szz"),
            sum((col("t") % col("n")).cast("decimal(38,0)") * col("z")).as("sxz"))
          .filter(col("cnt") === col("n"))
        val rssp = seg
          .withColumn("sxx", expr("(n * (n * n - 1)) div 12"))
          .withColumn("rp", expr("""
            4 * cast(sxx as decimal(38,0)) *
              (cast(n as decimal(38,0)) * szz
               - cast(sz as decimal(38,0)) * sz)
            - cast(n as decimal(38,0)) *
              (2 * sxz - cast(n - 1 as decimal(38,0)) * sz)
              * (2 * sxz - cast(n - 1 as decimal(38,0)) * sz)"""))
        val f = rssp.groupBy(col("n"))
          .agg(max(col("nd")).as("nd"), count(lit(1)).as("nseg"),
            sum(col("rp")).as("srp"), max(col("sxx")).as("sxx"))
          .select(col("n"), col("nd"), col("nseg"),
            sqrt(col("srp").cast("double") /
              (lit(4.0) * col("sxx").cast("double") *
                (col("n") * col("n")).cast("double") * col("nseg").cast("double")))
              .as("fn"))
        f.groupBy().agg(
            max(col("nd")).as("n_days"),
            max(when(col("n") === 4, col("nseg"))).as("nseg4"),
            max(when(col("n") === 4, col("fn"))).as("f4"),
            max(when(col("n") === 8, col("fn"))).as("f8"),
            max(when(col("n") === 16, col("fn"))).as("f16"))
          .select(col("n_days"), col("nseg4"),
            Num.r4(col("f4")).as("f4"), Num.r4(col("f8")).as("f8"),
            Num.r4(col("f16")).as("f16"),
            when(col("f4") > 0 && col("f16") > 0,
              Num.r4((log(col("f16")) - log(col("f4"))) / (lit(2.0) * log(lit(2.0)))))
              .as("dfa_alpha"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
                  CAST(SUM(y) AS BIGINT) AS sy FROM daily),
        prof AS MATERIALIZED (
          SELECT nd, ROW_NUMBER() OVER (ORDER BY dy) - 1 AS t,
            CAST(SUM(nd * y - sy) OVER (ORDER BY dy
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) // nd AS z
          FROM daily CROSS JOIN tot),
        seg AS (
          SELECT n, t // n AS g, MAX(nd) AS nd, CAST(COUNT(*) AS BIGINT) AS cnt,
            CAST(SUM(z) AS BIGINT) AS sz,
            CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
            CAST(SUM(CAST(t % n AS HUGEINT) * z) AS HUGEINT) AS sxz
          FROM prof CROSS JOIN (SELECT UNNEST([4, 8, 16]) AS n)
          GROUP BY n, t // n
          HAVING COUNT(*) = n),
        rssp AS (
          SELECT n, nd, (n * (n * n - 1)) // 12 AS sxx,
            4 * CAST((n * (n * n - 1)) // 12 AS HUGEINT) *
              (CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz)
            - CAST(n AS HUGEINT) *
              (2 * sxz - CAST(n - 1 AS HUGEINT) * sz)
              * (2 * sxz - CAST(n - 1 AS HUGEINT) * sz) AS rp
          FROM seg),
        f AS (
          SELECT n, MAX(nd) AS nd, CAST(COUNT(*) AS BIGINT) AS nseg,
            SQRT(CAST(SUM(rp) AS DOUBLE) /
              (4.0 * CAST(MAX(sxx) AS DOUBLE)
               * CAST(n * n AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))) AS fn
          FROM rssp GROUP BY n)
        SELECT MAX(nd) AS n_days,
          MAX(CASE WHEN n = 4 THEN nseg END) AS nseg4,
          FLOOR(MAX(CASE WHEN n = 4 THEN fn END) * 10000 + 0.500001) / 10000
            AS f4,
          FLOOR(MAX(CASE WHEN n = 8 THEN fn END) * 10000 + 0.500001) / 10000
            AS f8,
          FLOOR(MAX(CASE WHEN n = 16 THEN fn END) * 10000 + 0.500001) / 10000
            AS f16,
          CASE WHEN MAX(CASE WHEN n = 4 THEN fn END) > 0
                AND MAX(CASE WHEN n = 16 THEN fn END) > 0 THEN
            FLOOR(((LN(MAX(CASE WHEN n = 16 THEN fn END))
                    - LN(MAX(CASE WHEN n = 4 THEN fn END))) / (2.0 * LN(2.0)))
                  * 10000 + 0.500001) / 10000 END AS dfa_alpha
        FROM f"""),
      "Detrended fluctuation analysis of daily volume: exact integer profile and denominator-cleared per-window OLS residual powers (no doubles before the final sqrt), alpha from log-log endpoints"),

    // ---------------------------------------------------------------- q377
    // Goh–Barabási burstiness of inter-event gaps per type:
    // B = (σ−μ)/(σ+μ) ∈ (−1, 1) — B→1 bursty, 0 Poisson, →−1 regular —
    // the GAP-signature companion to q230's count-based Fano factor and
    // q277's exponential-fit KS. Gaps are exact integer microseconds
    // (per-user lead, pooled by type); σ uses the population formula on
    // DECIMAL second moments (gap² ≈ 7e24 at 100× overflows int64).
    Query(
      "q377_gap_burstiness",
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("tu"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("event_type"), col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tu"))
          .withColumn("nxt", lead(col("tu"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("event_type"), (col("nxt") - col("tu")).as("g"))
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
            Exact.m2("g", "g").as("sgg"))
          .select(col("event_type"), col("n_gaps"),
            Num.r4(col("sg").cast("double") / col("n_gaps").cast("double")
              / lit(1e6)).as("mean_gap_s"),
            Num.r4(sqrt((col("sgg").cast("double")
              - col("sg").cast("double") * col("sg").cast("double")
                / col("n_gaps").cast("double")) / col("n_gaps").cast("double"))
              / (col("sg").cast("double") / col("n_gaps").cast("double")))
              .as("cv"),
            Num.r4((sqrt((col("sgg").cast("double")
              - col("sg").cast("double") * col("sg").cast("double")
                / col("n_gaps").cast("double")) / col("n_gaps").cast("double"))
              - col("sg").cast("double") / col("n_gaps").cast("double")) /
              (sqrt((col("sgg").cast("double")
                - col("sg").cast("double") * col("sg").cast("double")
                  / col("n_gaps").cast("double")) / col("n_gaps").cast("double"))
                + col("sg").cast("double") / col("n_gaps").cast("double")))
              .as("burstiness"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH gaps AS (
          SELECT event_type, nxt - tu AS g FROM (
            SELECT event_type, epoch_us(ts) AS tu,
              LEAD(epoch_us(ts), 1) OVER (PARTITION BY event_type, user_id
                ORDER BY epoch_us(ts), event_id) AS nxt
            FROM events)
          WHERE nxt IS NOT NULL),
        m AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
            CAST(SUM(g) AS BIGINT) AS sg,
            CAST(SUM(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
          FROM gaps GROUP BY event_type),
        t AS (
          SELECT event_type, n_gaps,
            CAST(sg AS DOUBLE) / n_gaps AS mu,
            SQRT((CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
              / n_gaps) / n_gaps) AS sd
          FROM m)
        SELECT event_type, n_gaps,
          FLOOR((mu / 1e6) * 10000 + 0.500001) / 10000 AS mean_gap_s,
          FLOOR((sd / mu) * 10000 + 0.500001) / 10000 AS cv,
          FLOOR(((sd - mu) / (sd + mu)) * 10000 + 0.500001) / 10000
            AS burstiness
        FROM t ORDER BY event_type"""),
      "Goh-Barabasi burstiness B = (sd-mu)/(sd+mu) of per-user inter-event gaps pooled by type (exact integer microsecond gaps, DECIMAL second moments)"),

    // ---------------------------------------------------------------- q381
    // Allan variance of the daily event rate at averaging times
    // τ ∈ {1,2,4,8} days — the clock-stability statistic (Allan 1966)
    // that distinguishes white noise (AVAR ∝ 1/τ) from flicker/random-
    // walk drift (flat / growing AVAR) in a way the ACF (q267) and DFA
    // (q363) complement. Non-overlapping bins of τ consecutive days;
    // AVAR(τ) = Σ(s_{i+1}−s_i)² / (2·m·τ²) with bin sums s_i exact
    // integers, so the adjacent-difference sum is exact and only the
    // final division is double. All windows run on the positioned
    // calendar-bounded day table (one global sort of ~hundreds of
    // rows), never on raw events.
    Query(
      "q381_allan_variance",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val idx = daily
          .withColumn("t", row_number().over(Window.orderBy(col("dy"))).cast("long") - 1L)
          .localCheckpoint() // calendar-bounded
        val taus = idx.sparkSession.range(4)
          .select(expr("cast(pow(2, id) as long)").as("tau"))
        val bins = idx.crossJoin(broadcast(taus))
          .groupBy(col("tau"), (col("t") / col("tau")).cast("long").as("i"))
          .agg(sum(col("y")).as("bs"), count(lit(1)).as("cnt"))
          .filter(col("cnt") === col("tau"))
        val w = Window.partitionBy(col("tau")).orderBy(col("i"))
        val diffs = bins
          .withColumn("nbs", lead(col("bs"), 1).over(w))
          .withColumn("ni", lead(col("i"), 1).over(w))
          .filter(col("ni") === col("i") + 1)
          .select(col("tau"),
            (col("nbs") - col("bs")) * (col("nbs") - col("bs")) as "d2")
        diffs.groupBy(col("tau"))
          .agg(count(lit(1)).as("n_diffs"), sum(col("d2")).as("sum_d2"))
          .select(col("tau"), col("n_diffs"), col("sum_d2"),
            Num.r6(col("sum_d2").cast("double") /
              (lit(2.0) * col("n_diffs").cast("double")
                * col("tau").cast("double") * col("tau").cast("double")))
              .as("avar"))
          .orderBy(col("tau"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT ROW_NUMBER() OVER (ORDER BY dy) - 1 AS t, y FROM daily),
        bins AS (
          SELECT tau, t // tau AS i, CAST(SUM(y) AS BIGINT) AS bs
          FROM idx CROSS JOIN
            (SELECT CAST(POW(2, UNNEST(RANGE(0, 4))) AS BIGINT) AS tau)
          GROUP BY tau, t // tau
          HAVING COUNT(*) = tau),
        diffs AS (
          SELECT tau, (nbs - bs) * (nbs - bs) AS d2
          FROM (
            SELECT tau, i, bs,
              LEAD(bs) OVER (PARTITION BY tau ORDER BY i) AS nbs,
              LEAD(i) OVER (PARTITION BY tau ORDER BY i) AS ni
            FROM bins)
          WHERE ni = i + 1)
        SELECT tau, CAST(COUNT(*) AS BIGINT) AS n_diffs,
          CAST(SUM(d2) AS BIGINT) AS sum_d2,
          FLOOR((CAST(SUM(d2) AS DOUBLE)
                 / (2.0 * COUNT(*) * CAST(tau AS DOUBLE) * tau))
                * 1000000 + 0.500001) / 1000000 AS avar
        FROM diffs GROUP BY tau ORDER BY tau"""),
      "Allan variance of daily volume at tau 1/2/4/8 days: exact integer bin sums and adjacent-difference squares, double only in the final division")
  )
}
