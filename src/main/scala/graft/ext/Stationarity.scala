package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series diagnostic continuation, batch 47: Durbin–Watson serial
  * correlation of detrended daily volume, the Wald–Wolfowitz runs test,
  * and the KPSS level-stationarity statistic. Together with the ADF
  * unit-root test (q309) and Ljung–Box portmanteau (q338) these close
  * out the standard pre-modeling battery: ADF's null is "unit root",
  * KPSS's null is "stationary" — running both brackets the answer;
  * DW/runs audit the residual independence assumption every OLS trend
  * (q145, q303) quietly makes.
  *
  * Exactness: the daily series is integer counts; OLS moments ride
  * DECIMAL(38); residuals/deviations quantize to the 1e-6 grid before
  * any ordered cross-row sum, so both engines sum identical integers
  * in any order. Observed days are treated as consecutive (the q309
  * convention; calendar gaps are q343's own audit).
  */
object Stationarity {

  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("y"))

  private val dailySql =
    """daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1)"""

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q350
    // Durbin–Watson on the residuals of the daily-volume OLS trend:
    // DW ≈ 2 means independent residuals, → 0 positive serial
    // correlation (the usual case for traffic), → 4 negative. The
    // residual grid is 1e-6; numerator/denominator second moments ride
    // DECIMAL so the 100× series cannot overflow.
    Query(
      "q350_durbin_watson",
      (s, d) => {
        val dl = daily(s, d)
        val mo = dl.agg(count(lit(1)).as("n"),
          sum(col("day")).as("sx"), sum(col("y")).as("sy"),
          Exact.m2("day", "y").as("sxy"),
          Exact.m2("day", "day").as("sxx"))
        val fit = mo.select(col("n"),
          ((col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n").cast("double")) /
           (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n").cast("double"))).as("b"),
          (col("sy").cast("double") / col("n").cast("double")).as("ybar"),
          (col("sx").cast("double") / col("n").cast("double")).as("xbar"))
        val res = dl.crossJoin(broadcast(fit))
          .select(col("day"), col("n"), col("b"),
            floor((col("y").cast("double") -
              (col("ybar") + col("b") * (col("day").cast("double") - col("xbar"))))
              * lit(1e6) + lit(0.5)).cast("long").as("qe"))
        val wT = Window.orderBy(col("day"))
        res.withColumn("de", col("qe") - lag(col("qe"), 1).over(wT))
          .agg(max(col("n")).as("n_days"), max(Num.r6(col("b"))).as("slope"),
            Exact.m2("de", "de").as("num"),
            Exact.m2("qe", "qe").as("den"))
          .select(col("n_days"), col("slope"),
            Num.r4(col("num").cast("double") / col("den").cast("double"))
              .as("dw_stat"))
      },
      Some(s"""
        WITH $dailySql,
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(CAST(day AS HUGEINT) * y) AS HUGEINT) AS sxy,
            CAST(SUM(CAST(day AS HUGEINT) * day) AS HUGEINT) AS sxx
          FROM daily),
        fit AS (
          SELECT n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) /
            (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS b,
            CAST(sy AS DOUBLE) / n AS ybar, CAST(sx AS DOUBLE) / n AS xbar
          FROM mo),
        res AS (
          SELECT day, n, b,
            CAST(FLOOR((CAST(y AS DOUBLE) -
              (ybar + b * (CAST(day AS DOUBLE) - xbar))) * 1e6 + 0.5) AS BIGINT)
              AS qe
          FROM daily CROSS JOIN fit),
        de AS (
          SELECT n, b, qe, qe - LAG(qe) OVER (ORDER BY day) AS de FROM res)
        SELECT MAX(n) AS n_days,
          MAX(FLOOR(b * 1000000 + 0.500001) / 1000000) AS slope,
          FLOOR((CAST(SUM(CAST(de AS HUGEINT) * de) AS DOUBLE) /
                 CAST(SUM(CAST(qe AS HUGEINT) * qe) AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS dw_stat
        FROM de"""),
      "Durbin-Watson serial-correlation statistic on detrended daily volume (1e-6 residual grid)"),

    // ---------------------------------------------------------------- q351
    // Wald–Wolfowitz runs test: are above-median and below-median days
    // randomly interleaved, or do they clump (regimes/trends)? Days
    // equal to the lower median are excluded (the standard rule);
    // R, n1, n2 are exact integers and Z comes from the closed form.
    Query(
      "q351_runs_test",
      (s, d) => {
        val dl = daily(s, d)
        val wR = Window.orderBy(col("y"), col("day"))
        val med = dl.withColumn("rn", row_number().over(wR))
          .crossJoin(broadcast(dl.agg(count(lit(1)).as("n"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("y").as("med"))
        val sgn = dl.crossJoin(broadcast(med))
          .filter(col("y") =!= col("med"))
          .select(col("day"), (col("y") > col("med")).cast("int").as("s"))
        val wT = Window.orderBy(col("day"))
        sgn.withColumn("chg",
            when(lag(col("s"), 1).over(wT).isNull, 1)
              .when(col("s") =!= lag(col("s"), 1).over(wT), 1).otherwise(0))
          .agg(sum(col("s")).as("n1"),
            sum(lit(1) - col("s")).as("n2"),
            sum(col("chg")).as("runs"))
          .select(col("n1").cast("long").as("n_above"),
            col("n2").cast("long").as("n_below"),
            col("runs").cast("long").as("n_runs"),
            Num.r4({
              val n1 = col("n1").cast("double")
              val n2 = col("n2").cast("double")
              val r = col("runs").cast("double")
              val mu = lit(2.0) * n1 * n2 / (n1 + n2) + lit(1.0)
              val v = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) /
                ((n1 + n2) * (n1 + n2) * (n1 + n2 - lit(1.0)))
              (r - mu) / sqrt(v)
            }).as("z_runs"))
      },
      Some(s"""
        WITH $dailySql,
        med AS (
          SELECT y AS med FROM (
            SELECT y, ROW_NUMBER() OVER (ORDER BY y, day) AS rn,
              COUNT(*) OVER () AS n
            FROM daily)
          WHERE rn = (n + 1) // 2),
        sgn AS (
          SELECT day, CAST(y > med AS INT) AS s
          FROM daily CROSS JOIN med WHERE y <> med),
        chg AS (
          SELECT s,
            CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL THEN 1
                 WHEN s <> LAG(s) OVER (ORDER BY day) THEN 1 ELSE 0 END AS chg
          FROM sgn),
        m AS (
          SELECT CAST(SUM(s) AS BIGINT) AS n1,
            CAST(SUM(1 - s) AS BIGINT) AS n2,
            CAST(SUM(chg) AS BIGINT) AS runs
          FROM chg)
        SELECT n1 AS n_above, n2 AS n_below, runs AS n_runs,
          FLOOR(((CAST(runs AS DOUBLE) -
                  (2.0 * n1 * n2 / (n1 + n2) + 1.0)) /
                 SQRT(2.0 * n1 * n2 * (2.0 * CAST(n1 AS DOUBLE) * n2 - n1 - n2) /
                      ((CAST(n1 AS DOUBLE) + n2) * (CAST(n1 AS DOUBLE) + n2) *
                       (CAST(n1 AS DOUBLE) + n2 - 1.0))))
                * 10000 + 0.500001) / 10000 AS z_runs
        FROM m"""),
      "Wald-Wolfowitz runs test for random interleaving of above/below-median days"),

    // ---------------------------------------------------------------- q352
    // KPSS level-stationarity statistic (Bartlett window l=4). The
    // trick that keeps it cross-engine exact: scale deviations by n
    // (D_t = n·y_t − Σy is an exact integer), so partial sums and all
    // five autocovariance moments are integer sums; the single final
    // division produces the statistic. η < 0.463 fails to reject level
    // stationarity at 5%.
    Query(
      "q352_kpss",
      (s, d) => {
        val dl = daily(s, d)
        val tot = dl.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val dev = dl.crossJoin(broadcast(tot))
          .select(col("day"), col("n"),
            (col("n") * col("y") - col("sy")).as("dd"))
        val wT = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wL = Window.orderBy(col("day"))
        val g = dev
          .withColumn("sp", sum(col("dd")).over(wT))
          .withColumn("l1", lag(col("dd"), 1).over(wL))
          .withColumn("l2", lag(col("dd"), 2).over(wL))
          .withColumn("l3", lag(col("dd"), 3).over(wL))
          .withColumn("l4", lag(col("dd"), 4).over(wL))
        g.agg(max(col("n")).as("n"),
            Exact.m2("sp", "sp").as("ss2"),
            Exact.m2("dd", "dd").as("g0"),
            Exact.m2("dd", "l1").as("g1"),
            Exact.m2("dd", "l2").as("g2"),
            Exact.m2("dd", "l3").as("g3"),
            Exact.m2("dd", "l4").as("g4"))
          .select(col("n").as("n_days"),
            Num.r4(lit(5.0) * col("ss2").cast("double") /
              (col("n").cast("double") *
                (lit(5.0) * col("g0").cast("double") +
                 lit(2.0) * (lit(4.0) * col("g1").cast("double") +
                   lit(3.0) * col("g2").cast("double") +
                   lit(2.0) * col("g3").cast("double") +
                   col("g4").cast("double")))))
              .as("kpss_stat"))
          .withColumn("level_stationary_5pct", col("kpss_stat") < 0.463)
      },
      Some(s"""
        WITH $dailySql,
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS sy
          FROM daily),
        dev AS (
          SELECT day, n, n * y - sy AS dd
          FROM daily CROSS JOIN tot),
        g AS (
          SELECT n, dd,
            SUM(dd) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sp,
            LAG(dd, 1) OVER (ORDER BY day) AS l1,
            LAG(dd, 2) OVER (ORDER BY day) AS l2,
            LAG(dd, 3) OVER (ORDER BY day) AS l3,
            LAG(dd, 4) OVER (ORDER BY day) AS l4
          FROM dev),
        m AS (
          SELECT MAX(n) AS n,
            CAST(SUM(CAST(sp AS HUGEINT) * sp) AS HUGEINT) AS ss2,
            CAST(SUM(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS g0,
            CAST(SUM(CAST(dd AS HUGEINT) * l1) AS HUGEINT) AS g1,
            CAST(SUM(CAST(dd AS HUGEINT) * l2) AS HUGEINT) AS g2,
            CAST(SUM(CAST(dd AS HUGEINT) * l3) AS HUGEINT) AS g3,
            CAST(SUM(CAST(dd AS HUGEINT) * l4) AS HUGEINT) AS g4
          FROM g)
        SELECT n AS n_days,
          FLOOR((5.0 * CAST(ss2 AS DOUBLE) /
                 (CAST(n AS DOUBLE) *
                  (5.0 * CAST(g0 AS DOUBLE) +
                   2.0 * (4.0 * CAST(g1 AS DOUBLE) + 3.0 * CAST(g2 AS DOUBLE) +
                          2.0 * CAST(g3 AS DOUBLE) + CAST(g4 AS DOUBLE)))))
                * 10000 + 0.500001) / 10000 AS kpss_stat,
          (FLOOR((5.0 * CAST(ss2 AS DOUBLE) /
                 (CAST(n AS DOUBLE) *
                  (5.0 * CAST(g0 AS DOUBLE) +
                   2.0 * (4.0 * CAST(g1 AS DOUBLE) + 3.0 * CAST(g2 AS DOUBLE) +
                          2.0 * CAST(g3 AS DOUBLE) + CAST(g4 AS DOUBLE)))))
                * 10000 + 0.500001) / 10000) < 0.463 AS level_stationary_5pct
        FROM m"""),
      "KPSS level-stationarity statistic via n-scaled integer deviations (Bartlett l=4)"),

    // ---------------------------------------------------------------- q387
    // Bartels' rank von Neumann ratio (Bartels 1982) — the RANK-robust
    // randomness test the battery lacked between the runs test (q351,
    // signs only) and Durbin–Watson (q350, raw values): RVN =
    // Σ(r_i − r_{i+1})² / Σ(r_i − r̄)² on the day-ordered midranks of
    // daily volume. In doubled-midrank units both sums are exact
    // integers (2r̄ = n+1 exactly, q368's histogram identity), the
    // ×4 factors cancel in the ratio, and z uses Bartels' asymptotic
    // variance 4(n−2)(5n²−2n−9)/(5n(n+1)(n−1)²). Histogram + one
    // bounded day-table window, never a raw-event sort.
    Query(
      "q387_bartels_rvn",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val hist = daily.groupBy(col("y").as("v")).agg(count(lit(1)).as("t"))
        val wc = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mids = hist.withColumn("cum", sum(col("t")).over(wc))
          .select(col("v"), (lit(2) * (col("cum") - col("t")) + col("t") + 1)
            .as("mid2"))
        val ranked = daily.join(mids, col("y") === col("v"))
          .select(col("dy"), col("mid2")).localCheckpoint() // day-bounded
        val nn = ranked.agg(count(lit(1)).as("nn"))
        val wd = Window.orderBy(col("dy"))
        ranked
          .withColumn("nxt", lead(col("mid2"), 1).over(wd))
          .crossJoin(broadcast(nn))
          .agg(max(col("nn")).as("n"),
            sum(when(col("nxt").isNotNull,
              (col("mid2") - col("nxt")) * (col("mid2") - col("nxt")))).as("nb2"),
            sum((col("mid2") - (col("nn") + 1))
              * (col("mid2") - (col("nn") + 1))).as("d2"))
          .select(col("n").as("n_days"), col("nb2"), col("d2"),
            when(col("d2") === 0, lit(null).cast("double"))
              .otherwise(Num.r6(col("nb2").cast("double")
                / col("d2").cast("double"))).as("rvn"),
            when(col("d2") === 0, lit(null).cast("double"))
              .otherwise(Num.r4((col("nb2").cast("double")
                / col("d2").cast("double") - lit(2.0)) /
                sqrt(lit(4.0) * (col("n") - 2).cast("double")
                  * (lit(5.0) * col("n").cast("double") * col("n").cast("double")
                    - lit(2.0) * col("n").cast("double") - lit(9.0))
                  / (lit(5.0) * col("n").cast("double")
                    * (col("n") + 1).cast("double")
                    * (col("n") - 1).cast("double")
                    * (col("n") - 1).cast("double"))))).as("z_rvn"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        hist AS (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS t
                 FROM daily GROUP BY y),
        mids AS (
          SELECT v, 2 * (cum - t) + t + 1 AS mid2 FROM (
            SELECT v, t, SUM(t) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM hist)),
        ranked AS (
          SELECT dy, mid2 FROM daily JOIN mids ON daily.y = mids.v),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
        nb AS (
          SELECT CAST(SUM((mid2 - nxt) * (mid2 - nxt)) AS BIGINT) AS nb2
          FROM (SELECT mid2, LEAD(mid2) OVER (ORDER BY dy) AS nxt FROM ranked)
          WHERE nxt IS NOT NULL),
        dd AS (
          SELECT CAST(SUM((mid2 - (n + 1)) * (mid2 - (n + 1))) AS BIGINT) AS d2
          FROM ranked CROSS JOIN nn)
        SELECT n AS n_days, nb2, d2,
          CASE WHEN d2 = 0 THEN NULL
               ELSE FLOOR((CAST(nb2 AS DOUBLE) / d2) * 1000000 + 0.500001)
                    / 1000000 END AS rvn,
          CASE WHEN d2 = 0 THEN NULL
               ELSE FLOOR(((CAST(nb2 AS DOUBLE) / d2 - 2.0) /
                           SQRT(4.0 * (n - 2)
                                * (5.0 * n * n - 2.0 * n - 9.0)
                                / (5.0 * n * (n + 1.0) * (n - 1.0) * (n - 1.0))))
                          * 10000 + 0.500001) / 10000 END AS z_rvn
        FROM nn CROSS JOIN nb CROSS JOIN dd"""),
      "Bartels rank von Neumann randomness ratio on daily volume: doubled-midrank exact integer sums, asymptotic z"),

    // ---------------------------------------------------------------- q388
    // Turning-point test of serial randomness: count interior days that
    // are STRICT local maxima or minima of the daily series. Under
    // randomness E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90 (Kendall);
    // too few turning points means momentum/trend, too many means
    // oscillation. Tied neighbours are not turning points (strict
    // inequalities, documented). Pure integer counting on the
    // day-bounded table; the only doubles are the final z.
    Query(
      "q388_turning_points",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val wd = Window.orderBy(col("dy"))
        val marked = daily
          .withColumn("prv", lag(col("y"), 1).over(wd))
          .withColumn("nxt", lead(col("y"), 1).over(wd))
          .withColumn("tp", col("prv").isNotNull && col("nxt").isNotNull &&
            ((col("y") > col("prv") && col("y") > col("nxt")) ||
              (col("y") < col("prv") && col("y") < col("nxt"))))
        marked.agg(count(lit(1)).as("n"),
            count(when(col("tp"), 1)).as("t"))
          .select(col("n").as("n_days"), col("t").as("n_turning"),
            Num.r4(lit(2.0) * (col("n") - 2).cast("double") / lit(3.0))
              .as("expected"),
            Num.r4((col("t").cast("double")
              - lit(2.0) * (col("n") - 2).cast("double") / lit(3.0)) /
              sqrt((lit(16.0) * col("n").cast("double") - lit(29.0)) / lit(90.0)))
              .as("z_tp"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        marked AS (
          SELECT y,
            LAG(y) OVER (ORDER BY dy) AS prv,
            LEAD(y) OVER (ORDER BY dy) AS nxt
          FROM daily),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE prv IS NOT NULL AND nxt IS NOT NULL
              AND ((y > prv AND y > nxt) OR (y < prv AND y < nxt)))
              AS BIGINT) AS t
          FROM marked)
        SELECT n AS n_days, t AS n_turning,
          FLOOR((2.0 * (n - 2) / 3.0) * 10000 + 0.500001) / 10000 AS expected,
          FLOOR(((t - 2.0 * (n - 2) / 3.0) /
                 SQRT((16.0 * n - 29.0) / 90.0)) * 10000 + 0.500001) / 10000
            AS z_tp
        FROM agg"""),
      "Turning-point randomness test on daily volume: exact strict-extremum count vs Kendall's 2(n-2)/3 expectation"),

    // ---------------------------------------------------------------- q390
    // Cox–Stuart trend test: pair day i (by position) with day
    // i + ⌈n/2⌉, drop the middle element when n is odd and any tied
    // pairs, and sign-test the second half against the first —
    // the assumption-free "is the series drifting" gate that
    // complements Mann–Kendall (q177/q378, all-pairs) at paired-only
    // cost. Continuity-corrected binomial z; all counting exact on
    // the positioned day table.
    Query(
      "q390_cox_stuart",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val idx = daily
          .withColumn("t", row_number().over(Window.orderBy(col("dy")))
            .cast("long") - 1L)
          .localCheckpoint() // day-bounded
        val nn = idx.agg(count(lit(1)).as("n"))
        val pairs = idx.crossJoin(broadcast(nn))
          .withColumn("c", expr("(n + 1) div 2"))
          .filter(col("t") < expr("n div 2"))
          .select(col("t"), col("y").as("y1"), col("c"))
          .join(idx.select((col("t")).as("t2"), col("y").as("y2")),
            col("t2") === col("t") + col("c"))
          .filter(col("y1") =!= col("y2"))
        pairs.agg(count(lit(1)).as("m"),
            count(when(col("y2") > col("y1"), 1)).as("sp"))
          .select(col("m").as("n_pairs"), col("sp").as("n_plus"),
            Num.r4(when(lit(2) * col("sp") === col("m"), lit(0.0))
              .when(lit(2) * col("sp") > col("m"),
                (col("sp").cast("double") - lit(0.5)
                  - col("m").cast("double") / 2.0) /
                  sqrt(col("m").cast("double") / 4.0))
              .otherwise((col("sp").cast("double") + lit(0.5)
                - col("m").cast("double") / 2.0) /
                sqrt(col("m").cast("double") / 4.0))).as("z_cs"))
          .withColumn("trend",
            when(col("z_cs") > 1.96, lit("increasing"))
              .when(col("z_cs") < -1.96, lit("decreasing"))
              .otherwise(lit("none")))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT ROW_NUMBER() OVER (ORDER BY dy) - 1 AS t, y FROM daily),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM idx),
        pairs AS (
          SELECT a.y AS y1, b.y AS y2
          FROM idx a CROSS JOIN nn
          JOIN idx b ON b.t = a.t + (n + 1) // 2
          WHERE a.t < n // 2 AND a.y <> b.y),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
            CAST(COUNT(*) FILTER (WHERE y2 > y1) AS BIGINT) AS sp
          FROM pairs),
        zr AS (
          SELECT m, sp,
            FLOOR((CASE WHEN 2 * sp = m THEN 0.0
                   WHEN 2 * sp > m THEN (sp - 0.5 - CAST(m AS DOUBLE) / 2.0)
                        / SQRT(CAST(m AS DOUBLE) / 4.0)
                   ELSE (sp + 0.5 - CAST(m AS DOUBLE) / 2.0)
                        / SQRT(CAST(m AS DOUBLE) / 4.0) END)
                  * 10000 + 0.500001) / 10000 AS z_cs
          FROM agg)
        SELECT m AS n_pairs, sp AS n_plus, z_cs,
          CASE WHEN z_cs > 1.96 THEN 'increasing'
               WHEN z_cs < -1.96 THEN 'decreasing'
               ELSE 'none' END AS trend
        FROM zr"""),
      "Cox-Stuart paired-halves sign test for trend on daily volume: exact pair counts, continuity-corrected binomial z"),

    // ---------------------------------------------------------------- q400
    // Records test: how many daily volumes set a new all-time high?
    // Under exchangeability the t-th observation is a record with
    // probability 1/t, so E[R] = H_n and Var[R] = H_n − H_n⁽²⁾
    // (records theory) — trends inflate the count, which makes this
    // the zero-parameter trend check next to Cox–Stuart (q390).
    // Strict records only (ties are not records, documented); the
    // harmonic terms are pico-quantized per position and summed as
    // exact integers; the record count itself is a pure integer from
    // one running-max window over the day table.
    Query(
      "q400_records_test",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val w = Window.orderBy(col("dy"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val idx = daily
          .withColumn("rec", col("y") > coalesce(max(col("y")).over(w), lit(-1L)))
          .withColumn("t", row_number().over(Window.orderBy(col("dy"))).cast("long"))
        idx.agg(count(lit(1)).as("n"),
            count(when(col("rec"), 1)).as("r"),
            sum(floor(lit(1e12) / col("t").cast("double") + lit(0.5))
              .cast("long")).as("hq"),
            sum(floor(lit(1e12) / (col("t") * col("t")).cast("double") + lit(0.5))
              .cast("long")).as("h2q"))
          .select(col("n").as("n_days"), col("r").as("n_records"),
            Num.r6(col("hq").cast("double") / lit(1e12)).as("expected"),
            when(col("hq") <= col("h2q"), lit(null).cast("double"))
              .otherwise(Num.r4((col("r").cast("double")
                - col("hq").cast("double") / lit(1e12)) /
                sqrt((col("hq") - col("h2q")).cast("double") / lit(1e12))))
              .as("z_records"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT y > COALESCE(MAX(y) OVER (ORDER BY dy
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) AS rec,
            ROW_NUMBER() OVER (ORDER BY dy) AS t
          FROM daily),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE rec) AS BIGINT) AS r,
            CAST(SUM(CAST(FLOOR(1e12 / t + 0.5) AS BIGINT)) AS BIGINT) AS hq,
            CAST(SUM(CAST(FLOOR(1e12 / (t * CAST(t AS DOUBLE)) + 0.5)
              AS BIGINT)) AS BIGINT) AS h2q
          FROM idx)
        SELECT n AS n_days, r AS n_records,
          FLOOR((CAST(hq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS expected,
          CASE WHEN hq <= h2q THEN NULL
               ELSE FLOOR(((r - CAST(hq AS DOUBLE) / 1e12) /
                           SQRT(CAST(hq - h2q AS DOUBLE) / 1e12))
                          * 10000 + 0.500001) / 10000 END AS z_records
        FROM agg"""),
      "Records test on daily volume: exact running-max record count vs harmonic-number expectation, pico-quantized H_n terms")
  )
}
