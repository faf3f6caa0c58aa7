package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extreme-value / spectral continuation, batch 43: peaks-over-
  * threshold GPD fit, spectral entropy, and winsorized correlation.
  * GPD moments are exact integers over the exceedance set; cos/sin
  * enter only through q168's quantize-before-sum pattern; winsorized
  * values are exact clamps at ceil-rank thresholds.
  */
object Extreme {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q339
    // Peaks-over-threshold GPD fit on daily volume: exceedances over
    // the exact p90 threshold, method-of-moments ξ and σ, and the
    // 100-day return level — the q275 (block-maxima Gumbel) family's
    // other half. (T·p_u)^ξ runs as EXP(ξ·LN(T·p_u)); a |ξ| < 1e-9
    // fit degrades to the exponential-tail formula on both engines.
    Query(
      "q339_gpd_pot",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val hist = daily.groupBy(col("x").as("v")).agg(count(lit(1)).as("c"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val n = daily.agg(count(lit(1)).as("n"))
        val thr = hist.withColumn("cum", sum(col("c")).over(wV))
          .crossJoin(broadcast(n))
          .filter(col("cum") >= expr("(9 * n + 9) div 10"))
          .agg(min(col("v")).as("u"))
        val exc = daily.crossJoin(broadcast(thr))
          .filter(col("x") > col("u"))
          .select((col("x") - col("u")).as("y"), col("u"))
        val mo = exc.agg(max(col("u")).as("u"), count(lit(1)).as("ne"),
          sum(col("y")).as("sy"),
          Exact.m2("y", "y").as("syy"))
        val fit = mo.crossJoin(broadcast(n))
          .select(col("u"), col("ne"), col("n"),
            (col("sy").cast("double") / col("ne").cast("double")).as("m"),
            ((col("syy").cast("double") - col("sy").cast("double") *
              col("sy").cast("double") / col("ne").cast("double")) /
              (col("ne").cast("double") - lit(1.0))).as("v"))
          .select(col("u"), col("ne"), col("n"),
            (lit(0.5) * (lit(1.0) - col("m") * col("m") / col("v"))).as("xi"),
            (lit(0.5) * col("m") * (lit(1.0) + col("m") * col("m") / col("v")))
              .as("sigma"))
        fit.select(col("u").as("threshold"), col("ne").as("n_exceed"),
          Num.r4(col("xi")).as("gpd_xi"),
          Num.r4(col("sigma")).as("gpd_sigma"),
          Num.r4(col("u").cast("double") +
            when(abs(col("xi")) > 1e-9,
              col("sigma") / col("xi") *
                (exp(col("xi") * log(lit(100.0) * col("ne").cast("double") /
                  col("n").cast("double"))) - lit(1.0)))
              .otherwise(col("sigma") * log(lit(100.0) *
                col("ne").cast("double") / col("n").cast("double"))))
            .as("return_100d"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        hist AS (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS c
                 FROM daily GROUP BY x),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        thr AS (
          SELECT CAST(MIN(v) AS BIGINT) AS u FROM (
            SELECT v, SUM(c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM hist) q CROSS JOIN n
          WHERE cum >= (9 * n + 9) // 10),
        exc AS (SELECT x - u AS y, u FROM daily CROSS JOIN thr WHERE x > u),
        mo AS (SELECT CAST(MAX(u) AS BIGINT) AS u,
                 CAST(COUNT(*) AS BIGINT) AS ne,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 SUM(CAST(y AS HUGEINT) * y) AS syy FROM exc),
        fit AS (
          SELECT u, ne, n,
            0.5 * (1.0 - m * m / v) AS xi,
            0.5 * m * (1.0 + m * m / v) AS sigma
          FROM (
            SELECT u, ne, n, CAST(sy AS DOUBLE) / ne AS m,
              (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / ne) /
                (CAST(ne AS DOUBLE) - 1.0) AS v
            FROM mo CROSS JOIN n) q)
        SELECT u AS threshold, ne AS n_exceed,
          FLOOR(xi * 10000 + 0.500001) / 10000 AS gpd_xi,
          FLOOR(sigma * 10000 + 0.500001) / 10000 AS gpd_sigma,
          FLOOR((CAST(u AS DOUBLE) +
                 CASE WHEN ABS(xi) > 1e-9
                   THEN sigma / xi *
                     (EXP(xi * LN(100.0 * ne / CAST(n AS DOUBLE))) - 1.0)
                   ELSE sigma * LN(100.0 * ne / CAST(n AS DOUBLE)) END)
                * 10000 + 0.500001) / 10000 AS return_100d
        FROM fit"""),
      "Peaks-over-threshold GPD fit (p90 threshold, MoM xi/sigma) + 100-day return level"),

    // ---------------------------------------------------------------- q340
    // Spectral entropy of daily volume over the first 16 Fourier
    // frequencies: H of the normalized periodogram and the
    // forecastability 1 − H/ln 16 — "how concentrated is the power",
    // the one-number seasonality-strength summary. cos/sin are
    // micro-quantized per cell before DECIMAL sums (the q168 trig
    // discipline); the centered series is exact integers n·x − Σx.
    Query(
      "q340_spectral_entropy",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val t = daily
          .withColumn("r", (row_number().over(Window.orderBy(col("day"))) - 1)
            .cast("long"))
          .localCheckpoint()
        val mo = t.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val ks = t.crossJoin(broadcast(mo))
          .withColumn("c", col("n") * col("x") - col("sx"))
          .select(col("c"), col("r"), col("n"),
            explode(array((1 to 16).map(lit): _*)).as("k"))
          .withColumn("ang",
            lit(2 * math.Pi) * col("k") * col("r") / col("n"))
          .withColumn("cq", floor(cos(col("ang")) * lit(1e6) + lit(0.5)).cast("long"))
          .withColumn("sq", floor(sin(col("ang")) * lit(1e6) + lit(0.5)).cast("long"))
          .groupBy(col("k"))
          .agg(Exact.m2("c", "cq").as("sc"),
            Exact.m2("c", "sq").as("ss"))
          .select(col("k"),
            (col("sc").cast("double") * col("sc").cast("double") +
              col("ss").cast("double") * col("ss").cast("double")).as("p"))
        // a 16-term double sum is association-order-sensitive; divide
        // by the (order-independent) max power, quantize each share,
        // and normalize by the EXACT integer total instead
        val tot = ks.agg(max(col("p")).as("pmax"), count(lit(1)).as("nk"))
        val shares = ks.crossJoin(broadcast(tot))
          .select(col("k"),
            floor(col("p") / col("pmax") * lit(1e12) + lit(0.5)).cast("long")
              .as("pq"))
          .localCheckpoint()
        val ptot = shares.agg(sum(col("pq")).as("ptotq"))
        val h = shares.crossJoin(broadcast(ptot))
          .filter(col("pq") > 0)
          .select(floor(-(col("pq").cast("double") / col("ptotq").cast("double")) *
            log(col("pq").cast("double") / col("ptotq").cast("double"))
            * lit(1e9) + lit(0.5)).cast("long").as("hq"))
          .agg(sum(col("hq")).as("sh"))
        h.crossJoin(broadcast(tot))
          .select(col("nk").as("n_freqs"),
            Num.r4(col("sh").cast("double") / lit(1e9)).as("spectral_entropy"),
            Num.r4(lit(1.0) - col("sh").cast("double") / lit(1e9) /
              log(col("nk").cast("double"))).as("forecastability"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        t AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS r, x
          FROM daily),
        mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx FROM t),
        ks AS (
          SELECT k,
            CAST(SUM(CAST(n * x - sx AS HUGEINT) *
              CAST(FLOOR(COS(2 * PI() * k * r / n) * 1e6 + 0.5) AS BIGINT))
              AS DOUBLE) AS sc,
            CAST(SUM(CAST(n * x - sx AS HUGEINT) *
              CAST(FLOOR(SIN(2 * PI() * k * r / n) * 1e6 + 0.5) AS BIGINT))
              AS DOUBLE) AS ss
          FROM t CROSS JOIN mo
          CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(1, 16)) AS k)
          GROUP BY k),
        p AS (SELECT k, sc * sc + ss * ss AS p FROM ks),
        tot AS (SELECT MAX(p) AS pmax, CAST(COUNT(*) AS BIGINT) AS nk FROM p),
        shares AS (
          SELECT k, CAST(FLOOR(p / pmax * 1e12 + 0.5) AS BIGINT) AS pq
          FROM p CROSS JOIN tot),
        ptot AS (SELECT CAST(SUM(pq) AS BIGINT) AS ptotq FROM shares),
        h AS (
          SELECT CAST(SUM(CAST(FLOOR(
              -(CAST(pq AS DOUBLE) / ptotq) * LN(CAST(pq AS DOUBLE) / ptotq)
              * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sh
          FROM shares CROSS JOIN ptot WHERE pq > 0)
        SELECT nk AS n_freqs,
          FLOOR((CAST(sh AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS spectral_entropy,
          FLOOR((1.0 - CAST(sh AS DOUBLE) / 1e9 / LN(CAST(nk AS DOUBLE)))
                * 10000 + 0.500001) / 10000 AS forecastability
        FROM h CROSS JOIN tot"""),
      "Spectral entropy over 16 Fourier frequencies + forecastability (q168 trig quantization, share-quantized H)"),

    // ---------------------------------------------------------------- q341
    // Winsorized correlation between daily volume and spend: both
    // series clamped at their exact p5/p95 ceil-rank values, then
    // Pearson on the clamped integers — the outlier-robust companion
    // to q298's raw r. One histogram pass per side for the clamps.
    Query(
      "q341_winsorized_corr",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint()
        val n = daily.agg(count(lit(1)).as("n"))
        def clamp(c: String) = {
          val hist = daily.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          val wV = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val cum = hist.withColumn("cum", sum(col("cnt")).over(wV))
            .crossJoin(broadcast(n))
          val lo = cum.filter(Exact.ceilRank(col("cum"), 5, "n"))
            .agg(min(col("v")).as(s"${c}lo"))
          val hi = cum.filter(Exact.ceilRank(col("cum"), 95, "n"))
            .agg(min(col("v")).as(s"${c}hi"))
          lo.crossJoin(hi)
        }
        val w = daily.crossJoin(broadcast(clamp("x"))).crossJoin(broadcast(clamp("y")))
          .select(
            greatest(least(col("x"), col("xhi")), col("xlo")).as("xw"),
            greatest(least(col("y"), col("yhi")), col("ylo")).as("yw"))
        w.agg(count(lit(1)).as("n_days"),
            sum(col("xw")).as("sx"), sum(col("yw")).as("sy"),
            Exact.m2("xw", "xw").as("sxx"),
            Exact.m2("yw", "yw").as("syy"),
            Exact.m2("xw", "yw").as("sxy"))
          .select(col("n_days"),
            Num.r6((col("sxy").cast("double") - col("sx").cast("double") *
              col("sy").cast("double") / col("n_days").cast("double")) /
              sqrt((col("sxx").cast("double") - col("sx").cast("double") *
                col("sx").cast("double") / col("n_days").cast("double")) *
                (col("syy").cast("double") - col("sy").cast("double") *
                  col("sy").cast("double") / col("n_days").cast("double"))))
              .as("winsorized_r"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        xc AS (SELECT v, SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT x AS v, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM daily GROUP BY x)),
        yc AS (SELECT v, SUM(cnt) OVER (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM (SELECT y AS v, CAST(COUNT(*) AS BIGINT) AS cnt
                     FROM daily GROUP BY y)),
        xlo AS (SELECT MIN(v) AS xlo FROM xc CROSS JOIN n
                WHERE cum >= (5 * n + 99) // 100),
        xhi AS (SELECT MIN(v) AS xhi FROM xc CROSS JOIN n
                WHERE cum >= (95 * n + 99) // 100),
        ylo AS (SELECT MIN(v) AS ylo FROM yc CROSS JOIN n
                WHERE cum >= (5 * n + 99) // 100),
        yhi AS (SELECT MIN(v) AS yhi FROM yc CROSS JOIN n
                WHERE cum >= (95 * n + 99) // 100),
        w AS (
          SELECT GREATEST(LEAST(x, xhi), xlo) AS xw,
            GREATEST(LEAST(y, yhi), ylo) AS yw
          FROM daily CROSS JOIN xlo CROSS JOIN xhi
          CROSS JOIN ylo CROSS JOIN yhi)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          FLOOR(((CAST(SUM(CAST(xw AS HUGEINT) * yw) AS DOUBLE)
                  - CAST(SUM(xw) AS DOUBLE) * SUM(yw) / COUNT(*)) /
                 SQRT((CAST(SUM(CAST(xw AS HUGEINT) * xw) AS DOUBLE)
                       - CAST(SUM(xw) AS DOUBLE) * SUM(xw) / COUNT(*)) *
                      (CAST(SUM(CAST(yw AS HUGEINT) * yw) AS DOUBLE)
                       - CAST(SUM(yw) AS DOUBLE) * SUM(yw) / COUNT(*))))
                * 1000000 + 0.500001) / 1000000 AS winsorized_r
        FROM w"""),
      "Winsorized (p5/p95 clamped) Pearson correlation of daily volume vs spend (exact rank clamps)"),

    // ---------------------------------------------------------------- q379
    // Grubbs' maximum-studentized-deviation outlier test on daily
    // volume (Grubbs 1950): G = max|y − ȳ| / s. The single-pass
    // complement to q103's MAD rule and q339's tail fit — G is the
    // statistic the classical one-outlier test feeds into the
    // t-distribution critical curve; here it is reported with its
    // argmax day so the "most anomalous day ever" is one query away.
    // Exactness: |y − ȳ| is cleared to the integer |n·y − Σy| before
    // the max (so the argmax and tie-break are exact); the only double
    // work is the final G from exact integer moments. The argmax scan
    // is a broadcast-scalar crossJoin + top-1 sort on the calendar-
    // bounded day table, never on raw events.
    Query(
      "q379_grubbs",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        daily.crossJoin(broadcast(tot))
          .withColumn("dev", abs(col("n") * col("y") - col("sy")))
          .orderBy(col("dev").desc, col("dy")).limit(1)
          .select(col("n").as("n_days"), col("dy").as("peak_day"),
            col("y").as("peak_y"),
            Num.r4(col("dev").cast("double") /
              (col("n").cast("double") *
                sqrt((col("n").cast("double") * col("syy").cast("double")
                  - col("sy").cast("double") * col("sy").cast("double"))
                  / (col("n").cast("double")
                    * (col("n") - 1).cast("double"))))).as("g_stat"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(y * y) AS BIGINT) AS syy FROM daily)
        SELECT n AS n_days, dy AS peak_day, y AS peak_y,
          FLOOR((CAST(ABS(n * y - sy) AS DOUBLE)
                 / (CAST(n AS DOUBLE)
                    * SQRT((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                           / (CAST(n AS DOUBLE) * (n - 1)))))
                * 10000 + 0.500001) / 10000 AS g_stat
        FROM daily CROSS JOIN tot
        ORDER BY ABS(n * y - sy) DESC, dy LIMIT 1"""),
      "Grubbs max-studentized outlier test on daily volume: exact integer deviation argmax, G from exact moments"),

    // ---------------------------------------------------------------- q397
    // Mahalanobis outlier scan of the daily (volume, spend) pairs —
    // the BIVARIATE outlier view Grubbs (q379, one axis) cannot see:
    // a day whose volume and spend are each unremarkable but jointly
    // inconsistent (high traffic, no revenue) scores high. d²_t =
    // (n−1)·Q_t/(n·det) with Q_t = Syy·dx² − 2Sxy·dx·dy + Sxx·dy²
    // over the cleared deviations dx = n·x−Σx, dy = n·y−Σy and the
    // cleared covariance entries S·· = nΣ·· − Σ·Σ· — so the top-5
    // ranking happens on the EXACT DECIMAL/HUGEINT integer Q_t (no
    // double compare), ties on day. Spend is cent-quantized per event
    // then the daily total is truncated to whole DOLLARS: Q is
    // degree-6 in the inputs, and dollar grain keeps it under the
    // DECIMAL(38)/HUGEINT ceiling with ~1e3 headroom at 100×.
    // Degenerate det ≤ 0 yields no rows on both engines.
    Query(
      "q397_mahalanobis_days",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("x"),
            (sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long"))
              / lit(100)).cast("long").as("y"))
          .localCheckpoint() // calendar-bounded
        val ms = Exact.olsMoments()
        val m = daily.agg(ms.head, ms.tail: _*)
        val scored = daily.crossJoin(broadcast(m))
          .withColumn("cxx", expr("n * sxx - cast(sx as decimal(38,0)) * sx"))
          .withColumn("cyy", expr("n * syy - cast(sy as decimal(38,0)) * sy"))
          .withColumn("cxy", expr("n * sxy - cast(sx as decimal(38,0)) * sy"))
          .filter(expr("cxx * cyy - cxy * cxy > 0"))
          .withColumn("dx", expr("n * x - sx"))
          .withColumn("dyv", expr("n * y - sy"))
          .withColumn("q", expr("""cyy * (cast(dx as decimal(38,0)) * dx)
            - 2 * cxy * (cast(dx as decimal(38,0)) * dyv)
            + cxx * (cast(dyv as decimal(38,0)) * dyv)"""))
        scored.orderBy(col("q").desc, col("dy")).limit(5)
          .select(col("dy").as("day"), col("x").as("volume"),
            col("y").as("spend_dollars"),
            Num.r4((col("n") - 1).cast("double") * col("q").cast("double")
              / (col("n").cast("double")
                * expr("cast(cxx * cyy - cxy * cxy as double)")))
              .as("mahalanobis_d2"))
          .orderBy(col("mahalanobis_d2").desc, col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) // 100
              AS BIGINT) AS y
          FROM events GROUP BY 1),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(y AS HUGEINT) * y) AS syy,
            SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM daily),
        c AS (
          SELECT n, sx, sy,
            n * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
            n * syy - CAST(sy AS HUGEINT) * sy AS cyy,
            n * sxy - CAST(sx AS HUGEINT) * sy AS cxy
          FROM m),
        scored AS (
          SELECT dy, x, y, n,
            cxx * cyy - cxy * cxy AS det,
            cyy * (CAST(n * x - sx AS HUGEINT) * (n * x - sx))
              - 2 * cxy * (CAST(n * x - sx AS HUGEINT) * (n * y - sy))
              + cxx * (CAST(n * y - sy AS HUGEINT) * (n * y - sy)) AS q
          FROM daily CROSS JOIN c
          WHERE cxx * cyy - cxy * cxy > 0)
        SELECT day, volume, spend_dollars, mahalanobis_d2 FROM (
          SELECT dy AS day, x AS volume, y AS spend_dollars,
            FLOOR(((n - 1.0) * CAST(q AS DOUBLE) / (n * CAST(det AS DOUBLE)))
                  * 10000 + 0.500001) / 10000 AS mahalanobis_d2,
            q
          FROM scored ORDER BY q DESC, dy LIMIT 5)
        ORDER BY mahalanobis_d2 DESC, day"""),
      "Mahalanobis bivariate outlier scan of daily (volume, dollar spend): exact integer quadratic-form ranking, top-5 days")
  )
}
