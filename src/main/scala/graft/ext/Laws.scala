package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Scaling-law continuation, batch 64: Menzerath–Altmann on documents,
  * Taylor's fluctuation-scaling law on event types, the psychological-
  * pricing audit on lineitem, and order-date weekday seasonality.
  * Exactness as everywhere: lns and per-cell terms are quantized to an
  * integer grid before any cross-row sum; regression/χ² moments ride
  * exact integers; argmaxes tie-break on keys.
  */
object Laws {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q427
    // Menzerath–Altmann law ("the longer the construct, the shorter
    // its constituents"): ln–ln regression of mean token length on
    // token count across documents, reporting the Menzerath exponent
    // b (expected < 0) and the Pearson r. Mean token length uses
    // q31's exact identity (chars − spaces)/tokens; both lns are
    // micro-quantized per doc; the five regression sums are exact
    // integers on DECIMAL/HUGEINT.
    Query(
      "q427_menzerath",
      (s, d) => {
        val rows = Tables.documents(s, d)
          .select(size(split(col("text"), " ")).cast("long").as("nt"),
            col("n_chars"))
          .filter(col("nt") > 0 && col("n_chars") > col("nt") - 1)
          .select(
            floor(log(col("nt").cast("double")) * lit(1e6) + lit(0.5))
              .cast("long").as("x"),
            floor(log((col("n_chars") - col("nt") + 1).cast("double")
              / col("nt").cast("double")) * lit(1e6) + lit(0.5))
              .cast("long").as("y"))
        val ms = Exact.olsMoments()
        val m = rows.agg(ms.head, ms.tail: _*)
        m.select(col("n").as("n_docs"),
            Num.r4((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")))
              .as("menzerath_b"),
            Num.r4((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
              sqrt((col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double"))
                * (col("n").cast("double") * col("syy").cast("double")
                  - col("sy").cast("double") * col("sy").cast("double"))))
              .as("pearson_r"))
      },
      Some("""
        WITH rows_ AS (
          SELECT
            CAST(FLOOR(LN(CAST(nt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
            CAST(FLOOR(LN(CAST(n_chars - nt + 1 AS DOUBLE) / nt)
              * 1e6 + 0.5) AS BIGINT) AS y
          FROM (SELECT CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS nt,
                  n_chars FROM documents)
          WHERE nt > 0 AND n_chars > nt - 1),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * y) AS sxy,
            SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM rows_)
        SELECT n AS n_docs,
          FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy) /
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sx)) * 10000 + 0.500001) / 10000
            AS menzerath_b,
          FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy) /
                 SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * sy)))
                * 10000 + 0.500001) / 10000 AS pearson_r
        FROM m"""),
      "Menzerath-Altmann ln-ln regression of mean token length on doc token count: exact char/space identity, micro-quantized lns, exact OLS moments"),

    // ---------------------------------------------------------------- q428
    // Taylor's power law (fluctuation scaling): regress ln(variance)
    // on ln(mean) of DAILY counts across event types — slope 1 means
    // Poisson-like traffic, slope → 2 means synchronized bursts. The
    // cross-type companion to q230's per-type Fano factor. Per-type
    // mean/variance come from exact cleared integer moments; the
    // type-bounded ln–ln OLS uses micro-quantized lns.
    Query(
      "q428_taylor_law",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val per = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            Exact.m2("y", "y").as("syy"))
          .filter(col("n") >= 2)
          .select(col("event_type"),
            (col("sy").cast("double") / col("n").cast("double")).as("m"),
            ((col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double")
                / col("n").cast("double")) / (col("n") - 1).cast("double"))
              .as("v"))
          .filter(col("v") > 0)
          .select(floor(log(col("m")) * lit(1e6) + lit(0.5)).cast("long").as("x"),
            floor(log(col("v")) * lit(1e6) + lit(0.5)).cast("long").as("y"))
          .localCheckpoint() // type-bounded points
        val m = per.agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        m.select(col("k").as("n_types"),
            when(col("k") < 2, lit(null).cast("double"))
              .otherwise(Num.r4((col("k").cast("double") * col("sxy").cast("double")
                - col("sx").cast("double") * col("sy").cast("double")) /
                (col("k").cast("double") * col("sxx").cast("double")
                  - col("sx").cast("double") * col("sx").cast("double"))))
              .as("taylor_slope"),
            when(col("k") < 2, lit(null).cast("double"))
              .otherwise(Num.r4((col("sy").cast("double")
                - ((col("k").cast("double") * col("sxy").cast("double")
                  - col("sx").cast("double") * col("sy").cast("double")) /
                  (col("k").cast("double") * col("sxx").cast("double")
                    - col("sx").cast("double") * col("sx").cast("double")))
                  * col("sx").cast("double")) / col("k").cast("double")
                / lit(1e6))).as("ln_a_intercept"))
      },
      Some("""
        WITH daily AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY event_type, epoch_us(ts) // 86400000000),
        per AS (
          SELECT
            CAST(FLOOR(LN(m) * 1e6 + 0.5) AS BIGINT) AS x,
            CAST(FLOOR(LN(v) * 1e6 + 0.5) AS BIGINT) AS y
          FROM (
            SELECT CAST(SUM(y) AS DOUBLE) / COUNT(*) AS m,
              (CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE)
               - CAST(SUM(y) AS DOUBLE) * SUM(y) / COUNT(*))
                / (COUNT(*) - 1) AS v
            FROM daily GROUP BY event_type HAVING COUNT(*) >= 2)
          WHERE v > 0),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
            CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM per)
        SELECT k AS n_types,
          CASE WHEN k < 2 THEN NULL
               ELSE FLOOR(((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                           / (CAST(k AS DOUBLE) * sxx
                              - CAST(sx AS DOUBLE) * sx))
                          * 10000 + 0.500001) / 10000 END AS taylor_slope,
          CASE WHEN k < 2 THEN NULL
               ELSE FLOOR(((CAST(sy AS DOUBLE)
                            - ((CAST(k AS DOUBLE) * sxy
                                - CAST(sx AS DOUBLE) * sy)
                               / (CAST(k AS DOUBLE) * sxx
                                  - CAST(sx AS DOUBLE) * sx))
                              * sx) / k / 1e6)
                          * 10000 + 0.500001) / 10000 END AS ln_a_intercept
        FROM m"""),
      "Taylor fluctuation-scaling law across event types: ln(daily variance) on ln(daily mean), exact cleared moments, type-bounded OLS"),

    // ---------------------------------------------------------------- q429
    // Psychological-pricing audit: the distribution of cent endings
    // of exact unit prices — the .99/.00 shares and the χ² of the
    // full 100-cell ending histogram against uniform (per-cell
    // contributions micro-quantized before the 100-term sum, q358's
    // rule). A pricing table that clusters on charm endings shows up
    // as a χ² explosion; a synthetic uniform one does not.
    Query(
      "q429_price_endings",
      (s, d) => {
        val obs = Tables.lineitem(s, d)
          .select((expr("""cast(cast(l_extendedprice as decimal(18,2)) * 100
            as bigint) div cast(l_quantity as bigint)""") % 100).as("e"))
          .groupBy(col("e")).agg(count(lit(1)).as("c"))
        // densified 100-cell grid: an ABSENT ending still contributes
        // its (0−E)²/E mass to the χ² (q334's zero-cell lesson)
        val ends = Tables.lineitem(s, d).sparkSession.range(100)
          .select(col("id").as("e"))
          .join(obs, Seq("e"), "left")
          .select(col("e"), coalesce(col("c"), lit(0L)).as("c"))
          .localCheckpoint() // exactly 100 cells
        val tot = ends.agg(sum(col("c")).as("n"))
        val chi = ends.crossJoin(broadcast(tot))
          .select(floor((col("c").cast("double")
            - col("n").cast("double") / lit(100.0))
            * (col("c").cast("double") - col("n").cast("double") / lit(100.0))
            / (col("n").cast("double") / lit(100.0)) * lit(1e6) + lit(0.5))
            .cast("long").as("q"))
          .agg(sum(col("q")).as("sq"))
        val marks = ends.agg(
          sum(when(col("e") === 99, col("c")).otherwise(0L)).as("c99"),
          sum(when(col("e") === 0, col("c")).otherwise(0L)).as("c00"))
        tot.crossJoin(broadcast(marks)).crossJoin(broadcast(chi))
          .select(col("n").as("n_lines"),
            Num.r6(col("c99").cast("double") / col("n").cast("double"))
              .as("share_99"),
            Num.r6(col("c00").cast("double") / col("n").cast("double"))
              .as("share_00"),
            Num.r4(col("sq").cast("double") / lit(1e6)).as("chi2_uniform"))
      },
      Some("""
        WITH obs AS (
          SELECT (CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  // CAST(l_quantity AS BIGINT)) % 100 AS e,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem GROUP BY 1),
        ends AS (
          SELECT g.e, CAST(COALESCE(obs.c, 0) AS BIGINT) AS c
          FROM (SELECT UNNEST(RANGE(0, 100)) AS e) g
          LEFT JOIN obs ON obs.e = g.e),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ends),
        chi AS (
          SELECT CAST(SUM(CAST(FLOOR(
            (c - CAST(n AS DOUBLE) / 100.0) * (c - CAST(n AS DOUBLE) / 100.0)
            / (CAST(n AS DOUBLE) / 100.0) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
            AS sq
          FROM ends CROSS JOIN tot),
        marks AS (
          SELECT CAST(SUM(CASE WHEN e = 99 THEN c ELSE 0 END) AS BIGINT) AS c99,
            CAST(SUM(CASE WHEN e = 0 THEN c ELSE 0 END) AS BIGINT) AS c00
          FROM ends)
        SELECT n AS n_lines,
          FLOOR((CAST(c99 AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS share_99,
          FLOOR((CAST(c00 AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS share_00,
          FLOOR((CAST(sq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS chi2_uniform
        FROM tot CROSS JOIN marks CROSS JOIN chi"""),
      "Psychological-pricing audit: cent-ending histogram of exact unit prices, .99/.00 shares, 100-cell chi-square vs uniform"),

    // ---------------------------------------------------------------- q430
    // Order-date weekday seasonality: the busiest and quietest
    // weekday of order placement (epoch-day mod 7, day 0 = Thursday)
    // and the 7-cell χ² against a uniform week — the TPC-H-side
    // companion to the event-side weekday ANOVA (q342). Counts
    // exact; argmax/argmin tie-break on the weekday index; per-cell
    // χ² terms micro-quantized before the 7-term sum.
    Query(
      "q430_order_weekday",
      (s, d) => {
        val wobs = Tables.orders(s, d)
          .select((expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            % 7).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val wd = Tables.orders(s, d).sparkSession.range(7)
          .select(col("id").as("w"))
          .join(wobs, Seq("w"), "left")
          .select(col("w"), coalesce(col("c"), lit(0L)).as("c"))
          .localCheckpoint() // exactly 7 cells, absent weekdays kept
        val tot = wd.agg(sum(col("c")).as("n"))
        val chi = wd.crossJoin(broadcast(tot))
          .select(floor((col("c").cast("double")
            - col("n").cast("double") / lit(7.0))
            * (col("c").cast("double") - col("n").cast("double") / lit(7.0))
            / (col("n").cast("double") / lit(7.0)) * lit(1e6) + lit(0.5))
            .cast("long").as("q"))
          .agg(sum(col("q")).as("sq"))
        val peak = wd.orderBy(col("c").desc, col("w")).limit(1)
          .select(col("w").as("peak_wd"), col("c").as("peak_n"))
        val trough = wd.orderBy(col("c").asc, col("w")).limit(1)
          .select(col("w").as("trough_wd"), col("c").as("trough_n"))
        tot.crossJoin(broadcast(peak)).crossJoin(broadcast(trough))
          .crossJoin(broadcast(chi))
          .select(col("n").as("n_orders"), col("peak_wd"),
            Num.r6(col("peak_n").cast("double") / col("n").cast("double"))
              .as("peak_share"),
            col("trough_wd"),
            Num.r6(col("trough_n").cast("double") / col("n").cast("double"))
              .as("trough_share"),
            Num.r4(col("sq").cast("double") / lit(1e6)).as("chi2_uniform"))
      },
      Some("""
        WITH wobs AS (
          SELECT (epoch_us(o_orderdate) // 86400000000) % 7 AS w,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM orders GROUP BY 1),
        wd AS (
          SELECT g.w, CAST(COALESCE(wobs.c, 0) AS BIGINT) AS c
          FROM (SELECT UNNEST(RANGE(0, 7)) AS w) g
          LEFT JOIN wobs ON wobs.w = g.w),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM wd),
        chi AS (
          SELECT CAST(SUM(CAST(FLOOR(
            (c - CAST(n AS DOUBLE) / 7.0) * (c - CAST(n AS DOUBLE) / 7.0)
            / (CAST(n AS DOUBLE) / 7.0) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
            AS sq
          FROM wd CROSS JOIN tot),
        peak AS (SELECT w AS peak_wd, c AS peak_n FROM wd
                 ORDER BY c DESC, w LIMIT 1),
        trough AS (SELECT w AS trough_wd, c AS trough_n FROM wd
                   ORDER BY c ASC, w LIMIT 1)
        SELECT n AS n_orders, peak_wd,
          FLOOR((CAST(peak_n AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS peak_share,
          trough_wd,
          FLOOR((CAST(trough_n AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS trough_share,
          FLOOR((CAST(sq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS chi2_uniform
        FROM tot CROSS JOIN peak CROSS JOIN trough CROSS JOIN chi"""),
      "Order-date weekday seasonality: peak/trough weekday shares and the 7-cell chi-square vs a uniform week"))
}
