package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation curve continuation, batch 30: cumulative gains /
  * lift at score deciles, isotonic (PAV) calibration over bounded
  * score bins, the Hedges-corrected standardized mean difference,
  * and partial correlation on the bounded daily series. Exactness as
  * established: ceil-rank thresholds over histograms, micro-quantized
  * bounded-grid means, DECIMAL second moments.
  */
object Curves2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q295
    // Cumulative gains and lift: using document length as the ranking
    // score for "is this English", how much of the positive class is
    // captured above each decile score threshold? Thresholds are
    // exact ceil-ranks on the DESC value histogram (ties included
    // above the cut, documented), so every count is an exact integer.
    Query(
      "q295_gains_curve",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("n_chars").as("v"), (col("lang") === "en").as("pos"))
        val hist = docs.groupBy(col("v"))
          .agg(count(lit(1)).as("c"), count(when(col("pos"), 1)).as("cp"))
        val wDesc = Window.orderBy(col("v").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cumc", sum(col("c")).over(wDesc))
          .withColumn("cump", sum(col("cp")).over(wDesc))
          .localCheckpoint() // bounded value histogram, read per decile
        val tot = cum.agg(max(col("cumc")).as("n"), max(col("cump")).as("npos"))
        val thr = cum.crossJoin(broadcast(tot))
          .select(col("v"), col("cumc"), col("cump"), col("n"), col("npos"),
            explode(array((1 to 10).map(lit): _*)).as("k"))
          .filter(col("cumc") >= expr("(k * n + 9) div 10"))
          .groupBy(col("k")).agg(max(col("v")).as("threshold"))
        thr.join(broadcast(cum), cum("v") === thr("threshold"))
          .crossJoin(broadcast(tot))
          .select(col("k").cast("long").as("decile"), col("threshold"),
            col("cumc").as("n_captured"), col("cump").as("n_captured_pos"),
            Num.r4(col("cump").cast("double") / col("npos").cast("double"))
              .as("gain"),
            Num.r4(col("cump").cast("double") / col("cumc").cast("double") /
              (col("npos").cast("double") / col("n").cast("double"))).as("lift"))
          .orderBy(col("decile"))
      },
      Some("""
        WITH hist AS (
          SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c,
            CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS cp
          FROM documents GROUP BY n_chars),
        cum AS (
          SELECT v,
            SUM(c) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
            SUM(cp) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
          FROM hist),
        tot AS (SELECT CAST(MAX(cumc) AS BIGINT) AS n,
                  CAST(MAX(cump) AS BIGINT) AS npos FROM cum),
        ks AS (SELECT UNNEST(GENERATE_SERIES(1, 10)) AS k),
        thr AS (
          SELECT k, CAST(MAX(v) AS BIGINT) AS threshold
          FROM cum CROSS JOIN tot CROSS JOIN ks
          WHERE cumc >= (k * n + 9) // 10
          GROUP BY k)
        SELECT CAST(k AS BIGINT) AS decile, threshold,
          CAST(cumc AS BIGINT) AS n_captured,
          CAST(cump AS BIGINT) AS n_captured_pos,
          FLOOR((CAST(cump AS DOUBLE) / npos) * 10000 + 0.500001) / 10000
            AS gain,
          FLOOR((CAST(cump AS DOUBLE) / cumc /
                 (CAST(npos AS DOUBLE) / n)) * 10000 + 0.500001) / 10000
            AS lift
        FROM thr JOIN cum ON cum.v = thr.threshold CROSS JOIN tot
        ORDER BY decile"""),
      "Cumulative gains + lift at exact ceil-rank score-decile thresholds (length as en-classifier score)"),

    // ---------------------------------------------------------------- q296
    // Isotonic (PAV) calibration of purchase rate against 20
    // equal-width value bins, via the minimax identity
    // iso(i) = max_{j≤i} min_{l≥i} mean(y[j..l]) over the BOUNDED bin
    // grid — never touches raw rows after the one histogram pass.
    // Interval means are micro-quantized integers, so the nested
    // max/min resolves identically on both engines; the spec pins
    // monotonicity.
    Query(
      "q296_isotonic_calibration",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("value"), (col("event_type") === "purchase").as("y"))
        val rng = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
        val bins = ev.crossJoin(broadcast(rng))
          .withColumn("bin",
            when(col("vmax") > col("vmin"),
              least(floor((col("value") - col("vmin")) /
                (col("vmax") - col("vmin")) * lit(20.0)), lit(19.0)))
              .otherwise(lit(0.0)).cast("long"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), count(when(col("y"), 1)).as("ny"))
        val wB = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bins.withColumn("cn", sum(col("n")).over(wB))
          .withColumn("cy", sum(col("ny")).over(wB))
          .localCheckpoint() // ≤20 rows; feeds the (j,l) interval grid
        val lo = cum.select(col("bin").as("j"),
          (col("cn") - col("n")).as("cnj"), (col("cy") - col("ny")).as("cyj"))
        val hi = cum.select(col("bin").as("l"), col("cn").as("cnl"),
          col("cy").as("cyl"))
        val intervals = lo.join(broadcast(hi), col("j") <= col("l"))
          .select(col("j"), col("l"),
            floor((col("cyl") - col("cyj")).cast("double") /
              (col("cnl") - col("cnj")).cast("double") * lit(1e6) + lit(0.5))
              .cast("long").as("mq"))
        val iso = cum.select(col("bin")).join(broadcast(intervals),
            col("j") <= col("bin") && col("l") >= col("bin"))
          .groupBy(col("bin"), col("j")).agg(min(col("mq")).as("minl"))
          .groupBy(col("bin")).agg(max(col("minl")).as("isoq"))
        bins.join(broadcast(iso), Seq("bin"))
          .select(col("bin"), col("n"),
            Num.r6(col("ny").cast("double") / col("n").cast("double"))
              .as("raw_rate"),
            (col("isoq").cast("double") / lit(1e6)).as("iso_rate"))
          .orderBy(col("bin"))
      },
      Some("""
        WITH ev AS (
          SELECT value, event_type = 'purchase' AS y FROM events),
        rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM ev),
        bins AS (
          SELECT CAST(CASE WHEN vmax > vmin
              THEN LEAST(FLOOR((value - vmin) / (vmax - vmin) * 20.0), 19.0)
              ELSE 0.0 END AS BIGINT) AS bin,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE y) AS BIGINT) AS ny
          FROM ev CROSS JOIN rng GROUP BY 1),
        cum AS (
          SELECT bin, n, ny,
            SUM(n) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
            SUM(ny) OVER (ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cy
          FROM bins),
        intervals AS (
          SELECT lo.bin AS j, hi.bin AS l,
            CAST(FLOOR(CAST(hi.cy - (lo.cy - lo.ny) AS DOUBLE) /
              (hi.cn - (lo.cn - lo.n)) * 1e6 + 0.5) AS BIGINT) AS mq
          FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
        iso AS (
          SELECT bin, MAX(minl) AS isoq FROM (
            SELECT c.bin, i.j, MIN(mq) AS minl
            FROM cum c JOIN intervals i ON i.j <= c.bin AND i.l >= c.bin
            GROUP BY c.bin, i.j)
          GROUP BY bin)
        SELECT b.bin, b.n,
          FLOOR((CAST(ny AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS raw_rate,
          CAST(isoq AS DOUBLE) / 1e6 AS iso_rate
        FROM bins b JOIN iso USING (bin)
        ORDER BY b.bin"""),
      "Isotonic (PAV) purchase-rate calibration over 20 value bins via the bounded minimax-interval identity"),

    // ---------------------------------------------------------------- q297
    // Cohen's d and Hedges' g for English vs non-English document
    // length — the parametric effect-size companion to q289's
    // Cliff's delta. Group moments are exact integer/DECIMAL sums;
    // the pooled-SD formula and the small-sample J correction are
    // scalar arithmetic on identical doubles.
    Query(
      "q297_hedges_g",
      (s, d) => {
        val g = Tables.documents(s, d)
          .select((col("lang") === "en").as("isa"), col("n_chars").as("v"))
          .groupBy(col("isa"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            Exact.m2("v", "v").as("sv2"))
        val wide = g.agg(
          max(when(col("isa"), col("n"))).as("na"),
          max(when(col("isa"), col("sv"))).as("sva"),
          max(when(col("isa"), col("sv2"))).as("sv2a"),
          max(when(!col("isa"), col("n"))).as("nb"),
          max(when(!col("isa"), col("sv"))).as("svb"),
          max(when(!col("isa"), col("sv2"))).as("sv2b"))
        wide.select(col("na").as("n_en"), col("nb").as("n_other"),
            ((col("sva").cast("double") / col("na").cast("double") -
              col("svb").cast("double") / col("nb").cast("double")) /
              sqrt(((col("sv2a").cast("double") -
                col("sva").cast("double") * col("sva").cast("double") /
                  col("na").cast("double")) +
                (col("sv2b").cast("double") -
                  col("svb").cast("double") * col("svb").cast("double") /
                    col("nb").cast("double"))) /
                (col("na").cast("double") + col("nb").cast("double") - lit(2.0))))
              .as("dd"),
            (col("na") + col("nb")).cast("double").as("ntot"))
          .select(col("n_en"), col("n_other"),
            Num.r4(col("dd")).as("cohens_d"),
            Num.r4(col("dd") * (lit(1.0) - lit(3.0) /
              (lit(4.0) * (col("ntot") - lit(2.0)) - lit(1.0)))).as("hedges_g"))
      },
      Some("""
        WITH g AS (
          SELECT lang = 'en' AS isa, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(n_chars) AS BIGINT) AS sv,
            SUM(CAST(n_chars AS HUGEINT) * n_chars) AS sv2
          FROM documents GROUP BY 1),
        wide AS (
          SELECT
            MAX(CASE WHEN isa THEN n END) AS na,
            MAX(CASE WHEN isa THEN sv END) AS sva,
            MAX(CASE WHEN isa THEN sv2 END) AS sv2a,
            MAX(CASE WHEN NOT isa THEN n END) AS nb,
            MAX(CASE WHEN NOT isa THEN sv END) AS svb,
            MAX(CASE WHEN NOT isa THEN sv2 END) AS sv2b
          FROM g),
        dd AS (
          SELECT na, nb,
            ((CAST(sva AS DOUBLE) / na - CAST(svb AS DOUBLE) / nb) /
             SQRT(((CAST(sv2a AS DOUBLE) -
                    CAST(sva AS DOUBLE) * CAST(sva AS DOUBLE) / na) +
                   (CAST(sv2b AS DOUBLE) -
                    CAST(svb AS DOUBLE) * CAST(svb AS DOUBLE) / nb)) /
                  (CAST(na AS DOUBLE) + nb - 2.0))) AS d,
            CAST(na + nb AS DOUBLE) AS ntot
          FROM wide)
        SELECT na AS n_en, nb AS n_other,
          FLOOR(d * 10000 + 0.500001) / 10000 AS cohens_d,
          FLOOR((d * (1.0 - 3.0 / (4.0 * (ntot - 2.0) - 1.0)))
                * 10000 + 0.500001) / 10000 AS hedges_g
        FROM dd"""),
      "Cohen's d + Hedges' g for en-vs-other doc length (exact DECIMAL moments, pooled SD, J correction)"),

    // ---------------------------------------------------------------- q298
    // Partial correlation of daily volume and daily spend controlling
    // for daily active users: r_xy.z from the three Pearson r's, each
    // computed from exact integer sums over the bounded daily series
    // (cent-quantized spend, exact distinct users).
    Query(
      "q298_partial_correlation",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"),
            countDistinct(col("user_id")).as("z"))
        val mo = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
          Exact.m2("x", "x").as("sxx"),
          Exact.m2("y", "y").as("syy"),
          Exact.m2("z", "z").as("szz"),
          Exact.m2("x", "y").as("sxy"),
          Exact.m2("x", "z").as("sxz"),
          Exact.m2("y", "z").as("syz"))
        def r(sab: String, sa: String, sb: String, saa: String, sbb: String) =
          (col(sab).cast("double") - col(sa).cast("double") *
            col(sb).cast("double") / col("n").cast("double")) /
          sqrt((col(saa).cast("double") - col(sa).cast("double") *
            col(sa).cast("double") / col("n").cast("double")) *
            (col(sbb).cast("double") - col(sb).cast("double") *
              col(sb).cast("double") / col("n").cast("double")))
        mo.select(col("n").as("n_days"),
            r("sxy", "sx", "sy", "sxx", "syy").as("rxy"),
            r("sxz", "sx", "sz", "sxx", "szz").as("rxz"),
            r("syz", "sy", "sz", "syy", "szz").as("ryz"))
          .select(col("n_days"),
            Num.r6(col("rxy")).as("r_xy"),
            Num.r6(col("rxz")).as("r_xz"),
            Num.r6(col("ryz")).as("r_yz"),
            Num.r6((col("rxy") - col("rxz") * col("ryz")) /
              sqrt((lit(1.0) - col("rxz") * col("rxz")) *
                (lit(1.0) - col("ryz") * col("ryz")))).as("r_xy_given_z"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS z
          FROM events GROUP BY 1),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(z) AS BIGINT) AS sz,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(y AS HUGEINT) * y) AS syy,
            SUM(CAST(z AS HUGEINT) * z) AS szz,
            SUM(CAST(x AS HUGEINT) * y) AS sxy,
            SUM(CAST(x AS HUGEINT) * z) AS sxz,
            SUM(CAST(y AS HUGEINT) * z) AS syz
          FROM daily),
        rs AS (
          SELECT n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) /
              SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) *
                   (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)) AS rxy,
            (CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n) /
              SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) *
                   (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)) AS rxz,
            (CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n) /
              SQRT((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) *
                   (CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n)) AS ryz
          FROM mo)
        SELECT n AS n_days,
          FLOOR(rxy * 1000000 + 0.500001) / 1000000 AS r_xy,
          FLOOR(rxz * 1000000 + 0.500001) / 1000000 AS r_xz,
          FLOOR(ryz * 1000000 + 0.500001) / 1000000 AS r_yz,
          FLOOR(((rxy - rxz * ryz) /
                 SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)))
                * 1000000 + 0.500001) / 1000000 AS r_xy_given_z
        FROM rs"""),
      "Partial correlation r_xy.z of daily volume vs spend controlling for active users (exact DECIMAL moments)")
  )
}
