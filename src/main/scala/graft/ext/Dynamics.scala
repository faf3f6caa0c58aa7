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
          sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
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
      "Sample entropy SampEn(m=2, r=0.2 sigma) of daily volume (exact Chebyshev template counts, one LN)")
  )
}
