package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression-diagnostics continuation, batch 40: Granger causality,
  * Cook's distance, and the Breusch–Pagan heteroskedasticity test on
  * the daily volume→spend regression. Closed-form throughout: every
  * regression is Cramer's rule on DECIMAL moment sums; per-day
  * residual quantities are quantized to integers BEFORE any re-
  * aggregation so second-stage sums are exact.
  */
object Regress {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q330
    // Granger-lite: does yesterday's volume improve today's spend
    // forecast beyond yesterday's spend? Full model y_t ~ y_{t−1} +
    // x_{t−1} vs restricted y_t ~ y_{t−1}; F = (RSS_r − RSS_f)(n−3)/
    // RSS_f — both fits closed-form from one lagged moment pass.
    Query(
      "q330_granger",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("xv"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("yv"))
        val wD = Window.orderBy(col("day"))
        val lagged = daily
          .withColumn("yl", lag(col("yv"), 1).over(wD))
          .withColumn("xl", lag(col("xv"), 1).over(wD))
          .filter(col("yl").isNotNull)
          .select(col("yv").as("y"), col("yl").as("x1"), col("xl").as("x2"))
        val mo = lagged.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
          Exact.m2("x1", "x1").as("s11"),
          Exact.m2("x2", "x2").as("s22"),
          Exact.m2("x1", "x2").as("s12"),
          Exact.m2("x1", "y").as("s1y"),
          Exact.m2("x2", "y").as("s2y"),
          Exact.m2("y", "y").as("syy"))
        val c = mo.select(col("n"),
          (col("s11").cast("double") - col("s1").cast("double") *
            col("s1").cast("double") / col("n").cast("double")).as("a11"),
          (col("s22").cast("double") - col("s2").cast("double") *
            col("s2").cast("double") / col("n").cast("double")).as("a22"),
          (col("s12").cast("double") - col("s1").cast("double") *
            col("s2").cast("double") / col("n").cast("double")).as("a12"),
          (col("s1y").cast("double") - col("s1").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("b1"),
          (col("s2y").cast("double") - col("s2").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("b2"),
          (col("syy").cast("double") - col("sy").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("ayy"))
        c.select(col("n").as("n_days"),
            (col("ayy") -
              ((col("b1") * col("a22") - col("b2") * col("a12")) /
                (col("a11") * col("a22") - col("a12") * col("a12"))) * col("b1") -
              ((col("b2") * col("a11") - col("b1") * col("a12")) /
                (col("a11") * col("a22") - col("a12") * col("a12"))) * col("b2"))
              .as("rssf"),
            (col("ayy") - col("b1") * col("b1") / col("a11")).as("rssr"),
            ((col("b2") * col("a11") - col("b1") * col("a12")) /
              (col("a11") * col("a22") - col("a12") * col("a12"))).as("bx"))
          .select(col("n_days"), Num.r6(col("bx")).as("beta_volume_lag"),
            Num.r4((col("rssr") - col("rssf")) *
              (col("n_days").cast("double") - lit(3.0)) / col("rssf"))
              .as("granger_f"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS xv,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS yv
          FROM events GROUP BY 1),
        lagged AS (
          SELECT yv AS y, yl AS x1, xl AS x2 FROM (
            SELECT yv, LAG(yv) OVER (ORDER BY day) AS yl,
              LAG(xv) OVER (ORDER BY day) AS xl
            FROM daily)
          WHERE yl IS NOT NULL),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
            CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
            SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
            SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
            SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
            SUM(CAST(x2 AS HUGEINT) * y) AS s2y,
            SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM lagged),
        c AS (
          SELECT n,
            CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS a11,
            CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS a22,
            CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS a12,
            CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS b1,
            CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS b2,
            CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS ayy
          FROM mo),
        f AS (
          SELECT n,
            ayy - ((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12)) * b1
                - ((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12)) * b2 AS rssf,
            ayy - b1 * b1 / a11 AS rssr,
            (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) AS bx
          FROM c)
        SELECT n AS n_days,
          FLOOR(bx * 1000000 + 0.500001) / 1000000 AS beta_volume_lag,
          FLOOR(((rssr - rssf) * (CAST(n AS DOUBLE) - 3.0) / rssf)
                * 10000 + 0.500001) / 10000 AS granger_f
        FROM f"""),
      "Granger-lite F test: does lagged volume improve the spend forecast over lagged spend alone (closed form)"),

    // ---------------------------------------------------------------- q331
    // Cook's distance for the daily volume→spend regression: the 5
    // most influential days, each with residual, leverage and D —
    // the "which day is bending my fit" audit. Scalar fit moments
    // broadcast; per-day D is nano-quantized for a deterministic
    // top-5.
    Query(
      "q331_cooks_distance",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint()
        val ms = Exact.olsMoments()
        val mo = daily.agg(ms.head, ms.tail: _*)
        val c = mo.select(col("n").cast("double").as("n"),
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n").cast("double")).as("cxx"),
          (col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("cxy"),
          (col("syy").cast("double") - col("sy").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("cyy"),
          (col("sx").cast("double") / col("n").cast("double")).as("mx"),
          (col("sy").cast("double") / col("n").cast("double")).as("my"))
        daily.crossJoin(broadcast(c))
          .withColumn("e", col("y").cast("double") - col("my") -
            (col("cxy") / col("cxx")) * (col("x").cast("double") - col("mx")))
          .withColumn("h", lit(1.0) / col("n") +
            (col("x").cast("double") - col("mx")) *
              (col("x").cast("double") - col("mx")) / col("cxx"))
          .withColumn("s2",
            (col("cyy") - col("cxy") * col("cxy") / col("cxx")) /
              (col("n") - lit(2.0)))
          .withColumn("dq",
            floor(col("e") * col("e") * col("h") /
              (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
                (lit(1.0) - col("h"))) * lit(1e9) + lit(0.5)).cast("long"))
          .orderBy(col("dq").desc, col("day"))
          .limit(5)
          .select(col("day"), col("x").as("volume"), col("y").as("spend_cents"),
            Num.r4(col("e") / lit(100.0)).as("residual_dollars"),
            Num.r6(col("h")).as("leverage"),
            (col("dq").cast("double") / lit(1e9)).as("cooks_d"))
          .orderBy(col("cooks_d").desc, col("day"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * y) AS sxy,
            SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM daily),
        c AS (
          SELECT CAST(n AS DOUBLE) AS n,
            CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
            CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy,
            CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS cyy,
            CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my
          FROM mo),
        scored AS (
          SELECT day, x, y,
            CAST(y AS DOUBLE) - my - (cxy / cxx) * (x - mx) AS e,
            1.0 / n + (x - mx) * (x - mx) / cxx AS h,
            (cyy - cxy * cxy / cxx) / (n - 2.0) AS s2
          FROM daily CROSS JOIN c),
        q AS (
          SELECT day, x, y, e, h,
            CAST(FLOOR(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
              * 1e9 + 0.5) AS BIGINT) AS dq
          FROM scored),
        top AS (SELECT * FROM q ORDER BY dq DESC, day LIMIT 5)
        SELECT day, x AS volume, y AS spend_cents,
          FLOOR((e / 100.0) * 10000 + 0.500001) / 10000 AS residual_dollars,
          FLOOR(h * 1000000 + 0.500001) / 1000000 AS leverage,
          CAST(dq AS DOUBLE) / 1e9 AS cooks_d
        FROM top ORDER BY cooks_d DESC, day"""),
      "Cook's distance top-5 influential days for the volume->spend fit (broadcast scalar moments, quantized D)"),

    // ---------------------------------------------------------------- q332
    // Breusch–Pagan heteroskedasticity test: regress the (micro-
    // quantized) squared residual on volume; BP = n·R² of that
    // auxiliary fit. The residuals come from the same closed-form fit
    // as q331; quantizing e² per day FIRST makes the second-stage
    // sums exact integers.
    Query(
      "q332_breusch_pagan",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint()
        val mo = daily.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          Exact.m2("x", "x").as("sxx"),
          Exact.m2("x", "y").as("sxy"))
        val c = mo.select(col("n"),
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n").cast("double")).as("cxx"),
          (col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n").cast("double")).as("cxy"),
          (col("sx").cast("double") / col("n").cast("double")).as("mx"),
          (col("sy").cast("double") / col("n").cast("double")).as("my"))
        val eq = daily.crossJoin(broadcast(c))
          .select(col("x"),
            floor((col("y").cast("double") - col("my") -
              (col("cxy") / col("cxx")) *
                (col("x").cast("double") - col("mx"))) *
              (col("y").cast("double") - col("my") -
                (col("cxy") / col("cxx")) *
                  (col("x").cast("double") - col("mx")))
              * lit(1e2) + lit(0.5)).cast("long").as("e2"))
        val aux = eq.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("e2").cast("decimal(38,0)")).as("se"),
          Exact.m2("x", "x").as("sxx"),
          Exact.m2("x", "e2").as("sxe"),
          Exact.m2("e2", "e2").as("see"))
        aux.select(col("n").as("n_days"),
          Num.r4(col("n").cast("double") *
            (col("sxe").cast("double") - col("sx").cast("double") *
              col("se").cast("double") / col("n").cast("double")) *
            (col("sxe").cast("double") - col("sx").cast("double") *
              col("se").cast("double") / col("n").cast("double")) /
            ((col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("n").cast("double")) *
              (col("see").cast("double") - col("se").cast("double") *
                col("se").cast("double") / col("n").cast("double"))))
            .as("bp_stat"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM daily),
        c AS (
          SELECT n,
            CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
            CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy,
            CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my
          FROM mo),
        eq AS (
          SELECT x,
            CAST(FLOOR((CAST(y AS DOUBLE) - my - (cxy / cxx) * (x - mx)) *
              (CAST(y AS DOUBLE) - my - (cxy / cxx) * (x - mx))
              * 1e2 + 0.5) AS BIGINT) AS e2
          FROM daily CROSS JOIN c),
        aux AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, SUM(CAST(e2 AS HUGEINT)) AS se,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * e2) AS sxe,
            SUM(CAST(e2 AS HUGEINT) * e2) AS see
          FROM eq)
        SELECT n AS n_days,
          FLOOR((CAST(n AS DOUBLE) *
                 (CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE) * se / n) *
                 (CAST(sxe AS DOUBLE) - CAST(sx AS DOUBLE) * se / n) /
                 ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) *
                  (CAST(see AS DOUBLE) - CAST(se AS DOUBLE) * se / n)))
                * 10000 + 0.500001) / 10000 AS bp_stat
        FROM aux"""),
      "Breusch-Pagan heteroskedasticity test: n*R^2 of squared residuals on volume (quantized e^2, exact sums)")
  )
}
