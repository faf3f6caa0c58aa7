package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tail/mixture continuation, batch 34: two-component exponential EM
  * over the bounded gap histogram, the Hill tail-index estimator,
  * integrated autocorrelation time, and CVaR. The EM's scalar state
  * walks 5 deterministic iterations — responsibilities are
  * ppb-quantized each round, so Spark's driver loop over 1-row frames
  * and DuckDB's recursive CTE carry bit-identical parameters.
  */
object Tail {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q310
    // Two-component exponential mixture (fast sessions vs long idle)
    // fit by 5 EM iterations on the minute-bucketed gap histogram
    // (midpoint x = m + 0.5, gaps capped at 12 h). Initial split
    // λ = (2/μ, 1/(2μ)); per-bucket responsibilities are quantized to
    // ppb integers each iteration, so both engines walk the same
    // parameter path. Everything after the one gap pass is histogram-
    // bounded.
    Query(
      "q310_exp_mixture_em",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val hist = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(expr("gap div 60000000").as("m"))
          .filter(col("m") <= 720)
          .groupBy(col("m")).agg(count(lit(1)).as("c"))
          .withColumn("x", col("m").cast("double") + lit(0.5))
          .localCheckpoint() // bounded histogram drives all 5 EM rounds
        val mu = hist.agg((sum(col("x") * col("c").cast("double")) /
          sum(col("c")).cast("double")).as("mu"))
        var st = mu.select(lit(500000000L).as("wq"),
          (lit(2.0) / col("mu")).as("l1"),
          (lit(0.5) / col("mu")).as("l2"))
        for (_ <- 1 to 5) {
          val r = hist.crossJoin(broadcast(st))
            .withColumn("f1", col("l1") * exp(-col("l1") * col("x")))
            .withColumn("f2", col("l2") * exp(-col("l2") * col("x")))
            .withColumn("rq",
              floor(col("wq").cast("double") * col("f1") /
                (col("wq").cast("double") * col("f1") +
                  (lit(1e9) - col("wq").cast("double")) * col("f2"))
                * lit(1e9) + lit(0.5)).cast("long"))
          st = r.agg(
            expr("(2 * sum(c * rq) + sum(c)) div (2 * sum(c))").as("wq"),
            (sum(col("c").cast("double") * col("rq").cast("double")) /
              sum(col("c").cast("double") * col("rq").cast("double") * col("x")))
              .as("l1"),
            (sum(col("c").cast("double") * (lit(1e9) - col("rq").cast("double"))) /
              sum(col("c").cast("double") * (lit(1e9) - col("rq").cast("double")) *
                col("x"))).as("l2"))
            .localCheckpoint()
        }
        val n = hist.agg(sum(col("c")).as("n_gaps"))
        st.crossJoin(broadcast(n))
          .select(col("n_gaps"),
            Num.r6(col("wq").cast("double") / lit(1e9)).as("weight_fast"),
            Num.r6(col("l1")).as("lambda_fast"),
            Num.r6(col("l2")).as("lambda_slow"))
      },
      Some("""
        WITH RECURSIVE hist AS (
          SELECT m, CAST(COUNT(*) AS BIGINT) AS c, CAST(m AS DOUBLE) + 0.5 AS x
          FROM (
            SELECT gap // 60000000 AS m FROM (
              SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
              FROM events)
            WHERE gap IS NOT NULL AND gap // 60000000 <= 720)
          GROUP BY m),
        mu AS (SELECT SUM(x * c) / SUM(c) AS mu FROM hist),
        em(iter, wq, l1, l2) AS (
          SELECT 0, CAST(500000000 AS BIGINT), 2.0 / mu, 0.5 / mu FROM mu
          UNION ALL
          SELECT iter + 1,
            (2 * SUM(c * rq) + SUM(c)) // (2 * SUM(c)),
            SUM(CAST(c AS DOUBLE) * rq) / SUM(CAST(c AS DOUBLE) * rq * x),
            SUM(CAST(c AS DOUBLE) * (1e9 - rq)) /
              SUM(CAST(c AS DOUBLE) * (1e9 - rq) * x)
          FROM (
            SELECT iter, c, x,
              CAST(FLOOR(CAST(wq AS DOUBLE) * (l1 * EXP(-l1 * x)) /
                (CAST(wq AS DOUBLE) * (l1 * EXP(-l1 * x)) +
                 (1e9 - CAST(wq AS DOUBLE)) * (l2 * EXP(-l2 * x)))
                * 1e9 + 0.5) AS BIGINT) AS rq
            FROM em CROSS JOIN hist WHERE iter < 5) q
          GROUP BY iter + 1),
        n AS (SELECT CAST(SUM(c) AS BIGINT) AS n_gaps FROM hist)
        SELECT n_gaps,
          FLOOR((CAST(wq AS DOUBLE) / 1e9) * 1000000 + 0.500001) / 1000000
            AS weight_fast,
          FLOOR(l1 * 1000000 + 0.500001) / 1000000 AS lambda_fast,
          FLOOR(l2 * 1000000 + 0.500001) / 1000000 AS lambda_slow
        FROM em CROSS JOIN n WHERE iter = 5"""),
      "Two-component exponential mixture on the gap-minute histogram: 5 EM rounds with ppb-quantized responsibilities"),

    // ---------------------------------------------------------------- q311
    // Hill tail-index estimator on document lengths: α̂ = k / Σ ln(x_i
    // / x_(k+1)) over the top k = 200 order statistics — the "how
    // heavy is the long-document tail" number that decides truncation
    // policy. A 201-row TakeOrdered bounds everything; ln terms are
    // nano-quantized before the exact sum.
    Query(
      "q311_hill_tail",
      (s, d) => {
        val topk = Tables.documents(s, d)
          .select(col("n_chars").cast("double").as("x"))
          .orderBy(col("x").desc).limit(201)
          .withColumn("rk", row_number().over(Window.orderBy(col("x").desc)))
          .localCheckpoint() // 201 rows
        val thr = topk.filter(col("rk") === 201)
          .select(col("x").as("xk1"))
        topk.filter(col("rk") <= 200)
          .crossJoin(broadcast(thr))
          .select(floor(log(col("x") / col("xk1")) * lit(1e9) + lit(0.5))
            .cast("long").as("lq"), col("xk1"))
          .groupBy(col("xk1")).agg(count(lit(1)).as("k"), sum(col("lq")).as("sl"))
          .select(col("k"), col("xk1").cast("long").as("x_threshold"),
            Num.r4(col("k").cast("double") /
              (col("sl").cast("double") / lit(1e9))).as("hill_alpha"))
      },
      Some("""
        WITH topk AS (
          SELECT CAST(n_chars AS DOUBLE) AS x,
            ROW_NUMBER() OVER (ORDER BY n_chars DESC) AS rk
          FROM documents ORDER BY n_chars DESC LIMIT 201),
        thr AS (SELECT x AS xk1 FROM topk WHERE rk = 201)
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(MAX(xk1) AS BIGINT) AS x_threshold,
          FLOOR((CAST(COUNT(*) AS DOUBLE) /
                 (CAST(SUM(CAST(FLOOR(LN(x / xk1) * 1e9 + 0.5) AS BIGINT))
                   AS DOUBLE) / 1e9)) * 10000 + 0.500001) / 10000
            AS hill_alpha
        FROM topk CROSS JOIN thr WHERE rk <= 200"""),
      "Hill tail-index of document lengths over the top-200 order statistics (nano-quantized ln ratios)"),

    // ---------------------------------------------------------------- q312
    // Integrated autocorrelation time of daily volume: τ = 1 + 2Σρ_k
    // over the initial positive sequence (cut at the first lag with
    // ρ ≤ 0, max 20), and the effective number of independent days
    // n/τ — how much the q209-style bootstrap should deflate. Each
    // ρ_k comes from exact lag-joined sums over the bounded daily
    // series and is micro-quantized before the cutoff walk.
    Query(
      "q312_iact",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val mo = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          Exact.m2("x", "x").as("sxx"))
        val a = daily.select(col("day").as("d1"), col("x").as("x1"))
        val b = daily.select(col("day").as("d2"), col("x").as("x2"))
        val rho = a.join(broadcast(b),
            col("d2") - col("d1") >= 1 && col("d2") - col("d1") <= 20)
          .groupBy((col("d2") - col("d1")).as("lag"))
          .agg(Exact.m2("x1", "x2").as("sxy"),
            count(lit(1)).as("np"))
          .crossJoin(broadcast(mo))
          // ρ_k with the standard biased (n-denominator) normalization
          .select(col("lag"),
            floor((col("sxy").cast("double") - col("np").cast("double") *
              (col("sx").cast("double") / col("n").cast("double")) *
              (col("sx").cast("double") / col("n").cast("double"))) /
              (col("sxx").cast("double") - col("sx").cast("double") *
                col("sx").cast("double") / col("n").cast("double"))
              * lit(1e6) + lit(0.5)).cast("long").as("rq"))
        val wL = Window.orderBy(col("lag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val walk = rho.withColumn("minr", min(col("rq")).over(wL))
          .filter(col("minr") > 0) // initial positive sequence
        val tau = walk.agg(count(lit(1)).as("cutoff_lag"), sum(col("rq")).as("srq"))
        tau.crossJoin(broadcast(mo.select(col("n").as("n_days"))))
          .select(col("n_days"), col("cutoff_lag"),
            Num.r4(lit(1.0) + lit(2.0) * col("srq").cast("double") / lit(1e6))
              .as("tau"),
            Num.r4(col("n_days").cast("double") /
              (lit(1.0) + lit(2.0) * col("srq").cast("double") / lit(1e6)))
              .as("ess_days"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx FROM daily),
        rho AS (
          SELECT b.day - a.day AS lag,
            CAST(FLOOR((CAST(SUM(CAST(a.x AS HUGEINT) * b.x) AS DOUBLE)
                - COUNT(*) * (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)) /
              (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
              * 1e6 + 0.5) AS BIGINT) AS rq
          FROM daily a JOIN daily b
            ON b.day - a.day >= 1 AND b.day - a.day <= 20
          CROSS JOIN mo
          GROUP BY b.day - a.day, sx, sxx, n),
        walk AS (
          SELECT lag, rq,
            MIN(rq) OVER (ORDER BY lag
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minr
          FROM rho),
        tau AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS cutoff_lag,
            CAST(SUM(rq) AS BIGINT) AS srq
          FROM walk WHERE minr > 0)
        SELECT n AS n_days, cutoff_lag,
          FLOOR((1.0 + 2.0 * CAST(srq AS DOUBLE) / 1e6) * 10000 + 0.500001)
            / 10000 AS tau,
          FLOOR((CAST(n AS DOUBLE) / (1.0 + 2.0 * CAST(srq AS DOUBLE) / 1e6))
                * 10000 + 0.500001) / 10000 AS ess_days
        FROM tau CROSS JOIN mo"""),
      "Integrated autocorrelation time of daily volume (initial-positive-sequence cutoff <= 20) and effective days"),

    // ---------------------------------------------------------------- q313
    // 95% Value-at-Risk and CVaR (expected shortfall) of daily spend:
    // the worst-5%-of-days threshold as an exact ceil-rank over the
    // bounded cent histogram and the exact mean of the tail at-or-
    // below it (ties included, documented). The revenue-risk number a
    // capacity planner reads.
    Query(
      "q313_cvar",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
        val hist = daily.groupBy(col("y")).agg(count(lit(1)).as("c"))
        val wY = Window.orderBy(col("y"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wY))
          .localCheckpoint()
        val n = cum.agg(max(col("cum")).as("n"))
        val thr = cum.crossJoin(broadcast(n))
          .filter(Exact.ceilRank(col("cum"), 5, "n"))
          .agg(min(col("y")).as("var_y"))
        cum.crossJoin(broadcast(thr)).crossJoin(broadcast(n))
          .filter(col("y") <= col("var_y"))
          .agg(max(col("n")).as("n_days"), max(col("var_y")).as("vy"),
            sum(col("c")).as("n_tail"),
            Exact.m2("y", "c").as("sy"))
          .select(col("n_days"), col("n_tail"),
            Num.r4(col("vy").cast("double") / lit(100.0)).as("var95"),
            Num.r4(col("sy").cast("double") / col("n_tail").cast("double") /
              lit(100.0)).as("cvar95"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        hist AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY y),
        cum AS (
          SELECT y, c, SUM(c) OVER (ORDER BY y
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        n AS (SELECT CAST(MAX(cum) AS BIGINT) AS n FROM cum),
        thr AS (
          SELECT CAST(MIN(y) AS BIGINT) AS var_y
          FROM cum CROSS JOIN n WHERE cum >= (5 * n + 99) // 100)
        SELECT n AS n_days, CAST(SUM(c) AS BIGINT) AS n_tail,
          FLOOR((CAST(var_y AS DOUBLE) / 100.0) * 10000 + 0.500001) / 10000
            AS var95,
          FLOOR((CAST(SUM(CAST(y AS HUGEINT) * c) AS DOUBLE) / SUM(c) / 100.0)
                * 10000 + 0.500001) / 10000 AS cvar95
        FROM cum CROSS JOIN thr CROSS JOIN n
        WHERE y <= var_y GROUP BY n, var_y"""),
      "95% VaR + CVaR of daily spend (exact ceil-rank threshold over the cent histogram, ties-included tail mean)")
  )
}
