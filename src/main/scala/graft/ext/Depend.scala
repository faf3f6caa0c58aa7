package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dependence/regression continuation, batch 32: closed-form
  * two-factor OLS, Poisson overdispersion, Markov entropy rate, and
  * Chatterjee's ξ. Moments ride DECIMAL; the entropy rate reuses
  * q292's exact-integer stationary vector; ξ's rank walk is exact
  * integers over the bounded daily series.
  */
object Depend {

  private val SCALE = 1000000000L

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q303
    // Two-factor OLS by the normal equations (Cramer's rule): daily
    // spend regressed on daily volume and daily active users —
    // closed-form betas, no iteration, every input moment an exact
    // integer/DECIMAL sum over the bounded daily series. R² from the
    // same moments. The multivariate upgrade of q145's single-factor
    // trend.
    Query(
      "q303_ols_two_factor",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x1"),
            countDistinct(col("user_id")).as("x2"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
        val mo = daily.agg(count(lit(1)).as("n"),
          sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
          Exact.m2("x1", "x1").as("s11"),
          Exact.m2("x2", "x2").as("s22"),
          Exact.m2("x1", "x2").as("s12"),
          Exact.m2("x1", "y").as("s1y"),
          Exact.m2("x2", "y").as("s2y"),
          Exact.m2("y", "y").as("syy"))
        // centered moments (doubles from exact sums, identical both sides)
        val c = mo.select(col("n").cast("double").as("n"),
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
            col("sy").cast("double") / col("n").cast("double")).as("ayy"),
          (col("s1").cast("double") / col("n").cast("double")).as("m1"),
          (col("s2").cast("double") / col("n").cast("double")).as("m2"),
          (col("sy").cast("double") / col("n").cast("double")).as("my"))
        c.select(col("n").cast("long").as("n_days"),
            Num.r6(((col("b1") * col("a22") - col("b2") * col("a12")) /
              (col("a11") * col("a22") - col("a12") * col("a12"))))
              .as("beta_volume"),
            Num.r6(((col("b2") * col("a11") - col("b1") * col("a12")) /
              (col("a11") * col("a22") - col("a12") * col("a12"))))
              .as("beta_users"),
            Num.r4(col("my") -
              ((col("b1") * col("a22") - col("b2") * col("a12")) /
                (col("a11") * col("a22") - col("a12") * col("a12"))) * col("m1") -
              ((col("b2") * col("a11") - col("b1") * col("a12")) /
                (col("a11") * col("a22") - col("a12") * col("a12"))) * col("m2"))
              .as("intercept"),
            Num.r6((((col("b1") * col("a22") - col("b2") * col("a12")) /
              (col("a11") * col("a22") - col("a12") * col("a12"))) * col("b1") +
              ((col("b2") * col("a11") - col("b1") * col("a12")) /
                (col("a11") * col("a22") - col("a12") * col("a12"))) * col("b2")) /
              col("ayy")).as("r2"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x1,
            CAST(COUNT(DISTINCT user_id) AS BIGINT) AS x2,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
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
          FROM daily),
        c AS (
          SELECT CAST(n AS DOUBLE) AS n,
            CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n AS a11,
            CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n AS a22,
            CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * s2 / n AS a12,
            CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * sy / n AS b1,
            CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * sy / n AS b2,
            CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS ayy,
            CAST(s1 AS DOUBLE) / n AS m1, CAST(s2 AS DOUBLE) / n AS m2,
            CAST(sy AS DOUBLE) / n AS my
          FROM mo)
        SELECT CAST(n AS BIGINT) AS n_days,
          FLOOR(((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12))
                * 1000000 + 0.500001) / 1000000 AS beta_volume,
          FLOOR(((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12))
                * 1000000 + 0.500001) / 1000000 AS beta_users,
          FLOOR((my - ((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12)) * m1
                    - ((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12)) * m2)
                * 10000 + 0.500001) / 10000 AS intercept,
          FLOOR(((((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12)) * b1 +
                  ((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12)) * b2) / ayy)
                * 1000000 + 0.500001) / 1000000 AS r2
        FROM c"""),
      "Closed-form two-factor OLS of daily spend on volume + active users (Cramer's rule, DECIMAL moments, R^2)"),

    // ---------------------------------------------------------------- q304
    // Poisson overdispersion per event type: variance-to-mean ratio
    // of daily counts plus the dispersion statistic (n−1)s²/x̄ (χ²
    // under the Poisson null) — the gate a traffic model checks
    // before assuming Poisson arrivals. Exact moments over the
    // bounded (type × day) grid, zero-filled.
    Query(
      "q304_overdispersion",
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
        grid.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sc"),
            Exact.m2("c", "c").as("sc2"))
          .select(col("event_type"), col("n_days"),
            Num.r4(col("sc").cast("double") / col("n_days").cast("double"))
              .as("mean_daily"),
            Num.r4(((col("sc2").cast("double") - col("sc").cast("double") *
              col("sc").cast("double") / col("n_days").cast("double")) /
              (col("n_days").cast("double") - lit(1.0))) /
              (col("sc").cast("double") / col("n_days").cast("double")))
              .as("var_mean_ratio"),
            Num.r4((col("sc2").cast("double") - col("sc").cast("double") *
              col("sc").cast("double") / col("n_days").cast("double")) /
              (col("sc").cast("double") / col("n_days").cast("double")))
              .as("dispersion_chi2"))
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
            AND cell.day = dd.day)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
          FLOOR((CAST(SUM(c) AS DOUBLE) / COUNT(*)) * 10000 + 0.500001) / 10000
            AS mean_daily,
          FLOOR((((CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
                   - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*)) /
                  (CAST(COUNT(*) AS DOUBLE) - 1.0)) /
                 (CAST(SUM(c) AS DOUBLE) / COUNT(*)))
                * 10000 + 0.500001) / 10000 AS var_mean_ratio,
          FLOOR(((CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
                  - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*)) /
                 (CAST(SUM(c) AS DOUBLE) / COUNT(*)))
                * 10000 + 0.500001) / 10000 AS dispersion_chi2
        FROM grid GROUP BY event_type ORDER BY event_type"""),
      "Poisson overdispersion per event type: daily variance/mean ratio + dispersion chi-square on the zero-filled grid"),

    // ---------------------------------------------------------------- q305
    // Entropy rate of the user-journey chain:
    // H = −Σ_i π_i Σ_j p_ij ln p_ij, with π from the same 12-round
    // exact-integer power iteration as q292 and each −p·ln p cell
    // nano-quantized before the bounded sums. "How predictable is the
    // next step" in one number, plus the per-state row entropies.
    Query(
      "q305_entropy_rate",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("i"), col("next_type").as("j"))
          .agg(count(lit(1)).as("n"))
          // checkpoint the type-bounded matrix ONCE: tot/states/m/rowH
          // would each re-evaluate the events-window pipeline otherwise
          .localCheckpoint()
        val tot = trans.groupBy(col("i")).agg(sum(col("n")).as("t"))
        val states = trans.select(col("i").as("state"))
          .union(trans.select(col("j"))).distinct()
        val m = trans.join(broadcast(tot), Seq("i"))
          .select(col("i"), col("j"),
            expr(s"(2 * n * $SCALE + t) div (2 * t)").as("ppb"))
        // per-state row entropy: −Σ p ln p from the exact count ratio
        val rowH = trans.join(broadcast(tot), Seq("i"))
          .select(col("i"),
            floor(-(col("n").cast("double") / col("t").cast("double")) *
              log(col("n").cast("double") / col("t").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long").as("hq"))
          .groupBy(col("i")).agg(sum(col("hq")).as("hrowq"))
        val mFull = m.union(states.select(col("state"), col("state"), lit(0L)))
        // round 9: was 12 driver-loop Spark jobs — see MarkovPack in
        // Iterative.scala (same 12 forward rounds as q292, bit-identical)
        val v = MarkovPack.unpack(
          MarkovPack.pack(states, mFull), MarkovPack.forwardRounds(12))
        v.join(rowH, v("state") === rowH("i"))
          .select(col("state"), col("vp"), col("hrowq"))
          .agg(sum((col("vp") * col("hrowq")).cast("decimal(38,0)")).as("sh"),
            count(lit(1)).as("n_states"))
          .select(col("n_states"),
            Num.r6(col("sh").cast("double") / lit(1e18)).as("entropy_rate_nats"))
      },
      Some(s"""
        WITH RECURSIVE trans AS (
          SELECT event_type AS i, next_type AS j, CAST(COUNT(*) AS BIGINT) AS n
          FROM (
            SELECT event_type,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id) AS next_type
            FROM events)
          WHERE next_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT i, CAST(SUM(n) AS BIGINT) AS t FROM trans GROUP BY i),
        states AS (SELECT DISTINCT i AS state FROM trans
                   UNION SELECT DISTINCT j FROM trans),
        m AS (
          SELECT i, j, (2 * n * $SCALE + t) // (2 * t) AS ppb
          FROM trans JOIN tot USING (i)
          UNION ALL SELECT state, state, 0 FROM states),
        rowh AS (
          SELECT i, CAST(SUM(CAST(FLOOR(
              -(CAST(n AS DOUBLE) / t) * LN(CAST(n AS DOUBLE) / t)
              * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS hrowq
          FROM trans JOIN tot USING (i) GROUP BY i),
        kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
        v(iter, state, vp) AS (
          SELECT 0, state, $SCALE // k FROM states CROSS JOIN kk
          UNION ALL
          SELECT iter + 1, j, (2 * SUM(vp * ppb) + $SCALE) // ${2 * SCALE}
          FROM v JOIN m ON m.i = v.state WHERE iter < 12 GROUP BY iter + 1, j)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_states,
          FLOOR((CAST(SUM(CAST(vp AS HUGEINT) * hrowq) AS DOUBLE) / 1e18)
                * 1000000 + 0.500001) / 1000000 AS entropy_rate_nats
        FROM (SELECT state, vp FROM v WHERE iter = 12) fin
        JOIN rowh ON rowh.i = fin.state"""),
      "Markov entropy rate of the journey chain (stationary pi from q292's integer iteration x nano-quantized row entropies)"),

    // ---------------------------------------------------------------- q306
    // Chatterjee's ξ dependence coefficient of daily spend on daily
    // volume: sort days by volume (ties broken by day — documented
    // deterministic variant), walk the spend ranks, ξ = 1 −
    // 3Σ|r_{t+1} − r_t|/(n² − 1). Detects ANY functional dependence,
    // not just monotone — the modern companion to q265's Spearman.
    // Entirely exact integers over the bounded daily series.
    Query(
      "q306_xi_correlation",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint()
        val rY = Window.orderBy(col("y"), col("day"))
        val rX = Window.orderBy(col("x"), col("day"))
        val ranked = daily
          .withColumn("ry", row_number().over(rY).cast("long"))
          .withColumn("ordx", row_number().over(rX).cast("long"))
        val wSeq = Window.orderBy(col("ordx"))
        val steps = ranked
          .withColumn("rnext", lead(col("ry"), 1).over(wSeq))
          .filter(col("rnext").isNotNull)
          .agg(sum(abs(col("rnext") - col("ry"))).as("sd"))
        val n = daily.agg(count(lit(1)).as("n_days"))
        steps.crossJoin(broadcast(n))
          .select(col("n_days"),
            Num.r6(lit(1.0) - lit(3.0) * col("sd").cast("double") /
              (col("n_days").cast("double") * col("n_days").cast("double")
                - lit(1.0))).as("xi"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        ranked AS (
          SELECT day,
            CAST(ROW_NUMBER() OVER (ORDER BY y, day) AS BIGINT) AS ry,
            CAST(ROW_NUMBER() OVER (ORDER BY x, day) AS BIGINT) AS ordx
          FROM daily),
        steps AS (
          SELECT CAST(SUM(ABS(rnext - ry)) AS BIGINT) AS sd FROM (
            SELECT ry, LEAD(ry) OVER (ORDER BY ordx) AS rnext FROM ranked)
          WHERE rnext IS NOT NULL),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        SELECT n_days,
          FLOOR((1.0 - 3.0 * CAST(sd AS DOUBLE) /
                 (CAST(n_days AS DOUBLE) * n_days - 1.0))
                * 1000000 + 0.500001) / 1000000 AS xi
        FROM steps CROSS JOIN n"""),
      "Chatterjee's xi of daily spend on daily volume (deterministic tie-broken rank walk, exact integers)")
  )
}
