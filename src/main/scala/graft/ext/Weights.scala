package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling-diagnostics continuation, batch 33: effective sample size
  * of importance weights, token burstiness (adaptation), and the
  * Dickey–Fuller unit-root test. Exact integer/DECIMAL moments
  * throughout; the DF regression is closed-form from centered sums.
  */
object Weights {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q307
    // Effective sample size of length-proportional importance weights
    // per source: ESS = (Σw)²/Σw² — how many "real" documents a
    // weighted sample is worth, the q97/q186 sampling pipelines'
    // health gauge. ess_ratio = ESS/n (1 = uniform, →0 = degenerate).
    Query(
      "q307_ess",
      (s, d) => {
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sw"),
            Exact.m2("n_chars", "n_chars").as("sw2"))
          .select(col("source"), col("n_docs"),
            Num.r4(col("sw").cast("double") * col("sw").cast("double") /
              col("sw2").cast("double")).as("ess"),
            Num.r6(col("sw").cast("double") * col("sw").cast("double") /
              col("sw2").cast("double") / col("n_docs").cast("double"))
              .as("ess_ratio"))
          .orderBy(col("source"))
      },
      Some("""
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          FLOOR((CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE) /
                 CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS ess,
          FLOOR((CAST(SUM(n_chars) AS DOUBLE) * CAST(SUM(n_chars) AS DOUBLE) /
                 CAST(SUM(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE) /
                 COUNT(*))
                * 1000000 + 0.500001) / 1000000 AS ess_ratio
        FROM documents GROUP BY source ORDER BY source"""),
      "Effective sample size of length-proportional importance weights per source (ESS = (sum w)^2 / sum w^2)"),

    // ---------------------------------------------------------------- q308
    // Token burstiness (Church & Gale adaptation) for the top-50
    // corpus tokens: P(k ≥ 2 | k ≥ 1) across documents, plus the mean
    // within-doc count given presence — "does this token cluster in
    // few documents or spread evenly", the feature behind burst-aware
    // term weighting. One (doc, token) count pass; everything after
    // is top-50 bounded.
    Query(
      "q308_token_burstiness",
      (s, d) => {
        val dtc = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("k"))
        val stats = dtc.groupBy(col("t"))
          .agg(sum(col("k")).as("total"), count(lit(1)).as("df1"),
            count(when(col("k") >= 2, 1)).as("df2"))
        stats.orderBy(col("total").desc, col("t")).limit(50)
          .select(col("t").as("token"), col("total"), col("df1"), col("df2"),
            Num.r6(col("df2").cast("double") / col("df1").cast("double"))
              .as("adaptation"),
            Num.r4(col("total").cast("double") / col("df1").cast("double"))
              .as("mean_k_given_present"))
          .orderBy(col("total").desc, col("token"))
      },
      Some("""
        WITH dtc AS (
          SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS k
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY doc_id, t),
        stats AS (
          SELECT t, CAST(SUM(k) AS BIGINT) AS total,
            CAST(COUNT(*) AS BIGINT) AS df1,
            CAST(COUNT(*) FILTER (WHERE k >= 2) AS BIGINT) AS df2
          FROM dtc GROUP BY t),
        top AS (SELECT * FROM stats ORDER BY total DESC, t LIMIT 50)
        SELECT t AS token, total, df1, df2,
          FLOOR((CAST(df2 AS DOUBLE) / df1) * 1000000 + 0.500001) / 1000000
            AS adaptation,
          FLOOR((CAST(total AS DOUBLE) / df1) * 10000 + 0.500001) / 10000
            AS mean_k_given_present
        FROM top ORDER BY total DESC, token"""),
      "Church-Gale token burstiness for the top-50 tokens: adaptation P(k>=2 | k>=1) and mean count given presence"),

    // ---------------------------------------------------------------- q309
    // Dickey–Fuller unit-root test on the daily event-count series:
    // Δx_t = α + β·x_{t−1} + ε, closed-form β̂ and its t statistic
    // from exact centered sums, plus the implied mean-reversion
    // half-life −ln2/ln(1+β̂) when β̂ ∈ (−1, 0). The "is traffic a
    // random walk" gate that q241's Hurst exponent approximates.
    Query(
      "q309_dickey_fuller",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val wT = Window.orderBy(col("day"))
        val pairs = daily
          .withColumn("xl", lag(col("x"), 1).over(wT))
          .filter(col("xl").isNotNull)
          .select((col("x") - col("xl")).as("dx"), col("xl"))
        val mo = pairs.agg(count(lit(1)).as("n"),
          sum(col("dx")).as("sd"), sum(col("xl")).as("sl"),
          Exact.m2("dx", "dx").as("sdd"),
          Exact.m2("xl", "xl").as("sll"),
          Exact.m2("dx", "xl").as("sdl"))
        val c = mo.select(col("n"),
          (col("sdl").cast("double") - col("sd").cast("double") *
            col("sl").cast("double") / col("n").cast("double")).as("sxy"),
          (col("sll").cast("double") - col("sl").cast("double") *
            col("sl").cast("double") / col("n").cast("double")).as("sxx"),
          (col("sdd").cast("double") - col("sd").cast("double") *
            col("sd").cast("double") / col("n").cast("double")).as("syy"))
        c.select(col("n").as("n_diffs"),
            (col("sxy") / col("sxx")).as("beta"),
            col("sxx"), col("syy"), col("sxy"))
          .select(col("n_diffs"), Num.r6(col("beta")).as("beta"),
            Num.r4(col("beta") / sqrt(
              ((col("syy") - col("beta") * col("sxy")) /
                (col("n_diffs").cast("double") - lit(2.0))) / col("sxx")))
              .as("df_tstat"),
            when(col("beta") < 0 && col("beta") > -1,
              Num.r4(-log(lit(2.0)) / log(lit(1.0) + col("beta"))))
              .as("half_life_days"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        pairs AS (
          SELECT x - xl AS dx, xl FROM (
            SELECT x, LAG(x) OVER (ORDER BY day) AS xl FROM daily)
          WHERE xl IS NOT NULL),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(dx) AS BIGINT) AS sd, CAST(SUM(xl) AS BIGINT) AS sl,
            SUM(CAST(dx AS HUGEINT) * dx) AS sdd,
            SUM(CAST(xl AS HUGEINT) * xl) AS sll,
            SUM(CAST(dx AS HUGEINT) * xl) AS sdl
          FROM pairs),
        c AS (
          SELECT n,
            CAST(sdl AS DOUBLE) - CAST(sd AS DOUBLE) * sl / n AS sxy,
            CAST(sll AS DOUBLE) - CAST(sl AS DOUBLE) * sl / n AS sxx,
            CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * sd / n AS syy
          FROM mo),
        b AS (SELECT n, sxy / sxx AS beta, sxx, syy, sxy FROM c)
        SELECT n AS n_diffs,
          FLOOR(beta * 1000000 + 0.500001) / 1000000 AS beta,
          FLOOR((beta / SQRT(((syy - beta * sxy) / (CAST(n AS DOUBLE) - 2.0))
                             / sxx)) * 10000 + 0.500001) / 10000 AS df_tstat,
          CASE WHEN beta < 0 AND beta > -1
            THEN FLOOR((-LN(2.0) / LN(1.0 + beta)) * 10000 + 0.500001) / 10000
          END AS half_life_days
        FROM b"""),
      "Dickey-Fuller unit-root test on daily volume: closed-form beta, t-stat, mean-reversion half-life")
  )
}
