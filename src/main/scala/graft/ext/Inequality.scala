package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Inequality continuation, batch 50: Hoover and Atkinson indices of
  * per-user activity — the redistribution-share and welfare-loss views
  * that complete the Lorenz/Gini (q129), Theil (q212), token-Gini
  * (q203) and participation (q346) family.
  */
object Inequality {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q372
    // Hoover (Robin Hood) index: the share of all events that would
    // have to move between users to equalize activity — H = Σᵢ
    // max(n·yᵢ − T, 0) / (n·T), an EXACT rational (cross-multiplied so
    // no per-user division ever happens). Also reports the share of
    // above-mean users. One groupBy + one agg, fully linear.
    Query(
      "q372_hoover",
      (s, d) => {
        val ua = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("y"))
        val tot = ua.agg(count(lit(1)).as("n"), sum(col("y")).as("t"))
        ua.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("nn"), max(col("t")).as("tt"),
            sum(greatest(col("n") * col("y") - col("t"), lit(0L))).as("surplus"),
            count(when(col("n") * col("y") > col("t"), 1)).as("nabove"))
          .select(col("nn").as("n_users"), col("tt").as("n_events"),
            Num.r6(col("surplus").cast("double") /
              (col("nn").cast("double") * col("tt").cast("double"))).as("hoover"),
            Num.r4(col("nabove").cast("double") / col("nn").cast("double"))
              .as("share_above_mean"))
      },
      Some("""
        WITH ua AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS y
                    FROM events GROUP BY user_id),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS t FROM ua)
        SELECT MAX(n) AS n_users, MAX(t) AS n_events,
          FLOOR((CAST(SUM(GREATEST(n * y - t, 0)) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * MAX(t))) * 1000000 + 0.500001)
            / 1000000 AS hoover,
          FLOOR((CAST(COUNT(*) FILTER (WHERE n * y > t) AS DOUBLE)
                 / MAX(n)) * 10000 + 0.500001) / 10000 AS share_above_mean
        FROM ua CROSS JOIN tot"""),
      "Hoover (Robin Hood) index of per-user activity: exact cross-multiplied surplus sum, share of above-mean users"),

    // ---------------------------------------------------------------- q374
    // Atkinson inequality at ε = 0.5 and ε = 1: welfare-weighted
    // indices A_½ = 1 − (Σ√y/n)²/μ and A_1 = 1 − geomean/μ. The only
    // per-user transcendentals (√y, ln y) are computed on exact integer
    // counts and nano/pico-quantized BEFORE the cross-user sums (q334
    // discipline), so both engines sum identical integers; y ≥ 1 always
    // (a user appears only by having events), so ln is total.
    Query(
      "q374_atkinson",
      (s, d) => {
        val ua = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("y"))
          .select(col("y"),
            floor(sqrt(col("y").cast("double")) * lit(1e9) + lit(0.5))
              .cast("long").as("sq"),
            floor(log(col("y").cast("double")) * lit(1e12) + lit(0.5))
              .cast("long").as("lq"))
        ua.agg(count(lit(1)).as("n"), sum(col("y")).as("t"),
            sum(col("sq")).as("ssq"),
            sum(col("lq")).as("slq"))
          .select(col("n").as("n_users"), col("t").as("n_events"),
            Num.r6((col("ssq").cast("double") / lit(1e9) / col("n").cast("double"))
              * (col("ssq").cast("double") / lit(1e9) / col("n").cast("double"))
              / (col("t").cast("double") / col("n").cast("double")))
              .as("ede_half_ratio"),
            Num.r6(lit(1.0) -
              (col("ssq").cast("double") / lit(1e9) / col("n").cast("double"))
              * (col("ssq").cast("double") / lit(1e9) / col("n").cast("double"))
              / (col("t").cast("double") / col("n").cast("double")))
              .as("atkinson_half"),
            Num.r6(lit(1.0) -
              exp(col("slq").cast("double") / lit(1e12) / col("n").cast("double"))
              / (col("t").cast("double") / col("n").cast("double")))
              .as("atkinson_one"))
      },
      Some("""
        WITH ua AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS y,
            CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
              AS sq,
            CAST(FLOOR(LN(CAST(COUNT(*) AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
              AS lq
          FROM events GROUP BY user_id),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS t,
            CAST(SUM(sq) AS BIGINT) AS ssq, CAST(SUM(lq) AS BIGINT) AS slq
          FROM ua)
        SELECT n AS n_users, t AS n_events,
          FLOOR(((CAST(ssq AS DOUBLE) / 1e9 / n) * (CAST(ssq AS DOUBLE) / 1e9 / n)
                 / (CAST(t AS DOUBLE) / n)) * 1000000 + 0.500001) / 1000000
            AS ede_half_ratio,
          FLOOR((1.0 - (CAST(ssq AS DOUBLE) / 1e9 / n)
                 * (CAST(ssq AS DOUBLE) / 1e9 / n) / (CAST(t AS DOUBLE) / n))
                * 1000000 + 0.500001) / 1000000 AS atkinson_half,
          FLOOR((1.0 - EXP(CAST(slq AS DOUBLE) / 1e12 / n)
                 / (CAST(t AS DOUBLE) / n)) * 1000000 + 0.500001) / 1000000
            AS atkinson_one
        FROM agg"""),
      "Atkinson inequality of per-user activity at eps 0.5 and 1 (nano/pico-quantized sqrt and ln terms, exact integer sums)"),

    // ---------------------------------------------------------------- q392
    // Herfindahl–Hirschman concentration of the corpus across SOURCES
    // — the market-concentration number (HHI = Σ share², effective
    // source count = 1/HHI) a training-mix owner reads before q360's
    // temperature reweighting: it says how captured the corpus is by
    // its biggest feeds, on both the doc and the token grain. Distinct
    // from q278 (Hill diversity of TOKENS within a source) and q346
    // (top-share of USERS): here the units are the sources themselves.
    // HHI is a ratio of exact integers (Σn², (Σn)² on DECIMAL), so
    // both engines divide identical values.
    Query(
      "q392_hhi_sources",
      (s, d) => {
        val per = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("nd"), sum(col("nt")).as("tk"))
        per.agg(count(lit(1)).as("k"),
            sum(col("nd")).as("sd"),
            Exact.m2("nd", "nd").as("sd2"),
            sum(col("tk")).as("st"),
            Exact.m2("tk", "tk").as("st2"))
          .select(col("k").as("n_sources"),
            Num.r6(col("sd2").cast("double")
              / (col("sd").cast("double") * col("sd").cast("double")))
              .as("hhi_docs"),
            Num.r4(col("sd").cast("double") * col("sd").cast("double")
              / col("sd2").cast("double")).as("eff_sources_docs"),
            Num.r6(col("st2").cast("double")
              / (col("st").cast("double") * col("st").cast("double")))
              .as("hhi_tokens"),
            Num.r4(col("st").cast("double") * col("st").cast("double")
              / col("st2").cast("double")).as("eff_sources_tokens"))
      },
      Some("""
        WITH per AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS nd,
            CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS tk
          FROM documents GROUP BY source),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
            CAST(SUM(nd) AS BIGINT) AS sd,
            SUM(CAST(nd AS HUGEINT) * nd) AS sd2,
            CAST(SUM(tk) AS BIGINT) AS st,
            SUM(CAST(tk AS HUGEINT) * tk) AS st2
          FROM per)
        SELECT k AS n_sources,
          FLOOR((CAST(sd2 AS DOUBLE) / (CAST(sd AS DOUBLE) * sd))
                * 1000000 + 0.500001) / 1000000 AS hhi_docs,
          FLOOR((CAST(sd AS DOUBLE) * sd / CAST(sd2 AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS eff_sources_docs,
          FLOOR((CAST(st2 AS DOUBLE) / (CAST(st AS DOUBLE) * st))
                * 1000000 + 0.500001) / 1000000 AS hhi_tokens,
          FLOOR((CAST(st AS DOUBLE) * st / CAST(st2 AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS eff_sources_tokens
        FROM agg"""),
      "Herfindahl-Hirschman source concentration of the corpus (doc and token grains) with effective source counts, exact integer share moments")
  )
}
