package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-model continuation, batch 39: negative-binomial moment fit,
  * the Poisson rate-ratio A/B test on the shared md5 arms, and the
  * two-sample Cramér–von Mises statistic from cumulative histograms.
  */
object Rates {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q327
    // Negative-binomial moment fit per event type on the zero-filled
    // daily grid: r = m²/(v−m), NB zero probability (r/(r+m))^r via
    // EXP/LN, against the observed zero share — the distribution
    // q304's dispersion ratio says you need. Types with v ≤ m report
    // NULL r (Poisson or under-dispersed).
    Query(
      "q327_negbin_fit",
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
        val mo = grid.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("sc2"),
            count(when(col("c") === 0, 1)).as("nz"))
          .select(col("event_type"), col("n"), col("nz"),
            (col("sc").cast("double") / col("n").cast("double")).as("m"),
            ((col("sc2").cast("double") - col("sc").cast("double") *
              col("sc").cast("double") / col("n").cast("double")) /
              (col("n").cast("double") - lit(1.0))).as("v"))
        mo.select(col("event_type"), col("n").as("n_days"),
            Num.r4(col("m")).as("mean_daily"),
            when(col("v") > col("m"),
              Num.r4(col("m") * col("m") / (col("v") - col("m")))).as("nb_r"),
            when(col("v") > col("m"),
              Num.r6(exp((col("m") * col("m") / (col("v") - col("m"))) *
                log((col("m") * col("m") / (col("v") - col("m"))) /
                  ((col("m") * col("m") / (col("v") - col("m"))) + col("m"))))))
              .as("zero_nb"),
            Num.r6(col("nz").cast("double") / col("n").cast("double"))
              .as("zero_obs"))
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
            AND cell.day = dd.day),
        mo AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE c = 0) AS BIGINT) AS nz,
            CAST(SUM(c) AS DOUBLE) / COUNT(*) AS m,
            (CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
              - CAST(SUM(c) AS DOUBLE) * SUM(c) / COUNT(*)) /
              (CAST(COUNT(*) AS DOUBLE) - 1.0) AS v
          FROM grid GROUP BY event_type)
        SELECT event_type, n AS n_days,
          FLOOR(m * 10000 + 0.500001) / 10000 AS mean_daily,
          CASE WHEN v > m
            THEN FLOOR((m * m / (v - m)) * 10000 + 0.500001) / 10000 END AS nb_r,
          CASE WHEN v > m
            THEN FLOOR(EXP((m * m / (v - m)) *
                   LN((m * m / (v - m)) / ((m * m / (v - m)) + m)))
                 * 1000000 + 0.500001) / 1000000 END AS zero_nb,
          FLOOR((CAST(nz AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS zero_obs
        FROM mo ORDER BY event_type"""),
      "Negative-binomial moment fit per event type (r, NB zero prob vs observed zeros) on the zero-filled day grid"),

    // ---------------------------------------------------------------- q328
    // Poisson rate-ratio A/B test on the shared md5 arms: events per
    // exposed user between arm 0 and arm 1, Wald z on the log rate
    // ratio (1/c0 + 1/c1 variance) — the count-metric companion to
    // q181's Welch and q194's proportion z. Exact counts; one LN.
    Query(
      "q328_rate_ratio",
      (s, d) => {
        val armed = Tables.events(s, d)
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            col("user_id"))
        val g = armed.groupBy(col("arm"))
          .agg(count(lit(1)).as("c"), countDistinct(col("user_id")).as("u"))
        val w = g.agg(
          max(when(col("arm") === 0, col("c"))).as("c0"),
          max(when(col("arm") === 0, col("u"))).as("u0"),
          max(when(col("arm") === 1, col("c"))).as("c1"),
          max(when(col("arm") === 1, col("u"))).as("u1"))
        w.select(col("c0"), col("u0"), col("c1"), col("u1"),
            Num.r4((col("c1").cast("double") / col("u1").cast("double")) /
              (col("c0").cast("double") / col("u0").cast("double")))
              .as("rate_ratio"),
            Num.r4(log((col("c1").cast("double") / col("u1").cast("double")) /
              (col("c0").cast("double") / col("u0").cast("double"))) /
              sqrt(lit(1.0) / col("c0").cast("double") +
                lit(1.0) / col("c1").cast("double"))).as("wald_z"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")}
            % 2 AS arm, user_id
          FROM events),
        g AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS c,
                CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u
              FROM armed GROUP BY arm),
        w AS (
          SELECT
            MAX(CASE WHEN arm = 0 THEN c END) AS c0,
            MAX(CASE WHEN arm = 0 THEN u END) AS u0,
            MAX(CASE WHEN arm = 1 THEN c END) AS c1,
            MAX(CASE WHEN arm = 1 THEN u END) AS u1
          FROM g)
        SELECT c0, u0, c1, u1,
          FLOOR(((CAST(c1 AS DOUBLE) / u1) / (CAST(c0 AS DOUBLE) / u0))
                * 10000 + 0.500001) / 10000 AS rate_ratio,
          FLOOR((LN((CAST(c1 AS DOUBLE) / u1) / (CAST(c0 AS DOUBLE) / u0)) /
                 SQRT(1.0 / c0 + 1.0 / c1)) * 10000 + 0.500001) / 10000
            AS wald_z
        FROM w"""),
      "Poisson rate-ratio test between md5 A/B arms: events per exposed user, Wald z on the log ratio"),

    // ---------------------------------------------------------------- q329
    // Two-sample Cramér–von Mises between en and non-en document
    // lengths: T = (nm/(n+m)²)·Σ_pooled (F_n(x) − G_m(x))², the
    // quadratic-EDF companion to q174's KS and q315's AD. Per-value
    // EDF gaps come from the cumulative histogram as exact rationals
    // (micro-quantized squares weighted by pooled multiplicity), so
    // T is bit-stable cross-engine.
    Query(
      "q329_cramer_von_mises",
      (s, d) => {
        val hist = Tables.documents(s, d)
          .select((col("lang") === "en").as("isa"), col("n_chars").as("v"))
          .groupBy(col("v"))
          .agg(count(when(col("isa"), 1)).as("ca"),
            count(when(!col("isa"), 1)).as("cb"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cuma", sum(col("ca")).over(wV))
          .withColumn("cumb", sum(col("cb")).over(wV))
        val tot = cum.agg(max(col("cuma")).as("na"), max(col("cumb")).as("nb"))
        val terms = cum.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"),
            ((col("ca") + col("cb")).cast("decimal(38,0)") *
              floor((col("cuma").cast("double") / col("na").cast("double") -
                col("cumb").cast("double") / col("nb").cast("double")) *
                (col("cuma").cast("double") / col("na").cast("double") -
                  col("cumb").cast("double") / col("nb").cast("double"))
                * lit(1e12) + lit(0.5)).cast("long")).as("term"))
          .groupBy(col("na"), col("nb")).agg(sum(col("term")).as("st"))
        terms.select(col("na").as("n_en"), col("nb").as("n_other"),
          Num.r6(col("na").cast("double") * col("nb").cast("double") /
            ((col("na") + col("nb")).cast("double") *
              (col("na") + col("nb")).cast("double")) *
            (col("st").cast("double") / lit(1e12))).as("cvm_stat"))
      },
      Some("""
        WITH hist AS (
          SELECT n_chars AS v,
            CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS cb
          FROM documents GROUP BY n_chars),
        cum AS (
          SELECT v, ca, cb,
            SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
          FROM hist
          WINDOW w AS (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        tot AS (SELECT CAST(MAX(cuma) AS BIGINT) AS na,
                  CAST(MAX(cumb) AS BIGINT) AS nb FROM cum),
        terms AS (
          SELECT na, nb,
            SUM(CAST(ca + cb AS HUGEINT) *
                CAST(FLOOR((CAST(cuma AS DOUBLE) / na
                    - CAST(cumb AS DOUBLE) / nb) *
                  (CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
                  * 1e12 + 0.5) AS BIGINT)) AS st
          FROM cum CROSS JOIN tot GROUP BY na, nb)
        SELECT na AS n_en, nb AS n_other,
          FLOOR((CAST(na AS DOUBLE) * nb /
                 (CAST(na + nb AS DOUBLE) * (na + nb)) *
                 (CAST(st AS DOUBLE) / 1e12)) * 1000000 + 0.500001) / 1000000
            AS cvm_stat
        FROM terms"""),
      "Two-sample Cramer-von Mises between en/other lengths (pooled-weighted quantized EDF-gap squares)")
  )
}
