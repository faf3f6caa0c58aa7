package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Corpus-curve and snapshot-evolution operators: the vocabulary
  * coverage curve (how much of the token stream the top-k vocabulary
  * explains — the plot that sizes a tokenizer) and a temporal snapshot
  * diff (which keys appeared/disappeared/changed between two corpus
  * states — the ingest-diff audit). */
object Curves {

  private def toks = split(col("text"), " ")

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q123
    // Vocabulary coverage curve at k in {1,2,4,...,64}: the share of
    // all token OCCURRENCES covered by the top-k most frequent tokens
    // (count desc, token asc total order). Scale shape: one frequency
    // pass, a bounded top-64 (TakeOrdered) whose rank window is
    // 64-sized, the corpus total as a broadcast 1-row aggregate, and a
    // 7-point output — the curve costs one token pass regardless of
    // corpus size. Integer counts, one r6 per point.
    Query(
      "q123_vocab_coverage",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val freq = Tables.documents(s, d)
          .select(explode(toks).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("n"))
        val total = freq.agg(sum(col("n")).as("total")) // 1 row
        val top = freq.orderBy(col("n").desc, col("t")).limit(64)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("t"))))
        val ks = Seq(1, 2, 4, 8, 16, 32, 64)
        top.crossJoin(broadcast(total))
          .select(explode(lit(ks.toArray)).as("k"), col("rank"),
            col("n"), col("total"))
          .filter(col("rank") <= col("k"))
          .groupBy(col("k"))
          .agg(sum(col("n")).as("covered"), max(col("total")).as("total"))
          .select(col("k"), col("covered"),
            Num.r6(col("covered") / col("total").cast("double"))
              .as("coverage"))
          .orderBy(col("k"))
      },
      Some(s"""
        WITH freq AS (
          SELECT t, COUNT(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          GROUP BY t),
        total AS (SELECT SUM(n) AS total FROM freq),
        top AS (
          SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rank
          FROM freq QUALIFY rank <= 64),
        ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS k)
        SELECT k, CAST(SUM(n) AS BIGINT) AS covered,
          ${Num.sql("SUM(n) / CAST(MAX(total) AS DOUBLE)", 6)} AS coverage
        FROM top CROSS JOIN total JOIN ks ON rank <= k
        GROUP BY k ORDER BY k"""),
      "vocabulary coverage curve: share of token occurrences covered by the top-k vocabulary at k=1..64 (one token pass + bounded top-64)"),

    // --------------------------------------------------------------- q124
    // Temporal snapshot diff: split the event log at its midpoint
    // (integer-µs midpoint of min/max, from a broadcast 1-row
    // aggregate) and diff per-user activity between the halves —
    // added / removed / changed / unchanged, with before/after counts.
    // The ingest-diff audit run between two crawl or CDC snapshots.
    // All-integer; one user-key aggregate per half, one full-outer
    // join on the user key.
    Query(
      "q124_snapshot_diff",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us")) // 1 row
        val tagged = ev.crossJoin(broadcast(mid))
        val before = tagged.filter(col("us") < col("mid_us"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_before"))
        val after = tagged.filter(col("us") >= col("mid_us"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_after"))
        before.join(after, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_before"), lit(0L)).as("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"),
            when(col("n_before").isNull, lit("added"))
              .when(col("n_after").isNull, lit("removed"))
              .when(col("n_before") === col("n_after"), lit("unchanged"))
              .otherwise(lit("changed")).as("status"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        mid AS (SELECT CAST((MIN(us) + MAX(us)) // 2 AS BIGINT) AS mid_us
                FROM ev),
        b AS (SELECT user_id, COUNT(*) AS n_before
              FROM ev CROSS JOIN mid WHERE us < mid_us GROUP BY user_id),
        a AS (SELECT user_id, COUNT(*) AS n_after
              FROM ev CROSS JOIN mid WHERE us >= mid_us GROUP BY user_id)
        SELECT user_id,
          CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
          CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
          CASE WHEN n_before IS NULL THEN 'added'
               WHEN n_after IS NULL THEN 'removed'
               WHEN n_before = n_after THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM b FULL OUTER JOIN a USING (user_id)
        ORDER BY user_id"""),
      "temporal snapshot diff: per-user added/removed/changed/unchanged between the two halves of the event log (ingest/CDC diff audit)"),

    // --------------------------------------------------------------- q129
    // Revenue-concentration (Lorenz) curve by customer-spend ventile:
    // per 5%-spend band, the band's share of total revenue and the
    // cumulative share — the "top X% of customers drive Y% of
    // revenue" report. Scale-correct formulation: band boundaries are
    // 19 percentiles from ONE broadcast aggregate and each customer
    // bins independently (the textbook global rank/ntile would
    // single-partition-sort every customer); the cumulative sum runs
    // over the 20-row band table. Money stays DECIMAL until the final
    // share division; boundaries are r4-quantized on both engines so
    // band membership can't flip on ulps.
    Query(
      "q129_lorenz_curve",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val spend = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("spend"))
        val qcols = (1 to 19).map(i =>
          Num.r4(percentile(col("spend"), lit(i * 0.05))).as(s"b$i"))
        val bounds = spend.agg(qcols.head, qcols.tail: _*) // 1 row, 19 cols
        val bandExpr = (1 to 19).foldRight(lit(20): org.apache.spark.sql.Column) {
          case (i, acc) => when(col("spend") <= col(s"b$i") && {
            if (i == 1) lit(true) else col("spend") > col(s"b${i - 1}")
          }, i).otherwise(acc)
        }
        val perBand = spend.crossJoin(broadcast(bounds))
          .select(col("o_custkey"), col("spend"), bandExpr.as("band"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("spend").cast("decimal(18,2)")).as("band_spend_dec"))
        val total = perBand.agg(sum(col("band_spend_dec")).as("total_dec"))
        val w = Window.orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perBand.crossJoin(broadcast(total))
          .select(col("band"), col("n_customers"),
            col("band_spend_dec").cast("double").as("band_spend"),
            Num.r6(col("band_spend_dec").cast("double")
              / col("total_dec").cast("double")).as("share"),
            // 20-row frame: the window is band-table-sized, not
            // customer-sized — safe by construction
            Num.r6(sum(col("band_spend_dec")).over(w).cast("double")
              / col("total_dec").cast("double")).as("cum_share"))
          .orderBy(col("band"))
      },
      Some {
        val bs = (1 to 19).map(i =>
          s"${Num.sql(s"QUANTILE_CONT(spend, ${i * 0.05})", 4)} AS b$i")
          .mkString(",\n            ")
        val bandCase = (1 to 19).map { i =>
          val lo = if (i == 1) "" else s" AND spend > b${i - 1}"
          s"WHEN spend <= b$i$lo THEN $i"
        }.mkString("CASE ", " ", " ELSE 20 END")
        s"""
        WITH spend AS (
          SELECT o_custkey,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey),
        bounds AS (
          SELECT
            $bs
          FROM spend),
        banded AS (
          SELECT o_custkey, spend, $bandCase AS band
          FROM spend CROSS JOIN bounds),
        per_band AS (
          SELECT band, COUNT(*) AS n_customers,
            SUM(CAST(spend AS DECIMAL(18,2))) AS band_spend_dec
          FROM banded GROUP BY band),
        tot AS (SELECT SUM(band_spend_dec) AS total_dec FROM per_band)
        SELECT band, CAST(n_customers AS BIGINT) AS n_customers,
          CAST(band_spend_dec AS DOUBLE) AS band_spend,
          ${Num.sql("CAST(band_spend_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)", 6)} AS share,
          ${Num.sql("CAST(SUM(band_spend_dec) OVER (ORDER BY band ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(total_dec AS DOUBLE)", 6)} AS cum_share
        FROM per_band CROSS JOIN tot
        ORDER BY band"""
      },
      "revenue-concentration Lorenz curve by spend ventile: broadcast percentile boundaries (no global rank sort), DECIMAL-exact band sums, 20-row cumulative window"),

    // --------------------------------------------------------------- q130
    // Signup-to-purchase survival curve: for users whose first event
    // ever is a signup, the share that has NOT yet purchased within
    // n days, for n = 0..13 — time-to-conversion analysis. Exact
    // integer time math (µs gap -> whole days via integer division);
    // one per-user aggregate, then a 14-point survival table from a
    // broadcast cohort size. Censoring is explicit: users who never
    // purchase count as surviving at every horizon.
    Query(
      "q130_survival_curve",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val firstAll = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("first_us"),
            min(when(col("event_type") === "signup", col("us"))).as("signup_us"),
            min(when(col("event_type") === "purchase", col("us")))
              .as("purchase_us"))
          .filter(col("signup_us").isNotNull &&
            col("signup_us") === col("first_us"))
        val cohort = firstAll.select(col("user_id"),
          when(col("purchase_us").isNotNull,
            ((col("purchase_us") - col("signup_us"))
              / lit(86400000000L)).cast("long")).as("days_to_purchase"))
        val n = cohort.agg(count(lit(1)).as("n_cohort")) // 1 row
        val horizons = n.select(col("n_cohort"),
          explode(lit((0 to 13).toArray)).as("day"))
        horizons.join(
            cohort.select(col("days_to_purchase"),
              explode(lit((0 to 13).toArray)).as("day"))
              .filter(col("days_to_purchase").isNotNull &&
                col("days_to_purchase") <= col("day"))
              .groupBy(col("day")).agg(count(lit(1)).as("n_converted")),
            Seq("day"), "left")
          .select(col("day"), col("n_cohort"),
            coalesce(col("n_converted"), lit(0L)).as("n_converted"),
            Num.r4((col("n_cohort") - coalesce(col("n_converted"), lit(0L)))
              / col("n_cohort").cast("double")).as("surviving_share"))
          .orderBy(col("day"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        f AS (
          SELECT user_id, MIN(us) AS first_us,
            MIN(CASE WHEN event_type = 'signup' THEN us END) AS signup_us,
            MIN(CASE WHEN event_type = 'purchase' THEN us END) AS purchase_us
          FROM ev GROUP BY user_id),
        cohort AS (
          SELECT user_id,
            CASE WHEN purchase_us IS NOT NULL
              THEN CAST((purchase_us - signup_us) // 86400000000 AS BIGINT)
            END AS days_to_purchase
          FROM f
          WHERE signup_us IS NOT NULL AND signup_us = first_us),
        n AS (SELECT COUNT(*) AS n_cohort FROM cohort),
        days AS (SELECT unnest(range(0, 14)) AS day),
        conv AS (
          SELECT day, COUNT(*) AS n_converted
          FROM cohort CROSS JOIN days
          WHERE days_to_purchase IS NOT NULL AND days_to_purchase <= day
          GROUP BY day)
        SELECT day, CAST(n_cohort AS BIGINT) AS n_cohort,
          CAST(COALESCE(n_converted, 0) AS BIGINT) AS n_converted,
          ${Num.sql("(n_cohort - COALESCE(n_converted, 0)) / CAST(n_cohort AS DOUBLE)", 4)} AS surviving_share
        FROM days LEFT JOIN conv USING (day) CROSS JOIN n
        ORDER BY day"""),
      "signup-to-purchase survival curve over 14 daily horizons (exact integer day math, explicit censoring)"),

    // --------------------------------------------------------------- q245
    // Log-rank test (Mantel 1966) comparing time-to-SECOND-event
    // between the q181 md5 arms — the hypothesis test q130's curve
    // begs for: do the two arms' engagement-latency distributions
    // differ? Per user: t₁ = first distinct event time, t₂ = second
    // (censored at the corpus horizon when absent), duration in whole
    // MINUTES — the q223 bounded-bucket discipline, so the risk-set
    // cumulative window runs over a time-range-bounded grid, never a
    // per-user sort. At each death time: observed arm-A deaths d₁,
    // expected d·n₁/n, hypergeometric variance d·(n₁/n)·((n−n₁)/n)·
    // ((n−d)/(n−1)) — each term computed from exact integers by the
    // IDENTICAL IEEE formula on both engines and micro-quantized
    // BEFORE the sums, so association order cannot surface. Censored
    // users at t remain at risk at t (the standard tie convention).
    Query(
      "q245_logrank",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us")).distinct()
        val horizon = ev.agg(max(col("us")).as("tmax")) // 1 row
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val per = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("k"), min(col("us")).as("t1"),
            max(col("us")).as("t2"))
          .crossJoin(broadcast(horizon))
          .select(col("user_id"),
            (col("k") === 2).as("observed"),
            when(col("k") === 2, (col("t2") - col("t1")) / lit(60000000L))
              .otherwise((col("tmax") - col("t1")) / lit(60000000L))
              .cast("long").as("dur_min"),
            (graft.ext.Dedup.h60(
              concat(lit("ab|"), col("user_id").cast("string"))) % 2)
              .as("arm"))
        val g = per.groupBy(col("dur_min"))
          .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
            sum(when(col("observed") && col("arm") === 0, 1L).otherwise(0L))
              .as("d1"),
            count(lit(1)).as("c"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c1"))
          .localCheckpoint() // bounded minute-grid histogram, one scan
        // descending cumulative = users still at risk at each time
        val wd = Window.orderBy(col("dur_min").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val risk = g
          .withColumn("n", sum(col("c")).over(wd))
          .withColumn("n1", sum(col("c1")).over(wd))
          .filter(col("d") > 0)
        val e1t = floor(lit(1e6) * (col("d") * col("n1")).cast("double")
          / col("n") + lit(0.5)).cast("long")
        val vt = floor(lit(1e6) *
          (((col("d") * col("n1")).cast("double") / col("n")) *
            ((col("n") - col("n1")).cast("double") / col("n")) *
            (when(col("n") > 1, (col("n") - col("d")).cast("double")
              / (col("n") - 1)).otherwise(lit(0.0)))) + lit(0.5)).cast("long")
        val totals = per.agg(count(lit(1)).as("n_users"))
        risk
          .agg(sum(col("d")).as("n_deaths"), sum(col("d1")).as("o1"),
            sum(e1t).as("e1q"), sum(vt).as("vq"))
          .crossJoin(broadcast(totals))
          .select(col("n_users"), col("n_deaths"), col("o1"),
            Num.r6(col("e1q") / lit(1e6)).as("e1"),
            Num.r6(col("vq") / lit(1e6)).as("v"),
            when(col("vq") > 0, Num.r6(
              (col("o1").cast("double") - col("e1q") / lit(1e6)) *
                (col("o1").cast("double") - col("e1q") / lit(1e6)) /
                (col("vq") / lit(1e6)))).as("chi2"),
            when(col("vq") > 0,
              (col("o1").cast("double") - col("e1q") / lit(1e6)) *
                (col("o1").cast("double") - col("e1q") / lit(1e6)) /
                (col("vq") / lit(1e6)) > lit(3.841))
              .otherwise(lit(false)).as("logrank_flag"))
      },
      Some(s"""
        WITH ev AS (
          SELECT DISTINCT user_id, epoch_us(ts) AS us FROM events),
        horizon AS (SELECT MAX(us) AS tmax FROM ev),
        ranked AS (
          SELECT user_id, us,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us) AS rn
          FROM ev),
        per AS (
          SELECT user_id, COUNT(*) = 2 AS observed,
            CAST(CASE WHEN COUNT(*) = 2
              THEN (MAX(us) - MIN(us)) // 60000000
              ELSE (MAX(tmax) - MIN(us)) // 60000000 END AS BIGINT)
              AS dur_min,
            ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2
              AS arm
          FROM ranked CROSS JOIN horizon
          WHERE rn <= 2 GROUP BY user_id),
        g AS (
          SELECT dur_min,
            CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
            CAST(SUM(CASE WHEN observed AND arm = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS d1,
            CAST(COUNT(*) AS BIGINT) AS c,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1
          FROM per GROUP BY dur_min),
        risk AS (
          SELECT d, d1,
            SUM(c) OVER (ORDER BY dur_min DESC
              ROWS UNBOUNDED PRECEDING) AS n,
            SUM(c1) OVER (ORDER BY dur_min DESC
              ROWS UNBOUNDED PRECEDING) AS n1
          FROM g),
        terms AS (
          SELECT d, d1,
            CAST(FLOOR(1e6 * CAST(d * n1 AS DOUBLE) / n + 0.5) AS BIGINT)
              AS e1t,
            CAST(FLOOR(1e6 *
              ((CAST(d * n1 AS DOUBLE) / n) *
               (CAST(n - n1 AS DOUBLE) / n) *
               (CASE WHEN n > 1 THEN CAST(n - d AS DOUBLE) / (n - 1)
                 ELSE 0.0 END)) + 0.5) AS BIGINT) AS vt
          FROM risk WHERE d > 0),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM per),
        agg AS (
          SELECT CAST(SUM(d) AS BIGINT) AS n_deaths,
            CAST(SUM(d1) AS BIGINT) AS o1,
            CAST(SUM(e1t) AS BIGINT) AS e1q, CAST(SUM(vt) AS BIGINT) AS vq
          FROM terms)
        SELECT n_users, n_deaths, o1,
          ${Num.sql("e1q / 1e6", 6)} AS e1,
          ${Num.sql("vq / 1e6", 6)} AS v,
          CASE WHEN vq > 0 THEN ${Num.sql(
            """(CAST(o1 AS DOUBLE) - e1q / 1e6) *
               (CAST(o1 AS DOUBLE) - e1q / 1e6) / (vq / 1e6)""", 6)} END AS chi2,
          CASE WHEN vq > 0 THEN
            ((CAST(o1 AS DOUBLE) - e1q / 1e6) *
             (CAST(o1 AS DOUBLE) - e1q / 1e6) / (vq / 1e6)) > 3.841
          ELSE FALSE END AS logrank_flag
        FROM agg CROSS JOIN tot"""),
      "log-rank test (Mantel 1966) on time-to-second-event between md5 arms: minute-bucketed risk sets, micro-quantized per-time expected/variance terms"),

    // --------------------------------------------------------------- q255
    // Kaplan–Meier estimator with Greenwood standard errors over the
    // q245 cohort (time to second event, censored at the corpus
    // horizon): the nonparametric survival curve q130's fixed-horizon
    // table approximates. Product-limit S(t) = Π(1−dᵢ/nᵢ) is folded
    // in LOG space — each step's ln((n−d)/n) micro-quantized BEFORE
    // the cumulative sum (int64, association-free), one EXP at the
    // end (the q43 exp precedent); Greenwood's Σ d/(n(n−d)) likewise
    // 1e-12-tick-quantized per step. The quantization is part of the
    // pinned semantics, identical on both engines. Total-extinction
    // times (n = d) zero the curve and null the SE from there on.
    Query(
      "q255_kaplan_meier",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us")).distinct()
        val horizon = ev.agg(max(col("us")).as("tmax")) // 1 row
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val per = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("k"), min(col("us")).as("t1"),
            max(col("us")).as("t2"))
          .crossJoin(broadcast(horizon))
          .select((col("k") === 2).as("observed"),
            when(col("k") === 2, (col("t2") - col("t1")) / lit(60000000L))
              .otherwise((col("tmax") - col("t1")) / lit(60000000L))
              .cast("long").as("dur_min"))
        val g = per.groupBy(col("dur_min"))
          .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("c"))
          .localCheckpoint() // bounded minute-grid histogram, one scan
        val wd = Window.orderBy(col("dur_min").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val death = g.withColumn("n", sum(col("c")).over(wd))
          .filter(col("d") > 0)
          .select(col("dur_min"), col("d"), col("n"))
        val t = death.select(col("dur_min"), col("d"), col("n"),
          when(col("n") > col("d"),
            floor(lit(1e6) * log((col("n") - col("d")).cast("double")
              / col("n")) + lit(0.5)).cast("long")).otherwise(0L).as("lnq"),
          when(col("n") === col("d"), 1L).otherwise(0L).as("z"),
          when(col("n") > col("d"),
            floor(lit(1e12) * col("d").cast("double")
              / (col("n") * (col("n") - col("d"))) + lit(0.5)).cast("long"))
            .otherwise(0L).as("gq"))
        val wa = Window.orderBy(col("dur_min"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.withColumn("cl", sum(col("lnq")).over(wa))
          .withColumn("cz", sum(col("z")).over(wa))
          .withColumn("cg", sum(col("gq")).over(wa))
          .select(col("dur_min"), col("n").as("n_risk"),
            col("d").as("n_events"),
            when(col("cz") > 0, lit(0.0))
              .otherwise(Num.r6(exp(col("cl") / lit(1e6)))).as("survival"),
            when(col("cz") > 0, lit(null).cast("double"))
              .otherwise(Num.r6(exp(col("cl") / lit(1e6))
                * sqrt(col("cg") / lit(1e12)))).as("greenwood_se"))
          .orderBy(col("dur_min"))
      },
      Some(s"""
        WITH ev AS (
          SELECT DISTINCT user_id, epoch_us(ts) AS us FROM events),
        horizon AS (SELECT MAX(us) AS tmax FROM ev),
        ranked AS (
          SELECT user_id, us,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us) AS rn
          FROM ev),
        per AS (
          SELECT COUNT(*) = 2 AS observed,
            CAST(CASE WHEN COUNT(*) = 2
              THEN (MAX(us) - MIN(us)) // 60000000
              ELSE (MAX(tmax) - MIN(us)) // 60000000 END AS BIGINT)
              AS dur_min
          FROM ranked CROSS JOIN horizon
          WHERE rn <= 2 GROUP BY user_id),
        g AS (
          SELECT dur_min,
            CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM per GROUP BY dur_min),
        death AS (
          SELECT dur_min, d, n FROM (
            SELECT dur_min, d,
              SUM(c) OVER (ORDER BY dur_min DESC ROWS UNBOUNDED PRECEDING)
                AS n
            FROM g) WHERE d > 0),
        t AS (
          SELECT dur_min, d, n,
            CASE WHEN n > d THEN CAST(FLOOR(1e6
              * LN(CAST(n - d AS DOUBLE) / n) + 0.5) AS BIGINT)
            ELSE 0 END AS lnq,
            CASE WHEN n = d THEN 1 ELSE 0 END AS z,
            CASE WHEN n > d THEN CAST(FLOOR(1e12
              * CAST(d AS DOUBLE) / (n * (n - d)) + 0.5) AS BIGINT)
            ELSE 0 END AS gq
          FROM death),
        c AS (
          SELECT dur_min, n, d,
            SUM(lnq) OVER wa AS cl, SUM(z) OVER wa AS cz,
            SUM(gq) OVER wa AS cg
          FROM t WINDOW wa AS (ORDER BY dur_min ROWS UNBOUNDED PRECEDING))
        SELECT dur_min, CAST(n AS BIGINT) AS n_risk, d AS n_events,
          CASE WHEN cz > 0 THEN 0.0
            ELSE ${Num.sql("EXP(cl / 1e6)", 6)} END AS survival,
          CASE WHEN cz > 0 THEN NULL
            ELSE ${Num.sql("EXP(cl / 1e6) * SQRT(cg / 1e12)", 6)} END
            AS greenwood_se
        FROM c ORDER BY dur_min"""),
      "Kaplan-Meier product-limit survival curve with Greenwood SEs: log-space fold with micro-quantized per-step terms, minute-bucketed risk sets"),

    // ---------------------------------------------------------------- q406
    // Nelson–Aalen cumulative hazard over q255's exact return-time
    // setup (time from a user's first event to the second, censored
    // at the horizon, minute grid): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, plus the
    // Fleming–Harrington survival exp(−H) — the estimator that beats
    // Kaplan–Meier in small risk sets and whose increments ARE the
    // hazard a rate model (q327/q328) would fit. Per-step dᵢ/nᵢ is
    // pico-quantized (exact integer cumsum); identical event/censor
    // definitions to q255 so the two curves are directly comparable.
    Query(
      "q406_nelson_aalen",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us")).distinct()
        val horizon = ev.agg(max(col("us")).as("tmax"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val per = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("k"), min(col("us")).as("t1"),
            max(col("us")).as("t2"))
          .crossJoin(broadcast(horizon))
          .select((col("k") === 2).as("observed"),
            when(col("k") === 2, (col("t2") - col("t1")) / lit(60000000L))
              .otherwise((col("tmax") - col("t1")) / lit(60000000L))
              .cast("long").as("dur_min"))
        val g = per.groupBy(col("dur_min"))
          .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("c"))
          .localCheckpoint() // bounded minute-grid histogram, one scan
        val wd = Window.orderBy(col("dur_min").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val death = g.withColumn("n", sum(col("c")).over(wd))
          .filter(col("d") > 0)
          .select(col("dur_min"), col("d"), col("n"),
            floor(lit(1e12) * col("d").cast("double") / col("n").cast("double")
              + lit(0.5)).cast("long").as("dq"))
        val wa = Window.orderBy(col("dur_min"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        death.withColumn("ch", sum(col("dq")).over(wa))
          .select(col("dur_min"), col("n").as("n_risk"), col("d").as("n_events"),
            Num.r6(col("ch").cast("double") / lit(1e12)).as("cum_hazard"),
            Num.r6(exp(-col("ch").cast("double") / lit(1e12))).as("surv_fh"))
          .orderBy(col("dur_min"))
      },
      Some("""
        WITH ev AS (SELECT DISTINCT user_id, epoch_us(ts) AS us FROM events),
        horizon AS (SELECT CAST(MAX(us) AS BIGINT) AS tmax FROM ev),
        per AS (
          SELECT CAST(COUNT(*) AS BIGINT) = 2 AS observed,
            CASE WHEN COUNT(*) = 2
              THEN (MAX(us) - MIN(us)) // 60000000
              ELSE (MAX(tmax) - MIN(us)) // 60000000 END AS dur_min
          FROM (
            SELECT user_id, us, tmax,
              ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us) AS rn
            FROM ev CROSS JOIN horizon) t
          WHERE rn <= 2 GROUP BY user_id),
        g AS (
          SELECT dur_min,
            CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM per GROUP BY dur_min),
        death AS (
          SELECT dur_min, d, n,
            CAST(FLOOR(1e12 * d / CAST(n AS DOUBLE) + 0.5) AS BIGINT) AS dq
          FROM (
            SELECT dur_min, d, SUM(c) OVER (ORDER BY dur_min DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
            FROM g) t
          WHERE d > 0),
        c AS (
          SELECT dur_min, n, d,
            SUM(dq) OVER (ORDER BY dur_min
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
          FROM death)
        SELECT dur_min, CAST(n AS BIGINT) AS n_risk, d AS n_events,
          FLOOR((CAST(ch AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS cum_hazard,
          FLOOR(EXP(-CAST(ch AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS surv_fh
        FROM c ORDER BY dur_min"""),
      "Nelson-Aalen cumulative hazard + Fleming-Harrington survival on q255's return-time setup: pico-quantized per-step d/n, exact integer cumsum"))
}
