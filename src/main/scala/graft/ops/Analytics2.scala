package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: the experimentation / sequence-analytics
  * surface — a hash-bucketed A/B significance test, sliding distinct
  * counts, and MATCH_RECOGNIZE-style consecutive-pattern detection.
  */
object Analytics2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q181
    // Welch two-sample t-test between deterministic A/B arms: users
    // hash to arms by the cross-engine-exact md5 bucket (the q164/q138
    // split primitive), the metric is purchase-event value. Moments are
    // exact integers (micro-unit sums, HUGEINT/DECIMAL squares) so both
    // engines feed bit-identical (n, Σx, Σx²) into the IDENTICAL Welch
    // formula — t and the Satterthwaite df can't drift. One corpus
    // pass, two 1-row aggregates, broadcast assembly.
    Query(
      "q181_ab_ttest",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
        val moments = armed.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("vq")).as("sm"),
            sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("sq"))
          .localCheckpoint() // 2 bounded rows feed both sides of the pivot
        val a = moments.filter(col("arm") === 0)
          .select(col("n").as("na"), col("sm").as("sma"), col("sq").as("sqa"))
        val b = moments.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("sm").as("smb"), col("sq").as("sqb"))
        def mean(sm: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
          sm.cast("double") / n.cast("double") / lit(1e6)
        def vr(sq: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (sq.cast("double") / lit(1e12) -
            (sm.cast("double") / lit(1e6)) * (sm.cast("double") / lit(1e6)) /
              n.cast("double")) / (n.cast("double") - lit(1.0))
        val va = vr(col("sqa"), col("sma"), col("na")) / col("na").cast("double")
        val vb = vr(col("sqb"), col("smb"), col("nb")) / col("nb").cast("double")
        val t = (mean(col("sma"), col("na")) - mean(col("smb"), col("nb"))) /
          sqrt(va + vb)
        val df = (va + vb) * (va + vb) /
          (va * va / (col("na").cast("double") - lit(1.0)) +
            vb * vb / (col("nb").cast("double") - lit(1.0)))
        a.crossJoin(broadcast(b))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            Num.r4(mean(col("sma"), col("na"))).as("mean_a"),
            Num.r4(mean(col("smb"), col("nb"))).as("mean_b"),
            Num.r4(t).as("t_stat"),
            Num.r4(df).as("welch_df"),
            (abs(t) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, SUM(vq) AS sm,
            SUM(CAST(vq AS HUGEINT) * vq) AS sq
          FROM armed GROUP BY arm),
        piv AS (
          SELECT
            (SELECT n FROM m WHERE arm = 0) AS na,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 0) AS sma,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 0) AS sqa,
            (SELECT n FROM m WHERE arm = 1) AS nb,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 1) AS smb,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 1) AS sqb),
        calc AS (
          SELECT na, nb,
            sma / na / 1e6 AS ma, smb / nb / 1e6 AS mb,
            ((sqa / 1e12 - (sma/1e6) * (sma/1e6) / na) / (na - 1.0)) / na AS va,
            ((sqb / 1e12 - (smb/1e6) * (smb/1e6) / nb) / (nb - 1.0)) / nb AS vb
          FROM piv)
        SELECT na AS n_a, nb AS n_b,
          FLOOR(ma * 10000 + 0.500001) / 10000 AS mean_a,
          FLOOR(mb * 10000 + 0.500001) / 10000 AS mean_b,
          FLOOR(((ma - mb) / SQRT(va + vb)) * 10000 + 0.500001) / 10000 AS t_stat,
          FLOOR(((va + vb) * (va + vb)
                 / (va * va / (na - 1.0) + vb * vb / (nb - 1.0)))
                * 10000 + 0.500001) / 10000 AS welch_df,
          (ABS((ma - mb) / SQRT(va + vb)) > 1.96) AS significant
        FROM calc"""),
      "Welch two-sample t-test between md5-hashed A/B arms over purchase values: exact integer moments, identical IEEE formula"),

    // ---------------------------------------------------------------- q188
    // Mann–Whitney U between the same md5 A/B arms as q181 — the
    // rank-based companion that stays valid when purchase values are
    // heavy-tailed (Welch assumes finite-variance means; U compares
    // whole distributions). Exact integer machinery end-to-end: values
    // quantized to micro-units, per-VALUE counts on the cents-bounded
    // grid (domain-bounded like q174's length grid, ≤ ~50k rows at any
    // corpus size), doubled ranks 2·U = Σ ca·(2·cumB_before + cb) so
    // ties never leave integers, and the tie-corrected normal z
    // assembled from identical integer inputs in both engines. The
    // only window runs on the bounded checkpointed grid.
    Query(
      "q188_mann_whitney",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
        val grid = armed.groupBy(col("vq"))
          .agg(count(when(col("arm") === 0, 1)).as("ca"),
            count(when(col("arm") === 1, 1)).as("cb"))
          .localCheckpoint() // bounded by the 2-decimal price domain
        val wv = Window.orderBy(col("vq"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = grid
          .withColumn("befb", coalesce(sum(col("cb")).over(wv), lit(0L)))
          .localCheckpoint() // window materialized on the bounded grid only
        val t = col("ca") + col("cb")
        val agg = cum.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca") * (col("befb") * 2 + col("cb"))).as("u2"),
          sum((t * t * t - t).cast("decimal(38,0)")).as("ties3"))
        val na = col("na").cast("double")
        val nb = col("nb").cast("double")
        val nn = na + nb
        val varU = na * nb / lit(12.0) *
          ((nn + lit(1.0)) - col("ties3").cast("double") / (nn * (nn - lit(1.0))))
        val z = (col("u2").cast("double") - na * nb) / (lit(2.0) * sqrt(varU))
        agg.select(col("na").as("n_a"), col("nb").as("n_b"),
          (col("u2").cast("double") / lit(2.0)).as("u_stat"),
          Num.r4(z).as("z_stat"),
          (abs(z) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        grid AS (
          SELECT vq,
            CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS cb
          FROM armed GROUP BY vq),
        cum AS (
          SELECT vq, ca, cb,
            COALESCE(SUM(cb) OVER (ORDER BY vq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befb
          FROM grid),
        agg AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
            CAST(SUM(ca * (befb * 2 + cb)) AS DOUBLE) AS u2,
            CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS DOUBLE)
              AS ties3
          FROM cum),
        calc AS (
          SELECT na, nb, u2, ties3,
            CAST(na AS DOUBLE) * nb / 12.0 *
              ((na + nb + 1.0) - ties3 /
               ((na + nb) * (na + nb - 1.0))) AS varu
          FROM agg)
        SELECT na AS n_a, nb AS n_b, u2 / 2.0 AS u_stat,
          FLOOR(((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(varu)))
                * 10000 + 0.500001) / 10000 AS z_stat,
          (ABS((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(varu))) > 1.96)
            AS significant
        FROM calc"""),
      "Mann-Whitney U rank test between md5 A/B arms: integer doubled-rank U on the domain-bounded value grid, tie-corrected z"),

    // ---------------------------------------------------------------- q183
    // Sliding-window DISTINCT users per event type (6 h window, 1 h
    // slide): the live-dashboard "unique actives" metric. The batch
    // side uses Spark's window TVF directly (each event lands in 6
    // windows); the oracle reproduces the TVF's epoch-aligned
    // assignment with an explicit 6-way fan-out. countDistinct inside
    // a keyed aggregate is exact (hash-based partial distinct — no
    // sketch), shuffled on (type, window): bounded by span × types.
    Query(
      "q183_sliding_distinct",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"),
            window(col("ts"), "6 hours", "1 hour").getField("start").as("w_start"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"), col("w_start")),
      Some("""
        WITH slid AS (
          SELECT event_type, user_id,
            CAST(DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR AS TIMESTAMP) AS w_start
          FROM events, UNNEST([0, 1, 2, 3, 4, 5]) AS t(k))
        SELECT event_type, w_start,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM slid GROUP BY event_type, w_start
        ORDER BY event_type, w_start"""),
      "sliding distinct actives: 6-hour windows sliding hourly, exact countDistinct per (type, window)"),

    // ---------------------------------------------------------------- q184
    // MATCH_RECOGNIZE-lite (SQL:2016 / Flink CEP parity): the STRICTLY
    // CONSECUTIVE view→click→purchase pattern per user, in (ts,
    // event_id) order — AFTER MATCH SKIP TO NEXT ROW semantics (every
    // starting row tested, overlaps counted). Unlike q95's funnel
    // (ordered subsequence within a horizon), consecutiveness is the
    // CEP semantics: any interleaved event breaks the match. One lead
    // window on the user_id exchange; no joins.
    Query(
      "q184_match_recognize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .withColumn("m",
            col("event_type") === "view" && col("e2") === "click" &&
              col("e3") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(when(col("m"), 1)).as("n_matches"),
            min(when(col("m"), col("ts"))).as("first_match_ts"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, ts,
            event_type AS e1,
            LEAD(event_type, 1) OVER w AS e2,
            LEAD(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id,
          CAST(COUNT(*) FILTER (WHERE e1 = 'view' AND e2 = 'click'
                                  AND e3 = 'purchase') AS BIGINT) AS n_matches,
          MIN(ts) FILTER (WHERE e1 = 'view' AND e2 = 'click'
                            AND e3 = 'purchase') AS first_match_ts
        FROM seq GROUP BY user_id ORDER BY user_id"""),
      "MATCH_RECOGNIZE-lite: strictly consecutive view->click->purchase per key (CEP semantics, overlap-counting)")
  )
}
