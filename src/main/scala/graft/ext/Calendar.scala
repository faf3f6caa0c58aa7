package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar/behavioral continuation, batch 44: weekday ANOVA,
  * calendar-completeness audit, and the per-user novelty-decay curve.
  * Exact integer moments and ranks throughout.
  */
object Calendar {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q342
    // One-way ANOVA of daily volume on weekday ((epoch_day + 4) % 7,
    // 0 = Sunday): F and η² — "how much of traffic variance is the
    // weekly cycle", the companion effect size to q231's hour
    // profile. Exact integer group moments; the between-group terms
    // are milli-quantized into DECIMAL (the q288 discipline).
    Query(
      "q342_weekday_eta2",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .select(((col("day") + 4) % 7).as("wd"), col("x"))
        val g = daily.groupBy(col("wd"))
          .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
          .localCheckpoint()
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          Exact.m2("x", "x").as("sxx"))
        val ssb = g.crossJoin(broadcast(tot))
          .select(col("n"), col("sxx"), col("sx"),
            floor((col("sg").cast("double") / col("ng").cast("double") -
              col("sx").cast("double") / col("n").cast("double"))
              * lit(1e3) + lit(0.5)).cast("long").as("dq"), col("ng"))
          .select(col("n"), col("sxx"), col("sx"),
            (col("dq").cast("decimal(38,0)") * col("dq") * col("ng")).as("term"))
          .groupBy(col("n"), col("sxx"), col("sx"))
          .agg(sum(col("term")).as("ssbq"), count(lit(1)).as("k"))
        ssb.select(col("n").as("n_days"), col("k").as("n_weekdays"),
          Num.r4((col("ssbq").cast("double") / lit(1e6)) /
            (col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("n").cast("double")))
            .as("eta2"),
          Num.r4(((col("ssbq").cast("double") / lit(1e6)) /
            (col("k").cast("double") - lit(1.0))) /
            (((col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("n").cast("double")) -
              col("ssbq").cast("double") / lit(1e6)) /
              (col("n").cast("double") - col("k").cast("double"))))
            .as("f_stat"))
      },
      Some("""
        WITH daily AS (
          SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS wd,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY epoch_us(ts) // 86400000000),
        g AS (SELECT wd, CAST(COUNT(*) AS BIGINT) AS ng,
                CAST(SUM(x) AS BIGINT) AS sg FROM daily GROUP BY wd),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  SUM(CAST(x AS HUGEINT) * x) AS sxx FROM daily),
        ssb AS (
          SELECT n, sxx, sx, CAST(COUNT(*) AS BIGINT) AS k,
            SUM(CAST(FLOOR((CAST(sg AS DOUBLE) / ng - CAST(sx AS DOUBLE) / n)
                  * 1e3 + 0.5) AS HUGEINT)
                * CAST(FLOOR((CAST(sg AS DOUBLE) / ng - CAST(sx AS DOUBLE) / n)
                  * 1e3 + 0.5) AS HUGEINT) * ng) AS ssbq
          FROM g CROSS JOIN tot GROUP BY n, sxx, sx)
        SELECT n AS n_days, k AS n_weekdays,
          FLOOR(((CAST(ssbq AS DOUBLE) / 1e6) /
                 (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n))
                * 10000 + 0.500001) / 10000 AS eta2,
          FLOOR((((CAST(ssbq AS DOUBLE) / 1e6) / (CAST(k AS DOUBLE) - 1.0)) /
                 (((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                   - CAST(ssbq AS DOUBLE) / 1e6) /
                  (CAST(n AS DOUBLE) - k)))
                * 10000 + 0.500001) / 10000 AS f_stat
        FROM ssb"""),
      "One-way ANOVA of daily volume on weekday: F and eta^2 (milli-quantized between-group terms)"),

    // ---------------------------------------------------------------- q343
    // Calendar completeness audit: observed vs spanned days, missing
    // count, and the longest run of consecutive missing days — the
    // first thing to check before any daily-series model above is
    // trusted. Exact integer day arithmetic, one lag window.
    Query(
      "q343_calendar_gaps",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day")).distinct()
        val wD = Window.orderBy(col("day"))
        val gaps = days.withColumn("prev", lag(col("day"), 1).over(wD))
          .select((col("day") - col("prev") - 1).as("gap"))
          .filter(col("gap").isNotNull)
        val g = gaps.agg(coalesce(max(col("gap")), lit(0L)).as("longest_gap"))
        days.agg(count(lit(1)).as("n_days"),
            (max(col("day")) - min(col("day")) + 1).as("span_days"))
          .crossJoin(broadcast(g))
          .select(col("n_days"), col("span_days"),
            (col("span_days") - col("n_days")).as("n_missing"),
            col("longest_gap"),
            Num.r4(col("n_days").cast("double") / col("span_days").cast("double"))
              .as("completeness"))
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events),
        gaps AS (
          SELECT day - LAG(day) OVER (ORDER BY day) - 1 AS gap FROM days),
        g AS (SELECT COALESCE(MAX(gap), 0) AS longest_gap FROM gaps
              WHERE gap IS NOT NULL)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
          CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS span_days,
          CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT) AS n_missing,
          CAST(MAX(longest_gap) AS BIGINT) AS longest_gap,
          FLOOR((CAST(COUNT(*) AS DOUBLE) / (MAX(day) - MIN(day) + 1))
                * 10000 + 0.500001) / 10000 AS completeness
        FROM days CROSS JOIN g"""),
      "Calendar completeness: observed vs spanned days, missing count, longest gap run"),

    // ---------------------------------------------------------------- q344
    // Novelty decay: across each user's journey (position deciles),
    // what share of events repeat an event type the user has already
    // performed? The habit-formation curve — rises toward 1 as users
    // settle into routines. Exact first-occurrence flags via one
    // (user, type) rank window; deciles are exact integer buckets of
    // the per-user position.
    Query(
      "q344_novelty_decay",
      (s, d) => {
        val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val wUT = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("us"), col("event_id"))
        val wC = Window.partitionBy(col("user_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("pos", row_number().over(wU).cast("long"))
          .withColumn("rep",
            when(row_number().over(wUT) > 1, 1L).otherwise(0L))
          .withColumn("tot", count(lit(1)).over(wC))
        ev.select(expr("((pos - 1) * 10) div tot + 1").as("decile"), col("rep"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_events"), sum(col("rep")).as("n_repeats"))
          .select(col("decile"), col("n_events"),
            Num.r4(col("n_repeats").cast("double") / col("n_events").cast("double"))
              .as("repeat_share"))
          .orderBy(col("decile"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        flagged AS (
          SELECT user_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY us, event_id) AS BIGINT) AS pos,
            CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
              ORDER BY us, event_id) > 1 THEN 1 ELSE 0 END AS rep,
            CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS tot
          FROM ev)
        SELECT ((pos - 1) * 10) // tot + 1 AS decile,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          FLOOR((CAST(SUM(rep) AS DOUBLE) / COUNT(*)) * 10000 + 0.500001)
            / 10000 AS repeat_share
        FROM flagged GROUP BY 1 ORDER BY decile"""),
      "Novelty decay: repeat-event-type share across per-user journey position deciles")
  )
}
