package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Statistical and analytic operator coverage beyond the core
  * (SURVEY.md §2.2): percentiles, moment aggregates, ordered string
  * aggregation, pivot, outer joins, sliding windows, range self-join,
  * grouping sets via the SQL surface. */
object Analytics {

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q46
    Query(
      "q46_percentiles",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            Num.r4(percentile(col("value"), lit(0.5))).as("p50"),
            Num.r4(percentile(col("value"), lit(0.25))).as("p25"),
            Num.r4(percentile(col("value"), lit(0.75))).as("p75"),
            Num.r4(percentile(col("value"), lit(0.95))).as("p95"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type")),
      Some(s"""
        SELECT event_type,
          ${Num.sql("QUANTILE_CONT(value, 0.5)", 4)} AS p50,
          ${Num.sql("QUANTILE_CONT(value, 0.25)", 4)} AS p25,
          ${Num.sql("QUANTILE_CONT(value, 0.75)", 4)} AS p75,
          ${Num.sql("QUANTILE_CONT(value, 0.95)", 4)} AS p95,
          COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "interpolated percentiles per group"),

    // ---------------------------------------------------------------- q47
    Query(
      "q47_moment_aggs",
      (s, d) => {
        val x = graft.ops.Health.tsDays(col("ts"))
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            Num.r4(var_samp(col("value"))).as("var_s"),
            Num.r4(var_pop(col("value"))).as("var_p"),
            Num.r4(stddev_pop(col("value"))).as("sd_p"),
            Num.r4(covar_samp(col("value"), x)).as("covar_vt"),
            Num.r4(corr(col("value"), x)).as("corr_vt"),
            Num.r4(regr_r2(col("value"), x)).as("r2"),
            regr_count(col("value"), x).as("n"))
          .orderBy(col("event_type"))
      },
      Some {
        val x = s"(epoch_us(ts) - ${Health.OriginUs}) / 86400000000.0"
        s"""
        SELECT event_type,
          ${Num.sql("VAR_SAMP(value)", 4)} AS var_s,
          ${Num.sql("VAR_POP(value)", 4)} AS var_p,
          ${Num.sql("STDDEV_POP(value)", 4)} AS sd_p,
          ${Num.sql(s"COVAR_SAMP(value, $x)", 4)} AS covar_vt,
          ${Num.sql(s"CORR(value, $x)", 4)} AS corr_vt,
          ${Num.sql(s"REGR_R2(value, $x)", 4)} AS r2,
          REGR_COUNT(value, $x) AS n
        FROM events GROUP BY event_type ORDER BY event_type"""
      },
      "variance/covariance/correlation/regression moment aggregates"),

    // ---------------------------------------------------------------- q48
    Query(
      "q48_ordered_string_agg",
      (s, d) =>
        Tables.events(s, d)
          .filter(col("user_id") < 20)
          .groupBy(col("user_id"))
          .agg(array_join(
            transform(
              array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
              e => e.getField("event_type")), ",").as("journey"),
            count(lit(1)).as("n_events"))
          .orderBy(col("user_id")),
      Some("""
        SELECT user_id,
          STRING_AGG(event_type, ',' ORDER BY ts, event_id) AS journey,
          COUNT(*) AS n_events
        FROM events
        WHERE user_id < 20
        GROUP BY user_id ORDER BY user_id"""),
      "event-time-ordered string aggregation (deterministic via sort-before-join)"),

    // ---------------------------------------------------------------- q49
    Query(
      "q49_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = Tables.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .count()
          .na.fill(0L, types)
        pivoted.select(col("user_id") +: types.map(t => col(t).as(s"n_$t")): _*)
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_click,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0) AS BIGINT) AS n_signup,
          CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS n_view
        FROM events GROUP BY user_id ORDER BY user_id"""),
      "pivot (explicit value list so the schema is static)"),

    // ---------------------------------------------------------------- q50
    Query(
      "q50_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000.0)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big_orders"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
            when(col("c_custkey").isNull, "order_only")
              .when(col("o_custkey").isNull, "customer_only")
              .otherwise("both").as("side"),
            coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"))
          .orderBy(col("k"))
      },
      Some("""
        SELECT COALESCE(c_custkey, o_custkey) AS k,
          CASE WHEN c_custkey IS NULL THEN 'order_only'
               WHEN o_custkey IS NULL THEN 'customer_only'
               ELSE 'both' END AS side,
          COALESCE(n_big_orders, 0) AS n_big_orders
        FROM (SELECT c_custkey, c_acctbal FROM customer) c
        FULL OUTER JOIN (
          SELECT o_custkey, COUNT(*) AS n_big_orders FROM orders
          WHERE o_totalprice > 250000.0 GROUP BY o_custkey) o
          ON c_custkey = o_custkey
        ORDER BY k"""),
      "full outer join with null-side classification"),

    // ---------------------------------------------------------------- q51
    Query(
      "q51_sliding_windows",
      (s, d) =>
        Tables.events(s, d)
          .filter(col("user_id") < 30)
          .groupBy(col("user_id"),
            window(col("ts"), "2 days", "1 day").getField("start").as("w_start"))
          .agg(count(lit(1)).as("n"),
            Num.r4(avg(col("value"))).as("avg_value"))
          .orderBy(col("user_id"), col("w_start")),
      Some("""
        WITH slid AS (
          SELECT user_id, value,
            CAST(DATE_TRUNC('day', ts) - k * INTERVAL 1 DAY AS TIMESTAMP) AS w_start
          FROM events, UNNEST([0, 1]) AS t(k)
          WHERE user_id < 30),
        f AS (SELECT * FROM slid)
        SELECT user_id, w_start, COUNT(*) AS n,
          FLOOR((AVG(value)) * 10000 + 0.500001) / 10000 AS avg_value
        FROM f GROUP BY user_id, w_start
        ORDER BY user_id, w_start"""),
      "sliding event-time windows (2-day length, 1-day slide: each event in 2 windows)"),

    // ---------------------------------------------------------------- q52
    // Binned range join (r7 re-plan): the naive per-user band self-join
    // (equi on user, |Δt| ≤ tol as a post-filter) makes every user's
    // WHOLE series one join group — per-key quadratic in series length,
    // and series grow linearly with data (measured 17.3× time at 100×).
    // The scale shape bins each event at tolerance grain (day) and
    // joins on (user, bin) with the probe side exploded to the three
    // adjacent bins: every qualifying pair lands in exactly one
    // (a.nb = b.bin) bucket, the exact |Δt| filter then prunes the
    // corners, and the shuffle key gains a day component — a hot user
    // splits across days instead of one task, and per-bucket work is
    // bounded by daily activity, not series length. Same rows, same
    // oracle (unchanged), 6.8 s → 1.3 s at 100×.
    Query(
      "q52_range_self_join",
      (s, d) => {
        val tol = 86400000000L
        val e = Tables.events(s, d).filter(col("user_id") < 50)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("bin", expr(s"us div $tol"))
        val a = e.withColumn("nb",
          explode(array(col("bin") - 1, col("bin"), col("bin") + 1)))
        a.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.nb") === col("b.bin") &&
            col("a.event_id") =!= col("b.event_id") &&
            abs(col("a.us") - col("b.us")) <= tol)
          .groupBy(col("a.user_id").as("user_id"), col("a.event_id").as("event_id"))
          .agg(count(lit(1)).as("n_within_day"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT a.user_id, a.event_id, COUNT(*) AS n_within_day
        FROM events a JOIN events b
          ON a.user_id = b.user_id AND a.event_id <> b.event_id
          AND ABS(epoch_us(a.ts) - epoch_us(b.ts)) <= 86400000000
        WHERE a.user_id < 50 AND b.user_id < 50
        GROUP BY a.user_id, a.event_id
        ORDER BY a.user_id, a.event_id"""),
      "interval/range self-join: events of the same key within one day of each other"),

    // ---------------------------------------------------------------- q53
    Query(
      "q53_grouping_sets",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
            GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
            COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          ORDER BY COALESCE(l_returnflag, 'ZZZ'), COALESCE(l_linestatus, 'ZZZ')""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY COALESCE(l_returnflag, 'ZZZ'), COALESCE(l_linestatus, 'ZZZ')"""),
      "explicit grouping sets + GROUPING() indicators via the SQL surface"),

    // ---------------------------------------------------------------- q179
    // CUMULATE windows (Flink's third window TVF, alongside q21's
    // TUMBLE and q51's HOP): within each 6 h period, expanding windows
    // [period_start, period_start + j·1 h) for j = 1..6 — the "running
    // total that resets each period" dashboards ask for. An event at
    // ts joins every window of ITS period whose end lies strictly
    // after ts: j from (ts − pstart) div step + 1 up to 6, emitted by
    // an exploded `sequence` — constant ≤ 6 fan-out per event (the
    // same assignment rule Flink's CUMULATE applies), then ONE keyed
    // aggregation. All window math is exact integer µs.
    Query(
      "q179_cumulate_windows",
      (s, d) => {
        val stepUs = 3600000000L
        val sizeUs = 6L * stepUs
        val ev = Tables.events(s, d)
          .withColumn("tsu", unix_micros(col("ts")))
          .withColumn("pstart", expr(s"tsu div $sizeUs") * lit(sizeUs))
          .withColumn("jmin",
            (expr(s"(tsu - pstart) div $stepUs") + lit(1)).cast("int"))
        ev.select(col("event_type"), col("value"), col("pstart"),
            explode(sequence(col("jmin"), lit(6))).as("j"))
          .groupBy(col("event_type"),
            timestamp_micros(col("pstart")).as("window_start"),
            timestamp_micros(col("pstart") + col("j") * lit(stepUs))
              .as("window_end"))
          .agg(count(lit(1)).as("n_events"),
            Num.r4(avg(col("value"))).as("avg_value"))
          .orderBy(col("event_type"), col("window_start"), col("window_end"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type, value,
            (epoch_us(ts) // 21600000000) * 21600000000 AS pstart,
            CAST((epoch_us(ts) - (epoch_us(ts) // 21600000000) * 21600000000)
                 // 3600000000 + 1 AS INTEGER) AS jmin
          FROM events),
        fan AS (
          SELECT event_type, value, pstart, unnest(range(jmin, 7)) AS j
          FROM ev)
        SELECT event_type,
          make_timestamp(pstart) AS window_start,
          make_timestamp(pstart + j * 3600000000) AS window_end,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          FLOOR(AVG(value) * 10000 + 0.500001) / 10000 AS avg_value
        FROM fan
        GROUP BY event_type, pstart, j
        ORDER BY event_type, window_start, window_end"""),
      "CUMULATE window TVF (step 1 h, size 6 h): expanding per-period windows via bounded sequence fan-out"))
}
