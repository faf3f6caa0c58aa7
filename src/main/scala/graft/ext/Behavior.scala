package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Behavioral analytics over the event stream: session path mining
  * (the "user journey" report) and association-rule lift between event
  * types (market-basket analysis with users as baskets). Both follow
  * the one-shuffle-on-the-natural-key shape: sessionization and
  * basket-building hash-partition on user_id; everything after is
  * state-space-sized (|event_types| ≤ a few hundred), so the
  * normalizing joins are broadcasts.
  */
object Behavior {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q116
    // Top session paths: sessionize each user's events with a 1-hour
    // inactivity gap (gaps-and-islands, same recipe as q19's oracle),
    // concatenate each session's event types in time order into a path
    // string, and report the 20 most frequent paths. Ordering inside a
    // session uses integer microseconds + event_id (the house
    // tie-break), so the path string is deterministic in both engines.
    // Scale: one hash shuffle on user_id with in-partition sorts; path
    // counting is a partial-aggregated string-key shuffle; top-20 via
    // TakeOrdered. Per-session state is bounded by session length, not
    // history length.
    Query(
      "q116_session_paths",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val gapUs = 3600000000L // 1 hour
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("new_s",
            when(lag(col("us"), 1).over(w).isNull ||
              col("us") - lag(col("us"), 1).over(w) >= gapUs, 1).otherwise(0))
          .withColumn("sid", sum(col("new_s"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        ev.groupBy(col("user_id"), col("sid"))
          .agg(collect_list(struct(col("us"), col("event_id"),
            col("event_type"))).as("evs"))
          .select(array_join(expr("transform(array_sort(evs), x -> x.event_type)"),
            "->").as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events),
        o AS (
          SELECT *, CASE WHEN LAG(us) OVER w IS NULL
                           OR us - LAG(us) OVER w >= 3600000000
                         THEN 1 ELSE 0 END AS new_s
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        g AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id
            ORDER BY us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o),
        paths AS (
          SELECT string_agg(event_type, '->' ORDER BY us, event_id) AS path
          FROM g GROUP BY user_id, sid)
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path
        ORDER BY n_sessions DESC, path LIMIT 20"""),
      "top-20 session paths: 1-hour-gap sessionization + time-ordered event-type concatenation (user-journey mining)"),

    // --------------------------------------------------------------- q118
    // Association-rule lift between event-type pairs, users as
    // baskets: support P(a,b) and lift P(a,b)/(P(a)P(b)) for every
    // unordered pair both present in a user's history. The classic
    // market-basket co-occurrence audit. Exactness: everything is a
    // ratio of integer counts — the lift's cross-multiplied form
    // (n_ab·N)/(n_a·n_b) keeps the arithmetic in exact-integer doubles
    // before one r4 rounding. Scale: the distinct pass and the
    // self-join both hash on user_id (co-partitioned, no extra
    // shuffle); per-user pair fan-out is bounded by |event_types|².
    Query(
      "q118_assoc_lift",
      (s, d) => {
        // localCheckpoint: ut is read four times (self-join sides,
        // support counts, user total) — truncation stops each from
        // re-running the events distinct
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
          .localCheckpoint()
        val nu = ut.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users")) // 1 row
        val supp = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n_one"))
        val pairs = ut.as("a").join(ut.as("b"),
            col("a.user_id") === col("b.user_id") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"))
          .agg(count(lit(1)).as("n_ab"))
        pairs
          .join(broadcast(supp.select(col("event_type").as("type_a"),
            col("n_one").as("n_a"))), Seq("type_a"))
          .join(broadcast(supp.select(col("event_type").as("type_b"),
            col("n_one").as("n_b"))), Seq("type_b"))
          .crossJoin(broadcast(nu))
          .select(col("type_a"), col("type_b"), col("n_ab"),
            Num.r4(col("n_ab") / col("n_users").cast("double")).as("support"),
            Num.r4((col("n_ab") * col("n_users"))
              / (col("n_a") * col("n_b")).cast("double")).as("lift"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some(s"""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        nu AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
        supp AS (SELECT event_type, COUNT(*) AS n_one FROM ut GROUP BY event_type),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
            COUNT(*) AS n_ab
          FROM ut a JOIN ut b ON a.user_id = b.user_id
            AND a.event_type < b.event_type
          GROUP BY a.event_type, b.event_type)
        SELECT type_a, type_b, CAST(n_ab AS BIGINT) AS n_ab,
          ${Num.sql("n_ab / CAST(n_users AS DOUBLE)", 4)} AS support,
          ${Num.sql("(n_ab * n_users) / CAST(sa.n_one * sb.n_one AS DOUBLE)", 4)} AS lift
        FROM pairs
        JOIN supp sa ON sa.event_type = type_a
        JOIN supp sb ON sb.event_type = type_b
        CROSS JOIN nu
        ORDER BY type_a, type_b"""),
      "association-rule support + lift over event-type pairs with users as baskets (market-basket co-occurrence)"),

    // --------------------------------------------------------------- q128
    // RFM segmentation (recency / frequency / monetary), the classic
    // customer-value report — but binned against BROADCAST percentile
    // boundaries instead of the textbook ntile(): a global ntile sorts
    // every customer in one partition, while tertile boundaries from
    // one percentile aggregate bin each row independently (same
    // segments, no global sort — the scale-correct formulation).
    // Recency is exact integer days from the corpus max date;
    // monetary goes through DECIMAL (the house money rule); boundaries
    // are r4-quantized on both engines so bin edges can't flip on
    // ulps. Output: per RFM segment, customer count and averages.
    Query(
      "q128_rfm_segments",
      (s, d) => {
        val o = Tables.orders(s, d)
        val cmax = o.agg(max(col("o_orderdate")).as("dmax")) // 1 row
        val rfm = o.groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("last_order"),
            count(lit(1)).as("freq"),
            sum(col("o_totalprice").cast("decimal(18,2)"))
              .cast("double").as("monetary"))
          .crossJoin(broadcast(cmax))
          .select(col("o_custkey"),
            datediff(col("dmax"), col("last_order")).cast("long").as("rec_days"),
            col("freq"), col("monetary"))
        val bounds = rfm.agg(
          Num.r4(percentile(col("rec_days"), lit(1.0 / 3))).as("r1"),
          Num.r4(percentile(col("rec_days"), lit(2.0 / 3))).as("r2"),
          Num.r4(percentile(col("freq"), lit(1.0 / 3))).as("f1"),
          Num.r4(percentile(col("freq"), lit(2.0 / 3))).as("f2"),
          Num.r4(percentile(col("monetary"), lit(1.0 / 3))).as("m1"),
          Num.r4(percentile(col("monetary"), lit(2.0 / 3))).as("m2")) // 1 row
        def tert(v: org.apache.spark.sql.Column,
            lo: org.apache.spark.sql.Column, hi: org.apache.spark.sql.Column,
            invert: Boolean) = {
          val raw = when(v <= lo, 1).when(v <= hi, 2).otherwise(3)
          if (invert) lit(4) - raw else raw // low recency = better
        }
        rfm.crossJoin(broadcast(bounds))
          .select(col("o_custkey"), col("rec_days"), col("freq"),
            col("monetary"),
            concat(tert(col("rec_days"), col("r1"), col("r2"), invert = true),
              tert(col("freq"), col("f1"), col("f2"), invert = false),
              tert(col("monetary"), col("m1"), col("m2"), invert = false))
              .as("segment"))
          .groupBy(col("segment"))
          .agg(count(lit(1)).as("n_customers"),
            Num.r4(sum(col("rec_days")) / count(lit(1)).cast("double"))
              .as("avg_recency_days"),
            Num.r4(sum(col("freq")) / count(lit(1)).cast("double"))
              .as("avg_frequency"),
            Num.r4(sum(col("monetary").cast("decimal(18,2)")).cast("double")
              / count(lit(1))).as("avg_monetary"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH cmax AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
        rfm AS (
          SELECT o_custkey,
            CAST(datediff('day', MAX(o_orderdate), dmax) AS BIGINT) AS rec_days,
            COUNT(*) AS freq,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
          FROM orders CROSS JOIN cmax
          GROUP BY o_custkey, dmax),
        bounds AS (
          SELECT
            ${Num.sql("QUANTILE_CONT(rec_days, 1.0/3)", 4)} AS r1,
            ${Num.sql("QUANTILE_CONT(rec_days, 2.0/3)", 4)} AS r2,
            ${Num.sql("QUANTILE_CONT(freq, 1.0/3)", 4)} AS f1,
            ${Num.sql("QUANTILE_CONT(freq, 2.0/3)", 4)} AS f2,
            ${Num.sql("QUANTILE_CONT(monetary, 1.0/3)", 4)} AS m1,
            ${Num.sql("QUANTILE_CONT(monetary, 2.0/3)", 4)} AS m2
          FROM rfm),
        seg AS (
          SELECT o_custkey, rec_days, freq, monetary,
            (4 - CASE WHEN rec_days <= r1 THEN 1
                      WHEN rec_days <= r2 THEN 2 ELSE 3 END)
            || (CASE WHEN freq <= f1 THEN 1 WHEN freq <= f2 THEN 2 ELSE 3 END)
            || (CASE WHEN monetary <= m1 THEN 1
                     WHEN monetary <= m2 THEN 2 ELSE 3 END) AS segment
          FROM rfm CROSS JOIN bounds)
        SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
          ${Num.sql("SUM(rec_days) / CAST(COUNT(*) AS DOUBLE)", 4)} AS avg_recency_days,
          ${Num.sql("SUM(freq) / CAST(COUNT(*) AS DOUBLE)", 4)} AS avg_frequency,
          ${Num.sql("CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS avg_monetary
        FROM seg GROUP BY segment ORDER BY segment"""),
      "RFM customer segmentation with broadcast tertile boundaries (no global ntile sort): per-segment counts and averages, DECIMAL-exact money"),

    // ---------------------------------------------------------------- q409
    // Time-to-convert: latency from each user's FIRST event to their
    // FIRST purchase — conversion share plus exact mean and ceil-rank
    // P25/P50/P75/P90 on the hour grid. The latency view the funnel
    // (q95, within-horizon counts) and the return-time curves
    // (q255/q406, any second event) don't give: how long the
    // purchase decision takes when it happens. Durations are exact
    // integer µs truncated to hours; percentiles come from the
    // bounded hour-grid histogram (no global row sort).
    Query(
      "q409_time_to_convert",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val per = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("t0"),
            min(when(col("event_type") === "purchase", col("us"))).as("tp"))
        val conv = per.filter(col("tp").isNotNull)
          .select(expr("(tp - t0) div 3600000000").as("hr"))
        val hist = conv.groupBy(col("hr")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded hour grid
        val wc = Window.orderBy(col("hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wc)).localCheckpoint()
        val nt = per.agg(count(lit(1)).as("nu"))
        val nc = cum.agg(max(col("cum")).as("k"),
          sum(col("hr") * col("c")).as("sh"))
        def pct(p: Int) = cum.crossJoin(broadcast(nc.select(col("k"))))
          .filter(Exact.ceilRank(col("cum"), p, "k"))
          .agg(min(col("hr")).as(s"p$p"))
        nt.crossJoin(broadcast(nc)).crossJoin(broadcast(pct(25)))
          .crossJoin(broadcast(pct(50))).crossJoin(broadcast(pct(75)))
          .crossJoin(broadcast(pct(90)))
          .select(col("nu").as("n_users"), col("k").as("n_converted"),
            Num.r4(col("k").cast("double") / col("nu").cast("double"))
              .as("conversion_share"),
            Num.r4(col("sh").cast("double") / col("k").cast("double"))
              .as("mean_hours"),
            col("p25").as("p25_hours"), col("p50").as("p50_hours"),
            col("p75").as("p75_hours"), col("p90").as("p90_hours"))
      },
      Some("""
        WITH per AS (
          SELECT user_id, CAST(MIN(epoch_us(ts)) AS BIGINT) AS t0,
            CAST(MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
              AS BIGINT) AS tp
          FROM events GROUP BY user_id),
        conv AS (
          SELECT (tp - t0) // 3600000000 AS hr FROM per WHERE tp IS NOT NULL),
        hist AS (SELECT hr, CAST(COUNT(*) AS BIGINT) AS c FROM conv GROUP BY hr),
        cum AS (
          SELECT hr, SUM(c) OVER (ORDER BY hr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM per),
        nc AS (SELECT CAST(MAX(cum) AS BIGINT) AS k,
                 CAST(SUM(hr * c) AS BIGINT) AS sh FROM cum JOIN hist USING (hr)
               ),
        p25 AS (SELECT CAST(MIN(hr) AS BIGINT) AS p25 FROM cum CROSS JOIN nc
                WHERE cum >= (25 * k + 99) // 100),
        p50 AS (SELECT CAST(MIN(hr) AS BIGINT) AS p50 FROM cum CROSS JOIN nc
                WHERE cum >= (50 * k + 99) // 100),
        p75 AS (SELECT CAST(MIN(hr) AS BIGINT) AS p75 FROM cum CROSS JOIN nc
                WHERE cum >= (75 * k + 99) // 100),
        p90 AS (SELECT CAST(MIN(hr) AS BIGINT) AS p90 FROM cum CROSS JOIN nc
                WHERE cum >= (90 * k + 99) // 100)
        SELECT nu AS n_users, k AS n_converted,
          FLOOR((CAST(k AS DOUBLE) / nu) * 10000 + 0.500001) / 10000
            AS conversion_share,
          FLOOR((CAST(sh AS DOUBLE) / k) * 10000 + 0.500001) / 10000
            AS mean_hours,
          p25 AS p25_hours, p50 AS p50_hours, p75 AS p75_hours,
          p90 AS p90_hours
        FROM nt CROSS JOIN nc CROSS JOIN p25 CROSS JOIN p50 CROSS JOIN p75
        CROSS JOIN p90"""),
      "Time-to-convert from first event to first purchase: conversion share, exact hour-grid mean and ceil-rank P25/P50/P75/P90"))
}
