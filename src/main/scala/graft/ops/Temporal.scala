package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators absent from the reference but required for full
  * engine coverage (SURVEY.md §2.2): analytic lag/lead, as-of joins,
  * session windows, cube/grouping-sets.
  */
object Temporal {

  /** Scalable as-of join: instead of a per-probe range scan (quadratic)
    * or an interval join, union the probe and quote streams with a tag
    * and carry the latest quote forward with `last(_, ignoreNulls)` over
    * a per-key ordered frame — one shuffle on the key, one sort, linear
    * work, identical to how a 100 TB backfill would do it. Quote rows
    * sort before probe rows at equal timestamps, so a probe matches a
    * quote at its exact own time (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`
    * semantics). */
  def asofJoin(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
      tieBreak: String, quoteCols: Seq[(String, String)]): DataFrame = {
    val pSide = probes.withColumn("is_probe", lit(1))
    val qSide0 = quotes.select(
      (Seq(col(key), col(ts), lit(0).as("is_probe"),
        lit(null).cast(probes.schema(tieBreak).dataType).as(tieBreak)) ++
        quoteCols.map { case (src, dst) => col(src).as(s"__q_$dst") }): _*)
    val qSide = pSide.columns.foldLeft(qSide0) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(pSide.schema(c).dataType))
    }
    val pFull = quoteCols.foldLeft(pSide) { case (df, (_, dst)) =>
      df.withColumn(s"__q_$dst", lit(null).cast(qSide0.schema(s"__q_$dst").dataType))
    }
    val unioned = pFull.select(qSide.columns.toIndexedSeq.map(col): _*).unionByName(qSide)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("is_probe"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = quoteCols.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(dst, last(col(s"__q_$dst"), ignoreNulls = true).over(w))
    }
    carried.filter(col("is_probe") === 1)
      .drop("is_probe")
      .drop(quoteCols.map { case (_, dst) => s"__q_$dst" }: _*)
  }

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q11
    Query(
      "q11_lag_lead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("value"),
            lag(col("value"), 1).over(w).as("prev_value"),
            lead(col("value"), 1).over(w).as("next_value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT user_id, event_id, value,
          LAG(value) OVER w AS prev_value,
          LEAD(value) OVER w AS next_value,
          value - LAG(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id"""),
      "analytic lag/lead + first difference per key"),

    // ---------------------------------------------------------------- q17
    Query(
      "q17_cube",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(floor(col("l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(coalesce(col("l_returnflag"), lit("ZZZ")),
            coalesce(col("l_linestatus"), lit("ZZZ"))),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY COALESCE(l_returnflag, 'ZZZ'), COALESCE(l_linestatus, 'ZZZ')"""),
      "full cube (all grouping sets)"),

    // ---------------------------------------------------------------- q18
    Query(
      "q18_asof_join",
      (s, d) => {
        val events = Tables.events(s, d)
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        asofJoin(
          events.select(col("user_id"), col("event_id"), col("ts"), col("value")),
          purchases, "user_id", "ts", "event_id",
          Seq("ts" -> "last_purchase_ts", "value" -> "last_purchase_value"))
          .select(col("user_id"), col("event_id"), col("value"),
            col("last_purchase_ts"), col("last_purchase_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT e.user_id, e.event_id, e.value,
          p.ts AS last_purchase_ts, p.value AS last_purchase_value
        FROM events e
        ASOF LEFT JOIN (
          SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.user_id, e.event_id"""),
      "as-of join: latest purchase at-or-before each event, via union + last(ignoreNulls) carry-forward (linear, one shuffle)"),

    // ---------------------------------------------------------------- q407
    // Concurrency profile + Little's-law audit of the 1-day-gap user
    // sessions (q19's sessionization): arrival rate λ, mean session
    // duration W, the busy-time average concurrency L = Σdur/span,
    // the hourly-sampled PEAK concurrency (not derivable from λ·W),
    // and the λ·W product — Little's identity L = λW, verified
    // end-to-end through two independent computation paths. The
    // hourly sweep is two bounded histograms + one cumulative window
    // over the calendar-hour grid; durations are exact integer µs.
    Query(
      "q407_littles_law",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        val sess = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
          .withColumn("prev", lag(col("us"), 1).over(w))
          .withColumn("brk",
            when(col("prev").isNull ||
              col("us") - col("prev") > 86400000000L, 1L).otherwise(0L))
          .withColumn("sid", sum(col("brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sid"))
          .agg(min(col("us")).as("s0"), max(col("us")).as("s1"))
          .localCheckpoint()
        val tot = sess.agg(count(lit(1)).as("ns"),
          sum(col("s1") - col("s0")).as("busy"),
          min(expr("s0 div 3600000000")).as("h0"),
          max(expr("s1 div 3600000000")).as("h1"))
        val sh = sess.groupBy(expr("s0 div 3600000000").as("h"))
          .agg(count(lit(1)).as("cs"))
        val eh = sess.groupBy(expr("s1 div 3600000000").as("h"))
          .agg(count(lit(1)).as("ce"))
        val grid = tot.select(explode(expr("sequence(h0, h1)")).as("h"))
        val wc = Window.orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val conc = grid.join(sh, Seq("h"), "left").join(eh, Seq("h"), "left")
          .withColumn("cums", sum(coalesce(col("cs"), lit(0L))).over(wc))
          .withColumn("cume", sum(coalesce(col("ce"), lit(0L))).over(
            Window.orderBy(col("h")).rowsBetween(Window.unboundedPreceding, -1)))
          .select((col("cums") - coalesce(col("cume"), lit(0L))).as("conc"))
          .agg(max(col("conc")).as("peak"))
        tot.crossJoin(broadcast(conc))
          .select(col("ns").as("n_sessions"),
            ((col("h1") - col("h0")) + 1).as("span_hours"),
            Num.r4(col("ns").cast("double")
              / ((col("h1") - col("h0")) + 1).cast("double")).as("lambda_per_hr"),
            Num.r4(col("busy").cast("double")
              / (col("ns").cast("double") * lit(60000000.0))).as("mean_dur_min"),
            Num.r6(col("busy").cast("double")
              / (((col("h1") - col("h0")) + 1).cast("double") * lit(3.6e9)))
              .as("time_avg_concurrent"),
            col("peak").as("peak_hourly_concurrent"),
            Num.r6((col("ns").cast("double")
              / ((col("h1") - col("h0")) + 1).cast("double"))
              * (col("busy").cast("double")
                / (col("ns").cast("double") * lit(3.6e9)))).as("little_lw"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us FROM events),
        marked AS (
          SELECT user_id, us,
            CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us)
                   > 86400000000 OR LAG(us) OVER (PARTITION BY user_id
                   ORDER BY us) IS NULL THEN 1 ELSE 0 END AS brk
          FROM ev),
        sess AS (
          SELECT user_id, sid, CAST(MIN(us) AS BIGINT) AS s0,
            CAST(MAX(us) AS BIGINT) AS s1
          FROM (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id
                  ORDER BY us ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS sid
                FROM marked)
          GROUP BY user_id, sid),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS ns,
            CAST(SUM(s1 - s0) AS BIGINT) AS busy,
            CAST(MIN(s0 // 3600000000) AS BIGINT) AS h0,
            CAST(MAX(s1 // 3600000000) AS BIGINT) AS h1
          FROM sess),
        sh AS (SELECT s0 // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS cs
               FROM sess GROUP BY 1),
        eh AS (SELECT s1 // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS ce
               FROM sess GROUP BY 1),
        grid AS (SELECT UNNEST(GENERATE_SERIES(h0, h1)) AS h FROM tot),
        conc AS (
          SELECT MAX(cums - COALESCE(cume, 0)) AS peak FROM (
            SELECT SUM(COALESCE(cs, 0)) OVER (ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cums,
              SUM(COALESCE(ce, 0)) OVER (ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cume
            FROM grid LEFT JOIN sh USING (h) LEFT JOIN eh USING (h)))
        SELECT ns AS n_sessions, h1 - h0 + 1 AS span_hours,
          FLOOR((CAST(ns AS DOUBLE) / (h1 - h0 + 1)) * 10000 + 0.500001)
            / 10000 AS lambda_per_hr,
          FLOOR((CAST(busy AS DOUBLE) / (CAST(ns AS DOUBLE) * 60000000.0))
                * 10000 + 0.500001) / 10000 AS mean_dur_min,
          FLOOR((CAST(busy AS DOUBLE) / ((h1 - h0 + 1) * 3.6e9))
                * 1000000 + 0.500001) / 1000000 AS time_avg_concurrent,
          CAST(peak AS BIGINT) AS peak_hourly_concurrent,
          FLOOR(((CAST(ns AS DOUBLE) / (h1 - h0 + 1))
                 * (CAST(busy AS DOUBLE) / (CAST(ns AS DOUBLE) * 3.6e9)))
                * 1000000 + 0.500001) / 1000000 AS little_lw
        FROM tot CROSS JOIN conc"""),
      "Concurrency profile of 1-day-gap sessions: arrival rate, mean duration, busy-time average, hourly-sampled peak, and the Little's-law product as a two-path identity audit"),

    // ---------------------------------------------------------------- q19
    Query(
      "q19_session_windows",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "1 day").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(col("user_id"), col("sw.start").as("session_start"),
            (col("sw.end") - expr("INTERVAL 1 DAY")).as("session_last"),
            col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("session_start")),
      Some("""
        WITH o AS (
          SELECT user_id, ts, value,
            CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        g AS (
          SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM o)
        SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_last,
          COUNT(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM g
        GROUP BY user_id, sid
        ORDER BY user_id, session_start"""),
      "session windows (1-day inactivity gap); oracle via gaps-and-islands"),

    // ---------------------------------------------------------------- q95
    // Ordered-funnel analysis (MATCH_RECOGNIZE-class semantics without
    // the operator): per user, first 'view', then the first 'click'
    // STRICTLY AFTER it, then the first 'purchase' strictly after that.
    // Each stage is one filtered partial aggregate joined back on the
    // key — three key-shuffles of (user, µs) pairs, no row explosion,
    // no per-user event buffering; exactly how a 100 TB funnel backfill
    // avoids the sessionize-then-scan pattern. Integer-microsecond time
    // arithmetic keeps both engines bit-identical.
    Query(
      "q95_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val users = ev.select(col("user_id")).distinct()
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("t1"))
        val c = ev.filter(col("event_type") === "click").as("e")
          .join(v, Seq("user_id"))
          .filter(col("us") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase").as("e")
          .join(c, Seq("user_id"))
          .filter(col("us") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("us")).as("t3"))
        users
          .join(v.withColumn("viewed", lit(true)), Seq("user_id"), "left")
          .join(c.withColumn("clicked", lit(true)), Seq("user_id"), "left")
          .join(p.withColumn("purchased", lit(true)), Seq("user_id"), "left")
          .select(col("user_id"),
            coalesce(col("viewed"), lit(false)).as("viewed"),
            coalesce(col("clicked"), lit(false)).as("clicked"),
            coalesce(col("purchased"), lit(false)).as("purchased"),
            coalesce(col("t3") - col("t1"), lit(-1L)).as("funnel_us"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2 FROM events e
              JOIN v ON v.user_id = e.user_id AND epoch_us(e.ts) > v.t1
              WHERE e.event_type = 'click' GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3 FROM events e
              JOIN c ON c.user_id = e.user_id AND epoch_us(e.ts) > c.t2
              WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT u.user_id,
          v.user_id IS NOT NULL AS viewed,
          c.user_id IS NOT NULL AS clicked,
          p.user_id IS NOT NULL AS purchased,
          CAST(COALESCE(p.t3 - v.t1, -1) AS BIGINT) AS funnel_us
        FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
               LEFT JOIN p USING (user_id)
        ORDER BY u.user_id"""),
      "ordered funnel (view -> click -> purchase): staged filtered aggregates, no row explosion"),

    // --------------------------------------------------------------- q158
    // Peak interval concurrency per event type — the sweep-line
    // interval-algebra member (capacity planning: "how many 5-minute
    // event windows were ever open at once"). Each event opens the
    // half-open interval [ts, ts+300 s); the sweep emits +1/−1 deltas,
    // orders by (time, delta) so closings at an instant precede
    // openings (half-open semantics), and takes a running sum. The
    // prefix-sum multiset is invariant to ordering WITHIN an equal
    // (time, delta) block (+1s only climb), so the max and the
    // earliest time it is reached are both deterministic without a
    // full tiebreak. All integer microseconds. Scale shape: one hash
    // exchange on event_type + per-type sort — the canonical
    // distributed sweep; no self-join, no explode beyond 2× rows.
    Query(
      "q158_peak_concurrency",
      (s, d) => {
        val pts = Tables.events(s, d)
          .select(col("event_type"), unix_micros(col("ts")).as("t"))
          .select(col("event_type"), explode(array(
            struct(col("t"), lit(1L).as("delta")),
            struct((col("t") + lit(300000000L)).as("t"),
              lit(-1L).as("delta")))).as("p"))
          .select(col("event_type"), col("p.t").as("t"), col("p.delta").as("delta"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("t"), col("delta"))
        val swept = pts.withColumn("cum", sum(col("delta")).over(w))
        swept.groupBy(col("event_type")).agg(max(col("cum")).as("peak"))
          .join(swept, Seq("event_type"))
          .filter(col("cum") === col("peak"))
          .groupBy(col("event_type"))
          .agg(first(col("peak")).as("peak_concurrency"),
            min(col("t")).as("peak_at_micros"))
          .join(Tables.events(s, d).groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_intervals")), Seq("event_type"))
          .select(col("event_type"), col("n_intervals"),
            col("peak_concurrency"), col("peak_at_micros"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH pts AS (
          SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
          UNION ALL
          SELECT event_type, epoch_us(ts) + 300000000, -1 FROM events),
        swept AS (
          SELECT event_type, t, delta,
            SUM(delta) OVER (PARTITION BY event_type
              ORDER BY t, delta) AS cum
          FROM pts),
        mx AS (
          SELECT event_type, MAX(cum) AS peak FROM swept GROUP BY event_type),
        at AS (
          SELECT s.event_type, ANY_VALUE(m.peak) AS peak_concurrency,
            MIN(s.t) AS peak_at_micros
          FROM swept s JOIN mx m
            ON s.event_type = m.event_type AND s.cum = m.peak
          GROUP BY s.event_type),
        n AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals
          FROM events GROUP BY event_type)
        SELECT at.event_type, n.n_intervals,
          CAST(peak_concurrency AS BIGINT) AS peak_concurrency,
          CAST(peak_at_micros AS BIGINT) AS peak_at_micros
        FROM at JOIN n ON at.event_type = n.event_type
        ORDER BY at.event_type"""),
      "sweep-line peak concurrency of 5-minute event intervals per type: +1/-1 deltas, one per-type sort, no self-join"),

    // ---------------------------------------------------------------- q223
    // As-of join COVERAGE audit: q18 produces the enriched rows; this
    // reports whether the enrichment is trustworthy — per event type,
    // the match rate (share of events with any prior purchase to
    // carry) and the p50/p95 dimension STALENESS (how old the carried
    // purchase is at event time). The operational gate for every
    // as-of pipeline: a 95th-percentile staleness of days means the
    // join is technically correct and semantically garbage.
    // Percentiles are exact ranks over a BOUNDED minute-bucket
    // histogram (staleness div 60e6 µs), the q142 discipline — never
    // a per-type sort of raw rows, so the low-cardinality event_type
    // partition cannot become the q127-style straggler at 100 TB.
    // Rank cut: smallest bucket with cumulative count ≥ ceil(q·n) —
    // integer-exact on both engines (n < 2^52).
    Query(
      "q223_asof_staleness",
      (s, d) => {
        val events = Tables.events(s, d)
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        val joined = asofJoin(
          events.select(col("user_id"), col("event_id"), col("ts"),
            col("event_type")),
          purchases, "user_id", "ts", "event_id",
          Seq("ts" -> "pts"))
          .localCheckpoint() // one pass feeds base counts AND histogram
        val base = joined.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("pts").isNotNull, 1L).otherwise(0L)).as("n_matched"))
        val hist = joined.filter(col("pts").isNotNull)
          .select(col("event_type"),
            expr("(unix_micros(ts) - unix_micros(pts)) div 60000000").as("mb"))
          .groupBy(col("event_type"), col("mb"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded: types × minutes-in-span
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("mb"))))
        def pct(q: Double, name: String) = cum
          .join(hist.groupBy(col("event_type")).agg(sum(col("c")).as("nm")),
            Seq("event_type"))
          .filter(col("cum") >= ceil(col("nm") * lit(q)))
          .groupBy(col("event_type")).agg(min(col("mb")).as(name))
        base
          .join(pct(0.5, "p50_staleness_min"), Seq("event_type"), "left")
          .join(pct(0.95, "p95_staleness_min"), Seq("event_type"), "left")
          .select(col("event_type"), col("n_events"), col("n_matched"),
            Num.r6(col("n_matched").cast("double")
              / col("n_events").cast("double")).as("match_share"),
            col("p50_staleness_min"), col("p95_staleness_min"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH a AS (
          SELECT e.event_type, e.ts, p.ts AS pts
          FROM events e
          ASOF LEFT JOIN (
            SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
            ON e.user_id = p.user_id AND e.ts >= p.ts),
        base AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST(COUNT(pts) AS BIGINT) AS n_matched
          FROM a GROUP BY event_type),
        hist AS (
          SELECT event_type,
            (epoch_us(ts) - epoch_us(pts)) // 60000000 AS mb,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM a WHERE pts IS NOT NULL GROUP BY 1, 2),
        cum AS (
          SELECT event_type, mb,
            SUM(c) OVER (PARTITION BY event_type ORDER BY mb) AS cum
          FROM hist),
        tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS nm
                FROM hist GROUP BY event_type),
        p50 AS (
          SELECT c.event_type, CAST(MIN(mb) AS BIGINT) AS p50_staleness_min
          FROM cum c JOIN tot t USING (event_type)
          WHERE c.cum >= CEIL(t.nm * 0.5) GROUP BY c.event_type),
        p95 AS (
          SELECT c.event_type, CAST(MIN(mb) AS BIGINT) AS p95_staleness_min
          FROM cum c JOIN tot t USING (event_type)
          WHERE c.cum >= CEIL(t.nm * 0.95) GROUP BY c.event_type)
        SELECT b.event_type, n_events, n_matched,
          FLOOR((CAST(n_matched AS DOUBLE) / n_events)
                * 1000000 + 0.500001) / 1000000 AS match_share,
          p50_staleness_min, p95_staleness_min
        FROM base b
        LEFT JOIN p50 ON p50.event_type = b.event_type
        LEFT JOIN p95 ON p95.event_type = b.event_type
        ORDER BY b.event_type"""),
      "as-of join coverage audit: per-type match rate + p50/p95 carried-dimension staleness from a bounded minute-bucket histogram"),

    // ---------------------------------------------------------------- q431
    // q18's exact scenario through the NATIVE as-of operator
    // (graft.plans.AsOfJoinExec: logical node + strategy + one-pass
    // sorted merge). Same DuckDB ASOF oracle as q18, so the custom
    // physical operator is held to the identical hash — any drift
    // between the Catalyst-native path and the composed union+window
    // path (q18) surfaces as a correctness failure on one of the two.
    // The scale win this plan shape buys: the quote side shuffles at
    // its own (narrow, pre-filtered) width instead of being unioned
    // into the probe stream, and the merge holds one row of state.
    Query(
      "q431_asof_native",
      (s, d) => {
        val events = Tables.events(s, d)
        val purchases = events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"))
        graft.plans.AsOfJoin.join(
          events.select(col("user_id"), col("event_id"), col("ts"),
            col("value")),
          purchases, "user_id", "ts",
          Seq("ts" -> "last_purchase_ts", "value" -> "last_purchase_value"))
          .select(col("user_id"), col("event_id"), col("value"),
            col("last_purchase_ts"), col("last_purchase_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""
        SELECT e.user_id, e.event_id, e.value,
          p.ts AS last_purchase_ts, p.value AS last_purchase_value
        FROM events e
        ASOF LEFT JOIN (
          SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY e.user_id, e.event_id"""),
      "native Catalyst as-of join (custom LogicalPlan + strategy + merge exec), pinned to the same DuckDB ASOF oracle as q18"),

    // ---------------------------------------------------------------- q432
    // Point-in-time benchmark join against a DERIVED quote table:
    // every order is benchmarked against its market segment's average
    // order total from the latest month-end at-or-before the order
    // date (orders on a month's last day see their own month; all
    // others see the prior month's close — the standard feature-store
    // rule that prevents lookahead leakage). OPERATOR SELECTION, the
    // point of this query: the as-of key here has ~5 distinct values
    // and the quote table is bounded (segments × months), so routing
    // it through ANY shuffled as-of — native exec or union+window —
    // caps parallelism at 5 tasks forever (measured at 100×: 21.8 s
    // through the native exec, 12.8 s broadcast with the HOF lookup,
    // 5.2 s broadcast with asof_lookup — and the shuffled plan's gap
    // is the 5-task sort, which only widens with data). The scale-correct
    // plan for a bounded quote side is a BROADCAST as-of: quotes
    // collapse to one sorted array per key (5 rows), broadcast-join on
    // the key alone, and each probe row binary-searches its own match
    // via the native asof_lookup expression — zero added shuffle, full
    // scan parallelism, O(log months)/row in whole-stage codegen. The
    // native exec (q431) remains the plan for high-cardinality keys.
    // Averages are exact: DECIMAL sum / count, divided once, then
    // stable-rounded; the DuckDB oracle is a plain ASOF LEFT JOIN.
    Query(
      "q432_asof_benchmark",
      (s, d) => {
        val seg = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
            col("c_mktsegment"),
            // o_orderdate is a timestamp; the as-of compares DATE grain
            // (bench_date is a month-end DATE) — t >= midnight(d) iff
            // date(t) >= d, so the truncation is exact
            to_date(col("o_orderdate")).as("o_odate"))
        val bench = seg
          .groupBy(col("c_mktsegment"),
            last_day(col("o_orderdate")).as("bench_date"))
          .agg(Num.r4(sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double") / count(lit(1))).as("bench_avg"))
          // bounded: segments × months in the data's span
          .groupBy(col("c_mktsegment"))
          .agg(sort_array(collect_list(
            struct(col("bench_date"), col("bench_avg")))).as("bs"))
        seg.join(broadcast(bench), Seq("c_mktsegment"))
          // codegen'd binary search in the sorted quote array (the
          // native asof_lookup expression) — O(log months)/row, zero
          // allocation, vs the HOF filter's per-row array copy
          .withColumn("m", graft.functions.TemporalFunctions
            .asofLookup(col("bs"), col("o_odate")))
          .select(col("o_orderkey"), col("c_mktsegment"), col("o_orderdate"),
            col("m.bench_avg").as("bench_avg"),
            Num.r4(col("o_totalprice").cast("decimal(18,2)").cast("double")
              / col("m.bench_avg")).as("rel_to_bench"))
          .orderBy(col("o_orderkey"))
      },
      Some(s"""
        WITH seg AS (
          SELECT o_orderkey, o_orderdate, o_totalprice, c_mktsegment
          FROM orders JOIN customer ON o_custkey = c_custkey),
        bench AS (
          SELECT c_mktsegment, last_day(o_orderdate) AS bench_date,
            ${Num.sql("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS bench_avg
          FROM seg GROUP BY 1, 2)
        SELECT s.o_orderkey, s.c_mktsegment, s.o_orderdate, b.bench_avg,
          ${Num.sql("CAST(CAST(s.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) / b.bench_avg", 4)} AS rel_to_bench
        FROM seg s
        ASOF LEFT JOIN bench b
          ON s.c_mktsegment = b.c_mktsegment AND s.o_orderdate >= b.bench_date
        ORDER BY s.o_orderkey"""),
      "point-in-time-correct segment benchmark via the native as-of operator: month-end quote table derived in-query, no lookahead leakage"),

    // ---------------------------------------------------------------- q434
    // The array as-of at HIGH key cardinality, through the SQL surface:
    // every lineitem shipment is joined to its part's latest month-end
    // average price as of the ship date, via the SQL-registered
    // asof_lookup expression. This is the third as-of strategy and its
    // missing-scale case: quotes per key are BOUNDED (months in span)
    // but keys are many (parts), so neither the broadcast (q432: index
    // too big) nor the shuffled merge (q431: fine, but re-sorts probes)
    // is forced — the index collapses to ONE sorted array per part, the
    // probe join is a plain equi-join on l_partkey at full parallelism,
    // and each probe row binary-searches its own array in codegen.
    // Early shipments (before their part's first month-end) get NULL —
    // DuckDB's ASOF LEFT JOIN reproduces exactly. Also the correctness
    // gate for the SQL registration path of asof_lookup (q432 exercises
    // the Column API).
    Query(
      "q434_asof_lookup_sql",
      (s, d) => {
        graft.GraftExtensions.install(s)
        Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
        s.sql(s"""
          WITH li AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
              CAST(l_shipdate AS DATE) AS sdate
            FROM lineitem),
          bench AS (
            SELECT l_partkey, last_day(sdate) AS bdate,
              ${Num.sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS bavg
            FROM li GROUP BY l_partkey, last_day(sdate)),
          idx AS (
            SELECT l_partkey,
              sort_array(collect_list(struct(bdate, bavg))) AS bs
            FROM bench GROUP BY l_partkey)
          SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
            l.sdate AS ship_date,
            asof_lookup(i.bs, l.sdate).bdate AS bench_month_end,
            asof_lookup(i.bs, l.sdate).bavg AS bench_avg,
            ${Num.sql("CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / asof_lookup(i.bs, l.sdate).bavg", 4)} AS rel_price
          FROM li l JOIN idx i USING (l_partkey)
          -- (l_orderkey, l_linenumber) is NOT unique in this data;
          -- rel_price as the last key is null-safe because ties share
          -- (partkey, ship_date) and therefore nullity
          ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.sdate,
            rel_price""")
      },
      Some(s"""
        WITH li AS (
          SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice,
            CAST(l_shipdate AS DATE) AS sdate
          FROM lineitem),
        bench AS (
          SELECT l_partkey, last_day(sdate) AS bdate,
            ${Num.sql("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)", 4)} AS bavg
          FROM li GROUP BY l_partkey, last_day(sdate))
        SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
          l.sdate AS ship_date,
          b.bdate AS bench_month_end, b.bavg AS bench_avg,
          ${Num.sql("CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) / b.bavg", 4)} AS rel_price
        FROM li l
        ASOF LEFT JOIN bench b
          ON l.l_partkey = b.l_partkey AND l.sdate >= b.bdate
        ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.sdate,
          rel_price"""),
      "array as-of at high key cardinality via the SQL-registered asof_lookup: one sorted quote array per part, plain equi-join, per-row codegen binary search"))
}
