package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend / time-decay / split-hygiene operators for a training-data
  * pipeline: exact closed-form OLS regression per group, a bounded
  * integer-weight EWMA (the streaming-friendly recency smoother), and
  * the temporal train/test split audit that counts entity leakage
  * across the boundary.
  *
  * Exactness pattern shared by all three: every unordered sum runs
  * over integers (cents, epoch days, micro-units), products that can
  * exceed int64 move to DECIMAL(38,0) — exact in both engines — and
  * the only doubles are final r6-rounded ratios.
  */
object Trend {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q145
    // Per-market-segment OLS regression of order value (cents) on
    // order date (epoch days): slope = cents/day drift, plus the
    // intercept — the closed-form trend fit a drift monitor runs per
    // slice. All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    // exact int64 sums (x ≤ ~12k days, y ≤ 5e7 cents → x·y ≤ 6e11,
    // fits through ~1000× this SF); the n·Σxy − Σx·Σy cross terms
    // exceed int64 so they are computed in DECIMAL(38,0) — exact in
    // both engines — before the one r6-rounded double division.
    // Scale shape: the orders⋈customer join shuffles on custkey, the
    // sufficient statistics are partial-aggregated per segment (5
    // groups), and the closed form avoids any second pass over the
    // data (no mean-centering pre-pass).
    Query(
      "q145_ols_trend",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("x"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("y"))
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        val g = o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        g.select(col("c_mktsegment"), col("n"), col("sx"), col("sy"),
            (dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy")))
              .as("num"),
            (dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx")))
              .as("den"),
            (dec(col("sy")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sxy")))
              .as("inum"))
          .select(col("c_mktsegment"), col("n"),
            Num.r6(col("num").cast("double") / col("den").cast("double"))
              .as("slope_cents_per_day"),
            Num.r6(col("inum").cast("double") / col("den").cast("double"))
              .as("intercept_cents"))
          .orderBy(col("c_mktsegment"))
      },
      Some(s"""
        WITH o AS (
          SELECT o_custkey,
            CAST(DATE_DIFF('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
          FROM orders),
        g AS (
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            CAST(SUM(x * y) AS BIGINT) AS sxy,
            CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM o JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment),
        t AS (
          SELECT c_mktsegment, n, sx, sy,
            CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))
              - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS num,
            CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
              - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS den,
            CAST(sy AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
              - CAST(sx AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0)) AS inum
          FROM g)
        SELECT c_mktsegment, n,
          ${Num.sql("CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 6)}
            AS slope_cents_per_day,
          ${Num.sql("CAST(inum AS DOUBLE) / CAST(den AS DOUBLE)", 6)}
            AS intercept_cents
        FROM t ORDER BY c_mktsegment"""),
      "closed-form OLS per group: exact integer sufficient statistics, DECIMAL(38,0) cross terms"),

    // --------------------------------------------------------------- q146
    // Bounded-window EWMA per user over event values: decay 3/4 across
    // the last 8 events, so the weights are the exact integers
    // w_k = 3^k·4^(7-k) (k = lags back; 16384, 12288, ... 2187) and the
    // weighted sum stays all-integer (value ≤ 561 → micro ≤ 5.7e8,
    // ×16384 ×8 terms ≤ 7.4e13). A bounded LAG chain is the batch twin
    // of a streaming O(1)-state smoother — no unbounded frame, no
    // RANGE scan; one hash shuffle on user_id with an in-partition
    // (us, event_id) sort shared by the lags and the last-row filter.
    // Short histories renormalize over the weights actually present.
    Query(
      "q146_ewma",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val weights = Array.tabulate(8)(k =>
          math.pow(3, k).toLong * math.pow(4, 7 - k).toLong)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            floor(col("value") * 1000000 + lit(0.5)).cast("long").as("vm"))
        val lagged = ev
          .withColumn("num", weights.zipWithIndex.map { case (wk, k) =>
            coalesce(lag(col("vm"), k).over(w), lit(0L)) * lit(wk) }
            .reduce(_ + _))
          .withColumn("den", weights.zipWithIndex.map { case (wk, k) =>
            when(lag(col("vm"), k).over(w).isNotNull, lit(wk)).otherwise(lit(0L)) }
            .reduce(_ + _))
          .withColumn("rn", row_number().over(w))
          .withColumn("nu", count(lit(1)).over(
            Window.partitionBy(col("user_id"))))
        lagged.filter(col("rn") === col("nu"))
          .select(col("user_id"), col("nu").as("n_events"),
            Num.r6(col("num") / (col("den") * lit(1000000.0))).as("ewma"))
          .orderBy(col("user_id"))
      },
      Some {
        val weights = Array.tabulate(8)(k =>
          math.pow(3, k).toLong * math.pow(4, 7 - k).toLong)
        val num = weights.zipWithIndex.map { case (wk, k) =>
          s"COALESCE(LAG(vm, $k) OVER pk, 0) * $wk" }.mkString(" + ")
        val den = weights.zipWithIndex.map { case (wk, k) =>
          s"CASE WHEN LAG(vm, $k) OVER pk IS NOT NULL THEN $wk ELSE 0 END" }
          .mkString(" + ")
        s"""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm
          FROM events),
        lagged AS (
          SELECT user_id, $num AS num, $den AS den,
            ROW_NUMBER() OVER pk AS rn,
            COUNT(*) OVER (PARTITION BY user_id) AS nu
          FROM ev
          WINDOW pk AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT user_id, CAST(nu AS BIGINT) AS n_events,
          ${Num.sql("num / (den * 1000000.0)", 6)} AS ewma
        FROM lagged WHERE rn = nu ORDER BY user_id"""
      },
      "bounded integer-weight EWMA: 8-term LAG chain, exact int64 weighted sums"),

    // --------------------------------------------------------------- q147
    // Temporal train/test split audit: cut the event log at the p80
    // timestamp (interpolated percentile over integer µs, floored back
    // to a µs boundary — broadcast 1-row scalar, never a global sort),
    // then report per-split event/user counts plus the leakage number:
    // users with activity on BOTH sides of the cut, the population a
    // group-aware split (q138) would have to hold out. The cut itself
    // comes from [[exactP80Cut]] — histogram-refined EXACT percentile
    // with bounded state (Spark's `percentile` aggregate collects every
    // value into one buffer: measured 10 s at 30×, OOM-certain at real
    // scale). One boundary computation, one per-user flag pass, 2-row
    // output.
    Query(
      "q147_time_split_audit",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val cut = exactP80Cut(ev)
        // round 9 (guide §2.3, the q174 derive-don't-re-read lesson):
        // ONE flag pass — every output number is a function of the
        // per-user (train, test) counts, so the old second corpus pass
        // (groupBy split + countDistinct's double exchange) collapses
        // into a 1-row aggregate over the user-bounded frame, exploded
        // back to the train/test rows. A split row is emitted only when
        // it holds events, exactly like the old groupBy.
        val perUser = ev.crossJoin(broadcast(cut))
          .groupBy(col("user_id"))
          .agg(sum(when(col("us") <= col("cut_us"), 1L).otherwise(0L)).as("tr"),
            sum(when(col("us") > col("cut_us"), 1L).otherwise(0L)).as("te"))
        perUser.agg(
            sum(col("tr")).as("ev_train"), sum(col("te")).as("ev_test"),
            sum(when(col("tr") > 0, 1L).otherwise(0L)).as("us_train"),
            sum(when(col("te") > 0, 1L).otherwise(0L)).as("us_test"),
            sum(when(col("tr") > 0 && col("te") > 0, 1L).otherwise(0L))
              .as("n_leaked_users"))
          .select(explode(array(
            struct(lit("train").as("split"), col("ev_train").as("n_events"),
              col("us_train").as("n_users"), col("n_leaked_users")),
            struct(lit("test").as("split"), col("ev_test").as("n_events"),
              col("us_test").as("n_users"), col("n_leaked_users")))).as("r"))
          .select(col("r.split").as("split"), col("r.n_events").as("n_events"),
            col("r.n_users").as("n_users"),
            col("r.n_leaked_users").as("n_leaked_users"))
          .filter(col("n_events") > 0)
          .orderBy(col("split"))
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        cut AS (
          SELECT CAST(FLOOR(QUANTILE_CONT(us, 0.8)) AS BIGINT) AS cut_us
          FROM ev),
        flags AS (
          SELECT user_id,
            CASE WHEN us <= cut_us THEN 'train' ELSE 'test' END AS split
          FROM ev CROSS JOIN cut),
        pu AS (
          SELECT user_id,
            SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
            SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
          FROM flags GROUP BY user_id),
        lk AS (
          SELECT CAST(SUM(CASE WHEN tr > 0 AND te > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_leaked_users FROM pu)
        SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          n_leaked_users
        FROM flags CROSS JOIN lk
        GROUP BY split, n_leaked_users ORDER BY split"""),
      "temporal split + entity-leakage audit: broadcast percentile cut, per-user flag pass"))

  /** Exact type-7 p80 over an integer column with BOUNDED state — the
    * distributed replacement for Spark's collecting `percentile`
    * aggregate (whose buffer holds every input value: fine at sf0.1,
    * a single-task OOM at 100 TB).
    *
    * Two-level histogram refinement, everything declarative:
    *  1. one aggregate for (min, max, n) → broadcast; target order
    *     statistics k0 = floor((n−1)·0.8), k1 = min(k0+1, n−1);
    *  2. 4096-bin integer-width histogram (width = range div 4096 + 1,
    *     division before multiplication so no int64 overflow), running
    *     counts over the ≤ 4097-row histogram locate the bin(s)
    *     holding k0/k1 — the windowed cumsum runs on a constant-sized
    *     frame, never the data;
    *  3. re-bin ONLY those bins (≤ 2·n/4096 rows) 4096 ways again —
    *     candidates shrink to ~n/16.7M per bin;
    *  4. rank the tiny candidate set (row_number within its level-2
    *     bin + the bin's exact global offset) and pick ranks k0/k1.
    * Interpolation repeats Percentile's own double formula
    * (v0 + (v1 − v0)·(h − k0)), so the result — and the DuckDB
    * QUANTILE_CONT twin — is bit-identical to the collecting
    * aggregate this replaces. Ties are a non-issue: equal values make
    * every tie-break return the same order statistic.
    */
  private def exactP80Cut(ev: DataFrame): DataFrame = {
    val B = 4096L
    val b = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"),
        count(lit(1)).as("n"))
      .withColumn("h", (col("n") - 1).cast("double") * lit(0.8))
      .withColumn("k0", floor(col("h")).cast("long"))
      .withColumn("k1", least(col("k0") + 1, col("n") - 1))
      .withColumn("w1", expr(s"(mx - mn) div $B + 1"))
      .withColumn("w2", expr(s"((mx - mn) div $B) div $B + 1"))
    val e1 = ev.select(col("us"))
      .crossJoin(broadcast(b.select(col("mn"), col("w1"), col("w2"))))
      .withColumn("b1", expr("(us - mn) div w1"))
    val winAll = Window.orderBy(col("b1"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum1 = e1.groupBy(col("b1")).agg(count(lit(1)).as("cnt"))
      .withColumn("cb", coalesce(sum(col("cnt")).over(winAll), lit(0L)))
    val selB = cum1.crossJoin(broadcast(b.select(col("k0"), col("k1"))))
      .filter((col("cb") <= col("k0") && col("k0") < col("cb") + col("cnt")) ||
        (col("cb") <= col("k1") && col("k1") < col("cb") + col("cnt")))
      .select(col("b1"), col("cb"))
    val e2 = e1.join(broadcast(selB), "b1")
      .withColumn("b2", expr("(us - mn - b1 * w1) div w2"))
    val winBin = Window.partitionBy(col("b1")).orderBy(col("b2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum2 = e2.groupBy(col("b1"), col("b2"))
      .agg(count(lit(1)).as("cnt2"), min(col("cb")).as("cb0"))
      .withColumn("cb2", col("cb0") +
        coalesce(sum(col("cnt2")).over(winBin), lit(0L)))
    val selB2 = cum2.crossJoin(broadcast(b.select(col("k0"), col("k1"))))
      .filter((col("cb2") <= col("k0") && col("k0") < col("cb2") + col("cnt2")) ||
        (col("cb2") <= col("k1") && col("k1") < col("cb2") + col("cnt2")))
      .select(col("b1"), col("b2"), col("cb2"))
    val ranked = e2.join(broadcast(selB2), Seq("b1", "b2"))
      .withColumn("gr", row_number().over(
        Window.partitionBy(col("b1"), col("b2")).orderBy(col("us")))
        .cast("long") - 1 + col("cb2"))
    ranked.crossJoin(broadcast(b.select(col("h"), col("k0"), col("k1"))))
      .filter(col("gr") === col("k0") || col("gr") === col("k1"))
      .agg(
        min(when(col("gr") === col("k0"), col("us"))).cast("double").as("v0"),
        min(when(col("gr") === col("k1"), col("us"))).cast("double").as("v1"),
        first(col("h")).as("hh"), first(col("k0")).as("kk"))
      .select(floor(col("v0") + (coalesce(col("v1"), col("v0")) - col("v0"))
        * (col("hh") - col("kk"))).cast("long").as("cut_us"))
  }
}
