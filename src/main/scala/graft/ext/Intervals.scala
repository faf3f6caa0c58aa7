package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap counting — the general [s, e] × [s, e] join (q52's
  * range join is the |Δt| ≤ tol special case; q158's sweep measures
  * peak concurrency, not pair counts). The engine NEVER materializes
  * pairs: per group, overlapping pairs = C(n,2) − non-overlapping
  * pairs, and a pair is non-overlapping iff one interval ends strictly
  * before the other starts — so Σ over starts of "ends seen so far"
  * under the event order (value asc, starts-before-ends at ties)
  * counts each non-overlapping pair exactly once, with one
  * partitioned sort-window, O(n log n). The ORACLE pays the quadratic
  * identity-free brute force: ordered overlapping pairs including
  * self are n + 2·(unordered pairs), so (cnt − n)/2 needs no row ids
  * at all (the driver's lineitem has no unique line key — the q434
  * finding).
  *
  * Tie semantics (inclusive dates): e = s counts as overlap, so at
  * equal event value starts process BEFORE ends; equal-key window
  * ties are harmless because only typ=1 rows contribute to the
  * running sum — the result is partition- and tie-order invariant,
  * which is exactly what the 2-thread and AQE+200 sweeps check.
  */
object Intervals {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q438
    // Per-supplier overlapping fulfillment windows shipped in 1995: a
    // line's window is [o_orderdate, l_shipdate] (order placed ->
    // shipped); how many pairs of a supplier's lines were in flight
    // simultaneously — backlog/capacity pressure per supplier.
    // Sweep-line exact count; the orders join is a plain equi-join on
    // the order key at full parallelism.
    Query(
      "q438_interval_overlap",
      (s, d) => {
        val iv = Tables.lineitem(s, d)
          // range predicate, not year(): reaches the parquet scan as a
          // min/max row-group filter (year() is opaque to pushdown)
          .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
          .select(col("l_suppkey").as("supp"), col("l_orderkey"),
            col("l_shipdate").as("ed"))
          .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey"),
            col("o_orderdate").as("sd")), Seq("l_orderkey"))
          .filter(col("sd") <= col("ed")) // valid windows only
          .select(col("supp"), col("sd"), col("ed"))
          // materialize the join once; both event streams read it
          .localCheckpoint()
        val events = iv.select(col("supp"), col("sd").as("v"), lit(0).as("typ"))
          .unionByName(iv.select(col("supp"), col("ed").as("v"), lit(1).as("typ")))
        val w = Window.partitionBy(col("supp")).orderBy(col("v"), col("typ"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val swept = events
          .withColumn("ends_before", coalesce(sum(col("typ")).over(w), lit(0L)))
          .filter(col("typ") === 0)
          .groupBy(col("supp"))
          .agg(count(lit(1)).as("n_ship"),
            sum(col("ends_before")).as("non_overlap"))
        swept.select(col("supp"), col("n_ship"),
          (expr("n_ship * (n_ship - 1) div 2") - col("non_overlap"))
            .as("overlap_pairs"))
          .orderBy(col("supp"))
      },
      Some("""
        WITH iv AS (
          SELECT l.l_suppkey AS supp, o.o_orderdate AS sd, l.l_shipdate AS ed
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
            AND l.l_shipdate < TIMESTAMP '1996-01-01'
            AND o.o_orderdate <= l.l_shipdate),
        n AS (SELECT supp, CAST(COUNT(*) AS BIGINT) AS n_ship FROM iv GROUP BY supp),
        c AS (
          SELECT a.supp, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM iv a JOIN iv b
            ON a.supp = b.supp AND b.sd <= a.ed AND a.sd <= b.ed
          GROUP BY a.supp)
        SELECT n.supp, n.n_ship,
          CAST((c.cnt - n.n_ship) / 2 AS BIGINT) AS overlap_pairs
        FROM n JOIN c ON c.supp = n.supp
        ORDER BY n.supp"""),
      "per-supplier overlapping fulfillment-window pair counts via an O(n log n) sweep (ends-seen-before-each-start); oracle pays the identity-free quadratic interval join"),

    // ---------------------------------------------------------------- q441
    // Time-weighted average (the TWAP/feature-store primitive, absent
    // until now): per user, each event's value HOLDS until the user's
    // next event, so the average weights values by holding duration —
    // the right statistic for sampled state (a plain AVG over-weights
    // bursts). One lead() window per user; the last event has no
    // successor and is excluded, and holds are weighted at SECOND
    // grain (sub-second holds weigh 0 — identical truncation both
    // engines). Exactness is pure int64, by a SPAN bound rather than a
    // row-count bound: per user, Σ vm·gap_s ≤ vm_max · total_span_s —
    // micro-quantized vitals (vm ≤ ~1e9) over even a 30-year span
    // (1e9 s) stay under 2^63 with margin, and hash-agg partials are
    // per (group, partition) so no partial can exceed the group bound.
    // The first draft summed vm·gap_us through DECIMAL(38,0); the 100x
    // bench caught it at 57 s — a window feeding a precision-38
    // decimal aggregate abandons the fast hash-agg path (measured
    // 8.3 s with long sums, 60-109 s with decimal, same rows) — and
    // the long-safe reformulation runs the expected window cost.
    Query(
      "q441_time_weighted_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val rows = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vm"))
          .withColumn("gap_s",
            expr("(lead(us, 1) over (partition by user_id order by us, event_id) - us) div 1000000"))
          .filter(col("gap_s").isNotNull && col("gap_s") > 0)
        rows.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_holds"),
            sum(col("gap_s")).as("span_s"),
            sum(col("vm") * col("gap_s")).as("vsum"))
          .select(col("user_id"), col("n_holds"), col("span_s"),
            Num.r6(col("vsum").cast("double")
              / col("span_s").cast("double") / lit(1e6)).as("twa_value"))
          .orderBy(col("user_id"))
      },
      Some(s"""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
            CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS vm
          FROM events),
        g AS (
          SELECT user_id, vm,
            (LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us)
              // 1000000 AS gap_s
          FROM e)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_holds,
          CAST(SUM(gap_s) AS BIGINT) AS span_s,
          ${Num.sql("CAST(SUM(vm * gap_s) AS DOUBLE) / CAST(SUM(gap_s) AS DOUBLE) / 1000000.0", 6)}
            AS twa_value
        FROM g WHERE gap_s IS NOT NULL AND gap_s > 0
        GROUP BY user_id ORDER BY user_id"""),
      "per-user time-weighted average value (each event holds until the next, second-grain weights): the TWAP primitive, span-bounded pure-int64 moments"))
}

