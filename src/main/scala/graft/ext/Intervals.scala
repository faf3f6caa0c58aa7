package graft.ext

import graft.{Query, Tables}
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
      "per-supplier overlapping fulfillment-window pair counts via an O(n log n) sweep (ends-seen-before-each-start); oracle pays the identity-free quadratic interval join"))
}
