package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Stratified (direct-adjustment) treatment-effect estimation — the
  * observational-analysis counterpart of the experimentation family
  * (q181 Welch t, q195 CUPED, q364 DiD, q369 Simpson audit): when
  * "treatment" correlates with a confounding stratum, the naive mean
  * difference is biased; the standardized estimator reweights each
  * stratum's within-stratum difference by the stratum's population
  * share (Cochran's direct adjustment — the discrete-propensity
  * special case of IPW, since weighting by 1/e_s inside a stratum and
  * renormalizing IS the n_s/n weighting).
  *
  * Exactness: money sums ride DECIMAL cents; each stratum's
  * within-stratum difference is one double of exact integer ratios
  * (identical in both engines), then micro-quantized to an integer —
  * so the CROSS-stratum weighted sum is an exact integer sum,
  * immune to float association order (the q427 discipline; a plain
  * SUM of per-stratum doubles would be order-nondeterministic in
  * both engines). Scale shape: one join, one grouped aggregate over
  * (stratum, arm), a 5-row broadcast — nothing grows with data.
  */
object Causal {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q440
    // Effect of urgent order priority on order value, adjusted for
    // market segment: treatment = priority in {1-URGENT, 2-HIGH};
    // outcome = o_totalprice; stratum = c_mktsegment. Output is one
    // row per stratum (counts, arm means, within-stratum diff) plus
    // the naive and stratified ATEs replicated on every row (constant
    // columns hash stably and keep the result a single relation).
    Query(
      "q440_stratified_ate",
      (s, d) => {
        val joined = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
            Seq("o_custkey"))
          .select(col("c_mktsegment").as("stratum"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("t"),
            (col("o_totalprice").cast("decimal(18,2)") * 100)
              .cast("decimal(38,0)").as("cents"))
        // ONE scan of the join feeds everything: the 5-row per-stratum
        // aggregate is checkpointed, and the overall totals are exact
        // decimal sums OF it (without this, strata appeared three times
        // in the tree and the 100x bench paid three 15M-row joins)
        val per = joined.groupBy(col("stratum"))
          .agg(count(lit(1)).as("n_s"),
            sum(col("t")).as("n_t"),
            sum(when(col("t") === 1, col("cents")).otherwise(lit(0)))
              .as("s_t"),
            sum(when(col("t") === 0, col("cents")).otherwise(lit(0)))
              .as("s_c"))
          .localCheckpoint()
        val strata = per
          .withColumn("n_c", col("n_s") - col("n_t"))
          .filter(col("n_t") > 0 && col("n_c") > 0) // both arms present
          .withColumn("mean_t",
            col("s_t").cast("double") / col("n_t") / 100.0)
          .withColumn("mean_c",
            col("s_c").cast("double") / col("n_c") / 100.0)
          // within-stratum diff in integer micro-dollars: one double of
          // exact integers, then the house floor-quantization
          .withColumn("diff_micro",
            floor((col("mean_t") - col("mean_c")) * lit(1e6) + lit(0.5))
              .cast("long"))
        val totals = per.agg(
          sum(col("n_s")).as("n"), sum(col("n_t")).as("n1"),
          sum(col("s_t")).as("sy1"), sum(col("s_c")).as("sy0"))
        val est = strata.agg(
            sum(col("n_s")).as("n_used"),
            sum(col("n_s").cast("decimal(38,0)") * col("diff_micro"))
              .as("wsum"))
          .crossJoin(broadcast(totals))
          .select(
            Num.r4(col("wsum").cast("double")
              / col("n_used").cast("double") / lit(1e6)).as("ate_stratified"),
            Num.r4(col("sy1").cast("double") / col("n1") / 100.0
              - col("sy0").cast("double") / (col("n") - col("n1")) / 100.0)
              .as("ate_naive"))
        strata.crossJoin(broadcast(est))
          .select(col("stratum"), col("n_s"), col("n_t"), col("n_c"),
            Num.r4(col("mean_t")).as("mean_t"),
            Num.r4(col("mean_c")).as("mean_c"),
            Num.r4(col("diff_micro") / lit(1e6)).as("diff"),
            col("ate_stratified"), col("ate_naive"))
          .orderBy(col("stratum"))
      },
      Some(s"""
        WITH j AS (
          SELECT c.c_mktsegment AS stratum,
            CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END AS t,
            CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        strata AS (
          SELECT stratum,
            CAST(COUNT(*) AS BIGINT) AS n_s,
            CAST(SUM(t) AS BIGINT) AS n_t,
            CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_c,
            SUM(CASE WHEN t = 1 THEN cents ELSE 0 END) AS s_t,
            SUM(CASE WHEN t = 0 THEN cents ELSE 0 END) AS s_c
          FROM j GROUP BY stratum
          HAVING SUM(t) > 0 AND COUNT(*) - SUM(t) > 0),
        sd AS (
          SELECT *, CAST(s_t AS DOUBLE) / n_t / 100.0 AS mean_t,
            CAST(s_c AS DOUBLE) / n_c / 100.0 AS mean_c,
            CAST(FLOOR((CAST(s_t AS DOUBLE) / n_t / 100.0
              - CAST(s_c AS DOUBLE) / n_c / 100.0) * 1000000 + 0.5) AS BIGINT)
              AS diff_micro
          FROM strata),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(t) AS BIGINT) AS n1,
            SUM(CASE WHEN t = 1 THEN cents ELSE 0 END) AS sy1,
            SUM(CASE WHEN t = 0 THEN cents ELSE 0 END) AS sy0
          FROM j),
        est AS (
          SELECT
            ${Num.sql("CAST(SUM(CAST(n_s AS HUGEINT) * diff_micro) AS DOUBLE) / CAST(SUM(n_s) AS DOUBLE) / 1000000.0", 4)}
              AS ate_stratified,
            ${Num.sql("CAST(sy1 AS DOUBLE) / n1 / 100.0 - CAST(sy0 AS DOUBLE) / (n - n1) / 100.0", 4)}
              AS ate_naive
          FROM sd CROSS JOIN tot
          GROUP BY sy1, sy0, n, n1)
        SELECT s.stratum, s.n_s, s.n_t, s.n_c,
          ${Num.sql("s.mean_t", 4)} AS mean_t,
          ${Num.sql("s.mean_c", 4)} AS mean_c,
          ${Num.sql("s.diff_micro / 1000000.0", 4)} AS diff,
          e.ate_stratified, e.ate_naive
        FROM sd s CROSS JOIN est e
        ORDER BY s.stratum"""),
      "Cochran direct-adjustment (stratified) ATE of urgent priority on order value across market segments, with the naive contrast beside it; cross-stratum sum rides integer micro-quantized diffs"))
}
