package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics continuation, batch 26: stylometric source
  * distance, marketing attribution, and conversion-lag percentiles.
  * Exactness: per-cell quantization before bounded-grid sums, exact
  * integer rank selection over bounded histograms, and the shared
  * IGNORE-NULLS window semantics for carry-forward state.
  */
object Behavior2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q279
    // Burrows' Delta (2002) between sources over the top-50 corpus
    // function words: z-score each source's per-billion token rate
    // within each token (across the 20 sources), Delta(a,b) = mean
    // |z_a − z_b|; report the 10 closest pairs — the stylometric
    // "same author?" distance. Everything after the one token pass is
    // (50 × sources)-grid-bounded; rates are ppb-quantized, the
    // cross-source moments ride DECIMAL/HUGEINT, and the per-token
    // |Δz| is nano-quantized before the pair sum so the top-10 order
    // is exact.
    Query(
      "q279_burrows_delta",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // one corpus pass feeds totals, top-50, grid
        val srcTot = counts.groupBy(col("source")).agg(sum(col("c")).as("ntok"))
        val top50 = counts.groupBy(col("t")).agg(sum(col("c")).as("ctot"))
          .orderBy(col("ctot").desc, col("t")).limit(50)
          .select(col("t"))
        val grid = top50.crossJoin(broadcast(srcTot))
          .join(counts, Seq("t", "source"), "left")
          .na.fill(0L, Seq("c"))
          .select(col("t"), col("source"),
            floor(col("c").cast("double") / col("ntok").cast("double")
              * lit(1e9) + lit(0.5)).cast("long").as("fq"))
        val stats = grid.groupBy(col("t"))
          .agg(count(lit(1)).as("ns"),
            sum(col("fq")).as("sfq"),
            sum((col("fq") * col("fq")).cast("decimal(38,0)")).as("sqq"))
          .withColumn("meanf", col("sfq").cast("double") / col("ns").cast("double"))
          .withColumn("sd", sqrt(
            (col("sqq").cast("double") - col("sfq").cast("double") *
              col("sfq").cast("double") / col("ns").cast("double")) /
              (col("ns") - 1).cast("double")))
          .filter(col("sd") > 0)
        val z = grid.join(broadcast(stats.select(col("t"), col("meanf"), col("sd"))),
            Seq("t"))
          .select(col("t"), col("source"),
            ((col("fq").cast("double") - col("meanf")) / col("sd")).as("z"))
        val za = z.select(col("t"), col("source").as("src_a"), col("z").as("za"))
        val zb = z.select(col("t"), col("source").as("src_b"), col("z").as("zb"))
        za.join(zb, Seq("t"))
          .filter(col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            floor(abs(col("za") - col("zb")) * lit(1e9) + lit(0.5))
              .cast("long").as("dq"))
          .groupBy(col("src_a"), col("src_b"))
          .agg(sum(col("dq")).as("sdq"), count(lit(1)).as("nt"))
          .orderBy(col("sdq"), col("src_a"), col("src_b"))
          .limit(10)
          .select(col("src_a"), col("src_b"),
            Num.r6(col("sdq").cast("double") / lit(1e9) / col("nt").cast("double"))
              .as("delta"))
          .orderBy(col("delta"), col("src_a"), col("src_b"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        srctot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS ntok
                   FROM counts GROUP BY source),
        top50 AS (
          SELECT t FROM (SELECT t, SUM(c) AS ctot FROM counts GROUP BY t)
          ORDER BY ctot DESC, t LIMIT 50),
        grid AS (
          SELECT top50.t, srctot.source,
            CAST(FLOOR(CAST(COALESCE(c, 0) AS DOUBLE) / ntok * 1e9 + 0.5)
              AS BIGINT) AS fq
          FROM top50 CROSS JOIN srctot
          LEFT JOIN counts ON counts.t = top50.t
            AND counts.source = srctot.source),
        stats AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS ns,
            CAST(SUM(fq) AS BIGINT) AS sfq,
            SUM(CAST(fq AS HUGEINT) * fq) AS sqq
          FROM grid GROUP BY t),
        stats2 AS (
          SELECT t, CAST(sfq AS DOUBLE) / CAST(ns AS DOUBLE) AS meanf,
            SQRT((CAST(sqq AS DOUBLE) - CAST(sfq AS DOUBLE) * CAST(sfq AS DOUBLE)
                  / CAST(ns AS DOUBLE)) / CAST(ns - 1 AS DOUBLE)) AS sd
          FROM stats),
        z AS (
          SELECT grid.t, source,
            (CAST(fq AS DOUBLE) - meanf) / sd AS z
          FROM grid JOIN stats2 ON stats2.t = grid.t
          WHERE sd > 0),
        pairs AS (
          SELECT a.source AS src_a, b.source AS src_b,
            CAST(SUM(CAST(FLOOR(ABS(a.z - b.z) * 1e9 + 0.5) AS BIGINT))
              AS BIGINT) AS sdq,
            CAST(COUNT(*) AS BIGINT) AS nt
          FROM z a JOIN z b ON a.t = b.t AND a.source < b.source
          GROUP BY a.source, b.source),
        top AS (
          SELECT * FROM pairs ORDER BY sdq, src_a, src_b LIMIT 10)
        SELECT src_a, src_b,
          FLOOR((CAST(sdq AS DOUBLE) / 1e9 / CAST(nt AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS delta
        FROM top ORDER BY delta, src_a, src_b"""),
      "Burrows' Delta stylometric distance over the top-50 corpus tokens: 10 closest source pairs (ppb-quantized rates, nano-quantized |dz| sums)"),

    // ---------------------------------------------------------------- q280
    // Last-touch attribution: each purchase is credited to the user's
    // most recent NON-purchase event within the preceding 30 minutes
    // (IGNORE-NULLS carry-forward over one per-user window — no
    // self-join); purchases with no qualifying touch report as
    // '(none)'. The output is the channel-credit table a marketing
    // pipeline reads. One keyed window pass; the credit rollup is
    // event-type-bounded.
    Query(
      "q280_last_touch",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("attr_us",
            last(when(col("event_type") =!= "purchase", col("us")), ignoreNulls = true)
              .over(w))
          .withColumn("attr_type",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(
            when(col("attr_us").isNotNull &&
              col("us") - col("attr_us") <= 1800000000L, col("attr_type"))
              .otherwise(lit("(none)")).as("attributed_type"))
        val tot = purch.agg(count(lit(1)).as("n_purch"))
        purch.groupBy(col("attributed_type"))
          .agg(count(lit(1)).as("n_credited"))
          .crossJoin(broadcast(tot))
          .select(col("attributed_type"), col("n_credited"),
            Num.r4(col("n_credited").cast("double") / col("n_purch").cast("double"))
              .as("credit_share"))
          .orderBy(col("attributed_type"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us,
            LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
              IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_us,
            LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
              IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_type
          FROM events),
        purch AS (
          SELECT CASE WHEN attr_us IS NOT NULL AND us - attr_us <= 1800000000
            THEN attr_type ELSE '(none)' END AS attributed_type
          FROM ev WHERE event_type = 'purchase'),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_purch FROM purch)
        SELECT attributed_type, CAST(COUNT(*) AS BIGINT) AS n_credited,
          FLOOR((CAST(COUNT(*) AS DOUBLE) / n_purch) * 10000 + 0.500001) / 10000
            AS credit_share
        FROM purch CROSS JOIN tot
        GROUP BY attributed_type, n_purch ORDER BY attributed_type"""),
      "Last-touch attribution: purchases credited to the most recent non-purchase event within 30 min (IGNORE-NULLS carry-forward, no self-join)"),

    // ---------------------------------------------------------------- q281
    // Signup→purchase conversion: rate plus p50/p95 conversion lag in
    // minutes, the lag percentiles as exact integer ranks over the
    // bounded minute histogram (q223's discipline — no raw-row global
    // sort). First signup per user, first purchase at-or-after it.
    Query(
      "q281_conversion_lag",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("signup", "purchase"))
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val su = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("us")).as("s_us"))
        val pu = ev.filter(col("event_type") === "purchase")
          .join(su, Seq("user_id"))
          .filter(col("us") >= col("s_us"))
          .groupBy(col("user_id")).agg(min(col("us") - col("s_us")).as("lag_us"))
        val nSign = su.agg(count(lit(1)).as("n_signups"))
        val hist = pu.groupBy(expr("lag_us div 60000000").as("bm"))
          .agg(count(lit(1)).as("cnt"))
        val nConv = pu.agg(count(lit(1)).as("n_conv"))
        val wB = Window.orderBy(col("bm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("cnt")).over(wB))
          .crossJoin(broadcast(nConv))
        val p50 = cum.filter(col("cum") >= expr("(n_conv + 1) div 2"))
          .agg(min(col("bm")).as("p50_lag_min"))
        val p95 = cum.filter(Exact.ceilRank(col("cum"), 95, "n_conv"))
          .agg(min(col("bm")).as("p95_lag_min"))
        nSign.crossJoin(broadcast(nConv)).crossJoin(broadcast(p50))
          .crossJoin(broadcast(p95))
          .select(col("n_signups"), col("n_conv").as("n_converted"),
            Num.r4(col("n_conv").cast("double") / col("n_signups").cast("double"))
              .as("conv_rate"),
            col("p50_lag_min"), col("p95_lag_min"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us
          FROM events WHERE event_type IN ('signup', 'purchase')),
        su AS (SELECT user_id, MIN(us) AS s_us FROM ev
               WHERE event_type = 'signup' GROUP BY user_id),
        pu AS (
          SELECT ev.user_id, MIN(us - s_us) AS lag_us
          FROM ev JOIN su ON su.user_id = ev.user_id
          WHERE event_type = 'purchase' AND us >= s_us
          GROUP BY ev.user_id),
        nsign AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signups FROM su),
        nconv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_conv FROM pu),
        hist AS (
          SELECT lag_us // 60000000 AS bm, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM pu GROUP BY lag_us // 60000000),
        cum AS (
          SELECT bm, SUM(cnt) OVER (ORDER BY bm
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        p50 AS (SELECT CAST(MIN(bm) AS BIGINT) AS p50_lag_min
                FROM cum CROSS JOIN nconv WHERE cum >= (n_conv + 1) // 2),
        p95 AS (SELECT CAST(MIN(bm) AS BIGINT) AS p95_lag_min
                FROM cum CROSS JOIN nconv WHERE cum >= (95 * n_conv + 99) // 100)
        SELECT n_signups, n_conv AS n_converted,
          FLOOR((CAST(n_conv AS DOUBLE) / n_signups) * 10000 + 0.500001) / 10000
            AS conv_rate,
          p50_lag_min, p95_lag_min
        FROM nsign CROSS JOIN nconv CROSS JOIN p50 CROSS JOIN p95"""),
      "Signup-to-purchase conversion rate + p50/p95 lag minutes (exact ranks over the bounded minute histogram)")
  )
}
