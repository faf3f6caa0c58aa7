package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence/language-model continuation, batch 31: interpolated
  * Kneser–Ney bigram scoring, trigram motif lift under the
  * first-order chain, a batch Page–Hinkley drift profile, and
  * Kendall's W concordance. Exactness: every LM probability is a
  * rational of exact integer counts evaluated identically on both
  * engines, −ln p is nano-quantized per bigram BEFORE the weighted
  * DECIMAL sum, and rank statistics reuse the 2·midrank integer
  * discipline.
  */
object Motifs {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q299
    // Interpolated Kneser–Ney (D = 0.75) bigram negative log
    // likelihood and perplexity per source, scored with the GLOBAL
    // corpus LM — the standard "which shard reads like the corpus"
    // smoothing upgrade over q163's raw bigram NLL and q240's stupid
    // backoff. One token pass builds all four count tables; the eval
    // join is per distinct (source, bigram) weighted by its count.
    Query(
      "q299_kneser_ney",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            posexplode(split(col("text"), " ")))
          .toDF("doc_id", "source", "pos", "w")
        val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val big = toks.withColumn("w2", lead(col("w"), 1).over(wD))
          .filter(col("w2").isNotNull)
          .select(col("source"), col("w").as("w1"), col("w2"))
          .localCheckpoint() // feeds LM counts and per-source eval
        val cBig = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
          .localCheckpoint()
        val cCtx = cBig.groupBy(col("w1"))
          .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1fwd"))
        val cCont = cBig.groupBy(col("w2")).agg(count(lit(1)).as("n1bwd"))
        val nTypes = cBig.agg(count(lit(1)).as("nt"))
        val evalB = big.groupBy(col("source"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("ns"))
          .join(cBig, Seq("w1", "w2"))
          .join(cCtx, Seq("w1"))
          .join(cCont, Seq("w2"))
          .crossJoin(broadcast(nTypes))
          // P = max(c12-D,0)/c1 + D*n1fwd/c1 * n1bwd/nt, D = 3/4
          .select(col("source"), col("ns"),
            floor(-log(
              greatest(col("c12").cast("double") - lit(0.75), lit(0.0)) /
                col("c1").cast("double") +
              lit(0.75) * col("n1fwd").cast("double") / col("c1").cast("double") *
                col("n1bwd").cast("double") / col("nt").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long").as("nllq"))
        evalB.groupBy(col("source"))
          .agg(sum(col("ns")).as("n_bigrams"),
            Exact.m2("ns", "nllq").as("snll"))
          .select(col("source"), col("n_bigrams"),
            Num.r6(col("snll").cast("double") / lit(1e9) /
              col("n_bigrams").cast("double")).as("kn_nll"),
            Num.r4(exp(col("snll").cast("double") / lit(1e9) /
              col("n_bigrams").cast("double"))).as("kn_ppl"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source,
            UNNEST(string_split(text, ' ')) AS w,
            UNNEST(GENERATE_SERIES(1, LEN(string_split(text, ' ')))) AS pos
          FROM documents),
        big AS (
          SELECT source, w AS w1, w2 FROM (
            SELECT source, w,
              LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks)
          WHERE w2 IS NOT NULL),
        cbig AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                 FROM big GROUP BY w1, w2),
        cctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1fwd FROM cbig GROUP BY w1),
        ccont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1bwd
                  FROM cbig GROUP BY w2),
        ntypes AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM cbig),
        evalb AS (
          SELECT source, ns,
            CAST(FLOOR(-LN(
              GREATEST(CAST(c12 AS DOUBLE) - 0.75, 0.0) / c1 +
              0.75 * CAST(n1fwd AS DOUBLE) / c1 *
                CAST(n1bwd AS DOUBLE) / nt) * 1e9 + 0.5) AS BIGINT) AS nllq
          FROM (SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS ns
                FROM big GROUP BY source, w1, w2) e
          JOIN cbig USING (w1, w2) JOIN cctx USING (w1) JOIN ccont USING (w2)
          CROSS JOIN ntypes)
        SELECT source, CAST(SUM(ns) AS BIGINT) AS n_bigrams,
          FLOOR((CAST(SUM(CAST(ns AS HUGEINT) * nllq) AS DOUBLE) / 1e9 /
                 CAST(SUM(ns) AS DOUBLE)) * 1000000 + 0.500001) / 1000000
            AS kn_nll,
          FLOOR(EXP(CAST(SUM(CAST(ns AS HUGEINT) * nllq) AS DOUBLE) / 1e9 /
                    CAST(SUM(ns) AS DOUBLE)) * 10000 + 0.500001) / 10000
            AS kn_ppl
        FROM evalb GROUP BY source ORDER BY source"""),
      "Interpolated Kneser-Ney (D=0.75) bigram NLL + perplexity per source under the global corpus LM"),

    // ---------------------------------------------------------------- q300
    // Trigram motifs: which 3-step journeys occur far more often than
    // the first-order Markov chain predicts? expected(a,b,c) =
    // n_ab · n_bc / n_b· — all exact integer counts from two lead
    // windows; lift is micro-quantized for a deterministic top-20.
    // Min support 5. The "surprising funnel" detector on top of
    // q111's one-step matrix.
    Query(
      "q300_trigram_motifs",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type").as("a"),
            unix_micros(col("ts")).as("us"))
          .withColumn("b", lead(col("a"), 1).over(w))
          .withColumn("c", lead(col("a"), 2).over(w))
        val tri = ev.filter(col("c").isNotNull)
          .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("obs"))
          .filter(col("obs") >= 5)
        val bg = ev.filter(col("b").isNotNull)
          .groupBy(col("a").as("x"), col("b").as("y")).agg(count(lit(1)).as("nxy"))
          .localCheckpoint()
        val mid = bg.groupBy(col("x")).agg(sum(col("nxy")).as("nx"))
        tri
          .join(broadcast(bg.select(col("x").as("a"), col("y").as("b"),
            col("nxy").as("nab"))), Seq("a", "b"))
          .join(broadcast(bg.select(col("x").as("b"), col("y").as("c"),
            col("nxy").as("nbc"))), Seq("b", "c"))
          .join(broadcast(mid.select(col("x").as("b"), col("nx").as("nb"))), Seq("b"))
          .select(col("a"), col("b"), col("c"), col("obs"),
            floor(col("obs").cast("double") * col("nb").cast("double") /
              (col("nab").cast("double") * col("nbc").cast("double"))
              * lit(1e6) + lit(0.5)).cast("long").as("liftq"))
          .orderBy(col("liftq").desc, col("a"), col("b"), col("c"))
          .limit(20)
          .select(col("a"), col("b"), col("c"), col("obs"),
            (col("liftq").cast("double") / lit(1e6)).as("lift"))
          .orderBy(col("lift").desc, col("a"), col("b"), col("c"))
      },
      Some("""
        WITH ev AS (
          SELECT event_type AS a,
            LEAD(event_type, 1) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS b,
            LEAD(event_type, 2) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS c
          FROM events),
        tri AS (
          SELECT a, b, c, CAST(COUNT(*) AS BIGINT) AS obs
          FROM ev WHERE c IS NOT NULL GROUP BY a, b, c
          HAVING COUNT(*) >= 5),
        bg AS (
          SELECT a AS x, b AS y, CAST(COUNT(*) AS BIGINT) AS nxy
          FROM ev WHERE b IS NOT NULL GROUP BY a, b),
        mid AS (SELECT x, CAST(SUM(nxy) AS BIGINT) AS nx FROM bg GROUP BY x),
        scored AS (
          SELECT tri.a, tri.b, tri.c, obs,
            CAST(FLOOR(CAST(obs AS DOUBLE) * nb.nx /
              (ab.nxy * CAST(bc.nxy AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
              AS liftq
          FROM tri
          JOIN bg ab ON ab.x = tri.a AND ab.y = tri.b
          JOIN bg bc ON bc.x = tri.b AND bc.y = tri.c
          JOIN mid nb ON nb.x = tri.b),
        top AS (
          SELECT * FROM scored ORDER BY liftq DESC, a, b, c LIMIT 20)
        SELECT a, b, c, obs, CAST(liftq AS DOUBLE) / 1e6 AS lift
        FROM top ORDER BY lift DESC, a, b, c"""),
      "Trigram journey motifs ranked by micro-quantized lift over the first-order Markov expectation (support >= 5)"),

    // ---------------------------------------------------------------- q301
    // Batch Page–Hinkley profile over the daily event-count series:
    // per-day deviation from the RUNNING mean (micro-quantized),
    // cumulative U, and PH_t = U_t − min_{s≤t} U_s; report the peak —
    // the batch twin of the streaming Page–Hinkley detector, over the
    // bounded daily series only.
    Query(
      "q301_page_hinkley",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val wT = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val dev = daily
          .withColumn("t", count(lit(1)).over(wT))
          .withColumn("cx", sum(col("x")).over(wT))
          .withColumn("dq",
            floor((col("x").cast("double") -
              col("cx").cast("double") / col("t").cast("double"))
              * lit(1e6) + lit(0.5)).cast("long"))
        val ph = dev.withColumn("u", sum(col("dq")).over(wT))
          .withColumn("minu", min(col("u")).over(wT))
          .select(col("day"), (col("u") - col("minu")).as("phq"))
        val peak = ph.orderBy(col("phq").desc, col("day")).limit(1)
        val n = daily.agg(count(lit(1)).as("n_days"))
        peak.crossJoin(broadcast(n))
          .select(col("n_days"), col("day").as("peak_day"),
            Num.r6(col("phq").cast("double") / lit(1e6)).as("ph_max"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        dev AS (
          SELECT day, x,
            CAST(FLOOR((CAST(x AS DOUBLE) -
              CAST(SUM(x) OVER w AS DOUBLE) / COUNT(*) OVER w)
              * 1e6 + 0.5) AS BIGINT) AS dq
          FROM daily
          WINDOW w AS (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        uu AS (
          SELECT day,
            SUM(dq) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
          FROM dev),
        ph AS (
          SELECT day,
            u - MIN(u) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS phq
          FROM uu),
        peak AS (SELECT day, phq FROM ph ORDER BY phq DESC, day LIMIT 1),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
        SELECT n_days, day AS peak_day,
          FLOOR((CAST(phq AS DOUBLE) / 1e6) * 1000000 + 0.500001) / 1000000
            AS ph_max
        FROM peak CROSS JOIN n"""),
      "Batch Page-Hinkley drift profile on daily volume: peak PH statistic and its day (running-mean deviations)"),

    // ---------------------------------------------------------------- q302
    // Kendall's W concordance: do the event types agree on which
    // hours of the day are busiest? Rankers = types, items = the 24
    // hours, midranks with ties over the dense (type × hour) grid,
    // tie-corrected W and its chi-square. The multi-ranker companion
    // to q288 on the transposed design.
    Query(
      "q302_kendall_w",
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy(col("event_type"),
            (expr("unix_micros(ts) div 3600000000") % 24).as("hr"))
          .agg(count(lit(1)).as("c"))
        val types = cell.select(col("event_type")).distinct()
        val hours = cell.select(col("hr")).distinct()
        val grid = types.crossJoin(broadcast(hours))
          .join(cell, Seq("event_type", "hr"), "left")
          .na.fill(0L, Seq("c"))
        val wR = Window.partitionBy(col("event_type")).orderBy(col("c"))
        val tie = Window.partitionBy(col("event_type"), col("c"))
        val ranked = grid
          .withColumn("mr2",
            lit(2L) * rank().over(wR) + count(lit(1)).over(tie) - lit(1L))
          .localCheckpoint() // bounded grid feeds R_i, tie sums, k, n
        val kn = ranked.agg(countDistinct(col("event_type")).as("k"),
          countDistinct(col("hr")).as("n"))
        val ri = ranked.groupBy(col("hr")).agg(sum(col("mr2")).as("r2i"))
        val ties = ranked.groupBy(col("event_type"), col("mr2"))
          .agg(count(lit(1)).as("t"))
          .agg(sum(col("t").cast("decimal(38,0)") * col("t") * col("t")
            - col("t")).as("tsum"))
        val dev = ri.crossJoin(broadcast(kn))
          .select(col("k"), col("n"),
            // dq = milli-quantized (R_i − k(n+1)/2); R_i = r2i/2
            floor((col("r2i").cast("double") / lit(2.0) -
              col("k").cast("double") * (col("n").cast("double") + lit(1.0)) /
                lit(2.0)) * lit(1e3) + lit(0.5)).cast("long").as("dq"))
          .select(col("k"), col("n"),
            (col("dq").cast("decimal(38,0)") * col("dq")).as("term"))
          .groupBy(col("k"), col("n")).agg(sum(col("term")).as("ssdev"))
        dev.crossJoin(broadcast(ties))
          .select(col("k").as("n_rankers"), col("n").as("n_items"),
            Num.r4(lit(12.0) * col("ssdev").cast("double") / lit(1e6) /
              (col("k").cast("double") * col("k").cast("double") *
                (col("n").cast("double") * col("n").cast("double") *
                  col("n").cast("double") - col("n").cast("double")) -
                col("k").cast("double") * col("tsum").cast("double")))
              .as("kendall_w"),
            Num.r4(col("k").cast("double") * (col("n").cast("double") - lit(1.0)) *
              (lit(12.0) * col("ssdev").cast("double") / lit(1e6) /
                (col("k").cast("double") * col("k").cast("double") *
                  (col("n").cast("double") * col("n").cast("double") *
                    col("n").cast("double") - col("n").cast("double")) -
                  col("k").cast("double") * col("tsum").cast("double"))))
              .as("chi2_w"))
      },
      Some("""
        WITH cell AS (
          SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        grid AS (
          SELECT t.event_type, h.hr, COALESCE(c, 0) AS c
          FROM (SELECT DISTINCT event_type FROM cell) t
          CROSS JOIN (SELECT DISTINCT hr FROM cell) h
          LEFT JOIN cell ON cell.event_type = t.event_type
            AND cell.hr = h.hr),
        ranked AS (
          SELECT event_type, hr,
            2 * RANK() OVER (PARTITION BY event_type ORDER BY c)
              + COUNT(*) OVER (PARTITION BY event_type, c) - 1 AS mr2
          FROM grid),
        kn AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                 CAST(COUNT(DISTINCT hr) AS BIGINT) AS n FROM ranked),
        ri AS (SELECT hr, CAST(SUM(mr2) AS BIGINT) AS r2i
               FROM ranked GROUP BY hr),
        tie AS (
          SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tsum FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS t
            FROM ranked GROUP BY event_type, mr2)),
        dev AS (
          SELECT k, n,
            SUM(CAST(FLOOR((CAST(r2i AS DOUBLE) / 2.0
                  - CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
                  * 1e3 + 0.5) AS HUGEINT)
                * CAST(FLOOR((CAST(r2i AS DOUBLE) / 2.0
                  - CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
                  * 1e3 + 0.5) AS HUGEINT)) AS ssdev
          FROM ri CROSS JOIN kn GROUP BY k, n)
        SELECT k AS n_rankers, n AS n_items,
          FLOOR((12.0 * CAST(ssdev AS DOUBLE) / 1e6 /
                 (CAST(k AS DOUBLE) * k *
                  (CAST(n AS DOUBLE) * n * n - n) - k * CAST(tsum AS DOUBLE)))
                * 10000 + 0.500001) / 10000 AS kendall_w,
          FLOOR((CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) *
                 (12.0 * CAST(ssdev AS DOUBLE) / 1e6 /
                  (CAST(k AS DOUBLE) * k *
                   (CAST(n AS DOUBLE) * n * n - n) - k * CAST(tsum AS DOUBLE))))
                * 10000 + 0.500001) / 10000 AS chi2_w
        FROM dev CROSS JOIN tie"""),
      "Kendall's W concordance of event types ranking the 24 hours (midrank ties, tie-corrected, with chi-square)")
  )
}
