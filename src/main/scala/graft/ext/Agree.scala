package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Agreement/goodness-of-fit continuation, batch 35: Fleiss' κ,
  * Anderson–Darling, and the energy distance. The AD rank weights and
  * both energy pairwise-|diff| sums are assembled EXACTLY from
  * cumulative histogram identities — Σ(2i−1) over a tied run is
  * t(2a+t), and Σ|x−y| over all pairs is a prefix-sum expression —
  * so nothing ever touches per-pair rows.
  */
object Agree {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q314
    // Fleiss' κ: the event types act as raters assigning each day a
    // tercile activity rating (per-type exact ceil-rank cuts), and κ
    // asks whether they agree beyond chance. Dense day×type grid,
    // exact integer category counts, quantized only at the final
    // P̄/P̄e division.
    Query(
      "q314_fleiss_kappa",
      (s, d) => {
        val cell = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val days = cell.select(col("day")).distinct()
        val grid = cell.select(col("event_type")).distinct()
          .crossJoin(broadcast(days))
          .join(cell, Seq("event_type", "day"), "left")
          .na.fill(0L, Seq("c"))
          .localCheckpoint() // bounded grid: rated twice (cuts, counts)
        // per-type tercile cuts: value at ceil-rank n/3 and 2n/3
        val hist = grid.groupBy(col("event_type"), col("c")).agg(count(lit(1)).as("t"))
        val wT = Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ng = grid.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val cum = hist.withColumn("cumt", sum(col("t")).over(wT))
          .join(broadcast(ng), Seq("event_type"))
        val t1 = cum.filter(col("cumt") >= expr("(n + 2) div 3"))
          .groupBy(col("event_type")).agg(min(col("c")).as("cut1"))
        val t2 = cum.filter(col("cumt") >= expr("(2 * n + 2) div 3"))
          .groupBy(col("event_type")).agg(min(col("c")).as("cut2"))
        val rated = grid.join(broadcast(t1), Seq("event_type"))
          .join(broadcast(t2), Seq("event_type"))
          .select(col("day"),
            when(col("c") <= col("cut1"), lit(0))
              .when(col("c") <= col("cut2"), lit(1)).otherwise(lit(2)).as("cat"))
        val nij = rated.groupBy(col("day"), col("cat")).agg(count(lit(1)).as("nij"))
        val k = grid.agg(countDistinct(col("event_type")).as("k"),
          countDistinct(col("day")).as("nd"))
        // P̄ = [Σ_i Σ_j n_ij² − N·k] / (N·k(k−1)); P̄e = Σ_j (Σ_i n_ij / (N·k))²
        val sums = nij.agg(
          Exact.m2("nij", "nij").as("s2"))
        val pj = nij.groupBy(col("cat")).agg(sum(col("nij")).as("cj"))
          .crossJoin(broadcast(k))
          .select(floor((col("cj").cast("double") /
            (col("nd").cast("double") * col("k").cast("double"))) *
            (col("cj").cast("double") /
              (col("nd").cast("double") * col("k").cast("double")))
            * lit(1e12) + lit(0.5)).cast("long").as("pj2q"))
          .agg(sum(col("pj2q")).as("peq"))
        sums.crossJoin(broadcast(k)).crossJoin(broadcast(pj))
          .select(col("nd").as("n_days"), col("k").as("n_raters"),
            Num.r4((
              (col("s2").cast("double") -
                col("nd").cast("double") * col("k").cast("double")) /
              (col("nd").cast("double") * col("k").cast("double") *
                (col("k").cast("double") - lit(1.0))) -
              col("peq").cast("double") / lit(1e12)) /
              (lit(1.0) - col("peq").cast("double") / lit(1e12)))
              .as("fleiss_kappa"))
      },
      Some("""
        WITH cell AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        grid AS (
          SELECT t.event_type, dd.day, COALESCE(c, 0) AS c
          FROM (SELECT DISTINCT event_type FROM cell) t
          CROSS JOIN (SELECT DISTINCT day FROM cell) dd
          LEFT JOIN cell ON cell.event_type = t.event_type
            AND cell.day = dd.day),
        hist AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS t
                 FROM grid GROUP BY event_type, c),
        ng AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
               FROM grid GROUP BY event_type),
        cum AS (
          SELECT event_type, c, n,
            SUM(t) OVER (PARTITION BY event_type ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumt
          FROM hist JOIN ng USING (event_type)),
        t1 AS (SELECT event_type, CAST(MIN(c) AS BIGINT) AS cut1
               FROM cum WHERE cumt >= (n + 2) // 3 GROUP BY event_type),
        t2 AS (SELECT event_type, CAST(MIN(c) AS BIGINT) AS cut2
               FROM cum WHERE cumt >= (2 * n + 2) // 3 GROUP BY event_type),
        rated AS (
          SELECT day, CASE WHEN c <= cut1 THEN 0
            WHEN c <= cut2 THEN 1 ELSE 2 END AS cat
          FROM grid JOIN t1 USING (event_type) JOIN t2 USING (event_type)),
        nij AS (SELECT day, cat, CAST(COUNT(*) AS BIGINT) AS nij
                FROM rated GROUP BY day, cat),
        kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
                 CAST(COUNT(DISTINCT day) AS BIGINT) AS nd FROM grid),
        sums AS (SELECT SUM(CAST(nij AS HUGEINT) * nij) AS s2 FROM nij),
        pj AS (
          SELECT CAST(SUM(CAST(FLOOR(
              (CAST(cj AS DOUBLE) / (nd * CAST(k AS DOUBLE))) *
              (CAST(cj AS DOUBLE) / (nd * CAST(k AS DOUBLE)))
              * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS peq
          FROM (SELECT cat, CAST(SUM(nij) AS BIGINT) AS cj
                FROM nij GROUP BY cat) c
          CROSS JOIN kk)
        SELECT nd AS n_days, k AS n_raters,
          FLOOR((((CAST(s2 AS DOUBLE) - CAST(nd AS DOUBLE) * k) /
                  (CAST(nd AS DOUBLE) * k * (CAST(k AS DOUBLE) - 1.0)) -
                  CAST(peq AS DOUBLE) / 1e12) /
                 (1.0 - CAST(peq AS DOUBLE) / 1e12))
                * 10000 + 0.500001) / 10000 AS fleiss_kappa
        FROM sums CROSS JOIN kk CROSS JOIN pj"""),
      "Fleiss' kappa: event types rate days by per-type activity terciles; exact category counts, chance-corrected"),

    // ---------------------------------------------------------------- q315
    // Anderson–Darling test of the exponential fit to inter-event
    // gaps (pooled, minute midpoints): the tail-weighted companion to
    // q277's KS. The rank weights over each tied run come from the
    // exact identities Σ(2i−1) = t(2a+t) and Σ(2(n+1−i)−1) =
    // t(2(n−a)−t) on the cumulative histogram — per-observation order
    // statistics without per-row sorting. ln terms nano-quantized,
    // products in DECIMAL.
    Query(
      "q315_anderson_darling",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val hist = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(expr("gap div 60000000").as("m"))
          .groupBy(col("m")).agg(count(lit(1)).as("t"))
          .withColumn("x", col("m").cast("double") + lit(0.5))
        val mo = hist.agg(sum(col("t")).as("n"),
          sum(col("x") * col("t").cast("double")).as("sx"))
        val wM = Window.orderBy(col("m"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("a", sum(col("t")).over(wM) - col("t"))
        val terms = cum.crossJoin(broadcast(mo))
          // λ = n / Σx; F = 1 − exp(−λx)
          .withColumn("lf",
            floor(log(lit(1.0) - exp(-(col("n").cast("double") / col("sx")) *
              col("x"))) * lit(1e9) + lit(0.5)).cast("long"))
          .withColumn("ls",
            floor((-(col("n").cast("double") / col("sx")) * col("x"))
              * lit(1e9) + lit(0.5)).cast("long")) // ln(1−F) = −λx exactly
          .select(col("n"),
            ((col("t") * (lit(2L) * col("a") + col("t"))).cast("decimal(38,0)") *
              col("lf") +
              (col("t") * (lit(2L) * (col("n") - col("a")) - col("t")))
                .cast("decimal(38,0)") * col("ls")).as("term"))
          .groupBy(col("n")).agg(sum(col("term")).as("st"))
        terms.select(col("n").as("n_gaps"),
          Num.r4(-col("n").cast("double") -
            col("st").cast("double") / lit(1e9) / col("n").cast("double"))
            .as("ad_stat"))
      },
      Some("""
        WITH hist AS (
          SELECT m, CAST(COUNT(*) AS BIGINT) AS t, CAST(m AS DOUBLE) + 0.5 AS x
          FROM (
            SELECT gap // 60000000 AS m FROM (
              SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap
              FROM events)
            WHERE gap IS NOT NULL)
          GROUP BY m),
        mo AS (SELECT CAST(SUM(t) AS BIGINT) AS n, SUM(x * t) AS sx FROM hist),
        cum AS (
          SELECT m, t, x,
            SUM(t) OVER (ORDER BY m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t AS a
          FROM hist),
        terms AS (
          SELECT n,
            SUM(CAST(t * (2 * a + t) AS HUGEINT) *
                CAST(FLOOR(LN(1.0 - EXP(-(CAST(n AS DOUBLE) / sx) * x))
                  * 1e9 + 0.5) AS BIGINT) +
                CAST(t * (2 * (n - a) - t) AS HUGEINT) *
                CAST(FLOOR((-(CAST(n AS DOUBLE) / sx) * x) * 1e9 + 0.5)
                  AS BIGINT)) AS st
          FROM cum CROSS JOIN mo GROUP BY n)
        SELECT n AS n_gaps,
          FLOOR((-CAST(n AS DOUBLE) - CAST(st AS DOUBLE) / 1e9 / n)
                * 10000 + 0.500001) / 10000 AS ad_stat
        FROM terms"""),
      "Anderson-Darling exponential goodness-of-fit on pooled gap minutes (exact tied-run rank weights, no row sort)"),

    // ---------------------------------------------------------------- q316
    // Energy distance between English and non-English document
    // lengths: D² = 2E|X−Y| − E|X−X'| − E|Y−Y'|, with every pairwise
    // |difference| sum computed EXACTLY from the sorted value
    // histogram's prefix sums (Σ_pairs |x−y| = Σ_v c_v(v·cnt_below −
    // sum_below) doubled) — the distribution-shape companion to
    // q289's pure-dominance delta. Plus the test statistic
    // (nm/(n+m))·D².
    Query(
      "q316_energy_distance",
      (s, d) => {
        val hist = Tables.documents(s, d)
          .select((col("lang") === "en").as("isa"), col("n_chars").as("v"))
          .groupBy(col("v"))
          .agg(count(when(col("isa"), 1)).as("ca"),
            count(when(!col("isa"), 1)).as("cb"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cna", sum(col("ca")).over(wV) - col("ca"))
          .withColumn("cnb", sum(col("cb")).over(wV) - col("cb"))
          .withColumn("csa", Exact.m2("ca", "v")
            .over(wV) - col("ca").cast("decimal(38,0)") * col("v"))
          .withColumn("csb", Exact.m2("cb", "v")
            .over(wV) - col("cb").cast("decimal(38,0)") * col("v"))
        // Σ_pairs |x−y| between group g1 at value v and all LOWER g2
        // values: c1_v·(v·cnt2_below − sum2_below); summing this over
        // v for (A vs B) + (B vs A) + within pairs covers every pair
        // exactly once
        val sums = cum.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca").cast("decimal(38,0)") *
            (col("cnb").cast("decimal(38,0)") * col("v") - col("csb"))).as("dab1"),
          sum(col("cb").cast("decimal(38,0)") *
            (col("cna").cast("decimal(38,0)") * col("v") - col("csa"))).as("dab2"),
          sum(col("ca").cast("decimal(38,0)") *
            (col("cna").cast("decimal(38,0)") * col("v") - col("csa"))).as("daa"),
          sum(col("cb").cast("decimal(38,0)") *
            (col("cnb").cast("decimal(38,0)") * col("v") - col("csb"))).as("dbb"))
        sums.select(col("na").as("n_en"), col("nb").as("n_other"),
            ((col("dab1").cast("double") + col("dab2").cast("double")) /
              (col("na").cast("double") * col("nb").cast("double"))).as("exy"),
            (lit(2.0) * col("daa").cast("double") /
              (col("na").cast("double") * col("na").cast("double"))).as("exx"),
            (lit(2.0) * col("dbb").cast("double") /
              (col("nb").cast("double") * col("nb").cast("double"))).as("eyy"))
          .select(col("n_en"), col("n_other"),
            Num.r4(col("exy")).as("e_xy"),
            Num.r4(lit(2.0) * col("exy") - col("exx") - col("eyy"))
              .as("energy_d2"),
            Num.r4((col("n_en").cast("double") * col("n_other").cast("double") /
              (col("n_en").cast("double") + col("n_other").cast("double"))) *
              (lit(2.0) * col("exy") - col("exx") - col("eyy")))
              .as("energy_stat"))
      },
      Some("""
        WITH hist AS (
          SELECT n_chars AS v,
            CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE lang <> 'en') AS BIGINT) AS cb
          FROM documents GROUP BY n_chars),
        cum AS (
          SELECT v, ca, cb,
            SUM(ca) OVER w - ca AS cna,
            SUM(cb) OVER w - cb AS cnb,
            SUM(CAST(ca AS HUGEINT) * v) OVER w - CAST(ca AS HUGEINT) * v AS csa,
            SUM(CAST(cb AS HUGEINT) * v) OVER w - CAST(cb AS HUGEINT) * v AS csb
          FROM hist
          WINDOW w AS (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        sums AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
            SUM(CAST(ca AS HUGEINT) * (CAST(cnb AS HUGEINT) * v - csb)) AS dab1,
            SUM(CAST(cb AS HUGEINT) * (CAST(cna AS HUGEINT) * v - csa)) AS dab2,
            SUM(CAST(ca AS HUGEINT) * (CAST(cna AS HUGEINT) * v - csa)) AS daa,
            SUM(CAST(cb AS HUGEINT) * (CAST(cnb AS HUGEINT) * v - csb)) AS dbb
          FROM cum),
        e AS (
          SELECT na, nb,
            (CAST(dab1 AS DOUBLE) + CAST(dab2 AS DOUBLE)) /
              (CAST(na AS DOUBLE) * nb) AS exy,
            2.0 * CAST(daa AS DOUBLE) / (CAST(na AS DOUBLE) * na) AS exx,
            2.0 * CAST(dbb AS DOUBLE) / (CAST(nb AS DOUBLE) * nb) AS eyy
          FROM sums)
        SELECT na AS n_en, nb AS n_other,
          FLOOR(exy * 10000 + 0.500001) / 10000 AS e_xy,
          FLOOR((2.0 * exy - exx - eyy) * 10000 + 0.500001) / 10000
            AS energy_d2,
          FLOOR(((CAST(na AS DOUBLE) * nb / (na + nb)) *
                 (2.0 * exy - exx - eyy)) * 10000 + 0.500001) / 10000
            AS energy_stat
        FROM e"""),
      "Energy distance between en and other doc-length distributions (exact prefix-sum pairwise |diff| sums)"),

    // ---------------------------------------------------------------- q396
    // Cronbach's α of the weekly activity profile: complete calendar
    // weeks are the subjects, the 7 weekdays are the items — "do the
    // weekdays move together across weeks" as an internal-consistency
    // number (α near 1 ⇒ weeks differ mostly in overall level, the
    // one-factor story; α near 0 ⇒ weekdays fluctuate independently).
    // The reliability complement to Kendall's W (q302, rank
    // concordance) and the weekday ANOVA (q342, mean differences).
    // α = k/(k−1)·(1 − Σσ²ⱼ/σ²_T) where every variance rides the
    // SAME cleared denominator m·Σx²−(Σx)², so α is a ratio of exact
    // DECIMAL/HUGEINT integers; NULL when the total variance is 0.
    Query(
      "q396_cronbach_alpha",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("dy"))
          .groupBy(expr("dy div 7").as("w"), expr("dy % 7").as("wd"))
          .agg(count(lit(1)).as("y"))
        val full = cells.groupBy(col("w")).agg(count(lit(1)).as("nd"))
          .filter(col("nd") === 7).select(col("w")).localCheckpoint()
        val kept = cells.join(full, Seq("w"))
        val item = kept.groupBy(col("wd"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("s1"),
            Exact.m2("y", "y").as("s2"))
          .select(col("m"),
            (col("m") * col("s2") - col("s1").cast("decimal(38,0)") * col("s1"))
              .as("aj"))
        val totals = kept.groupBy(col("w")).agg(sum(col("y")).as("t"))
          .agg(count(lit(1)).as("m2"), sum(col("t")).as("st"),
            Exact.m2("t", "t").as("st2"))
          .select(col("m2"),
            (col("m2") * col("st2") - col("st").cast("decimal(38,0)") * col("st"))
              .as("at"))
        item.agg(max(col("m")).as("n_weeks"), sum(col("aj")).as("saj"))
          .crossJoin(broadcast(totals))
          .select(col("n_weeks"),
            when(col("at") === 0, lit(null).cast("double"))
              .otherwise(Num.r4(lit(7.0) / lit(6.0)
                * (lit(1.0) - col("saj").cast("double")
                  / col("at").cast("double")))).as("cronbach_alpha"))
      },
      Some("""
        WITH cells AS (
          SELECT dy // 7 AS w, dy % 7 AS wd, CAST(COUNT(*) AS BIGINT) AS y
          FROM (SELECT epoch_us(ts) // 86400000000 AS dy FROM events)
          GROUP BY dy // 7, dy % 7),
        full_w AS (
          SELECT w FROM cells GROUP BY w HAVING COUNT(*) = 7),
        kept AS (SELECT c.* FROM cells c JOIN full_w USING (w)),
        item AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
            COUNT(*) * SUM(CAST(y AS HUGEINT) * y)
              - CAST(SUM(y) AS HUGEINT) * SUM(y) AS aj
          FROM kept GROUP BY wd),
        totals AS (
          SELECT COUNT(*) * SUM(CAST(t AS HUGEINT) * t)
              - CAST(SUM(t) AS HUGEINT) * SUM(t) AS at
          FROM (SELECT w, CAST(SUM(y) AS BIGINT) AS t FROM kept GROUP BY w)),
        agg AS (
          SELECT CAST(MAX(m) AS BIGINT) AS n_weeks, SUM(aj) AS saj FROM item)
        SELECT n_weeks,
          CASE WHEN at = 0 THEN NULL
               ELSE FLOOR((7.0 / 6.0 * (1.0 - CAST(saj AS DOUBLE)
                           / CAST(at AS DOUBLE))) * 10000 + 0.500001) / 10000
          END AS cronbach_alpha
        FROM agg CROSS JOIN totals"""),
      "Cronbach's alpha of the weeks x weekdays activity matrix: cleared-denominator exact integer item/total variances, NULL on zero total variance")
  )
}
