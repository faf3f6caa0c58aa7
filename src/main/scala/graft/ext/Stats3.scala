package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical-testing continuation, batch 27: lexical concentration
  * (Yule's K), histogram-based outlier scoring, and three classic
  * nonparametric tests (Kruskal–Wallis, Brown–Forsythe, Kendall
  * tau-b) a corpus-quality pipeline runs across sources. Exactness
  * discipline as established: every rank/deviation is quantized to an
  * integer BEFORE any cross-row sum, wide sums ride DECIMAL/HUGEINT,
  * and LN/SQRT are applied to identical doubles on both engines.
  */
object Stats3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q282
    // Yule's characteristic K per source — the classic repeated-
    // vocabulary concentration statistic (K = 1e4·(Σc²−N)/N²), a
    // stylometric companion to q279's Burrows Delta. One token pass;
    // Σc² rides DECIMAL/HUGEINT so 100 TB token counts cannot
    // overflow; the final expression is a scalar double from exact
    // integers, identical on both engines.
    Query(
      "q282_yules_k",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            Exact.m2("c", "c").as("s2"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            Num.r6(lit(1e4) *
              (col("s2").cast("double") - col("n_tokens").cast("double")) /
              (col("n_tokens").cast("double") * col("n_tokens").cast("double")))
              .as("yules_k"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t)
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) AS BIGINT) AS vocab,
          FLOOR((1e4 * (CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
                        - CAST(SUM(c) AS DOUBLE))
                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS yules_k
        FROM counts GROUP BY source ORDER BY source"""),
      "Yule's K lexical concentration per source (DECIMAL 2nd moment, exact-integer inputs to the scalar formula)"),

    // ---------------------------------------------------------------- q283
    // HBOS (histogram-based outlier score) over events: two
    // independent feature histograms — 20 equal-width value bins and
    // 24 hour-of-day bins — score = −ln p(vbin) − ln p(hr); top 20.
    // Unsupervised outlier scoring at corpus scale with no all-pairs
    // term: two O(n) histogram passes plus two broadcast joins. The
    // score is micro-quantized before the top-k order so ties resolve
    // by event_id deterministically.
    Query(
      "q283_hbos",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("value"),
            (expr("unix_micros(ts) div 3600000000") % 24).as("hr"))
        val rng = ev.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"),
          count(lit(1)).as("n"))
        val binned = ev.crossJoin(broadcast(rng))
          .withColumn("vbin",
            when(col("vmax") > col("vmin"),
              least(floor((col("value") - col("vmin")) /
                (col("vmax") - col("vmin")) * lit(20.0)), lit(19.0)))
              .otherwise(lit(0.0)).cast("long"))
        val hv = binned.groupBy(col("vbin")).agg(count(lit(1)).as("cv"))
        val hh = binned.groupBy(col("hr")).agg(count(lit(1)).as("ch"))
        binned.join(broadcast(hv), Seq("vbin"))
          .join(broadcast(hh), Seq("hr"))
          .select(col("event_id"), col("vbin"), col("hr"),
            floor((-log(col("cv").cast("double") / col("n").cast("double"))
              - log(col("ch").cast("double") / col("n").cast("double")))
              * lit(1e6) + lit(0.5)).cast("long").as("scoreq"))
          .orderBy(col("scoreq").desc, col("event_id"))
          .limit(20)
          .select(col("event_id"), col("vbin"), col("hr"),
            (col("scoreq").cast("double") / lit(1e6)).as("hbos_score"))
          .orderBy(col("hbos_score").desc, col("event_id"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id, value,
            (epoch_us(ts) // 3600000000) % 24 AS hr
          FROM events),
        rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax,
                  CAST(COUNT(*) AS BIGINT) AS n FROM ev),
        binned AS (
          SELECT event_id, hr,
            CAST(CASE WHEN vmax > vmin
              THEN LEAST(FLOOR((value - vmin) / (vmax - vmin) * 20.0), 19.0)
              ELSE 0.0 END AS BIGINT) AS vbin, n
          FROM ev CROSS JOIN rng),
        hv AS (SELECT vbin, CAST(COUNT(*) AS BIGINT) AS cv
               FROM binned GROUP BY vbin),
        hh AS (SELECT hr, CAST(COUNT(*) AS BIGINT) AS ch
               FROM binned GROUP BY hr),
        scored AS (
          SELECT event_id, vbin, b.hr,
            CAST(FLOOR((-LN(CAST(cv AS DOUBLE) / n)
                        - LN(CAST(ch AS DOUBLE) / n)) * 1e6 + 0.5) AS BIGINT)
              AS scoreq
          FROM binned b JOIN hv USING (vbin) JOIN hh ON hh.hr = b.hr),
        top AS (
          SELECT * FROM scored ORDER BY scoreq DESC, event_id LIMIT 20)
        SELECT event_id, vbin, hr,
          CAST(scoreq AS DOUBLE) / 1e6 AS hbos_score
        FROM top ORDER BY hbos_score DESC, event_id"""),
      "HBOS histogram-based outlier score (20 value bins x 24 hour bins, micro-quantized -ln p sums, top 20)"),

    // ---------------------------------------------------------------- q284
    // Kruskal–Wallis H across sources on document length: midranks
    // come from the bounded value histogram (2·midrank stays integer
    // — the q281 exact-rank discipline, no raw-row global sort), the
    // per-group deviation (r̄_g − r̄) is micro-quantized and squared
    // in DECIMAL, and the tie correction's Σ(t³−t) rides DECIMAL too.
    // The only global window is over distinct length values (bounded).
    Query(
      "q284_kruskal_wallis",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("source"), col("n_chars").as("v"))
        val cell = docs.groupBy(col("source"), col("v")).agg(count(lit(1)).as("g"))
          .localCheckpoint() // feeds the value histogram and the rank-sum join
        val histv = cell.groupBy(col("v")).agg(sum(col("g")).as("t"))
        val wV = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = histv.withColumn("cum", sum(col("t")).over(wV))
          .select(col("v"), col("t"),
            (lit(2L) * (col("cum") - col("t")) + col("t") + lit(1L)).as("mr2"))
        val grp = cell.join(broadcast(ranked.select(col("v"), col("mr2"))), Seq("v"))
          .groupBy(col("source"))
          .agg(sum(col("g")).as("ng"),
            sum((col("g") * col("mr2")).cast("decimal(38,0)")).as("r2"))
        val tot = grp.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"))
        val terms = grp.crossJoin(broadcast(tot))
          .select(col("ng"), col("n"), col("k"),
            // dq = 1e6-quantized (mean rank of group − grand mean rank)
            floor((col("r2").cast("double") / (lit(2.0) * col("ng").cast("double"))
              - (col("n").cast("double") + lit(1.0)) / lit(2.0))
              * lit(1e6) + lit(0.5)).cast("long").as("dq"))
          .select(col("n"), col("k"),
            (col("dq").cast("decimal(38,0)") * col("dq") * col("ng")).as("term"))
          .groupBy(col("n"), col("k"))
          .agg(sum(col("term")).as("sterm"))
        val ties = histv
          .agg(sum(col("t").cast("decimal(38,0)") * col("t") * col("t")
            - col("t")).as("tie"))
        terms.crossJoin(broadcast(ties))
          .select(col("k").as("n_groups"), col("n").as("n_total"),
            Num.r4(lit(12.0) * col("sterm").cast("double") / lit(1e12) /
              (col("n").cast("double") * (col("n").cast("double") + lit(1.0))))
              .as("h_stat"),
            Num.r4((lit(12.0) * col("sterm").cast("double") / lit(1e12) /
              (col("n").cast("double") * (col("n").cast("double") + lit(1.0)))) /
              (lit(1.0) - col("tie").cast("double") /
                (col("n").cast("double") * col("n").cast("double") *
                  col("n").cast("double") - col("n").cast("double"))))
              .as("h_adj"))
      },
      Some("""
        WITH cell AS (
          SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS g
          FROM documents GROUP BY source, n_chars),
        histv AS (SELECT v, CAST(SUM(g) AS BIGINT) AS t FROM cell GROUP BY v),
        ranked AS (
          SELECT v, t,
            2 * (SUM(t) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t) + t + 1
              AS mr2
          FROM histv),
        grp AS (
          SELECT source, CAST(SUM(g) AS BIGINT) AS ng,
            SUM(CAST(g AS HUGEINT) * mr2) AS r2
          FROM cell JOIN ranked USING (v) GROUP BY source),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS k FROM grp),
        terms AS (
          SELECT n, k,
            SUM(CAST(CAST(FLOOR((CAST(r2 AS DOUBLE) / (2.0 * ng)
                  - (CAST(n AS DOUBLE) + 1.0) / 2.0) * 1e6 + 0.5) AS HUGEINT)
                * CAST(FLOOR((CAST(r2 AS DOUBLE) / (2.0 * ng)
                  - (CAST(n AS DOUBLE) + 1.0) / 2.0) * 1e6 + 0.5) AS HUGEINT)
                * ng AS HUGEINT)) AS sterm
          FROM grp CROSS JOIN tot GROUP BY n, k),
        ties AS (
          SELECT SUM(CAST(t AS HUGEINT) * t * t - t) AS tie FROM histv)
        SELECT k AS n_groups, n AS n_total,
          FLOOR((12.0 * CAST(sterm AS DOUBLE) / 1e12 /
                 (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)))
                * 10000 + 0.500001) / 10000 AS h_stat,
          FLOOR(((12.0 * CAST(sterm AS DOUBLE) / 1e12 /
                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))) /
                 (1.0 - CAST(tie AS DOUBLE) /
                  (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE))))
                * 10000 + 0.500001) / 10000 AS h_adj
        FROM terms CROSS JOIN ties"""),
      "Kruskal-Wallis H across sources on doc length: histogram midranks, DECIMAL deviation squares, tie-corrected"),

    // ---------------------------------------------------------------- q285
    // Brown–Forsythe (median-based Levene) homogeneity-of-variance
    // test across sources on document length. Group medians are
    // r4-quantized exact percentiles (the q103 discipline); absolute
    // deviations are then 1e4-quantized integers, so every group sum
    // is exact, and the between/within sums of squares are assembled
    // from quantized per-group terms in DECIMAL.
    Query(
      "q285_brown_forsythe",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("n_chars").cast("double").as("x"))
        val med = docs.groupBy(col("source"))
          .agg(Num.r4(percentile(col("x"), lit(0.5))).as("med"))
        val z = docs.join(broadcast(med), Seq("source"))
          .select(col("source"),
            floor(abs(col("x") - col("med")) * lit(1e4) + lit(0.5))
              .cast("long").as("zq"))
        val grp = z.groupBy(col("source"))
          .agg(count(lit(1)).as("ng"), sum(col("zq")).as("sz"),
            sum((col("zq") * col("zq")).cast("decimal(38,0)")).as("sz2"))
          .localCheckpoint() // small per-group table feeds both SS terms
        val tot = grp.agg(sum(col("ng")).as("n"), count(lit(1)).as("k"),
          sum(col("sz")).as("szall"))
        val assembled = grp.crossJoin(broadcast(tot))
          .select(col("n"), col("k"),
            // between-group: ng * (zbar_g - zbar)^2, dq micro-quantized
            floor((col("sz").cast("double") / (col("ng").cast("double") * lit(1e4))
              - col("szall").cast("double") / (col("n").cast("double") * lit(1e4)))
              * lit(1e6) + lit(0.5)).cast("long").as("dq"),
            // within-group: Sz2/1e8 − Sz²/(ng·1e8), milli-quantized
            floor((col("sz2").cast("double") / lit(1e8)
              - col("sz").cast("double") * col("sz").cast("double") /
                (col("ng").cast("double") * lit(1e8)))
              * lit(1e3) + lit(0.5)).cast("long").as("wq"),
            col("ng"))
          .select(col("n"), col("k"),
            (col("dq").cast("decimal(38,0)") * col("dq") * col("ng")).as("bterm"),
            col("wq").cast("decimal(38,0)").as("wterm"))
          .groupBy(col("n"), col("k"))
          .agg(sum(col("bterm")).as("ssb"), sum(col("wterm")).as("ssw"))
        assembled.select(col("k").as("n_groups"), col("n").as("n_total"),
          Num.r4(((col("n") - col("k")).cast("double") /
            (col("k").cast("double") - lit(1.0))) *
            (col("ssb").cast("double") / lit(1e12)) /
            (col("ssw").cast("double") / lit(1e3)))
            .as("w_stat"))
      },
      Some("""
        WITH med AS (
          SELECT source,
            FLOOR(quantile_cont(CAST(n_chars AS DOUBLE), 0.5) * 10000 + 0.500001)
              / 10000 AS med
          FROM documents GROUP BY source),
        z AS (
          SELECT d.source,
            CAST(FLOOR(ABS(CAST(n_chars AS DOUBLE) - med) * 1e4 + 0.5) AS BIGINT)
              AS zq
          FROM documents d JOIN med ON med.source = d.source),
        grp AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS ng,
            CAST(SUM(zq) AS BIGINT) AS sz,
            SUM(CAST(zq AS HUGEINT) * zq) AS sz2
          FROM z GROUP BY source),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS k,
                  CAST(SUM(sz) AS BIGINT) AS szall FROM grp),
        assembled AS (
          SELECT n, k,
            SUM(CAST(CAST(FLOOR((CAST(sz AS DOUBLE) / (ng * 1e4)
                  - CAST(szall AS DOUBLE) / (n * 1e4)) * 1e6 + 0.5) AS HUGEINT)
                * CAST(FLOOR((CAST(sz AS DOUBLE) / (ng * 1e4)
                  - CAST(szall AS DOUBLE) / (n * 1e4)) * 1e6 + 0.5) AS HUGEINT)
                * ng AS HUGEINT)) AS ssb,
            SUM(CAST(FLOOR((CAST(sz2 AS DOUBLE) / 1e8
                  - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / (ng * 1e8))
                  * 1e3 + 0.5) AS HUGEINT)) AS ssw
          FROM grp CROSS JOIN tot GROUP BY n, k)
        SELECT k AS n_groups, n AS n_total,
          FLOOR(((CAST(n - k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0)) *
                 (CAST(ssb AS DOUBLE) / 1e12) / (CAST(ssw AS DOUBLE) / 1e3))
                * 10000 + 0.500001) / 10000 AS w_stat
        FROM assembled"""),
      "Brown-Forsythe variance-homogeneity W across sources (r4 medians, 1e4-quantized deviations, DECIMAL SS terms)"),

    // ---------------------------------------------------------------- q286
    // Kendall tau-b between daily event volume and daily spend:
    // bucket to epoch days (bounded by the time span, NOT the row
    // count — the pair join stays constant-size at any SF), count
    // concordant/discordant pairs with exact integer compares
    // (cent-quantized spend), apply the tie-corrected denominator.
    Query(
      "q286_kendall_tau",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("value") * lit(100.0) + lit(0.5)).cast("long")).as("y"))
          .localCheckpoint() // bounded daily series feeds pairs + both tie sums
        val a = daily.select(col("day").as("d1"), col("x").as("x1"), col("y").as("y1"))
        val b = daily.select(col("day").as("d2"), col("x").as("x2"), col("y").as("y2"))
        val pairs = a.join(broadcast(b), col("d1") < col("d2"))
          .agg(
            count(when((col("x1") < col("x2") && col("y1") < col("y2")) ||
              (col("x1") > col("x2") && col("y1") > col("y2")), 1)).as("concordant"),
            count(when((col("x1") < col("x2") && col("y1") > col("y2")) ||
              (col("x1") > col("x2") && col("y1") < col("y2")), 1)).as("discordant"))
        val n = daily.agg(count(lit(1)).as("nd"))
        val tx = daily.groupBy(col("x")).agg(count(lit(1)).as("t"))
          .agg(sum(expr("(t * (t - 1)) div 2")).as("n1"))
        val ty = daily.groupBy(col("y")).agg(count(lit(1)).as("t"))
          .agg(sum(expr("(t * (t - 1)) div 2")).as("n2"))
        pairs.crossJoin(broadcast(n)).crossJoin(broadcast(tx))
          .crossJoin(broadcast(ty))
          .select(col("nd").as("n_days"), col("concordant"), col("discordant"),
            Num.r6((col("concordant") - col("discordant")).cast("double") /
              sqrt((expr("(nd * (nd - 1)) div 2") - col("n1")).cast("double") *
                (expr("(nd * (nd - 1)) div 2") - col("n2")).cast("double")))
              .as("tau_b"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS y
          FROM events GROUP BY 1),
        pairs AS (
          SELECT
            CAST(COUNT(*) FILTER (WHERE (a.x < b.x AND a.y < b.y)
              OR (a.x > b.x AND a.y > b.y)) AS BIGINT) AS concordant,
            CAST(COUNT(*) FILTER (WHERE (a.x < b.x AND a.y > b.y)
              OR (a.x > b.x AND a.y < b.y)) AS BIGINT) AS discordant
          FROM daily a JOIN daily b ON a.day < b.day),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM daily),
        tx AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
               FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                     FROM daily GROUP BY x)),
        ty AS (SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
               FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                     FROM daily GROUP BY y))
        SELECT nd AS n_days, concordant, discordant,
          FLOOR(((CAST(concordant AS DOUBLE) - discordant) /
                 SQRT(CAST(nd * (nd - 1) // 2 - n1 AS DOUBLE) *
                      CAST(nd * (nd - 1) // 2 - n2 AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS tau_b
        FROM pairs CROSS JOIN n CROSS JOIN tx CROSS JOIN ty"""),
      "Kendall tau-b between daily event volume and cent-quantized daily spend (exact pair compares, tie-corrected)"),

    // ---------------------------------------------------------------- q386
    // Log-normal fit of per-source document lengths: μ̂ and σ̂ of
    // ln(n_chars), the fitted median e^μ̂, and the SKEWNESS of the log
    // values as the goodness diagnostic (≈0 when the log-normal holds;
    // heavy right log-skew says Pareto-ish instead, q320's regime).
    // The distributional companion to Mood (q358, location) and
    // Ansari–Bradley (q385, scale): this one asks which FAMILY the
    // lengths come from. ln is micro-quantized per doc (q376's rule),
    // so all three moment sums are exact integers (cubes ride
    // DECIMAL/HUGEINT) and both engines standardize identical values;
    // the quantization scale cancels in the skewness.
    Query(
      "q386_lognormal_fit",
      (s, d) => {
        val lq = Tables.documents(s, d)
          .filter(col("n_chars") > 0)
          .select(col("source"),
            floor(log(col("n_chars").cast("double")) * lit(1e6) + lit(0.5))
              .cast("long").as("l"))
        lq.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("l")).as("s1"),
            sum(col("l") * col("l")).as("s2"),
            sum(col("l").cast("decimal(38,0)") * col("l") * col("l")).as("s3"))
          .select(col("source"), col("n_docs"),
            Num.r6(col("s1").cast("double") / col("n_docs").cast("double")
              / lit(1e6)).as("mu_ln"),
            Num.r6(sqrt((col("s2").cast("double")
              - col("s1").cast("double") * col("s1").cast("double")
                / col("n_docs").cast("double"))
              / (col("n_docs") - 1).cast("double")) / lit(1e6)).as("sigma_ln"),
            Num.r4(exp(col("s1").cast("double") / col("n_docs").cast("double")
              / lit(1e6))).as("median_fit"),
            Num.r4({
              val n = col("n_docs").cast("double")
              val m = col("s1").cast("double") / n
              val m2 = col("s2").cast("double") / n - m * m
              val m3 = col("s3").cast("double") / n -
                lit(3.0) * m * col("s2").cast("double") / n +
                lit(2.0) * m * m * m
              m3 / sqrt(m2 * m2 * m2)
            }).as("skew_ln"))
          .orderBy(col("source"))
      },
      Some("""
        WITH lq AS (
          SELECT source,
            CAST(FLOOR(LN(CAST(n_chars AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS l
          FROM documents WHERE n_chars > 0),
        m AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(l) AS BIGINT) AS s1,
            CAST(SUM(l * l) AS BIGINT) AS s2,
            CAST(SUM(CAST(l AS HUGEINT) * l * l) AS HUGEINT) AS s3
          FROM lq GROUP BY source)
        SELECT source, n_docs,
          FLOOR((CAST(s1 AS DOUBLE) / n_docs / 1e6) * 1000000 + 0.500001)
            / 1000000 AS mu_ln,
          FLOOR((SQRT((CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * s1 / n_docs) / (n_docs - 1))
                 / 1e6) * 1000000 + 0.500001) / 1000000 AS sigma_ln,
          FLOOR(EXP(CAST(s1 AS DOUBLE) / n_docs / 1e6) * 10000 + 0.500001)
            / 10000 AS median_fit,
          FLOOR(((CAST(s3 AS DOUBLE) / n_docs
                  - 3.0 * (CAST(s1 AS DOUBLE) / n_docs)
                        * CAST(s2 AS DOUBLE) / n_docs
                  + 2.0 * (CAST(s1 AS DOUBLE) / n_docs)
                        * (CAST(s1 AS DOUBLE) / n_docs)
                        * (CAST(s1 AS DOUBLE) / n_docs))
                 / SQRT(POW(CAST(s2 AS DOUBLE) / n_docs
                            - (CAST(s1 AS DOUBLE) / n_docs)
                              * (CAST(s1 AS DOUBLE) / n_docs), 3)))
                * 10000 + 0.500001) / 10000 AS skew_ln
        FROM m ORDER BY source"""),
      "Log-normal fit of doc lengths per source: micro-quantized ln moments, fitted median, log-skewness as the family diagnostic")
  )
}
