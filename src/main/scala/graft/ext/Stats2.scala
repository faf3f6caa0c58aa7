package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution diagnostics, round-6 continuation batch 22: rank
  * correlation, f-divergence drift, partial autocorrelation and a
  * normality test — the remaining classical tools a data-quality
  * analyst expects from the engine. Every query follows the repo's
  * cross-engine exactness discipline: integer (or integer-quantized)
  * inputs, 128-bit product sums where a long could overflow at 100×,
  * and a FIXED floating-point expression order shared with the oracle
  * so both engines emit bit-identical doubles before the final round.
  */
object Stats2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q265
    // Spearman rank correlation per source between document length
    // (n_chars) and whitespace token count — the rank-based tie to
    // q145/q173's trend family: outlier-immune monotone association.
    // Average ranks are kept EXACT by doubling (2·avgrank = 2·minrank
    // + ties − 1 is always an integer); the Pearson formula on the
    // doubled ranks runs over DECIMAL(38)/HUGEINT sums so n·Sxy − Sx·Sy
    // is exact at any corpus size, and only the final ratio goes
    // through doubles. One shuffle on source; the two rank windows
    // reuse the same exchange.
    Query(
      "q265_spearman",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("source"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val wx = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        val wy = Window.partitionBy(col("source")).orderBy(col("n_tok"))
        val tx = Window.partitionBy(col("source"), col("n_chars"))
        val ty = Window.partitionBy(col("source"), col("n_tok"))
        val ranked = base
          .withColumn("rx", lit(2L) * rank().over(wx).cast("long") +
            count(lit(1)).over(tx) - lit(1L))
          .withColumn("ry", lit(2L) * rank().over(wy).cast("long") +
            count(lit(1)).over(ty) - lit(1L))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
        ranked.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
            sum(dec(col("rx")) * dec(col("ry"))).as("sxy"),
            sum(dec(col("rx")) * dec(col("rx"))).as("sxx"),
            sum(dec(col("ry")) * dec(col("ry"))).as("syy"))
          .select(col("source"), col("n_docs"),
            (dec(col("n_docs")) * col("sxy") - dec(col("sx")) * dec(col("sy"))).as("num"),
            (dec(col("n_docs")) * col("sxx") - dec(col("sx")) * dec(col("sx"))).as("dx"),
            (dec(col("n_docs")) * col("syy") - dec(col("sy")) * dec(col("sy"))).as("dy"))
          .filter(col("dx") > 0 && col("dy") > 0)
          .select(col("source"), col("n_docs"),
            Num.r4(col("num").cast("double") /
              sqrt(col("dx").cast("double") * col("dy").cast("double")))
              .as("spearman_rho"))
          .orderBy(col("source"))
      },
      Some("""
        WITH base AS (
          SELECT source, n_chars,
            CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents),
        ranked AS (
          SELECT source,
            2 * RANK() OVER (PARTITION BY source ORDER BY n_chars)
              + COUNT(*) OVER (PARTITION BY source, n_chars) - 1 AS rx,
            2 * RANK() OVER (PARTITION BY source ORDER BY n_tok)
              + COUNT(*) OVER (PARTITION BY source, n_tok) - 1 AS ry
          FROM base),
        sums AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            SUM(CAST(rx AS HUGEINT)) AS sx, SUM(CAST(ry AS HUGEINT)) AS sy,
            SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
            SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
            SUM(CAST(ry AS HUGEINT) * ry) AS syy
          FROM ranked GROUP BY source)
        SELECT source, n_docs,
          FLOOR((CAST(n_docs * sxy - sx * sy AS DOUBLE)
                 / SQRT(CAST(n_docs * sxx - sx * sx AS DOUBLE)
                        * CAST(n_docs * syy - sy * sy AS DOUBLE)))
                * 10000 + 0.500001) / 10000 AS spearman_rho
        FROM sums
        WHERE n_docs * sxx - sx * sx > 0 AND n_docs * syy - sy * sy > 0
        ORDER BY source"""),
      "Spearman rank correlation (exact doubled average ranks, 128-bit sums) per source: n_chars vs token count"),

    // ---------------------------------------------------------------- q266
    // Hellinger distance + total-variation distance of each source's
    // language mix vs the corpus mix — the bounded-metric complement to
    // q180's JSD (Hellinger and TV are metrics; JSD is not). The grid
    // is (sources × langs)-bounded. Per-term values √(p·q) and |p−q|
    // are picocent-quantized (·10¹²) to integers BEFORE the sum, so the
    // 5-term additions are exact in any aggregation order — the same
    // trick the micro-quantized log sums use (q234, q240).
    Query(
      "q266_hellinger_tv",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bySrcLang = docs.groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("nsl"))
        val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
        val byLang = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
        val tot = docs.agg(count(lit(1)).as("n"))
        // full grid so a lang absent from a source still contributes
        // its q-mass: sources × langs, both bounded
        val grid = bySrc.crossJoin(broadcast(byLang))
          .join(bySrcLang, Seq("source", "lang"), "left")
          .na.fill(0L, Seq("nsl"))
          .crossJoin(broadcast(tot))
          .select(col("source"),
            (col("nsl").cast("double") / col("ns").cast("double")).as("p"),
            (col("nl").cast("double") / col("n").cast("double")).as("q"))
          .select(col("source"),
            floor(sqrt(col("p") * col("q")) * lit(1e12) + lit(0.5)).cast("long").as("bcq"),
            floor(abs(col("p") - col("q")) * lit(1e12) + lit(0.5)).cast("long").as("tvq"))
        grid.groupBy(col("source"))
          .agg(sum(col("bcq")).as("sbc"), sum(col("tvq")).as("stv"))
          .select(col("source"),
            Num.r6(col("sbc").cast("double") / lit(1e12)).as("bhattacharyya"),
            Num.r6(sqrt(greatest(lit(0.0),
              lit(1.0) - col("sbc").cast("double") / lit(1e12)))).as("hellinger"),
            Num.r6(col("stv").cast("double") / lit(2e12)).as("tv_dist"))
          .orderBy(col("source"))
      },
      Some("""
        WITH bysl AS (
          SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS nsl
          FROM documents GROUP BY source, lang),
        bys AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
                FROM documents GROUP BY source),
        byl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
                FROM documents GROUP BY lang),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        grid AS (
          SELECT bys.source,
            CAST(COALESCE(nsl, 0) AS DOUBLE) / ns AS p,
            CAST(nl AS DOUBLE) / n AS q
          FROM bys CROSS JOIN byl CROSS JOIN tot
          LEFT JOIN bysl ON bysl.source = bys.source AND bysl.lang = byl.lang),
        q AS (
          SELECT source,
            CAST(FLOOR(SQRT(p * q) * 1e12 + 0.5) AS BIGINT) AS bcq,
            CAST(FLOOR(ABS(p - q) * 1e12 + 0.5) AS BIGINT) AS tvq
          FROM grid),
        sums AS (
          SELECT source, SUM(CAST(bcq AS BIGINT)) AS sbc,
            SUM(CAST(tvq AS BIGINT)) AS stv
          FROM q GROUP BY source)
        SELECT source,
          FLOOR((CAST(sbc AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS bhattacharyya,
          FLOOR(SQRT(GREATEST(0.0, 1.0 - CAST(sbc AS DOUBLE) / 1e12))
                * 1000000 + 0.500001) / 1000000 AS hellinger,
          FLOOR((CAST(stv AS DOUBLE) / 2e12) * 1000000 + 0.500001) / 1000000
            AS tv_dist
        FROM sums ORDER BY source"""),
      "Hellinger + total-variation distance of per-source language mix vs corpus (picocent-quantized exact term sums)"),

    // ---------------------------------------------------------------- q267
    // Partial autocorrelation (Durbin–Levinson, lags 1–3) per user over
    // the hourly-mean series — the diagnostic that separates direct
    // lag-k dependence from propagated lag-1 (the AR-order picker
    // feeding q160's AR(1): pacf2≈0 says AR(1) suffices). The centered
    // series and the num_k/den integer ratios are EXACTLY q170's
    // machinery (nb·yq − Σyq, DECIMAL/HUGEINT product sums); the DL
    // recursion then runs over bit-identical doubles with an identical
    // expression tree on both engines, so no tolerance is needed.
    Query(
      "q267_pacf",
      (s, d) => {
        val ordB = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        val byU = Window.partitionBy(col("user_id"))
        val cent = Tables.events(s, d)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
          .select(col("user_id"), col("bucket"),
            floor(col("hv") * lit(1000.0) + lit(0.5)).cast("long").as("yq"))
          .withColumn("nb", count(lit(1)).over(byU))
          .withColumn("toty", sum(col("yq")).over(byU))
          .withColumn("c", col("nb") * col("yq") - col("toty"))
        val withLeads = Seq(1, 2, 3).foldLeft(cent) { (df, k) =>
          df.withColumn(s"l$k", lead(col("c"), k).over(ordB))
        }
        val cd = col("c").cast("decimal(19,0)")
        val sums = withLeads.groupBy(col("user_id"))
          .agg(max(col("nb")).as("n_buckets"),
            sum(cd * col("c").cast("decimal(19,0)")).as("den"),
            sum(cd * col("l1").cast("decimal(19,0)")).as("num1"),
            sum(cd * col("l2").cast("decimal(19,0)")).as("num2"),
            sum(cd * col("l3").cast("decimal(19,0)")).as("num3"),
            count(col("l3")).as("np3"))
          .filter(col("np3") >= 2 && col("den") > 0)
        val r = sums
          .withColumn("r1", col("num1").cast("double") / col("den").cast("double"))
          .withColumn("r2", col("num2").cast("double") / col("den").cast("double"))
          .withColumn("r3", col("num3").cast("double") / col("den").cast("double"))
          // Durbin–Levinson, expression order mirrored in the oracle
          .withColumn("d2", lit(1.0) - col("r1") * col("r1"))
          .filter(abs(col("d2")) > 1e-9)
          .withColumn("phi22", (col("r2") - col("r1") * col("r1")) / col("d2"))
          .withColumn("a21", col("r1") - col("phi22") * col("r1"))
          .withColumn("d3",
            lit(1.0) - col("a21") * col("r1") - col("phi22") * col("r2"))
          .filter(abs(col("d3")) > 1e-9)
          .withColumn("phi33",
            (col("r3") - col("a21") * col("r2") - col("phi22") * col("r1")) / col("d3"))
        r.select(col("user_id"), col("n_buckets"),
          Num.r4(col("r1")).as("pacf1"),
          Num.r4(col("phi22")).as("pacf2"),
          Num.r4(col("phi33")).as("pacf3"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH hourly AS (
          SELECT user_id, DATE_TRUNC('hour', ts) AS bucket, AVG(value) AS hv
          FROM events GROUP BY user_id, DATE_TRUNC('hour', ts)),
        idx AS (
          SELECT user_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY bucket) AS BIGINT) AS t,
            CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT) AS yq,
            COUNT(*) OVER (PARTITION BY user_id) AS nb,
            SUM(CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id) AS toty
          FROM hourly),
        cent AS (
          SELECT user_id, t, CAST(nb AS BIGINT) AS nb, nb * yq - toty AS c
          FROM idx),
        lead3 AS (
          SELECT user_id, nb, c,
            LEAD(c, 1) OVER (PARTITION BY user_id ORDER BY t) AS l1,
            LEAD(c, 2) OVER (PARTITION BY user_id ORDER BY t) AS l2,
            LEAD(c, 3) OVER (PARTITION BY user_id ORDER BY t) AS l3
          FROM cent),
        sums AS (
          SELECT user_id, MAX(nb) AS n_buckets,
            SUM(CAST(c AS HUGEINT) * c) AS den,
            SUM(CAST(c AS HUGEINT) * l1) AS num1,
            SUM(CAST(c AS HUGEINT) * l2) AS num2,
            SUM(CAST(c AS HUGEINT) * l3) AS num3,
            COUNT(l3) AS np3
          FROM lead3 GROUP BY user_id
          HAVING COUNT(l3) >= 2 AND SUM(CAST(c AS HUGEINT) * c) > 0),
        rr AS (
          SELECT user_id, n_buckets,
            CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
            CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
            CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
          FROM sums),
        s2 AS (
          SELECT *, 1.0 - r1 * r1 AS d2 FROM rr WHERE ABS(1.0 - r1 * r1) > 1e-9),
        s3 AS (
          SELECT *, (r2 - r1 * r1) / d2 AS phi22 FROM s2),
        s4 AS (
          SELECT *, r1 - phi22 * r1 AS a21 FROM s3),
        s5 AS (
          SELECT *, 1.0 - a21 * r1 - phi22 * r2 AS d3 FROM s4
          WHERE ABS(1.0 - a21 * r1 - phi22 * r2) > 1e-9)
        SELECT user_id, n_buckets,
          FLOOR(r1 * 10000 + 0.500001) / 10000 AS pacf1,
          FLOOR(phi22 * 10000 + 0.500001) / 10000 AS pacf2,
          FLOOR(((r3 - a21 * r2 - phi22 * r1) / d3) * 10000 + 0.500001) / 10000
            AS pacf3
        FROM s5 ORDER BY user_id"""),
      "Partial autocorrelation lags 1-3 per key (Durbin-Levinson over q170's exact-integer ACF ratios)"),

    // ---------------------------------------------------------------- q268
    // Jarque–Bera normality test per source on document length: JB =
    // n/6·(g1² + (g2−3)²/4) from skewness g1 = m3/m2^1.5 and kurtosis
    // g2 = m4/m2². Power sums are taken about the FIXED shift c=300
    // (data-independent, so the sums stay one map-side-combined pass)
    // in exact int64 — |n_chars−300| ≤ ~300 keeps d⁴ ≈ 8·10⁹, safe to
    // ~10⁸ rows/group — and the central-moment conversion runs in an
    // identical double expression tree on both engines. Complements
    // q47's moment aggregates with the actual test statistic, and the
    // JB>5.99 flag is the χ²₂ 5% decision.
    Query(
      "q268_jarque_bera",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .select(col("source"), (col("n_chars") - lit(300L)).as("dd"))
        val sums = sh.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("dd")).as("s1"),
            sum(col("dd") * col("dd")).as("s2"),
            sum(col("dd") * col("dd") * col("dd")).as("s3"),
            sum(col("dd") * col("dd") * col("dd") * col("dd")).as("s4"))
        val m = sums
          .withColumn("nd", col("n").cast("double"))
          .withColumn("m1", col("s1").cast("double") / col("nd"))
          .withColumn("m2", col("s2").cast("double") / col("nd") - col("m1") * col("m1"))
          .filter(col("m2") > 1e-12)
          .withColumn("m3",
            col("s3").cast("double") / col("nd")
              - lit(3.0) * col("m1") * (col("s2").cast("double") / col("nd"))
              + lit(2.0) * col("m1") * col("m1") * col("m1"))
          .withColumn("m4",
            col("s4").cast("double") / col("nd")
              - lit(4.0) * col("m1") * (col("s3").cast("double") / col("nd"))
              + lit(6.0) * col("m1") * col("m1") * (col("s2").cast("double") / col("nd"))
              - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
          .withColumn("g1", col("m3") / sqrt(col("m2") * col("m2") * col("m2")))
          .withColumn("g2", col("m4") / (col("m2") * col("m2")))
          .withColumn("jb", col("nd") / lit(6.0) *
            (col("g1") * col("g1") +
              (col("g2") - lit(3.0)) * (col("g2") - lit(3.0)) / lit(4.0)))
        m.select(col("source"), col("n"),
          Num.r4(col("g1")).as("skewness"),
          Num.r4(col("g2")).as("kurtosis"),
          Num.r4(col("jb")).as("jb_stat"),
          (col("jb") > lit(5.991464547107979)).as("reject_normal"))
          .orderBy(col("source"))
      },
      Some("""
        WITH sh AS (
          SELECT source, CAST(n_chars - 300 AS BIGINT) AS dd FROM documents),
        sums AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(dd) AS BIGINT) AS s1,
            CAST(SUM(dd * dd) AS BIGINT) AS s2,
            CAST(SUM(dd * dd * dd) AS BIGINT) AS s3,
            CAST(SUM(dd * dd * dd * dd) AS BIGINT) AS s4
          FROM sh GROUP BY source),
        m AS (
          SELECT source, n, CAST(n AS DOUBLE) AS nd,
            CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
            CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
            CAST(s4 AS DOUBLE) AS s4d
          FROM sums),
        m2t AS (
          SELECT *, s2d / nd - m1 * m1 AS m2 FROM m WHERE s2d / nd - m1 * m1 > 1e-12),
        m34 AS (
          SELECT *,
            s3d / nd - 3.0 * m1 * (s2d / nd) + 2.0 * m1 * m1 * m1 AS m3,
            s4d / nd - 4.0 * m1 * (s3d / nd)
              + 6.0 * m1 * m1 * (s2d / nd) - 3.0 * m1 * m1 * m1 * m1 AS m4
          FROM m2t),
        g AS (
          SELECT *, m3 / SQRT(m2 * m2 * m2) AS g1, m4 / (m2 * m2) AS g2
          FROM m34),
        jbt AS (
          SELECT *, nd / 6.0 * (g1 * g1 + (g2 - 3.0) * (g2 - 3.0) / 4.0) AS jb
          FROM g)
        SELECT source, n,
          FLOOR(g1 * 10000 + 0.500001) / 10000 AS skewness,
          FLOOR(g2 * 10000 + 0.500001) / 10000 AS kurtosis,
          FLOOR(jb * 10000 + 0.500001) / 10000 AS jb_stat,
          jb > 5.991464547107979 AS reject_normal
        FROM jbt ORDER BY source"""),
      "Jarque-Bera normality test per source on n_chars (fixed-shift exact int64 power sums, chi2_2 5% decision)")
  )
}
