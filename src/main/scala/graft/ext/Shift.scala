package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shift / robustness continuation, batch 49: a kernel
  * two-sample MMD on the embedding table, Pettitt's rank changepoint,
  * a Simpson's-paradox stratification audit, and a moving-block
  * bootstrap for the daily mean — the "is my data the same data"
  * toolkit a pipeline runs between snapshots.
  */
object Shift {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q367
    // Hyperplane-kernel MMD² between the label<5 and label≥5 embedding
    // halves: each vector is featurized to 32 sign bits f_j = sign(p_j·v)
    // (the q39 LSH planes, r6-snapped before the sign so assignment is
    // float-stable cross-engine), and MMD² = (1/32)·Σ_j (f̄_Aj − f̄_Bj)²
    // — the arccos-kernel two-sample distance on bounded features. Per-
    // plane means come from EXACT ±1 integer sums; each squared gap is
    // pico-quantized before the 32-term sum (q334 discipline). Linear
    // scan, 32 dot products per row, no pair join — the two-sample
    // companion to q316's energy distance (which runs on scalars).
    Query(
      "q367_mmd_hyperplane",
      (s, d) => {
        import graft.functions.VectorFunctions.dot
        val planes = Similarity.hyperplanes(32, 64)
        val signCols = planes.toIndexedSeq.map { p =>
          val planeCol = array(p.toIndexedSeq.map(lit): _*)
          when(Num.r6(dot(col("v"), planeCol)) >= 0, 1L).otherwise(-1L)
        }
        val feats = Tables.embeddings(s, d)
          .select(col("label"), Similarity.toDouble(col("embedding")).as("v"))
          .select((col("label") < 5).as("grp_a"), posexplode(array(signCols: _*)))
          .toDF("grp_a", "j", "s")
        val perPlane = feats.groupBy(col("j"))
          .agg(count(when(col("grp_a"), 1)).as("na"),
            sum(when(col("grp_a"), col("s"))).as("sa"),
            count(when(!col("grp_a"), 1)).as("nb"),
            sum(when(!col("grp_a"), col("s"))).as("sb"))
          .select(col("na"), col("nb"),
            floor((col("sa").cast("double") / col("na").cast("double")
              - col("sb").cast("double") / col("nb").cast("double"))
              * (col("sa").cast("double") / col("na").cast("double")
                 - col("sb").cast("double") / col("nb").cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("gq"))
        perPlane.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
            sum(col("gq")).as("sg"))
          .select(col("n_a"), col("n_b"),
            Num.r6(col("sg").cast("double") / lit(1e12) / lit(32.0)).as("mmd2"))
      },
      Some {
        val planeRows = Similarity.hyperplanes(32, 64).zipWithIndex
          .map { case (p, i) => s"($i, [${p.mkString(",")}]::DOUBLE[])" }
          .mkString(",\n          ")
        s"""
        WITH planes(j, p) AS (VALUES
          $planeRows),
        feats AS (
          SELECT e.label < 5 AS grp_a, planes.j,
            CASE WHEN ${Num.sql(
              "list_sum([CAST(e.embedding[i] AS DOUBLE) * p[i] FOR i IN range(1, 65)])",
              6)} >= 0 THEN 1 ELSE -1 END AS s
          FROM embeddings e CROSS JOIN planes),
        perPlane AS (
          SELECT j,
            CAST(COUNT(*) FILTER (WHERE grp_a) AS BIGINT) AS na,
            CAST(SUM(s) FILTER (WHERE grp_a) AS BIGINT) AS sa,
            CAST(COUNT(*) FILTER (WHERE NOT grp_a) AS BIGINT) AS nb,
            CAST(SUM(s) FILTER (WHERE NOT grp_a) AS BIGINT) AS sb
          FROM feats GROUP BY j),
        gaps AS (
          SELECT na, nb,
            CAST(FLOOR((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
              * (CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
              * 1e12 + 0.5) AS BIGINT) AS gq
          FROM perPlane)
        SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
          ${Num.sql("CAST(SUM(gq) AS DOUBLE) / 1e12 / 32.0", 6)} AS mmd2
        FROM gaps"""
      },
      "Hyperplane-kernel MMD^2 between label<5 / label>=5 embedding halves: 32 r6-snapped sign features, exact +/-1 sums, pico-quantized squared gaps"),

    // ---------------------------------------------------------------- q368
    // Pettitt changepoint test on daily volume: U_t = 2·Σ_{i≤t}r_i −
    // t(T+1) over midranks, K = max|U_t| (t < T), with the classic
    // approximation p ≈ 2·exp(−6K²/(T³+T²)). Midranks stay EXACT
    // integers as 2r = 2·rank_min + ties − 1, so every U_t is an exact
    // int64 and the argmax day is unambiguous (first day at the max).
    // The rank-based nonparametric cousin of q167's CUSUM (means) and
    // q301's Page–Hinkley (streaming); the day table is calendar-
    // bounded so the rank window is safe.
    Query(
      "q368_pettitt",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val ties = daily.groupBy(col("y")).agg(count(lit(1)).as("c"))
        val ranked = daily.join(ties, Seq("y"))
          .withColumn("rmin", rank().over(Window.orderBy(col("y"))).cast("long"))
          .withColumn("r2", lit(2L) * col("rmin") + col("c") - 1L)
        val tot = daily.agg(count(lit(1)).as("tt"))
        val wOrd = Window.orderBy(col("dy"))
        val u = ranked.crossJoin(broadcast(tot))
          .withColumn("t", row_number().over(wOrd).cast("long"))
          .withColumn("ut",
            sum(col("r2")).over(wOrd.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)) - col("t") * (col("tt") + 1L))
          .filter(col("t") < col("tt"))
        val k = u.select(col("tt"), col("dy"), abs(col("ut")).as("absu"))
          .orderBy(col("absu").desc, col("dy")).limit(1)
        k.select(col("tt").as("n_days"), col("absu").as("k_stat"),
          col("dy").as("cp_day"),
          Num.r6(lit(2.0) * exp(lit(-6.0) * col("absu").cast("double")
            * col("absu").cast("double") /
            (col("tt").cast("double") * col("tt").cast("double")
              * col("tt").cast("double")
              + col("tt").cast("double") * col("tt").cast("double"))))
            .as("p_approx"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        ties AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS c FROM daily GROUP BY y),
        ranked AS (
          SELECT dy, daily.y, 2 * RANK() OVER (ORDER BY daily.y) + c - 1 AS r2
          FROM daily JOIN ties USING (y)),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM daily),
        u AS (
          SELECT dy, tt, ROW_NUMBER() OVER (ORDER BY dy) AS t,
            CAST(SUM(r2) OVER (ORDER BY dy
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              - ROW_NUMBER() OVER (ORDER BY dy) * (tt + 1) AS ut
          FROM ranked CROSS JOIN tot),
        k AS (
          SELECT tt, dy, ABS(ut) AS absu FROM u WHERE t < tt
          ORDER BY ABS(ut) DESC, dy LIMIT 1)
        SELECT tt AS n_days, absu AS k_stat, dy AS cp_day,
          FLOOR((2.0 * EXP(-6.0 * CAST(absu AS DOUBLE) * CAST(absu AS DOUBLE)
            / (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE)
               + CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE))))
            * 1000000 + 0.500001) / 1000000 AS p_approx
        FROM k"""),
      "Pettitt rank changepoint on daily volume: exact integer midranks (2r = 2 rank_min + ties - 1), K = max|U_t|, first-argmax day, 2 exp approximation p"),

    // ---------------------------------------------------------------- q369
    // Simpson's-paradox audit: Pearson correlation of (daily volume,
    // daily purchase spend) pooled AND within weekday strata. A stratum
    // whose r6-quantized correlation sign contradicts the pooled sign
    // is flagged — the aggregation-reversal trap every metrics review
    // hits. All correlations come from exact integer moment sums
    // (spend micro-quantized), one bounded day table, two tiny aggs.
    Query(
      "q369_simpson_audit",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("x"),
            sum(when(col("event_type") === "purchase",
              expr("cast(floor(value * 1e6 + 0.5) as bigint)")).otherwise(0L))
              .as("yq"))
          .withColumn("wd", expr("dy % 7"))
        def corrCols(pre: String) = Seq(
          count(lit(1)).as(s"${pre}n"), sum(col("x")).as(s"${pre}sx"),
          sum(col("yq")).as(s"${pre}sy"),
          sum(col("x") * col("x")).as(s"${pre}sxx"),
          Exact.m2("yq", "yq").as(s"${pre}syy"),
          Exact.m2("x", "yq").as(s"${pre}sxy"))
        def corrOf(pre: String) = {
          val n = col(s"${pre}n").cast("double")
          val num = col(s"${pre}sxy").cast("double") -
            col(s"${pre}sx").cast("double") * col(s"${pre}sy").cast("double") / n
          val vx = col(s"${pre}sxx").cast("double") -
            col(s"${pre}sx").cast("double") * col(s"${pre}sx").cast("double") / n
          val vy = col(s"${pre}syy").cast("double") -
            col(s"${pre}sy").cast("double") * col(s"${pre}sy").cast("double") / n
          num / sqrt(vx * vy)
        }
        val strata = daily.groupBy(col("wd")).agg(corrCols("")(0),
          corrCols("").drop(1): _*)
        val pooled = daily.agg(corrCols("p")(0), corrCols("p").drop(1): _*)
        strata.crossJoin(broadcast(pooled))
          .select(col("wd").as("weekday"), col("n").as("n_days"),
            Num.r4(corrOf("")).as("corr_stratum"),
            Num.r4(corrOf("p")).as("corr_pooled"),
            (Num.r4(corrOf("")) * Num.r4(corrOf("p")) < 0).as("sign_flip"))
          .orderBy(col("weekday"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'purchase'
              THEN CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS yq,
            epoch_us(ts) // 86400000000 % 7 AS wd
          FROM events GROUP BY 1, 4),
        strata AS (
          SELECT wd, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
            CAST(SUM(x * x) AS BIGINT) AS sxx,
            CAST(SUM(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS syy,
            CAST(SUM(CAST(x AS HUGEINT) * yq) AS HUGEINT) AS sxy
          FROM daily GROUP BY wd),
        pooled AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS pn,
            CAST(SUM(x) AS BIGINT) AS psx, CAST(SUM(yq) AS BIGINT) AS psy,
            CAST(SUM(x * x) AS BIGINT) AS psxx,
            CAST(SUM(CAST(yq AS HUGEINT) * yq) AS HUGEINT) AS psyy,
            CAST(SUM(CAST(x AS HUGEINT) * yq) AS HUGEINT) AS psxy
          FROM daily),
        t AS (
          SELECT wd, n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
               / CAST(n AS DOUBLE))
            / SQRT((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE))
                 * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE))) AS cs,
            (CAST(psxy AS DOUBLE) - CAST(psx AS DOUBLE) * CAST(psy AS DOUBLE)
               / CAST(pn AS DOUBLE))
            / SQRT((CAST(psxx AS DOUBLE) - CAST(psx AS DOUBLE) * CAST(psx AS DOUBLE)
                     / CAST(pn AS DOUBLE))
                 * (CAST(psyy AS DOUBLE) - CAST(psy AS DOUBLE) * CAST(psy AS DOUBLE)
                     / CAST(pn AS DOUBLE))) AS cp
          FROM strata CROSS JOIN pooled)
        SELECT wd AS weekday, n AS n_days,
          FLOOR(cs * 10000 + 0.500001) / 10000 AS corr_stratum,
          FLOOR(cp * 10000 + 0.500001) / 10000 AS corr_pooled,
          (FLOOR(cs * 10000 + 0.500001) / 10000)
            * (FLOOR(cp * 10000 + 0.500001) / 10000) < 0 AS sign_flip
        FROM t ORDER BY weekday"""),
      "Simpson's-paradox audit: pooled vs weekday-stratified volume-spend Pearson correlations from exact integer moments, r4-sign flip flags"),

    // ---------------------------------------------------------------- q370
    // Moving-block bootstrap SE of the daily mean volume: 200
    // deterministic replicates, each resampling ceil(T/7) length-7
    // blocks whose starts come from the md5 stream (the q97
    // Efraimidis–Spirakis hashing discipline applied to block starts),
    // so serially-correlated days stay together — the honest SE for an
    // autocorrelated series (vs the iid SE that q209's Poisson
    // bootstrap gives). Replicate sums are EXACT integers (an equi-join
    // of the bounded block×offset grid against the day table); the
    // replicate-mean variance uses micro-quantized means. Output: the
    // plain mean, iid SE, block-bootstrap SE, and their ratio (>1 ⇒
    // positive autocorrelation inflates uncertainty).
    Query(
      "q370_block_bootstrap",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val wOrd = Window.orderBy(col("dy"))
        val idx = daily.withColumn("t", row_number().over(wOrd).cast("long") - 1L)
          .localCheckpoint() // calendar-bounded
        val tot = idx.agg(count(lit(1)).as("tt"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        val l = 7L
        val grid = idx.sparkSession.range(200)
          .select(col("id").as("b"))
          .crossJoin(broadcast(tot.select(col("tt"))))
          .withColumn("nb", expr(s"(tt + $l - 1) div $l"))
          .select(col("b"), col("tt"), explode(expr("sequence(0, nb - 1)")).as("k"))
          .withColumn("s", graft.ext.Dedup.h60(
            concat(lit("bb|"), col("b").cast("string"), lit("|"),
              col("k").cast("string"))) % greatest(col("tt") - l + 1, lit(1L)))
          .select(col("b"), explode(expr(s"sequence(s, s + $l - 1)")).as("t"))
        val reps = grid.join(idx.select(col("t"), col("y")), Seq("t"))
          .groupBy(col("b"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("ry"))
          .select(floor(col("ry").cast("double") / col("m").cast("double")
            * lit(1e6) + lit(0.5)).cast("long").as("rmq"))
        val boot = reps.agg(count(lit(1)).as("nb"), sum(col("rmq")).as("s1"),
          Exact.m2("rmq", "rmq").as("s2"))
        boot.crossJoin(broadcast(tot))
          .select(col("tt").as("n_days"),
            Num.r6(col("sy").cast("double") / col("tt").cast("double"))
              .as("mean_daily"),
            Num.r6(sqrt((col("syy").cast("double")
              - col("sy").cast("double") * col("sy").cast("double")
                / col("tt").cast("double"))
              / (col("tt") - 1).cast("double") / col("tt").cast("double")))
              .as("se_iid"),
            Num.r6(sqrt((col("s2").cast("double")
              - col("s1").cast("double") * col("s1").cast("double")
                / col("nb").cast("double"))
              / (col("nb") - 1).cast("double")) / lit(1e6)).as("se_block"),
            Num.r4((sqrt((col("s2").cast("double")
              - col("s1").cast("double") * col("s1").cast("double")
                / col("nb").cast("double"))
              / (col("nb") - 1).cast("double")) / lit(1e6)) /
              sqrt((col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double")
                  / col("tt").cast("double"))
                / (col("tt") - 1).cast("double") / col("tt").cast("double")))
              .as("se_ratio"))
      },
      Some(s"""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT ROW_NUMBER() OVER (ORDER BY dy) - 1 AS t, y FROM daily),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt,
                  CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(y * y) AS BIGINT) AS syy FROM idx),
        grid AS (
          SELECT b, ${graft.ext.Dedup.sqlH60(
            "'bb|' || CAST(b AS VARCHAR) || '|' || CAST(k AS VARCHAR)")}
            % GREATEST(tt - 7 + 1, 1) AS s
          FROM (SELECT UNNEST(RANGE(0, 200)) AS b) CROSS JOIN tot
          CROSS JOIN (SELECT UNNEST(RANGE(0, 1000)) AS k)
          WHERE k < (tt + 6) // 7),
        picks AS (
          SELECT b, s + o AS t
          FROM grid CROSS JOIN (SELECT UNNEST(RANGE(0, 7)) AS o)),
        reps AS (
          SELECT b, CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
            AS BIGINT) AS rmq
          FROM picks JOIN idx USING (t) GROUP BY b),
        boot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(rmq) AS BIGINT) AS s1,
            CAST(SUM(CAST(rmq AS HUGEINT) * rmq) AS HUGEINT) AS s2
          FROM reps)
        SELECT tt AS n_days,
          ${Num.sql("CAST(sy AS DOUBLE) / tt", 6)} AS mean_daily,
          ${Num.sql(
            """SQRT((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
              / tt) / (tt - 1) / tt)""", 6)} AS se_iid,
          ${Num.sql(
            """SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / nb) / (nb - 1)) / 1e6""", 6)} AS se_block,
          ${Num.sql(
            """(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
              / nb) / (nb - 1)) / 1e6) /
             SQRT((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
              / tt) / (tt - 1) / tt)""", 4)} AS se_ratio
        FROM boot CROSS JOIN tot"""),
      "Moving-block bootstrap (L=7, B=200, md5 block starts) SE of mean daily volume vs the iid SE: exact integer replicate sums, micro-quantized replicate means")
    ,
    // ---------------------------------------------------------------- q395
    // Newey–West (HAC) standard error of the mean daily volume with
    // Bartlett weights at lags 1..4 — the CLOSED-FORM
    // autocorrelation-robust companion to q370's block bootstrap (and
    // the SE the Ljung–Box q338 result says you need): S = γ₀ +
    // 2Σ_{l≤4}(1−l/5)γ_l, SE = √(S/n). Deviations are cleared to the
    // exact integers dev_t = n·y_t − Σy, so every autocovariance
    // numerator Γ_l = Σ dev_t·dev_{t+l} is an exact DECIMAL/HUGEINT
    // sum; Bartlett weights are exact rationals folded in as
    // (5−l)·2/5 over a common denominator. One day-table window, 4
    // lead columns, never a raw-event pass.
    Query(
      "q395_newey_west",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val w = Window.orderBy(col("dy"))
        val dev = daily.crossJoin(broadcast(tot))
          .select(col("dy"), col("n"), (col("n") * col("y") - col("sy")).as("dv"))
          .withColumn("d1", lead(col("dv"), 1).over(w))
          .withColumn("d2", lead(col("dv"), 2).over(w))
          .withColumn("d3", lead(col("dv"), 3).over(w))
          .withColumn("d4", lead(col("dv"), 4).over(w))
        val g = dev.agg(max(col("n")).as("n"),
          Exact.m2("dv", "dv").as("g0"),
          Exact.m2("dv", "d1").as("g1"),
          Exact.m2("dv", "d2").as("g2"),
          Exact.m2("dv", "d3").as("g3"),
          Exact.m2("dv", "d4").as("g4"))
        // 5·S·n³ = 5·g0 + 8·g1 + 6·g2 + 4·g3 + 2·g4 (Bartlett ×2,
        // common denominator 5); SE = sqrt(S/n) = sqrt(num/(5n⁴))
        g.select(col("n").as("n_days"),
            // Γ0 = n³·γ0 and SE² = γ0/n ⇒ SE_iid = √(Γ0/n⁴)
            Num.r6(sqrt(col("g0").cast("double")
              / (col("n").cast("double") * col("n").cast("double")
                * col("n").cast("double") * col("n").cast("double"))))
              .as("se_iid"),
            Num.r6(sqrt(greatest(lit(0.0),
              (lit(5.0) * col("g0").cast("double")
                + lit(8.0) * col("g1").cast("double")
                + lit(6.0) * col("g2").cast("double")
                + lit(4.0) * col("g3").cast("double")
                + lit(2.0) * col("g4").cast("double")) / lit(5.0))
              / (col("n").cast("double") * col("n").cast("double")
                * col("n").cast("double") * col("n").cast("double"))))
              .as("se_nw"),
            when(col("g0") === 0, lit(null).cast("double"))
              .otherwise(Num.r4(sqrt(greatest(lit(0.0),
                (lit(5.0) * col("g0").cast("double")
                  + lit(8.0) * col("g1").cast("double")
                  + lit(6.0) * col("g2").cast("double")
                  + lit(4.0) * col("g3").cast("double")
                  + lit(2.0) * col("g4").cast("double")) / lit(5.0))
                / col("g0").cast("double")))).as("se_ratio"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS sy FROM daily),
        dev AS (
          SELECT n, n * y - sy AS dv,
            LEAD(n * y - sy, 1) OVER (ORDER BY dy) AS d1,
            LEAD(n * y - sy, 2) OVER (ORDER BY dy) AS d2,
            LEAD(n * y - sy, 3) OVER (ORDER BY dy) AS d3,
            LEAD(n * y - sy, 4) OVER (ORDER BY dy) AS d4
          FROM daily CROSS JOIN tot),
        g AS (
          SELECT MAX(n) AS n,
            SUM(CAST(dv AS HUGEINT) * dv) AS g0,
            SUM(CAST(dv AS HUGEINT) * d1) AS g1,
            SUM(CAST(dv AS HUGEINT) * d2) AS g2,
            SUM(CAST(dv AS HUGEINT) * d3) AS g3,
            SUM(CAST(dv AS HUGEINT) * d4) AS g4
          FROM dev)
        SELECT n AS n_days,
          FLOOR(SQRT(CAST(g0 AS DOUBLE)
                     / (CAST(n AS DOUBLE) * n * n * n))
                * 1000000 + 0.500001) / 1000000 AS se_iid,
          FLOOR(SQRT(GREATEST(0.0,
                  (5.0 * CAST(g0 AS DOUBLE) + 8.0 * CAST(g1 AS DOUBLE)
                   + 6.0 * CAST(g2 AS DOUBLE) + 4.0 * CAST(g3 AS DOUBLE)
                   + 2.0 * CAST(g4 AS DOUBLE)) / 5.0)
                / (CAST(n AS DOUBLE) * n * n * n))
                * 1000000 + 0.500001) / 1000000 AS se_nw,
          CASE WHEN g0 = 0 THEN NULL
               ELSE FLOOR(SQRT(GREATEST(0.0,
                      (5.0 * CAST(g0 AS DOUBLE) + 8.0 * CAST(g1 AS DOUBLE)
                       + 6.0 * CAST(g2 AS DOUBLE) + 4.0 * CAST(g3 AS DOUBLE)
                       + 2.0 * CAST(g4 AS DOUBLE)) / 5.0)
                    / CAST(g0 AS DOUBLE))
                    * 10000 + 0.500001) / 10000 END AS se_ratio
        FROM g"""),
      "Newey-West HAC standard error of mean daily volume (Bartlett lags 1-4): exact integer deviation products, closed-form robust/iid SE ratio")
  )
}
