package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series-shape continuation, batch 36: a matrix profile over
  * the daily series, event-type audience overlap, and the
  * semivariogram. The matrix profile's every dot product, window
  * moment and z-distance input is an EXACT INTEGER assembled from
  * running windows over the position-indexed series — the per-pair
  * distance is quantized once, so motif/discord ranking is
  * deterministic cross-engine.
  */
object Profile {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q317
    // Matrix profile (w = 7, non-overlapping exclusion |i−j| ≥ 7) of
    // the daily event-count series: for every 7-day window, the
    // z-normalized distance to its nearest neighbor; the 3 tightest
    // (motifs — repeated weekly shapes) and 3 loosest (discords —
    // anomalous weeks). Dot products are per-lag running 7-sums of
    // x_i·x_{i+h} (all integers); windows with zero variance are
    // excluded (documented). Pair count is TIME-bounded — constant in
    // SF.
    Query(
      "q317_matrix_profile",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val t = daily
          .withColumn("r", row_number().over(Window.orderBy(col("day"))).cast("long"))
          .localCheckpoint() // bounded positioned series
        val wWin = Window.orderBy(col("r")).rowsBetween(0, 6)
        val wins = t
          .withColumn("cnt", count(lit(1)).over(wWin))
          .withColumn("sx", sum(col("x")).over(wWin))
          .withColumn("sxx", sum(col("x") * col("x")).over(wWin))
          .filter(col("cnt") === 7)
          .select(col("r").as("p"), col("day").as("pday"), col("sx"), col("sxx"))
          .filter(col("sxx") * 7 > col("sx") * col("sx")) // sigma > 0
          .localCheckpoint()
        val a = t.select(col("r").as("i"), col("x").as("xi"))
        val b = t.select(col("r").as("j"), col("x").as("xj"))
        val prods = a.join(b, col("j") - col("i") >= 7)
          .select((col("j") - col("i")).as("h"), col("i"),
            (col("xi") * col("xj")).as("z"))
        val wH = Window.partitionBy(col("h")).orderBy(col("i")).rowsBetween(0, 6)
        val dots = prods
          .withColumn("cnt", count(lit(1)).over(wH))
          .withColumn("dot", sum(col("z")).over(wH))
          .filter(col("cnt") === 7)
          .select(col("i").as("p"), (col("i") + col("h")).as("q"), col("dot"))
        val pw = wins.select(col("p"), col("pday"), col("sx").as("sxp"),
          col("sxx").as("sxxp"))
        val qw = wins.select(col("p").as("q"), col("pday").as("qday"),
          col("sx").as("sxq"), col("sxx").as("sxxq"))
        val pairs = dots.join(pw, Seq("p")).join(qw, Seq("q"))
          // d² = 2w(1 − (w·dot − sxp·sxq) / sqrt((w·sxxp − sxp²)(w·sxxq − sxq²)))
          .select(col("p"), col("q"), col("pday"), col("qday"),
            floor((lit(14.0) * (lit(1.0) -
              (lit(7.0) * col("dot").cast("double") -
                col("sxp").cast("double") * col("sxq").cast("double")) /
              sqrt((lit(7.0) * col("sxxp").cast("double") -
                col("sxp").cast("double") * col("sxp").cast("double")) *
                (lit(7.0) * col("sxxq").cast("double") -
                  col("sxq").cast("double") * col("sxq").cast("double")))))
              * lit(1e6) + lit(0.5)).cast("long").as("dq"))
          .localCheckpoint() // bounded pair table feeds both directions
        val both = pairs.select(col("pday").as("posday"), col("qday").as("nnday"),
            col("dq"))
          .union(pairs.select(col("qday"), col("pday"), col("dq")))
        val prof = both.groupBy(col("posday"))
          .agg(min(struct(col("dq"), col("nnday"))).as("mn"))
          .select(col("posday"), col("mn.dq").as("dq"), col("mn.nnday").as("nnday"))
          .localCheckpoint()
        val motifs = prof.orderBy(col("dq"), col("posday")).limit(3)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("dq"), col("posday"))).cast("long"))
          .withColumn("kind", lit("motif"))
        val discords = prof.orderBy(col("dq").desc, col("posday")).limit(3)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("dq").desc, col("posday"))).cast("long"))
          .withColumn("kind", lit("discord"))
        motifs.union(discords)
          .select(col("kind"), col("rank"), col("posday").as("window_day"),
            col("nnday").as("nn_day"),
            Num.r4(sqrt(greatest(col("dq").cast("double"), lit(0.0)) / lit(1e6)))
              .as("znorm_dist"))
          .orderBy(col("kind"), col("rank"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        t AS (
          SELECT day, x,
            CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS r
          FROM daily),
        wins AS (
          SELECT r AS p, day AS pday, sx, sxx FROM (
            SELECT r, day,
              COUNT(*) OVER w AS cnt,
              SUM(x) OVER w AS sx,
              SUM(x * x) OVER w AS sxx
            FROM t
            WINDOW w AS (ORDER BY r ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING))
          WHERE cnt = 7 AND sxx * 7 > sx * sx),
        prods AS (
          SELECT b.r - a.r AS h, a.r AS i, a.x * b.x AS z
          FROM t a JOIN t b ON b.r - a.r >= 7),
        dots AS (
          SELECT i AS p, i + h AS q, dot FROM (
            SELECT h, i,
              COUNT(*) OVER wh AS cnt,
              SUM(z) OVER wh AS dot
            FROM prods
            WINDOW wh AS (PARTITION BY h ORDER BY i
              ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING))
          WHERE cnt = 7),
        pairs AS (
          SELECT pw.pday, qw.pday AS qday,
            CAST(FLOOR((14.0 * (1.0 -
              (7.0 * dot - CAST(pw.sx AS DOUBLE) * qw.sx) /
              SQRT((7.0 * pw.sxx - CAST(pw.sx AS DOUBLE) * pw.sx) *
                   (7.0 * qw.sxx - CAST(qw.sx AS DOUBLE) * qw.sx))))
              * 1e6 + 0.5) AS BIGINT) AS dq
          FROM dots JOIN wins pw ON pw.p = dots.p
          JOIN wins qw ON qw.p = dots.q),
        bothdir AS (
          SELECT pday AS posday, qday AS nnday, dq FROM pairs
          UNION ALL SELECT qday, pday, dq FROM pairs),
        profd AS (SELECT posday, MIN(dq) AS dq FROM bothdir GROUP BY posday),
        prof AS (
          SELECT p.posday, p.dq, MIN(b.nnday) AS nnday
          FROM profd p JOIN bothdir b ON b.posday = p.posday AND b.dq = p.dq
          GROUP BY p.posday, p.dq),
        motifs AS (
          SELECT 'motif' AS kind,
            CAST(ROW_NUMBER() OVER (ORDER BY dq, posday) AS BIGINT) AS rank,
            posday, nnday, dq
          FROM prof ORDER BY dq, posday LIMIT 3),
        discords AS (
          SELECT 'discord' AS kind,
            CAST(ROW_NUMBER() OVER (ORDER BY dq DESC, posday) AS BIGINT) AS rank,
            posday, nnday, dq
          FROM prof ORDER BY dq DESC, posday LIMIT 3)
        SELECT kind, rank, posday AS window_day, nn_day,
          FLOOR(SQRT(GREATEST(CAST(dq AS DOUBLE), 0.0) / 1e6)
                * 10000 + 0.500001) / 10000 AS znorm_dist
        FROM (SELECT kind, rank, posday, nnday AS nn_day, dq FROM motifs
              UNION ALL
              SELECT kind, rank, posday, nnday, dq FROM discords)
        ORDER BY kind, rank"""),
      "Matrix profile of daily volume (w=7, exclusion 7): top-3 weekly motifs + discords, exact-integer dots"),

    // ---------------------------------------------------------------- q318
    // Audience overlap between event types: Jaccard, cosine and lift
    // of the distinct-user sets — the co-engagement matrix a
    // growth/mix planner reads. One distinct pass; the pair join is
    // keyed on user and aggregates straight to the bounded type-pair
    // grid.
    Query(
      "q318_audience_overlap",
      (s, d) => {
        val ut = Tables.events(s, d)
          .select(col("user_id"), col("event_type")).distinct()
          .localCheckpoint()
        val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val nu = ut.select(col("user_id")).distinct().count() // bounded scalar
        val inter = ut.select(col("user_id"), col("event_type").as("ta"))
          .join(ut.select(col("user_id"), col("event_type").as("tb")), Seq("user_id"))
          .filter(col("ta") < col("tb"))
          .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("ab"))
        inter
          .join(broadcast(sizes.select(col("event_type").as("ta"), col("n").as("na"))),
            Seq("ta"))
          .join(broadcast(sizes.select(col("event_type").as("tb"), col("n").as("nb"))),
            Seq("tb"))
          .select(col("ta"), col("tb"), col("ab").as("n_shared"),
            Num.r6(col("ab").cast("double") /
              (col("na") + col("nb") - col("ab")).cast("double")).as("jaccard"),
            Num.r6(col("ab").cast("double") /
              sqrt(col("na").cast("double") * col("nb").cast("double")))
              .as("cosine"),
            Num.r4(col("ab").cast("double") * lit(nu.toDouble) /
              (col("na").cast("double") * col("nb").cast("double"))).as("lift"))
          .orderBy(col("ta"), col("tb"))
      },
      Some("""
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
                  FROM ut GROUP BY event_type),
        nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
        inter AS (
          SELECT a.event_type AS ta, b.event_type AS tb,
            CAST(COUNT(*) AS BIGINT) AS n_shared
          FROM ut a JOIN ut b ON a.user_id = b.user_id
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT ta, tb, n_shared,
          FLOOR((CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared))
                * 1000000 + 0.500001) / 1000000 AS jaccard,
          FLOOR((CAST(n_shared AS DOUBLE) / SQRT(CAST(sa.n AS DOUBLE) * sb.n))
                * 1000000 + 0.500001) / 1000000 AS cosine,
          FLOOR((CAST(n_shared AS DOUBLE) * nu /
                 (CAST(sa.n AS DOUBLE) * sb.n)) * 10000 + 0.500001) / 10000
            AS lift
        FROM inter
        JOIN sizes sa ON sa.event_type = ta
        JOIN sizes sb ON sb.event_type = tb
        CROSS JOIN nu
        ORDER BY ta, tb"""),
      "Event-type audience overlap: Jaccard / cosine / lift of distinct-user sets per type pair"),

    // ---------------------------------------------------------------- q319
    // Semivariogram of daily volume at lags 1–14: γ(h) =
    // Σ(x_{t+h} − x_t)² / (2·N_h) from exact integer squared
    // increments, with the sample variance as the sill and the
    // γ(h)/sill ratio — the "how far apart do days decorrelate"
    // geostatistics view that complements q170's ACF.
    Query(
      "q319_semivariogram",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint()
        val mo = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          Exact.m2("x", "x").as("sxx"))
        val a = daily.select(col("day").as("d1"), col("x").as("x1"))
        val b = daily.select(col("day").as("d2"), col("x").as("x2"))
        a.join(broadcast(b),
            col("d2") - col("d1") >= 1 && col("d2") - col("d1") <= 14)
          .groupBy((col("d2") - col("d1")).as("lag"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(((col("x2") - col("x1")) * (col("x2") - col("x1")))
              .cast("decimal(38,0)")).as("ss"))
          .crossJoin(broadcast(mo))
          .select(col("lag"), col("n_pairs"),
            Num.r4(col("ss").cast("double") /
              (lit(2.0) * col("n_pairs").cast("double"))).as("gamma"),
            Num.r4((col("ss").cast("double") /
              (lit(2.0) * col("n_pairs").cast("double"))) /
              ((col("sxx").cast("double") - col("sx").cast("double") *
                col("sx").cast("double") / col("n").cast("double")) /
                (col("n").cast("double") - lit(1.0)))).as("gamma_over_sill"))
          .orderBy(col("lag"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(x AS HUGEINT) * x) AS sxx FROM daily)
        SELECT b.day - a.day AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          FLOOR((CAST(SUM(CAST((b.x - a.x) * (b.x - a.x) AS HUGEINT)) AS DOUBLE)
                 / (2.0 * COUNT(*))) * 10000 + 0.500001) / 10000 AS gamma,
          FLOOR(((CAST(SUM(CAST((b.x - a.x) * (b.x - a.x) AS HUGEINT)) AS DOUBLE)
                  / (2.0 * COUNT(*))) /
                 ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) /
                  (CAST(n AS DOUBLE) - 1.0)))
                * 10000 + 0.500001) / 10000 AS gamma_over_sill
        FROM daily a JOIN daily b
          ON b.day - a.day >= 1 AND b.day - a.day <= 14
        CROSS JOIN mo
        GROUP BY b.day - a.day, sxx, sx, n
        ORDER BY lag"""),
      "Semivariogram of daily volume at lags 1-14 (exact squared increments, sill-normalized)")
  )
}
