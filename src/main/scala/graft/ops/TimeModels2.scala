package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Num, Query, Tables}

/** Round-6 continuation: serial-dependence diagnostics that complement
  * the model-fitting family in [[TimeModels]] — the autocorrelation
  * function (the diagnostic that picks AR orders and seasonal lags for
  * q160/q168) and the Theil–Sen robust slope (the rank-based trend
  * estimate that, unlike q145's OLS, one outlier cannot move).
  */
object TimeModels2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q170
    // Autocorrelation function at lags {1,2,3,6,12,24} h over the
    // per-user hourly mean series. ONE window pass computes every lag
    // as a lead column — no self-join — and one groupBy aggregates all
    // six numerators plus the denominator, so the whole query reuses
    // the user_id exchange. Exactness: the series is mean-centered with
    // the q167/q168 integer trick (c_t = nb·yq_t − Σyq, milli-unit y),
    // and every product goes through DECIMAL(38)/HUGEINT sums, so
    // r_k = Σc_t·c_{t+k} / Σc_t² has bit-identical integer numerator
    // and denominator in both engines (the nb² scale factor cancels in
    // the ratio). Bounds: nb ≤ time-span hours (720 here — scale-free),
    // |yq| ≤ 5.6e5 milli-units ⇒ |c| ≤ 8.1e8 and per-term |c·c| ≤
    // 6.5e17 < 2^63; the SUM side is 128-bit on both engines.
    Query(
      "q170_acf",
      (s, d) => {
        val lags = Seq(1, 2, 3, 6, 12, 24)
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
        val withLeads = lags.foldLeft(cent) { (df, k) =>
          df.withColumn(s"l$k", lead(col("c"), k).over(ordB))
        }
        val aggs =
          max(col("nb")).as("n_buckets") +:
            sum((col("c") * col("c")).cast("decimal(38,0)")).as("den") +:
            lags.flatMap(k => Seq(
              sum((col("c") * col(s"l$k")).cast("decimal(38,0)")).as(s"num$k"),
              count(col(s"l$k")).as(s"np$k")))
        val perLag = array(lags.map(k =>
          struct(lit(k).as("lag"), col(s"num$k").as("num"), col(s"np$k").as("np"))): _*)
        withLeads.groupBy(col("user_id"))
          .agg(aggs.head, aggs.tail: _*)
          .select(col("user_id"), col("n_buckets"), col("den"),
            explode(perLag).as("x"))
          .filter(col("x.np") >= 2 && col("den") > 0)
          .select(col("user_id"), col("n_buckets"),
            col("x.lag").as("lag"), col("x.np").as("n_pairs"),
            Num.r4(col("x.num").cast("double") / col("den").cast("double"))
              .as("acf"))
          .orderBy(col("user_id"), col("lag"))
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
        den AS (
          SELECT user_id, MAX(nb) AS n_buckets,
            SUM(CAST(c AS HUGEINT) * c) AS den
          FROM cent GROUP BY user_id),
        pairs AS (
          SELECT a.user_id, l.k AS lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
            SUM(CAST(a.c AS HUGEINT) * b.c) AS num
          FROM cent a
          CROSS JOIN (SELECT * FROM (VALUES (1),(2),(3),(6),(12),(24)) AS v(k)) l
          JOIN cent b ON b.user_id = a.user_id AND b.t = a.t + l.k
          GROUP BY a.user_id, l.k)
        SELECT p.user_id, d.n_buckets, CAST(p.lag AS INTEGER) AS lag, p.n_pairs,
          FLOOR((CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) * 10000 + 0.500001)
            / 10000 AS acf
        FROM pairs p JOIN den d USING (user_id)
        WHERE p.n_pairs >= 2 AND d.den > 0
        ORDER BY user_id, lag"""),
      "ACF at lags 1/2/3/6/12/24 h per key: exact-integer centered series, one window pass (no self-join)"),

    // ---------------------------------------------------------------- q173
    // Theil–Sen robust slope per key over the LAST-32 readings: the
    // median of all pairwise slopes (value/hour). Pairs are generated
    // by a self-join bounded to ≤ 32·31/2 per key — per-key constant
    // work no matter the corpus size (the rank-window prune runs before
    // the join, so the join input is 32 rows/key, not the raw stream).
    // Slopes are divisions of exact integers (micro-unit Δvalue over
    // µs Δt), so both engines feed IEEE-identical doubles into the same
    // type-7 median; same-timestamp pairs (Δt = 0) are excluded on both
    // sides. The ×3600 hour conversion applies after the median
    // (order-preserving), before the shared rounding.
    Query(
      "q173_theil_sen",
      (s, d) => {
        val recent = Window.partitionBy(col("user_id"))
          .orderBy(col("x").desc, col("event_id").desc)
        val pts = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("x"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .withColumn("rn", row_number().over(recent))
          .filter(col("rn") <= 32)
          .localCheckpoint() // feeds both join sides and the point count
        val npts = pts.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_points"))
        val a = pts.select(col("user_id"), col("rn").as("rna"),
          col("x").as("xa"), col("vq").as("va"))
        val b = pts.select(col("user_id"), col("rn").as("rnb"),
          col("x").as("xb"), col("vq").as("vb"))
        a.join(b, col("rnb") < col("rna") && a("user_id") === b("user_id"))
          .drop(b("user_id"))
          .filter(col("xb") =!= col("xa"))
          .withColumn("sl",
            (col("vb") - col("va")).cast("double") /
              (col("xb") - col("xa")).cast("double"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            percentile(col("sl"), lit(0.5)).as("med"))
          .join(npts, Seq("user_id"))
          .select(col("user_id"), col("n_points"), col("n_pairs"),
            Num.r4(col("med") * lit(3600.0)).as("theil_sen_per_hr"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH last32 AS (
          SELECT user_id, epoch_us(ts) AS x,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events QUALIFY rn <= 32),
        npts AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points
          FROM last32 GROUP BY user_id),
        pairs AS (
          SELECT a.user_id,
            CAST(b.vq - a.vq AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sl
          FROM last32 a JOIN last32 b
            ON b.user_id = a.user_id AND b.rn < a.rn AND b.x <> a.x)
        SELECT p.user_id, n.n_points, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          FLOOR(quantile_cont(sl, 0.5) * 3600.0 * 10000 + 0.500001) / 10000
            AS theil_sen_per_hr
        FROM pairs p JOIN npts n USING (user_id)
        GROUP BY p.user_id, n.n_points
        ORDER BY p.user_id"""),
      "Theil-Sen robust slope per key: median pairwise slope over the last-32 readings (bounded pairs)")
  )
}
