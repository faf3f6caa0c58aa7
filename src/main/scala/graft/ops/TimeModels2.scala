package graft.ops

import graft.ext.Exact
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
    // the ratio). Bounds: |c| ≤ 2·nb·|yq| grows with the time span
    // (nb = bucket count), so the c·c products are formed in
    // DECIMAL(19,0)×DECIMAL — exact at ANY span (ScaleUp's 100× events
    // stretch to 74k buckets/key, where an int64 c·c would overflow) —
    // and the SUM side is 128-bit on both engines.
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
        val cd = col("c").cast("decimal(19,0)")
        val aggs =
          max(col("nb")).as("n_buckets") +:
            sum(cd * col("c").cast("decimal(19,0)")).as("den") +:
            lags.flatMap(k => Seq(
              sum(cd * col(s"l$k").cast("decimal(19,0)")).as(s"num$k"),
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
        val b = pts.select(col("user_id").as("ub"), col("rn").as("rnb"),
          col("x").as("xb"), col("vq").as("vb"))
        a.join(b, col("rnb") < col("rna") && col("ub") === col("user_id"))
          .drop("ub")
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
      "Theil-Sen robust slope per key: median pairwise slope over the last-32 readings (bounded pairs)"),

    // ---------------------------------------------------------------- q177
    // Mann–Kendall trend test per key over the same LAST-32 readings —
    // the significance companion to q173's magnitude estimate (the
    // standard pairing: MK says WHETHER a monotone trend exists,
    // Theil–Sen says how steep). Everything before the final z is
    // exact-integer: S = Σ sign-pairs ∈ [-496, 496], and the variance
    // is carried as the INTEGER 18·Var = n(n−1)(2n+5) − Σt(t−1)(2t+5)
    // (t = tied-value group sizes), so both engines feed bit-identical
    // ints into the same sqrt/divide. Continuity-corrected z, ±1.96
    // verdict. Same bounded-pair shape as q173: prune to 32 rows/key
    // BEFORE the self-join.
    Query(
      "q177_mann_kendall",
      (s, d) => {
        val recent = Window.partitionBy(col("user_id"))
          .orderBy(col("x").desc, col("event_id").desc)
        val pts = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("x"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .withColumn("rn", row_number().over(recent))
          .filter(col("rn") <= 32)
          .localCheckpoint() // feeds both join sides and the tie table
        val a = pts.select(col("user_id"), col("rn").as("rna"), col("vq").as("va"))
        val b = pts.select(col("user_id").as("ub"), col("rn").as("rnb"),
          col("vq").as("vb"))
        val sstat = a.join(b, col("rnb") < col("rna") && col("ub") === col("user_id"))
          .groupBy(col("user_id"))
          .agg(sum(when(col("vb") > col("va"), 1L)
            .when(col("vb") < col("va"), -1L).otherwise(0L)).as("s_stat"))
        val ties = pts.groupBy(col("user_id"), col("vq"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_distinct"),
            sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tsum"),
            sum(col("t")).as("n"))
        val z = sstat.join(ties, Seq("user_id"))
          .withColumn("var18",
            col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tsum"))
          .withColumn("zraw",
            when(col("var18") <= 0, lit(0.0))
              .when(col("s_stat") > 0,
                (col("s_stat") - lit(1)).cast("double") /
                  sqrt(col("var18").cast("double") / lit(18.0)))
              .when(col("s_stat") < 0,
                (col("s_stat") + lit(1)).cast("double") /
                  sqrt(col("var18").cast("double") / lit(18.0)))
              .otherwise(lit(0.0)))
        z.select(col("user_id"), col("n").as("n_points"), col("s_stat"),
            col("var18"), Num.r4(col("zraw")).as("z"),
            when(col("zraw") > 1.96, lit("increasing"))
              .when(col("zraw") < -1.96, lit("decreasing"))
              .otherwise(lit("none")).as("trend"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH last32 AS (
          SELECT user_id, event_id,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events QUALIFY rn <= 32),
        sstat AS (
          SELECT a.user_id,
            SUM(CASE WHEN b.vq > a.vq THEN 1
                     WHEN b.vq < a.vq THEN -1 ELSE 0 END) AS s_stat
          FROM last32 a JOIN last32 b
            ON b.user_id = a.user_id AND b.rn < a.rn
          GROUP BY a.user_id),
        ties AS (
          SELECT user_id, SUM(t * (t - 1) * (2 * t + 5)) AS tsum,
            CAST(SUM(t) AS BIGINT) AS n
          FROM (SELECT user_id, vq, COUNT(*) AS t
                FROM last32 GROUP BY user_id, vq)
          GROUP BY user_id),
        z AS (
          SELECT s.user_id, t.n, s.s_stat,
            n * (n - 1) * (2 * n + 5) - tsum AS var18,
            CASE WHEN n * (n - 1) * (2 * n + 5) - tsum <= 0 THEN 0.0
                 WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                   / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE) / 18.0)
                 WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                   / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tsum AS DOUBLE) / 18.0)
                 ELSE 0.0 END AS zraw
          FROM sstat s JOIN ties t USING (user_id))
        SELECT user_id, n AS n_points, CAST(s_stat AS BIGINT) AS s_stat,
          CAST(var18 AS BIGINT) AS var18,
          FLOOR(zraw * 10000 + 0.500001) / 10000 AS z,
          CASE WHEN zraw > 1.96 THEN 'increasing'
               WHEN zraw < -1.96 THEN 'decreasing'
               ELSE 'none' END AS trend
        FROM z ORDER BY user_id"""),
      "Mann-Kendall trend test per key over the last-32 readings: integer S and 18*Var, continuity-corrected z"),

    // ---------------------------------------------------------------- q178
    // Cross-correlation between event-type hourly series at lags
    // ±{1,3,6,12,24} h (plus 0): "does `error` lead `purchase` by k
    // hours?" — the lead/lag diagnostic behind alert-propagation and
    // causal-ordering hunches. Series are mean-centered with the
    // integer trick PER TYPE (each type's nb·nb scale factor cancels
    // between the numerator and its own √denominator), products are
    // decimal-exact, and denominators are the FULL-series energies, so
    // ccf ∈ [−1, 1]. Alignment is by ABSOLUTE hour index (µs div 3.6e9)
    // — not per-type row number — so gaps stay gaps. The join output
    // is (hours × type-pairs × lags): bounded by the time span, never
    // by the row count.
    Query(
      "q178_cross_correlation",
      (s, d) => {
        val byT = Window.partitionBy(col("event_type"))
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
          .select(col("event_type"),
            (unix_micros(col("bucket")) / lit(3600000000L)).cast("long").as("hidx"),
            floor(col("hv") * lit(1000.0) + lit(0.5)).cast("long").as("yq"))
          .withColumn("nb", count(lit(1)).over(byT))
          .withColumn("toty", sum(col("yq")).over(byT))
          .withColumn("c", col("nb") * col("yq") - col("toty"))
          .select(col("event_type"), col("hidx"),
            col("c").cast("decimal(19,0)").as("cd"))
          .localCheckpoint() // feeds both join sides and the energy table
        val den = hourly.groupBy(col("event_type"))
          .agg(sum(col("cd") * col("cd")).as("den"))
        val lags = s.createDataFrame(
          Seq(-24L, -12L, -6L, -3L, -1L, 0L, 1L, 3L, 6L, 12L, 24L).map(Tuple1(_)))
          .toDF("lag")
        val aSide = hourly.select(col("event_type").as("type_a"),
          col("hidx"), col("cd").as("ca"))
          .crossJoin(broadcast(lags))
          .withColumn("target", col("hidx") + col("lag"))
        val bSide = hourly.select(col("event_type").as("type_b"),
          col("hidx").as("bh"), col("cd").as("cb"))
        aSide.join(bSide,
            col("target") === col("bh") && col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"), col("lag"))
          .agg(count(lit(1)).as("n_overlap"), sum(col("ca") * col("cb")).as("num"))
          .join(broadcast(den.select(col("event_type").as("type_a"),
            col("den").as("da"))), Seq("type_a"))
          .join(broadcast(den.select(col("event_type").as("type_b"),
            col("den").as("db"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("lag"), col("n_overlap"),
            Num.r4(col("num").cast("double") /
              sqrt(col("da").cast("double") * col("db").cast("double")))
              .as("ccf"))
          .orderBy(col("type_a"), col("type_b"), col("lag"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS bucket, AVG(value) AS hv
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        cent AS (
          SELECT event_type,
            epoch_us(bucket) // 3600000000 AS hidx,
            COUNT(*) OVER (PARTITION BY event_type)
              * CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT)
              - SUM(CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT))
                  OVER (PARTITION BY event_type) AS c
          FROM hourly),
        den AS (
          SELECT event_type, SUM(CAST(c AS HUGEINT) * c) AS den
          FROM cent GROUP BY event_type),
        lagv AS (SELECT * FROM (VALUES (-24),(-12),(-6),(-3),(-1),(0),
                                       (1),(3),(6),(12),(24)) AS v(lag)),
        pairs AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
            CAST(l.lag AS BIGINT) AS lag,
            CAST(COUNT(*) AS BIGINT) AS n_overlap,
            SUM(CAST(a.c AS HUGEINT) * b.c) AS num
          FROM cent a CROSS JOIN lagv l
          JOIN cent b ON b.hidx = a.hidx + l.lag
                     AND a.event_type < b.event_type
          GROUP BY a.event_type, b.event_type, l.lag)
        SELECT p.type_a, p.type_b, p.lag, p.n_overlap,
          FLOOR((CAST(num AS DOUBLE)
                 / SQRT(CAST(da.den AS DOUBLE) * CAST(db.den AS DOUBLE)))
                * 10000 + 0.500001) / 10000 AS ccf
        FROM pairs p
        JOIN den da ON da.event_type = p.type_a
        JOIN den db ON db.event_type = p.type_b
        ORDER BY type_a, type_b, lag"""),
      "cross-correlation between event-type hourly series at lags 0/±1/±3/±6/±12/±24 h: exact-integer centered, absolute-hour aligned"),

    // ---------------------------------------------------------------- q220
    // Rolling-origin forecast backtest of the q160 AR(1) model: every
    // post-warm-up point is a held-out one-step forecast (the
    // cumulative-prior frame IS the rolling origin — no leakage, the
    // q147 discipline), scored against the naive last-value forecast
    // via MASE = MAE_model/MAE_naive (Hyndman & Koehler 2006; naive
    // = the random-walk denominator that makes MASE scale-free).
    // MASE < 1 ⇔ the AR(1) genuinely beats persistence — the
    // accept/reject gate a forecasting pipeline needs before trusting
    // q161's bands. Exactness: both per-row absolute errors are
    // quantized to integer 1e-4 units with the shared ulp-absorbing
    // floor cut (the same grid q160 proves exact), so the per-user
    // sums and the win-share comparison are exact int64 on both
    // engines. 100 TB shape: ONE keyed cumulative window pass (the
    // q160 plan) + one grouped agg on the same user_id exchange.
    Query(
      "q220_forecast_backtest",
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val detect = udaf(new graft.functions.Ar1AnomalyAggregator(30, 95.0),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
        Tables.events(s, d)
          .withColumn("prev", lag(col("value"), 1).over(ord))
          .withColumn("rep",
            detect(coalesce(col("prev"), lit(Double.NaN)), col("value")).over(cum))
          .filter(col("rep.expected").isNotNull)
          .select(col("user_id"),
            floor(abs(col("value") - col("rep.expected")) * 10000
              + lit(0.500001)).cast("long").as("em"),
            floor(abs(col("value") - col("prev")) * 10000
              + lit(0.500001)).cast("long").as("en"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_eval"),
            sum(col("em")).as("sem"), sum(col("en")).as("sen"),
            sum(when(col("em") < col("en"), 1L).otherwise(0L)).as("wins"))
          .select(col("user_id"), col("n_eval"),
            Num.r6(col("sem").cast("double")
              / (col("n_eval") * lit(10000.0))).as("mae_model"),
            Num.r6(col("sen").cast("double")
              / (col("n_eval") * lit(10000.0))).as("mae_naive"),
            when(col("sen") > 0,
              Num.r6(col("sem").cast("double") / col("sen").cast("double")))
              .as("mase"),
            Num.r6(col("wins").cast("double") / col("n_eval").cast("double"))
              .as("model_win_share"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH lagd AS (
          SELECT user_id, event_id, ts, value,
            LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events),
        s AS (
          SELECT user_id, value, prev,
            REGR_COUNT(value, prev) OVER w AS np,
            REGR_SLOPE(value, prev) OVER w AS phi,
            REGR_AVGX(value, prev) OVER w AS mx,
            REGR_AVGY(value, prev) OVER w AS my,
            REGR_SXX(value, prev) OVER w AS sxx,
            REGR_SXY(value, prev) OVER w AS sxy,
            REGR_SYY(value, prev) OVER w AS syy
          FROM lagd
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        e AS (
          SELECT user_id, value, prev, my + phi * (prev - mx) AS pred
          FROM s
          WHERE prev IS NOT NULL AND np >= 30 AND sxx > 0
            AND (syy - sxy*sxy/sxx) > 0),
        q AS (
          SELECT user_id,
            CAST(FLOOR(ABS(value - pred) * 10000 + 0.500001) AS BIGINT) AS em,
            CAST(FLOOR(ABS(value - prev) * 10000 + 0.500001) AS BIGINT) AS en
          FROM e)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_eval,
          FLOOR((CAST(SUM(em) AS DOUBLE) / (COUNT(*) * 10000.0))
                * 1000000 + 0.500001) / 1000000 AS mae_model,
          FLOOR((CAST(SUM(en) AS DOUBLE) / (COUNT(*) * 10000.0))
                * 1000000 + 0.500001) / 1000000 AS mae_naive,
          CASE WHEN SUM(en) > 0 THEN
            FLOOR((CAST(SUM(em) AS DOUBLE) / CAST(SUM(en) AS DOUBLE))
                  * 1000000 + 0.500001) / 1000000 END AS mase,
          FLOOR((CAST(COUNT(*) FILTER (WHERE em < en) AS DOUBLE) / COUNT(*))
                * 1000000 + 0.500001) / 1000000 AS model_win_share
        FROM q GROUP BY user_id ORDER BY user_id"""),
      "rolling-origin AR(1) backtest vs the naive last-value forecast: per-user MASE + win share on the shared 1e-4 error grid, no leakage"),

    // ---------------------------------------------------------------- q241
    // Hurst exponent by rescaled-range (R/S) analysis (Hurst 1951;
    // Mandelbrot & Wallis 1969) over each event type's hourly mean
    // series: H ≈ 0.5 = memoryless, H → 1 = persistent/trending,
    // H → 0 = mean-reverting — the long-memory diagnostic that says
    // whether q160's AR(1) or a long-range model fits the traffic.
    // For block sizes n ∈ {8,16,32,64}: split the series into
    // complete blocks, per block compute the range of cumulative
    // deviations from the block mean over the population stddev, and
    // regress ln(mean R/S) on ln(n). Exactness: with P_k the in-block
    // prefix sum, c_k = n·P_k − k·S is the EXACT scaled deviation
    // (c_n = 0, so the range always brackets 0), and
    // R/S = (max c − min c)/√(n·ΣY² − S²) has an all-integer numerator
    // and radicand; per-block R/S is micro-quantized BEFORE the
    // cross-block mean, ln enters micro-quantized (q234's discipline),
    // and the 4-point OLS slope is a ratio of exact int64 sums.
    // 100 TB shape: the hourly grid is time-bounded, every window is
    // (type, n, block)-partitioned, and the final fold is a 4-row
    // bounded aggregate per type.
    Query(
      "q241_hurst_rs",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
          .select(col("event_type"),
            (row_number().over(Window.partitionBy(col("event_type"))
              .orderBy(col("bucket"))) - 1).cast("long").as("t"),
            floor(col("hv") * lit(1000.0) + lit(0.5)).cast("long").as("yq"))
          .localCheckpoint() // time-bounded grid; replicated 4x below
        val sizes = s.createDataFrame(Seq(Tuple1(8L), Tuple1(16L),
          Tuple1(32L), Tuple1(64L))).toDF("bn")
        val wB = Window.partitionBy(col("event_type"), col("bn"), col("blk"))
        val blocks = hourly.crossJoin(broadcast(sizes))
          .withColumn("blk", expr("t div bn"))
          .withColumn("k", expr("t % bn") + lit(1L))
          .withColumn("p", sum(col("yq")).over(
            wB.orderBy(col("k")).rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .withColumn("cnt", count(lit(1)).over(wB))
          .withColumn("sb", sum(col("yq")).over(wB))
          .withColumn("ssb", sum((col("yq") * col("yq"))
            .cast("decimal(38,0)")).over(wB))
          .filter(col("cnt") === col("bn")) // complete blocks only
          .withColumn("c", col("bn") * col("p") - col("k") * col("sb"))
        val perBlock = blocks
          .groupBy(col("event_type"), col("bn"), col("blk"),
            col("sb"), col("ssb"))
          .agg(max(col("c")).as("cmax"), min(col("c")).as("cmin"))
          .withColumn("rad", (col("bn") * col("ssb")).cast("double") -
            col("sb").cast("double") * col("sb").cast("double"))
          .filter(col("rad") > 0) // constant blocks carry no R/S
          .withColumn("rsq", floor((col("cmax") - col("cmin")).cast("double") /
            sqrt(col("rad")) * lit(1000000.0) + lit(0.5)).cast("long"))
        val perSize = perBlock
          .groupBy(col("event_type"), col("bn"))
          .agg(count(lit(1)).as("nblk"), sum(col("rsq")).as("srs"))
          .withColumn("rs", col("srs").cast("double") /
            col("nblk").cast("double") / lit(1e6))
          .withColumn("x", floor(log(col("bn").cast("double")) * lit(1000000.0)
            + lit(0.5)).cast("long"))
          .withColumn("y", floor(log(col("rs")) * lit(1000000.0)
            + lit(0.5)).cast("long"))
        val npts = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(countDistinct(date_trunc("hour", col("ts"))).as("n_hours"))
        perSize
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("kk"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            max(when(col("bn") === 8, col("rs"))).as("rs8"),
            max(when(col("bn") === 64, col("rs"))).as("rs64"))
          .filter(col("kk") === 4) // need all four sizes for the fit
          .join(broadcast(npts), Seq("event_type"))
          .select(col("event_type"), col("n_hours"),
            Num.r4(col("rs8")).as("rs8"),
            Num.r4(col("rs64")).as("rs64"),
            Num.r4((col("kk") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (col("kk") * col("sxx") - col("sx") * col("sx"))
                .cast("double")).as("hurst"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type,
            CAST(ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY DATE_TRUNC('hour', ts)) - 1 AS BIGINT) AS t,
            CAST(FLOOR(AVG(value) * 1000.0 + 0.5) AS BIGINT) AS yq
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        blocks AS (
          SELECT event_type, bn, t // bn AS blk, t % bn + 1 AS k, yq
          FROM hourly CROSS JOIN (SELECT * FROM (VALUES (CAST(8 AS BIGINT)),
            (CAST(16 AS BIGINT)), (CAST(32 AS BIGINT)),
            (CAST(64 AS BIGINT))) AS v(bn)) sz),
        win AS (
          SELECT event_type, bn, blk, k,
            SUM(yq) OVER (PARTITION BY event_type, bn, blk ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            COUNT(*) OVER (PARTITION BY event_type, bn, blk) AS cnt,
            SUM(yq) OVER (PARTITION BY event_type, bn, blk) AS sb,
            SUM(CAST(yq AS HUGEINT) * yq)
              OVER (PARTITION BY event_type, bn, blk) AS ssb
          FROM blocks),
        cdev AS (
          SELECT event_type, bn, blk, sb, ssb,
            bn * p - k * sb AS c
          FROM win WHERE cnt = bn),
        per_block AS (
          SELECT event_type, bn, blk,
            CAST(FLOOR(CAST(MAX(c) - MIN(c) AS DOUBLE)
              / SQRT(CAST(bn * ssb AS DOUBLE)
                     - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
              * 1000000.0 + 0.5) AS BIGINT) AS rsq
          FROM cdev
          WHERE CAST(bn * ssb AS DOUBLE)
                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
          GROUP BY event_type, bn, blk, sb, ssb),
        per_size AS (
          SELECT event_type, bn,
            CAST(SUM(rsq) AS DOUBLE) / COUNT(*) / 1e6 AS rs
          FROM per_block GROUP BY event_type, bn),
        pts AS (
          SELECT event_type, bn, rs,
            CAST(FLOOR(LN(CAST(bn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
            CAST(FLOOR(LN(rs) * 1000000.0 + 0.5) AS BIGINT) AS y
          FROM per_size),
        fit AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS kk,
            SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy, SUM(x*x) AS sxx,
            MAX(CASE WHEN bn = 8 THEN rs END) AS rs8,
            MAX(CASE WHEN bn = 64 THEN rs END) AS rs64
          FROM pts GROUP BY event_type HAVING COUNT(*) = 4),
        npts AS (
          SELECT event_type,
            CAST(COUNT(DISTINCT DATE_TRUNC('hour', ts)) AS BIGINT) AS n_hours
          FROM events GROUP BY event_type)
        SELECT f.event_type, n.n_hours,
          FLOOR(rs8 * 10000 + 0.500001) / 10000 AS rs8,
          FLOOR(rs64 * 10000 + 0.500001) / 10000 AS rs64,
          FLOOR((CAST(kk * sxy - sx * sy AS DOUBLE)
                 / CAST(kk * sxx - sx * sx AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS hurst
        FROM fit f JOIN npts n ON n.event_type = f.event_type
        ORDER BY f.event_type"""),
      "Hurst exponent by R/S analysis over hourly mean series: exact-integer cumulative deviations, micro-quantized per-block R/S, 4-point integer OLS"),

    // ---------------------------------------------------------------- q249
    // Holt–Winters with fixed additive seasonality per event type:
    // the q166 hour-of-day profile deseasonalizes the hourly series,
    // the q165 Holt recursion runs on what remains, and the h-step
    // forecasts re-add the target hour's seasonal — the full
    // level+trend+season forecaster, composed from pinned parts.
    // Exactness discipline: hourly means, the centered-MA trend and
    // the seasonal profile are all micro-quantized int64 BEFORE any
    // averaging sum (engine association can't surface), so the Holt
    // recursion — bit-identical per q165 — receives bit-identical
    // deseasonalized inputs. Hour buckets bound every window by the
    // time span, never the row count.
    Query(
      "q249_holt_winters",
      (s, d) => {
        import org.apache.spark.sql.Encoders
        val hourly = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("bucket"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(col("vq")).as("sq"), count(lit(1)).as("c"))
          .withColumn("mq",
            floor(col("sq").cast("double") / col("c") + lit(0.5)).cast("long"))
        val wMA = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(-12, 12)
        val detr = hourly
          .withColumn("man", sum(col("mq")).over(wMA))
          .withColumn("mac", count(lit(1)).over(wMA))
          .withColumn("dq", col("mq") -
            floor(col("man").cast("double") / col("mac") + lit(0.5)).cast("long"))
        val seasonal = detr
          .groupBy(col("event_type"), hour(col("bucket")).as("hod"))
          .agg(floor(sum(col("dq")).cast("double") / count(lit(1)) + lit(0.5))
            .cast("long").as("s_q"))
          .localCheckpoint() // bounded (type × 24) profile, one scan
        val holt = udaf(new graft.functions.HoltAggregator(0.3, 0.1),
          Encoders.scalaDouble)
        val ord = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = hourly.select(col("event_type"), col("bucket"), col("mq"),
            hour(col("bucket")).as("hod"))
          .join(broadcast(seasonal), Seq("event_type", "hod"))
          .withColumn("ds", (col("mq") - col("s_q")).cast("double") / lit(1e6))
          .withColumn("st", holt(col("ds")).over(cum))
          .withColumn("nb", count(lit(1)).over(
            Window.partitionBy(col("event_type"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type")).orderBy(col("bucket").desc)))
          .filter(col("rn") === 1)
        def fc(h: Int) = {
          val sh = seasonal.select(col("event_type"),
            col("hod").as(s"hod$h"), (col("s_q").cast("double") / lit(1e6))
              .as(s"sv$h"))
          (run: org.apache.spark.sql.DataFrame) => run
            .withColumn(s"hod$h", (col("hod") + lit(h)) % 24)
            .join(broadcast(sh), Seq("event_type", s"hod$h"), "left")
        }
        Seq(1, 2, 3).foldLeft(run.drop("rn"))((df, h) => fc(h)(df))
          .select(col("event_type"), col("nb").as("n_buckets"),
            Num.r4(col("st._1")).as("level"),
            Num.r4(col("st._2")).as("trend"),
            Num.r4(col("st._1") + col("st._2") + coalesce(col("sv1"), lit(0.0)))
              .as("fc1"),
            Num.r4(col("st._1") + lit(2.0) * col("st._2")
              + coalesce(col("sv2"), lit(0.0))).as("fc2"),
            Num.r4(col("st._1") + lit(3.0) * col("st._2")
              + coalesce(col("sv3"), lit(0.0))).as("fc3"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH RECURSIVE hourly AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS bucket,
            CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
              AS sq,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        hm AS (
          SELECT event_type, bucket,
            CAST(FLOOR(CAST(sq AS DOUBLE) / c + 0.5) AS BIGINT) AS mq
          FROM hourly),
        detr AS (
          SELECT event_type, bucket, mq,
            mq - CAST(FLOOR(
              CAST(SUM(mq) OVER w AS DOUBLE) / COUNT(*) OVER w + 0.5)
              AS BIGINT) AS dq
          FROM hm
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        seasonal AS (
          SELECT event_type,
            CAST(EXTRACT(hour FROM bucket) AS BIGINT) AS hod,
            CAST(FLOOR(CAST(SUM(dq) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
              AS s_q
          FROM detr GROUP BY event_type, EXTRACT(hour FROM bucket)),
        src AS (
          SELECT h.event_type,
            ROW_NUMBER() OVER (PARTITION BY h.event_type ORDER BY h.bucket)
              AS rn,
            CAST(h.mq - s.s_q AS DOUBLE) / 1e6 AS y,
            CAST(EXTRACT(hour FROM h.bucket) AS BIGINT) AS hod
          FROM hm h JOIN seasonal s
            ON s.event_type = h.event_type
           AND s.hod = CAST(EXTRACT(hour FROM h.bucket) AS BIGINT)),
        nmax AS (SELECT event_type AS nk, CAST(MAX(rn) AS BIGINT) AS n
                 FROM src GROUP BY event_type),
        walk(event_type, rn, l, b) AS (
          SELECT event_type, rn, y, CAST(0.0 AS DOUBLE) FROM src WHERE rn = 1
          UNION ALL
          SELECT s.event_type, s.rn,
            0.3 * s.y + (CAST(1.0 AS DOUBLE) - 0.3) * (w.l + w.b),
            0.1 * ((0.3 * s.y + (CAST(1.0 AS DOUBLE) - 0.3) * (w.l + w.b))
                   - w.l)
              + (CAST(1.0 AS DOUBLE) - 0.1) * w.b
          FROM walk w JOIN src s
            ON s.event_type = w.event_type AND s.rn = w.rn + 1)
        SELECT w.event_type, n AS n_buckets,
          FLOOR(l * 10000 + 0.500001) / 10000 AS level,
          FLOOR(b * 10000 + 0.500001) / 10000 AS trend,
          FLOOR((l + b + COALESCE(s1.s_q, 0) / 1e6) * 10000 + 0.500001)
            / 10000 AS fc1,
          FLOOR((l + 2.0 * b + COALESCE(s2.s_q, 0) / 1e6) * 10000 + 0.500001)
            / 10000 AS fc2,
          FLOOR((l + 3.0 * b + COALESCE(s3.s_q, 0) / 1e6) * 10000 + 0.500001)
            / 10000 AS fc3
        FROM walk w
        JOIN nmax ON nk = w.event_type AND w.rn = n
        JOIN src last ON last.event_type = w.event_type AND last.rn = n
        LEFT JOIN seasonal s1
          ON s1.event_type = w.event_type AND s1.hod = (last.hod + 1) % 24
        LEFT JOIN seasonal s2
          ON s2.event_type = w.event_type AND s2.hod = (last.hod + 2) % 24
        LEFT JOIN seasonal s3
          ON s3.event_type = w.event_type AND s3.hod = (last.hod + 3) % 24
        ORDER BY w.event_type"""),
      "Holt-Winters with fixed additive hour-of-day seasonality: micro-quantized deseasonalization feeds the bit-exact q165 Holt recursion, h-step forecasts re-seasonalized"),

    // ---------------------------------------------------------------- q263
    // STL strength-of-trend / strength-of-seasonality (Hyndman's
    // tsfeatures convention): Ft = max(0, 1 − V(R)/V(T+R)),
    // Fs = max(0, 1 − V(R)/V(S+R)) over the q166/q249 decomposition —
    // the two numbers that say whether q165's trend model or q249's
    // seasonal model is even worth fitting for a series. Every
    // component (hourly mean, centered-MA trend, hour-of-day
    // seasonal, remainder) is the micro-quantized int64 of the q249
    // chain, and each variance is the EXACT integer n·Σx² − (Σx)² in
    // DECIMAL(38) — one double division per ratio at the very end.
    Query(
      "q263_stl_strength",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("bucket"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(col("vq")).as("sq"), count(lit(1)).as("c"))
          .withColumn("mq",
            floor(col("sq").cast("double") / col("c") + lit(0.5)).cast("long"))
        val wMA = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(-12, 12)
        val detr = hourly
          .withColumn("tq", floor(sum(col("mq")).over(wMA).cast("double")
            / count(lit(1)).over(wMA) + lit(0.5)).cast("long"))
          .withColumn("dq", col("mq") - col("tq"))
          .withColumn("hod", hour(col("bucket")))
          .localCheckpoint() // bounded hour-bucket frame, one scan
        val seasonal = detr
          .groupBy(col("event_type"), col("hod"))
          .agg(floor(sum(col("dq")).cast("double") / count(lit(1)) + lit(0.5))
            .cast("long").as("s_q"))
        val parts = detr.join(broadcast(seasonal), Seq("event_type", "hod"))
          .select(col("event_type"),
            (col("dq") - col("s_q")).as("r"),   // remainder
            col("dq").as("sr"),                 // S + R (detrended)
            (col("mq") - col("s_q")).as("tr"))  // T + R (deseasonalized)
        def ss(c: org.apache.spark.sql.Column) =
          (count(lit(1)).cast("decimal(38,0)")
            * sum((c * c).cast("decimal(38,0)"))
            - sum(c).cast("decimal(38,0)") * sum(c).cast("decimal(38,0)"))
        parts.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_buckets"),
            ss(col("r")).as("vr"), ss(col("sr")).as("vsr"),
            ss(col("tr")).as("vtr"))
          .select(col("event_type"), col("n_buckets"),
            when(col("vtr") > 0, Num.r6(greatest(lit(0.0),
              lit(1.0) - col("vr").cast("double") / col("vtr").cast("double"))))
              .as("trend_strength"),
            when(col("vsr") > 0, Num.r6(greatest(lit(0.0),
              lit(1.0) - col("vr").cast("double") / col("vsr").cast("double"))))
              .as("seasonal_strength"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH hourly AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS bucket,
            CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
              AS sq,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        hm AS (
          SELECT event_type, bucket,
            CAST(FLOOR(CAST(sq AS DOUBLE) / c + 0.5) AS BIGINT) AS mq
          FROM hourly),
        detr AS (
          SELECT event_type, bucket, mq,
            CAST(FLOOR(CAST(SUM(mq) OVER w AS DOUBLE) / COUNT(*) OVER w
              + 0.5) AS BIGINT) AS tq,
            CAST(EXTRACT(hour FROM bucket) AS INTEGER) AS hod
          FROM hm
          WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                       ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        d2 AS (SELECT event_type, bucket, mq, tq, mq - tq AS dq, hod
               FROM detr),
        seasonal AS (
          SELECT event_type, hod,
            CAST(FLOOR(CAST(SUM(dq) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
              AS s_q
          FROM d2 GROUP BY event_type, hod),
        parts AS (
          SELECT d.event_type,
            d.dq - s.s_q AS r, d.dq AS sr, d.mq - s.s_q AS tr
          FROM d2 d JOIN seasonal s
            ON s.event_type = d.event_type AND s.hod = d.hod),
        agg AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
            COUNT(*) * SUM(r * r) - SUM(r) * SUM(r) AS vr,
            COUNT(*) * SUM(sr * sr) - SUM(sr) * SUM(sr) AS vsr,
            COUNT(*) * SUM(tr * tr) - SUM(tr) * SUM(tr) AS vtr
          FROM parts GROUP BY event_type)
        SELECT event_type, n_buckets,
          CASE WHEN vtr > 0 THEN
            FLOOR(GREATEST(0.0, 1.0 - CAST(vr AS DOUBLE) / CAST(vtr AS DOUBLE))
                  * 1000000 + 0.500001) / 1000000 END AS trend_strength,
          CASE WHEN vsr > 0 THEN
            FLOOR(GREATEST(0.0, 1.0 - CAST(vr AS DOUBLE) / CAST(vsr AS DOUBLE))
                  * 1000000 + 0.500001) / 1000000 END AS seasonal_strength
        FROM agg ORDER BY event_type"""),
      "STL strength-of-trend/seasonality (Hyndman tsfeatures): exact integer variances of remainder vs detrended/deseasonalized components"),

    // ---------------------------------------------------------------- q378
    // Seasonal Mann–Kendall (Hirsch–Slack) on daily volume: q177's MK
    // recipe applied WITHIN each weekday stratum (so the weekly cycle
    // cannot masquerade as trend), then combined: S = Σ_wd S_wd,
    // Var·18 = Σ_wd [n(n−1)(2n+5) − Σt(t−1)(2t+5)] — all exact
    // integers into one continuity-corrected z. The pair join is
    // within-stratum over the calendar-bounded day table (~(T/7)²·7
    // pairs), never over raw events.
    Query(
      "q378_mk_seasonal",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
          .withColumn("wd", expr("dy % 7"))
          .localCheckpoint() // calendar-bounded
        val a = daily.select(col("wd"), col("dy").as("da"), col("y").as("va"))
        val b = daily.select(col("wd"), col("dy").as("db"), col("y").as("vb"))
        val sPer = a.join(b, Seq("wd")).filter(col("db") > col("da"))
          .groupBy(col("wd"))
          .agg(sum(when(col("vb") > col("va"), 1L)
            .when(col("vb") < col("va"), -1L).otherwise(0L)).as("s_wd"))
        val varPer = daily.groupBy(col("wd"), col("y"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("wd"))
          .agg(sum(col("t")).as("n"),
            sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tsum"))
          .select(col("wd"),
            (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tsum"))
              .as("var18_wd"), col("n"))
        val comb = sPer.join(varPer, Seq("wd"))
          .agg(sum(col("n")).as("n_days"), sum(col("s_wd")).as("s_stat"),
            sum(col("var18_wd")).as("var18"))
        comb.select(col("n_days"), col("s_stat"), col("var18"),
            Num.r4(when(col("var18") <= 0, lit(0.0))
              .when(col("s_stat") > 0,
                (col("s_stat") - 1).cast("double") /
                  sqrt(col("var18").cast("double") / lit(18.0)))
              .when(col("s_stat") < 0,
                (col("s_stat") + 1).cast("double") /
                  sqrt(col("var18").cast("double") / lit(18.0)))
              .otherwise(lit(0.0))).as("z"))
          .withColumn("trend",
            when(col("z") > 1.96, lit("increasing"))
              .when(col("z") < -1.96, lit("decreasing"))
              .otherwise(lit("none")))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y,
            epoch_us(ts) // 86400000000 % 7 AS wd
          FROM events GROUP BY 1, 3),
        sPer AS (
          SELECT a.wd,
            CAST(SUM(CASE WHEN b.y > a.y THEN 1
                     WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_wd
          FROM daily a JOIN daily b ON a.wd = b.wd AND b.dy > a.dy
          GROUP BY a.wd),
        varPer AS (
          SELECT wd, CAST(SUM(t) AS BIGINT) AS n,
            CAST(SUM(t) * (SUM(t) - 1) * (2 * SUM(t) + 5)
              - SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS var18_wd
          FROM (SELECT wd, y, CAST(COUNT(*) AS BIGINT) AS t
                FROM daily GROUP BY wd, y)
          GROUP BY wd),
        comb AS (
          SELECT CAST(SUM(n) AS BIGINT) AS n_days,
            CAST(SUM(s_wd) AS BIGINT) AS s_stat,
            CAST(SUM(var18_wd) AS BIGINT) AS var18
          FROM sPer JOIN varPer USING (wd)),
        zr AS (
          SELECT n_days, s_stat, var18,
            FLOOR((CASE WHEN var18 <= 0 THEN 0.0
                   WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                     / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                   WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                     / SQRT(CAST(var18 AS DOUBLE) / 18.0)
                   ELSE 0.0 END) * 10000 + 0.500001) / 10000 AS z
          FROM comb)
        SELECT n_days, s_stat, var18, z,
          CASE WHEN z > 1.96 THEN 'increasing'
               WHEN z < -1.96 THEN 'decreasing'
               ELSE 'none' END AS trend
        FROM zr"""),
      "Seasonal Mann-Kendall (Hirsch-Slack) on daily volume: exact integer per-weekday S and 18*Var with tie correction, combined continuity-corrected z"),

    // ---------------------------------------------------------------- q393
    // Forecast scorecard of the seasonal-naive (lag-7) predictor on
    // daily volume: SMAPE, WAPE, RMSE, and Theil's U₂ against the
    // persistence (lag-1) benchmark — the squared-error/percentage
    // companions to q371's MASE (MAE family) and q365's pinball
    // (quantile family), together the full classical accuracy
    // battery. Scored on the common support (position ≥ 7 so both
    // lags exist); |e| and e² sums are exact integers (squares on
    // DECIMAL), per-day SMAPE terms are nano-quantized before the
    // cross-day sum, Theil's U₂ is a ratio of exact integer sums
    // (NULL when the persistence error is zero).
    Query(
      "q393_forecast_scorecard",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val w = Window.orderBy(col("dy"))
        val scored = daily
          .withColumn("l1", lag(col("y"), 1).over(w))
          .withColumn("l7", lag(col("y"), 7).over(w))
          .filter(col("l7").isNotNull)
          .select(col("y"), col("l1"), col("l7"),
            abs(col("y") - col("l7")).as("a7"),
            abs(col("y") - col("l1")).as("a1"))
          .withColumn("sq",
            floor(lit(2.0) * col("a7").cast("double") * lit(1e9)
              / (col("y") + col("l7")).cast("double") + lit(0.5)).cast("long"))
        scored.agg(count(lit(1)).as("m"),
            sum(col("sq")).as("ssq"),
            sum(col("a7")).as("sa7"),
            sum(col("y")).as("sy"),
            Exact.m2("a7", "a7").as("s7q"),
            Exact.m2("a1", "a1").as("s1q"))
          .select(col("m").as("n_scored"),
            Num.r4(col("ssq").cast("double")
              / (col("m").cast("double") * lit(1e9))).as("smape"),
            Num.r4(col("sa7").cast("double") / col("sy").cast("double"))
              .as("wape"),
            Num.r4(sqrt(col("s7q").cast("double") / col("m").cast("double")))
              .as("rmse_seasonal"),
            when(col("s1q") === 0, lit(null).cast("double"))
              .otherwise(Num.r4(sqrt(col("s7q").cast("double")
                / col("s1q").cast("double")))).as("theil_u2"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        lagged AS (
          SELECT y,
            LAG(y, 1) OVER (ORDER BY dy) AS l1,
            LAG(y, 7) OVER (ORDER BY dy) AS l7
          FROM daily),
        scored AS (
          SELECT y, ABS(y - l7) AS a7, ABS(y - l1) AS a1,
            CAST(FLOOR(2.0 * ABS(y - l7) * 1e9 / (y + l7) + 0.5) AS BIGINT)
              AS sq
          FROM lagged WHERE l7 IS NOT NULL),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS m,
            CAST(SUM(sq) AS BIGINT) AS ssq,
            CAST(SUM(a7) AS BIGINT) AS sa7,
            CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(a7 AS HUGEINT) * a7) AS s7q,
            SUM(CAST(a1 AS HUGEINT) * a1) AS s1q
          FROM scored)
        SELECT m AS n_scored,
          FLOOR((CAST(ssq AS DOUBLE) / (CAST(m AS DOUBLE) * 1e9))
                * 10000 + 0.500001) / 10000 AS smape,
          FLOOR((CAST(sa7 AS DOUBLE) / sy) * 10000 + 0.500001) / 10000 AS wape,
          FLOOR(SQRT(CAST(s7q AS DOUBLE) / m) * 10000 + 0.500001) / 10000
            AS rmse_seasonal,
          CASE WHEN s1q = 0 THEN NULL
               ELSE FLOOR(SQRT(CAST(s7q AS DOUBLE) / CAST(s1q AS DOUBLE))
                          * 10000 + 0.500001) / 10000 END AS theil_u2
        FROM agg"""),
      "Seasonal-naive forecast scorecard on daily volume: SMAPE/WAPE/RMSE and Theil U2 vs persistence, exact integer error sums"),

    // ---------------------------------------------------------------- q398
    // Sen's slope of the GLOBAL daily-volume trend — the magnitude
    // companion to the Mann–Kendall tests (q177 per key, q378
    // seasonal): the median of all pairwise slopes (y_j−y_i)/(j−i)
    // over the positioned day table, reported per day and per week.
    // Each slope is micro-quantized ((y_j−y_i)·1e6 stays exact in a
    // double, the division is deterministic IEEE), and the median is
    // the LOWER median selected by exact rank (no interpolation, no
    // cross-engine percentile semantics). The pair join is over the
    // calendar-bounded day table ((T²)/2 pairs, q378's cost shape),
    // never over raw events.
    Query(
      "q398_sen_slope",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val idx = daily
          .withColumn("t", row_number().over(Window.orderBy(col("dy")))
            .cast("long") - 1L)
          .localCheckpoint() // calendar-bounded
        val a = idx.select(col("t").as("ta"), col("y").as("ya"))
        val b = idx.select(col("t").as("tb"), col("y").as("yb"))
        val slopes = a.join(b, col("tb") > col("ta"))
          .select(floor((col("yb") - col("ya")).cast("double") * lit(1e6)
            / (col("tb") - col("ta")).cast("double") + lit(0.5)).cast("long")
            .as("sq"))
        val ranked = slopes
          .withColumn("rn", row_number().over(Window.orderBy(col("sq"))))
        ranked.crossJoin(broadcast(slopes.agg(count(lit(1)).as("m"))))
          .filter(col("rn") === expr("(m + 1) div 2"))
          .select(col("m").as("n_pairs"),
            Num.r4(col("sq").cast("double") / lit(1e6)).as("slope_per_day"),
            Num.r4(col("sq").cast("double") * lit(7.0) / lit(1e6))
              .as("slope_per_week"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT ROW_NUMBER() OVER (ORDER BY dy) - 1 AS t, y FROM daily),
        slopes AS (
          SELECT CAST(FLOOR(CAST(b.y - a.y AS DOUBLE) * 1e6 / (b.t - a.t)
            + 0.5) AS BIGINT) AS sq
          FROM idx a JOIN idx b ON b.t > a.t),
        m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM slopes),
        ranked AS (
          SELECT sq, ROW_NUMBER() OVER (ORDER BY sq) AS rn FROM slopes)
        SELECT m AS n_pairs,
          FLOOR((CAST(sq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS slope_per_day,
          FLOOR((CAST(sq AS DOUBLE) * 7.0 / 1e6) * 10000 + 0.500001) / 10000
            AS slope_per_week
        FROM ranked CROSS JOIN m
        WHERE rn = (m + 1) // 2"""),
      "Sen's slope of the global daily-volume trend: lower-median of micro-quantized pairwise slopes over the calendar-bounded pair table")
  )
}
