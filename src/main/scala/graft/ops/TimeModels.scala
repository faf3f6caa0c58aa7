package graft.ops

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Num, Query, Tables}
import graft.functions.{Ar1AnomalyAggregator, Ar1ForecastAggregator, EtsAggregator, HoltAggregator}

/** ARIMA-family M1/M2 upgrades as oracle-checked queries (reference:
  * flink_statements.tf:191-202, 305-316 — Confluent's ML built-ins are
  * ARIMA variants; round 5's q22/q24 pin mean/trend baselines, these
  * pin the serially-correlated models). All three run through the
  * typed Aggregators in [[graft.functions.TimeModels]], exercised
  * exactly as the streaming state processors would fold them.
  */
object TimeModels {

  private val Z = graft.functions.Stats.normalQuantile(0.5 + 95.0 / 200.0)

  // shared SQL fragments: lag pairs + cumulative prior-pair regression
  private val LagCte = """
    lagd AS (
      SELECT user_id, event_id, ts, value,
        LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events)"""

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q160
    // AR(1) residual anomaly: fit y_t = c + phi*y_{t-1} on the key's
    // PRIOR lag pairs (cumulative frame through 1 PRECEDING), flag the
    // newest point outside +-z*sigma of its one-step prediction.
    Query(
      "q160_ar1_anomaly",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val detect = udaf(new Ar1AnomalyAggregator(30, 95.0),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
        Tables.events(s, d)
          .withColumn("prev", lag(col("value"), 1).over(ord))
          .withColumn("rep",
            detect(coalesce(col("prev"), lit(Double.NaN)), col("value")).over(cum))
          .select(col("user_id"), col("event_id"), col("ts"), col("value"),
            col("rep.is_anomaly").as("is_anomaly"),
            Num.r4(col("rep.expected")).as("expected"),
            Num.r4(col("rep.lower")).as("lower"),
            Num.r4(col("rep.upper")).as("upper"),
            col("rep.n_pairs").as("n_pairs"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some(s"""
        WITH $LagCte,
        s AS (
          SELECT user_id, event_id, ts, value, prev,
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
          SELECT user_id, event_id, ts, value, prev, np, phi, mx, my,
            (prev IS NOT NULL AND np >= 30 AND sxx > 0
              AND (syy - sxy*sxy/sxx) > 0) AS ok,
            CASE WHEN np >= 3 AND (syy - sxy*sxy/sxx) > 0
                 THEN SQRT((syy - sxy*sxy/sxx)/(np-2)) END AS sigma
          FROM s)
        SELECT user_id, event_id, ts, value,
          COALESCE(ok AND ABS(value - (my + phi * (prev - mx))) > $Z * sigma,
                   FALSE) AS is_anomaly,
          CASE WHEN ok THEN
            FLOOR((my + phi * (prev - mx)) * 10000 + 0.500001) / 10000 END AS expected,
          CASE WHEN ok THEN
            FLOOR((my + phi * (prev - mx) - $Z * sigma) * 10000 + 0.500001) / 10000 END AS lower,
          CASE WHEN ok THEN
            FLOOR((my + phi * (prev - mx) + $Z * sigma) * 10000 + 0.500001) / 10000 END AS upper,
          CAST(np AS BIGINT) AS n_pairs
        FROM e ORDER BY user_id, ts, event_id"""),
      "M1 upgrade: AR(1) one-step residual z-score per key (ARIMA(1,0,0) semantics)"),

    // ---------------------------------------------------------------- q161
    // AR(1) h-step forecast from the key's last observation with the
    // WIDENING AR(1) error band sigma*sqrt(sum phi^{2j}) — the property
    // that separates an ARIMA forecast from a constant-width trend band.
    Query(
      "q161_ar1_forecast",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val fc = udaf(new Ar1ForecastAggregator(30, 3, 95.0),
          Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble,
            Encoders.scalaLong, Encoders.scalaLong))
        Tables.events(s, d)
          .withColumn("prev", lag(col("value"), 1).over(ord))
          .groupBy(col("user_id"))
          .agg(fc(coalesce(col("prev"), lit(Double.NaN)), col("value"),
            unix_micros(col("ts")), col("event_id").cast("long")).as("steps"))
          .select(col("user_id"), explode(col("steps")).as("st"))
          .select(col("user_id"), col("st.h").as("h"),
            col("st.n_pairs").as("n_pairs"),
            Num.r4(col("st.forecast_value")).as("forecast_value"),
            Num.r4(col("st.lower_bound")).as("lower_bound"),
            Num.r4(col("st.upper_bound")).as("upper_bound"))
          .orderBy(col("user_id"), col("h"))
      },
      Some(s"""
        WITH $LagCte,
        fit AS (
          SELECT user_id,
            REGR_COUNT(value, prev) AS np, REGR_SLOPE(value, prev) AS phi,
            REGR_AVGX(value, prev) AS mx, REGR_AVGY(value, prev) AS my,
            REGR_SXX(value, prev) AS sxx, REGR_SXY(value, prev) AS sxy,
            REGR_SYY(value, prev) AS syy
          FROM lagd GROUP BY user_id),
        lastv AS (
          SELECT user_id, value AS yn FROM (
            SELECT user_id, value,
              ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
            FROM events) WHERE rn = 1),
        e AS (
          SELECT f.user_id, hh.h, f.np, f.phi,
            my - phi * mx AS c, l.yn,
            SQRT((syy - sxy*sxy/sxx)/(np-2)) AS sigma,
            CASE hh.h WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 + phi
                      ELSE 1.0 + phi + phi*phi END AS sumj,
            CASE hh.h WHEN 1 THEN 1.0 WHEN 2 THEN 1.0 + phi*phi
                      ELSE 1.0 + phi*phi + (phi*phi)*(phi*phi) END AS sumj2,
            CASE hh.h WHEN 1 THEN phi WHEN 2 THEN phi*phi
                      ELSE (phi*phi)*phi END AS phih
          FROM fit f
          CROSS JOIN (SELECT * FROM (VALUES (1),(2),(3)) AS t(h)) hh
          JOIN lastv l ON f.user_id = l.user_id
          WHERE np >= 30 AND sxx > 0 AND (syy - sxy*sxy/sxx) > 0)
        SELECT user_id, h, CAST(np AS BIGINT) AS n_pairs,
          FLOOR((c*sumj + phih*yn) * 10000 + 0.500001) / 10000 AS forecast_value,
          FLOOR((c*sumj + phih*yn - $Z * sigma * SQRT(sumj2)) * 10000 + 0.500001) / 10000 AS lower_bound,
          FLOOR((c*sumj + phih*yn + $Z * sigma * SQRT(sumj2)) * 10000 + 0.500001) / 10000 AS upper_bound
        FROM e ORDER BY user_id, h"""),
      "M2 upgrade: AR(1) 3-step forecast with widening prediction interval"),

    // ---------------------------------------------------------------- q162
    // ETS(A,N,N) final level per key: sequential fold l <- l + a(y-l)
    // in event order; the 1-step forecast equals the level. The oracle
    // folds the identical doubles in the identical order (list_reduce
    // seeds with the first element, as the aggregator does).
    Query(
      "q162_ets_level",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ets = udaf(new EtsAggregator(0.3), Encoders.scalaDouble)
        Tables.events(s, d)
          .withColumn("lvl", ets(col("value")).over(cum))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("n"),
            Num.r4(col("lvl")).as("ets_level"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
          FLOOR((list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> acc + 0.3 * (x - acc)))
                * 10000 + 0.500001) / 10000 AS ets_level
        FROM events GROUP BY user_id ORDER BY user_id"""),
      "ETS(A,N,N) simple-exponential-smoothing level per key (1-step forecast = level)"),

    // ---------------------------------------------------------------- q165
    // ETS(A,A) Holt linear trend: per-key (level, trend) after the
    // sequential recurrence in event order, plus the h-step forecasts
    // level + h*trend. The oracle replays the IDENTICAL recurrence via
    // a recursive CTE (one step per recursion level), so both engines
    // fold the same doubles in the same order. Spark side runs the
    // affine-mergeable HoltAggregator over the cumulative ordered
    // frame (sequential path — bit-exact).
    Query(
      "q165_holt_forecast",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val holt = udaf(new HoltAggregator(0.3, 0.1), Encoders.scalaDouble)
        Tables.events(s, d)
          .withColumn("st", holt(col("value")).over(cum))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("n"),
            Num.r4(col("st._1")).as("level"),
            Num.r4(col("st._2")).as("trend"),
            Num.r4(col("st._1") + col("st._2")).as("fc1"),
            Num.r4(col("st._1") + lit(2.0) * col("st._2")).as("fc2"),
            Num.r4(col("st._1") + lit(3.0) * col("st._2")).as("fc3"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH RECURSIVE src AS (
          SELECT user_id,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
            CAST(value AS DOUBLE) AS y
          FROM events),
        nmax AS (SELECT user_id AS nk, CAST(MAX(rn) AS BIGINT) AS n FROM src GROUP BY user_id),
        walk(user_id, rn, l, b) AS (
          SELECT user_id, rn, y, CAST(0.0 AS DOUBLE) FROM src WHERE rn = 1
          UNION ALL
          -- complements are COMPUTED (1.0 - a), not literals: double
          -- 1.0-0.3 is one ulp above 0.7, and the Scala side computes
          -- the complement — a literal 0.7 here would drift 1 ulp/step
          SELECT s.user_id, s.rn,
            0.3 * s.y + (CAST(1.0 AS DOUBLE) - 0.3) * (w.l + w.b),
            0.1 * ((0.3 * s.y + (CAST(1.0 AS DOUBLE) - 0.3) * (w.l + w.b)) - w.l)
              + (CAST(1.0 AS DOUBLE) - 0.1) * w.b
          FROM walk w JOIN src s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
        SELECT w.user_id, n,
          FLOOR(l * 10000 + 0.500001) / 10000 AS level,
          FLOOR(b * 10000 + 0.500001) / 10000 AS trend,
          FLOOR((l + b) * 10000 + 0.500001) / 10000 AS fc1,
          FLOOR((l + 2.0 * b) * 10000 + 0.500001) / 10000 AS fc2,
          FLOOR((l + 3.0 * b) * 10000 + 0.500001) / 10000 AS fc3
        FROM walk w JOIN nmax ON nk = w.user_id AND w.rn = n
        ORDER BY w.user_id"""),
      "ETS(A,A) Holt linear-trend level/trend per key with h-step forecasts (affine-mergeable state)"),

    // ---------------------------------------------------------------- q166
    // STL-lite seasonal decomposition per event type: hourly bucket
    // averages, trend = centered 25-bucket moving average, seasonal =
    // mean detrended value per hour-of-day. One groupBy + one bounded
    // ROWS window per type + one 24-row aggregate — the classical
    // decomposition with only scale-free shuffles (hour buckets are
    // bounded by the time span, not the row count).
    Query(
      "q166_seasonal_decompose",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(-12, 12)
        hourly.withColumn("detr", col("hv") - avg(col("hv")).over(w))
          .groupBy(col("event_type"), hour(col("bucket")).as("hour_of_day"))
          .agg(count(lit(1)).as("n_buckets"),
            Num.r4(avg(col("detr"))).as("seasonal"))
          .orderBy(col("event_type"), col("hour_of_day"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS bucket, AVG(value) AS hv
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        detr AS (
          SELECT event_type, bucket,
            hv - AVG(hv) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS detr
          FROM hourly)
        SELECT event_type, CAST(EXTRACT(hour FROM bucket) AS INTEGER) AS hour_of_day,
          CAST(COUNT(*) AS BIGINT) AS n_buckets,
          FLOOR(AVG(detr) * 10000 + 0.500001) / 10000 AS seasonal
        FROM detr
        GROUP BY event_type, EXTRACT(hour FROM bucket)
        ORDER BY event_type, hour_of_day"""),
      "STL-lite: hourly buckets, centered-MA trend removal, per-hour-of-day seasonal profile"),

    // ---------------------------------------------------------------- q167
    // CUSUM changepoint per key, ALL-INTEGER: quantize values to
    // micro-units, then the scaled statistic n*P_t - t*Q (P = prefix
    // sum, Q = total) is exact int64 arithmetic in both engines, so the
    // argmax position can never flip on a last-ulp difference the way a
    // double prefix sum can (Spark folds running sums incrementally,
    // DuckDB uses segment trees - different FP association). Reports
    // the peak |CUSUM| in original units and where it happened.
    Query(
      "q167_cusum_changepoint",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy(col("user_id"))
        val q = Tables.events(s, d)
          .withColumn("vq", floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
          .withColumn("p", sum(col("vq")).over(cum))
          .withColumn("t", row_number().over(ord).cast("long"))
          .withColumn("n", count(lit(1)).over(whole))
          .withColumn("tot", sum(col("vq")).over(whole))
          .withColumn("absc", abs(col("n") * col("p") - col("t") * col("tot")))
        q.withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("absc").desc, col("ts"), col("event_id"))))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("n"), col("ts").as("peak_ts"),
            Num.r4(col("absc") / (col("n") * lit(1000000.0))).as("max_cusum"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH q AS (
          SELECT user_id, ts, event_id,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events),
        s AS (
          SELECT user_id, ts, event_id, vq,
            SUM(vq) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
            CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS t,
            COUNT(*) OVER (PARTITION BY user_id) AS n,
            SUM(vq) OVER (PARTITION BY user_id) AS tot
          FROM q),
        c AS (
          SELECT user_id, ts, event_id, n, ABS(n * p - t * tot) AS absc FROM s),
        r AS (
          SELECT user_id, ts, n, absc,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY absc DESC, ts, event_id) AS rn
          FROM c)
        SELECT user_id, CAST(n AS BIGINT) AS n, ts AS peak_ts,
          FLOOR((absc / (n * 1000000.0)) * 10000 + 0.500001) / 10000 AS max_cusum
        FROM r WHERE rn = 1 ORDER BY user_id"""),
      "CUSUM changepoint per key: exact-integer scaled statistic, peak position and magnitude"),

    // ---------------------------------------------------------------- q168
    // Targeted periodogram per key: spectral power at candidate periods
    // (12 h / 24 h / 168 h) over the MEAN-CENTERED hourly series,
    // reporting the dominant period and its power share. Centering is
    // mandatory: a non-integer cycle count over the span makes Σcos ≠ 0,
    // so the DC mean otherwise leaks into (and dominates) the longest-
    // period bin. Centering stays exact-integer via the q167 trick —
    // c_t = n·yq_t − Σyq (milli-unit y quantization keeps c·cq < 2^63
    // per term) — and the per-term products sum through DECIMAL(38)/
    // HUGEINT so the total never overflows at any series length. The
    // argmax therefore can't flip cross-engine; cos/sin enter only
    // through the q90/q109 quantize-before-sum pattern.
    Query(
      "q168_periodogram",
      (s, d) => {
        val ordw = Window.partitionBy(col("user_id")).orderBy(col("bucket"))
        val byU = Window.partitionBy(col("user_id"))
        val hourly = Tables.events(s, d)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
          .select(col("user_id"),
            (row_number().over(ordw) - 1).cast("long").as("t"),
            floor(col("hv") * lit(1000.0) + lit(0.5)).cast("long").as("yq"))
          .withColumn("nb", count(lit(1)).over(byU))
          .withColumn("toty", sum(col("yq")).over(byU))
          .withColumn("c", col("nb") * col("yq") - col("toty"))
        val periods = s.createDataFrame(Seq(Tuple1(12L), Tuple1(24L), Tuple1(168L)))
          .toDF("p")
        val ang = lit(2 * math.Pi) * col("t") / col("p")
        val spec = hourly.crossJoin(broadcast(periods))
          .withColumn("cq", floor(cos(ang) * lit(1000000.0) + lit(0.5)).cast("long"))
          .withColumn("sq", floor(sin(ang) * lit(1000000.0) + lit(0.5)).cast("long"))
          .groupBy(col("user_id"), col("p"))
          .agg(count(lit(1)).as("n_buckets"),
            sum((col("c") * col("cq")).cast("decimal(38,0)")).as("a"),
            sum((col("c") * col("sq")).cast("decimal(38,0)")).as("b"))
          .withColumn("power",
            col("a").cast("double") * col("a").cast("double") +
              col("b").cast("double") * col("b").cast("double"))
        val byUser = Window.partitionBy(col("user_id"))
        spec
          .withColumn("tot", sum(col("power")).over(byUser))
          .withColumn("rn", row_number().over(
            byUser.orderBy(col("power").desc, col("p"))))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("n_buckets"),
            col("p").as("dominant_period_h"),
            Num.r4(col("power") / col("tot")).as("power_share"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH hourly AS (
          SELECT user_id, DATE_TRUNC('hour', ts) AS bucket, AVG(value) AS hv
          FROM events GROUP BY user_id, DATE_TRUNC('hour', ts)),
        idx AS (
          SELECT user_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY bucket) - 1 AS BIGINT) AS t,
            CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT) AS yq,
            COUNT(*) OVER (PARTITION BY user_id) AS nb,
            SUM(CAST(FLOOR(hv * 1000.0 + 0.5) AS BIGINT))
              OVER (PARTITION BY user_id) AS toty
          FROM hourly),
        cent AS (
          SELECT user_id, t, nb * yq - toty AS c FROM idx),
        terms AS (
          SELECT user_id, p, t, c,
            CAST(FLOOR(COS((2 * PI()) * t / p) * 1000000.0 + 0.5) AS BIGINT) AS cq,
            CAST(FLOOR(SIN((2 * PI()) * t / p) * 1000000.0 + 0.5) AS BIGINT) AS sq
          FROM cent CROSS JOIN (SELECT * FROM (VALUES (CAST(12 AS BIGINT)),
            (CAST(24 AS BIGINT)), (CAST(168 AS BIGINT))) AS v(p)) pp),
        spec AS (
          SELECT user_id, p, CAST(COUNT(*) AS BIGINT) AS n_buckets,
            CAST(SUM(c * cq) AS DOUBLE) * CAST(SUM(c * cq) AS DOUBLE) +
            CAST(SUM(c * sq) AS DOUBLE) * CAST(SUM(c * sq) AS DOUBLE) AS power
          FROM terms GROUP BY user_id, p),
        ranked AS (
          SELECT user_id, n_buckets, p, power,
            SUM(power) OVER (PARTITION BY user_id) AS tot,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY power DESC, p) AS rn
          FROM spec)
        SELECT user_id, n_buckets, p AS dominant_period_h,
          FLOOR((power / tot) * 10000 + 0.500001) / 10000 AS power_share
        FROM ranked WHERE rn = 1 ORDER BY user_id"""),
      "targeted periodogram on the mean-centered hourly series: exact-integer spectral power at 12/24/168 h, dominant period per key"),

    // ---------------------------------------------------------------- q169
    // Seasonal-adjusted robust outliers — the composition q166+q103: an
    // hourly reading is anomalous only if it deviates AFTER removing
    // the trend (centered MA) and the hour-of-day seasonal profile,
    // judged by the robust MAD rule on the remainders. A raw-value
    // detector would flag every rush-hour peak; this one flags what the
    // season can't explain. Same shuffles as q166 plus q103's two
    // grouped percentile passes and broadcast joins.
    Query(
      "q169_seasonal_outliers",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(-12, 12)
        val detr = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
          .agg(avg(col("value")).as("hv"))
          .withColumn("detr", col("hv") - avg(col("hv")).over(w))
          .withColumn("hod", hour(col("bucket")))
        val seasonal = detr.groupBy(col("event_type"), col("hod"))
          .agg(avg(col("detr")).as("seas"))
        val rem = detr.join(broadcast(seasonal), Seq("event_type", "hod"))
          .withColumn("r", col("detr") - col("seas"))
        val med = rem.groupBy(col("event_type"))
          .agg(Num.r4(percentile(col("r"), lit(0.5))).as("med"))
        val dev = rem.join(broadcast(med), Seq("event_type"))
          .withColumn("dev", abs(col("r") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_buckets"),
            Num.r4(percentile(col("dev"), lit(0.5))).as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .withColumn("is_out", col("dev") > col("mad") * lit(3.0) * lit(1.4826))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type"))
              .orderBy(col("dev").desc, col("bucket"))))
          .groupBy(col("event_type"))
          .agg(max(col("n_buckets")).as("n_buckets"),
            max(col("mad")).as("mad"),
            count(when(col("is_out"), 1)).as("n_outliers"),
            max(when(col("rn") === 1, col("bucket"))).as("peak_bucket"))
          .select(col("event_type"), col("n_buckets"), col("mad"),
            col("n_outliers"), col("peak_bucket"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, DATE_TRUNC('hour', ts) AS bucket, AVG(value) AS hv
          FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
        detr AS (
          SELECT event_type, bucket,
            CAST(EXTRACT(hour FROM bucket) AS INTEGER) AS hod,
            hv - AVG(hv) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS detr
          FROM hourly),
        seasonal AS (
          SELECT event_type, hod, AVG(detr) AS seas
          FROM detr GROUP BY event_type, hod),
        rem AS (
          SELECT d.event_type, d.bucket, d.detr - s.seas AS r
          FROM detr d JOIN seasonal s ON s.event_type = d.event_type AND s.hod = d.hod),
        med AS (
          SELECT event_type,
            FLOOR(quantile_cont(r, 0.5) * 10000 + 0.500001) / 10000 AS med
          FROM rem GROUP BY event_type),
        dev AS (
          SELECT r.event_type, r.bucket, ABS(r.r - m.med) AS dev
          FROM rem r JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_buckets,
            FLOOR(quantile_cont(dev, 0.5) * 10000 + 0.500001) / 10000 AS mad
          FROM dev GROUP BY event_type),
        ranked AS (
          SELECT d.event_type, d.bucket, d.dev, m.n_buckets, m.mad,
            (d.dev > m.mad * 3.0 * 1.4826) AS is_out,
            ROW_NUMBER() OVER (PARTITION BY d.event_type
                               ORDER BY d.dev DESC, d.bucket) AS rn
          FROM dev d JOIN mad m USING (event_type))
        SELECT event_type, MAX(n_buckets) AS n_buckets, MAX(mad) AS mad,
          CAST(COUNT(*) FILTER (WHERE is_out) AS BIGINT) AS n_outliers,
          MAX(CASE WHEN rn = 1 THEN bucket END) AS peak_bucket
        FROM ranked GROUP BY event_type ORDER BY event_type"""),
      "seasonal-adjusted robust outliers: STL-lite remainder (q166) judged by the MAD rule (q103) — flags what the season can't explain")
  )
}
