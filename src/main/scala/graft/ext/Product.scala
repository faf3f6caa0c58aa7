package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics continuation, batch 62: circular time-of-day
  * statistics, DAU/MAU stickiness, the power-user curve, and weekly
  * growth accounting. The engagement instrumentation a product team
  * runs daily, expressed with the registry's exactness rules: per-event
  * trig is quantized before DECIMAL sums (q168's discipline), activity
  * counts are exact integers on bounded day/week grids, and every
  * classification (new / retained / resurrected / churned) is an exact
  * set operation on the (user, week) frame.
  */
object Product {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q419
    // Circular (directional) statistics of event time-of-day: the
    // mean resultant length R̄ of the 24-hour phase angles, the
    // circular mean hour, the Rayleigh uniformity test z = n·R̄²
    // (rejects "events are uniform through the day"), and Fisher's
    // κ approximation for the von Mises concentration. The CORRECT
    // way to average hours (a 23:00/01:00 pair means midnight, not
    // noon) — the circular complement to q272's hourly MI. cos/sin
    // are micro-quantized per event before DECIMAL sums; only the
    // final atan2/κ are doubles, computed from identical integers.
    Query(
      "q419_circadian_rayleigh",
      (s, d) => {
        val ang = Tables.events(s, d)
          .select(((unix_micros(col("ts")) % 86400000000L).cast("double")
            / lit(86400000000.0) * lit(2 * math.Pi)).as("th"))
          .select(floor(cos(col("th")) * lit(1e6) + lit(0.5)).cast("long").as("cq"),
            floor(sin(col("th")) * lit(1e6) + lit(0.5)).cast("long").as("sq"))
        val m = ang.agg(count(lit(1)).as("n"),
          sum(col("cq").cast("decimal(38,0)")).as("c"),
          sum(col("sq").cast("decimal(38,0)")).as("ss"))
        val r = sqrt(col("c").cast("double") * col("c").cast("double")
          + col("ss").cast("double") * col("ss").cast("double")) /
          (col("n").cast("double") * lit(1e6))
        m.select(col("n").as("n_events"),
            Num.r6(r).as("resultant_r"),
            Num.r4((atan2(col("ss").cast("double"), col("c").cast("double"))
              / lit(2 * math.Pi) * lit(24.0) + lit(24.0)) % lit(24.0))
              .as("mean_hour"),
            Num.r4(col("n").cast("double") * r * r).as("rayleigh_z"),
            // r -> 1 sends Fisher's high-concentration branch to a
            // division by zero: degenerate (single-phase) data yields
            // NULL kappa on both engines instead of an Inf/NaN hash
            when(r > 0.9999, lit(null).cast("double"))
              .otherwise(Num.r4(when(r < 0.53, lit(2.0) * r + r * r * r
                + lit(5.0) * r * r * r * r * r / lit(6.0))
                .when(r < 0.85, lit(-0.4) + lit(1.39) * r
                  + lit(0.43) / (lit(1.0) - r))
                .otherwise(lit(1.0) / (r * r * r - lit(4.0) * r * r
                  + lit(3.0) * r)))).as("kappa_vm"))
      },
      Some("""
        WITH ang AS (
          SELECT CAST(FLOOR(COS(th) * 1e6 + 0.5) AS BIGINT) AS cq,
            CAST(FLOOR(SIN(th) * 1e6 + 0.5) AS BIGINT) AS sq
          FROM (SELECT CAST(epoch_us(ts) % 86400000000 AS DOUBLE)
                  / 86400000000 * 2 * PI() AS th
                FROM events)),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(CAST(cq AS HUGEINT)) AS c, SUM(CAST(sq AS HUGEINT)) AS ss
          FROM ang),
        r AS (
          SELECT n, c, ss,
            SQRT(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
                 + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
              / (CAST(n AS DOUBLE) * 1e6) AS rb
          FROM m)
        SELECT n AS n_events,
          FLOOR(rb * 1000000 + 0.500001) / 1000000 AS resultant_r,
          FLOOR(((ATAN2(CAST(ss AS DOUBLE), CAST(c AS DOUBLE))
                  / (2 * PI()) * 24.0 + 24.0) % 24.0) * 10000 + 0.500001)
            / 10000 AS mean_hour,
          FLOOR((n * rb * rb) * 10000 + 0.500001) / 10000 AS rayleigh_z,
          CASE WHEN rb > 0.9999 THEN NULL
            ELSE FLOOR((CASE WHEN rb < 0.53
                     THEN 2.0 * rb + rb * rb * rb
                          + 5.0 * rb * rb * rb * rb * rb / 6.0
                   WHEN rb < 0.85
                     THEN -0.4 + 1.39 * rb + 0.43 / (1.0 - rb)
                   ELSE 1.0 / (rb * rb * rb - 4.0 * rb * rb + 3.0 * rb) END)
                  * 10000 + 0.500001) / 10000 END AS kappa_vm
        FROM r"""),
      "Circular time-of-day statistics: mean resultant length, circular mean hour, Rayleigh uniformity z, Fisher kappa (micro-quantized trig, DECIMAL sums)"),

    // ---------------------------------------------------------------- q420
    // DAU/MAU stickiness over the LAST 28 full days: mean daily
    // actives divided by the window's distinct actives — "what share
    // of the monthly audience shows up on an average day", the
    // canonical engagement ratio. Window pinned to the data's last
    // complete day (deterministic), both numerator and denominator
    // exact integers.
    Query(
      "q420_stickiness",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("dy"))
          .distinct().localCheckpoint()
        val mx = ud.agg(max(col("dy")).as("d1"))
        val win = ud.crossJoin(broadcast(mx))
          .filter(col("dy") > col("d1") - 28)
        val dau = win.groupBy(col("dy")).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("sdau"))
        val mau = win.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("mau"))
        dau.crossJoin(broadcast(mau)).crossJoin(broadcast(mx))
          .select((col("d1") - 27).as("window_start_day"),
            col("n_days").as("n_active_days"),
            Num.r4(col("sdau").cast("double") / lit(28.0)).as("avg_dau"),
            col("mau"),
            Num.r4(col("sdau").cast("double")
              / (lit(28.0) * col("mau").cast("double"))).as("stickiness"))
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dy
          FROM events),
        mx AS (SELECT CAST(MAX(dy) AS BIGINT) AS d1 FROM ud),
        win AS (SELECT user_id, dy FROM ud CROSS JOIN mx WHERE dy > d1 - 28),
        dau AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
            CAST(SUM(c) AS BIGINT) AS sdau
          FROM (SELECT dy, CAST(COUNT(*) AS BIGINT) AS c
                FROM win GROUP BY dy)),
        mau AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM win)
        SELECT d1 - 27 AS window_start_day, n_days AS n_active_days,
          FLOOR((CAST(sdau AS DOUBLE) / 28.0) * 10000 + 0.500001) / 10000
            AS avg_dau,
          mau,
          FLOOR((CAST(sdau AS DOUBLE) / (28.0 * mau)) * 10000 + 0.500001)
            / 10000 AS stickiness
        FROM dau CROSS JOIN mau CROSS JOIN mx"""),
      "DAU/MAU stickiness over the last 28 days: exact distinct-user day counts, deterministic window pinned to the data's last day"),

    // ---------------------------------------------------------------- q421
    // Power-user curve (the L28 histogram): how many users were
    // active on exactly k of the last 28 days, k = 1..28 — the
    // engagement-depth distribution whose right mass IS the power-
    // user base (a hump near 28 = habit; a wall at 1 = drive-by
    // traffic). Same pinned window as q420; exact integer counts on
    // the 28-bounded grid.
    Query(
      "q421_power_user_curve",
      (s, d) => {
        val ud = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("dy"))
          .distinct().localCheckpoint()
        val mx = ud.agg(max(col("dy")).as("d1"))
        val per = ud.crossJoin(broadcast(mx))
          .filter(col("dy") > col("d1") - 28)
          .groupBy(col("user_id")).agg(count(lit(1)).as("k"))
        val hist = per.groupBy(col("k").as("n_active_days"))
          .agg(count(lit(1)).as("n_users"))
        val tot = hist.agg(sum(col("n_users")).as("nu"))
        hist.crossJoin(broadcast(tot))
          .select(col("n_active_days"), col("n_users"),
            Num.r4(col("n_users").cast("double") / col("nu").cast("double"))
              .as("share"))
          .orderBy(col("n_active_days"))
      },
      Some("""
        WITH ud AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS dy
          FROM events),
        mx AS (SELECT CAST(MAX(dy) AS BIGINT) AS d1 FROM ud),
        per AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
          FROM ud CROSS JOIN mx WHERE dy > d1 - 28 GROUP BY user_id),
        hist AS (SELECT k AS n_active_days, CAST(COUNT(*) AS BIGINT) AS n_users
                 FROM per GROUP BY k),
        tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nu FROM hist)
        SELECT n_active_days, n_users,
          FLOOR((CAST(n_users AS DOUBLE) / nu) * 10000 + 0.500001) / 10000
            AS share
        FROM hist CROSS JOIN tot ORDER BY n_active_days"""),
      "Power-user curve: L28 active-days histogram over the pinned last-28-day window, exact counts"),

    // ---------------------------------------------------------------- q422
    // Weekly growth accounting: every active user in week w is
    // exactly one of NEW (first-ever week), RETAINED (also active in
    // w−1) or RESURRECTED (active before, but not in w−1); CHURNED(w)
    // = active(w−1) − retained(w). The per-week quick ratio
    // (new+resurrected)/churned says whether growth outruns decay —
    // the canonical growth-accounting decomposition. All
    // classifications are exact set operations on the (user, week)
    // frame (first week via min, w−1 membership via self-join);
    // weekly rollup + one bounded lag window.
    Query(
      "q422_growth_accounting",
      (s, d) => {
        val uw = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("w"))
          .distinct().localCheckpoint()
        val fw = uw.groupBy(col("user_id")).agg(min(col("w")).as("fw"))
        val prev = uw.select(col("user_id"), (col("w") + 1).as("w"),
          lit(1L).as("inprev"))
        val marked = uw.join(fw, Seq("user_id"))
          .join(prev, Seq("user_id", "w"), "left")
          .select(col("w"),
            when(col("w") === col("fw"), lit(1L)).otherwise(0L).as("isnew"),
            when(col("w") =!= col("fw") && col("inprev").isNotNull, lit(1L))
              .otherwise(0L).as("isret"),
            when(col("w") =!= col("fw") && col("inprev").isNull, lit(1L))
              .otherwise(0L).as("isres"))
        val weekly = marked.groupBy(col("w"))
          .agg(count(lit(1)).as("n_active"), sum(col("isnew")).as("n_new"),
            sum(col("isret")).as("n_retained"),
            sum(col("isres")).as("n_resurrected"))
        val wl = Window.orderBy(col("w"))
        weekly
          .withColumn("prev_active", lag(col("n_active"), 1).over(wl))
          .withColumn("prev_w", lag(col("w"), 1).over(wl))
          .withColumn("n_churned",
            when(col("prev_w") === col("w") - 1,
              col("prev_active") - col("n_retained")).otherwise(lit(null)))
          .select(col("w").as("week"), col("n_active"), col("n_new"),
            col("n_retained"), col("n_resurrected"), col("n_churned"),
            when(col("n_churned").isNull || col("n_churned") === 0,
              lit(null).cast("double"))
              .otherwise(Num.r4((col("n_new") + col("n_resurrected"))
                .cast("double") / col("n_churned").cast("double")))
              .as("quick_ratio"))
          .orderBy(col("week"))
      },
      Some("""
        WITH uw AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
          FROM events),
        fw AS (SELECT user_id, CAST(MIN(w) AS BIGINT) AS fw
               FROM uw GROUP BY user_id),
        marked AS (
          SELECT u.w,
            CASE WHEN u.w = fw.fw THEN 1 ELSE 0 END AS isnew,
            CASE WHEN u.w <> fw.fw AND p.user_id IS NOT NULL
              THEN 1 ELSE 0 END AS isret,
            CASE WHEN u.w <> fw.fw AND p.user_id IS NULL
              THEN 1 ELSE 0 END AS isres
          FROM uw u
          JOIN fw ON fw.user_id = u.user_id
          LEFT JOIN uw p ON p.user_id = u.user_id AND p.w = u.w - 1),
        weekly AS (
          SELECT w, CAST(COUNT(*) AS BIGINT) AS n_active,
            CAST(SUM(isnew) AS BIGINT) AS n_new,
            CAST(SUM(isret) AS BIGINT) AS n_retained,
            CAST(SUM(isres) AS BIGINT) AS n_resurrected
          FROM marked GROUP BY w),
        lagged AS (
          SELECT w, n_active, n_new, n_retained, n_resurrected,
            CASE WHEN LAG(w) OVER (ORDER BY w) = w - 1
              THEN LAG(n_active) OVER (ORDER BY w) - n_retained END
              AS n_churned
          FROM weekly)
        SELECT w AS week, n_active, n_new, n_retained, n_resurrected,
          n_churned,
          CASE WHEN n_churned IS NULL OR n_churned = 0 THEN NULL
               ELSE FLOOR((CAST(n_new + n_resurrected AS DOUBLE) / n_churned)
                          * 10000 + 0.500001) / 10000 END AS quick_ratio
        FROM lagged ORDER BY week"""),
      "Weekly growth accounting: exact new/retained/resurrected split on the (user,week) frame, churn from the lagged active count, quick ratio"))
}
