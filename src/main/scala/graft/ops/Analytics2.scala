package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: the experimentation / sequence-analytics
  * surface — a hash-bucketed A/B significance test, sliding distinct
  * counts, and MATCH_RECOGNIZE-style consecutive-pattern detection.
  */
object Analytics2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q181
    // Welch two-sample t-test between deterministic A/B arms: users
    // hash to arms by the cross-engine-exact md5 bucket (the q164/q138
    // split primitive), the metric is purchase-event value. Moments are
    // exact integers (micro-unit sums, HUGEINT/DECIMAL squares) so both
    // engines feed bit-identical (n, Σx, Σx²) into the IDENTICAL Welch
    // formula — t and the Satterthwaite df can't drift. One corpus
    // pass, two 1-row aggregates, broadcast assembly.
    Query(
      "q181_ab_ttest",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
        val moments = armed.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("vq")).as("sm"),
            sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("sq"))
          .localCheckpoint() // 2 bounded rows feed both sides of the pivot
        val a = moments.filter(col("arm") === 0)
          .select(col("n").as("na"), col("sm").as("sma"), col("sq").as("sqa"))
        val b = moments.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("sm").as("smb"), col("sq").as("sqb"))
        def mean(sm: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
          sm.cast("double") / n.cast("double") / lit(1e6)
        def vr(sq: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (sq.cast("double") / lit(1e12) -
            (sm.cast("double") / lit(1e6)) * (sm.cast("double") / lit(1e6)) /
              n.cast("double")) / (n.cast("double") - lit(1.0))
        val va = vr(col("sqa"), col("sma"), col("na")) / col("na").cast("double")
        val vb = vr(col("sqb"), col("smb"), col("nb")) / col("nb").cast("double")
        val t = (mean(col("sma"), col("na")) - mean(col("smb"), col("nb"))) /
          sqrt(va + vb)
        val df = (va + vb) * (va + vb) /
          (va * va / (col("na").cast("double") - lit(1.0)) +
            vb * vb / (col("nb").cast("double") - lit(1.0)))
        a.crossJoin(broadcast(b))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            Num.r4(mean(col("sma"), col("na"))).as("mean_a"),
            Num.r4(mean(col("smb"), col("nb"))).as("mean_b"),
            Num.r4(t).as("t_stat"),
            Num.r4(df).as("welch_df"),
            (abs(t) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, SUM(vq) AS sm,
            SUM(CAST(vq AS HUGEINT) * vq) AS sq
          FROM armed GROUP BY arm),
        piv AS (
          SELECT
            (SELECT n FROM m WHERE arm = 0) AS na,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 0) AS sma,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 0) AS sqa,
            (SELECT n FROM m WHERE arm = 1) AS nb,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 1) AS smb,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 1) AS sqb),
        calc AS (
          SELECT na, nb,
            sma / na / 1e6 AS ma, smb / nb / 1e6 AS mb,
            ((sqa / 1e12 - (sma/1e6) * (sma/1e6) / na) / (na - 1.0)) / na AS va,
            ((sqb / 1e12 - (smb/1e6) * (smb/1e6) / nb) / (nb - 1.0)) / nb AS vb
          FROM piv)
        SELECT na AS n_a, nb AS n_b,
          FLOOR(ma * 10000 + 0.500001) / 10000 AS mean_a,
          FLOOR(mb * 10000 + 0.500001) / 10000 AS mean_b,
          FLOOR(((ma - mb) / SQRT(va + vb)) * 10000 + 0.500001) / 10000 AS t_stat,
          FLOOR(((va + vb) * (va + vb)
                 / (va * va / (na - 1.0) + vb * vb / (nb - 1.0)))
                * 10000 + 0.500001) / 10000 AS welch_df,
          (ABS((ma - mb) / SQRT(va + vb)) > 1.96) AS significant
        FROM calc"""),
      "Welch two-sample t-test between md5-hashed A/B arms over purchase values: exact integer moments, identical IEEE formula"),

    // ---------------------------------------------------------------- q188
    // Mann–Whitney U between the same md5 A/B arms as q181 — the
    // rank-based companion that stays valid when purchase values are
    // heavy-tailed (Welch assumes finite-variance means; U compares
    // whole distributions). Exact integer machinery end-to-end: values
    // quantized to micro-units, per-VALUE counts on the cents-bounded
    // grid (domain-bounded like q174's length grid, ≤ ~50k rows at any
    // corpus size), doubled ranks 2·U = Σ ca·(2·cumB_before + cb) so
    // ties never leave integers, and the tie-corrected normal z
    // assembled from identical integer inputs in both engines. The
    // only window runs on the bounded checkpointed grid.
    Query(
      "q188_mann_whitney",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
        val grid = armed.groupBy(col("vq"))
          .agg(count(when(col("arm") === 0, 1)).as("ca"),
            count(when(col("arm") === 1, 1)).as("cb"))
          .localCheckpoint() // bounded by the 2-decimal price domain
        val wv = Window.orderBy(col("vq"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = grid
          .withColumn("befb", coalesce(sum(col("cb")).over(wv), lit(0L)))
          .localCheckpoint() // window materialized on the bounded grid only
        val t = col("ca") + col("cb")
        val agg = cum.agg(
          sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          sum(col("ca") * (col("befb") * 2 + col("cb"))).as("u2"),
          sum((t * t * t - t).cast("decimal(38,0)")).as("ties3"))
        val na = col("na").cast("double")
        val nb = col("nb").cast("double")
        val nn = na + nb
        val varU = na * nb / lit(12.0) *
          ((nn + lit(1.0)) - col("ties3").cast("double") / (nn * (nn - lit(1.0))))
        val z = (col("u2").cast("double") - na * nb) / (lit(2.0) * sqrt(varU))
        agg.select(col("na").as("n_a"), col("nb").as("n_b"),
          (col("u2").cast("double") / lit(2.0)).as("u_stat"),
          Num.r4(z).as("z_stat"),
          (abs(z) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        grid AS (
          SELECT vq,
            CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS ca,
            CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS cb
          FROM armed GROUP BY vq),
        cum AS (
          SELECT vq, ca, cb,
            COALESCE(SUM(cb) OVER (ORDER BY vq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS befb
          FROM grid),
        agg AS (
          SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
            CAST(SUM(ca * (befb * 2 + cb)) AS DOUBLE) AS u2,
            CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS DOUBLE)
              AS ties3
          FROM cum),
        calc AS (
          SELECT na, nb, u2, ties3,
            CAST(na AS DOUBLE) * nb / 12.0 *
              ((na + nb + 1.0) - ties3 /
               ((na + nb) * (na + nb - 1.0))) AS varu
          FROM agg)
        SELECT na AS n_a, nb AS n_b, u2 / 2.0 AS u_stat,
          FLOOR(((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(varu)))
                * 10000 + 0.500001) / 10000 AS z_stat,
          (ABS((u2 - CAST(na AS DOUBLE) * nb) / (2.0 * SQRT(varu))) > 1.96)
            AS significant
        FROM calc"""),
      "Mann-Whitney U rank test between md5 A/B arms: integer doubled-rank U on the domain-bounded value grid, tie-corrected z"),

    // ---------------------------------------------------------------- q192
    // Exact 5%-trimmed and winsorized means per event type — the
    // robust location estimates a metrics pipeline reports when the
    // tails are untrusted. No sort of raw rows: per-type counts on the
    // domain-bounded value grid (the q188 machinery), per-type
    // KEY-PARTITIONED cumulative counts, and the kept/clamped mass per
    // value derived from rank interval intersection — all integer
    // until the final divisions. lo = floor(0.05·n) rows trimmed from
    // each tail; winsorizing clamps them to the surviving extremes.
    Query(
      "q192_trimmed_means",
      (s, d) => {
        val grid = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .groupBy(col("event_type"), col("vq"))
          .agg(count(lit(1)).as("c"))
        val wT = Window.partitionBy(col("event_type")).orderBy(col("vq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wN = Window.partitionBy(col("event_type"))
        val cum = grid
          .withColumn("cumv", sum(col("c")).over(wT))
          .withColumn("n", sum(col("c")).over(wN))
          .withColumn("lo", floor(col("n") * lit(0.05)).cast("long"))
          .withColumn("hi", col("n") - col("lo"))
        // rows of this value at overall ranks (cumv-c, cumv]; keep the
        // intersection with the trimmed interval (lo, hi]
        val kept = greatest(lit(0L),
          least(col("cumv"), col("hi")) - greatest(col("cumv") - col("c"), col("lo")))
        cum.groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            sum(col("c") * col("vq")).as("sall"),
            sum(kept * col("vq")).as("skept"),
            sum(kept).as("nkept"),
            // clamp values: the smallest/largest SURVIVING value absorbs
            // the trimmed mass on its side
            min(when(col("cumv") > col("lo"), col("vq"))).as("vlo"),
            min(when(col("cumv") >= col("hi"), col("vq"))).as("vhi"),
            max(col("lo")).as("lo"))
          .select(col("event_type"), col("n"),
            Num.r4(col("sall").cast("double") / col("n") / lit(1e6)).as("mean"),
            Num.r4(col("skept").cast("double") / col("nkept") / lit(1e6))
              .as("trimmed_mean"),
            Num.r4((col("skept") + col("lo") * col("vlo") +
              (col("n") - col("nkept") - col("lo")) * col("vhi")).cast("double") /
              col("n") / lit(1e6)).as("winsorized_mean"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH grid AS (
          SELECT event_type, CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, vq),
        cum AS (
          SELECT event_type, vq, c,
            SUM(c) OVER (PARTITION BY event_type ORDER BY vq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv,
            SUM(c) OVER (PARTITION BY event_type) AS n
          FROM grid),
        lim AS (
          SELECT event_type, vq, c, cumv, n,
            CAST(FLOOR(n * 0.05) AS BIGINT) AS lo,
            n - CAST(FLOOR(n * 0.05) AS BIGINT) AS hi
          FROM cum),
        agg AS (
          SELECT event_type, MAX(n) AS n,
            SUM(c * vq) AS sall,
            SUM(GREATEST(0, LEAST(cumv, hi) - GREATEST(cumv - c, lo)) * vq) AS skept,
            SUM(GREATEST(0, LEAST(cumv, hi) - GREATEST(cumv - c, lo))) AS nkept,
            MIN(CASE WHEN cumv > lo THEN vq END) AS vlo,
            MIN(CASE WHEN cumv >= hi THEN vq END) AS vhi,
            MAX(lo) AS lo
          FROM lim GROUP BY event_type)
        SELECT event_type, CAST(n AS BIGINT) AS n,
          FLOOR((CAST(sall AS DOUBLE) / n / 1e6) * 10000 + 0.500001) / 10000
            AS mean,
          FLOOR((CAST(skept AS DOUBLE) / nkept / 1e6) * 10000 + 0.500001) / 10000
            AS trimmed_mean,
          FLOOR((CAST(skept + lo * vlo + (n - nkept - lo) * vhi AS DOUBLE)
                 / n / 1e6) * 10000 + 0.500001) / 10000 AS winsorized_mean
        FROM agg ORDER BY event_type"""),
      "exact 5%-trimmed and winsorized means per event type via rank-interval intersection on the bounded value grid"),

    // ---------------------------------------------------------------- q194
    // Two-proportion z-test on USER-level conversion between the md5
    // A/B arms — the third leg of the experimentation family: q181
    // compares means, q188 distributions, q194 rates. Conversion is
    // "any purchase of 200+" (every user in this data makes SOME
    // purchase, so plain did-purchase is degenerate at p=1 and the
    // pooled variance is 0). User-level conversion avoids within-user
    // event correlation. All counts integer; the pooled-variance z is
    // the identical IEEE expression both engines.
    Query(
      "q194_proportion_ztest",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("value") >= 200, 1).otherwise(0))
            .as("converted"))
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            col("converted"))
        val agg = users.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("converted")).as("k"))
          .localCheckpoint() // 2 bounded rows
        val a = agg.filter(col("arm") === 0)
          .select(col("n").as("na"), col("k").as("ka"))
        val b = agg.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("k").as("kb"))
        val na = col("na").cast("double"); val nb = col("nb").cast("double")
        val pa = col("ka").cast("double") / na
        val pb = col("kb").cast("double") / nb
        val pp = (col("ka") + col("kb")).cast("double") / (na + nb)
        val z = (pa - pb) /
          sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
        a.crossJoin(broadcast(b))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            col("ka").as("conv_a"), col("kb").as("conv_b"),
            Num.r4(pa).as("rate_a"), Num.r4(pb).as("rate_b"),
            Num.r4(z).as("z_stat"),
            (abs(z) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH users AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            MAX(CASE WHEN event_type = 'purchase' AND value >= 200
                THEN 1 ELSE 0 END) AS converted
          FROM events GROUP BY user_id),
        agg AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(converted) AS BIGINT) AS k
          FROM users GROUP BY arm),
        piv AS (
          SELECT
            (SELECT n FROM agg WHERE arm = 0) AS na,
            (SELECT k FROM agg WHERE arm = 0) AS ka,
            (SELECT n FROM agg WHERE arm = 1) AS nb,
            (SELECT k FROM agg WHERE arm = 1) AS kb),
        calc AS (
          SELECT na, nb, ka, kb,
            CAST(ka AS DOUBLE) / na AS pa, CAST(kb AS DOUBLE) / nb AS pb,
            CAST(ka + kb AS DOUBLE) / (CAST(na AS DOUBLE) + nb) AS pp
          FROM piv)
        SELECT na AS n_a, nb AS n_b, ka AS conv_a, kb AS conv_b,
          FLOOR(pa * 10000 + 0.500001) / 10000 AS rate_a,
          FLOOR(pb * 10000 + 0.500001) / 10000 AS rate_b,
          FLOOR(((pa - pb) / SQRT(pp * (1.0 - pp)
                 * (1.0 / na + 1.0 / nb))) * 10000 + 0.500001) / 10000 AS z_stat,
          (ABS((pa - pb) / SQRT(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))) > 1.96)
            AS significant
        FROM calc"""),
      "two-proportion z-test on user-level purchase conversion between md5 A/B arms (pooled variance)"),

    // ---------------------------------------------------------------- q195
    // CUPED variance reduction (Deng et al. 2013): adjust each user's
    // post-period purchase total Y by their PRE-period total X,
    // Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X) pooled across arms —
    // the industry-standard trick that cuts A/B experiment variance
    // using pre-experiment behavior. The period cutoff is the midpoint
    // of the observed time range (exact integer µs). Every moment
    // (ΣX, ΣY, ΣXY, ΣX², ΣY², per arm and pooled) is an exact integer
    // in micro-units with DECIMAL(38)/HUGEINT products, so θ, the
    // adjusted means and the variance-reduction share are identical
    // IEEE expressions both engines.
    Query(
      "q195_cuped",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .localCheckpoint() // one scan feeds the cutoff row and per-user sums
        // integer midpoint: Spark's `/` on longs is DOUBLE division —
        // `div` keeps the cutoff the same exact µs DuckDB's `//` picks
        val cut = ev.agg((min(col("us")) + max(col("us"))).as("s2"))
          .select(expr("s2 div 2").as("cut_us"))
        val perUser = ev.crossJoin(broadcast(cut))
          .groupBy(col("user_id"))
          .agg(sum(when(col("us") < col("cut_us"), col("vq")).otherwise(0L)).as("x"),
            sum(when(col("us") >= col("cut_us"), col("vq")).otherwise(0L)).as("y"))
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            col("x"), col("y"))
        val mom = perUser.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum((col("x").cast("decimal(38,0)") * col("y"))).as("sxy"),
          sum((col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
          sum((col("y").cast("decimal(38,0)") * col("y"))).as("syy"),
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxa"),
          sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sya"),
          sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxb"),
          sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("syb"))
        val n = col("n").cast("double")
        def d6(c: org.apache.spark.sql.Column) = c.cast("double") / lit(1e6)
        def d12(c: org.apache.spark.sql.Column) = c.cast("double") / lit(1e12)
        val covXY = (d12(col("sxy")) - d6(col("sx")) * d6(col("sy")) / n) / (n - lit(1.0))
        val varX = (d12(col("sxx")) - d6(col("sx")) * d6(col("sx")) / n) / (n - lit(1.0))
        val varY = (d12(col("syy")) - d6(col("sy")) * d6(col("sy")) / n) / (n - lit(1.0))
        val theta = covXY / varX
        val nb2 = n - col("na").cast("double")
        val xbar = d6(col("sx")) / n
        val adjA = d6(col("sya")) / col("na").cast("double") -
          theta * (d6(col("sxa")) / col("na").cast("double") - xbar)
        val adjB = d6(col("syb")) / nb2 - theta * (d6(col("sxb")) / nb2 - xbar)
        val rawDiff = d6(col("sya")) / col("na").cast("double") - d6(col("syb")) / nb2
        // var(Y') = var(Y) − θ²·var(X) = var(Y)(1 − ρ²)
        val varRed = theta * theta * varX / varY
        mom.select(col("n").as("n_users"),
          Num.r6(theta).as("theta"),
          Num.r4(rawDiff).as("diff_raw"),
          Num.r4(adjA - adjB).as("diff_cuped"),
          Num.r4(varRed).as("var_reduction"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        cut AS (SELECT (MIN(us) + MAX(us)) // 2 AS cut_us FROM ev),
        pu AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            SUM(CASE WHEN us < cut_us THEN vq ELSE 0 END) AS x,
            SUM(CASE WHEN us >= cut_us THEN vq ELSE 0 END) AS y
          FROM ev CROSS JOIN cut GROUP BY user_id),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS DOUBLE) / 1e6 AS sx, CAST(SUM(y) AS DOUBLE) / 1e6 AS sy,
            CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) / 1e12 AS sxy,
            CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) / 1e12 AS sxx,
            CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) / 1e12 AS syy,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS DOUBLE) / 1e6 AS sxa,
            CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS DOUBLE) / 1e6 AS sya,
            CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS DOUBLE) / 1e6 AS sxb,
            CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS DOUBLE) / 1e6 AS syb
          FROM pu),
        calc AS (
          SELECT n, na, CAST(n - na AS DOUBLE) AS nb, sxa, sya, sxb, syb, sx,
            ((sxy - sx * sy / n) / (n - 1.0)) /
              ((sxx - sx * sx / n) / (n - 1.0)) AS theta,
            ((sxy - sx * sy / n) / (n - 1.0)) AS covxy,
            ((sxx - sx * sx / n) / (n - 1.0)) AS varx,
            ((syy - sy * sy / n) / (n - 1.0)) AS vary
          FROM mom)
        SELECT n AS n_users,
          FLOOR(theta * 1000000 + 0.500001) / 1000000 AS theta,
          FLOOR((sya / na - syb / nb) * 10000 + 0.500001) / 10000 AS diff_raw,
          FLOOR(((sya / na - theta * (sxa / na - sx / n))
                 - (syb / nb - theta * (sxb / nb - sx / n)))
                * 10000 + 0.500001) / 10000 AS diff_cuped,
          FLOOR((theta * theta * varx / vary) * 10000 + 0.500001) / 10000
            AS var_reduction
        FROM calc"""),
      "CUPED pre-period adjustment of A/B purchase totals: pooled theta from exact integer moments, variance-reduction share"),

    // ---------------------------------------------------------------- q207
    // Group-sequential monitoring of the q181 A/B experiment: the
    // Welch z recomputed at five equally-spaced interim looks
    // (20%..100% of the time range) against the Pocock two-sided
    // K=5, α=0.05 boundary 2.413 — peeking at a fixed 1.96 threshold
    // five times inflates false alarms to ~14%; the raised boundary is
    // the classic fix. `first_stop` is the earliest look the trial
    // could have stopped at (0 = never). Exact integer moments per
    // (look, arm) from ONE corpus pass against a 5-row broadcast of
    // integer-µs cutoffs; the z assembly is the identical IEEE
    // expression both engines.
    Query(
      "q207_sequential_looks",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"),
            unix_micros(col("ts")).as("us"))
          .localCheckpoint() // one pass feeds the bounds row and all looks
        val looks = armed.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
          .select(explode(expr("array(1, 2, 3, 4, 5)")).as("look"),
            col("mn"), col("mx"))
          .select(col("look"),
            expr("mn + ((mx - mn) * look * 2) div 10").as("cut_us"))
        val mom = armed.join(broadcast(looks), col("us") <= col("cut_us"))
          .groupBy(col("look"), col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("vq")).as("sm"),
            sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("sq"))
          .groupBy(col("look"))
          .agg(max(when(col("arm") === 0, col("n"))).as("na"),
            max(when(col("arm") === 0, col("sm"))).as("sma"),
            max(when(col("arm") === 0, col("sq"))).as("sqa"),
            max(when(col("arm") === 1, col("n"))).as("nb"),
            max(when(col("arm") === 1, col("sm"))).as("smb"),
            max(when(col("arm") === 1, col("sq"))).as("sqb"))
          .localCheckpoint() // 5 bounded rows
        def mean(sm: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
          sm.cast("double") / n.cast("double") / lit(1e6)
        def vr(sq: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (sq.cast("double") / lit(1e12) -
            (sm.cast("double") / lit(1e6)) * (sm.cast("double") / lit(1e6)) /
              n.cast("double")) / (n.cast("double") - lit(1.0))
        val z = (mean(col("sma"), col("na")) - mean(col("smb"), col("nb"))) /
          sqrt(vr(col("sqa"), col("sma"), col("na")) / col("na").cast("double") +
            vr(col("sqb"), col("smb"), col("nb")) / col("nb").cast("double"))
        val scored = mom
          .select(col("look"), col("na").as("n_a"), col("nb").as("n_b"),
            Num.r4(z).as("z_stat"),
            (abs(z) > lit(2.413)).as("crossed"))
        val stop = scored.agg(coalesce(min(when(col("crossed"), col("look"))),
          lit(0)).as("first_stop"))
        scored.crossJoin(broadcast(stop)).orderBy(col("look"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq,
            epoch_us(ts) AS us
          FROM events WHERE event_type = 'purchase'),
        looks AS (
          SELECT look, mn + ((mx - mn) * look * 2) // 10 AS cut_us
          FROM (SELECT MIN(us) AS mn, MAX(us) AS mx FROM armed),
               UNNEST([1, 2, 3, 4, 5]) AS t(look)),
        mom AS (
          SELECT look, arm, CAST(COUNT(*) AS BIGINT) AS n, SUM(vq) AS sm,
            SUM(CAST(vq AS HUGEINT) * vq) AS sq
          FROM armed JOIN looks ON us <= cut_us
          GROUP BY look, arm),
        piv AS (
          SELECT look,
            MAX(CASE WHEN arm = 0 THEN n END) AS na,
            MAX(CASE WHEN arm = 0 THEN CAST(sm AS DOUBLE) END) AS sma,
            MAX(CASE WHEN arm = 0 THEN CAST(sq AS DOUBLE) END) AS sqa,
            MAX(CASE WHEN arm = 1 THEN n END) AS nb,
            MAX(CASE WHEN arm = 1 THEN CAST(sm AS DOUBLE) END) AS smb,
            MAX(CASE WHEN arm = 1 THEN CAST(sq AS DOUBLE) END) AS sqb
          FROM mom GROUP BY look),
        calc AS (
          SELECT look, na, nb,
            (sma / na / 1e6 - smb / nb / 1e6) /
            SQRT(((sqa / 1e12 - (sma/1e6) * (sma/1e6) / na) / (na - 1.0)) / na
               + ((sqb / 1e12 - (smb/1e6) * (smb/1e6) / nb) / (nb - 1.0)) / nb)
              AS z
          FROM piv),
        scored AS (
          SELECT look, na AS n_a, nb AS n_b,
            FLOOR(z * 10000 + 0.500001) / 10000 AS z_stat,
            ABS(z) > 2.413 AS crossed
          FROM calc),
        stop AS (
          SELECT COALESCE(MIN(CASE WHEN crossed THEN look END), 0) AS first_stop
          FROM scored)
        SELECT look, n_a, n_b, z_stat, crossed, first_stop
        FROM scored CROSS JOIN stop ORDER BY look"""),
      "group-sequential A/B monitoring: Welch z at five interim looks vs the Pocock K=5 boundary 2.413, with earliest-stop look"),

    // ---------------------------------------------------------------- q208
    // Funnel step conversion with Wilson 95% intervals: per user,
    // view → click → purchase in event-time order (q95's ordered-
    // subsequence semantics, no horizon); each step's conversion rate
    // gets the Wilson score interval — the binomial CI that behaves at
    // small n and extreme p where the naive ±1.96√(p(1−p)/n) fails.
    // Exact integer step counts from one keyed pass; the Wilson
    // algebra is the identical IEEE expression both engines.
    Query(
      "q208_funnel_wilson",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_type"))
          .localCheckpoint() // one scan feeds all three step joins
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id")).filter(col("ts") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id")).filter(col("ts") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
        val steps = v.agg(count(lit(1)).as("n1"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("n2"))))
          .crossJoin(broadcast(p.agg(count(lit(1)).as("n3"))))
          .localCheckpoint()
        def wilson(k: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) = {
          val z = lit(1.959963984540054) // Φ⁻¹(0.975), pinned constant
          val p = k.cast("double") / n.cast("double")
          val nn = n.cast("double")
          val denom = lit(1.0) + z * z / nn
          val center = (p + z * z / (lit(2.0) * nn)) / denom
          val half = z * sqrt(p * (lit(1.0) - p) / nn +
            z * z / (lit(4.0) * nn * nn)) / denom
          (center - half, center + half)
        }
        val (lo2, hi2) = wilson(col("n2"), col("n1"))
        val (lo3, hi3) = wilson(col("n3"), col("n2"))
        steps.select(col("n1").as("n_view"), col("n2").as("n_click"),
          col("n3").as("n_purchase"),
          Num.r4(col("n2").cast("double") / col("n1").cast("double"))
            .as("rate_click"),
          Num.r4(lo2).as("click_ci_lo"), Num.r4(hi2).as("click_ci_hi"),
          Num.r4(col("n3").cast("double") / col("n2").cast("double"))
            .as("rate_purchase"),
          Num.r4(lo3).as("purchase_ci_lo"), Num.r4(hi3).as("purchase_ci_hi"))
      },
      Some("""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id),
        steps AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n1,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n2,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n3),
        calc AS (
          SELECT n1, n2, n3,
            CAST(n2 AS DOUBLE) / n1 AS p2, CAST(n3 AS DOUBLE) / n2 AS p3,
            1.959963984540054 AS z
          FROM steps)
        SELECT n1 AS n_view, n2 AS n_click, n3 AS n_purchase,
          FLOOR(p2 * 10000 + 0.500001) / 10000 AS rate_click,
          FLOOR(((p2 + z*z/(2.0*n1) - z*SQRT(p2*(1.0-p2)/n1 + z*z/(4.0*n1*n1)))
                 / (1.0 + z*z/n1)) * 10000 + 0.500001) / 10000 AS click_ci_lo,
          FLOOR(((p2 + z*z/(2.0*n1) + z*SQRT(p2*(1.0-p2)/n1 + z*z/(4.0*n1*n1)))
                 / (1.0 + z*z/n1)) * 10000 + 0.500001) / 10000 AS click_ci_hi,
          FLOOR(p3 * 10000 + 0.500001) / 10000 AS rate_purchase,
          FLOOR(((p3 + z*z/(2.0*n2) - z*SQRT(p3*(1.0-p3)/n2 + z*z/(4.0*n2*n2)))
                 / (1.0 + z*z/n2)) * 10000 + 0.500001) / 10000 AS purchase_ci_lo,
          FLOOR(((p3 + z*z/(2.0*n2) + z*SQRT(p3*(1.0-p3)/n2 + z*z/(4.0*n2*n2)))
                 / (1.0 + z*z/n2)) * 10000 + 0.500001) / 10000 AS purchase_ci_hi
        FROM calc"""),
      "view->click->purchase funnel conversion with Wilson 95% intervals per step (ordered subsequence per user, exact integer counts)"),

    // ---------------------------------------------------------------- q209
    // Deterministic Poisson bootstrap CI for the mean purchase value
    // (Chamandy et al., "Estimating uncertainty for massive data
    // streams" — the bootstrap that works in one pass on distributed
    // data): each row's multiplicity in replicate r is a Poisson(1)
    // draw derived from the cross-engine-exact md5 hash of (r, row),
    // via EXACT integer CDF thresholds at 2⁶⁰ scale — no RNG state,
    // any engine reproduces every draw. 50 replicates in ONE corpus
    // pass (explode → 50-group shuffle of partial sums); the
    // percentile CI ranks the 50 bounded replicate means.
    Query(
      "q209_bootstrap_ci",
      (s, d) => {
        // P(Pois(1) <= k) · 2^60, k = 0..6; u >= t_k advances the draw
        val ts = Seq(424136118829305344L, 848272237658610688L,
          1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
          1152236456152946176L, 1152825534095764608L)
        val ev = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .localCheckpoint() // one pass feeds the replicates AND the full mean
        val full = ev.agg(count(lit(1)).as("n"), sum(col("vq")).as("sv"))
        val u = graft.ext.Dedup.h60(concat(lit("bs|"), col("r").cast("string"),
          lit("|"), col("event_id").cast("string")))
        val wgt = ts.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
        val reps = ev
          .select(col("event_id"), col("vq"),
            explode(sequence(lit(1), lit(50))).as("r"))
          .select(col("r"), (wgt * col("vq")).as("wv"), wgt.as("w"))
          .groupBy(col("r"))
          .agg(sum(col("wv")).as("sm"), sum(col("w")).as("sw"))
          .withColumn("m", col("sm").cast("double") / col("sw").cast("double") /
            lit(1e6))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("m"), col("r"))))
          .localCheckpoint() // 50 bounded rows; rank window never sees corpus
        val lo = reps.filter(col("rk") === 2).select(col("m").as("lo"))
        val hi = reps.filter(col("rk") === 49).select(col("m").as("hi"))
        full.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
          .select(col("n").as("n_rows"), lit(50L).as("b_replicates"),
            Num.r4(col("sv").cast("double") / col("n") / lit(1e6)).as("mean"),
            Num.r4(col("lo")).as("ci_lo"), Num.r4(col("hi")).as("ci_hi"))
      },
      Some(s"""
        WITH ev AS (
          SELECT event_id,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        full_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(vq) AS sv FROM ev),
        hashed AS (
          SELECT ev.vq, t.r,
            ${graft.ext.Dedup.sqlH60(
        "'bs|' || CAST(t.r AS VARCHAR) || '|' || CAST(ev.event_id AS VARCHAR)")}
              AS u
          FROM ev CROSS JOIN RANGE(1, 51) t(r)),
        weighted AS (
          SELECT r, vq,
            (CASE WHEN u >= 424136118829305344 THEN 1 ELSE 0 END
             + CASE WHEN u >= 848272237658610688 THEN 1 ELSE 0 END
             + CASE WHEN u >= 1060340297073263360 THEN 1 ELSE 0 END
             + CASE WHEN u >= 1131029650211480960 THEN 1 ELSE 0 END
             + CASE WHEN u >= 1148701988496035328 THEN 1 ELSE 0 END
             + CASE WHEN u >= 1152236456152946176 THEN 1 ELSE 0 END
             + CASE WHEN u >= 1152825534095764608 THEN 1 ELSE 0 END) AS w
          FROM hashed),
        reps AS (
          SELECT r, SUM(w * vq) AS sm, SUM(w) AS sw
          FROM weighted GROUP BY r),
        ranked AS (
          SELECT r, CAST(sm AS DOUBLE) / sw / 1e6 AS m,
            ROW_NUMBER() OVER (ORDER BY CAST(sm AS DOUBLE) / sw / 1e6, r) AS rk
          FROM reps)
        SELECT n AS n_rows, CAST(50 AS BIGINT) AS b_replicates,
          FLOOR((CAST(sv AS DOUBLE) / n / 1e6) * 10000 + 0.500001) / 10000
            AS mean,
          FLOOR((SELECT m FROM ranked WHERE rk = 2) * 10000 + 0.500001) / 10000
            AS ci_lo,
          FLOOR((SELECT m FROM ranked WHERE rk = 49) * 10000 + 0.500001) / 10000
            AS ci_hi
        FROM full_"""),
      "deterministic Poisson bootstrap (50 hash-derived replicates, exact 2^60 CDF thresholds): percentile CI for the mean purchase value"),

    // ---------------------------------------------------------------- q210
    // Experiment design: minimal detectable effect at α=0.05 / 80%
    // power for the CURRENT arm sizes and variances, plus the per-arm
    // n needed to detect a 5% relative lift — the power math a team
    // runs BEFORE q181/q207. Pure identical-IEEE algebra over the
    // exact integer moments; Φ⁻¹ constants pinned.
    Query(
      "q210_mde_power",
      (s, d) => {
        val armed = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select((graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2).as("arm"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
        val mom = armed.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("vq")).as("sm"),
            sum((col("vq") * col("vq")).cast("decimal(38,0)")).as("sq"))
          .localCheckpoint()
        val a = mom.filter(col("arm") === 0)
          .select(col("n").as("na"), col("sm").as("sma"), col("sq").as("sqa"))
        val b = mom.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("sm").as("smb"), col("sq").as("sqb"))
        def vr(sq: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column,
            n: org.apache.spark.sql.Column) =
          (sq.cast("double") / lit(1e12) -
            (sm.cast("double") / lit(1e6)) * (sm.cast("double") / lit(1e6)) /
              n.cast("double")) / (n.cast("double") - lit(1.0))
        val na = col("na").cast("double"); val nb = col("nb").cast("double")
        val va = vr(col("sqa"), col("sma"), col("na"))
        val vb = vr(col("sqb"), col("smb"), col("nb"))
        val zsum = lit(1.959963984540054 + 0.8416212335729143)
        val mu = (col("sma") + col("smb")).cast("double") / (na + nb) / lit(1e6)
        val s2p = ((na - lit(1.0)) * va + (nb - lit(1.0)) * vb) /
          (na + nb - lit(2.0))
        val mdeAbs = zsum * sqrt(va / na + vb / nb)
        val nNeed = ceil(lit(2.0) * zsum * zsum * s2p /
          ((lit(0.05) * mu) * (lit(0.05) * mu))).cast("long")
        a.crossJoin(broadcast(b))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            Num.r4(mu).as("mean_pooled"),
            Num.r4(mdeAbs).as("mde_abs"),
            Num.r6(mdeAbs / mu).as("mde_rel"),
            nNeed.as("n_per_arm_5pct"))
      },
      Some(s"""
        WITH armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT) AS vq
          FROM events WHERE event_type = 'purchase'),
        m AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, SUM(vq) AS sm,
            SUM(CAST(vq AS HUGEINT) * vq) AS sq
          FROM armed GROUP BY arm),
        piv AS (
          SELECT
            (SELECT n FROM m WHERE arm = 0) AS na,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 0) AS sma,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 0) AS sqa,
            (SELECT n FROM m WHERE arm = 1) AS nb,
            (SELECT CAST(sm AS DOUBLE) FROM m WHERE arm = 1) AS smb,
            (SELECT CAST(sq AS DOUBLE) FROM m WHERE arm = 1) AS sqb),
        calc AS (
          SELECT na, nb,
            (sma + smb) / (CAST(na AS DOUBLE) + nb) / 1e6 AS mu,
            (sqa / 1e12 - (sma/1e6) * (sma/1e6) / na) / (na - 1.0) AS va,
            (sqb / 1e12 - (smb/1e6) * (smb/1e6) / nb) / (nb - 1.0) AS vb,
            1.959963984540054 + 0.8416212335729143 AS zs
          FROM piv),
        fin AS (
          SELECT na, nb, mu,
            zs * SQRT(va / na + vb / nb) AS mde,
            ((CAST(na AS DOUBLE) - 1.0) * va + (CAST(nb AS DOUBLE) - 1.0) * vb)
              / (CAST(na AS DOUBLE) + nb - 2.0) AS s2p, zs
          FROM calc)
        SELECT na AS n_a, nb AS n_b,
          FLOOR(mu * 10000 + 0.500001) / 10000 AS mean_pooled,
          FLOOR(mde * 10000 + 0.500001) / 10000 AS mde_abs,
          FLOOR((mde / mu) * 1000000 + 0.500001) / 1000000 AS mde_rel,
          CAST(CEIL(2.0 * zs * zs * s2p / ((0.05 * mu) * (0.05 * mu)))
               AS BIGINT) AS n_per_arm_5pct
        FROM fin"""),
      "experiment power math: MDE at alpha 0.05 / 80% power for current arms, and per-arm n for a 5% relative lift"),

    // ---------------------------------------------------------------- q183
    // Sliding-window DISTINCT users per event type (6 h window, 1 h
    // slide): the live-dashboard "unique actives" metric. The batch
    // side uses Spark's window TVF directly (each event lands in 6
    // windows); the oracle reproduces the TVF's epoch-aligned
    // assignment with an explicit 6-way fan-out. countDistinct inside
    // a keyed aggregate is exact (hash-based partial distinct — no
    // sketch), shuffled on (type, window): bounded by span × types.
    Query(
      "q183_sliding_distinct",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"),
            window(col("ts"), "6 hours", "1 hour").getField("start").as("w_start"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"), col("w_start")),
      Some("""
        WITH slid AS (
          SELECT event_type, user_id,
            CAST(DATE_TRUNC('hour', ts) - k * INTERVAL 1 HOUR AS TIMESTAMP) AS w_start
          FROM events, UNNEST([0, 1, 2, 3, 4, 5]) AS t(k))
        SELECT event_type, w_start,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM slid GROUP BY event_type, w_start
        ORDER BY event_type, w_start"""),
      "sliding distinct actives: 6-hour windows sliding hourly, exact countDistinct per (type, window)"),

    // ---------------------------------------------------------------- q184
    // MATCH_RECOGNIZE-lite (SQL:2016 / Flink CEP parity): the STRICTLY
    // CONSECUTIVE view→click→purchase pattern per user, in (ts,
    // event_id) order — AFTER MATCH SKIP TO NEXT ROW semantics (every
    // starting row tested, overlaps counted). Unlike q95's funnel
    // (ordered subsequence within a horizon), consecutiveness is the
    // CEP semantics: any interleaved event breaks the match. One lead
    // window on the user_id exchange; no joins.
    Query(
      "q184_match_recognize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .withColumn("m",
            col("event_type") === "view" && col("e2") === "click" &&
              col("e3") === "purchase")
          .groupBy(col("user_id"))
          .agg(count(when(col("m"), 1)).as("n_matches"),
            min(when(col("m"), col("ts"))).as("first_match_ts"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH seq AS (
          SELECT user_id, ts,
            event_type AS e1,
            LEAD(event_type, 1) OVER w AS e2,
            LEAD(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id,
          CAST(COUNT(*) FILTER (WHERE e1 = 'view' AND e2 = 'click'
                                  AND e3 = 'purchase') AS BIGINT) AS n_matches,
          MIN(ts) FILTER (WHERE e1 = 'view' AND e2 = 'click'
                            AND e3 = 'purchase') AS first_match_ts
        FROM seq GROUP BY user_id ORDER BY user_id"""),
      "MATCH_RECOGNIZE-lite: strictly consecutive view->click->purchase per key (CEP semantics, overlap-counting)"),

    // --------------------------------------------------------------- q230
    // Burstiness (Fano factor) per event type: variance/mean of the
    // per-hour event counts — 1 for a Poisson arrival process, ≫ 1
    // for bursty traffic. The capacity-planning dispersion number the
    // windowed averages don't expose. Exactness: hourly counts are
    // integers, so Fano = (n·Σc² − (Σc)²) / (n·Σc) has exact int64
    // numerator and denominator (c ≤ 10⁷ at 100×, Σc² ≤ 10¹⁵) and the
    // single division is bit-equal. Buckets are OBSERVED hours (empty
    // hours excluded — documented choice, mirrored in the oracle).
    Query(
      "q230_fano_burstiness",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("hb"))
          .groupBy(col("event_type"), col("hb"))
          .agg(count(lit(1)).as("c"))
        hourly.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("n_events"),
            sum(col("c") * col("c")).as("s2"))
          .select(col("event_type"), col("n_hours"), col("n_events"),
            Num.r6(col("n_events").cast("double") / col("n_hours"))
              .as("mean_per_hour"),
            Num.r6((col("n_hours") * col("s2")
                - col("n_events") * col("n_events")).cast("double")
              / (col("n_hours") * col("n_events")).cast("double"))
              .as("fano"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hourly AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, hb)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
          CAST(SUM(c) AS BIGINT) AS n_events,
          FLOOR((CAST(SUM(c) AS DOUBLE) / COUNT(*)) * 1000000 + 0.500001)
            / 1000000 AS mean_per_hour,
          FLOOR((CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
                 / CAST(COUNT(*) * SUM(c) AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS fano
        FROM hourly GROUP BY event_type ORDER BY event_type"""),
      "Fano factor (variance/mean of hourly counts) per event type: exact int64 moments, the burstiness-vs-Poisson dispersion diagnostic"),

    // --------------------------------------------------------------- q231
    // Hour-of-day concentration: the 24-slot profile per event type —
    // peak hour (count DESC, hour ASC tie-break), its share, and the
    // chi-square distance from a uniform profile, computed as the
    // exact integer form Σ_h (24·c_h − n)² / (24·n) over ALL 24 slots
    // (missing hours contribute (−n)², i.e. count 0 — mirrored by a
    // generated hour spine in both engines). The diurnality number:
    // chi2 ≈ 0 means load-shaping is pointless, large means batch
    // windows exist.
    Query(
      "q231_hour_profile",
      (s, d) => {
        import s.implicits._
        val hours = (0L until 24L).toDF("hod")
        val counts = Tables.events(s, d)
          .select(col("event_type"),
            expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("c"))
        val types = counts.select(col("event_type")).distinct()
        val full = types.crossJoin(broadcast(hours))
          .join(counts, Seq("event_type", "hod"), "left")
          .na.fill(0L, Seq("c"))
        val tot = full.groupBy(col("event_type")).agg(sum(col("c")).as("n"))
        val peak = full.withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type"))
              .orderBy(col("c").desc, col("hod"))))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("hod").as("peak_hour"),
            col("c").as("peak_count"))
        full.join(tot, Seq("event_type"))
          .select(col("event_type"),
            (lit(24L) * col("c") - col("n")).as("dev"), col("n"))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n_events"),
            sum(col("dev") * col("dev")).as("ssdev"))
          .join(peak, Seq("event_type"))
          .select(col("event_type"), col("n_events"), col("peak_hour"),
            col("peak_count"),
            Num.r6(col("peak_count").cast("double") / col("n_events"))
              .as("peak_share"),
            Num.r6(col("ssdev").cast("double")
              / (lit(24L) * col("n_events")).cast("double")).as("chi2_uniform"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH hours AS (SELECT unnest(range(0, 24)) AS hod),
        counts AS (
          SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
            CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY event_type, hod),
        types AS (SELECT DISTINCT event_type FROM counts),
        prof AS (
          SELECT t.event_type, h.hod, COALESCE(c.c, 0) AS c
          FROM types t CROSS JOIN hours h
          LEFT JOIN counts c ON c.event_type = t.event_type AND c.hod = h.hod),
        tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS n
                FROM prof GROUP BY event_type),
        peak AS (
          SELECT event_type, hod AS peak_hour, c AS peak_count FROM (
            SELECT event_type, hod, c,
              ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY c DESC, hod) AS rn
            FROM prof) WHERE rn = 1),
        dev AS (
          SELECT f.event_type, t.n,
            CAST(SUM((24 * f.c - t.n) * (24 * f.c - t.n)) AS BIGINT) AS ssdev
          FROM prof f JOIN tot t ON t.event_type = f.event_type
          GROUP BY f.event_type, t.n)
        SELECT d.event_type, d.n AS n_events, p.peak_hour, p.peak_count,
          FLOOR((CAST(p.peak_count AS DOUBLE) / d.n) * 1000000 + 0.500001)
            / 1000000 AS peak_share,
          FLOOR((CAST(d.ssdev AS DOUBLE) / CAST(24 * d.n AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS chi2_uniform
        FROM dev d JOIN peak p ON p.event_type = d.event_type
        ORDER BY d.event_type"""),
      "24-slot hour-of-day profile per event type: peak hour + share + exact-integer chi-square distance from uniform (the diurnality number)"),

    // --------------------------------------------------------------- q232
    // Cold-start rate: share of events whose user had fewer than 5
    // PRIOR events at arrival — the fraction of traffic a
    // personalization model must serve blind. One cumulative keyed
    // window pass (user_id exchange, ts+event_id order), bounded
    // rollup per event type. Pure integer counts.
    Query(
      "q232_cold_start_rate",
      (s, d) => {
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1L)
        Tables.events(s, d)
          .withColumn("nprior", count(lit(1)).over(ord))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("nprior") < 5, 1L).otherwise(0L)).as("n_cold"))
          .select(col("event_type"), col("n_events"), col("n_cold"),
            Num.r6(col("n_cold").cast("double") / col("n_events"))
              .as("cold_share"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH x AS (
          SELECT event_type,
            COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS nprior
          FROM events)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(*) FILTER (WHERE nprior < 5) AS BIGINT) AS n_cold,
          FLOOR((CAST(COUNT(*) FILTER (WHERE nprior < 5) AS DOUBLE)
                 / COUNT(*)) * 1000000 + 0.500001) / 1000000 AS cold_share
        FROM x GROUP BY event_type ORDER BY event_type"""),
      "cold-start rate per event type: share of events with <5 prior events for their user — the blind-serving fraction, one keyed window pass"),

    // ---------------------------------------------------------------- q260
    // Event-lateness audit per type: within each user's ARRIVAL order
    // (event_id — the generator's write order), how often does event
    // time run backwards, and by how much? late = ts below the user's
    // running event-time high-water mark; lateness in whole minutes.
    // This is the number that sizes a streaming watermark: p95
    // lateness IS the allowed-lateness setting that loses <5% of
    // events. One keyed cumulative window (never global); percentiles
    // as exact ranks over the bounded (type × lateness-minute)
    // histogram — the q223 discipline.
    Query(
      "q260_lateness_audit",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("mx", max(col("us")).over(w))
          .withColumn("late", col("mx").isNotNull && col("mx") > col("us"))
          .localCheckpoint() // one keyed pass feeds base AND histogram
        val base = ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
        val hist = ev.filter(col("late"))
          .select(col("event_type"),
            ((col("mx") - col("us")) / lit(60000000L)).cast("long").as("lm"))
          .groupBy(col("event_type"), col("lm")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded: types × minutes-in-span
        val cum = hist.withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("event_type")).orderBy(col("lm"))))
        def pct(q: Double, name: String) = cum
          .join(hist.groupBy(col("event_type")).agg(sum(col("c")).as("nm")),
            Seq("event_type"))
          .filter(col("cum") >= ceil(col("nm") * lit(q)))
          .groupBy(col("event_type")).agg(min(col("lm")).as(name))
        base
          .join(pct(0.5, "p50_late_min"), Seq("event_type"), "left")
          .join(pct(0.95, "p95_late_min"), Seq("event_type"), "left")
          .select(col("event_type"), col("n_events"), col("n_late"),
            Num.r6(col("n_late").cast("double") / col("n_events"))
              .as("late_share"),
            col("p50_late_min"), col("p95_late_min"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH ev AS (
          SELECT event_type, user_id, event_id, epoch_us(ts) AS us,
            MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
          FROM events),
        flagged AS (
          SELECT event_type,
            (mx IS NOT NULL AND mx > us) AS late,
            CASE WHEN mx IS NOT NULL AND mx > us
              THEN CAST((mx - us) // 60000000 AS BIGINT) END AS lm
          FROM ev),
        base AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
            CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late
          FROM flagged GROUP BY event_type),
        hist AS (
          SELECT event_type, lm, CAST(COUNT(*) AS BIGINT) AS c
          FROM flagged WHERE late GROUP BY event_type, lm),
        cum AS (
          SELECT event_type, lm,
            SUM(c) OVER (PARTITION BY event_type ORDER BY lm
                         ROWS UNBOUNDED PRECEDING) AS cum
          FROM hist),
        nm AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS nm
               FROM hist GROUP BY event_type),
        p50 AS (
          SELECT c.event_type, CAST(MIN(lm) AS BIGINT) AS p50_late_min
          FROM cum c JOIN nm ON nm.event_type = c.event_type
          WHERE c.cum >= CEIL(nm.nm * 0.5) GROUP BY c.event_type),
        p95 AS (
          SELECT c.event_type, CAST(MIN(lm) AS BIGINT) AS p95_late_min
          FROM cum c JOIN nm ON nm.event_type = c.event_type
          WHERE c.cum >= CEIL(nm.nm * 0.95) GROUP BY c.event_type)
        SELECT b.event_type, n_events, n_late,
          ${Num.sql("CAST(n_late AS DOUBLE) / n_events", 6)} AS late_share,
          p50_late_min, p95_late_min
        FROM base b
        LEFT JOIN p50 ON p50.event_type = b.event_type
        LEFT JOIN p95 ON p95.event_type = b.event_type
        ORDER BY b.event_type"""),
      "event-lateness audit per type: out-of-order share vs per-user arrival order + p50/p95 lateness minutes — the watermark-sizing table")
  )
}
