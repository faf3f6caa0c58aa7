package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Round-6 continuation: experimentation-governance operators — the
  * checks a real A/B platform runs BEFORE trusting any of the q181/
  * q188/q194/q195/q207 test statistics. Both are one-corpus-pass
  * reports over bounded grids; every count and moment is an exact
  * integer until one final division.
  */
object Analytics3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q235
    // Sample-ratio-mismatch check (Fabijan et al. 2019): the FIRST
    // gate of every experiment readout. Users hash to arms by the
    // q181 md5 primitive with expected 50/50 allocation; a chi-square
    // goodness-of-fit on DISTINCT-user counts — overall and within
    // each event-type segment (segment SRM catches non-random
    // missingness that the overall test dilutes) — flags any
    // allocation the downstream tests must not be trusted on.
    // With two equal-probability cells the statistic collapses to
    // (na−nb)²/(na+nb): integer numerator (exact in double far beyond
    // 100× scale), one division. df=1 critical value 3.841.
    Query(
      "q235_srm_check",
      (s, d) => {
        // one distinct pass over (event_type, user); the overall row
        // folds from per-user presence, never a second corpus scan
        val typed = Tables.events(s, d)
          .select(col("event_type"), col("user_id")).distinct()
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .localCheckpoint() // bounded (type × user) frame, one scan
        val perType = typed.groupBy(col("event_type"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
        val overall = typed.select(col("user_id"), col("arm")).distinct()
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
          .withColumn("event_type", lit("__all__"))
        val dn = (col("n_a") - col("n_b")).cast("double")
        val chi2 = dn * dn / (col("n_a") + col("n_b")).cast("double")
        perType.unionByName(overall.select(col("event_type"), col("n_a"), col("n_b")))
          .select(col("event_type").as("segment"), col("n_a"), col("n_b"),
            Num.r6(chi2).as("chi2"),
            (chi2 > lit(3.841)).as("srm_flag"))
          .orderBy(col("segment"))
      },
      Some(s"""
        WITH typed AS (
          SELECT DISTINCT event_type, user_id,
            ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm
          FROM events),
        per_type AS (
          SELECT event_type,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM typed GROUP BY event_type),
        overall AS (
          SELECT '__all__' AS event_type,
            CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM (SELECT DISTINCT user_id, arm FROM typed)),
        uni AS (SELECT * FROM per_type UNION ALL SELECT * FROM overall)
        SELECT event_type AS segment, n_a, n_b,
          FLOOR((CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b))
                * 1000000 + 0.500001) / 1000000 AS chi2,
          (CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b)) > 3.841
            AS srm_flag
        FROM uni ORDER BY segment"""),
      "Sample-ratio-mismatch chi-square on distinct users per md5 arm, overall and per event-type segment (df=1, crit 3.841)"),

    // ---------------------------------------------------------------- q237
    // Delta-method z-test for a RATIO metric (revenue per event)
    // between the q181 md5 arms, with the USER as the randomization
    // unit (Deng, Knoblich & Lu 2017): R = ΣXᵤ/ΣYᵤ over per-user
    // sums is not a mean of i.i.d. rows, so naive row-level variance
    // is wrong; the delta method gives
    //   var(R̂) ≈ (s²x − 2R·s_xy + R²·s²y) / (n·ȳ²).
    // Per-user X (purchase value, micro units) and Y (event count)
    // fold to five exact integer moments per arm — n, ΣX, ΣY, ΣX²,
    // ΣY², ΣXY in DECIMAL(38) — so both engines feed bit-identical
    // inputs to the IDENTICAL IEEE formula. One corpus pass, two
    // bounded rows, broadcast assembly.
    Query(
      "q237_delta_ratio",
      (s, d) => {
        val perUser = Tables.events(s, d)
          .select(col("user_id"),
            when(col("event_type") === "purchase",
              floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long"))
              .otherwise(0L).as("xq"),
            lit(1L).as("one"))
          .groupBy(col("user_id"))
          .agg(sum(col("xq")).as("x"), sum(col("one")).as("y"))
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
        val moments = perUser.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum((col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
            sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
            sum((col("x").cast("decimal(38,0)") * col("y"))).as("sxy"))
          .localCheckpoint() // 2 bounded rows feed both sides of the pivot
        import org.apache.spark.sql.Column
        // R and var(R) from one arm's moments; x is micro so R is
        // divided back to value units once at the end
        def ratio(sx: Column, sy: Column): Column =
          sx.cast("double") / lit(1e6) / sy.cast("double")
        def varR(n: Column, sx: Column, sy: Column, sxx: Column,
            syy: Column, sxy: Column): Column = {
          val nd = n.cast("double")
          val mx = sx.cast("double") / lit(1e6) / nd
          val my = sy.cast("double") / nd
          val r = mx / my
          val vx = (sxx.cast("double") / lit(1e12) -
            nd * mx * mx) / (nd - lit(1.0))
          val vy = (syy.cast("double") - nd * my * my) / (nd - lit(1.0))
          val cxy = (sxy.cast("double") / lit(1e6) -
            nd * mx * my) / (nd - lit(1.0))
          (vx - lit(2.0) * r * cxy + r * r * vy) / (nd * my * my)
        }
        val a = moments.filter(col("arm") === 0)
          .select(col("n").as("na"), col("sx").as("sxa"), col("sy").as("sya"),
            col("sxx").as("sxxa"), col("syy").as("syya"), col("sxy").as("sxya"))
        val b = moments.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("sx").as("sxb"), col("sy").as("syb"),
            col("sxx").as("sxxb"), col("syy").as("syyb"), col("sxy").as("sxyb"))
        val ra = ratio(col("sxa"), col("sya"))
        val rb = ratio(col("sxb"), col("syb"))
        val va = varR(col("na"), col("sxa"), col("sya"), col("sxxa"),
          col("syya"), col("sxya"))
        val vb = varR(col("nb"), col("sxb"), col("syb"), col("sxxb"),
          col("syyb"), col("sxyb"))
        val z = (ra - rb) / sqrt(va + vb)
        a.crossJoin(broadcast(b))
          .select(col("na").as("n_a"), col("nb").as("n_b"),
            Num.r6(ra).as("ratio_a"), Num.r6(rb).as("ratio_b"),
            Num.r6(ra - rb).as("diff"),
            Num.r4(z).as("z_stat"),
            (abs(z) > lit(1.96)).as("significant"))
      },
      Some(s"""
        WITH per_user AS (
          SELECT user_id,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                ELSE 0 END) AS x,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY user_id),
        armed AS (
          SELECT ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2 AS arm,
            x, y
          FROM per_user),
        m AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(x) AS sx, SUM(y) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(y AS HUGEINT) * y) AS syy,
            SUM(CAST(x AS HUGEINT) * y) AS sxy
          FROM armed GROUP BY arm),
        piv AS (
          SELECT
            (SELECT n FROM m WHERE arm = 0) AS na,
            (SELECT CAST(sx AS DOUBLE) FROM m WHERE arm = 0) AS sxa,
            (SELECT CAST(sy AS DOUBLE) FROM m WHERE arm = 0) AS sya,
            (SELECT CAST(sxx AS DOUBLE) FROM m WHERE arm = 0) AS sxxa,
            (SELECT CAST(syy AS DOUBLE) FROM m WHERE arm = 0) AS syya,
            (SELECT CAST(sxy AS DOUBLE) FROM m WHERE arm = 0) AS sxya,
            (SELECT n FROM m WHERE arm = 1) AS nb,
            (SELECT CAST(sx AS DOUBLE) FROM m WHERE arm = 1) AS sxb,
            (SELECT CAST(sy AS DOUBLE) FROM m WHERE arm = 1) AS syb,
            (SELECT CAST(sxx AS DOUBLE) FROM m WHERE arm = 1) AS sxxb,
            (SELECT CAST(syy AS DOUBLE) FROM m WHERE arm = 1) AS syyb,
            (SELECT CAST(sxy AS DOUBLE) FROM m WHERE arm = 1) AS sxyb),
        calc AS (
          SELECT na, nb,
            (sxa / 1e6 / na) / (sya / na) AS ra,
            (sxb / 1e6 / nb) / (syb / nb) AS rb,
            ((sxxa / 1e12 - na * (sxa/1e6/na) * (sxa/1e6/na)) / (na - 1.0)
             - 2.0 * ((sxa/1e6/na) / (sya/na))
               * ((sxya / 1e6 - na * (sxa/1e6/na) * (sya/na)) / (na - 1.0))
             + ((sxa/1e6/na) / (sya/na)) * ((sxa/1e6/na) / (sya/na))
               * ((syya - na * (sya/na) * (sya/na)) / (na - 1.0)))
            / (na * (sya/na) * (sya/na)) AS va,
            ((sxxb / 1e12 - nb * (sxb/1e6/nb) * (sxb/1e6/nb)) / (nb - 1.0)
             - 2.0 * ((sxb/1e6/nb) / (syb/nb))
               * ((sxyb / 1e6 - nb * (sxb/1e6/nb) * (syb/nb)) / (nb - 1.0))
             + ((sxb/1e6/nb) / (syb/nb)) * ((sxb/1e6/nb) / (syb/nb))
               * ((syyb - nb * (syb/nb) * (syb/nb)) / (nb - 1.0)))
            / (nb * (syb/nb) * (syb/nb)) AS vb
          FROM piv)
        SELECT na AS n_a, nb AS n_b,
          FLOOR(ra * 1000000 + 0.500001) / 1000000 AS ratio_a,
          FLOOR(rb * 1000000 + 0.500001) / 1000000 AS ratio_b,
          FLOOR((ra - rb) * 1000000 + 0.500001) / 1000000 AS diff,
          FLOOR(((ra - rb) / SQRT(va + vb)) * 10000 + 0.500001) / 10000
            AS z_stat,
          (ABS((ra - rb) / SQRT(va + vb)) > 1.96) AS significant
        FROM calc"""),
      "Delta-method z-test on the revenue-per-event RATIO metric between md5 arms, user as the randomization unit (Deng et al. 2017)"),

    // ---------------------------------------------------------------- q243
    // One-way ANOVA F-test of document length across crawl sources —
    // the k-group generalization of q181's two-arm t-test (running
    // pairwise t-tests over 8 sources inflates α; ANOVA is the single
    // omnibus gate, the same multiplicity discipline as q190's BH-FDR).
    // Per group the exact integers (n_g, ΣX, ΣX²) give
    // SSB = Σ n_g(m_g − m)², SSW = Σ (ΣX² − n_g·m_g²); both terms are
    // micro-quantized PER GROUP before the bounded-grid sum (q175's
    // quantize-before-sum), so group association order cannot surface.
    // F = (SSB/(k−1)) / (SSW/(N−k)); η² = SSB/(SSB+SSW) is the effect
    // size. One corpus pass to the k-row grid; everything after is
    // driver-free bounded algebra.
    Query(
      "q243_anova_f",
      (s, d) => {
        val g = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("ng"),
            sum(col("n_chars")).as("sg"),
            sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)"))
              .as("ssg"))
          .localCheckpoint() // bounded k-row grid, one scan
        val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("st"))
        val mg = col("sg").cast("double") / col("ng").cast("double")
        val m = col("st").cast("double") / col("n").cast("double")
        val terms = g.crossJoin(broadcast(tot))
          .select(col("n"),
            floor(col("ng").cast("double") * (mg - m) * (mg - m) *
              lit(1000000.0) + lit(0.5)).cast("long").as("bq"),
            floor((col("ssg").cast("double") -
              col("ng").cast("double") * mg * mg) *
              lit(1000000.0) + lit(0.5)).cast("long").as("wq"))
          .groupBy(col("n"))
          .agg(count(lit(1)).as("k"), sum(col("bq")).as("ssb"),
            sum(col("wq")).as("ssw"))
        val f = (col("ssb").cast("double") / (col("k") - 1).cast("double")) /
          (col("ssw").cast("double") / (col("n") - col("k")).cast("double"))
        terms.select(col("n").as("n_docs"), col("k").as("n_sources"),
          Num.r4(f).as("f_stat"),
          Num.r6(col("ssb").cast("double") /
            (col("ssb") + col("ssw")).cast("double")).as("eta_sq"))
      },
      Some("""
        WITH g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS ng,
            CAST(SUM(n_chars) AS BIGINT) AS sg,
            SUM(CAST(n_chars AS HUGEINT) * n_chars) AS ssg
          FROM documents GROUP BY source),
        tot AS (SELECT SUM(ng) AS n, SUM(sg) AS st FROM g),
        terms AS (
          SELECT n,
            CAST(FLOOR(ng * (CAST(sg AS DOUBLE)/ng - CAST(st AS DOUBLE)/n)
                          * (CAST(sg AS DOUBLE)/ng - CAST(st AS DOUBLE)/n)
                       * 1000000.0 + 0.5) AS BIGINT) AS bq,
            CAST(FLOOR((CAST(ssg AS DOUBLE)
                        - ng * (CAST(sg AS DOUBLE)/ng) * (CAST(sg AS DOUBLE)/ng))
                       * 1000000.0 + 0.5) AS BIGINT) AS wq
          FROM g CROSS JOIN tot),
        agg AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS k,
            SUM(bq) AS ssb, SUM(wq) AS ssw
          FROM terms GROUP BY n)
        SELECT CAST(n AS BIGINT) AS n_docs, k AS n_sources,
          FLOOR(((CAST(ssb AS DOUBLE) / (k - 1))
                 / (CAST(ssw AS DOUBLE) / (n - k)))
                * 10000 + 0.500001) / 10000 AS f_stat,
          FLOOR((CAST(ssb AS DOUBLE) / (CAST(ssb AS DOUBLE) + ssw))
                * 1000000 + 0.500001) / 1000000 AS eta_sq
        FROM agg"""),
      "one-way ANOVA F across sources on doc length: exact integer group moments, micro-quantized SSB/SSW terms, eta-squared effect size"),

    // ---------------------------------------------------------------- q256
    // Quantile treatment effects on per-user activity between the
    // q181 md5 arms: decile-by-decile differences of the per-user
    // event-count distribution — the DISTRIBUTIONAL readout the mean
    // tests (q181/q237) hide (a treatment that moves only the heavy
    // tail leaves the median untouched). Deciles are exact ranks over
    // the bounded (arm × activity-count) histogram — the q223/q142
    // discipline, never a per-arm sort of raw users; the rank cut is
    // the pure-integer ceil(n·d/10) = (n·d+9) div 10, so both engines
    // agree without a single double until... there are no doubles.
    Query(
      "q256_qte_activity",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val perUser = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
          .withColumn("arm", graft.ext.Dedup.h60(
            concat(lit("ab|"), col("user_id").cast("string"))) % 2)
        val hist = perUser.groupBy(col("arm"), col("c"))
          .agg(count(lit(1)).as("k"))
          .localCheckpoint() // bounded (arm × activity-count) grid
        val n = hist.groupBy(col("arm")).agg(sum(col("k")).as("n"))
        val cum = hist.withColumn("cum", sum(col("k")).over(
          Window.partitionBy(col("arm")).orderBy(col("c"))))
        val spine = s.range(1, 10).select(col("id").as("decile"))
        val q = cum.join(n, Seq("arm"))
          .crossJoin(broadcast(spine))
          .filter(col("cum") >=
            ((col("n") * col("decile") + lit(9)) / lit(10)).cast("long"))
          .groupBy(col("decile"), col("arm")).agg(min(col("c")).as("v"))
        q.groupBy(col("decile"))
          .agg(max(when(col("arm") === 0, col("v"))).as("events_a"),
            max(when(col("arm") === 1, col("v"))).as("events_b"))
          .select(col("decile"), col("events_a"), col("events_b"),
            (col("events_a") - col("events_b")).as("qte_events"))
          .orderBy(col("decile"))
      },
      Some(s"""
        WITH per_user AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c,
            ${graft.ext.Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")} % 2
              AS arm
          FROM events GROUP BY user_id),
        hist AS (
          SELECT arm, c, CAST(COUNT(*) AS BIGINT) AS k
          FROM per_user GROUP BY arm, c),
        n AS (SELECT arm, CAST(SUM(k) AS BIGINT) AS n FROM hist GROUP BY arm),
        cum AS (
          SELECT arm, c,
            SUM(k) OVER (PARTITION BY arm ORDER BY c
                         ROWS UNBOUNDED PRECEDING) AS cum
          FROM hist),
        spine AS (SELECT unnest(range(1, 10)) AS decile),
        q AS (
          SELECT s.decile, cum.arm, CAST(MIN(cum.c) AS BIGINT) AS v
          FROM cum JOIN n USING (arm) CROSS JOIN spine s
          WHERE cum.cum >= (n.n * s.decile + 9) // 10
          GROUP BY s.decile, cum.arm)
        SELECT decile,
          CAST(MAX(CASE WHEN arm = 0 THEN v END) AS BIGINT) AS events_a,
          CAST(MAX(CASE WHEN arm = 1 THEN v END) AS BIGINT) AS events_b,
          CAST(MAX(CASE WHEN arm = 0 THEN v END)
               - MAX(CASE WHEN arm = 1 THEN v END) AS BIGINT) AS qte_events
        FROM q GROUP BY decile ORDER BY decile"""),
      "quantile treatment effects on per-user activity between md5 arms: decile-by-decile differences via exact ranks over the bounded count histogram"))
}
