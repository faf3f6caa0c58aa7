package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-quality continuation, batch 25: readability scoring, arrival-
  * process goodness-of-fit, and the Hill diversity profile. Same
  * exactness rules as the rest of the registry: integer/quantized
  * inputs, 128-bit sums where row counts could overflow int64, EXP/LN
  * applied to identical doubles on both engines (the q255 discipline),
  * quantize-then-aggregate so order never matters.
  */
object Quality3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q276
    // Flesch reading ease per source with a vowel-group syllable
    // heuristic (the classic corpus-filtering readability gate).
    // Words = whitespace tokens, sentences = [.!?]+ runs (min 1),
    // syllables = [aeiouy]+ groups — all exact integers per doc, so the
    // per-doc score is an identical double both engines; it is
    // micro-quantized before the per-source mean. easy_share counts
    // docs at FRE ≥ 60 ("plain English") via the quantized integer.
    Query(
      "q276_readability",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("w"),
            greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
              lit(1L)).as("sents"),
            expr("size(regexp_extract_all(lower(text), '[aeiouy]+', 0))")
              .cast("long").as("syl"))
          .filter(col("w") > 0)
          .select(col("source"),
            floor((lit(206.835)
              - lit(1.015) * (col("w").cast("double") / col("sents").cast("double"))
              - lit(84.6) * (col("syl").cast("double") / col("w").cast("double")))
              * lit(1e6) + lit(0.5)).cast("long").as("freq"))
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("freq")).as("sfre"),
            count(when(col("freq") >= 60000000L, 1)).as("n_easy"))
          .select(col("source"), col("n_docs"),
            Num.r4(col("sfre").cast("double") / col("n_docs").cast("double") / lit(1e6))
              .as("avg_flesch"),
            Num.r4(col("n_easy").cast("double") / col("n_docs").cast("double"))
              .as("easy_share"))
          .orderBy(col("source"))
      },
      Some("""
        WITH scored AS (
          SELECT source,
            CAST(FLOOR((206.835
              - 1.015 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
              - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
              * 1e6 + 0.5) AS BIGINT) AS freq
          FROM (
            SELECT source,
              CAST(LEN(string_split(text, ' ')) AS BIGINT) AS w,
              GREATEST(CAST(LEN(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
                AS sents,
              CAST(LEN(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
                AS syl
            FROM documents)
          WHERE w > 0)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          FLOOR((CAST(SUM(freq) AS DOUBLE) / COUNT(*) / 1e6) * 10000 + 0.500001)
            / 10000 AS avg_flesch,
          FLOOR((CAST(COUNT(*) FILTER (WHERE freq >= 60000000) AS DOUBLE)
                 / COUNT(*)) * 10000 + 0.500001) / 10000 AS easy_share
        FROM scored GROUP BY source ORDER BY source"""),
      "Flesch reading ease per source (vowel-group syllables, micro-quantized per-doc scores, plain-English share)"),

    // ---------------------------------------------------------------- q277
    // Is each event type's arrival process Poisson? Inter-event gaps
    // (per user, pooled by type) are fit by exponential MLE
    // λ̂ = n/Σgap, and the KS distance to Exp(λ̂) is taken on the
    // minute-bucket grid (the q223/q174 bounded-histogram discipline:
    // the statistic is DEFINED on observed bucket edges — no raw-row
    // global sort). The empirical side is exact-integer cum/n; the
    // model side is one EXP per bucket on identical doubles; each
    // |diff| is nano-quantized before the max so the argmax is exact.
    Query(
      "q277_exp_gap_ks",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(col("event_type"), col("gap"),
            (col("gap") / lit(60000000L)).cast("long").as("bm"))
          .localCheckpoint() // one keyed window pass feeds fit + histogram
        val fit = gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("gap").cast("decimal(38,0)")).as("sgap"))
          .filter(col("n") >= 10 && col("sgap") > 0)
        val hist = gaps.groupBy(col("event_type"), col("bm"))
          .agg(count(lit(1)).as("cnt"))
        val wB = Window.partitionBy(col("event_type")).orderBy(col("bm"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("cnt")).over(wB))
        val diffs = cum.join(broadcast(fit), Seq("event_type"))
          .withColumn("femp", col("cum").cast("double") / col("n").cast("double"))
          .withColumn("fmod", lit(1.0) - exp(
            -(col("n").cast("double") / col("sgap").cast("double")) *
              ((col("bm") + 1) * lit(60000000L)).cast("double")))
          .withColumn("dq",
            floor(abs(col("femp") - col("fmod")) * lit(1e9) + lit(0.5)).cast("long"))
        diffs.groupBy(col("event_type"))
          .agg(max(col("n")).as("n_gaps"),
            max(col("sgap")).as("sgap"),
            max(col("dq")).as("maxdq"))
          .select(col("event_type"), col("n_gaps"),
            Num.r4(col("sgap").cast("double") / col("n_gaps").cast("double")
              / lit(60000000.0)).as("mean_gap_min"),
            Num.r6(col("maxdq").cast("double") / lit(1e9)).as("ks_exp"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH gaps AS (
          SELECT event_type,
            us - LAG(us) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS gap
          FROM (SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us
                FROM events)
          QUALIFY gap IS NOT NULL),
        g AS (SELECT event_type, gap, gap // 60000000 AS bm FROM gaps),
        fit AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            SUM(CAST(gap AS HUGEINT)) AS sgap
          FROM g GROUP BY event_type
          HAVING COUNT(*) >= 10 AND SUM(CAST(gap AS HUGEINT)) > 0),
        hist AS (
          SELECT event_type, bm, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM g GROUP BY event_type, bm),
        cum AS (
          SELECT event_type, bm,
            SUM(cnt) OVER (PARTITION BY event_type ORDER BY bm
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        diffs AS (
          SELECT c.event_type, f.n, f.sgap,
            CAST(FLOOR(ABS(
              CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
              - (1.0 - EXP(-(CAST(n AS DOUBLE) / CAST(sgap AS DOUBLE))
                           * CAST((bm + 1) * 60000000 AS DOUBLE))))
              * 1e9 + 0.5) AS BIGINT) AS dq
          FROM cum c JOIN fit f USING (event_type))
        SELECT event_type, MAX(n) AS n_gaps,
          FLOOR((CAST(MAX(sgap) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) / 60000000.0)
                * 10000 + 0.500001) / 10000 AS mean_gap_min,
          FLOOR((CAST(MAX(dq) AS DOUBLE) / 1e9) * 1000000 + 0.500001) / 1000000
            AS ks_exp
        FROM diffs GROUP BY event_type ORDER BY event_type"""),
      "Exponential MLE fit + minute-grid KS distance for inter-event gaps per event type (is the arrival process Poisson?)"),

    // ---------------------------------------------------------------- q278
    // Hill diversity profile of each source's token distribution:
    // D0 = richness, D1 = exp(Shannon H), D2 = inverse Simpson — the
    // ecology-standard "effective vocabulary sizes" that weight rare
    // tokens progressively less (Hill 1973). One explode pass; H terms
    // pico-quantized before the vocab-sized sum (exact in any order);
    // Σc(c−1) rides DECIMAL/HUGEINT so D2 is a ratio of exact
    // integers. Requires a repeated token (Simpson defined).
    Query(
      "q278_hill_diversity",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t"))
          .agg(count(lit(1)).as("c"))
        val perSrc = counts.groupBy(col("source"))
          .agg(sum(col("c")).as("nn"),
            count(lit(1)).as("d0"),
            sum((col("c") * (col("c") - 1)).cast("decimal(38,0)")).as("s2"))
          .filter(col("nn") >= 2 && col("s2") > 0)
        val hq = counts.join(broadcast(perSrc.select(col("source"), col("nn"))),
            Seq("source"))
          .select(col("source"),
            floor(-(col("c").cast("double") / col("nn").cast("double")) *
              log(col("c").cast("double") / col("nn").cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("tq"))
          .groupBy(col("source")).agg(sum(col("tq")).as("hq"))
        perSrc.join(hq, Seq("source"))
          .select(col("source"), col("nn").as("n_tokens"),
            col("d0").as("d0_richness"),
            Num.r4(exp(col("hq").cast("double") / lit(1e12))).as("d1_shannon"),
            Num.r4((col("nn").cast("double") * (col("nn") - 1).cast("double")) /
              col("s2").cast("double")).as("d2_simpson"),
            Num.r4(exp(col("hq").cast("double") / lit(1e12)) /
              col("d0").cast("double")).as("evenness"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        persrc AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS nn,
            CAST(COUNT(*) AS BIGINT) AS d0,
            SUM(CAST(c AS HUGEINT) * (c - 1)) AS s2
          FROM counts GROUP BY source
          HAVING SUM(c) >= 2 AND SUM(CAST(c AS HUGEINT) * (c - 1)) > 0),
        hq AS (
          SELECT counts.source, SUM(CAST(FLOOR(
            -(CAST(c AS DOUBLE) / nn) * LN(CAST(c AS DOUBLE) / nn)
            * 1e12 + 0.5) AS BIGINT)) AS hq
          FROM counts JOIN persrc ON persrc.source = counts.source
          GROUP BY counts.source)
        SELECT source, nn AS n_tokens, d0 AS d0_richness,
          FLOOR(EXP(CAST(hq AS DOUBLE) / 1e12) * 10000 + 0.500001) / 10000
            AS d1_shannon,
          FLOOR(((CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE))
                 / CAST(s2 AS DOUBLE)) * 10000 + 0.500001) / 10000 AS d2_simpson,
          FLOOR((EXP(CAST(hq AS DOUBLE) / 1e12) / CAST(d0 AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS evenness
        FROM persrc JOIN hq USING (source) ORDER BY source"""),
      "Hill diversity profile per source: richness D0, exp-Shannon D1, inverse-Simpson D2, evenness (pico-quantized H terms, 128-bit Simpson sums)"),

    // ---------------------------------------------------------------- q366
    // Syllable-free readability per language: ARI (characters-per-word
    // + words-per-sentence) and LIX (words-per-sentence + long-word
    // percentage) — the readability gates that survive languages where
    // q276's vowel-group syllable heuristic breaks (zh has no [aeiouy]
    // clusters). Words/sentences follow the q276 conventions; chars =
    // non-space length; long words are tokens > 6 chars (LIX's
    // definition). Per-doc scores are exact-input doubles micro-
    // quantized before the per-lang mean (q276 discipline); hard_share
    // counts docs at LIX ≥ 50 ("very difficult").
    Query(
      "q366_ari_lix",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("lang"),
            size(split(col("text"), " ")).cast("long").as("w"),
            greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
              lit(1L)).as("sents"),
            length(regexp_replace(col("text"), " ", "")).cast("long").as("chars"),
            expr("size(filter(split(text, ' '), x -> length(x) > 6))")
              .cast("long").as("lw"))
          .filter(col("w") > 0)
          .select(col("lang"),
            floor((lit(4.71) * (col("chars").cast("double") / col("w").cast("double"))
              + lit(0.5) * (col("w").cast("double") / col("sents").cast("double"))
              - lit(21.43)) * lit(1e6) + lit(0.5)).cast("long").as("ariq"),
            floor((col("w").cast("double") / col("sents").cast("double")
              + lit(100.0) * (col("lw").cast("double") / col("w").cast("double")))
              * lit(1e6) + lit(0.5)).cast("long").as("lixq"))
        scored.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ariq")).as("sari"), sum(col("lixq")).as("slix"),
            count(when(col("lixq") >= 50000000L, 1)).as("n_hard"))
          .select(col("lang"), col("n_docs"),
            Num.r4(col("sari").cast("double") / col("n_docs").cast("double") / lit(1e6))
              .as("avg_ari"),
            Num.r4(col("slix").cast("double") / col("n_docs").cast("double") / lit(1e6))
              .as("avg_lix"),
            Num.r4(col("n_hard").cast("double") / col("n_docs").cast("double"))
              .as("hard_share"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH scored AS (
          SELECT lang,
            CAST(FLOOR((4.71 * (CAST(chars AS DOUBLE) / CAST(w AS DOUBLE))
              + 0.5 * (CAST(w AS DOUBLE) / CAST(sents AS DOUBLE))
              - 21.43) * 1e6 + 0.5) AS BIGINT) AS ariq,
            CAST(FLOOR((CAST(w AS DOUBLE) / CAST(sents AS DOUBLE)
              + 100.0 * (CAST(lw AS DOUBLE) / CAST(w AS DOUBLE)))
              * 1e6 + 0.5) AS BIGINT) AS lixq
          FROM (
            SELECT lang,
              CAST(LEN(string_split(text, ' ')) AS BIGINT) AS w,
              GREATEST(CAST(LEN(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
                AS sents,
              CAST(LEN(REPLACE(text, ' ', '')) AS BIGINT) AS chars,
              CAST(LEN(LIST_FILTER(string_split(text, ' '),
                x -> LEN(x) > 6)) AS BIGINT) AS lw
            FROM documents)
          WHERE w > 0)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          FLOOR((CAST(SUM(ariq) AS DOUBLE) / COUNT(*) / 1e6) * 10000 + 0.500001)
            / 10000 AS avg_ari,
          FLOOR((CAST(SUM(lixq) AS DOUBLE) / COUNT(*) / 1e6) * 10000 + 0.500001)
            / 10000 AS avg_lix,
          FLOOR((CAST(COUNT(*) FILTER (WHERE lixq >= 50000000) AS DOUBLE)
                 / COUNT(*)) * 10000 + 0.500001) / 10000 AS hard_share
        FROM scored GROUP BY lang ORDER BY lang"""),
      "ARI + LIX syllable-free readability per language (non-space chars, >6-char long words, micro-quantized per-doc scores, LIX>=50 hard share)")
  )
}
