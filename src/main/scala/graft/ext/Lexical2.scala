package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Lexical continuation, batch 49: segmental type–token ratio (MSTTR),
  * Coleman–Liau readability, and Mood's median test of document length
  * across sources. MSTTR is the length-robust lexical-diversity number
  * (raw TTR collapses as docs grow — q233/q234 pin that Heaps curve);
  * Coleman–Liau is the readability formula that needs NO syllable
  * heuristic (letters and sentences only), complementing Flesch (q276);
  * Mood's median test is the nonparametric "are these sources the same
  * length distribution" gate that, unlike Kruskal–Wallis (q284), only
  * trusts the sign of deviation from the global median.
  */
object Lexical2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q356
    // MSTTR-25 per language: split each doc's token stream into full
    // non-overlapping 25-token segments, TTR = distinct/25 per segment,
    // mean over segments. Distinct counts are exact integers; per-
    // segment TTRs are 1/25-grid rationals, so the mean is exact.
    Query(
      "q356_msttr",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
          .select(col("doc_id"), col("lang"),
            expr("pos div 25").as("seg"), col("t"))
        // full segments only: a segment is complete iff it has 25 tokens
        val segs = tok.groupBy(col("doc_id"), col("lang"), col("seg"))
          .agg(count(lit(1)).as("n_tok"), countDistinct(col("t")).as("n_types"))
          .filter(col("n_tok") === 25)
        segs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_segments"), sum(col("n_types")).as("st"))
          .select(col("lang"), col("n_segments"),
            Num.r4(col("st").cast("double") /
              (col("n_segments").cast("double") * lit(25.0))).as("msttr"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, lang, (pos - 1) // 25 AS seg, t
          FROM (SELECT doc_id, lang,
                  unnest(string_split(text, ' ')) AS t,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents)),
        segs AS (
          SELECT doc_id, lang, seg,
            CAST(COUNT(*) AS BIGINT) AS n_tok,
            CAST(COUNT(DISTINCT t) AS BIGINT) AS n_types
          FROM tok GROUP BY doc_id, lang, seg
          HAVING COUNT(*) = 25)
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_segments,
          FLOOR((CAST(SUM(n_types) AS DOUBLE) / (COUNT(*) * 25.0))
                * 10000 + 0.500001) / 10000 AS msttr
        FROM segs GROUP BY lang ORDER BY lang"""),
      "MSTTR-25 lexical diversity per language over full 25-token segments"),

    // ---------------------------------------------------------------- q357
    // Coleman–Liau index per source: CLI = 0.0588·L − 0.296·S − 15.8
    // with L = letters per 100 words, S = sentences per 100 words —
    // the no-syllable readability twin of q276, micro-quantized per
    // doc before the per-source mean (the q276 discipline).
    Query(
      "q357_coleman_liau",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("w"),
            expr("size(regexp_extract_all(lower(text), '[a-z]', 0))")
              .cast("long").as("letters"),
            greatest(expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
              lit(1L)).as("sents"))
          .filter(col("w") > 0)
          .select(col("source"),
            floor((lit(0.0588) * (col("letters").cast("double") * lit(100.0) /
                col("w").cast("double"))
              - lit(0.296) * (col("sents").cast("double") * lit(100.0) /
                col("w").cast("double"))
              - lit(15.8)) * lit(1e6) + lit(0.5)).cast("long").as("cli"))
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("cli")).as("sc"))
          .select(col("source"), col("n_docs"),
            Num.r4(col("sc").cast("double") / col("n_docs").cast("double") / lit(1e6))
              .as("avg_cli"))
          .orderBy(col("source"))
      },
      Some("""
        WITH scored AS (
          SELECT source,
            CAST(FLOOR((0.0588 * (CAST(letters AS DOUBLE) * 100.0 / w)
              - 0.296 * (CAST(sents AS DOUBLE) * 100.0 / w)
              - 15.8) * 1e6 + 0.5) AS BIGINT) AS cli
          FROM (
            SELECT source,
              CAST(LEN(string_split(text, ' ')) AS BIGINT) AS w,
              CAST(LEN(regexp_extract_all(lower(text), '[a-z]')) AS BIGINT)
                AS letters,
              GREATEST(CAST(LEN(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
                AS sents
            FROM documents)
          WHERE w > 0)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          FLOOR((CAST(SUM(cli) AS DOUBLE) / COUNT(*) / 1e6) * 10000 + 0.500001)
            / 10000 AS avg_cli
        FROM scored GROUP BY source ORDER BY source"""),
      "Coleman-Liau readability per source (letters+sentences only, micro-quantized per-doc)"),

    // ---------------------------------------------------------------- q358
    // Mood's median test: are document lengths (n_chars) distributed
    // around the same median in every source? Global lower median,
    // per-source above/below counts (ties-to-median excluded, the q351
    // rule), chi-square with k−1 df from the 2×k table. Counts are
    // exact; the statistic is one closed-form double.
    Query(
      "q358_mood_median",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("source"), col("n_chars"))
        val wR = org.apache.spark.sql.expressions.Window
          .orderBy(col("n_chars"), col("source"))
        val med = docs.withColumn("rn", row_number().over(wR))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("n_chars").as("med"))
        val cls = docs.crossJoin(broadcast(med))
          .filter(col("n_chars") =!= col("med"))
          .select(col("source"), (col("n_chars") > col("med")).cast("long").as("ab"))
        val per = cls.groupBy(col("source"))
          .agg(count(lit(1)).as("ni"), sum(col("ab")).as("ai"))
        val tot = per.agg(sum(col("ni")).as("nn"), sum(col("ai")).as("aa"),
          count(lit(1)).as("k"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("ni").as("n_docs"), col("ai").as("n_above"),
            col("k"),
            // chi2 contribution of this source's above AND below cells
            // micro-quantize each source's contribution BEFORE the
            // cross-source sum so accumulation order cannot surface
            floor((({
              val e1 = col("ni").cast("double") * col("aa").cast("double") /
                col("nn").cast("double")
              (col("ai").cast("double") - e1) * (col("ai").cast("double") - e1) / e1
            }) + ({
              val e0 = col("ni").cast("double") *
                (col("nn") - col("aa")).cast("double") / col("nn").cast("double")
              ((col("ni") - col("ai")).cast("double") - e0) *
                ((col("ni") - col("ai")).cast("double") - e0) / e0
            })) * lit(1e6) + lit(0.5)).cast("long").as("qc"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("k_sources"), sum(col("qc")).as("sqc"))
          .select(col("k_sources"),
            Num.r4(col("sqc").cast("double") / lit(1e6)).as("chi2_stat"))
      },
      Some("""
        WITH med AS (
          SELECT n_chars AS med FROM (
            SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars, source) AS rn,
              COUNT(*) OVER () AS n
            FROM documents)
          WHERE rn = (n + 1) // 2),
        cls AS (
          SELECT source, CAST(n_chars > med AS BIGINT) AS ab
          FROM documents CROSS JOIN med WHERE n_chars <> med),
        per AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS ni,
            CAST(SUM(ab) AS BIGINT) AS ai
          FROM cls GROUP BY source),
        tot AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn, CAST(SUM(ai) AS BIGINT) AS aa,
            CAST(COUNT(*) AS BIGINT) AS k
          FROM per),
        qc AS (
          SELECT CAST(FLOOR((
            (ai - ni * CAST(aa AS DOUBLE) / nn) * (ai - ni * CAST(aa AS DOUBLE) / nn)
              / (ni * CAST(aa AS DOUBLE) / nn)
            + ((ni - ai) - ni * CAST(nn - aa AS DOUBLE) / nn)
              * ((ni - ai) - ni * CAST(nn - aa AS DOUBLE) / nn)
              / (ni * CAST(nn - aa AS DOUBLE) / nn)) * 1e6 + 0.5) AS BIGINT) AS qc
          FROM per CROSS JOIN tot)
        SELECT CAST(COUNT(*) AS BIGINT) AS k_sources,
          FLOOR((CAST(SUM(qc) AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS chi2_stat
        FROM qc"""),
      "Mood's median test of doc length across sources (lower median, ties excluded, 2xk chi-square)"),

    // ---------------------------------------------------------------- q380
    // Honoré's R and Sichel's S vocabulary-richness statistics per
    // source — the frequency-spectrum complements to Yule's K (q282)
    // and the hapax share (q117): R = 100·ln N / (1 − V1/V) diverges
    // as the hapax share approaches 1 (rich, non-repetitive prose);
    // S = V2/V is Sichel's dis-legomena proportion, empirically stable
    // across text sizes. One token pass → per-source frequency
    // spectrum; ln N is pico-quantized (q376's rule) so the only
    // doubles crossing engines derive from identical exact integers.
    // V1 = V (every token a hapax) yields NULL R on both engines.
    Query(
      "q380_vocab_richness",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        counts.groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("vocab"),
            count(when(col("c") === 1, 1)).as("v1"),
            count(when(col("c") === 2, 1)).as("v2"))
          .withColumn("lnq",
            floor(log(col("n_tokens").cast("double")) * lit(1e12) + lit(0.5))
              .cast("long"))
          .select(col("source"), col("n_tokens"), col("vocab"), col("v1"),
            col("v2"),
            when(col("v1") === col("vocab"), lit(null).cast("double"))
              .otherwise(Num.r4(lit(100.0) * (col("lnq").cast("double") / lit(1e12))
                * col("vocab").cast("double")
                / (col("vocab") - col("v1")).cast("double")))
              .as("honore_r"),
            Num.r6(col("v2").cast("double") / col("vocab").cast("double"))
              .as("sichel_s"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        spec AS (
          SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
            CAST(COUNT(*) AS BIGINT) AS vocab,
            CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS v1,
            CAST(COUNT(*) FILTER (WHERE c = 2) AS BIGINT) AS v2
          FROM counts GROUP BY source),
        q AS (
          SELECT source, n_tokens, vocab, v1, v2,
            CAST(FLOOR(LN(CAST(n_tokens AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)
              AS lnq
          FROM spec)
        SELECT source, n_tokens, vocab, v1, v2,
          CASE WHEN v1 = vocab THEN NULL
               ELSE FLOOR((100.0 * (CAST(lnq AS DOUBLE) / 1e12)
                           * vocab / CAST(vocab - v1 AS DOUBLE))
                          * 10000 + 0.500001) / 10000 END AS honore_r,
          FLOOR((CAST(v2 AS DOUBLE) / vocab) * 1000000 + 0.500001) / 1000000
            AS sichel_s
        FROM q ORDER BY source"""),
      "Honore's R and Sichel's S vocabulary richness per source from the token frequency spectrum (pico-quantized ln N, exact V/V1/V2)")
  )
}
