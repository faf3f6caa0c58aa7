package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: corpus-shape audits — integral drift distance,
  * frequency concentration, tokenizer fertility and keyword extraction
  * by weighted log-odds. All run on (source × domain)-bounded grids
  * derived from one corpus pass each; nothing is quadratic in corpus
  * size.
  */
object Corpus3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q202
    // Wasserstein-1 (earth-mover) distance between each source's doc-
    // length distribution and the rest of the corpus — the INTEGRAL
    // drift companion to q174's KS maximum: KS sees the worst point,
    // W₁ = ∫|F₁−F₂| accumulates the whole displaced mass, so a broad
    // small shift (invisible to KS) still registers. Exact integers:
    // the same |cum1·n2 − cum2·n1| numerator as q174, multiplied by
    // the integer gap to the next grid length, summed in DECIMAL(38)
    // and divided once at the end.
    Query(
      "q202_wasserstein_drift",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // bounded (source × length) grid, one scan
        val lens = counts.select(col("n_chars")).distinct()
        val srcs = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n1"))
        val tot = counts.agg(sum(col("cnt")).as("n"))
        val wS = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        val cum = srcs.crossJoin(broadcast(lens))
          .join(counts, Seq("source", "n_chars"), "left")
          .withColumn("cum1", sum(coalesce(col("cnt"), lit(0L)))
            .over(wS.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("gap", lead(col("n_chars"), 1).over(wS) - col("n_chars"))
          .filter(col("gap").isNotNull) // last grid point carries no mass gap
        val cumAll = cum.groupBy(col("n_chars"))
          .agg(sum(col("cum1")).as("cumall"))
        cum.join(broadcast(cumAll), Seq("n_chars"))
          .crossJoin(broadcast(tot))
          .withColumn("num",
            abs(col("cum1").cast("decimal(38,0)") * (col("n") - col("n1")) -
              (col("cumall") - col("cum1")).cast("decimal(38,0)") * col("n1"))
              * col("gap"))
          .groupBy(col("source"), col("n1"), col("n"))
          .agg(sum(col("num")).as("w1num"))
          .select(col("source"), col("n1").as("n_docs"),
            Num.r6(col("w1num").cast("double") /
              (col("n1").cast("double") * (col("n") - col("n1")).cast("double")))
              .as("w1_dist"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, n_chars, COUNT(*) AS cnt
          FROM documents GROUP BY source, n_chars),
        lens AS (SELECT DISTINCT n_chars FROM documents),
        srcs AS (SELECT source, COUNT(*) AS n1 FROM documents GROUP BY source),
        tot AS (SELECT COUNT(*) AS n FROM documents),
        grid AS (
          SELECT s.source, s.n1, l.n_chars, COALESCE(c.cnt, 0) AS cnt
          FROM srcs s CROSS JOIN lens l
          LEFT JOIN counts c ON c.source = s.source AND c.n_chars = l.n_chars),
        cum AS (
          SELECT source, n1, n_chars,
            SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
            LEAD(n_chars, 1) OVER (PARTITION BY source ORDER BY n_chars)
              - n_chars AS gap
          FROM grid QUALIFY gap IS NOT NULL),
        call AS (SELECT n_chars, SUM(cum1) AS cumall FROM cum GROUP BY n_chars),
        agg AS (
          SELECT c.source, c.n1, t.n,
            SUM(ABS(CAST(c.cum1 AS HUGEINT) * (t.n - c.n1)
                    - CAST(call.cumall - c.cum1 AS HUGEINT) * c.n1)
                * gap) AS w1num
          FROM cum c JOIN call USING (n_chars) CROSS JOIN tot t
          GROUP BY c.source, c.n1, t.n)
        SELECT source, CAST(n1 AS BIGINT) AS n_docs,
          FLOOR((CAST(w1num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS w1_dist
        FROM agg ORDER BY source"""),
      "Wasserstein-1 drift per source vs rest over doc lengths: exact integer |cum1*n2-cum2*n1|*gap sums (the integral companion to KS)"),

    // ---------------------------------------------------------------- q203
    // Gini coefficient of each source's token-frequency distribution —
    // the concentration audit between q172's Zipf slope (shape of the
    // top) and q117's hapax share (mass of the bottom):
    // G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending frequencies.
    // Ranks come from ONE key-partitioned window over the
    // (source × vocab)-bounded grid; tied frequencies contribute the
    // same Σ i·xᵢ under any tie order, so the (freq, term) order is
    // for determinism only.
    Query(
      "q203_token_gini",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("source")).orderBy(col("x"), col("t"))
        freq.withColumn("i", row_number().over(w).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_terms"), sum(col("x")).as("n_tokens"),
            sum((col("i") * col("x")).cast("decimal(38,0)")).as("ix"))
          .select(col("source"), col("n_terms"), col("n_tokens"),
            Num.r6(lit(2.0) * col("ix").cast("double") /
              (col("n_terms").cast("double") * col("n_tokens").cast("double")) -
              (col("n_terms") + lit(1)).cast("double") /
                col("n_terms").cast("double")).as("gini"))
          .orderBy(col("source"))
      },
      Some("""
        WITH freq AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS x
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        ranked AS (
          SELECT source, x,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY x, t) AS i
          FROM freq),
        agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
            CAST(SUM(x) AS BIGINT) AS n_tokens,
            SUM(CAST(i AS HUGEINT) * x) AS ix
          FROM ranked GROUP BY source)
        SELECT source, n_terms, n_tokens,
          FLOOR((2.0 * CAST(ix AS DOUBLE)
                 / (CAST(n_terms AS DOUBLE) * CAST(n_tokens AS DOUBLE))
                 - CAST(n_terms + 1 AS DOUBLE) / n_terms)
                * 1000000 + 0.500001) / 1000000 AS gini
        FROM agg ORDER BY source"""),
      "Gini concentration of per-source token frequencies via one key-partitioned rank window on the vocab grid"),

    // ---------------------------------------------------------------- q204
    // Tokenizer fertility by language: characters per whitespace token
    // and the ratio to English — the audit that decides whether a
    // tokenizer (or a char-budget heuristic) taxes some languages more
    // than others. Exact integer totals; the en reference row is a
    // 1-row broadcast.
    Query(
      "q204_token_fertility",
      (s, d) => {
        val per = Tables.documents(s, d)
          .select(col("lang"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_toks"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
            sum(col("n_toks")).as("toks"))
          .localCheckpoint() // bounded |langs| rows, feeds itself + en row
        val en = per.filter(col("lang") === "en")
          .select((col("chars").cast("double") / col("toks").cast("double"))
            .as("en_cpt"))
        per.crossJoin(broadcast(en))
          .select(col("lang"), col("n_docs"), col("toks").as("n_tokens"),
            Num.r4(col("chars").cast("double") / col("toks").cast("double"))
              .as("chars_per_token"),
            Num.r4((col("chars").cast("double") / col("toks").cast("double")) /
              col("en_cpt")).as("rel_to_en"))
          .orderBy(col("lang"))
      },
      Some("""
        WITH per AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS chars,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
          FROM documents GROUP BY lang),
        en AS (SELECT CAST(chars AS DOUBLE) / toks AS en_cpt
               FROM per WHERE lang = 'en')
        SELECT lang, n_docs, toks AS n_tokens,
          FLOOR((CAST(chars AS DOUBLE) / toks) * 10000 + 0.500001) / 10000
            AS chars_per_token,
          FLOOR(((CAST(chars AS DOUBLE) / toks) / en_cpt) * 10000 + 0.500001)
            / 10000 AS rel_to_en
        FROM per CROSS JOIN en ORDER BY lang"""),
      "tokenizer fertility per language: chars per whitespace token and ratio to the English reference"),

    // ---------------------------------------------------------------- q206
    // Keyword extraction by weighted log-odds with an informative
    // Dirichlet prior (Monroe, Colaresi & Quinn 2008): for source
    // 'src0' vs the rest, δ_w = ln-odds difference with prior
    // α_w = α₀·cf_w/N (α₀ = 100), z_w = δ_w/√(1/(y₁+α) + 1/(y₂+α)).
    // The standard "what words CHARACTERIZE this corpus slice" audit —
    // more robust than raw TF-IDF deltas for rare words. Identical
    // IEEE expression from exact integer counts; z quantized to micro
    // for the total-order top-20.
    Query(
      "q206_keyness_logodds",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .localCheckpoint() // one pass feeds both sides and the prior
        val y1 = tok.filter(col("source") === "src0")
          .groupBy(col("t")).agg(count(lit(1)).as("y1"))
        val cf = tok.groupBy(col("t")).agg(count(lit(1)).as("cf"))
        val tots = tok.agg(count(lit(1)).as("nn"),
          count(when(col("source") === "src0", 1)).as("n1"))
        val g = cf.join(y1, Seq("t"), "left")
          .crossJoin(broadcast(tots))
          .withColumn("a1", coalesce(col("y1"), lit(0L)).cast("double"))
          .withColumn("a2", (col("cf") - coalesce(col("y1"), lit(0L))).cast("double"))
          .withColumn("alpha",
            lit(100.0) * col("cf").cast("double") / col("nn").cast("double"))
        val n1d = col("n1").cast("double")
        val n2d = (col("nn") - col("n1")).cast("double")
        val dlt =
          log((col("a1") + col("alpha")) /
            (n1d + lit(100.0) - col("a1") - col("alpha"))) -
            log((col("a2") + col("alpha")) /
              (n2d + lit(100.0) - col("a2") - col("alpha")))
        val z = dlt / sqrt(lit(1.0) / (col("a1") + col("alpha")) +
          lit(1.0) / (col("a2") + col("alpha")))
        g.withColumn("zq", floor(z * lit(1e6) + lit(0.5)).cast("long"))
          .orderBy(abs(col("zq")).desc, col("t"))
          .limit(20)
          .select(col("t").as("term"),
            coalesce(col("y1"), lit(0L)).as("n_target"),
            (col("cf") - coalesce(col("y1"), lit(0L))).as("n_rest"),
            Num.r4(col("zq").cast("double") / lit(1e6)).as("logodds_z"))
      },
      Some("""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        y1 AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS y1 FROM tok
               WHERE source = 'src0' GROUP BY t),
        cf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY t),
        tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                        CAST(COUNT(*) FILTER (WHERE source = 'src0') AS BIGINT)
                          AS n1
                 FROM tok),
        g AS (
          SELECT cf.t, COALESCE(y1.y1, 0) AS y1v, cf.cf, nn, n1,
            CAST(COALESCE(y1.y1, 0) AS DOUBLE) AS a1,
            CAST(cf.cf - COALESCE(y1.y1, 0) AS DOUBLE) AS a2,
            100.0 * CAST(cf.cf AS DOUBLE) / nn AS alpha
          FROM cf LEFT JOIN y1 USING (t) CROSS JOIN tots),
        z AS (
          SELECT t, y1v, cf,
            CAST(FLOOR(
              ((LN((a1 + alpha) / (CAST(n1 AS DOUBLE) + 100.0 - a1 - alpha))
                - LN((a2 + alpha)
                     / (CAST(nn - n1 AS DOUBLE) + 100.0 - a2 - alpha)))
               / SQRT(1.0 / (a1 + alpha) + 1.0 / (a2 + alpha)))
              * 1e6 + 0.5) AS BIGINT) AS zq
          FROM g)
        SELECT t AS term, y1v AS n_target, cf - y1v AS n_rest,
          FLOOR((CAST(zq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS logodds_z
        FROM z ORDER BY ABS(zq) DESC, t LIMIT 20"""),
      "weighted log-odds keyness (informative Dirichlet prior) of src0 vs rest: the Monroe et al. characteristic-terms audit, micro-quantized z top-20"),

    // ---------------------------------------------------------------- q212
    // Theil-T inequality of document lengths, decomposed by source —
    // the additive counterpart to q203's Gini: T_total ≈ T_between +
    // Σ_g w_g·T_g exactly (in real arithmetic), so the report shows
    // how much length inequality lives BETWEEN sources vs WITHIN them.
    // All sums fold the (source × length)-bounded count grid; each
    // x·ln(x·N/S) term is nano-quantized from identical integer
    // inputs, products carried in DECIMAL(38)/HUGEINT.
    Query(
      "q212_theil_decomposition",
      (s, d) => {
        val grid = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // one scan feeds per-source, global and between
        val perSrc = grid.groupBy(col("source"))
          .agg(sum(col("cnt")).as("ng"), sum(col("cnt") * col("n_chars")).as("sg"))
        val tot = perSrc.agg(sum(col("ng")).as("n"), sum(col("sg")).as("ss"))
        def theilNum(cnt: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column,
            nn: org.apache.spark.sql.Column, sm: org.apache.spark.sql.Column) =
          (cnt * x).cast("decimal(38,0)") *
            floor(log(x.cast("double") * nn.cast("double") / sm.cast("double"))
              * lit(1e9) + lit(0.5)).cast("long")
        // within each source: T_g = Σ cnt·x·ln(x·Ng/Sg) / (Sg·1e9)
        val within = grid.join(broadcast(perSrc), Seq("source"))
          .select(col("source"),
            theilNum(col("cnt"), col("n_chars"), col("ng"), col("sg")).as("t"))
          .groupBy(col("source")).agg(sum(col("t")).as("tw"))
        // global: T_total = Σ cnt·x·ln(x·N/S) / (S·1e9), over the
        // length histogram summed across sources
        val glob = grid.groupBy(col("n_chars")).agg(sum(col("cnt")).as("cnt"))
          .crossJoin(broadcast(tot))
          .select(theilNum(col("cnt"), col("n_chars"), col("n"), col("ss")).as("t"),
            col("ss"))
          .groupBy(col("ss")).agg(sum(col("t")).as("tt"))
          .select((col("tt").cast("double") /
            (col("ss").cast("double") * lit(1e9))).as("theil_total"))
        perSrc.join(within, Seq("source")).crossJoin(broadcast(tot))
          .crossJoin(broadcast(glob))
          .select(col("source"), col("ng").as("n_docs"),
            Num.r4(col("sg").cast("double") / col("ng").cast("double"))
              .as("mean_len"),
            Num.r6(col("sg").cast("double") / col("ss").cast("double"))
              .as("len_share"),
            Num.r6(col("tw").cast("double") /
              (col("sg").cast("double") * lit(1e9))).as("theil_within"),
            Num.r6((col("sg").cast("double") / col("ss").cast("double")) *
              log((col("sg").cast("double") / col("ng").cast("double")) /
                (col("ss").cast("double") / col("n").cast("double"))))
              .as("between_term"),
            Num.r6(col("theil_total")).as("theil_total"))
          .orderBy(col("source"))
      },
      Some("""
        WITH grid AS (
          SELECT source, n_chars, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM documents GROUP BY source, n_chars),
        ps AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS ng,
                      CAST(SUM(cnt * n_chars) AS BIGINT) AS sg
               FROM grid GROUP BY source),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS n,
                       CAST(SUM(sg) AS BIGINT) AS ss FROM ps),
        within AS (
          SELECT g.source,
            SUM(CAST(g.cnt * g.n_chars AS HUGEINT) *
                CAST(FLOOR(LN(CAST(g.n_chars AS DOUBLE) * ng / sg)
                           * 1e9 + 0.5) AS BIGINT)) AS tw
          FROM grid g JOIN ps USING (source) GROUP BY g.source),
        gtot AS (
          SELECT SUM(CAST(h.cnt * h.n_chars AS HUGEINT) *
                     CAST(FLOOR(LN(CAST(h.n_chars AS DOUBLE) * t.n / t.ss)
                                * 1e9 + 0.5) AS BIGINT)) AS tt,
                 MAX(t.ss) AS ss
          FROM (SELECT n_chars, SUM(cnt) AS cnt FROM grid GROUP BY n_chars) h
          CROSS JOIN tot t)
        SELECT p.source, p.ng AS n_docs,
          FLOOR((CAST(p.sg AS DOUBLE) / p.ng) * 10000 + 0.500001) / 10000
            AS mean_len,
          FLOOR((CAST(p.sg AS DOUBLE) / t.ss) * 1000000 + 0.500001) / 1000000
            AS len_share,
          FLOOR((CAST(w.tw AS DOUBLE) / (CAST(p.sg AS DOUBLE) * 1e9))
                * 1000000 + 0.500001) / 1000000 AS theil_within,
          FLOOR(((CAST(p.sg AS DOUBLE) / t.ss)
                 * LN((CAST(p.sg AS DOUBLE) / p.ng)
                      / (CAST(t.ss AS DOUBLE) / t.n)))
                * 1000000 + 0.500001) / 1000000 AS between_term,
          FLOOR((CAST(g.tt AS DOUBLE) / (CAST(g.ss AS DOUBLE) * 1e9))
                * 1000000 + 0.500001) / 1000000 AS theil_total
        FROM ps p JOIN within w USING (source)
        CROSS JOIN tot t CROSS JOIN gtot g
        ORDER BY p.source"""),
      "Theil-T inequality of doc lengths decomposed by source: within-source terms + between-source terms vs the direct total, all from one bounded grid"),

    // ---------------------------------------------------------------- q221
    // Dedup savings report: what a curation run actually buys, in
    // TOKENS, per source — the number every training-data budget
    // meeting asks for and the dedup family (q30/q30b/q80/q89)
    // doesn't yet report. Uses q30b's normalized fingerprint (case-
    // fold, strip non-alnum, collapse spaces); the kept copy is the
    // lowest doc_id (q30b's canonical rule), everything after it is
    // savings. 100 TB shape: one corpus pass to (fp, source, toks),
    // one fingerprint-keyed window (key-partitioned, never global),
    // one grouped rollup on source — linear, shuffle on fp then
    // source only.
    Query(
      "q221_dedup_savings",
      (s, d) => {
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), md5(norm).as("fp"),
            size(split(col("text"), " ")).cast("long").as("toks"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dupes"),
            sum(col("toks")).as("tokens_total"),
            sum(when(col("rn") > 1, col("toks")).otherwise(0L))
              .as("tokens_dupe"))
          .select(col("source"), col("n_docs"), col("n_dupes"),
            col("tokens_total"), col("tokens_dupe"),
            Num.r6(col("tokens_dupe").cast("double")
              / col("tokens_total").cast("double")).as("savings_share"))
          .orderBy(col("source"))
      },
      Some("""
        WITH d AS (
          SELECT doc_id, source,
            MD5(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g')) AS fp,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
          FROM documents),
        r AS (
          SELECT source, toks,
            ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
          FROM d)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dupes,
          CAST(SUM(toks) AS BIGINT) AS tokens_total,
          CAST(SUM(CASE WHEN rn > 1 THEN toks ELSE 0 END) AS BIGINT)
            AS tokens_dupe,
          FLOOR((CAST(SUM(CASE WHEN rn > 1 THEN toks ELSE 0 END) AS DOUBLE)
                 / SUM(toks)) * 1000000 + 0.500001) / 1000000
            AS savings_share
        FROM r GROUP BY source ORDER BY source"""),
      "per-source dedup savings in tokens under q30b's normalized fingerprint: duplicate docs, duplicate tokens, and the savings share"),

    // --------------------------------------------------------------- q229
    // Duplication TREND: is duplication getting worse over the crawl?
    // Docs are bucketed into ten doc_id deciles (ingest order), and
    // each decile reports its duplicate share under q30b's normalized
    // fingerprint with keep-first semantics — so a doc counts as a
    // dupe in the decile where it ARRIVED, and a rising curve means
    // the frontier is re-crawling what the corpus already holds (the
    // signal to re-tune the crawler before paying for storage). One
    // fingerprint-keyed window (key-partitioned), one broadcast max-id
    // scalar, one 10-row rollup.
    Query(
      "q229_dup_trend",
      (s, d) => {
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
        Tables.documents(s, d)
          .select(col("doc_id"), md5(norm).as("fp"))
          .withColumn("rn", row_number().over(w))
          .crossJoin(broadcast(mx))
          .select(expr("(doc_id * 10) div (mx + 1)").as("decile"),
            (col("rn") > 1).as("isdup"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("isdup"), 1L).otherwise(0L)).as("n_dupes"))
          .select(col("decile"), col("n_docs"), col("n_dupes"),
            Num.r6(col("n_dupes").cast("double") / col("n_docs"))
              .as("dup_share"))
          .orderBy(col("decile"))
      },
      Some("""
        WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        r AS (
          SELECT doc_id,
            ROW_NUMBER() OVER (
              PARTITION BY MD5(REGEXP_REPLACE(
                REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                ' +', ' ', 'g'))
              ORDER BY doc_id) AS rn
          FROM documents),
        b AS (SELECT (doc_id * 10) // (mx + 1) AS decile, rn > 1 AS isdup
              FROM r CROSS JOIN mx)
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(*) FILTER (WHERE isdup) AS BIGINT) AS n_dupes,
          FLOOR((CAST(COUNT(*) FILTER (WHERE isdup) AS DOUBLE) / COUNT(*))
                * 1000000 + 0.500001) / 1000000 AS dup_share
        FROM b GROUP BY decile ORDER BY decile"""),
      "duplication trend over ingest order: per-doc_id-decile duplicate share under the normalized fingerprint, keep-first semantics"),

    // --------------------------------------------------------------- q233
    // Vocabulary growth curve (the empirical side of Heaps' law): per
    // doc_id decile of ingest order, token occurrences and NEW
    // distinct tokens (a token belongs to the decile where it first
    // appeared = min decile per token), plus both cumulatives — does
    // the corpus keep paying vocabulary for new data, or has the
    // tokenizer seen it all? One token pass, one vocab-sized min-agg,
    // one bounded 10-row rollup with a grid-only cumulative window.
    Query(
      "q233_vocab_growth",
      (s, d) => {
        val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
        val tok = Tables.documents(s, d)
          .crossJoin(broadcast(mx))
          .select(expr("(doc_id * 10) div (mx + 1)").as("decile"),
            explode(split(col("text"), " ")).as("t"))
        val occ = tok.groupBy(col("decile")).agg(count(lit(1)).as("n_tokens"))
        val fresh = tok.groupBy(col("t")).agg(min(col("decile")).as("decile"))
          .groupBy(col("decile")).agg(count(lit(1)).as("new_vocab"))
        val wc = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        occ.join(fresh, Seq("decile"), "left")
          .na.fill(0L, Seq("new_vocab"))
          .localCheckpoint() // 10 rows: the window below is grid-only
          .withColumn("cum_tokens", sum(col("n_tokens")).over(wc))
          .withColumn("cum_vocab", sum(col("new_vocab")).over(wc))
          .localCheckpoint() // grid window materialized off the final plan
          .select(col("decile"), col("n_tokens"), col("new_vocab"),
            col("cum_tokens"), col("cum_vocab"))
          .orderBy(col("decile"))
      },
      Some("""
        WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        tok AS (
          SELECT (doc_id * 10) // (mx + 1) AS decile,
            unnest(string_split(text, ' ')) AS t
          FROM documents CROSS JOIN mx),
        occ AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM tok GROUP BY decile),
        fresh AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_vocab FROM (
            SELECT t, MIN(decile) AS decile FROM tok GROUP BY t)
          GROUP BY decile)
        SELECT o.decile, o.n_tokens, COALESCE(f.new_vocab, 0) AS new_vocab,
          CAST(SUM(o.n_tokens) OVER w AS BIGINT) AS cum_tokens,
          CAST(SUM(COALESCE(f.new_vocab, 0)) OVER w AS BIGINT) AS cum_vocab
        FROM occ o LEFT JOIN fresh f ON f.decile = o.decile
        WINDOW w AS (ORDER BY o.decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o.decile"""),
      "vocabulary growth by ingest decile: token occurrences, first-appearance new vocab, and both cumulatives — the empirical Heaps curve"),

    // --------------------------------------------------------------- q234
    // Heaps' law exponent: fit log V = log k + β·log N by OLS over the
    // ten (cum_tokens, cum_vocab) points of q233 — β ≈ 0.5 for natural
    // text, β → 0 for a saturated (heavily duplicated) corpus. The
    // tokenizer-sizing number. Exactness: ln() is not correctly
    // rounded, so each point's logs are quantized to integer micro
    // with the ulp-absorbing floor cut BEFORE the OLS sums (the q109
    // idf discipline); the 10-point regression is then exact int64 and
    // the final slope/intercept divisions are bit-equal.
    Query(
      "q234_heaps_exponent",
      (s, d) => {
        val mx = Tables.documents(s, d).agg(max(col("doc_id")).as("mx"))
        val tok = Tables.documents(s, d)
          .crossJoin(broadcast(mx))
          .select(expr("(doc_id * 10) div (mx + 1)").as("decile"),
            explode(split(col("text"), " ")).as("t"))
        val occ = tok.groupBy(col("decile")).agg(count(lit(1)).as("n_tokens"))
        val fresh = tok.groupBy(col("t")).agg(min(col("decile")).as("decile"))
          .groupBy(col("decile")).agg(count(lit(1)).as("new_vocab"))
        val wc = Window.orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pts = occ.join(fresh, Seq("decile"), "left")
          .na.fill(0L, Seq("new_vocab"))
          .localCheckpoint() // 10 rows
          .withColumn("cn", sum(col("n_tokens")).over(wc))
          .withColumn("cv", sum(col("new_vocab")).over(wc))
          .localCheckpoint() // grid window materialized off the final plan
          .filter(col("cn") > 0 && col("cv") > 0)
          .select(
            floor(log(col("cn").cast("double")) * 1000000 + lit(0.500001))
              .cast("long").as("xq"),
            floor(log(col("cv").cast("double")) * 1000000 + lit(0.500001))
              .cast("long").as("yq"))
        pts.agg(count(lit(1)).as("k_points"),
            sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
            sum(col("xq") * col("yq")).as("sxy"),
            sum(col("xq") * col("xq")).as("sxx"))
          .select(col("k_points"),
            when(col("k_points") * col("sxx") - col("sx") * col("sx") > 0,
              Num.r6((col("k_points") * col("sxy") - col("sx") * col("sy"))
                .cast("double")
                / (col("k_points") * col("sxx") - col("sx") * col("sx"))
                  .cast("double")))
              .as("heaps_beta"),
            when(col("k_points") * col("sxx") - col("sx") * col("sx") > 0,
              Num.r6((col("sy").cast("double")
                - ((col("k_points") * col("sxy") - col("sx") * col("sy"))
                  .cast("double")
                  / (col("k_points") * col("sxx") - col("sx") * col("sx"))
                    .cast("double")) * col("sx").cast("double"))
                / (col("k_points").cast("double") * lit(1e6))))
              .as("heaps_log_k"))
      },
      Some("""
        WITH mx AS (SELECT MAX(doc_id) AS mx FROM documents),
        tok AS (
          SELECT (doc_id * 10) // (mx + 1) AS decile,
            unnest(string_split(text, ' ')) AS t
          FROM documents CROSS JOIN mx),
        occ AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM tok GROUP BY decile),
        fresh AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS new_vocab FROM (
            SELECT t, MIN(decile) AS decile FROM tok GROUP BY t)
          GROUP BY decile),
        pts AS (
          SELECT
            CAST(FLOOR(LN(CAST(cn AS DOUBLE)) * 1000000 + 0.500001) AS BIGINT)
              AS xq,
            CAST(FLOOR(LN(CAST(cv AS DOUBLE)) * 1000000 + 0.500001) AS BIGINT)
              AS yq
          FROM (
            SELECT
              CAST(SUM(o.n_tokens) OVER w AS BIGINT) AS cn,
              CAST(SUM(COALESCE(f.new_vocab, 0)) OVER w AS BIGINT) AS cv
            FROM occ o LEFT JOIN fresh f ON f.decile = o.decile
            WINDOW w AS (ORDER BY o.decile
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          WHERE cn > 0 AND cv > 0),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k_points,
            CAST(SUM(xq) AS BIGINT) AS sx, CAST(SUM(yq) AS BIGINT) AS sy,
            CAST(SUM(xq * yq) AS BIGINT) AS sxy,
            CAST(SUM(xq * xq) AS BIGINT) AS sxx
          FROM pts)
        SELECT k_points,
          CASE WHEN k_points * sxx - sx * sx > 0 THEN
            FLOOR((CAST(k_points * sxy - sx * sy AS DOUBLE)
                   / CAST(k_points * sxx - sx * sx AS DOUBLE))
                  * 1000000 + 0.500001) / 1000000 END AS heaps_beta,
          CASE WHEN k_points * sxx - sx * sx > 0 THEN
            FLOOR(((CAST(sy AS DOUBLE)
                    - (CAST(k_points * sxy - sx * sy AS DOUBLE)
                       / CAST(k_points * sxx - sx * sx AS DOUBLE))
                      * CAST(sx AS DOUBLE))
                   / (CAST(k_points AS DOUBLE) * 1e6))
                  * 1000000 + 0.500001) / 1000000 END AS heaps_log_k
        FROM m"""),
      "Heaps' law exponent from the ten ingest-decile vocab points: micro-quantized logs (q109 discipline) feed an exact int64 OLS"),

    // ---------------------------------------------------------------- q244
    // Good–Turing frequency-of-frequencies table (Good 1953): the
    // unseen-token mass estimate p₀ = N₁/N and the discounted count
    // r* = (r+1)·N_{r+1}/N_r for r = 1..5 — the open-vocabulary
    // smoothing table every n-gram LM (q163/q240) implicitly needs,
    // and the "how much of the distribution have we even seen"
    // number for corpus sizing. One token pass → vocab-bounded count
    // frame → count-of-counts grid (bounded by max token count);
    // everything integer until the two final divisions. r* is NULL
    // at r=0 (nothing to discount) and where N_r = 0; no smoothing
    // of the N_r sequence is applied (raw Turing estimates), which
    // the r_star=0 rows make visible rather than hiding.
    Query(
      "q244_good_turing",
      (s, d) => {
        val cnt = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("r"))
        val fof = cnt.groupBy(col("r")).agg(count(lit(1)).as("n_r"))
          .localCheckpoint() // bounded count-of-counts grid, one scan
        val tot = cnt.agg(sum(col("r")).as("n_total")) // 1 row
        val spine = s.range(0, 6).select(col("id").as("r"))
        spine
          .join(broadcast(fof), Seq("r"), "left")
          .join(broadcast(fof.select((col("r") - 1).as("r"),
            col("n_r").as("n_next"))), Seq("r"), "left")
          .crossJoin(broadcast(tot))
          .select(col("r"),
            coalesce(col("n_r"), lit(0L)).as("n_r"),
            coalesce(col("n_next"), lit(0L)).as("n_next"),
            when(col("r") > 0 && coalesce(col("n_r"), lit(0L)) > 0,
              Num.r6(((col("r") + 1) * coalesce(col("n_next"), lit(0L)))
                .cast("double") / col("n_r")))
              .as("r_star"),
            Num.r6(when(col("r") === 0,
              coalesce(col("n_next"), lit(0L)).cast("double"))
              .otherwise((col("r") * coalesce(col("n_r"), lit(0L))).cast("double"))
              / col("n_total")).as("mass_share"))
          .orderBy(col("r"))
      },
      Some(s"""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        cnt AS (SELECT t, COUNT(*) AS r FROM tok GROUP BY t),
        fof AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM cnt GROUP BY r),
        tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n_total FROM cnt),
        spine AS (SELECT unnest(range(0, 6)) AS r)
        SELECT s.r AS r,
          CAST(COALESCE(f.n_r, 0) AS BIGINT) AS n_r,
          CAST(COALESCE(g.n_r, 0) AS BIGINT) AS n_next,
          CASE WHEN s.r > 0 AND COALESCE(f.n_r, 0) > 0 THEN
            ${Num.sql("CAST((s.r + 1) * COALESCE(g.n_r, 0) AS DOUBLE) / f.n_r", 6)}
          END AS r_star,
          ${Num.sql(
            """(CASE WHEN s.r = 0 THEN CAST(COALESCE(g.n_r, 0) AS DOUBLE)
                ELSE CAST(s.r * COALESCE(f.n_r, 0) AS DOUBLE) END) / n_total""", 6)}
            AS mass_share
        FROM spine s
        LEFT JOIN fof f ON s.r = f.r
        LEFT JOIN fof g ON g.r = s.r + 1
        CROSS JOIN tot
        ORDER BY r"""),
      "Good-Turing count-of-counts table: unseen mass N1/N and raw Turing discounts r* = (r+1)N_{r+1}/N_r for r=0..5 (Good 1953)"),

    // ---------------------------------------------------------------- q248
    // Distinct-n diversity (Li et al. 2016) per source: distinct
    // n-grams / total n-grams for n = 1..3 — the standard repetition/
    // mode-collapse diagnostic for generated or crawled text (a source
    // full of boilerplate shows low distinct-2/3 even when distinct-1
    // looks healthy). ONE posexplode + lead() window pass (the q38
    // codegen discipline) emits all three gram sizes as a struct
    // array, so the raw-text shuffle happens once; the distinct
    // count shuffles on (source, n, gram) — vocab-bounded.
    Query(
      "q248_distinct_n",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
          .select(col("source"), col("t"),
            lead(col("t"), 1).over(w).as("t1"),
            lead(col("t"), 2).over(w).as("t2"))
        base
          .select(col("source"), explode(array(
            struct(lit(1).as("n"), col("t").as("gram")),
            struct(lit(2).as("n"), when(col("t1").isNotNull,
              concat_ws(" ", col("t"), col("t1"))).as("gram")),
            struct(lit(3).as("n"), when(col("t2").isNotNull,
              concat_ws(" ", col("t"), col("t1"), col("t2"))).as("gram"))))
            .as("e"))
          .select(col("source"), col("e.n").as("n"), col("e.gram").as("gram"))
          .filter(col("gram").isNotNull)
          .groupBy(col("source"), col("n"))
          .agg(count(lit(1)).as("total_ngrams"),
            countDistinct(col("gram")).as("distinct_ngrams"))
          .select(col("source"), col("n"), col("total_ngrams"),
            col("distinct_ngrams"),
            Num.r6(col("distinct_ngrams").cast("double") / col("total_ngrams"))
              .as("distinct_ratio"))
          .orderBy(col("source"), col("n"))
      },
      Some(s"""
        WITH toks AS (
          SELECT source, string_split(text, ' ') AS t FROM documents),
        g AS (
          SELECT source, 1 AS n, unnest(t) AS gram FROM toks
          UNION ALL
          SELECT source, 2 AS n,
            unnest([array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))])
            AS gram
          FROM toks
          UNION ALL
          SELECT source, 3 AS n,
            unnest([array_to_string(t[i:i+2], ' ')
                    FOR i IN range(1, len(t) - 1)]) AS gram
          FROM toks)
        SELECT source, n, CAST(COUNT(*) AS BIGINT) AS total_ngrams,
          CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
          ${Num.sql("CAST(COUNT(DISTINCT gram) AS DOUBLE) / COUNT(*)", 6)}
            AS distinct_ratio
        FROM g GROUP BY source, n ORDER BY source, n"""),
      "distinct-1/2/3 n-gram diversity ratios per source (Li et al. 2016): one window pass emits all gram sizes, vocab-bounded distinct"),

    // ---------------------------------------------------------------- q253
    // Chao1 vocabulary-richness estimate (Chao 1984, bias-corrected
    // form — defined even when no doubletons exist): D + N₁(N₁−1)/
    // (2(N₂+1)), with Good–Turing sample coverage C = 1 − N₁/N —
    // q244's companion question: not "how much mass is unseen" but
    // "how many TYPES are we still missing", the tokenizer/vocab
    // sizing number. Same one-pass count frame; four integers feed
    // two closed-form divisions.
    Query(
      "q253_chao1",
      (s, d) => {
        val cnt = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("r"))
        val m = cnt.agg(sum(col("r")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("r") === 1, 1L).otherwise(0L)).as("n_singletons"),
          sum(when(col("r") === 2, 1L).otherwise(0L)).as("n_doubletons"))
        val chao1 = col("n_distinct") +
          (col("n_singletons") * (col("n_singletons") - 1)).cast("double") /
            (lit(2.0) * (col("n_doubletons") + 1))
        m.select(col("n_tokens"), col("n_distinct"), col("n_singletons"),
          col("n_doubletons"),
          Num.r6(chao1).as("chao1"),
          Num.r6(lit(1.0) - col("n_singletons").cast("double")
            / col("n_tokens")).as("coverage"),
          Num.r6((chao1 - col("n_distinct")) / chao1).as("undetected_share"))
      },
      Some(s"""
        WITH cnt AS (
          SELECT t, COUNT(*) AS r
          FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          GROUP BY t),
        m AS (
          SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
            CAST(COUNT(*) AS BIGINT) AS n_distinct,
            CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_singletons,
            CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_doubletons
          FROM cnt)
        SELECT n_tokens, n_distinct, n_singletons, n_doubletons,
          ${Num.sql(
            """n_distinct + CAST(n_singletons * (n_singletons - 1) AS DOUBLE)
               / (2.0 * (n_doubletons + 1))""", 6)} AS chao1,
          ${Num.sql("1.0 - CAST(n_singletons AS DOUBLE) / n_tokens", 6)}
            AS coverage,
          ${Num.sql(
            """((n_distinct + CAST(n_singletons * (n_singletons - 1) AS DOUBLE)
                / (2.0 * (n_doubletons + 1))) - n_distinct)
               / (n_distinct + CAST(n_singletons * (n_singletons - 1) AS DOUBLE)
                / (2.0 * (n_doubletons + 1)))""", 6)} AS undetected_share
        FROM m"""),
      "Chao1 bias-corrected vocabulary-richness estimate with Good-Turing coverage: how many token types the corpus is still missing (Chao 1984)"),

    // ---------------------------------------------------------------- q254
    // Source-ablation OOV table — leave-one-source-out data valuation
    // on the q199/q240 split (train doc_id%3≠0, held-out %3=0): for
    // each source s, how much WORSE does held-out vocabulary coverage
    // get if s is removed from training? One pass builds the token →
    // (n_sources, lone_source) profile; every held-out token instance
    // whose type lives in exactly ONE training source charges its
    // ablation to that source — so ALL 20 ablations fold from a
    // single groupBy on lone_source, never 20 re-scans. The global
    // OOV base (types unseen in ANY training source) is the shared
    // floor each ablated rate adds to.
    Query(
      "q254_source_ablation",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val trainTok = docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
        val profile = trainTok.groupBy(col("t"))
          .agg(countDistinct(col("source")).as("n_src"),
            max(col("source")).as("lone_src"))
          .localCheckpoint() // vocab-bounded token profile, one scan
        val held = docs.filter(col("doc_id") % 3 === 0)
          .select(explode(split(col("text"), " ")).as("t"))
          .join(broadcast(profile), Seq("t"), "left")
        val totals = held.agg(count(lit(1)).as("n_held_tokens"),
          sum(when(col("n_src").isNull, 1L).otherwise(0L)).as("n_oov_base"))
        val added = held.filter(col("n_src") === 1)
          .groupBy(col("lone_src").as("source"))
          .agg(count(lit(1)).as("n_oov_added"))
        val spine = trainTok.select(col("source")).distinct()
        spine.join(added, Seq("source"), "left")
          .crossJoin(broadcast(totals))
          .select(col("source"), col("n_held_tokens"),
            coalesce(col("n_oov_added"), lit(0L)).as("n_oov_added"),
            Num.r6(col("n_oov_base").cast("double") / col("n_held_tokens"))
              .as("oov_rate_base"),
            Num.r6((col("n_oov_base")
              + coalesce(col("n_oov_added"), lit(0L))).cast("double")
              / col("n_held_tokens")).as("oov_rate_ablated"),
            Num.r6(coalesce(col("n_oov_added"), lit(0L)).cast("double")
              / col("n_held_tokens")).as("oov_lift"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH train_tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS t
          FROM documents WHERE doc_id % 3 <> 0),
        profile AS (
          SELECT t, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_src,
            MAX(source) AS lone_src
          FROM train_tok GROUP BY t),
        held AS (
          SELECT h.t, p.n_src, p.lone_src
          FROM (SELECT unnest(string_split(text, ' ')) AS t
                FROM documents WHERE doc_id % 3 = 0) h
          LEFT JOIN profile p ON p.t = h.t),
        totals AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_held_tokens,
            CAST(SUM(CASE WHEN n_src IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              AS n_oov_base
          FROM held),
        added AS (
          SELECT lone_src AS source, CAST(COUNT(*) AS BIGINT) AS n_oov_added
          FROM held WHERE n_src = 1 GROUP BY lone_src),
        spine AS (SELECT DISTINCT source FROM train_tok)
        SELECT s.source, n_held_tokens,
          CAST(COALESCE(a.n_oov_added, 0) AS BIGINT) AS n_oov_added,
          ${Num.sql("CAST(n_oov_base AS DOUBLE) / n_held_tokens", 6)}
            AS oov_rate_base,
          ${Num.sql(
            """CAST(n_oov_base + COALESCE(a.n_oov_added, 0) AS DOUBLE)
               / n_held_tokens""", 6)} AS oov_rate_ablated,
          ${Num.sql("CAST(COALESCE(a.n_oov_added, 0) AS DOUBLE) / n_held_tokens", 6)}
            AS oov_lift
        FROM spine s LEFT JOIN added a ON a.source = s.source
        CROSS JOIN totals
        ORDER BY s.source"""),
      "leave-one-source-out OOV ablation table: all ablations fold from one token->lone-source profile pass — the data-valuation number per source")
  )
}
