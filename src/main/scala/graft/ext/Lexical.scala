package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical-drift continuation, batch 41: rank-turbulence divergence
  * between corpus halves, the pairwise source JSD matrix, and a
  * discounted weekly-retention LTV curve. Ranks and retention counts
  * are exact integers; every p·ln term is quantized before bounded
  * sums (the q266 discipline).
  */
object Lexical {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q333
    // Rank-turbulence divergence (α = 1) between the even- and
    // odd-doc_id halves of the corpus: D = Σ_t |1/r₁ − 1/r₂| with
    // absent tokens ranked |union|+1 — which tokens shuffled rank
    // between the two halves, Dodds et al.'s drift lens. The rank
    // windows run over the bounded vocabulary.
    Query(
      "q333_rank_turbulence",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select((col("doc_id") % 2).as("half"),
            explode(split(col("text"), " ")).as("t"))
          .groupBy(col("half"), col("t")).agg(count(lit(1)).as("c"))
        def ranks(h: Int) = tok.filter(col("half") === h)
          .withColumn("r", row_number().over(
            Window.orderBy(col("c").desc, col("t"))).cast("long"))
          .select(col("t"), col("r").as(s"r$h"))
        val joined = ranks(0).join(ranks(1), Seq("t"), "full")
        val nU = joined.agg(count(lit(1)).as("nu"))
        val terms = joined.crossJoin(broadcast(nU))
          .select(col("t"),
            floor(abs(lit(1.0) / coalesce(col("r0"), col("nu") + 1).cast("double") -
              lit(1.0) / coalesce(col("r1"), col("nu") + 1).cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("dq"))
          .localCheckpoint() // bounded vocab terms
        val top = terms.orderBy(col("dq").desc, col("t")).limit(1)
          .select(col("t").as("top_token"), col("dq").as("topq"))
        terms.agg(count(lit(1)).as("n_tokens_union"), sum(col("dq")).as("sd"))
          .crossJoin(broadcast(top))
          .select(col("n_tokens_union"),
            Num.r6(col("sd").cast("double") / lit(1e12)).as("rtd"),
            col("top_token"),
            Num.r6(col("topq").cast("double") / lit(1e12)).as("top_contrib"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id % 2 AS half, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY 1, 2),
        r0 AS (SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT)
                 AS r0 FROM tok WHERE half = 0),
        r1 AS (SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, t) AS BIGINT)
                 AS r1 FROM tok WHERE half = 1),
        joined AS (SELECT COALESCE(r0.t, r1.t) AS t, r0, r1
                   FROM r0 FULL JOIN r1 ON r0.t = r1.t),
        nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM joined),
        terms AS (
          SELECT t, CAST(FLOOR(ABS(
              1.0 / COALESCE(r0, nu + 1) - 1.0 / COALESCE(r1, nu + 1))
              * 1e12 + 0.5) AS BIGINT) AS dq
          FROM joined CROSS JOIN nu),
        top AS (SELECT t AS top_token, dq AS topq FROM terms
                ORDER BY dq DESC, t LIMIT 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens_union,
          FLOOR((CAST(SUM(dq) AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS rtd,
          top_token,
          FLOOR((CAST(topq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS top_contrib
        FROM terms CROSS JOIN top GROUP BY top_token, topq"""),
      "Rank-turbulence divergence (alpha=1) between even/odd corpus halves, absent tokens ranked |union|+1"),

    // ---------------------------------------------------------------- q334
    // Pairwise Jensen–Shannon divergence matrix between sources over
    // the top-100 corpus tokens plus an <other> bucket (so every
    // distribution sums to 1) — the input to source clustering, and
    // the pairwise completion of q266's source-vs-corpus distances.
    // pico-quantized p·ln terms over the bounded pair × token grid.
    Query(
      "q334_jsd_matrix",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val top = counts.groupBy(col("t")).agg(sum(col("c")).as("ct"))
          .orderBy(col("ct").desc, col("t")).limit(100).select(col("t"))
        val bucketed = counts.join(broadcast(top.withColumn("keep", lit(1))),
            Seq("t"), "left")
          .select(col("source"),
            when(col("keep").isNotNull, col("t")).otherwise(lit("<other>")).as("t"),
            col("c"))
          .groupBy(col("source"), col("t")).agg(sum(col("c")).as("c"))
        // densify: a token a source never uses still contributes the
        // OTHER side's p·ln2 mass — a sparse pair join would drop it
        val buckets = bucketed.select(col("t")).distinct()
        val dense = bucketed.select(col("source")).distinct()
          .crossJoin(broadcast(buckets))
          .join(bucketed, Seq("source", "t"), "left")
          .na.fill(0L, Seq("c"))
        val tot = bucketed.groupBy(col("source")).agg(sum(col("c")).as("n"))
        val dist = dense.join(broadcast(tot), Seq("source"))
        val a = dist.select(col("source").as("sa"), col("t"),
          col("c").as("ca"), col("n").as("na"))
        val b = dist.select(col("source").as("sb"), col("t"),
          col("c").as("cb"), col("n").as("nb"))
        val grid = a.join(b, Seq("t")).filter(col("sa") < col("sb"))
        val terms = grid.select(col("sa"), col("sb"),
          floor((
            when(col("ca") > 0,
              (col("ca").cast("double") / col("na").cast("double")) *
                log((col("ca").cast("double") / col("na").cast("double")) /
                  ((col("ca").cast("double") / col("na").cast("double") +
                    col("cb").cast("double") / col("nb").cast("double")) /
                    lit(2.0)))).otherwise(lit(0.0)) +
            when(col("cb") > 0,
              (col("cb").cast("double") / col("nb").cast("double")) *
                log((col("cb").cast("double") / col("nb").cast("double")) /
                  ((col("ca").cast("double") / col("na").cast("double") +
                    col("cb").cast("double") / col("nb").cast("double")) /
                    lit(2.0)))).otherwise(lit(0.0)))
            * lit(1e12) + lit(0.5)).cast("long").as("tq"))
        terms.groupBy(col("sa"), col("sb"))
          .agg(sum(col("tq")).as("st"))
          .select(col("sa"), col("sb"),
            Num.r6(lit(0.5) * col("st").cast("double") / lit(1e12)).as("jsd"))
          .orderBy(col("sa"), col("sb"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        top AS (
          SELECT t FROM (SELECT t, SUM(c) AS ct FROM counts GROUP BY t)
          ORDER BY ct DESC, t LIMIT 100),
        bucketed AS (
          SELECT source,
            CASE WHEN t IN (SELECT t FROM top) THEN t ELSE '<other>' END AS t,
            CAST(SUM(c) AS BIGINT) AS c
          FROM counts GROUP BY 1, 2),
        dense AS (
          SELECT s.source, bt.t, COALESCE(c, 0) AS c
          FROM (SELECT DISTINCT source FROM bucketed) s
          CROSS JOIN (SELECT DISTINCT t FROM bucketed) bt
          LEFT JOIN bucketed ON bucketed.source = s.source
            AND bucketed.t = bt.t),
        tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
                FROM bucketed GROUP BY source),
        dist AS (SELECT source, t, c, n FROM dense JOIN tot USING (source)),
        grid AS (
          SELECT a.source AS sa, b.source AS sb, a.t,
            a.c AS ca, a.n AS na, b.c AS cb, b.n AS nb
          FROM dist a JOIN dist b ON a.t = b.t
          WHERE a.source < b.source),
        terms AS (
          SELECT sa, sb,
            CAST(FLOOR((
              CASE WHEN ca > 0 THEN
                (CAST(ca AS DOUBLE) / na) *
                LN((CAST(ca AS DOUBLE) / na) /
                   ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0))
              ELSE 0.0 END +
              CASE WHEN cb > 0 THEN
                (CAST(cb AS DOUBLE) / nb) *
                LN((CAST(cb AS DOUBLE) / nb) /
                   ((CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb) / 2.0))
              ELSE 0.0 END) * 1e12 + 0.5) AS BIGINT) AS tq
          FROM grid)
        SELECT sa, sb,
          FLOOR((0.5 * CAST(SUM(tq) AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS jsd
        FROM terms GROUP BY sa, sb ORDER BY sa, sb"""),
      "Pairwise JSD matrix between sources over top-100 tokens + <other> bucket (pico-quantized p ln terms)"),

    // ---------------------------------------------------------------- q335
    // Discounted-retention LTV curve: pooled weekly retention at
    // offsets 0–8 from each user's first-activity week, discounted at
    // γ = 0.9 (γ^w as EXP(w·LN 0.9), the q291 discipline); the sum of
    // the discounted column is the expected discounted active-weeks
    // "LTV" a growth model starts from. Exact distinct-user counts.
    Query(
      "q335_ltv_discounted",
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .distinct()
        val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
        val nUsers = first.agg(count(lit(1)).as("nu"))
        val offs = act.join(first, Seq("user_id"))
          .select(col("user_id"), (col("wk") - col("w0")).as("off"))
          .filter(col("off") <= 8)
          .distinct()
          .groupBy(col("off")).agg(count(lit(1)).as("retained"))
        offs.crossJoin(broadcast(nUsers))
          .select(col("off").as("week_offset"), col("retained"),
            Num.r4(col("retained").cast("double") / col("nu").cast("double"))
              .as("retention"),
            Num.r6(col("retained").cast("double") / col("nu").cast("double") *
              exp(col("off").cast("double") * log(lit(0.9))))
              .as("discounted"))
          .orderBy(col("week_offset"))
      },
      Some("""
        WITH act AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
          FROM events),
        first AS (SELECT user_id, MIN(wk) AS w0 FROM act GROUP BY user_id),
        nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu FROM first),
        offs AS (
          SELECT off, CAST(COUNT(*) AS BIGINT) AS retained FROM (
            SELECT DISTINCT act.user_id, wk - w0 AS off
            FROM act JOIN first ON first.user_id = act.user_id
            WHERE wk - w0 <= 8)
          GROUP BY off)
        SELECT off AS week_offset, retained,
          FLOOR((CAST(retained AS DOUBLE) / nu) * 10000 + 0.500001) / 10000
            AS retention,
          FLOOR((CAST(retained AS DOUBLE) / nu * EXP(off * LN(0.9)))
                * 1000000 + 0.500001) / 1000000 AS discounted
        FROM offs CROSS JOIN nu ORDER BY week_offset"""),
      "Discounted weekly-retention LTV curve (offsets 0-8, gamma=0.9 via EXP/LN, exact distinct-user counts)"),

    // ---------------------------------------------------------------- q362
    // Pairwise source VOCABULARY overlap: Szymkiewicz–Simpson overlap
    // coefficient |A∩B|/min(|A|,|B|), Sørensen–Dice and Jaccard — the
    // set-membership companion to q334's distribution-level JSD matrix
    // (a source can reuse another's entire vocabulary yet have maximal
    // JSD; overlap sees through frequency). One distinct (source,
    // token) pass, then a token-keyed equi-join shuffles only the
    // vocab-bounded set; 20 sources → ≤190 output pairs. Zero-
    // intersection pairs are omitted (inner join; the q318 discipline).
    Query(
      "q362_vocab_overlap",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .distinct()
        val sizes = vocab.groupBy(col("source")).agg(count(lit(1)).as("nv"))
        val inter = vocab.select(col("source").as("sa"), col("t"))
          .join(vocab.select(col("source").as("sb"), col("t")), Seq("t"))
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("n_common"))
        inter
          .join(broadcast(sizes.select(col("source").as("sa"), col("nv").as("na"))), Seq("sa"))
          .join(broadcast(sizes.select(col("source").as("sb"), col("nv").as("nb"))), Seq("sb"))
          .select(col("sa"), col("sb"), col("na"), col("nb"), col("n_common"),
            Num.r4(col("n_common").cast("double") /
              least(col("na"), col("nb")).cast("double")).as("overlap_coef"),
            Num.r4(lit(2.0) * col("n_common").cast("double") /
              (col("na") + col("nb")).cast("double")).as("dice"),
            Num.r4(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")).cast("double"))
              .as("jaccard"))
          .orderBy(col("sa"), col("sb"))
      },
      Some(s"""
        WITH vocab AS (
          SELECT DISTINCT source, UNNEST(STRING_SPLIT(text, ' ')) AS t
          FROM documents),
        sizes AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS nv
          FROM vocab GROUP BY source),
        inter AS (
          SELECT a.source AS sa, b.source AS sb,
            CAST(COUNT(*) AS BIGINT) AS n_common
          FROM vocab a JOIN vocab b ON a.t = b.t AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT sa, sb, na.nv AS na, nb.nv AS nb, n_common,
          ${Num.sql("CAST(n_common AS DOUBLE) / LEAST(na.nv, nb.nv)", 4)}
            AS overlap_coef,
          ${Num.sql("2.0 * CAST(n_common AS DOUBLE) / (na.nv + nb.nv)", 4)}
            AS dice,
          ${Num.sql("CAST(n_common AS DOUBLE) / (na.nv + nb.nv - n_common)", 4)}
            AS jaccard
        FROM inter
        JOIN sizes na ON na.source = inter.sa
        JOIN sizes nb ON nb.source = inter.sb
        ORDER BY sa, sb"""),
      "Pairwise source vocabulary overlap coefficient / Dice / Jaccard over distinct token sets (vocab-bounded token join, zero-overlap pairs omitted)"),

    // ---------------------------------------------------------------- q404
    // Gries' DP (deviation of proportions, Gries 2008) for the top-20
    // corpus tokens: how evenly is each token SPREAD across sources,
    // relative to the sources' sizes? DP = Σ_i |v_i − s_i| / 2 over
    // the DENSIFIED source grid (an absent source contributes its
    // full size share — dropping zero cells understates dispersion,
    // q334's lesson). DP→0 = perfectly proportional, DP→1 = confined
    // to one tiny source; the dispersion axis the frequency-only
    // views (q373 sampling table, q282 Yule) cannot see. Each |v−s|
    // clears to the exact integer |c_is·C − n_i·c_t| over the common
    // denominator c_t·C, so DP is a ratio of exact integer sums.
    Query(
      "q404_token_dispersion",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
        val bySrc = tok.groupBy(col("source"), col("t")).agg(count(lit(1)).as("cis"))
          .localCheckpoint() // one token pass feeds every aggregate below
        val srcTot = bySrc.groupBy(col("source")).agg(sum(col("cis")).as("ni"))
        val top = bySrc.groupBy(col("t")).agg(sum(col("cis")).as("ct"))
          .orderBy(col("ct").desc, col("t")).limit(20)
          .localCheckpoint()
        val corpus = srcTot.agg(sum(col("ni")).as("cc"))
        val grid = top.crossJoin(srcTot).crossJoin(broadcast(corpus))
          .join(bySrc, Seq("source", "t"), "left")
          .select(col("t"), col("ct"), col("cc"),
            abs(coalesce(col("cis"), lit(0L)).cast("decimal(38,0)") * col("cc")
              - col("ni").cast("decimal(38,0)") * col("ct")).as("num"))
        grid.groupBy(col("t"), col("ct"), col("cc"))
          .agg(sum(col("num")).as("snum"))
          .select(col("t").as("token"), col("ct").as("cnt"),
            Num.r4(col("snum").cast("double")
              / (lit(2.0) * col("ct").cast("double") * col("cc").cast("double")))
              .as("dp"))
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""
        WITH tok AS (
          SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
        by_src AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS cis
          FROM tok GROUP BY source, t),
        src_tot AS (SELECT source, CAST(SUM(cis) AS BIGINT) AS ni
                    FROM by_src GROUP BY source),
        top AS (
          SELECT t, CAST(SUM(cis) AS BIGINT) AS ct FROM by_src
          GROUP BY t ORDER BY ct DESC, t LIMIT 20),
        corpus AS (SELECT CAST(SUM(ni) AS BIGINT) AS cc FROM src_tot),
        grid AS (
          SELECT top.t, top.ct, cc,
            ABS(CAST(COALESCE(b.cis, 0) AS HUGEINT) * cc
                - CAST(s.ni AS HUGEINT) * top.ct) AS num
          FROM top CROSS JOIN src_tot s CROSS JOIN corpus
          LEFT JOIN by_src b ON b.source = s.source AND b.t = top.t)
        SELECT t AS token, ct AS cnt,
          FLOOR((CAST(SUM(num) AS DOUBLE) / (2.0 * ct * CAST(cc AS DOUBLE)))
                * 10000 + 0.500001) / 10000 AS dp
        FROM grid GROUP BY t, ct, cc
        ORDER BY cnt DESC, token"""),
      "Gries DP dispersion of the top-20 tokens across sources: densified grid, exact integer |v-s| numerators over a common denominator"),

    // ---------------------------------------------------------------- q405
    // Dunning log-likelihood (G²) keyness: each source's top-3
    // keywords — the tokens most OVER-represented vs the rest of the
    // corpus by the 2×2 G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)) test
    // (Dunning 1993), the corpus-linguistics standard that PMI (q102)
    // approximates badly at low counts. Positive keyness only
    // (a/n₁ > b/n₂); x·ln(x/E) terms are nano-quantized per side
    // before the 2-term sum, the b = 0 side contributes 0 exactly on
    // both engines; ranking is per-source (G² desc, token asc) over
    // the vocab-bounded keyness frame.
    Query(
      "q405_keyness_g2",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
        val bySrc = tok.groupBy(col("source"), col("t")).agg(count(lit(1)).as("a"))
          .localCheckpoint()
        val srcTot = bySrc.groupBy(col("source")).agg(sum(col("a")).as("n1"))
        val tokTot = bySrc.groupBy(col("t")).agg(sum(col("a")).as("ab"))
        val corpus = srcTot.agg(sum(col("n1")).as("nn"))
        def term(x: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
          when(x === 0, lit(0L))
            .otherwise(floor(x.cast("double")
              * log(x.cast("double") / e) * lit(1e9) + lit(0.5)).cast("long"))
        val scored = bySrc
          .join(broadcast(srcTot), Seq("source"))
          .join(tokTot, Seq("t"))
          .crossJoin(broadcast(corpus))
          .withColumn("b", col("ab") - col("a"))
          .withColumn("n2", col("nn") - col("n1"))
          // positive keyness: a/n1 > b/n2 ⇔ a·n2 > b·n1 (exact)
          .filter(col("a").cast("decimal(38,0)") * col("n2")
            > col("b").cast("decimal(38,0)") * col("n1"))
          .withColumn("g2q",
            term(col("a"), col("n1").cast("double") * col("ab").cast("double")
              / col("nn").cast("double"))
              + term(col("b"), col("n2").cast("double") * col("ab").cast("double")
                / col("nn").cast("double")))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("g2q").desc, col("t"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("source"), col("rank"), col("t").as("keyword"),
            col("a").as("cnt_in"), col("b").as("cnt_out"),
            Num.r4(lit(2.0) * col("g2q").cast("double") / lit(1e9)).as("g2"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""
        WITH tok AS (
          SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents),
        by_src AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS a
          FROM tok GROUP BY source, t),
        src_tot AS (SELECT source, CAST(SUM(a) AS BIGINT) AS n1
                    FROM by_src GROUP BY source),
        tok_tot AS (SELECT t, CAST(SUM(a) AS BIGINT) AS ab
                    FROM by_src GROUP BY t),
        corpus AS (SELECT CAST(SUM(n1) AS BIGINT) AS nn FROM src_tot),
        scored AS (
          SELECT source, t, a, ab - a AS b, n1, nn - n1 AS n2,
            (CASE WHEN a = 0 THEN 0
              ELSE CAST(FLOOR(a * LN(CAST(a AS DOUBLE)
                / (CAST(n1 AS DOUBLE) * ab / nn)) * 1e9 + 0.5) AS BIGINT) END)
            + (CASE WHEN ab - a = 0 THEN 0
              ELSE CAST(FLOOR((ab - a) * LN(CAST(ab - a AS DOUBLE)
                / (CAST(nn - n1 AS DOUBLE) * ab / nn)) * 1e9 + 0.5) AS BIGINT)
              END) AS g2q
          FROM by_src JOIN src_tot USING (source)
          JOIN tok_tot USING (t) CROSS JOIN corpus
          WHERE CAST(a AS HUGEINT) * (nn - n1) > CAST(ab - a AS HUGEINT) * n1),
        ranked AS (
          SELECT source, t, a, b, g2q,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY g2q DESC, t) AS rank
          FROM scored)
        SELECT source, rank, t AS keyword, a AS cnt_in, b AS cnt_out,
          FLOOR((2.0 * g2q / 1e9) * 10000 + 0.500001) / 10000 AS g2
        FROM ranked WHERE rank <= 3
        ORDER BY source, rank"""),
      "Dunning G2 keyness: top-3 over-represented keywords per source, nano-quantized x*ln(x/E) terms, exact positive-keyness filter")
  )
}
