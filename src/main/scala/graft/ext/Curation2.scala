package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-diagnostics continuation, batch 37: duplicate-cluster
  * power law, leave-one-source-out influence, bigram coverage curve,
  * and token positional bias. Exact counts and DECIMAL sums; the
  * power-law MLE and LOO shifts are scalar algebra on exact moments.
  */
object Curation2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q320
    // Power-law fit of duplicate-cluster sizes: group by the q30b
    // normalized fingerprint, histogram the cluster sizes, and fit
    // the discrete-MLE tail index α̂ = 1 + n/Σ ln(s/(smin−½)) over
    // clusters of size ≥ 2 — "how heavy is my duplication tail", the
    // number that decides whether rep-collapse (q80) is worth a pass.
    Query(
      "q320_cluster_size_powerlaw",
      (s, d) => {
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
        val sizes = Tables.documents(s, d)
          .groupBy(md5(norm).as("fp")).agg(count(lit(1)).as("sz"))
        val hist = sizes.groupBy(col("sz")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded size histogram
        val dups = hist.filter(col("sz") >= 2)
          .agg(sum(col("c")).as("n_dup_clusters"),
            sum(col("c").cast("decimal(38,0)") *
              floor(log(col("sz").cast("double") / lit(1.5)) * lit(1e9) + lit(0.5))
                .cast("long")).as("sl"))
        val tot = hist.agg(sum(col("c")).as("n_clusters"),
          sum(col("sz") * col("c")).as("n_docs"))
        tot.crossJoin(broadcast(dups))
          .select(col("n_docs"), col("n_clusters"), col("n_dup_clusters"),
            Num.r4(lit(1.0) + col("n_dup_clusters").cast("double") /
              (col("sl").cast("double") / lit(1e9))).as("powerlaw_alpha"),
            Num.r6((col("n_docs") - col("n_clusters")).cast("double") /
              col("n_docs").cast("double")).as("dup_mass"))
      },
      Some("""
        WITH sizes AS (
          SELECT md5(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS fp,
            CAST(COUNT(*) AS BIGINT) AS sz
          FROM documents GROUP BY 1),
        hist AS (SELECT sz, CAST(COUNT(*) AS BIGINT) AS c
                 FROM sizes GROUP BY sz),
        dups AS (
          SELECT CAST(SUM(c) AS BIGINT) AS n_dup_clusters,
            SUM(CAST(c AS HUGEINT) *
                CAST(FLOOR(LN(CAST(sz AS DOUBLE) / 1.5) * 1e9 + 0.5)
                  AS BIGINT)) AS sl
          FROM hist WHERE sz >= 2),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_clusters,
                  CAST(SUM(sz * c) AS BIGINT) AS n_docs FROM hist)
        SELECT n_docs, n_clusters, n_dup_clusters,
          FLOOR((1.0 + CAST(n_dup_clusters AS DOUBLE) /
                 (CAST(sl AS DOUBLE) / 1e9)) * 10000 + 0.500001) / 10000
            AS powerlaw_alpha,
          FLOOR((CAST(n_docs - n_clusters AS DOUBLE) / n_docs)
                * 1000000 + 0.500001) / 1000000 AS dup_mass
        FROM tot CROSS JOIN dups"""),
      "Discrete power-law MLE on q30b-normalized duplicate-cluster sizes (>=2) plus duplicated-mass share"),

    // ---------------------------------------------------------------- q321
    // Leave-one-source-out influence on the corpus mean document
    // length: dropping source g shifts the mean by n_g(x̄ − x̄_g)/(N −
    // n_g) — the cheapest data-valuation number, exact from one
    // grouped moment pass (no N re-aggregations).
    Query(
      "q321_loo_influence",
      (s, d) => {
        val g = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sv"))
          .localCheckpoint()
        val tot = g.agg(sum(col("n")).as("nt"), sum(col("sv")).as("svt"))
        g.crossJoin(broadcast(tot))
          .select(col("source"), col("n").as("n_docs"),
            Num.r4(col("sv").cast("double") / col("n").cast("double"))
              .as("mean_len"),
            // LOO mean − full mean
            Num.r4((col("svt") - col("sv")).cast("double") /
              (col("nt") - col("n")).cast("double") -
              col("svt").cast("double") / col("nt").cast("double"))
              .as("loo_shift"))
          .orderBy(col("source"))
      },
      Some("""
        WITH g AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(n_chars) AS BIGINT) AS sv
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                  CAST(SUM(sv) AS BIGINT) AS svt FROM g)
        SELECT source, n AS n_docs,
          FLOOR((CAST(sv AS DOUBLE) / n) * 10000 + 0.500001) / 10000
            AS mean_len,
          FLOOR((CAST(svt - sv AS DOUBLE) / (nt - n)
                 - CAST(svt AS DOUBLE) / nt) * 10000 + 0.500001) / 10000
            AS loo_shift
        FROM g CROSS JOIN tot ORDER BY source"""),
      "Leave-one-source-out influence on the corpus mean length (exact grouped moments, no re-aggregation)"),

    // ---------------------------------------------------------------- q322
    // Bigram coverage curve: what share of bigram OCCURRENCES do the
    // top-N distinct bigrams cover, N ∈ {10, 50, 100, 500, 1000}? The
    // LM-data sizing companion to q123's unigram curve — one bigram
    // pass, a bounded top-1000 rank window, exact occurrence shares.
    Query(
      "q322_bigram_coverage",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
        val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val big = toks.withColumn("w2", lead(col("w"), 1).over(wD))
          .filter(col("w2").isNotNull)
          .groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c"))
        val tot = big.agg(sum(col("c")).as("total"),
          count(lit(1)).as("n_distinct"))
        val top = big.orderBy(col("c").desc, col("w"), col("w2")).limit(1000)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("c").desc, col("w"), col("w2"))).cast("long"))
        val wR = Window.orderBy(col("rk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = top.withColumn("cumc", sum(col("c")).over(wR))
        cum.crossJoin(broadcast(tot))
          .select(explode(array(Seq(10, 50, 100, 500, 1000).map(lit): _*)).as("topn"),
            col("rk"), col("cumc"), col("total"), col("n_distinct"))
          .filter(col("rk") === least(col("topn").cast("long"), col("n_distinct")))
          .select(col("topn").cast("long").as("top_n"), col("n_distinct"),
            Num.r6(col("cumc").cast("double") / col("total").cast("double"))
              .as("coverage"))
          .orderBy(col("top_n"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
            UNNEST(string_split(text, ' ')) AS w,
            UNNEST(GENERATE_SERIES(1, LEN(string_split(text, ' ')))) AS pos
          FROM documents),
        big AS (
          SELECT w, w2, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks)
          WHERE w2 IS NOT NULL GROUP BY w, w2),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                  CAST(COUNT(*) AS BIGINT) AS n_distinct FROM big),
        top AS (
          SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w, w2) AS BIGINT)
            AS rk
          FROM big ORDER BY c DESC, w, w2 LIMIT 1000),
        cum AS (
          SELECT rk, SUM(c) OVER (ORDER BY rk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
          FROM top),
        ks AS (SELECT UNNEST([10, 50, 100, 500, 1000]) AS topn)
        SELECT CAST(topn AS BIGINT) AS top_n, n_distinct,
          FLOOR((CAST(cumc AS DOUBLE) / total) * 1000000 + 0.500001) / 1000000
            AS coverage
        FROM cum CROSS JOIN tot CROSS JOIN ks
        WHERE rk = LEAST(CAST(topn AS BIGINT), n_distinct)
        ORDER BY top_n"""),
      "Bigram occurrence-coverage at top-N in {10,50,100,500,1000} (one bigram pass, bounded rank window)"),

    // ---------------------------------------------------------------- q323
    // Positional bias of the top-20 tokens: mean relative position
    // (0 = doc start, 1 = doc end) and the deviation from the 0.5 a
    // position-neutral token would show — boilerplate headers/footers
    // light up here. Relative positions are exact rationals
    // micro-quantized per occurrence before the DECIMAL mean.
    Query(
      "q323_positional_bias",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
        val len = toks.groupBy(col("doc_id")).agg(max(col("pos")).as("mx"))
        val rel = toks.join(len, Seq("doc_id"))
          .filter(col("mx") > 0)
          .select(col("w"),
            floor(col("pos").cast("double") / col("mx").cast("double")
              * lit(1e6) + lit(0.5)).cast("long").as("rq"))
        rel.groupBy(col("w"))
          .agg(count(lit(1)).as("n_occ"),
            sum(col("rq").cast("decimal(38,0)")).as("sr"))
          .orderBy(col("n_occ").desc, col("w")).limit(20)
          .select(col("w").as("token"), col("n_occ"),
            Num.r4(col("sr").cast("double") / lit(1e6) /
              col("n_occ").cast("double")).as("mean_rel_pos"),
            Num.r4(col("sr").cast("double") / lit(1e6) /
              col("n_occ").cast("double") - lit(0.5)).as("position_bias"))
          .orderBy(col("n_occ").desc, col("token"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
            UNNEST(string_split(text, ' ')) AS w,
            UNNEST(GENERATE_SERIES(1, LEN(string_split(text, ' ')))) AS pos
          FROM documents),
        len AS (SELECT doc_id, CAST(MAX(pos) AS BIGINT) AS mx
                FROM toks GROUP BY doc_id),
        rel AS (
          -- generate_series is 1-based; shift to the 0-based relative
          -- position Spark's posexplode produces
          SELECT w, CAST(FLOOR(CAST(pos - 1 AS DOUBLE) / (mx - 1)
            * 1e6 + 0.5) AS BIGINT) AS rq
          FROM toks JOIN len USING (doc_id) WHERE mx > 1),
        top AS (
          SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS n_occ,
            SUM(CAST(rq AS HUGEINT)) AS sr
          FROM rel GROUP BY w ORDER BY n_occ DESC, w LIMIT 20)
        SELECT token, n_occ,
          FLOOR((CAST(sr AS DOUBLE) / 1e6 / n_occ) * 10000 + 0.500001) / 10000
            AS mean_rel_pos,
          FLOOR((CAST(sr AS DOUBLE) / 1e6 / n_occ - 0.5) * 10000 + 0.500001)
            / 10000 AS position_bias
        FROM top ORDER BY n_occ DESC, token"""),
      "Positional bias of the top-20 tokens: micro-quantized mean relative position vs the neutral 0.5")
  )
}
