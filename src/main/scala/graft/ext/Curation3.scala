package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Curation continuation, batch 47: temperature-scaled source sampling
  * — the multilingual/multi-source rebalancing step (p_s^α re-weighting,
  * Conneau & Lample's exponent trick) that sits between q98's raw mix
  * weights and q200's DoReMi step in a training-data pipeline.
  */
object Curation3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q360
    // Temperature-scaled sampling weights per source: w_s(α) ∝ p_s^α
    // for α ∈ {0.3, 0.7} (α→0 flattens toward uniform, α=1 keeps the
    // natural mix), plus the implied up/down-sampling factor w/p. Each
    // p^α = EXP(α·LN p) is quantized to an exact pico-integer BEFORE
    // the normalizing sum (the q334 discipline — a double Σ over
    // sources would be association-order-sensitive), so the normalizer
    // is an exact int64 and every ratio is bit-identical cross-engine.
    // One groupBy + one broadcast total: corpus-linear, vocab-free.
    Query(
      "q360_temperature_mix",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val tot = bySrc.agg(sum(col("n_docs")).as("nd"))
        val p = bySrc.crossJoin(broadcast(tot))
          .withColumn("p", col("n_docs").cast("double") / col("nd").cast("double"))
        def es(alpha: Double) =
          floor(exp(lit(alpha) * log(col("p"))) * lit(1e12) + lit(0.5)).cast("long")
        val q = p.withColumn("e3", es(0.3)).withColumn("e7", es(0.7))
        val norms = q.agg(sum(col("e3")).as("t3"), sum(col("e7")).as("t7"))
        q.crossJoin(broadcast(norms))
          .select(col("source"), col("n_docs"), Num.r4(col("p")).as("share"),
            Num.r6(col("e3").cast("double") / col("t3").cast("double")).as("w03"),
            Num.r6(col("e3").cast("double") / col("t3").cast("double") / col("p"))
              .as("up03"),
            Num.r6(col("e7").cast("double") / col("t7").cast("double")).as("w07"),
            Num.r6(col("e7").cast("double") / col("t7").cast("double") / col("p"))
              .as("up07"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH bySrc AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nd FROM bySrc),
        p AS (
          SELECT source, n_docs, CAST(n_docs AS DOUBLE) / nd AS p,
            CAST(FLOOR(EXP(0.3 * LN(CAST(n_docs AS DOUBLE) / nd)) * 1e12 + 0.5)
              AS BIGINT) AS e3,
            CAST(FLOOR(EXP(0.7 * LN(CAST(n_docs AS DOUBLE) / nd)) * 1e12 + 0.5)
              AS BIGINT) AS e7
          FROM bySrc CROSS JOIN tot),
        norms AS (SELECT CAST(SUM(e3) AS BIGINT) AS t3,
                    CAST(SUM(e7) AS BIGINT) AS t7 FROM p)
        SELECT source, n_docs,
          ${Num.sql("p", 4)} AS share,
          ${Num.sql("CAST(e3 AS DOUBLE) / t3", 6)} AS w03,
          ${Num.sql("CAST(e3 AS DOUBLE) / t3 / p", 6)} AS up03,
          ${Num.sql("CAST(e7 AS DOUBLE) / t7", 6)} AS w07,
          ${Num.sql("CAST(e7 AS DOUBLE) / t7 / p", 6)} AS up07
        FROM p CROSS JOIN norms ORDER BY source"""),
      "Temperature-scaled source sampling weights (alpha 0.3/0.7, pico-quantized p^alpha so normalizers are exact integers) with up-sampling factors"),

    // ---------------------------------------------------------------- q373
    // word2vec-style negative-sampling table: p_neg(t) ∝ count(t)^0.75
    // (Mikolov's unigram smoothing — the token-level twin of q360's
    // source-level temperature trick). Smoothed masses are micro-
    // quantized integers before the vocab-wide normalizer, so every
    // probability is a ratio of exact int64s; reports the 20 most
    // frequent tokens with their raw vs smoothed sampling probability
    // and the boost a rare-vs-common token gets. Vocab-bounded
    // aggregation; one token pass.
    Query(
      "q373_negative_sampling",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("c"))
          .withColumn("sm",
            floor(exp(lit(0.75) * log(col("c").cast("double"))) * lit(1e6)
              + lit(0.5)).cast("long"))
        val tot = counts.agg(sum(col("c")).as("tc"), sum(col("sm")).as("tz"),
          count(lit(1)).as("nv"))
        counts.crossJoin(broadcast(tot))
          .orderBy(col("c").desc, col("t")).limit(20)
          .select(col("t").as("token"), col("c").as("cnt"), col("nv").as("n_vocab"),
            Num.r6(col("c").cast("double") / col("tc").cast("double"))
              .as("p_unigram"),
            Num.r6(col("sm").cast("double") / col("tz").cast("double"))
              .as("p_neg"),
            Num.r4((col("sm").cast("double") / col("tz").cast("double")) /
              (col("c").cast("double") / col("tc").cast("double")))
              .as("boost"))
          .orderBy(col("cnt").desc, col("token"))
      },
      Some("""
        WITH counts AS (
          SELECT t, CAST(COUNT(*) AS BIGINT) AS c,
            CAST(FLOOR(EXP(0.75 * LN(CAST(COUNT(*) AS DOUBLE))) * 1e6 + 0.5)
              AS BIGINT) AS sm
          FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
          GROUP BY t),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tc,
                  CAST(SUM(sm) AS BIGINT) AS tz,
                  CAST(COUNT(*) AS BIGINT) AS nv FROM counts)
        SELECT t AS token, c AS cnt, nv AS n_vocab,
          FLOOR((CAST(c AS DOUBLE) / tc) * 1000000 + 0.500001) / 1000000
            AS p_unigram,
          FLOOR((CAST(sm AS DOUBLE) / tz) * 1000000 + 0.500001) / 1000000
            AS p_neg,
          FLOOR(((CAST(sm AS DOUBLE) / tz) / (CAST(c AS DOUBLE) / tc))
                * 10000 + 0.500001) / 10000 AS boost
        FROM counts CROSS JOIN tot
        ORDER BY cnt DESC, token LIMIT 20"""),
      "word2vec negative-sampling table: count^0.75 micro-quantized masses over the vocab, exact normalizers, top-20 tokens with raw vs smoothed probabilities"),

    // ---------------------------------------------------------------- q375
    // Skyline (Pareto front) of the curation trade-off length × lexical
    // diversity: the docs no other doc strictly dominates on
    // (n_chars ↑, distinct-token ratio ↑) — the multi-objective
    // SELECTION operator (Börzsönyi's SKYLINE) the relational surface
    // lacked. Works on DISTINCT metric cells: within a length only the
    // max-TTR cell can survive (same len + higher ttr dominates), then
    // the classic staircase sweep keeps a cell iff its TTR strictly
    // exceeds the running max over all LONGER cells — one window over
    // the bounded distinct-length staircase, no pair join. TTR is
    // micro-quantized (exact), cells carry their doc counts, output
    // capped at the 50 longest front cells (documented).
    Query(
      "q375_skyline",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val m = Tables.documents(s, d)
          .select(col("n_chars").as("len"),
            expr("""cast(floor(cast(size(array_distinct(split(text, ' '))) as double)
              / size(split(text, ' ')) * 1e6 + 0.5) as bigint)""").as("ttr"))
        val cells = m.groupBy(col("len"), col("ttr")).agg(count(lit(1)).as("n_docs"))
        val perLen = cells
          .withColumn("mx", max(col("ttr")).over(Window.partitionBy(col("len"))))
          .filter(col("ttr") === col("mx"))
        val w = Window.orderBy(col("len").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        perLen
          .withColumn("runmax", max(col("ttr")).over(w))
          .filter(col("runmax").isNull || col("ttr") > col("runmax"))
          .select(col("len"), col("ttr"), col("n_docs"))
          .orderBy(col("len").desc).limit(50)
          .orderBy(col("len"))
      },
      Some("""
        WITH m AS (
          SELECT n_chars AS len,
            CAST(FLOOR(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
              / LEN(STRING_SPLIT(text, ' ')) * 1e6 + 0.5) AS BIGINT) AS ttr
          FROM documents),
        cells AS (
          SELECT len, ttr, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM m GROUP BY len, ttr),
        perLen AS (
          SELECT len, ttr, n_docs FROM (
            SELECT len, ttr, n_docs,
              MAX(ttr) OVER (PARTITION BY len) AS mx
            FROM cells)
          WHERE ttr = mx),
        sky AS (
          SELECT len, ttr, n_docs FROM (
            SELECT len, ttr, n_docs,
              MAX(ttr) OVER (ORDER BY len DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
            FROM perLen)
          WHERE runmax IS NULL OR ttr > runmax)
        SELECT len, ttr, n_docs FROM
          (SELECT * FROM sky ORDER BY len DESC LIMIT 50)
        ORDER BY len"""),
      "Skyline (Pareto front) of docs on length x distinct-token ratio: staircase sweep over distinct metric cells, no pair join, 50 longest front cells")
  )
}
