package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for a training-data pipeline: intra-doc
  * repetition scoring (Gopher-style quality signal) and token-window
  * chunking (context-length packing prep). Both are narrow per-row
  * transforms — no shuffle beyond the final presentation sort, linear
  * output, embarrassingly parallel at 100 TB.
  */
object Corpus {

  private def toks = split(col("text"), " ")

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q82
    // Repetition signals (Rae et al., Gopher §A1.1: "fraction of
    // duplicate n-grams"): heavily repetitive docs are low-quality
    // training data. Per doc: duplicate-bigram fraction and the share
    // of the single most frequent token. Pure per-row array math — the
    // whole operator is a narrow projection.
    Query(
      "q82_repetition",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        // EVERYTHING via explode + codegen'd window/aggregate, nothing
        // via per-row HOF lambdas: interpreted lambda eval costs ~10 µs
        // per element and Catalyst re-inlines the array construction
        // into every use (measured 11 s → <1 s at sf0.1). Bigrams come
        // from posexplode + lead() instead of a transform() lambda.
        // This is also the 100 TB shape — explode feeds partial
        // map-side aggregation and works for million-token docs.
        val tokRows = docs.select(col("doc_id"),
          posexplode(toks).as(Seq("pos", "t")))
        val topTok = tokRows
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("n"))
          .groupBy(col("doc_id")).agg(
            sum(col("n")).as("n_tokens"),
            max(col("n")).as("top_token_n"))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = tokRows
          .select(col("doc_id"), col("t"), lead(col("t"), 1).over(w).as("t2"))
          .filter(col("t2").isNotNull)
          .select(col("doc_id"), concat_ws(" ", col("t"), col("t2")).as("b"))
          .groupBy(col("doc_id")).agg(
            count(lit(1)).as("n_bigrams"),
            countDistinct(col("b")).as("n_distinct_bigrams"))
        topTok.join(bg, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
            Num.r4(lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams"))
              .as("dup_bigram_ratio"),
            Num.r4(col("top_token_n") / col("n_tokens")).as("top_token_share"),
            (lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams") > 0.5 ||
              col("top_token_n") / col("n_tokens") > 0.3).as("repetitive"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        b AS (
          SELECT doc_id, tk,
            CASE WHEN LEN(tk) >= 2
              THEN [array_to_string(tk[i:i+1], ' ') FOR i IN range(1, LEN(tk))]
              ELSE [] END AS bg
          FROM t),
        m AS (
          SELECT doc_id, LEN(tk) AS n_tokens, LEN(bg) AS n_bigrams,
            LEN(list_distinct(bg)) AS n_distinct_bigrams,
            list_max([LEN(list_filter(tk, x -> x = u)) FOR u IN list_distinct(tk)]) AS top_token_n
          FROM b)
        SELECT doc_id, n_tokens, n_bigrams,
          FLOOR((1.0 - n_distinct_bigrams / n_bigrams) * 10000 + 0.500001) / 10000 AS dup_bigram_ratio,
          FLOOR((top_token_n / n_tokens) * 10000 + 0.500001) / 10000 AS top_token_share,
          (1.0 - n_distinct_bigrams / n_bigrams > 0.5
            OR top_token_n / n_tokens > 0.3) AS repetitive
        FROM m ORDER BY doc_id"""),
      "Gopher-style repetition quality signals: duplicate-bigram fraction + top-token share, pure narrow projection"),

    // ---------------------------------------------------------------- q83
    // Token-window chunking: fixed 32-token chunks, stride 24 (8-token
    // overlap) — the standard packing prep before tokenization. One
    // explode per doc, chunk count ~ n_tokens/stride; no shuffle until
    // the presentation sort. The trailing chunk may be short (kept:
    // dropping it would lose tail tokens).
    Query(
      "q83_chunk_windows",
      (s, d) => {
        val W = 32; val S = 24
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("tk"))
          .select(col("doc_id"), col("tk"),
            explode(sequence(lit(0),
              greatest(size(col("tk")) - 1, lit(0)), lit(S))).as("start"))
          .select(col("doc_id"), (col("start") / S).cast("long").as("chunk_id"),
            col("start").cast("long").as("token_start"),
            size(slice(col("tk"), col("start") + 1, lit(W))).as("n_tokens"),
            concat_ws(" ", slice(col("tk"), col("start") + 1, lit(W))).as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        st AS (
          SELECT doc_id, tk, UNNEST(range(0, GREATEST(LEN(tk), 1), 24)) AS start
          FROM t)
        SELECT doc_id, start // 24 AS chunk_id,
          CAST(start AS BIGINT) AS token_start,
          CAST(LEN(tk[start+1 : LEAST(start+32, LEN(tk))]) AS INT) AS n_tokens,
          array_to_string(tk[start+1 : LEAST(start+32, LEN(tk))], ' ') AS chunk_text
        FROM st ORDER BY doc_id, chunk_id"""),
      "fixed-window token chunking (32-token windows, stride 24) for context packing"))
}
