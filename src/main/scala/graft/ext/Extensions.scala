package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** North-star LLM-data-pipeline operators (BASELINE.json mandate; not in
  * the reference): deduplication, text analysis, similarity search over
  * the driver's `documents` / `embeddings` tables. Wave 1 holds the
  * oracle-checkable baselines; the scale paths (MinHash-LSH banding,
  * IVF-bucketed ANN) build on these in graft.ext.* as they land.
  */
object Extensions {

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q30
    Query(
      "q30_dedup_exact",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(sha2(col("text"), 256).as("fingerprint"))
          .agg(min(col("doc_id")).as("canonical_id"),
            count(lit(1)).as("n_copies"))
          .select(col("canonical_id"), col("fingerprint"), col("n_copies"))
          .orderBy(col("canonical_id")),
      Some("""
        SELECT MIN(doc_id) AS canonical_id, SHA256(text) AS fingerprint,
          COUNT(*) AS n_copies
        FROM documents
        GROUP BY SHA256(text)
        ORDER BY canonical_id"""),
      "exact content dedup: SHA-256 fingerprint + hash groupBy; at scale a single shuffle on the digest, never on raw text"),

    // -------------------------------------------------------------- q30b
    Query(
      "q30b_dedup_normalized",
      (s, d) => {
        // canonicalization before fingerprinting: case-fold, strip
        // non-alphanumerics, collapse whitespace — catches formatting
        // near-dups that exact hashing misses
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")
        Tables.documents(s, d)
          .groupBy(md5(norm).as("norm_fingerprint"))
          .agg(min(col("doc_id")).as("canonical_id"),
            count(lit(1)).as("n_copies"))
          .select(col("canonical_id"), col("norm_fingerprint"), col("n_copies"))
          .orderBy(col("canonical_id"))
      },
      Some("""
        SELECT MIN(doc_id) AS canonical_id,
          MD5(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
              ' +', ' ', 'g')) AS norm_fingerprint,
          COUNT(*) AS n_copies
        FROM documents
        GROUP BY 2
        ORDER BY canonical_id"""),
      "near-exact dedup after text canonicalization (case-fold, strip punct, collapse spaces)"),

    // ---------------------------------------------------------------- q31
    Query(
      "q31_text_stats",
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d)
          .select(
            col("doc_id"), col("lang"), col("n_chars"),
            size(toks).cast("long").as("n_tokens"),
            size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
            graft.Num.r4((col("n_chars") - size(toks).cast("long") + lit(1L)) /
              size(toks).cast("long")).as("avg_token_len"))
          .orderBy(col("doc_id"))
      },
      Some("""
        SELECT doc_id, lang, n_chars,
          CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
          CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_distinct_tokens,
          FLOOR(((n_chars - CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) + 1)
            / CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT)) * 10000 + 0.500001) / 10000 AS avg_token_len
        FROM documents ORDER BY doc_id"""),
      "token counting + vocabulary stats per document (text-analysis baseline)"),

    // ---------------------------------------------------------------- q32
    Query(
      "q32_quality_score",
      (s, d) => {
        val toks = split(col("text"), " ")
        val nTok = size(toks).cast("double")
        val stops = filter(toks, t => t === "the" || t === "a")
        val stopRatio = size(stops).cast("double") / nTok
        val ttr = size(array_distinct(toks)).cast("double") / nTok
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            graft.Num.r4(stopRatio).as("stop_ratio"),
            graft.Num.r4(ttr).as("type_token_ratio"),
            when(col("n_chars") < 100, "short")
              .when(stopRatio > lit(0.08), "stopword_heavy")
              .otherwise("ok").as("quality_bucket"),
            when(size(stops) > 0, "en").otherwise("other").as("guessed_lang"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, n_chars,
            CAST(LEN(STRING_SPLIT(text, ' ')) AS DOUBLE) AS n_tok,
            CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
              x -> x IN ('the', 'a'))) AS DOUBLE) AS n_stop,
            CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE) AS n_dist
          FROM documents)
        SELECT doc_id,
          FLOOR((n_stop / n_tok) * 10000 + 0.500001) / 10000 AS stop_ratio,
          FLOOR((n_dist / n_tok) * 10000 + 0.500001) / 10000 AS type_token_ratio,
          CASE WHEN n_chars < 100 THEN 'short'
               WHEN n_stop / n_tok > 0.08 THEN 'stopword_heavy'
               ELSE 'ok' END AS quality_bucket,
          CASE WHEN n_stop > 0 THEN 'en' ELSE 'other' END AS guessed_lang
        FROM t ORDER BY doc_id"""),
      "quality scoring + stopword-based language heuristic (text-analysis baseline)"),

    // ---------------------------------------------------------------- q33
    Query(
      "q33_knn_cosine",
      (s, d) => {
        // capCorpus: brute-force ground-truth baseline — capped above
        // the driver SFs; q39/q78 are the uncapped scale paths
        val emb = Similarity.capCorpus(Tables.embeddings(s, d)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v")))
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        // rank on the ROUNDED cosine (tie-break by id) so the ordering
        // is floating-point-stable across engines
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))
        emb.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            graft.Num.r4(Similarity.cosine(col("v"), col("qv"))).as("cosine"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("query_id"), col("rn"), col("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rn"))
      },
      Some("""
        WITH q AS (
          SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 10),
        pairs AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
            FLOOR((LIST_COSINE_SIMILARITY(CAST(e.embedding AS DOUBLE[]),
                                          CAST(q.embedding AS DOUBLE[]))) * 10000 + 0.500001) / 10000 AS cosine
          FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        ranked AS (
          SELECT query_id, neighbor_id, cosine,
            ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
          FROM pairs)
        SELECT query_id, rn, neighbor_id, cosine
        FROM ranked WHERE rn <= 5
        ORDER BY query_id, rn"""),
      "brute-force top-k cosine ANN baseline: probes broadcast, corpus scanned once, per-probe top-k via ranking window"),

    // ---------------------------------------------------------------- q38
    Query(
      "q38_bigram_freq",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = split(col("text"), " ")
        // bigrams via posexplode + lead(), NOT a transform() lambda:
        // interpreted HOF eval costs ~10 µs/element (measured 3 s at
        // sf0.1 on this corpus); the window path is whole-stage codegen
        // end-to-end and doubles as the doc_id skew-spreader the old
        // repartition provided (the window shuffles on doc_id).
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        Tables.documents(s, d)
          .select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
          .select(col("doc_id"), col("t"), lead(col("t"), 1).over(w).as("t2"))
          .filter(col("t2").isNotNull)
          .select(concat_ws(" ", col("t"), col("t2")).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram"))
          .limit(20)
      },
      Some("""
        WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
        bg AS (
          SELECT unnest([array_to_string(t[i:i+1], ' ')
                         FOR i IN range(1, len(t))]) AS bigram
          FROM toks)
        SELECT bigram, COUNT(*) AS n
        FROM bg GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20"""),
      "corpus-wide top-20 bigram frequencies (n-gram text analysis)"),

    // ---------------------------------------------------------------- q410
    // Per-source duplication scorecard: within-source exact-dup share
    // (on q30b's normalized fingerprint) and the share of the
    // source's docs whose normalized text ALSO appears in another
    // source — the per-feed accountability view behind the corpus-
    // wide dedup (q30/q30b) and rep-collapse (q80): which feeds are
    // self-repetitive, and which mirror others. One normalize+hash
    // pass; cross-source presence via the distinct (fingerprint →
    // #sources) frame, all exact integer counts.
    Query(
      "q410_dup_by_source",
      (s, d) => {
        val norm = regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")
        val fp = Tables.documents(s, d)
          .select(col("source"), sha2(trim(norm), 256).as("f"))
          .localCheckpoint() // one normalize+hash pass feeds everything
        val per = fp.groupBy(col("source"), col("f")).agg(count(lit(1)).as("c"))
        val spread = per.groupBy(col("f"))
          .agg(count(lit(1)).as("n_sources"))
        per.join(spread, Seq("f"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_docs"),
            count(lit(1)).as("n_distinct"),
            sum(when(col("n_sources") > 1, col("c")).otherwise(0L))
              .as("n_shared"))
          .select(col("source"), col("n_docs"), col("n_distinct"),
            Num.r4(lit(1.0) - col("n_distinct").cast("double")
              / col("n_docs").cast("double")).as("within_dup_share"),
            Num.r4(col("n_shared").cast("double")
              / col("n_docs").cast("double")).as("cross_source_share"))
          .orderBy(col("source"))
      },
      Some("""
        WITH fp AS (
          SELECT source,
            SHA256(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS f
          FROM documents),
        per AS (
          SELECT source, f, CAST(COUNT(*) AS BIGINT) AS c
          FROM fp GROUP BY source, f),
        spread AS (
          SELECT f, CAST(COUNT(*) AS BIGINT) AS n_sources
          FROM per GROUP BY f)
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
          CAST(COUNT(*) AS BIGINT) AS n_distinct,
          FLOOR((1.0 - CAST(COUNT(*) AS DOUBLE) / SUM(c)) * 10000 + 0.500001)
            / 10000 AS within_dup_share,
          FLOOR((CAST(SUM(CASE WHEN n_sources > 1 THEN c ELSE 0 END)
                 AS DOUBLE) / SUM(c)) * 10000 + 0.500001) / 10000
            AS cross_source_share
        FROM per JOIN spread USING (f)
        GROUP BY source ORDER BY source"""),
      "Per-source duplication scorecard on the normalized fingerprint: within-source dup share and cross-source mirror share, exact counts"))
}
