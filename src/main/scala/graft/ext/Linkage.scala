package graft.ext

import graft.{Query, Tables}
import org.apache.spark.sql.functions._

/** Entity-resolution / record-linkage operators: multi-key blocking +
  * exact edit-distance verification — the fuzzy-matching pass a
  * curation pipeline runs to merge near-identical catalog entries
  * (product names, author strings, place names) before joins treat
  * them as distinct keys. */
object Linkage {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q148
    // Fuzzy name linkage over the part catalog: dedupe to DISTINCT
    // names first (the ER convention — match on the name universe,
    // carry the row counts), generate candidates by MULTI-KEY BLOCKING
    // (a pair is a candidate when the names share their first OR last
    // token — two cheap equi-joins, unioned and deduped), prune with
    // the |len_a - len_b| <= threshold lower bound (levenshtein can
    // never beat the length gap), and verify candidates with exact
    // levenshtein <= 4. The scale story is the blocking: candidate
    // count is sum of block sizes squared, not corpus squared, and a
    // skewed blocking key (a token shared by half the names) would be
    // df-capped exactly like q96's rare-anchor rule — at this catalog
    // every block is tiny. Both engines implement classic unit-cost
    // Levenshtein, so the verify step is oracle-exact.
    Query(
      "q148_fuzzy_linkage",
      (s, d) => {
        val names = Tables.part(s, d)
          .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
          .select(col("p_name").as("name"), col("n_parts"),
            length(col("p_name")).as("len"),
            element_at(split(col("p_name"), " "), 1).as("tok_first"),
            element_at(split(col("p_name"), " "), -1).as("tok_last"))
        def block(key: String) = names.as("a").join(names.as("b"),
            col(s"a.$key") === col(s"b.$key") &&
              col("a.name") < col("b.name") &&
              abs(col("a.len") - col("b.len")) <= 4)
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
            col("a.n_parts").as("n_a"), col("b.n_parts").as("n_b"))
        block("tok_first").union(block("tok_last")).distinct()
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 4)
          .orderBy(col("name_a"), col("name_b"))
          .select(col("name_a"), col("name_b"), col("dist"),
            col("n_a"), col("n_b"))
      },
      Some("""
        WITH names AS (
          SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
            LENGTH(p_name) AS len,
            string_split(p_name, ' ')[1] AS tok_first,
            string_split(p_name, ' ')[-1] AS tok_last
          FROM part GROUP BY p_name),
        cand AS (
          SELECT a.name AS name_a, b.name AS name_b,
            a.n_parts AS n_a, b.n_parts AS n_b
          FROM names a JOIN names b
            ON a.tok_first = b.tok_first AND a.name < b.name
               AND ABS(a.len - b.len) <= 4
          UNION
          SELECT a.name, b.name, a.n_parts, b.n_parts
          FROM names a JOIN names b
            ON a.tok_last = b.tok_last AND a.name < b.name
               AND ABS(a.len - b.len) <= 4)
        SELECT name_a, name_b,
          CAST(levenshtein(name_a, name_b) AS INT) AS dist, n_a, n_b
        FROM cand WHERE levenshtein(name_a, name_b) <= 4
        ORDER BY name_a, name_b"""),
      "record linkage: multi-key blocking (first/last token) + length lower bound + exact Levenshtein verify"),

    // --------------------------------------------------------------- q250
    // Blocking-quality audit (Christen 2012): pairs completeness,
    // pairs quality and reduction ratio of q148's first/last-token
    // blocking scheme against EXACT all-pairs Levenshtein truth.
    // Truth is O(n²), so the name universe is capped at the first
    // 2,000 names in lexical order (the q33/q37 capped-baseline
    // discipline — the audit's job is to measure the blocking scheme,
    // which the cap does not bias against: blocking keys and truth
    // see the same universe). The |len_a−len_b| ≤ 4 prune appears on
    // BOTH the truth and candidate sides — it is a lossless lower
    // bound on Levenshtein (an edit per length unit), an optimization
    // that cannot change either set.
    Query(
      "q250_blocking_quality",
      (s, d) => {
        val names = Tables.part(s, d)
          .select(col("p_name")).distinct()
          .orderBy(col("p_name")).limit(2000)
          .select(col("p_name").as("name"),
            length(col("p_name")).as("len"),
            element_at(split(col("p_name"), " "), 1).as("tok_first"),
            element_at(split(col("p_name"), " "), -1).as("tok_last"))
          .localCheckpoint() // capped universe, computed once
        val pairs = names.as("a").join(broadcast(names.as("b")),
            col("a.name") < col("b.name") &&
              abs(col("a.len") - col("b.len")) <= 4)
          .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
            (col("a.tok_first") === col("b.tok_first") ||
              col("a.tok_last") === col("b.tok_last")).as("blocked"),
            (levenshtein(col("a.name"), col("b.name")) <= 4).as("is_match"))
        val counts = pairs.agg(
          sum(when(col("blocked"), 1L).otherwise(0L)).as("n_candidates"),
          sum(when(col("is_match"), 1L).otherwise(0L)).as("n_true"),
          sum(when(col("blocked") && col("is_match"), 1L).otherwise(0L))
            .as("n_found"))
        val n = names.agg(count(lit(1)).as("n_names"))
        counts.crossJoin(broadcast(n))
          .select(col("n_names"),
            (col("n_names") * (col("n_names") - 1) / 2).cast("long")
              .as("total_pairs"),
            col("n_candidates"), col("n_true"), col("n_found"),
            when(col("n_true") > 0, graft.Num.r6(
              col("n_found").cast("double") / col("n_true")))
              .as("pairs_completeness"),
            when(col("n_candidates") > 0, graft.Num.r6(
              col("n_found").cast("double") / col("n_candidates")))
              .as("pairs_quality"),
            graft.Num.r6(lit(1.0) - col("n_candidates").cast("double") /
              (col("n_names") * (col("n_names") - 1) / 2).cast("long"))
              .as("reduction_ratio"))
      },
      Some("""
        WITH names AS (
          SELECT name, LENGTH(name) AS len,
            string_split(name, ' ')[1] AS tok_first,
            string_split(name, ' ')[-1] AS tok_last
          FROM (SELECT DISTINCT p_name AS name FROM part
                ORDER BY p_name LIMIT 2000)),
        pairs AS (
          SELECT
            (a.tok_first = b.tok_first OR a.tok_last = b.tok_last)
              AS blocked,
            levenshtein(a.name, b.name) <= 4 AS is_match
          FROM names a JOIN names b
            ON a.name < b.name AND ABS(a.len - b.len) <= 4),
        counts AS (
          SELECT
            CAST(SUM(CASE WHEN blocked THEN 1 ELSE 0 END) AS BIGINT)
              AS n_candidates,
            CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
              AS n_true,
            CAST(SUM(CASE WHEN blocked AND is_match THEN 1 ELSE 0 END)
              AS BIGINT) AS n_found
          FROM pairs),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_names FROM names)
        SELECT n_names,
          CAST(n_names * (n_names - 1) // 2 AS BIGINT) AS total_pairs,
          n_candidates, n_true, n_found,
          CASE WHEN n_true > 0 THEN
            FLOOR((CAST(n_found AS DOUBLE) / n_true) * 1000000 + 0.500001)
              / 1000000 END AS pairs_completeness,
          CASE WHEN n_candidates > 0 THEN
            FLOOR((CAST(n_found AS DOUBLE) / n_candidates) * 1000000
              + 0.500001) / 1000000 END AS pairs_quality,
          FLOOR((1.0 - CAST(n_candidates AS DOUBLE)
                 / (n_names * (n_names - 1) // 2)) * 1000000 + 0.500001)
            / 1000000 AS reduction_ratio
        FROM counts CROSS JOIN n"""),
      "blocking-quality audit (Christen 2012): pairs completeness/quality + reduction ratio of q148's blocking vs exact capped all-pairs Levenshtein truth"))
}
