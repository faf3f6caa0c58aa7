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
      "record linkage: multi-key blocking (first/last token) + length lower bound + exact Levenshtein verify"))
}
