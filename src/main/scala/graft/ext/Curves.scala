package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Corpus-curve and snapshot-evolution operators: the vocabulary
  * coverage curve (how much of the token stream the top-k vocabulary
  * explains — the plot that sizes a tokenizer) and a temporal snapshot
  * diff (which keys appeared/disappeared/changed between two corpus
  * states — the ingest-diff audit). */
object Curves {

  private def toks = split(col("text"), " ")

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q123
    // Vocabulary coverage curve at k in {1,2,4,...,64}: the share of
    // all token OCCURRENCES covered by the top-k most frequent tokens
    // (count desc, token asc total order). Scale shape: one frequency
    // pass, a bounded top-64 (TakeOrdered) whose rank window is
    // 64-sized, the corpus total as a broadcast 1-row aggregate, and a
    // 7-point output — the curve costs one token pass regardless of
    // corpus size. Integer counts, one r6 per point.
    Query(
      "q123_vocab_coverage",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val freq = Tables.documents(s, d)
          .select(explode(toks).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("n"))
        val total = freq.agg(sum(col("n")).as("total")) // 1 row
        val top = freq.orderBy(col("n").desc, col("t")).limit(64)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("t"))))
        val ks = Seq(1, 2, 4, 8, 16, 32, 64)
        top.crossJoin(broadcast(total))
          .select(explode(lit(ks.toArray)).as("k"), col("rank"),
            col("n"), col("total"))
          .filter(col("rank") <= col("k"))
          .groupBy(col("k"))
          .agg(sum(col("n")).as("covered"), max(col("total")).as("total"))
          .select(col("k"), col("covered"),
            Num.r6(col("covered") / col("total").cast("double"))
              .as("coverage"))
          .orderBy(col("k"))
      },
      Some(s"""
        WITH freq AS (
          SELECT t, COUNT(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS t FROM documents)
          GROUP BY t),
        total AS (SELECT SUM(n) AS total FROM freq),
        top AS (
          SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rank
          FROM freq QUALIFY rank <= 64),
        ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS k)
        SELECT k, CAST(SUM(n) AS BIGINT) AS covered,
          ${Num.sql("SUM(n) / CAST(MAX(total) AS DOUBLE)", 6)} AS coverage
        FROM top CROSS JOIN total JOIN ks ON rank <= k
        GROUP BY k ORDER BY k"""),
      "vocabulary coverage curve: share of token occurrences covered by the top-k vocabulary at k=1..64 (one token pass + bounded top-64)"),

    // --------------------------------------------------------------- q124
    // Temporal snapshot diff: split the event log at its midpoint
    // (integer-µs midpoint of min/max, from a broadcast 1-row
    // aggregate) and diff per-user activity between the halves —
    // added / removed / changed / unchanged, with before/after counts.
    // The ingest-diff audit run between two crawl or CDC snapshots.
    // All-integer; one user-key aggregate per half, one full-outer
    // join on the user key.
    Query(
      "q124_snapshot_diff",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"))
        val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us")) // 1 row
        val tagged = ev.crossJoin(broadcast(mid))
        val before = tagged.filter(col("us") < col("mid_us"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_before"))
        val after = tagged.filter(col("us") >= col("mid_us"))
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_after"))
        before.join(after, Seq("user_id"), "full_outer")
          .select(col("user_id"),
            coalesce(col("n_before"), lit(0L)).as("n_before"),
            coalesce(col("n_after"), lit(0L)).as("n_after"),
            when(col("n_before").isNull, lit("added"))
              .when(col("n_after").isNull, lit("removed"))
              .when(col("n_before") === col("n_after"), lit("unchanged"))
              .otherwise(lit("changed")).as("status"))
          .orderBy(col("user_id"))
      },
      Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        mid AS (SELECT CAST((MIN(us) + MAX(us)) // 2 AS BIGINT) AS mid_us
                FROM ev),
        b AS (SELECT user_id, COUNT(*) AS n_before
              FROM ev CROSS JOIN mid WHERE us < mid_us GROUP BY user_id),
        a AS (SELECT user_id, COUNT(*) AS n_after
              FROM ev CROSS JOIN mid WHERE us >= mid_us GROUP BY user_id)
        SELECT user_id,
          CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
          CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
          CASE WHEN n_before IS NULL THEN 'added'
               WHEN n_after IS NULL THEN 'removed'
               WHEN n_before = n_after THEN 'unchanged'
               ELSE 'changed' END AS status
        FROM b FULL OUTER JOIN a USING (user_id)
        ORDER BY user_id"""),
      "temporal snapshot diff: per-user added/removed/changed/unchanged between the two halves of the event log (ingest/CDC diff audit)"))
}
