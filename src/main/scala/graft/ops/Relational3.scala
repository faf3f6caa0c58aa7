package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational wave: remaining analytic window functions, array
  * scalar functions, edit distance, conditional scalars. */
object Relational3 {

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q61
    Query(
      "q61_rank_variants",
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"),
            ntile(4).over(w).as("quartile"),
            Num.r4(percent_rank().over(w)).as("pct_rank"),
            Num.r4(cume_dist().over(w)).as("cume"),
            dense_rank().over(w).as("drank"),
            first(col("l_extendedprice")).over(wf).as("cheapest"),
            last(col("l_extendedprice")).over(wf).as("priciest"))
          // (l_orderkey, l_linenumber) is not unique; l_extendedprice
          // completes the total order (unique triple in this data)
          .orderBy(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
      },
      Some(s"""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          NTILE(4) OVER w AS quartile,
          ${Num.sql("PERCENT_RANK() OVER w", 4)} AS pct_rank,
          ${Num.sql("CUME_DIST() OVER w", 4)} AS cume,
          DENSE_RANK() OVER w AS drank,
          FIRST_VALUE(l_extendedprice) OVER wf AS cheapest,
          LAST_VALUE(l_extendedprice) OVER wf AS priciest
        FROM lineitem
        WHERE l_orderkey < 200
        WINDOW
          w AS (PARTITION BY l_returnflag
                ORDER BY l_extendedprice, l_orderkey, l_linenumber),
          wf AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_returnflag, l_orderkey, l_linenumber, l_extendedprice"""),
      "ntile / percent_rank / cume_dist / dense_rank / first+last over full frame"),

    // ---------------------------------------------------------------- q62
    Query(
      "q62_array_funcs",
      (s, d) => {
        val v = graft.ext.Similarity.toDouble(col("embedding"))
        Tables.embeddings(s, d)
          .filter(col("vec_id") < 100)
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            Num.r4(element_at(v, 1)).as("first_dim"),
            Num.r4(element_at(v, -1)).as("last_dim"),
            Num.r4(aggregate(v, lit(0.0), (acc, x) => acc + x)).as("sum_dims"),
            Num.r4(array_max(v)).as("max_dim"),
            Num.r4(array_min(v)).as("min_dim"),
            Num.r4(aggregate(slice(v, 1, 8), lit(0.0), (acc, x) => acc + x))
              .as("sum_first8"),
            size(filter(v, x => x > 0)).cast("long").as("n_positive"))
          .orderBy(col("vec_id"))
      },
      Some {
        val v = "CAST(embedding AS DOUBLE[])"
        s"""
        SELECT vec_id,
          CAST(LEN(embedding) AS BIGINT) AS dim,
          ${Num.sql(s"$v[1]", 4)} AS first_dim,
          ${Num.sql(s"$v[-1]", 4)} AS last_dim,
          ${Num.sql(s"LIST_SUM($v)", 4)} AS sum_dims,
          ${Num.sql(s"LIST_MAX($v)", 4)} AS max_dim,
          ${Num.sql(s"LIST_MIN($v)", 4)} AS min_dim,
          ${Num.sql(s"LIST_SUM(($v)[1:8])", 4)} AS sum_first8,
          CAST(LEN(LIST_FILTER($v, x -> x > 0)) AS BIGINT) AS n_positive
        FROM embeddings
        WHERE vec_id < 100
        ORDER BY vec_id"""
      },
      "array scalar library over embedding columns (indexing, slice, fold, min/max, filter)"),

    // ---------------------------------------------------------------- q64
    Query(
      "q64_edit_distance",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("doc_id") < 30)
          .select(col("doc_id"), substring(col("text"), 1, 60).as("prefix"))
        docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            levenshtein(col("a.prefix"), col("b.prefix")).as("edit_dist"))
          .filter(col("edit_dist") <= 45)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, SUBSTRING(text, 1, 60) AS prefix
          FROM documents WHERE doc_id < 30)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          LEVENSHTEIN(a.prefix, b.prefix) AS edit_dist
        FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE LEVENSHTEIN(a.prefix, b.prefix) <= 45
        ORDER BY doc_a, doc_b"""),
      "pairwise Levenshtein edit distance on text prefixes (integer-exact both engines)"),

    // ---------------------------------------------------------------- q66
    Query(
      "q66_conditional_scalars",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 300)
          .select(col("l_orderkey"), col("l_linenumber"),
            greatest(col("l_discount"), col("l_tax")).as("max_rate"),
            least(col("l_discount"), col("l_tax")).as("min_rate"),
            nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
            coalesce(nullif(col("l_discount"), lit(0.0)), col("l_tax"))
              .as("effective_rate"),
            when(col("l_returnflag") === "R", col("l_quantity")).as("returned_qty"))
          // non-unique (okey, line): sort every output column, with the
          // nullable ones last and NULLS FIRST pinned on both sides
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("max_rate"), col("min_rate"),
            col("disc_or_null").asc_nulls_first,
            col("effective_rate"), col("returned_qty").asc_nulls_first),
      Some("""
        SELECT l_orderkey, l_linenumber,
          GREATEST(l_discount, l_tax) AS max_rate,
          LEAST(l_discount, l_tax) AS min_rate,
          NULLIF(l_discount, 0.0) AS disc_or_null,
          COALESCE(NULLIF(l_discount, 0.0), l_tax) AS effective_rate,
          CASE WHEN l_returnflag = 'R' THEN l_quantity END AS returned_qty
        FROM lineitem
        WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber, max_rate, min_rate,
          disc_or_null NULLS FIRST, effective_rate, returned_qty NULLS FIRST"""),
      "conditional scalars: greatest/least/nullif/coalesce/partial CASE"))
}
