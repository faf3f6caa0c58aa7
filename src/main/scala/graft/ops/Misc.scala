package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Remaining coverage: approximate distinct (HLL++), the math scalar
  * library, marker-based language ID, and the shared-SQL entry path. */
object Misc {

  /** One SQL text that parses identically in Spark and DuckDB — used
    * verbatim for both sides of q45, demonstrating the `spark.sql`
    * entry path. */
  val SharedSql: String = """
    SELECT l_returnflag, COUNT(*) AS n,
      SUM(CAST(l_quantity AS BIGINT)) AS total_qty,
      MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Language marker lists (shared by the Spark and SQL sides). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"))

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q42
    // HLL++ differs from DuckDB's approx sketch — rows-only check here;
    // the <10% error bound is asserted in MiscSpec.
    Query(
      "q42_approx_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey")).as("approx_orders"),
            approx_count_distinct(col("l_partkey")).as("approx_parts"))
          .orderBy(col("l_returnflag")),
      None,
      "approximate distinct counts via HyperLogLog++ (no shuffle of distinct values)"),

    // ---------------------------------------------------------------- q43
    Query(
      "q43_math_scalars",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_linenumber") === 1 && col("l_orderkey") < 500)
          .select(col("l_orderkey"),
            Num.r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
            Num.r4(log(col("l_extendedprice"))).as("ln_price"),
            Num.r4(exp(col("l_discount"))).as("exp_disc"),
            Num.r4(pow(col("l_quantity"), lit(2))).as("qty_sq"),
            abs(col("l_quantity") - lit(25)).as("abs_dev"),
            signum(col("l_discount") - 0.05).as("disc_sign"),
            (col("l_orderkey") % 7).as("mod7"),
            floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
            ceil(col("l_quantity") / 10).cast("long").as("qty_ceil"),
            Num.r4(sin(col("l_quantity"))).as("sin_qty"))
          // l_orderkey alone is not unique even at l_linenumber = 1 —
          // break ties with the price-derived column for a total order
          .orderBy(col("l_orderkey"), col("ln_price"), col("sqrt_qty")),
      Some(s"""
        SELECT l_orderkey,
          ${Num.sql("SQRT(l_quantity)", 4)} AS sqrt_qty,
          ${Num.sql("LN(l_extendedprice)", 4)} AS ln_price,
          ${Num.sql("EXP(l_discount)", 4)} AS exp_disc,
          ${Num.sql("POW(l_quantity, 2)", 4)} AS qty_sq,
          ABS(l_quantity - 25) AS abs_dev,
          SIGN(l_discount - 0.05) AS disc_sign,
          l_orderkey % 7 AS mod7,
          CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
          CAST(CEIL(l_quantity / 10) AS BIGINT) AS qty_ceil,
          ${Num.sql("SIN(l_quantity)", 4)} AS sin_qty
        FROM lineitem
        WHERE l_linenumber = 1 AND l_orderkey < 500
        ORDER BY l_orderkey, ln_price, sqrt_qty"""),
      "math scalar library (sqrt/ln/exp/pow/abs/sign/mod/floor/ceil/sin)"),

    // ---------------------------------------------------------------- q44
    Query(
      "q44_language_id",
      (s, d) => {
        val toks = split(col("text"), " ")
        val score = (lang: String) => size(filter(toks,
          t => Markers(lang).map(m => t === m).reduce(_ || _)))
        val en = score("en"); val de = score("de"); val es = score("es")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("labeled_lang"),
            en.cast("long").as("en_hits"), de.cast("long").as("de_hits"),
            es.cast("long").as("es_hits"),
            when(en >= de && en >= es && en > 0, "en")
              .when(de >= es && de > 0, "de")
              .when(es > 0, "es")
              .otherwise("unknown").as("guessed_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        def hits(lang: String) = {
          val list = Markers(lang).map(m => s"'$m'").mkString(", ")
          s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ($list))) AS BIGINT)"
        }
        s"""
        WITH t AS (
          SELECT doc_id, lang,
            ${hits("en")} AS en_hits, ${hits("de")} AS de_hits,
            ${hits("es")} AS es_hits
          FROM documents)
        SELECT doc_id, lang AS labeled_lang, en_hits, de_hits, es_hits,
          CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
               WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
               WHEN es_hits > 0 THEN 'es'
               ELSE 'unknown' END AS guessed_lang
        FROM t ORDER BY doc_id"""
      },
      "marker-word language identification with deterministic argmax tie rule"),

    // ---------------------------------------------------------------- q45
    Query(
      "q45_sql_surface",
      (s, d) => {
        Seq("lineitem").foreach(t =>
          Tables(s, d, t).createOrReplaceTempView(t))
        s.sql(SharedSql)
      },
      Some(SharedSql),
      "spark.sql entry path: one ANSI SQL text evaluated verbatim by both engines"))
}
