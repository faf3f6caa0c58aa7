package graft.ops

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The general relational operator surface (SURVEY.md §2.2): scans,
  * filters, projections, hash/broadcast/semi/anti joins, grouped and
  * distinct aggregation, rollup, ranking/analytic windows, set ops,
  * scalar string/date functions, sort/limit. All batch DataFrame API —
  * Catalyst supplies pushdown, pruning, partial aggregation, broadcast
  * selection and AQE; nothing here hand-schedules work.
  *
  * Scale notes per query are in each entry's doc string — the guiding
  * rules: dimension sides broadcast, aggregations are partial+final,
  * top-k is TakeOrderedAndProject (no global sort materialization).
  */
object Relational {

  /** Exact money arithmetic: DOUBLE -> DECIMAL(18,2) so sums are exact
    * and both engines produce bit-identical doubles at the end. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** l_extendedprice * (1 - l_discount), exact. */
  private def discPrice: Column =
    (dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
      .cast("decimal(24,4)")

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q01
    Query(
      "q01_pricing_summary",
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("2000-06-30").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            // FLOOR (not a raw cast) so both engines agree even on a
            // non-integral quantity: DuckDB ROUNDS double->BIGINT casts
            // while Spark truncates
            sum(floor(col("l_quantity"))).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(discPrice).cast("double").as("sum_disc_price"),
            sum((discPrice * (lit(1).cast("decimal(12,2)") + dec(col("l_tax"))))
              .cast("decimal(30,6)")).cast("double").as("sum_charge"),
            graft.Num.r4(avg(col("l_quantity"))).as("avg_qty"),
            graft.Num.r4(avg(col("l_extendedprice"))).as("avg_price"),
            graft.Num.r4(avg(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
          FLOOR((AVG(l_quantity)) * 10000 + 0.500001) / 10000 AS avg_qty,
          FLOOR((AVG(l_extendedprice)) * 10000 + 0.500001) / 10000 AS avg_price,
          FLOOR((AVG(l_discount)) * 10000 + 0.500001) / 10000 AS avg_disc,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      "TPC-H Q1-style pricing summary; partial+final HashAggregate, 6-group output"),

    // ---------------------------------------------------------------- q02
    Query(
      "q02_filter_scan",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1999-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic
          // data — sort on every output column for a total order
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_quantity"), col("l_discount")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_quantity, l_discount"""),
      "TPC-H Q6-style selective scan; predicates + projection push to parquet (PushedFilters/ReadSchema)"),

    // ---------------------------------------------------------------- q03
    Query(
      "q03_top_orders",
      (s, d) => {
        val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, d)
        val l = Tables.lineitem(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(discPrice).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10"""),
      "TPC-H Q3-style: filtered dim broadcast, fact-fact shuffle join, top-k via TakeOrderedAndProject"),

    // ---------------------------------------------------------------- q04
    Query(
      "q04_segment_stats",
      (s, d) =>
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_customers"),
            sum(dec(col("o_totalprice"))).cast("double").as("total_revenue"),
            graft.Num.r4(avg(col("o_totalprice"))).as("avg_price"))
          .orderBy(col("c_mktsegment")),
      Some("""
        SELECT c_mktsegment,
          COUNT(*) AS n_orders,
          COUNT(DISTINCT o_custkey) AS n_customers,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
          FLOOR((AVG(o_totalprice)) * 10000 + 0.500001) / 10000 AS avg_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
      "broadcast dim join + grouped agg with COUNT(DISTINCT)"),

    // ---------------------------------------------------------------- q05
    Query(
      "q05_region_revenue",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .filter(col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(discPrice).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""),
      "TPC-H Q5-style 6-table join; all dims broadcast, single fact shuffle"),

    // ---------------------------------------------------------------- q06
    Query(
      "q06_semi_join",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        ORDER BY c_custkey"""),
      "EXISTS as left_semi join"),

    // ---------------------------------------------------------------- q07
    Query(
      "q07_anti_join",
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000.0),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey"""),
      "NOT EXISTS as left_anti join"),

    // ---------------------------------------------------------------- q08
    Query(
      "q08_distinct_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_suppkey")).as("n_suppliers"),
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
          COUNT(DISTINCT l_suppkey) AS n_suppliers,
          COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(DISTINCT l_orderkey) AS n_orders,
          COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "multi COUNT(DISTINCT) — Catalyst expands to a single multi-distinct aggregate"),

    // ---------------------------------------------------------------- q09
    Query(
      "q09_rollup",
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(floor(col("l_quantity"))).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .orderBy(coalesce(col("l_returnflag"), lit("ZZZ")),
            coalesce(col("l_linestatus"), lit("ZZZ"))),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY COALESCE(l_returnflag, 'ZZZ'), COALESCE(l_linestatus, 'ZZZ')"""),
      "grouping-sets rollup (subtotals + grand total)"),

    // ---------------------------------------------------------------- q10
    Query(
      "q10_rank_window",
      (s, d) => {
        // round 10 (guide §2.3/§2.4): the old plan ran TWO full-table
        // window sorts per supplier (rn by shipdate, rank by quantity)
        // with the rn <= 5 filter only after both — every lineitem row
        // paid both sorts. rank() = 1 + #{rows of the supplier with
        // strictly greater quantity}, which the surviving ≤5 rows can
        // read off the per-(supplier, quantity) count histogram — a
        // partial-aggregated ~|suppliers|·|distinct qty| frame — so the
        // quantity sort disappears, and with the filter directly above
        // the remaining window Spark's WindowGroupLimit keeps only
        // top-5 rows per supplier per map task ahead of the one sort.
        // Identical output: row_number/filter unchanged; rank ties
        // (equal quantities) get the same 1 + greater-count.
        val wOrd = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        val li = Tables.lineitem(s, d)
        val top5 = li
          .withColumn("rn", row_number().over(wOrd))
          .filter(col("rn") <= 5)
          .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
        val qhist = li.groupBy(col("l_suppkey"), col("l_quantity").as("q"))
          .agg(count(lit(1)).as("c"))
        top5.join(qhist, Seq("l_suppkey"))
          .groupBy(col("l_suppkey"), col("rn"), col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"))
          .agg((lit(1) + sum(when(col("q") > col("l_quantity"), col("c"))
            .otherwise(0L))).cast("int").as("qty_rank"))
          .orderBy(col("l_suppkey"), col("rn"))
      },
      Some("""
        SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_quantity, qty_rank
        FROM (
          SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
            ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
            RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity DESC) AS qty_rank
          FROM lineitem) t
        WHERE rn <= 5
        ORDER BY l_suppkey, rn"""),
      "ranking window functions; first-5-shipments per supplier"),

    // ---------------------------------------------------------------- q12
    Query(
      "q12_set_ops",
      (s, d) => {
        val active = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
        val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
          .select(col("c_custkey").as("k")).distinct()
        val u = active.union(rich).distinct().select(lit("union").as("op"), col("k"))
        val i = active.intersect(rich).select(lit("intersect").as("op"), col("k"))
        val e = active.except(rich).select(lit("except").as("op"), col("k"))
        u.union(i).union(e)
          .groupBy(col("op")).agg(count(lit(1)).as("n"), sum(col("k")).as("key_sum"))
          .orderBy(col("op"))
      },
      Some("""
        WITH active AS (SELECT DISTINCT o_custkey AS k FROM orders),
             rich AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 5000.0),
             u AS (SELECT 'union' AS op, k FROM (SELECT k FROM active UNION SELECT k FROM rich)),
             i AS (SELECT 'intersect' AS op, k FROM (SELECT k FROM active INTERSECT SELECT k FROM rich)),
             e AS (SELECT 'except' AS op, k FROM (SELECT k FROM active EXCEPT SELECT k FROM rich))
        SELECT op, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS key_sum
        FROM (SELECT * FROM u UNION ALL SELECT * FROM i UNION ALL SELECT * FROM e)
        GROUP BY op ORDER BY op"""),
      "UNION / INTERSECT / EXCEPT summarized per set operation"),

    // ---------------------------------------------------------------- q13
    Query(
      "q13_string_funcs",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            upper(col("c_mktsegment")).as("seg_upper"),
            lower(col("c_name")).as("name_lower"),
            length(col("c_name")).cast("long").as("name_len"),
            substring(col("c_name"), 10, 4).as("name_mid"),
            element_at(split(col("c_name"), "#"), 2).as("name_num"),
            concat(col("c_mktsegment"), lit("-"), col("c_custkey").cast("string")).as("tag"),
            regexp_replace(col("c_name"), "0+", "0").as("name_squeezed"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey,
          UPPER(c_mktsegment) AS seg_upper,
          LOWER(c_name) AS name_lower,
          CAST(LENGTH(c_name) AS BIGINT) AS name_len,
          SUBSTRING(c_name, 10, 4) AS name_mid,
          STRING_SPLIT(c_name, '#')[2] AS name_num,
          c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS tag,
          REGEXP_REPLACE(c_name, '0+', '0', 'g') AS name_squeezed
        FROM customer ORDER BY c_custkey"""),
      "scalar string library: case, length, substring, split, concat, regexp"),

    // ---------------------------------------------------------------- q14
    Query(
      "q14_date_agg",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
            min(col("o_orderdate")).as("first_order"),
            max(col("o_orderdate")).as("last_order"))
          .orderBy(col("y"), col("m")),
      Some("""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          MIN(o_orderdate) AS first_order,
          MAX(o_orderdate) AS last_order
        FROM orders GROUP BY 1, 2 ORDER BY y, m"""),
      "date part extraction + monthly aggregate"),

    // ---------------------------------------------------------------- q15
    Query(
      "q15_case_having",
      (s, d) => {
        val bucket = when(col("p_size") < 10, "S")
          .when(col("p_size") < 30, "M").otherwise("L")
        Tables.part(s, d)
          .groupBy(col("p_brand"), bucket.as("size_bucket"))
          .agg(count(lit(1)).as("n_parts"),
            graft.Num.r4(avg(col("p_retailprice"))).as("avg_price"))
          .filter(col("n_parts") > 2)
          .orderBy(col("p_brand"), col("size_bucket"))
      },
      Some("""
        SELECT p_brand,
          CASE WHEN p_size < 10 THEN 'S' WHEN p_size < 30 THEN 'M' ELSE 'L' END AS size_bucket,
          COUNT(*) AS n_parts,
          FLOOR((AVG(p_retailprice)) * 10000 + 0.500001) / 10000 AS avg_price
        FROM part
        GROUP BY 1, 2
        HAVING COUNT(*) > 2
        ORDER BY p_brand, size_bucket"""),
      "CASE expression grouping + HAVING"),

    // ---------------------------------------------------------------- q16
    Query(
      "q16_top_items",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
            col("l_quantity"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(20),
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20"""),
      "global top-k: TakeOrderedAndProject, no full sort materialization"))
}
