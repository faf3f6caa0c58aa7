package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second relational wave: correlated subqueries, JSON scalar
  * extraction, multiset set-ops, argmax/conditional aggregates, and the
  * salting pattern for skewed keys. */
object Relational2 {

  /** Two-stage salted aggregation: spread one hot key across `salt`
    * sub-keys, partial-aggregate, then combine — the standard fix when
    * one key would otherwise serialize a whole shuffle partition. The
    * result is identical to the direct aggregation (its oracle IS the
    * plain GROUP BY). */
  def saltedSum(df: DataFrame, key: String, value: String, salt: Int,
      saltSource: String): DataFrame =
    df.withColumn("__salt", pmod(crc32(col(saltSource).cast("string")), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(col(value)).as("ps"))
      .groupBy(col(key))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("sum_value"))

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q54
    Query(
      "q54_correlated_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer")
        Tables.orders(s, d).createOrReplaceTempView("orders")
        s.sql("""
          SELECT c_custkey, c_name,
            (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
          FROM customer
          WHERE c_acctbal > 7000.0
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_name,
          (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_acctbal > 7000.0
        ORDER BY c_custkey"""),
      "correlated scalar subquery (Catalyst rewrites to an aggregate + left outer join)"),

    // ---------------------------------------------------------------- q55
    Query(
      "q55_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("k").cast("long")).as("sum_k"),
            min(col("k")).as("min_k"), max(col("k")).as("max_k"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(CAST(json_extract(props, '$.k') AS INT) AS BIGINT)) AS BIGINT) AS sum_k,
          MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
          MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "JSON scalar extraction from the props column + aggregation"),

    // ---------------------------------------------------------------- q56
    Query(
      "q56_multiset_ops",
      (s, d) => {
        val a = Tables.lineitem(s, d).filter(col("l_discount") >= 0.05)
          .select(col("l_orderkey"))
        val b = Tables.lineitem(s, d).filter(col("l_tax") >= 0.04)
          .select(col("l_orderkey"))
        a.exceptAll(b).groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all"))
          .unionByName(
            a.intersectAll(b).groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
              .withColumn("op", lit("intersect_all")))
          .select(col("op"), col("l_orderkey"), col("n"))
          .orderBy(col("op"), col("l_orderkey"))
      },
      Some("""
        WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_discount >= 0.05),
        b AS (SELECT l_orderkey FROM lineitem WHERE l_tax >= 0.04),
        ea AS (SELECT 'except_all' AS op, l_orderkey, COUNT(*) AS n
               FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY l_orderkey),
        ia AS (SELECT 'intersect_all' AS op, l_orderkey, COUNT(*) AS n
               FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY l_orderkey)
        SELECT op, l_orderkey, n
        FROM (SELECT * FROM ea UNION ALL SELECT * FROM ia)
        ORDER BY op, l_orderkey"""),
      "multiset EXCEPT ALL / INTERSECT ALL with multiplicity preserved"),

    // ---------------------------------------------------------------- q57
    Query(
      "q57_argmax_conditional",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(
            max_by(col("event_id"), struct(col("value"), col("event_id"))).as("top_event"),
            max(col("value")).as("top_value"),
            count_if(col("event_type") === "error").as("n_errors"),
            some(col("value") > 95.0).as("any_high"),
            every(col("value") >= 0.0).as("all_nonneg"))
          .orderBy(col("user_id")),
      Some("""
        WITH ranked AS (
          SELECT user_id, event_id, value, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id DESC) AS rn
          FROM events)
        SELECT user_id,
          MAX(CASE WHEN rn = 1 THEN event_id END) AS top_event,
          MAX(value) AS top_value,
          COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
          BOOL_OR(value > 95.0) AS any_high,
          BOOL_AND(value >= 0.0) AS all_nonneg
        FROM ranked GROUP BY user_id ORDER BY user_id"""),
      "argmax with deterministic tie-break + conditional/boolean aggregates"),

    // ---------------------------------------------------------------- q58
    Query(
      "q58_salted_agg",
      (s, d) =>
        saltedSum(Tables.events(s, d), "event_type", "value", salt = 16,
          saltSource = "event_id")
          .select(col("event_type"), col("n"),
            Num.r4(col("sum_value")).as("sum_value"))
          .orderBy(col("event_type")),
      Some(s"""
        SELECT event_type, COUNT(*) AS n,
          ${Num.sql("SUM(value)", 4)} AS sum_value
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "two-stage salted aggregation for skewed keys — oracle is the plain GROUP BY (identical result)"))
}
