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
      "two-stage salted aggregation for skewed keys — oracle is the plain GROUP BY (identical result)"),

    // ---------------------------------------------------------------- q107
    // Salted JOIN for skewed keys — q58's companion for the join side:
    // the dimension is replicated SALT times with an explicit salt
    // column and the fact side tags each row with pmod(xxhash64(key)),
    // so one hot orderkey's rows spread over SALT reducer partitions
    // instead of one. The salt never escapes the join, so the result —
    // and the oracle — is the plain join, aggregated per priority.
    // (AQE's skew-join split handles this adaptively at runtime; the
    // explicit form is the portable plan when AQE is off or the skew is
    // in a single key within one partition.)
    Query(
      "q107_salted_join",
      (s, d) => {
        val salt = 8
        val fact = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            (col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") -
                col("l_discount").cast("decimal(18,2)")))
              .cast("decimal(24,4)").as("rev"),
            pmod(xxhash64(col("l_orderkey")), lit(salt)).as("salt"))
        val dim = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"))
          .crossJoin(broadcast(
            s.range(0, salt).select(col("id").cast("int").as("salt"))))
        fact.join(dim,
            col("l_orderkey") === col("o_orderkey") &&
              fact("salt") === dim("salt"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev")).cast("double").as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_items,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,4)))
            AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
      "salted skew join (8-way dim replication, hash-salted fact) — oracle is the plain join, identical result"),

    // ---------------------------------------------------------------- q108
    // Order-independent table fingerprint: BIT_XOR of a canonical
    // per-row hash plus a row count, per group — the cross-cluster
    // data-validation primitive (two sites compare fingerprints instead
    // of shipping 100 TB). XOR is associative/commutative with no
    // overflow, so partition order, parallelism and engine never change
    // it. The canonical row string uses only integer and string
    // columns (float formatting is engine-specific; FLOOR-cast the one
    // numeric). Paired duplicate rows cancel in XOR — the count column
    // is what exposes them.
    Query(
      "q108_table_fingerprint",
      (s, d) => {
        val rowStr = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"),
          floor(col("l_quantity")).cast("long"))
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            graft.ext.Dedup.h60(rowStr).as("h"))
          .groupBy(col("l_returnflag"))
          .agg(expr("bit_xor(h)").as("fingerprint"),
            count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""
        SELECT l_returnflag,
          BIT_XOR(${graft.ext.Dedup.sqlH60(
            "l_orderkey || '|' || l_linenumber || '|' || l_returnflag || '|' || l_linestatus || '|' || CAST(FLOOR(l_quantity) AS BIGINT)")})
            AS fingerprint,
          COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "order-independent BIT_XOR table fingerprint per group — the compare-checksums-not-data validation primitive"))
}
