package graft

import org.apache.spark.sql.functions._

/** Structural invariants for every registered query on sf0.001 (value
  * parity vs DuckDB is covered by tools/check_oracle.py and the
  * driver's t2 gate; these tests pin behavior that the oracle can't:
  * non-emptiness, hand-computed spot values, invariant relations). */
class QueriesSpec extends SparkSpec {

  test("every registered query runs on sf0.001 and has a non-empty schema") {
    Registry.all.foreach { q =>
      val df = q.run(spark, sf())
      assert(df.schema.fields.nonEmpty, s"${q.name}: empty schema")
      assert(df.count() >= 0, s"${q.name}: failed to execute")
    }
  }

  test("entry returns > 0 rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry sanity: unique names, oracles only for checkable ops") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // every registry entry is oracle-bearing: q42's HLL++ sketch (the
    // last holdout) became error-bound-checkable in r7 by emitting
    // exact counts plus within-5% booleans the DuckDB twin pins TRUE
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle.isEmpty, s"unexpected oracle-less queries: $noOracle")
    // every oracle references only tables the driver registers
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    Registry.all.flatMap(_.oracle).foreach { sql =>
      "(?i)FROM\\s+([a-z_]+)".r.findAllMatchIn(sql).foreach { m =>
        val t = m.group(1).toLowerCase
        // allow CTE names and subqueries; flag only obvious typos of
        // base tables (heuristic: 'lineitems', 'event' etc.)
        assert(!Set("lineitems", "event", "order", "customers").contains(t),
          s"suspicious table name '$t'")
      }
    }
  }

  test("q76 KMV estimate lands within 25% of the exact distinct count") {
    // k=256 -> ~1/sqrt(k) ≈ 6% expected error; 25% bounds flakiness
    // while still catching a broken estimator (off by 2x+). The exact
    // count lives HERE, not in the query: an approximate-distinct
    // operator that also computes the exact answer isn't approximate.
    val exactByFlag = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n_exact"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_exact"))
      .toMap
    val rows = Registry.queries("q76_kmv_distinct")(spark, sf()).collect()
    assert(rows.nonEmpty, "q76 returned no rows")
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val exact = exactByFlag(flag).toDouble
      val est = r.getAs[Double]("kmv_est")
      assert(math.abs(est - exact) / exact < 0.25,
        s"$flag: est $est vs exact $exact")
    }
  }

  test("q77 every format read agrees with the parquet original") {
    val rows = Registry.queries("q77_multiformat_scan")(spark, sf()).collect()
    assert(rows.length == 3)
    assert(rows.map(r => (r.getAs[Long]("n_rows"), r.getAs[Long]("sum_key"),
      r.getAs[Long]("sum_name_len"))).distinct.length == 1,
      "csv/json/orc reads disagree")
  }

  test("q20 enrichment preserves event row count (FK is total)") {
    val events = Tables.events(spark, sf()).count()
    val enriched = Registry.queries("q20_enriched_events")(spark, sf()).count()
    assert(events == enriched)
  }

  test("q22 anomaly rate is small and no flag occurs during warm-up") {
    val df = Registry.queries("q22_anomaly_flags")(spark, sf())
    val flagged = df.filter(col("is_anomaly")).count()
    val total = df.count()
    assert(flagged < total * 0.2, s"implausible anomaly rate: $flagged/$total")
    assert(df.filter(col("is_anomaly") && col("n_training") < 30).count() == 0)
  }

  test("q23 = q22 minus flagged rows") {
    val q22 = Registry.queries("q22_anomaly_flags")(spark, sf())
    val q23 = Registry.queries("q23_filtered_normal")(spark, sf())
    assert(q23.count() == q22.filter(!col("is_anomaly")).count())
  }

  test("q24 forecast bounds straddle the point forecast") {
    val df = Registry.queries("q24_forecast")(spark, sf())
    assert(df.filter(col("lower_bound") > col("forecast_value") ||
      col("upper_bound") < col("forecast_value")).count() == 0)
  }

  test("q30 exact dedup: canonical ids unique, copies sum to row count") {
    val docs = Tables.documents(spark, sf()).count()
    val dedup = Registry.queries("q30_dedup_exact")(spark, sf())
    assert(dedup.select("canonical_id").distinct().count() == dedup.count())
    assert(dedup.agg(sum("n_copies")).head.getLong(0) == docs)
  }

  test("q33 knn: 5 neighbors per probe, cosine in [-1, 1], no self-match") {
    val df = Registry.queries("q33_knn_cosine")(spark, sf())
    assert(df.count() == 50)
    assert(df.filter(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() == 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("q01 groups are the full returnflag × linestatus domain") {
    val df = Registry.queries("q01_pricing_summary")(spark, sf())
    assert(df.count() >= 4)
    assert(df.filter(col("sum_qty") <= 0).count() == 0)
  }

  test("q107 salted join equals the plain unsalted join") {
    val salted = Registry.queries("q107_salted_join")(spark, sf())
    val plain = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(24,4)")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
    assert(salted.collect().toSeq == plain.collect().toSeq,
      "salt must not change the join result")
  }

  test("q108 fingerprint is order-independent and change-sensitive") {
    val fp = Registry.queries("q108_table_fingerprint")(spark, sf())
    // re-running on a shuffled layout gives the same fingerprints
    val li = Tables.lineitem(spark, sf()).repartition(13)
    val rowStr = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"),
      floor(col("l_quantity")).cast("long"))
    val refp = li.select(col("l_returnflag"),
        graft.ext.Dedup.h60(rowStr).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(expr("bit_xor(h)").as("fingerprint"), count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
    assert(fp.collect().toSeq == refp.collect().toSeq)
    // flipping one row's quantity flips exactly that group's fingerprint
    val mutated = li.withColumn("l_quantity",
      when(col("l_orderkey") === li.select(max("l_orderkey")).head.getLong(0),
        col("l_quantity") + 1).otherwise(col("l_quantity")))
    val mutStr = concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_returnflag"), col("l_linestatus"),
      floor(col("l_quantity")).cast("long"))
    val mfp = mutated.select(col("l_returnflag"),
        graft.ext.Dedup.h60(mutStr).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(expr("bit_xor(h)").as("fingerprint"))
    val diff = mfp.join(fp.select(col("l_returnflag"),
        col("fingerprint").as("orig")), Seq("l_returnflag"))
      .filter(col("fingerprint") =!= col("orig")).count()
    assert(diff >= 1, "a mutated row must change its group fingerprint")
  }
}
