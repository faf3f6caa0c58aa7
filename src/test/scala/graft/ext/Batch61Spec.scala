package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 61: q415 revenue-mix drift, q416
  * segment migration, q417 single-source risk, q418 price dispersion.
  */
class Batch61Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b61").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q415: one order per half flips the region mix from A to B entirely") {
    import spark.implicits._
    val day = 86400000L
    val t0 = 1704067200000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val customer = Seq((1L, 1L), (2L, 2L)).toDF("c_custkey", "c_nationkey")
    val nation = Seq((1L, 10L), (2L, 20L)).toDF("n_nationkey", "n_regionkey")
    val region = Seq((10L, "AMERICA"), (20L, "EUROPE")).toDF("r_regionkey", "r_name")
    val orders = Seq((1L, 1L, ts(t0)), (2L, 2L, ts(t0 + 10 * day)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq((1L, 100.00), (2L, 100.00)).toDF("l_orderkey", "l_extendedprice")
    val rows = byName("q415_revenue_mix_drift")
      .run(spark, plantDir("customer" -> customer, "nation" -> nation,
        "region" -> region, "orders" -> orders, "lineitem" -> li))
      .collect().map(r => r.getAs[String]("region") -> r).toMap
    assert(rows("AMERICA").getAs[Double]("share_h1") == 1.0)
    assert(rows("AMERICA").getAs[Double]("share_h2") == 0.0)
    assert(rows("AMERICA").getAs[Double]("share_delta") == -1.0)
    assert(rows("EUROPE").getAs[Double]("share_delta") == 1.0)
    assert(rows("AMERICA").getAs[Double]("rev_h1") == 100.0)
  }

  test("q416: 1/2/3-count users land in low/mid/high then rotate with one churn") {
    import spark.implicits._
    val t0 = 1704067200000L
    val dayMs = 86400000L
    var id = 0L
    def ev(u: Long, ms: Long) = {
      id += 1; (id, new java.sql.Timestamp(ms), u, "view", 1.0, "{}")
    }
    // span day 0..10, midpoint day 5; H1 counts 1/2/3, H2: u1->3, u2->0, u3->2
    val rows = (
      Seq(ev(1L, t0)) ++ (1 to 2).map(i => ev(2L, t0 + i * 60000L)) ++
        (1 to 3).map(i => ev(3L, t0 + i * 1000L)) ++
        (1 to 3).map(i => ev(1L, t0 + 9 * dayMs + i * 1000L)) ++
        (1 to 2).map(i => ev(3L, t0 + 9 * dayMs + i * 60000L)) :+
        ev(99L, t0 + 10 * dayMs)) // pins the span end; H2-only -> excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = byName("q416_segment_migration").run(spark, plantDir("events" -> rows))
      .collect().map(r => (r.getAs[String]("seg_h1"), r.getAs[String]("seg_h2")) -> r).toMap
    assert(out.keySet == Set(("low", "high"), ("mid", "churn"), ("high", "mid")))
    assert(out(("low", "high")).getAs[Long]("n_users") == 1L)
    assert(out(("mid", "churn")).getAs[Double]("row_share") == 1.0)
  }

  test("q417: 2-of-3 single-sourced parts pin the supplier histogram") {
    import spark.implicits._
    val li = Seq((1L, 11L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 13L))
      .toDF("l_partkey", "l_suppkey")
    val rows = byName("q417_single_source_risk").run(spark, plantDir("lineitem" -> li))
      .collect().map(r => r.getAs[Long]("n_suppliers") -> r).toMap
    assert(rows(1L).getAs[Long]("n_parts") == 2L)
    assert(math.abs(rows(1L).getAs[Double]("share") - 0.666667) < 1e-9)
    assert(rows(2L).getAs[Long]("n_parts") == 1L)
  }

  test("q418: a one-outlier price series pins CV = sqrt(2000)/120") {
    import spark.implicits._
    val li = ((1 to 5).map(_ => (1L, 1.0, 1.00)) ++
      (1 to 4).map(_ => (2L, 1.0, 1.00)) :+ (2L, 1.0, 2.00))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val rows = byName("q418_price_dispersion").run(spark, plantDir("lineitem" -> li)).collect()
    assert(rows.length == 2)
    val top = rows.head
    assert(top.getAs[Long]("part") == 2L)
    assert(top.getAs[Double]("mean_price") == 1.2)
    assert(top.getAs[Double]("price_cv") == 0.3727)
    assert(rows(1).getAs[Double]("price_cv") == 0.0)
    assert(rows(1).getAs[Double]("mean_price") == 1.0)
  }
}
