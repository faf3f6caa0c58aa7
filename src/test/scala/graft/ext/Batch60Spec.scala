package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 60: q411 price elasticity, q412
  * brand basket lift, q413 shipping delay, q414 discount response.
  */
class Batch60Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b60").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q411: quantity halving as price doubles pins elasticity -1, R2 = 1") {
    import spark.implicits._
    // constant line total 64.00: q doubles, unit price halves
    val li = Seq((1.0, 64.00), (2.0, 64.00), (4.0, 64.00), (8.0, 64.00))
      .toDF("l_quantity", "l_extendedprice")
    val r = byName("q411_price_elasticity").run(spark, plantDir("lineitem" -> li)).head()
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("elasticity") == -1.0)
    assert(r.getAs[Double]("r2") == 1.0)
    assert(r.getAs[Double]("se_elasticity") < 1e-4)
  }

  test("q412: brands always bought together in half the orders pin lift 2") {
    import spark.implicits._
    val part = Seq((1L, "BrandA"), (2L, "BrandB"), (3L, "BrandC"))
      .toDF("p_partkey", "p_brand")
    val li = ((1L to 5L).flatMap(ok => Seq((ok, 1L), (ok, 2L))) ++
      (6L to 10L).map(ok => (ok, 3L)))
      .toDF("l_orderkey", "l_partkey")
    val rows = byName("q412_brand_lift")
      .run(spark, plantDir("lineitem" -> li, "part" -> part)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("brand_a") == "BrandA")
    assert(rows.head.getAs[String]("brand_b") == "BrandB")
    assert(rows.head.getAs[Long]("n_both") == 5L)
    // 5 co-orders * 10 total / (5 * 5)
    assert(rows.head.getAs[Double]("lift") == 2.0)
  }

  test("q413: urgent 10/20-day lines and one 100-day high line pin the grid stats") {
    import spark.implicits._
    val day = 86400000L
    val t0 = 1704067200000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val orders = Seq((1L, ts(t0), "1-URGENT"), (2L, ts(t0), "2-HIGH"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq((1L, ts(t0 + 10 * day)), (1L, ts(t0 + 20 * day)),
      (2L, ts(t0 + 100 * day)))
      .toDF("l_orderkey", "l_shipdate")
    val rows = byName("q413_ship_delay")
      .run(spark, plantDir("lineitem" -> li, "orders" -> orders)).collect()
      .map(r => r.getAs[String]("priority") -> r).toMap
    val u = rows("1-URGENT")
    assert(u.getAs[Double]("mean_days") == 15.0)
    assert(u.getAs[Long]("p50_days") == 10L)
    assert(u.getAs[Long]("p90_days") == 20L)
    assert(u.getAs[Double]("over_90d_share") == 0.0)
    val h = rows("2-HIGH")
    assert(h.getAs[Long]("p50_days") == 100L)
    assert(h.getAs[Double]("over_90d_share") == 1.0)
  }

  test("q414: a 10% discount level with double quantity pins lift 2 and exact revenue") {
    import spark.implicits._
    val li = Seq((0.0, 2.0, 10.00), (0.0, 2.0, 10.00), (0.10, 4.0, 10.00))
      .toDF("l_discount", "l_quantity", "l_extendedprice")
    val rows = byName("q414_discount_response").run(spark, plantDir("lineitem" -> li))
      .collect().map(r => r.getAs[Long]("disc_pct") -> r).toMap
    assert(rows(0L).getAs[Double]("avg_qty") == 2.0)
    assert(rows(0L).getAs[Double]("gross_revenue") == 20.0)
    assert(rows(0L).getAs[Double]("qty_lift_vs_0") == 1.0)
    assert(rows(10L).getAs[Double]("avg_qty") == 4.0)
    assert(rows(10L).getAs[Double]("gross_revenue") == 10.0)
    assert(rows(10L).getAs[Double]("qty_lift_vs_0") == 2.0)
  }
}
