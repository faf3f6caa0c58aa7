package graft

import org.apache.spark.sql.functions._

/** SQL-surface extension functions + bucketed co-located joins. */
class ExtensionsBucketingSpec extends SparkSpec {

  test("dot_product is callable from SQL after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head.getDouble(0)
    assert(r == 32.0)
  }

  test("ml_detect_anomalies runs as a SQL window function") {
    GraftExtensions.install(spark)
    Tables.events(spark, sf()).createOrReplaceTempView("ev")
    val flagged = spark.sql("""
      SELECT user_id, value,
        ml_detect_anomalies(value) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS report
      FROM ev""")
    assert(flagged.select("report.is_anomaly").count() > 0)
    assert(flagged.filter(col("report.n_training") < 30 && col("report.is_anomaly"))
      .count() == 0)
  }

  test("optimizer rule rewrites the HOF dot-product pattern to DotProduct") {
    val fresh = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession() // else getOrCreate reuses it
      org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    }
    try {
      val df = fresh.sql("""
        SELECT id, aggregate(zip_with(v, v, (x, y) -> x * y),
          0.0d, (s, v) -> s + v) AS d
        FROM (SELECT id, array(CAST(id AS DOUBLE), 2.0d) AS v FROM range(4))""")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("dotproduct"),
        s"rewrite did not fire:\n$optimized")
      assert(df.collect().map(_.getDouble(1)).sorted.toSeq ==
        Seq(4.0, 5.0, 8.0, 13.0)) // id² + 4
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }

  test("DotProduct is nullable even over non-nullable children") {
    // length mismatch yields NULL regardless of child nullability; if
    // this ever inherits BinaryExpression's child-OR default, codegen
    // emits `false = true;` for non-nullable inputs and every projection
    // containing it silently drops to interpreted mode
    import org.apache.spark.sql.functions.{array, lit}
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.GraftShim.expression(array(lit(1.0), lit(2.0))),
      org.apache.spark.sql.GraftShim.expression(array(lit(3.0))))
    assert(e.nullable)
    val out = spark.range(1).select(
      org.apache.spark.sql.GraftShim.column(e).as("d")).head
    assert(out.isNullAt(0)) // mismatched lengths -> NULL, not garbage
  }

  test("withExtensions session resolves dot_product at plan time") {
    val fresh = {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession() // else getOrCreate reuses it
      val s = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      s
    }
    try {
      val v = fresh.sql("SELECT dot_product(array(2.0d), array(8.0d)) AS d")
        .head.getDouble(0)
      assert(v == 16.0)
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
    }
  }

  test("bucketed tables join without a shuffle and match the plain join") {
    val sql = spark
    import sql.implicits._
    Seq("li_b", "or_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity")
    val or = Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    or.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("or_b")
    // hint away the auto-broadcast (tiny test tables) so the bucketed
    // sort-merge path is what's being exercised
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("or_b"), $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    val expected = li.join(or, $"l_orderkey" === $"o_orderkey").count()
    assert(joined.count() == expected)
  }
}
