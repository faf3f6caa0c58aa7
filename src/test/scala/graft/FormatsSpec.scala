package graft

import org.apache.spark.sql.functions._

/** File-format source/sink coverage (SURVEY.md §2.2 row 1): the engine
  * reads and writes parquet, csv, json and orc with value fidelity —
  * exercised as round trips against the parquet ground truth. */
class FormatsSpec extends SparkSpec {

  private lazy val base = Tables.lineitem(spark, sf())
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_returnflag", "l_shipdate")

  private def out(fmt: String) = s"target/formats/$fmt"

  private def roundTrip(fmt: String,
      opts: Map[String, String] = Map.empty): Unit = {
    base.write.mode("overwrite").options(opts).format(fmt).save(out(fmt))
    val back = spark.read.options(opts).format(fmt)
      .schema(base.schema) // fixed, declared schemas — nothing inferred
      .load(out(fmt))
    val a = base.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    val b = back.orderBy("l_orderkey", "l_linenumber").collect().toSeq
    assert(a == b, s"$fmt round trip diverged")
  }

  test("csv round trip preserves values") {
    roundTrip("csv", Map("header" -> "true", "timestampFormat" ->
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"))
  }

  test("json round trip preserves values") { roundTrip("json") }

  test("orc round trip preserves values") { roundTrip("orc") }

  test("partitioned parquet write prunes partitions on read") {
    val dir = out("parquet_part")
    base.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() == base.filter(col("l_returnflag") === "A").count())
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"partition filter not pushed:\n$plan")
  }
}
