package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native asof_lookup expression: agreement with the HOF
  * spelling it replaces on randomized data (both key families: long
  * timestamps and int-backed dates), hand-checked edges (empty array,
  * before-first, exact hit, tie groups), SQL registration, and the
  * codegen path actually compiling (default sessions run whole-stage
  * codegen — a doGenCode bug would either fail the run or silently
  * fall back and diverge under `codegenFallback=false`). */
class AsOfLookupSpec extends SparkSpec {

  test("randomized agreement with the HOF filter+element_at spelling") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rows = (1 to 300).map { i =>
      val n = rnd.nextInt(12) // 0..11 quotes, empty arrays included
      val arr = Seq.fill(n)((rnd.nextInt(1000).toLong, rnd.nextInt(100)))
      (i.toLong, arr.sorted, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("id", "bs0", "key")
      .withColumn("bs", expr("transform(bs0, x -> struct(x._1 AS ts, x._2 AS v))"))
      .localCheckpoint()
    val hof = df.withColumn("hits",
        filter(col("bs"), x => x("ts") <= col("key")))
      .withColumn("m",
        when(size(col("hits")) > 0, element_at(col("hits"), size(col("hits")))))
      .select(col("id"), col("m.ts").as("mts"), col("m.v").as("mv"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2))))).toSet
    val native = df.withColumn("m",
        TemporalFunctions.asofLookup(col("bs"), col("key")))
      .select(col("id"), col("m.ts").as("mts"), col("m.v").as("mv"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getInt(2))))).toSet
    assert(native == hof)
    assert(native.exists(_._2.isDefined) && native.exists(_._2.isEmpty))
  }

  test("edges: empty, before-first, exact hit, tie resolved to last") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[(Long, Int)], 500L),             // empty → null
      (2L, Seq((100L, 1), (200L, 2)), 50L),           // before first → null
      (3L, Seq((100L, 1), (200L, 2)), 200L),          // exact hit → (200, 2)
      (4L, Seq((100L, 1), (100L, 7), (300L, 3)), 150L) // tie → last (100, 7)
    ).toDF("id", "bs0", "key")
      .withColumn("bs", expr("transform(bs0, x -> struct(x._1 AS ts, x._2 AS v))"))
    val out = df.withColumn("m",
        TemporalFunctions.asofLookup(col("bs"), col("key")))
      .orderBy("id")
      .select(col("m.ts"), col("m.v")).collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getLong(0) == 200L && out(2).getInt(1) == 2)
    assert(out(3).getLong(0) == 100L && out(3).getInt(1) == 7)
  }

  test("date-keyed (int-backed) arrays and the SQL surface") {
    graft.GraftExtensions.install(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq("2024-01-31" -> 10.0, "2024-02-29" -> 20.0), "2024-02-15"),
      (2L, Seq("2024-01-31" -> 10.0, "2024-02-29" -> 20.0), "2024-03-01"),
      (3L, Seq("2024-01-31" -> 10.0), "2024-01-01")
    ).toDF("id", "bs0", "key0")
      .withColumn("bs", expr(
        "transform(bs0, x -> struct(CAST(x._1 AS DATE) AS d, x._2 AS v))"))
      .withColumn("key", col("key0").cast("date"))
    df.createOrReplaceTempView("asof_lookup_t")
    val out = spark.sql(
      "SELECT id, asof_lookup(bs, key).v AS v FROM asof_lookup_t ORDER BY id")
      .collect()
    assert(out(0).getDouble(1) == 10.0)
    assert(out(1).getDouble(1) == 20.0)
    assert(out(2).isNullAt(1))
  }
}
