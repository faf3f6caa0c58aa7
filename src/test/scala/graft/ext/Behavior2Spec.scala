package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 26: q279 Burrows' Delta, q280
  * last-touch attribution, q281 conversion lag. Hand-derived
  * expectations.
  */
class Behavior2Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q279: three 2-token sources give hand-computable z-scores and Deltas") {
    import spark.implicits._
    // rates ppb: a=(2/3,1/3), b=(1/3,2/3), c=(1/2,1/2) over tokens x,y
    // per-token mean is exactly 5e8, sd exactly 166666667 -> z in {±1,0}
    // Delta(a,b)=2, Delta(a,c)=Delta(b,c)=1
    val docs = Seq(
      (1L, "x x y", "en", "a", 5L),
      (2L, "x y y", "en", "b", 5L),
      (3L, "x y", "en", "c", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q279_burrows_delta").run(spark, plantDir("documents" -> docs))
      .collect()
    assert(rows.length == 3)
    val m = rows.map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
      r.getAs[Double]("delta")).toMap
    assert(math.abs(m(("a", "c")) - 1.0) < 1e-6)
    assert(math.abs(m(("b", "c")) - 1.0) < 1e-6)
    assert(math.abs(m(("a", "b")) - 2.0) < 1e-6)
    // sorted ascending by delta: the (a,b)=2 pair comes last
    assert(rows.last.getAs[String]("src_a") == "a" &&
      rows.last.getAs[String]("src_b") == "b")
  }

  test("q280: 30-minute attribution horizon splits credit between view and (none)") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    def ts(minutes: Long) = new Timestamp(base + minutes * 60000L)
    val ev = Seq(
      // u1: view@0 -> purchase@10 credited 'view'; purchase@40 is 40min
      // after the only non-purchase touch -> '(none)'
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "purchase", 1.0, "{}"),
      (3L, ts(40), 1L, "purchase", 1.0, "{}"),
      // u2: purchase with no prior touch at all -> '(none)'
      (4L, ts(5), 2L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q280_last_touch").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[String]("attributed_type") -> r).toMap
    assert(rows.keySet == Set("view", "(none)"))
    assert(rows("view").getAs[Long]("n_credited") == 1L)
    assert(rows("(none)").getAs[Long]("n_credited") == 2L)
    assert(math.abs(rows("view").getAs[Double]("credit_share") - 0.3333) < 1e-9)
    assert(math.abs(rows("(none)").getAs[Double]("credit_share") - 0.6667) < 1e-9)
  }

  test("q281: two converters out of three signups pin rate and exact-rank lags") {
    import spark.implicits._
    import java.sql.Timestamp
    val base = 1704067200000L
    def ts(seconds: Long) = new Timestamp(base + seconds * 1000L)
    val ev = Seq(
      (1L, ts(0), 1L, "signup", 1.0, "{}"),
      (2L, ts(90), 1L, "purchase", 1.0, "{}"),   // lag 90s -> minute bucket 1
      (3L, ts(0), 2L, "signup", 1.0, "{}"),       // never converts
      (4L, ts(0), 3L, "signup", 1.0, "{}"),
      (5L, ts(30), 3L, "purchase", 1.0, "{}"))    // lag 30s -> bucket 0
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q281_conversion_lag").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_signups") == 3L)
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(math.abs(r.getAs[Double]("conv_rate") - 0.6667) < 1e-9)
    // p50 rank = (2+1)//2 = 1 -> first bucket (0); p95 rank = 2 -> bucket 1
    assert(r.getAs[Long]("p50_lag_min") == 0L)
    assert(r.getAs[Long]("p95_lag_min") == 1L)
  }
}
