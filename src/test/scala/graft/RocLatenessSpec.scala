package graft

import org.apache.spark.sql.functions._

/** Planted-fixture pins for the q259 ROC operating points and the
  * q260 event-lateness audit.
  */
class RocLatenessSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rl").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q259: hand-built corpus yields exact confusion cells per threshold") {
    import spark.implicits._
    // en 'a b' score 1.0; en 'a a' score 0.5; de 'a b c' score 1.0
    val docs = Seq(
      (1L, "a b", "en", "web", 3L),
      (2L, "a a", "en", "web", 3L),
      (3L, "a b c", "de", "web", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q259_roc_points")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getAs[Long]("threshold_micro") -> r).toMap
    assert(rows.size == 21)
    val t0 = rows(0L) // everything positive
    assert(t0.getAs[Long]("tp") == 2L && t0.getAs[Long]("fp") == 1L)
    assert(math.abs(t0.getAs[Double]("tpr") - 1.0) < 1e-6)
    assert(math.abs(t0.getAs[Double]("fpr") - 1.0) < 1e-6)
    val t75 = rows(750000L) // only the two 1.0-diversity docs pass
    assert(t75.getAs[Long]("tp") == 1L && t75.getAs[Long]("fp") == 1L)
    assert(t75.getAs[Long]("fn") == 1L && t75.getAs[Long]("tn") == 0L)
    assert(math.abs(t75.getAs[Double]("youden_j") - (0.5 - 1.0)) < 1e-5)
    val t50 = rows(500000L) // the 0.5 doc is included at its own score
    assert(t50.getAs[Long]("tp") == 2L && t50.getAs[Long]("fp") == 1L)
  }

  test("q260: one out-of-order event is caught with its exact lateness") {
    import spark.implicits._
    val base = 1704067200000L // ms
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    // arrival (event_id) order: t0, t0+10m, t0+5m (late by 5m), t0+20m
    val ev = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "view", 1.0, "{}"),
      (3L, ts(5), 1L, "view", 1.0, "{}"),
      (4L, ts(20), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q260_lateness_audit")
      .run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_events") == 4L)
    assert(r.getAs[Long]("n_late") == 1L)
    assert(math.abs(r.getAs[Double]("late_share") - 0.25) < 1e-6)
    assert(r.getAs[Long]("p50_late_min") == 5L)
    assert(r.getAs[Long]("p95_late_min") == 5L)
  }
}
