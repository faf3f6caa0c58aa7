package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-fixture pins for the q244 Good–Turing table, the q245
  * log-rank test and the q246 DP sensitivity audit: each statistic is
  * hand-recomputed from first principles on a corpus small enough to
  * verify by eye.
  */
class GovernanceAuditSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gov").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  /** Each user's md5 arm, with the SAME hash the queries use. */
  private def arms(users: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    users.toDF("user_id").select(col("user_id"),
        (Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("q244: counts 3/2/1 yield the hand-computed Good-Turing table") {
    import spark.implicits._
    // tokens: a a a b b c  -> N1=N2=N3=1, N=6
    val docs = Seq((1L, "a a a b b c", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q244_good_turing")
      .run(spark, plantDir("documents" -> docs))
      .collect().map(r => r.getLong(0) -> r).toMap
    // r=0: unseen mass = N1/N = 1/6
    assert(rows(0L).getAs[Long]("n_next") == 1L)
    assert(math.abs(rows(0L).getAs[Double]("mass_share") - 1.0 / 6) < 1e-5)
    assert(rows(0L).isNullAt(rows(0L).fieldIndex("r_star")))
    // r=1: r* = 2*N2/N1 = 2; r=2: r* = 3*N3/N2 = 3; r=3: r* = 4*0/1 = 0
    assert(math.abs(rows(1L).getAs[Double]("r_star") - 2.0) < 1e-5)
    assert(math.abs(rows(2L).getAs[Double]("r_star") - 3.0) < 1e-5)
    assert(math.abs(rows(3L).getAs[Double]("r_star") - 0.0) < 1e-5)
    // observed mass shares: r*N_r/N = 1/6, 2/6, 3/6
    assert(math.abs(rows(1L).getAs[Double]("mass_share") - 1.0 / 6) < 1e-5)
    assert(math.abs(rows(3L).getAs[Double]("mass_share") - 3.0 / 6) < 1e-5)
    // r=4,5 empty
    assert(rows(4L).getAs[Long]("n_r") == 0L && rows(5L).getAs[Long]("n_r") == 0L)
  }

  test("q245: equal latency distributions score ~0; separated arms flag") {
    import spark.implicits._
    val armOf = arms(1L to 400L)
    val a0 = (1L to 400L).filter(armOf(_) == 0).take(20)
    val a1 = (1L to 400L).filter(armOf(_) == 1).take(20)
    val base = 1704067200000000L // µs
    def ev(users: Seq[Long], gapMin: Long) = users.zipWithIndex.flatMap {
      case (u, i) =>
        Seq((u * 10, new java.sql.Timestamp(base / 1000), u, "view", 1.0, "{}"),
          (u * 10 + 1,
            new java.sql.Timestamp((base + gapMin * 60000000L) / 1000),
            u, "view", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // identical 5-minute latency in both arms: O1 == E1 exactly
    val same = byName("q245_logrank")
      .run(spark, plantDir("events" -> (ev(a0, 5) union ev(a1, 5)))).head()
    assert(same.getAs[Long]("n_users") == 40L)
    assert(same.getAs[Long]("n_deaths") == 40L)
    assert(math.abs(same.getAs[Double]("e1") - same.getAs[Long]("o1")) < 1e-4)
    assert(!same.getAs[Boolean]("logrank_flag"), s"null case flagged: $same")
    // arm0 dies at minute 1, arm1 at minute 60: maximal separation
    val split = byName("q245_logrank")
      .run(spark, plantDir("events" -> (ev(a0, 1) union ev(a1, 60)))).head()
    assert(split.getAs[Boolean]("logrank_flag"), s"separated arms must flag: $split")
    assert(split.getAs[Double]("chi2") > 10.0)
  }

  test("q245: hand-computed two-user case matches the formula") {
    import spark.implicits._
    val armOf = arms(1L to 50L)
    val u0 = (1L to 50L).find(armOf(_) == 0).get
    val u1 = (1L to 50L).find(armOf(_) == 1).get
    val base = 1704067200000000L
    // u0's second event at minute 1, u1's at minute 2:
    //  t=1: n=2, n1=1, d=1, d1=1 -> e=0.5, v=0.25
    //  t=2: n=1, n1=0, d=1, d1=0 -> e=0,   v=0 (n=1 guard)
    // O1=1, E1=0.5, V=0.25 -> chi2 = 0.25/0.25 = 1
    val ev = Seq(
      (1L, new java.sql.Timestamp(base / 1000), u0, "view", 1.0, "{}"),
      (2L, new java.sql.Timestamp((base + 60000000L) / 1000), u0, "view", 1.0, "{}"),
      (3L, new java.sql.Timestamp(base / 1000), u1, "view", 1.0, "{}"),
      (4L, new java.sql.Timestamp((base + 120000000L) / 1000), u1, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q245_logrank").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("o1") == 1L)
    assert(math.abs(r.getAs[Double]("e1") - 0.5) < 1e-5)
    assert(math.abs(r.getAs[Double]("v") - 0.25) < 1e-5)
    assert(math.abs(r.getAs[Double]("chi2") - 1.0) < 1e-5)
  }

  test("q246: a 5-event user sets user-level sensitivity; event-level stays 1") {
    import spark.implicits._
    val base = new java.sql.Timestamp(1704067200000L)
    // user 1: five views; users 2..11: one view each -> max contrib 5, n=15
    val ev = ((1 to 5).map(i => (i.toLong, base, 1L, "view", 1.0, "{}")) ++
      (2 to 11).map(u => (u * 100L, base, u.toLong, "view", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q246_dp_sensitivity")
      .run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[String]("segment") -> r).toMap
    val v = rows("view")
    assert(v.getAs[Long]("n_events") == 15L)
    assert(v.getAs[Long]("n_users") == 11L)
    assert(v.getAs[Long]("max_user_contrib") == 5L)
    assert(math.abs(v.getAs[Double]("rel_noise_event") - 1.0 / 15) < 1e-5)
    assert(math.abs(v.getAs[Double]("rel_noise_user") - 5.0 / 15) < 1e-5)
    // __all__ folds the same frame: identical numbers here (one type)
    val all = rows("__all__")
    assert(all.getAs[Long]("max_user_contrib") == 5L)
  }
}
