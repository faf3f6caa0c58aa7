package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-fixture pins for the q256 QTE deciles, the q257 dedup
  * savings curve and the q258 IVF probe-recall curve.
  */
class TuningCurvesSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tc").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def arms(users: Seq[Long]): Map[Long, Long] = {
    import spark.implicits._
    users.toDF("user_id").select(col("user_id"),
        (Dedup.h60(concat(lit("ab|"), col("user_id").cast("string"))) % 2)
          .as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("q256: staircase arm vs constant arm gives qte_events = d - 5") {
    import spark.implicits._
    val armOf = arms(1L to 400L)
    val a0 = (1L to 400L).filter(armOf(_) == 0).take(10)
    val a1 = (1L to 400L).filter(armOf(_) == 1).take(10)
    val base = new java.sql.Timestamp(1704067200000L)
    // arm0 user i has i events (counts 1..10); arm1 users all have 5
    val ev = (a0.zipWithIndex.flatMap { case (u, i) =>
      (0 to i).map(j => (u * 100 + j, base, u, "view", 1.0, "{}"))
    } ++ a1.flatMap { u =>
      (0 until 5).map(j => (u * 100 + j, base, u, "view", 1.0, "{}"))
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q256_qte_activity")
      .run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    (1L to 9L).foreach { dd =>
      val r = rows(dd)
      assert(r.getAs[Long]("events_a") == dd, s"decile $dd: $r")
      assert(r.getAs[Long]("events_b") == 5L, s"decile $dd: $r")
      assert(r.getAs[Long]("qte_events") == dd - 5L, s"decile $dd: $r")
    }
  }

  test("q257: one verbatim duplicate pair fires at every threshold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "en", "web", 11L),
      (2L, "a b c d e f", "en", "web", 11L),
      (3L, "x y z w q r", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q257_dedup_threshold_curve")
      .run(spark, plantDir("documents" -> docs)).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == 1L, s"$r")
      assert(r.getAs[Long]("n_dropped_docs") == 1L, s"$r")
      assert(r.getAs[Long]("tokens_dropped") == 6L, s"$r")
      assert(math.abs(r.getAs[Double]("savings_share") - 6.0 / 18) < 1e-5, s"$r")
    }
  }

  test("q258: 5 one-hot vectors -> recall staircase (t-1)/10") {
    import spark.implicits._
    // n=5 <= k: every vector is its own (and nearest) centroid, so a
    // probe's rank-1 cell is itself and its 4 neighbors' cells occupy
    // ranks 2..5 in some order: n_hits(t) = 5*(t-1) exactly
    val emb = (0 until 5).map { i =>
      (i.toLong, Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val rows = byName("q258_ivf_probe_recall")
      .run(spark, plantDir("embeddings" -> emb))
      .collect().map(r => r.getAs[Long]("nprobe") -> r).toMap
    (1L to 4L).foreach { t =>
      assert(rows(t).getAs[Long]("n_hits") == 5 * (t - 1), s"t=$t: ${rows(t)}")
      assert(math.abs(rows(t).getAs[Double]("recall_at_10") - (t - 1) / 10.0)
        < 1e-5, s"t=$t: ${rows(t)}")
    }
  }
}
