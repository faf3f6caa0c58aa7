package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 36: q317 matrix profile, q318
  * audience overlap, q319 semivariogram.
  */
class ProfileSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_pf").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L // epoch day 19723
  private val day = 86400000L

  test("q317: three identical weeks are zero-distance motifs; the odd week is the discord") {
    import spark.implicits._
    import java.sql.Timestamp
    val shape = Seq(2, 3, 5, 8, 5, 3, 2)
    val odd = Seq(9, 2, 9, 2, 9, 2, 9)
    val series = shape ++ shape ++ odd ++ shape
    var id = 0L
    val ev = series.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q317_matrix_profile").run(spark, plantDir("events" -> ev))
      .collect()
    assert(rows.length == 6)
    val motifs = rows.filter(_.getAs[String]("kind") == "motif")
    // week starts 19723, 19730, 19744 match each other exactly
    assert(motifs.map(_.getAs[Long]("window_day")).toSet ==
      Set(19723L, 19730L, 19744L))
    motifs.foreach(m => assert(m.getAs[Double]("znorm_dist") == 0.0))
    val discords = rows.filter(_.getAs[String]("kind") == "discord")
    discords.foreach(dc => assert(dc.getAs[Double]("znorm_dist") > 0.5))
  }

  test("q318: shared-user pairs pin Jaccard 1/3, cosine 1/2, lift 1") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq((1L, "A"), (1L, "B"), (2L, "A"), (3L, "B"), (3L, "C"), (4L, "C"))
      .zipWithIndex.map { case ((u, t), i) =>
        (i.toLong + 1, new Timestamp(base + i * 1000L), u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q318_audience_overlap").run(spark, plantDir("events" -> ev))
      .collect()
    // zero-overlap pairs (A,C) are omitted by the inner join
    assert(rows.map(r => (r.getAs[String]("ta"), r.getAs[String]("tb"))).toSeq ==
      Seq(("A", "B"), ("B", "C")))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") == 1L)
      assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3) < 1e-6)
      assert(math.abs(r.getAs[Double]("cosine") - 0.5) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift") - 1.0) < 1e-9)
    }
  }

  test("q319: the ramp 1..5 pins gamma(h) = h^2 * (5-h) pairs arithmetic") {
    import spark.implicits._
    import java.sql.Timestamp
    var id = 0L
    val ev = (1 to 5).zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q319_semivariogram").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("lag") -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    // gamma(h) = h^2/2 for a unit ramp; sill = 2.5
    val exp = Map(1L -> 0.5, 2L -> 2.0, 3L -> 4.5, 4L -> 8.0)
    exp.foreach { case (h, g) =>
      assert(math.abs(rows(h).getAs[Double]("gamma") - g) < 1e-9)
      assert(math.abs(rows(h).getAs[Double]("gamma_over_sill") - g / 2.5) < 1e-4)
    }
    assert(rows(1L).getAs[Long]("n_pairs") == 4L)
  }
}
