package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 44: q342 weekday ANOVA, q343
  * calendar gaps, q344 novelty decay.
  */
class CalendarSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_cl").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L // epoch day 19723
  private val day = 86400000L

  test("q342: a near-perfect two-week cycle matches the replicated eta2 and F") {
    import spark.implicits._
    import java.sql.Timestamp
    val xs = Seq(10, 11, 12, 13, 14, 15, 16, 12, 11, 12, 13, 14, 15, 16)
    var id = 0L
    val ev = xs.zipWithIndex.flatMap { case (c, dd) =>
      (1 to c).map { _ =>
        id += 1
        (id, new Timestamp(base + dd * day + id * 1000L), 1L, "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q342_weekday_eta2").run(spark, plantDir("events" -> ev)).head()
    // replicate: weekday of epoch day (19723+dd) is (1+dd) % 7
    val groups = xs.zipWithIndex.groupBy { case (_, dd) => (1 + dd) % 7 }
      .values.map(_.map(_._1.toDouble))
    val n = xs.size.toDouble
    val sx = xs.sum.toDouble
    val sxx = xs.map(x => x.toDouble * x).sum
    val ssbq = groups.map { g =>
      val dq = math.floor((g.sum / g.size - sx / n) * 1e3 + 0.5)
      dq * dq * g.size
    }.sum
    val sst = sxx - sx * sx / n
    val k = 7.0
    def r4(v: Double) = math.floor(v * 1e4 + 0.500001) / 1e4
    assert(r.getAs[Long]("n_days") == 14L)
    assert(r.getAs[Double]("eta2") == r4((ssbq / 1e6) / sst))
    assert(r.getAs[Double]("f_stat") ==
      r4(((ssbq / 1e6) / (k - 1)) / ((sst - ssbq / 1e6) / (n - k))))
  }

  test("q343: days {0,1,4,7} of the window give 4 missing with longest gap 2") {
    import spark.implicits._
    import java.sql.Timestamp
    val ev = Seq(0L, 1L, 4L, 7L).zipWithIndex.map { case (dd, i) =>
      (i.toLong + 1, new Timestamp(base + dd * day + i * 1000L), 1L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = byName("q343_calendar_gaps").run(spark, plantDir("events" -> ev)).head()
    assert(r.getAs[Long]("n_days") == 4L)
    assert(r.getAs[Long]("span_days") == 8L)
    assert(r.getAs[Long]("n_missing") == 4L)
    assert(r.getAs[Long]("longest_gap") == 2L)
    assert(math.abs(r.getAs[Double]("completeness") - 0.5) < 1e-9)
  }

  test("q344: the A B A B A journey repeats from the fifth decile on") {
    import spark.implicits._
    import java.sql.Timestamp
    val types = Seq("A", "B", "A", "B", "A")
    val ev = types.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, new Timestamp(base + i * 1000L), 1L, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = byName("q344_novelty_decay").run(spark, plantDir("events" -> ev))
      .collect().map(r => r.getAs[Long]("decile") -> r).toMap
    assert(rows.keySet == Set(1L, 3L, 5L, 7L, 9L))
    assert(rows(1L).getAs[Double]("repeat_share") == 0.0)
    assert(rows(3L).getAs[Double]("repeat_share") == 0.0)
    Seq(5L, 7L, 9L).foreach(dd =>
      assert(rows(dd).getAs[Double]("repeat_share") == 1.0))
  }
}
