package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted pins for q438: hand-computed overlap-pair counts including
  * the inclusive-boundary tie (end == start IS overlap), the
  * duplicate-interval multiset case, and a brute-force equality
  * property on random-ish intervals — the sweep identity
  * C(n,2) − Σ ends-before-starts must equal the quadratic count. */
class IntervalsSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_iv").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def ts(day: Int) = java.sql.Timestamp.valueOf(f"1995-01-${day}%02d 00:00:00")

  /** lineitem+orders fixture from (supp, orderDay, shipDay) triples. */
  private def plant(ivs: Seq[(Long, Int, Int)]): String = {
    import spark.implicits._
    val li = ivs.zipWithIndex.map { case ((supp, _, sd), i) =>
      (i.toLong + 1, supp, ts(sd))
    }.toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val or = ivs.zipWithIndex.map { case ((_, od, _), i) =>
      (i.toLong + 1, ts(od))
    }.toDF("o_orderkey", "o_orderdate")
    plantDir("lineitem" -> li, "orders" -> or)
  }

  test("q438: hand-computed counts, inclusive-boundary tie counts as overlap") {
    // supp 1: [1,5], [5,9] (touch at day 5 -> overlap), [10,12] (disjoint)
    //   pairs = 1;  supp 2: duplicates [2,3], [2,3], [2,3] -> C(3,2) = 3
    val rows = byName("q438_interval_overlap").run(spark, plant(Seq(
      (1L, 1, 5), (1L, 5, 9), (1L, 10, 12),
      (2L, 2, 3), (2L, 2, 3), (2L, 2, 3)))).collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("supp") == 1L)
    assert(rows(0).getAs[Long]("n_ship") == 3L)
    assert(rows(0).getAs[Long]("overlap_pairs") == 1L)
    assert(rows(1).getAs[Long]("supp") == 2L)
    assert(rows(1).getAs[Long]("overlap_pairs") == 3L)
  }

  test("q438: sweep count equals brute force on 120 deterministic intervals") {
    val ivs = (0 until 120).map { i =>
      val supp = (i % 4).toLong + 1
      val start = 1 + (i * 7) % 20
      (supp, start, start + 1 + (i * 3) % 8)
    }
    val got = byName("q438_interval_overlap").run(spark, plant(ivs)).collect()
      .map(r => r.getAs[Long]("supp") -> r.getAs[Long]("overlap_pairs")).toMap
    // index pairs, not .combinations (which dedups equal elements and
    // would undercount duplicate intervals — the multiset matters)
    val brute = ivs.groupBy(_._1).map { case (supp, xs) =>
      supp -> (for {
        i <- xs.indices; j <- (i + 1) until xs.size
        if xs(j)._2 <= xs(i)._3 && xs(i)._2 <= xs(j)._3
      } yield 1).size.toLong
    }
    assert(got == brute)
    assert(brute.values.sum > 0)
  }

  test("q441: holds weight the average by duration, not event count") {
    import spark.implicits._
    // user 1: value 10 held 3 s, then value 100 held 1 s (then a final
    // event that holds nothing) -> twa = (10*3 + 100*1)/4 = 32.5,
    // where the plain mean of the two held values would be 55
    val base = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime
    def ev(id: Long, offSec: Int, v: Double) =
      (id, new java.sql.Timestamp(base + offSec * 1000L), 1L, "t", v, "{}")
    val rows = Seq(ev(1, 0, 10.0), ev(2, 3, 100.0), ev(3, 4, 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_twa").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = byName("q441_time_weighted_avg").run(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_holds") == 2L)
    assert(r.head.getAs[Long]("span_s") == 4L)
    assert(r.head.getAs[Double]("twa_value") == 32.5)
  }

  test("q438: out-of-1995 shipments and inverted windows are excluded") {
    import spark.implicits._
    val li = Seq(
      (1L, 1L, ts(5)),                                              // kept
      (2L, 1L, java.sql.Timestamp.valueOf("1996-03-01 00:00:00")),  // out of slice
      (3L, 1L, ts(2))                                               // inverted (order after ship)
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val or = Seq((1L, ts(1)), (2L, ts(1)), (3L, ts(9)))
      .toDF("o_orderkey", "o_orderdate")
    val rows = byName("q438_interval_overlap")
      .run(spark, plantDir("lineitem" -> li, "orders" -> or)).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_ship") == 1L)
    assert(rows.head.getAs[Long]("overlap_pairs") == 0L)
  }
}
