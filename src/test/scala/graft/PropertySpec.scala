package graft

import graft.functions.{AnomalyAggregator, ForecastAggregator}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.3) — raw ScalaCheck
  * generators driven deterministically (the scalatest bridge artifact is
  * not in the offline cache). */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val series: Gen[List[Double]] =
    Gen.listOfN(60, Gen.chooseNum(-1000.0, 1000.0))

  test("M1 never flags during warm-up, for any series") {
    for {
      xs <- samples(series, 40)
      minTrain <- Seq(1, 3, 17, 50)
    } {
      val agg = new AnomalyAggregator(minTrain, 95.0)
      val reports = xs.scanLeft(agg.zero)(agg.reduce).tail.map(agg.finish)
      assert(reports.take(minTrain).forall(!_.is_anomaly))
    }
  }

  test("M1 n_training counts exactly the prior points") {
    samples(series, 40).foreach { xs =>
      val agg = new AnomalyAggregator(5, 95.0)
      val reports = xs.scanLeft(agg.zero)(agg.reduce).tail.map(agg.finish)
      reports.zipWithIndex.foreach { case (r, i) => assert(r.n_training == i) }
    }
  }

  test("M2 bounds always contain the point forecast") {
    for {
      xs <- samples(series, 40)
      horizon <- Seq(1, 3)
    } {
      val agg = new ForecastAggregator(3, horizon, 95.0)
      val b = xs.zipWithIndex.foldLeft(agg.zero) { case (s, (v, i)) =>
        agg.reduce(s, (i.toDouble, v))
      }
      val rows = agg.finish(b)
      assert(rows.length == horizon)
      rows.foreach { row =>
        assert(row.lower_bound <= row.forecast_value &&
          row.forecast_value <= row.upper_bound)
      }
    }
  }

  test("M1 merge associativity: (a+b)+c ~ a+(b+c)") {
    val triples = samples(Gen.zip(series, series, series), 30)
    triples.foreach { case (a, b, c) =>
      val agg = new AnomalyAggregator(5, 95.0)
      def fold(xs: Seq[Double]) = xs.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(fold(a), fold(b)), fold(c))
      val right = agg.merge(fold(a), agg.merge(fold(b), fold(c)))
      assert(left.prior.n == right.prior.n)
      assert(math.abs(left.prior.mean - right.prior.mean) <=
        1e-9 * (1 + math.abs(left.prior.mean)))
      assert(left.last == right.last && left.hasLast == right.hasLast)
    }
  }

  test("window-avg of a constant series is that constant") {
    val sql = spark
    import sql.implicits._
    samples(Gen.zip(Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(2, 40)), 8)
      .foreach { case (c, n) =>
        val df = (0 until n).map(i =>
          (1, new java.sql.Timestamp(1704067200000L + i * 1000L), c))
          .toDF("k", "ts", "v")
        val avgs = ops.Health.windowedAvg(df, "k", "ts", "v", "10 seconds")
          .select("avg_value").collect().map(_.getDouble(0))
        assert(avgs.forall(_ == c))
      }
  }

  test("Welford state equals two-pass moments") {
    samples(series, 40).foreach { xs =>
      val w = xs.foldLeft(functions.WelfordState(0, 0, 0))(_.add(_))
      val mean = xs.sum / xs.size
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum
      assert(math.abs(w.mean - mean) <= 1e-9 * (1 + math.abs(mean)))
      assert(math.abs(w.m2 - m2) <= 1e-6 * (1 + m2))
    }
  }

  test("explode . collect_list round-trips arrays (X2 identity)") {
    val sql = spark
    import sql.implicits._
    samples(Gen.listOfN(20, Gen.listOf(Gen.chooseNum(-50, 50))), 5)
      .foreach { lists =>
        val df = lists.zipWithIndex.map { case (l, i) => (i.toLong, l) }
          .toDF("id", "arr")
        val roundTrip = df
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.explode_outer(
              org.apache.spark.sql.functions.col("arr")).as("x"))
          .groupBy("id")
          .agg(org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.collect_list("x")).as("arr2"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
        lists.zipWithIndex.foreach { case (l, i) =>
          assert(roundTrip(i.toLong) == l.sorted)
        }
      }
  }
}
