package graft

import org.apache.spark.sql.functions._

/** Invariants + brute-force twins for the sweep-line concurrency and
  * rank-sum AUC operators (value parity vs DuckDB is the oracle
  * gate's job). */
class SweepAucSpec extends SparkSpec {

  test("q158: peak matches brute-force point-in-interval counting") {
    val rows = Registry.queries("q158_peak_concurrency")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("peak_concurrency"),
          r.getAs[Long]("peak_at_micros"))).toMap
    val evs = Tables.events(spark, sf())
      .select(col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = evs.groupBy(_._1)
    byType.foreach { case (tpe, xs) =>
      val starts = xs.map(_._2)
      // concurrency can only change at a boundary; max over starts
      // suffices for half-open [s, s+300s) intervals
      val brute = starts.map(p =>
        starts.count(s => s <= p && p < s + 300000000L)).max
      val (n, peak, at) = rows(tpe)
      assert(n == xs.length)
      assert(peak == brute, s"$tpe: sweep says $peak, brute force $brute")
      // the reported instant really sustains the peak
      assert(starts.count(s => s <= at && at < s + 300000000L) == peak)
    }
  }

  test("q159: AUC matches brute-force pair counting, and bounds hold") {
    val rows = Registry.queries("q159_pc1_auc")(spark, sf())
      .collect().map(r => r.get(0) ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Long]("u2"), r.getAs[Long]("auc_micro"))).toMap
    val total = Tables.embeddings(spark, sf()).count()
    assert(rows.values.map(_._1).sum == total)
    rows.foreach { case (l, (np, nn, u2, auc)) =>
      assert(np + nn == total, s"$l: one-vs-rest must cover the corpus")
      assert(u2 <= 2 * np * nn)
      assert(auc >= 0 && auc <= 1000000)
      assert(auc == u2 * 1000000 / (2 * np * nn))
    }
    // brute-force 2U for one label: 2*(wins) + ties over all pos/neg pairs
    val raw = Tables.embeddings(spark, sf())
      .select(col("label"), col("embedding")).collect()
    val label0 = rows.keys.map(_.toString).min
    // recompute the projection exactly as the query defines it
    val vq = Registry.queries("q152_pca_power")(spark, sf())
      .collect().sortBy(_.getInt(0)).map(_.getLong(1))
    def score(emb: Seq[Float]): Long =
      emb.zip(vq).map { case (x, w) =>
        math.floor(x.toDouble * 10000.0 + 0.500001).toLong * w }.sum
    val pos = raw.filter(_.get(0).toString == label0).map(r => score(r.getSeq[Float](1)))
    val neg = raw.filter(_.get(0).toString != label0).map(r => score(r.getSeq[Float](1)))
    val brute = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val got = rows.collectFirst { case (k, v) if k.toString == label0 => v._3 }.get
    assert(got == brute, s"u2 for $label0: query $got, brute force $brute")
  }
}
