package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the PCA power-iteration operator (value parity vs
  * DuckDB is covered by the oracle gate; these pin merge-order
  * independence and that the integer iteration tracks the true
  * dominant direction). */
class SpectralSpec extends SparkSpec {

  test("q152: unit-scale output, and direction matches a double-precision power iteration") {
    val out = Registry.queries("q152_pca_power")(spark, sf())
      .collect().sortBy(_.getInt(0)).map(_.getLong(1).toDouble)
    assert(out.length == 64)
    assert(out.map(math.abs).max == 1000000.0,
      "rescale must pin the max-abs component to exactly 1e6")
    // double-precision reference: same quantized inputs, plain floats
    val rows = Tables.embeddings(spark, sf())
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(f =>
        math.floor(f.toDouble * 10000.0 + 0.500001)).toArray)
    val n = rows.length.toDouble
    val s = Array.tabulate(64)(i => rows.map(_(i)).sum)
    val c = Array.tabulate(64, 64)((i, j) =>
      n * rows.map(r => r(i) * r(j)).sum - s(i) * s(j))
    var v = Array.fill(64)(1.0)
    for (_ <- 1 to 200) { // run to convergence — direction test
      val w = Array.tabulate(64)(i => (0 until 64).map(j => c(i)(j) * v(j)).sum)
      val m = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / m)
    }
    val dot = out.zip(v).map { case (a, b) => a * b }.sum
    val cos = math.abs(dot) / math.sqrt(out.map(x => x * x).sum)
    assert(cos > 0.98,
      f"integer 5-step iterate diverged from the converged dominant direction (cos=$cos%.4f)")
  }

  test("q154: projection profile conserves the corpus and orders its bounds") {
    val rows = Registry.queries("q154_pca_projection")(spark, sf()).collect()
    val total = Tables.embeddings(spark, sf()).count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == total,
      "every vector must land in exactly one label row")
    rows.foreach { r =>
      val (n, sum, mean, mn, mx) = (r.getAs[Long]("n_vectors"),
        r.getAs[Long]("sum_proj"), r.getAs[Long]("mean_proj"),
        r.getAs[Long]("min_proj"), r.getAs[Long]("max_proj"))
      assert(mn <= mean && mean <= mx, s"label ${r.get(0)}: bounds disordered")
      assert(mean == sum / n, "mean must be the truncating integer division")
      assert(mx.abs <= 64L * 10001 * 1000000, "projection exceeded its algebraic bound")
    }
  }

  test("q156: shares are a near-partition of unity and pc1 beats the mean dim") {
    val rows = Registry.queries("q156_variance_explained")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 65)
    val dimShares = rows.collect { case (k, v) if k.startsWith("dim_") => v }
    // integer floor-division loses < 1 micro-unit per dimension
    val total = dimShares.sum
    assert(total <= 1000000L && total > 1000000L - 64,
      s"per-dim shares must tile unity up to truncation, got $total")
    // the dominant direction must explain at least an average dim's worth
    assert(rows("pc1") >= 1000000L / 64,
      s"pc1 share ${rows("pc1")} below the uniform floor")
    assert(rows("pc1") <= 1000000L)
  }

  test("q152: covariance aggregator is invariant under input partitioning") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = udaf(new graft.functions.CovAggregator(64, 10000.0),
      ExpressionEncoder[Seq[Float]]())
    def moments(parts: Int) = Tables.embeddings(spark, sf())
      .repartition(parts).agg(agg(col("embedding")).as("st"))
      .select(col("st.n"), col("st.s"), col("st.ss"))
      .collect().map(_.toString)
    assert(moments(1).sameElements(moments(13)),
      "partitioning changed the exact integer moments — merge is not associative-exact")
  }
}
