package graft.ext

import graft.{Registry, SparkSpec}

/** Planted pin for q440: a Simpson's-paradox fixture where the naive
  * contrast is NEGATIVE (treatment concentrates in the low-value
  * segment) while every within-stratum effect is +10 — the stratified
  * estimator must read +10 and the naive one the hand-computed
  * negative value; a single-arm stratum is excluded from the
  * adjustment but still feeds the naive totals. */
class CausalSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  test("q440: stratified ATE +10 under a naive sign flip; single-arm stratum excluded") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_causal").toString
    Seq((1L, "A"), (2L, "B"), (3L, "C"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // A (high value): 1 treated @110, 4 control @100 -> diff +10
    // B (low value):  4 treated @20,  1 control @10  -> diff +10
    // C: 2 treated @95, no control -> excluded from adjustment
    val orders = (Seq((1L, "1-URGENT", 110.0)) ++
      (1 to 4).map(_ => (1L, "5-LOW", 100.0)) ++
      (1 to 4).map(_ => (2L, "1-URGENT", 20.0)) ++
      Seq((2L, "5-LOW", 10.0)) ++
      (1 to 2).map(_ => (3L, "2-HIGH", 95.0)))
      .toDF("o_custkey", "o_orderpriority", "o_totalprice")
    orders.write.mode("overwrite").parquet(s"$dir/orders.parquet")

    val rows = byName("q440_stratified_ate").run(spark, dir).collect()
    assert(rows.length == 2, s"single-arm stratum C must be excluded: ${rows.toSeq}")
    val a = rows(0); val b = rows(1)
    assert(a.getAs[String]("stratum") == "A" && b.getAs[String]("stratum") == "B")
    assert(a.getAs[Long]("n_t") == 1L && a.getAs[Long]("n_c") == 4L)
    assert(a.getAs[Double]("mean_t") == 110.0 && a.getAs[Double]("mean_c") == 100.0)
    assert(a.getAs[Double]("diff") == 10.0 && b.getAs[Double]("diff") == 10.0)
    // both strata weigh 5/10 -> stratified +10; naive: treated mean
    // (110+80+190)/7 = 54.285714..., control (400+10)/5 = 82 -> -27.7143
    assert(a.getAs[Double]("ate_stratified") == 10.0)
    assert(a.getAs[Double]("ate_naive") == -27.7143)
  }
}
