package graft.ext

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Invariants for the round-6 continuation audits: Benford (q175) and
  * label-propagation communities (q176). */
class Quality2Spec extends SparkSpec {

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q2").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  test("q175 Benford: shares are distributions, chi2 constant across rows") {
    val rows = Registry.queries("q175_benford")(spark, sf("0.01")).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val share = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) < 1e-3, s"observed shares sum to $share")
    // expected Benford masses over ALL nine digits sum to 1; over the
    // observed subset they can only be <= 1
    val ben = rows.map(_.getAs[Double]("benford_share")).sum
    assert(ben <= 1.0001)
    val chi2 = rows.map(_.getAs[Double]("chi2_total")).distinct
    assert(chi2.length == 1 && chi2.head >= 0.0, "chi2 must be one nonneg total")
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(d >= 1 && d <= 9, s"leading digit $d out of range")
    }
  }

  test("q176 LPA: two planted cliques collapse to their min-id labels") {
    import spark.implicits._
    // two supplier triangles, each sharing >= 3 orders pairwise
    val li = (for {
      (ordBase, supps) <- Seq((100L, Seq(1L, 2L, 3L)), (200L, Seq(10L, 11L, 12L)))
      ord <- 0L until 3L
      sk <- supps
    } yield (ordBase + ord, sk)).toDF("l_orderkey", "l_suppkey")
    val d = plantDir("lineitem" -> li)
    val out = Registry.queries("q176_label_propagation")(spark, d).collect()
      .map(r => r.getAs[Long]("node_id") ->
        (r.getAs[Long]("community"), r.getAs[Long]("community_size"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    Seq(1L, 2L, 3L).foreach(n => assert(out(n) == (1L, 3L), s"node $n -> ${out(n)}"))
    Seq(10L, 11L, 12L).foreach(n => assert(out(n) == (10L, 3L), s"node $n -> ${out(n)}"))
  }

  test("q176 on driver data: nodes unique, sizes consistent, labels are member nodes") {
    val rows = Registry.queries("q176_label_propagation")(spark, sf("0.01")).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getAs[Long]("node_id"))
    assert(nodes.distinct.length == nodes.length, "a node assigned twice")
    // community_size column must equal the actual member count
    rows.groupBy(_.getAs[Long]("community")).foreach { case (c, rs) =>
      rs.foreach(r => assert(r.getAs[Long]("community_size") == rs.length,
        s"community $c size column ${r.getAs[Long]("community_size")} != ${rs.length}"))
    }
    // a community label is itself a node of the graph (labels only ever
    // propagate from the initial node-id labeling)
    val nodeSet = nodes.toSet
    rows.foreach(r => assert(nodeSet(r.getAs[Long]("community"))))
  }
}
