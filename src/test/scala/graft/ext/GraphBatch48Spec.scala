package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 48: q353 rich-club, q354 preferential
  * attachment, q355 closeness. One shared 5-supplier graph: triangle
  * {1,2,3} plus pendant 4–1 and pendant 5–2 (each edge = 3 shared
  * orders, the backbone threshold).
  */
class GraphBatch48Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_g48").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private lazy val dir: String = {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 5L))
    var ok = 0L
    val li = edges.flatMap { case (u, v) =>
      (1 to 3).flatMap { _ => ok += 1; Seq((ok, u), (ok, v)) }
    }.toDF("l_orderkey", "l_suppkey")
    plantDir("lineitem" -> li)
  }

  test("q353: only the k=2 club survives and it is a single perfect edge") {
    val rows = byName("q353_rich_club").run(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Long]("n_nodes") == 2L)  // degrees: 1->3, 2->3
    assert(r.getAs[Long]("n_edges") == 1L)  // the (1,2) edge
    assert(r.getAs[Double]("phi") == 1.0)
  }

  test("q354: pendant-to-hub pairs outscore pendant-to-corner pairs") {
    val rows = byName("q354_pref_attachment").run(spark, dir).collect()
    assert(rows.map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"))).toSeq ==
      Seq((1L, 5L), (2L, 4L), (3L, 4L), (3L, 5L)))
    val first = rows.head
    assert(first.getAs[Long]("pa_score") == 3L) // deg(1)=3 x deg(5)=1
    assert(first.getAs[Long]("common") == 1L)   // via node 2
  }

  test("q355: hub closeness 0.8, pendant closeness 0.5 on the 5-node graph") {
    val rows = byName("q355_closeness").run(spark, dir).collect()
    assert(rows.length == 5)
    val m = rows.map(r => r.getAs[Long]("node") ->
      (r.getAs[Long]("n_reached"), r.getAs[Double]("closeness"))).toMap
    assert(m(1L) == ((5L, 0.8)))   // dists 1,1,1,2 -> (4/5)*(4/4)
    assert(m(4L) == ((5L, 0.5)))   // dists 1,2,2,3 -> (4/8)*(4/4)
  }
}
