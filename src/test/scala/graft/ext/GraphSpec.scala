package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the graph and round-4 statistics operators. */
class GraphSpec extends SparkSpec {

  test("q101 PageRank: mass conserved, positive ranks, node set complete") {
    val pr = Registry.queries("q101_pagerank")(spark, sf()).cache()
    val li = Tables.lineitem(spark, sf())
    val or = Tables.orders(spark, sf())
    val nCust = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey").distinct().count()
    val nSupp = li.select("l_suppkey").distinct().count()
    assert(pr.count() == nCust + nSupp)
    assert(pr.filter(col("rank_q") <= 0).count() == 0)
    // integer truncation only ever loses mass, never creates it; losses
    // are < 1 unit per (node x iteration) on a 1e9 mass
    val total = pr.agg(sum("rank_q")).head.getLong(0)
    assert(total <= 1000000000L, s"mass created: $total")
    assert(total >= 950000000L, s"too much mass lost: $total")
    // both partitions of the bipartite graph are present
    assert(pr.filter(col("node_type") === "customer").count() == nCust)
    assert(pr.filter(col("node_type") === "supplier").count() == nSupp)
    pr.unpersist()
  }

  test("q101 PageRank is deterministic across runs (integer arithmetic)") {
    val a = Registry.queries("q101_pagerank")(spark, sf()).collect()
    val b = Registry.queries("q101_pagerank")(spark, sf()).collect()
    assert(a.sameElements(b), "two runs differ — iteration is not exact")
  }

  test("q101 suppliers with more trading partners rank higher on average") {
    val pr = Registry.queries("q101_pagerank")(spark, sf())
    val supp = pr.filter(col("node_type") === "supplier")
      .withColumn("orig", (col("node_id") - 1) / 2)
    val deg = Tables.lineitem(spark, sf())
      .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("orig"), col("o_custkey"))
      .distinct()
      .groupBy("orig").agg(count(lit(1)).as("deg"))
    val joined = supp.join(deg, Seq("orig"))
    val corr = joined.agg(org.apache.spark.sql.functions.corr(
      col("deg").cast("double"), col("rank_q").cast("double"))).head.getDouble(0)
    assert(corr > 0.5, s"rank should track degree on a bipartite graph, corr=$corr")
  }

  test("q102 PMI: support floor respected, ranking monotone, top pair informative") {
    val p = Registry.queries("q102_pmi_collocations")(spark, sf()).collect()
    assert(p.length == 50)
    assert(p.forall(_.getLong(2) >= 5), "min support violated")
    val pmis = p.map(_.getLong(3))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    // top collocation must be positively associated (observed > expected)
    assert(pmis.head > 0, "top PMI not positive")
  }

  test("q103 MAD: non-negative, outliers bounded, median inside range") {
    val m = Registry.queries("q103_mad_outliers")(spark, sf()).cache()
    assert(m.filter(col("mad") < 0).count() == 0)
    assert(m.filter(col("n_outliers") > col("n")).count() == 0)
    val rng = Tables.events(spark, sf()).groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val bad = m.join(rng, Seq("event_type"))
      .filter(col("med") < col("lo") - 0.0001 || col("med") > col("hi") + 0.0001)
    assert(bad.count() == 0, "median outside group range")
    m.unpersist()
  }
}
