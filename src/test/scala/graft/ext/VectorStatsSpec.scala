package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the typed dim-stats Aggregator (value parity vs
  * DuckDB is covered by the oracle gate; these pin what the oracle
  * can't see: merge-order independence and equivalence to the explode
  * plan it replaces). */
class VectorStatsSpec extends SparkSpec {

  test("q151: aggregator equals the posexplode+groupBy plan it replaces") {
    val out = Registry.queries("q151_dim_stats")(spark, sf()).cache()
    val ref = Tables.embeddings(spark, sf())
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "xf")))
      .withColumn("qv",
        floor(col("xf").cast("double") * 10000.0 + 0.500001).cast("long"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("sum_q"),
        sum(col("qv") * col("qv")).as("sumsq_q"),
        min(col("qv")).as("min_q"), max(col("qv")).as("max_q"))
    val joined = out.join(ref, Seq("label", "dim"))
      .filter(out("n") =!= ref("n") ||
        out("sum_q") =!= ref("sum_q") || out("sumsq_q") =!= ref("sumsq_q") ||
        out("min_q") =!= ref("min_q") || out("max_q") =!= ref("max_q"))
    assert(joined.count() == 0, "aggregator diverged from the explode plan")
    assert(out.count() == ref.count(), "row universe differs")
    out.unpersist()
  }

  test("q151: result is invariant under input partitioning (merge associativity)") {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val agg = udaf(new graft.functions.DimStatsAggregator(64, 10000.0),
      ExpressionEncoder[Seq[Float]]())
    def stats(parts: Int) = Tables.embeddings(spark, sf())
      .repartition(parts)
      .groupBy(col("label")).agg(agg(col("embedding")).as("st"))
      .select(col("label"), col("st.n"), col("st.s"), col("st.s2"),
        col("st.mn"), col("st.mx"))
    val a = stats(1).orderBy("label").collect().map(_.toString)
    val b = stats(13).orderBy("label").collect().map(_.toString)
    assert(a.sameElements(b),
      "partitioning changed aggregator output — merge is not associative-exact")
  }
}
