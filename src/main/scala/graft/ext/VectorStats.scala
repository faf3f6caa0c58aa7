package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Dense-vector statistics computed WITHOUT exploding the vector
  * column — the embedding-table profiling pass (per-class means,
  * variances, ranges) that feeds normalization, whitening, and drift
  * monitoring in an embedding lake. */
object VectorStats {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q151
    // Per-label, per-dimension embedding moments via a typed
    // Aggregator over the raw vector column. The plan this replaces —
    // posexplode + groupBy(dim) — shuffles n·64 rows; this one
    // shuffles one ~2 KB moment buffer per map task per label
    // (map-side partial aggregation caps the payload at 4 long[64]
    // arrays + a count), then fans the single merged buffer out to 64
    // rows with one posexplode of a struct-zipped array. Components
    // are integer-quantized with the Num formula at reduce time, so
    // every sum is exact and the oracle reproduces each bit with
    // plain integer aggregates over an unnest.
    Query(
      "q151_dim_stats",
      (s, d) => {
        val agg = udaf(new graft.functions.DimStatsAggregator(64, 10000.0),
          ExpressionEncoder[Seq[Float]]())
        Tables.embeddings(s, d)
          .groupBy(col("label"))
          .agg(agg(col("embedding")).as("st"))
          .select(col("label"), col("st.n").as("n"), col("st.s").as("s"),
            col("st.s2").as("s2"), col("st.mn").as("mn"), col("st.mx").as("mx"))
          .select(col("label"), col("n"),
            posexplode(arrays_zip(col("s"), col("s2"), col("mn"), col("mx")))
              .as(Seq("dim", "z")))
          .select(col("label"), col("dim"), col("n"),
            col("z.s").as("sum_q"), col("z.s2").as("sumsq_q"),
            col("z.mn").as("min_q"), col("z.mx").as("max_q"))
          .withColumn("mean",
            Num.r6(col("sum_q").cast("double") / col("n") / lit(10000.0)))
          .orderBy(col("label"), col("dim"))
      },
      Some(s"""
        WITH e AS (
          SELECT label, unnest(embedding) AS xf,
                 unnest(range(0, len(embedding))) AS dim
          FROM embeddings),
        q AS (
          SELECT label, dim,
            CAST(FLOOR(CAST(xf AS DOUBLE) * 10000.0 + 0.500001) AS BIGINT) AS qv
          FROM e)
        SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(qv) AS BIGINT) AS sum_q,
          CAST(SUM(qv * qv) AS BIGINT) AS sumsq_q,
          CAST(MIN(qv) AS BIGINT) AS min_q,
          CAST(MAX(qv) AS BIGINT) AS max_q,
          ${Num.sql("CAST(SUM(qv) AS DOUBLE) / COUNT(*) / 10000.0", 6)} AS mean
        FROM q GROUP BY label, dim ORDER BY label, dim"""),
      "per-label per-dimension embedding moments via typed Aggregator: bounded 2 KB buffers, no n*64 explode shuffle"))
}
