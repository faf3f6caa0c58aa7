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
      "per-label per-dimension embedding moments via typed Aggregator: bounded 2 KB buffers, no n*64 explode shuffle"),

    // --------------------------------------------------------------- q264
    // Calinski–Harabasz index of the label clustering (Caliński &
    // Harabasz 1974): (SSB/(k−1))/(SSW/(n−k)) — the UNCAPPED linear
    // companion to q187's capped silhouette (silhouette needs pairs;
    // CH needs only per-(label, dim) moments, so it runs on the full
    // corpus at any scale). Components 1e-4-tick-quantized (q159's
    // grid), Σx and Σx² exact integers per (label × dim) cell, each
    // cell's SSW/SSB contribution computed by the identical IEEE
    // formula and micro-quantized BEFORE the bounded 64·k-cell sum.
    Query(
      "q264_calinski_harabasz",
      (s, d) => {
        val base = Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .select(col("label"), col("dim"),
            floor(col("x").cast("double") * lit(10000.0) + lit(0.5))
              .cast("long").as("xq"))
        val perLD = base.groupBy(col("label"), col("dim"))
          .agg(count(lit(1)).as("nl"), sum(col("xq")).as("sx"),
            sum((col("xq") * col("xq")).cast("decimal(38,0)")).as("sxx"))
          .localCheckpoint() // bounded k × 64 moment grid, one scan
        val perD = perLD.groupBy(col("dim"))
          .agg(sum(col("nl")).as("n"), sum(col("sx")).as("sxg"))
        val k = perLD.select(col("label")).distinct()
          .agg(count(lit(1)).as("k_labels"))
        // per-cell contributions in VALUE units, micro-quantized
        val cells = perLD.join(perD, Seq("dim"))
          .select(col("label"), col("dim"), col("nl"),
            floor(lit(1e6) * (col("sxx").cast("double") / lit(1e8)
              - (col("sx").cast("double") / lit(1e4))
                * (col("sx").cast("double") / lit(1e4)) / col("nl"))
              + lit(0.5)).cast("long").as("sswq"),
            floor(lit(1e6) * (col("nl").cast("double")
              * ((col("sx").cast("double") / (lit(1e4) * col("nl"))
                  - col("sxg").cast("double") / (lit(1e4) * col("n")))
                * (col("sx").cast("double") / (lit(1e4) * col("nl"))
                  - col("sxg").cast("double") / (lit(1e4) * col("n")))))
              + lit(0.5)).cast("long").as("ssbq"))
        val nTot = Tables.embeddings(s, d).agg(count(lit(1)).as("n_vectors"))
        cells.agg(sum(col("sswq")).as("sswq"), sum(col("ssbq")).as("ssbq"))
          .crossJoin(broadcast(k)).crossJoin(broadcast(nTot))
          .select(col("n_vectors"), col("k_labels"),
            Num.r6(col("ssbq") / lit(1e6)).as("ssb"),
            Num.r6(col("sswq") / lit(1e6)).as("ssw"),
            when(col("k_labels") > 1 && col("sswq") > 0, Num.r6(
              (col("ssbq").cast("double") / (col("k_labels") - 1)) /
                (col("sswq").cast("double") / (col("n_vectors") - col("k_labels")))))
              .as("ch_index"))
      },
      Some(s"""
        WITH raw AS (
          SELECT label, unnest(embedding) AS xf,
                 unnest(range(0, len(embedding))) AS dim
          FROM embeddings),
        base AS (
          SELECT label, dim,
            CAST(FLOOR(CAST(xf AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS xq
          FROM raw),
        per_ld AS (
          SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS nl,
            CAST(SUM(xq) AS BIGINT) AS sx,
            CAST(SUM(xq * xq) AS BIGINT) AS sxx
          FROM base GROUP BY label, dim),
        per_d AS (
          SELECT dim, CAST(SUM(nl) AS BIGINT) AS n,
            CAST(SUM(sx) AS BIGINT) AS sxg
          FROM per_ld GROUP BY dim),
        kk AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k_labels
               FROM per_ld),
        cells AS (
          SELECT
            CAST(FLOOR(1e6 * (CAST(l.sxx AS DOUBLE) / 1e8
              - (CAST(l.sx AS DOUBLE) / 1e4)
                * (CAST(l.sx AS DOUBLE) / 1e4) / l.nl) + 0.5) AS BIGINT)
              AS sswq,
            CAST(FLOOR(1e6 * (CAST(l.nl AS DOUBLE)
              * ((CAST(l.sx AS DOUBLE) / (1e4 * l.nl)
                  - CAST(g.sxg AS DOUBLE) / (1e4 * g.n))
                * (CAST(l.sx AS DOUBLE) / (1e4 * l.nl)
                  - CAST(g.sxg AS DOUBLE) / (1e4 * g.n)))) + 0.5) AS BIGINT)
              AS ssbq
          FROM per_ld l JOIN per_d g USING (dim)),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors FROM embeddings),
        agg AS (
          SELECT CAST(SUM(sswq) AS BIGINT) AS sswq,
            CAST(SUM(ssbq) AS BIGINT) AS ssbq
          FROM cells)
        SELECT n_vectors, k_labels,
          ${Num.sql("ssbq / 1e6", 6)} AS ssb,
          ${Num.sql("sswq / 1e6", 6)} AS ssw,
          CASE WHEN k_labels > 1 AND sswq > 0 THEN ${Num.sql(
            """(CAST(ssbq AS DOUBLE) / (k_labels - 1))
               / (CAST(sswq AS DOUBLE) / (n_vectors - k_labels))""", 6)}
          END AS ch_index
        FROM agg CROSS JOIN kk CROSS JOIN nt"""),
      "Calinski-Harabasz label-clustering index from exact per-(label,dim) integer moments: the uncapped linear companion to the capped silhouette (Calinski & Harabasz 1974)"),

    // ---------------------------------------------------------------- q408
    // Vector-norm profile of the embedding table: mean ‖v‖, exact
    // ceil-rank P05/P50/P95 on the 1e-3 norm grid, and the share of
    // near-zero vectors (‖v‖ < 0.1 — dead embeddings that poison
    // cosine ANN). The norm-distribution companion to the per-dim
    // stats (q151) and anisotropy (q349): scale pathologies the
    // component view can't see. ‖v‖² is an exact integer on the 1e-6
    // component grid (so the near-zero test is an exact integer
    // compare); percentiles come from the bounded norm-grid histogram
    // cum — no global row sort at any scale.
    Query(
      "q408_norm_profile",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val n2 = Tables.embeddings(s, d)
          .select(col("vec_id"),
            posexplode(Similarity.toDouble(col("embedding"))).as(Seq("dim", "x")))
          .select(col("vec_id"),
            (floor(col("x") * lit(1e6) + lit(0.5)).cast("long")).as("xq"))
          .groupBy(col("vec_id"))
          .agg(sum(col("xq") * col("xq")).as("nq"))
        val scored = n2.select(col("nq"),
          floor(sqrt(col("nq").cast("double")) / lit(1e6) * lit(1000.0)
            + lit(0.5)).cast("long").as("g"))
        val hist = scored.groupBy(col("g")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded norm grid
        val wc = Window.orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wc)).localCheckpoint()
        val tot = cum.agg(max(col("cum")).as("n"))
        def pct(p: Int) = cum.crossJoin(broadcast(tot))
          .filter(Exact.ceilRank(col("cum"), p, "n"))
          .agg(min(col("g")).as(s"g$p"))
        val extras = scored.agg(
          sum(floor(sqrt(col("nq").cast("double")) + lit(0.5)).cast("long"))
            .as("smq"),
          count(when(col("nq") < 10000000000L, 1)).as("nz")) // (0.1e6)²
        tot.crossJoin(broadcast(pct(5))).crossJoin(broadcast(pct(50)))
          .crossJoin(broadcast(pct(95))).crossJoin(broadcast(extras))
          .select(col("n").as("n_vectors"),
            Num.r6(col("smq").cast("double")
              / (col("n").cast("double") * lit(1e6))).as("mean_norm"),
            Num.r4(col("g5").cast("double") / lit(1000.0)).as("p05_norm"),
            Num.r4(col("g50").cast("double") / lit(1000.0)).as("p50_norm"),
            Num.r4(col("g95").cast("double") / lit(1000.0)).as("p95_norm"),
            Num.r6(col("nz").cast("double") / col("n").cast("double"))
              .as("near_zero_share"))
      },
      Some("""
        WITH n2 AS (
          SELECT vec_id, CAST(SUM(xq * xq) AS BIGINT) AS nq FROM (
            SELECT vec_id,
              CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS xq
            FROM (SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x
                  FROM embeddings))
          GROUP BY vec_id),
        scored AS (
          SELECT nq, CAST(FLOOR(SQRT(CAST(nq AS DOUBLE)) / 1e6 * 1000.0 + 0.5)
            AS BIGINT) AS g
          FROM n2),
        hist AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c
                 FROM scored GROUP BY g),
        cum AS (
          SELECT g, SUM(c) OVER (ORDER BY g
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        tot AS (SELECT CAST(MAX(cum) AS BIGINT) AS n FROM cum),
        p5 AS (SELECT CAST(MIN(g) AS BIGINT) AS g5 FROM cum CROSS JOIN tot
               WHERE cum >= (5 * n + 99) // 100),
        p50 AS (SELECT CAST(MIN(g) AS BIGINT) AS g50 FROM cum CROSS JOIN tot
               WHERE cum >= (50 * n + 99) // 100),
        p95 AS (SELECT CAST(MIN(g) AS BIGINT) AS g95 FROM cum CROSS JOIN tot
               WHERE cum >= (95 * n + 99) // 100),
        extras AS (
          SELECT CAST(SUM(CAST(FLOOR(SQRT(CAST(nq AS DOUBLE)) + 0.5)
              AS BIGINT)) AS BIGINT) AS smq,
            CAST(COUNT(*) FILTER (WHERE nq < 10000000000) AS BIGINT) AS nz
          FROM scored)
        SELECT n AS n_vectors,
          FLOOR((CAST(smq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
                * 1000000 + 0.500001) / 1000000 AS mean_norm,
          FLOOR((CAST(g5 AS DOUBLE) / 1000.0) * 10000 + 0.500001) / 10000
            AS p05_norm,
          FLOOR((CAST(g50 AS DOUBLE) / 1000.0) * 10000 + 0.500001) / 10000
            AS p50_norm,
          FLOOR((CAST(g95 AS DOUBLE) / 1000.0) * 10000 + 0.500001) / 10000
            AS p95_norm,
          FLOOR((CAST(nz AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS near_zero_share
        FROM tot CROSS JOIN p5 CROSS JOIN p50 CROSS JOIN p95 CROSS JOIN extras"""),
      "Embedding norm profile: exact integer squared norms, ceil-rank grid percentiles, near-zero share — no global row sort"))
}
