package graft.streaming

import graft.ext.Similarity.cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN serving over a growing IVF index — the q78 pipeline
  * run continuously, completing the similarity-search family's
  * streaming side (batch: q39 LSH / q78 IVF / q140 SemDeDup; streaming
  * until now had only the text heads). One tagged stream carries both
  * sides of a live vector platform:
  *
  *  - `is_query = false` rows are corpus additions: assigned to their
  *    Voronoi cell (same r6-rounded argmax as batch q78) and appended
  *    to the inverted file at `indexDir`;
  *  - `is_query = true` rows are searches: fanned out to the `nprobe`
  *    nearest cells and answered with an exact cosine re-rank against
  *    the index AS OF THEIR MICRO-BATCH — additions in the same batch
  *    are visible first (read-your-batch), so replaying the same input
  *    slicing reproduces the same answers.
  *
  * Batch ≡ streaming by construction: [[assignCells]] and [[annTopK]]
  * ARE the per-batch functions, and a one-shot batch run over the same
  * corpus prefix gives identical answers (StreamingAnnSpec pins both
  * the full-corpus case and a mid-ingest prefix case). Centroids are
  * fixed at `centDir` (the k-means-fit stand-in, as in q78) — index
  * growth never moves a vector between cells, which is what makes the
  * inverted file APPEND-ONLY and the operator exactly-once friendly.
  * Per micro-batch cost: O(batch × k) for assignment (broadcast
  * centroids, map-side argmax) plus the probed cells' candidates —
  * never a corpus scan.
  */
object StreamingAnn {

  /** Nearest-cell assignment: (id, vec) × centroids (cell, cv) →
    * (vec_id, cell, v). Argmax via a map-side-combinable max(struct),
    * ties to the lowest cell id — bit-compatible with batch q78. */
  def assignCells(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val v2 = vecs.select(col("id").as("vec_id"), col("vec").as("v"))
    v2.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(graft.Num.r6(cosine(col("v"), col("cv"))).as("cs"),
          (lit(0L) - col("cell")).as("nc")).as("sc"))
      .groupBy(col("vec_id")).agg(max(col("sc")).as("m"))
      .select(col("vec_id"), (lit(0L) - col("m.nc")).as("cell"))
      .join(v2, "vec_id")
      .select(col("vec_id"), col("cell"), col("v"))
  }

  /** IVF top-k: probes (id, vec) against index (cell, vec_id, v). */
  def annTopK(probes: DataFrame, index: DataFrame, cents: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val pCells = probeCells(probes, cents, nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    index.join(broadcast(pCells), "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.Num.r4(cosine(col("v"), col("qv"))).as("cosine"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rn"))
  }

  /** The probe's nprobe nearest cells per query — the slice of
    * [[annTopK]] that decides WHICH inverted-file cells a batch can
    * touch; factored out so the per-batch index read prunes to them. */
  def probeCells(probes: DataFrame, cents: DataFrame,
      nprobe: Int): DataFrame = {
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("cell"))
    probes.select(col("id").as("query_id"), col("vec").as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qv"), col("cell"),
        graft.Num.r6(cosine(col("qv"), col("cv"))).as("cs"))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nprobe)
      .select(col("query_id"), col("qv"), col("cell"))
  }

  /** Append cell assignments to the inverted file, PARTITIONED by
    * `cell` so probe reads prune to the probed cells' directories.
    * Also the priming path for an existing corpus. */
  def writeIndex(assigned: DataFrame, indexDir: String): Unit =
    assigned.select(col("vec_id"), col("v"), col("cell"))
      .write.mode("append").partitionBy("cell").parquet(indexDir)

  /** `stream` carries (id LONG, is_query BOOLEAN, vec ARRAY<DOUBLE>).
    * Prime `centDir` with (cell LONG, cv ARRAY<DOUBLE>) and `indexDir`
    * with the existing corpus's cells via [[writeIndex]] (or leave it
    * absent — an unseeded index reads as empty).
    *
    * Per-batch I/O (round 9): the inverted file is partitioned by
    * `cell` and each query batch reads ONLY its probed cells — the
    * scan's partition filter is `cell IN (batch's ≤ nprobe·|queries|,
    * ≤ k-centroids cells)`, so per-batch cost is O(batch + colliding
    * cells), not O(corpus age). Appends land one file per touched cell
    * per batch; every [[CompactEvery]] batches the index is rewritten
    * one-file-per-cell ([[StreamingSetJoin.compact]]). */
  def start(stream: DataFrame, centDir: String, indexDir: String,
      outDir: String, checkpoint: String, k: Int = 5,
      nprobe: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val b = batch.select(col("id").cast("long").as("id"),
          col("is_query"), col("vec")).localCheckpoint()
        val cents = spark.read.parquet(centDir)
        val additions = assignCells(b.filter(!col("is_query")), cents)
          .localCheckpoint() // read-your-batch: joined below AND appended
        val queries = b.filter(col("is_query"))
        if (!additions.isEmpty) writeIndex(additions, indexDir)
        if (!queries.isEmpty) {
          val pc = probeCells(queries, cents, nprobe).localCheckpoint()
          // bounded driver scalar: ≤ |centroids| probed cell ids
          val cells = pc.select(col("cell")).distinct().as[Long].collect().toSeq
          val index = StreamingSetJoin.readOrEmpty(spark, indexDir,
              "vec_id BIGINT, v ARRAY<DOUBLE>, cell BIGINT")
            .filter(col("cell").isin(cells: _*)) // partition-pruned
          annTopK(queries, index, cents, k, nprobe)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
        }
        if (batchId % StreamingSetJoin.CompactEvery ==
            StreamingSetJoin.CompactEvery - 1)
          StreamingSetJoin.compact(spark, indexDir, "cell")
      }
      .start()
}
