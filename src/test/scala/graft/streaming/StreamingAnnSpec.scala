package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

final case class AnnInput(id: Long, is_query: Boolean, vec: Seq[Double])

/** Parity pins for streaming ANN serving: answers must equal the
  * one-shot batch run of the SAME [[StreamingAnn.annTopK]] over the
  * corpus prefix ingested at answer time — both mid-ingest (queries
  * between corpus chunks see exactly the prefix + their own batch) and
  * at the end (full corpus). The cosine math itself is pinned by q78's
  * DuckDB oracle; this spec pins the slicing, read-your-batch, and
  * append-only-index semantics the streaming wrapper adds. */
class StreamingAnnSpec extends SparkSpec {

  private def tmp(prefix: String) = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  test("streaming ANN answers == batch annTopK over the ingested prefix") {
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val n = vecs.length

    // q78's deterministic centroids: k = max(16, ceil(√n)) smallest-md5
    val k = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val cents = emb
      .select(col("vec_id"), col("v"),
        Dedup.h60(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("vec_id")).limit(k)
      .withColumn("cell",
        row_number().over(Window.orderBy(col("hk"), col("vec_id"))) - 1)
      .select(col("cell").cast("long").as("cell"), col("v").as("cv"))
    val centDir = tmp("anncent"); val indexDir = tmp("annidx") + "/idx"
    val outDir = tmp("annout")
    cents.write.mode("overwrite").parquet(centDir)
    // the inverted file starts unseeded: readOrEmpty serves the typed
    // empty frame until the first batch writes the cell-partitioned layout

    val probeIds = vecs.take(5).map(_._1)
    def probesDf(ids: Seq[Long]): DataFrame = {
      import spark.implicits._
      ids.map(i => (i, vecs.find(_._1 == i).get._2)).toDF("id", "vec")
    }
    val cut = (n * 6) / 10
    val chunkA = vecs.take(cut); val chunkB = vecs.drop(cut)

    val mem = MemoryStream[AnnInput](Encoders.product[AnnInput], spark)
    val q = StreamingAnn.start(mem.toDF(), centDir, indexDir, outDir,
      tmp("annckpt"))
    try {
      mem.addData(chunkA.map { case (i, v) => AnnInput(i, is_query = false, v) })
      q.processAllAvailable() // batch 0: first corpus slice
      mem.addData(probeIds.map(i =>
        AnnInput(i, is_query = true, vecs.find(_._1 == i).get._2)))
      q.processAllAvailable() // batch 1: mid-ingest queries
      mem.addData(chunkB.map { case (i, v) => AnnInput(i, is_query = false, v) })
      q.processAllAvailable() // batch 2: rest of the corpus
      mem.addData(probeIds.map(i =>
        AnnInput(i, is_query = true, vecs.find(_._1 == i).get._2)))
      q.processAllAvailable() // batch 3: full-corpus queries
    } finally q.stop()

    val centsDf = spark.read.parquet(centDir)
    def expect(prefix: Array[(Long, Seq[Double])]): Set[(Long, Long, Double, Int)] = {
      import spark.implicits._
      val idx = StreamingAnn.assignCells(
        prefix.toSeq.toDF("id", "vec"), centsDf)
      StreamingAnn.annTopK(probesDf(probeIds), idx, centsDf, 5, 4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    }
    def got(batchId: Long): Set[(Long, Long, Double, Int)] =
      spark.read.parquet(outDir).filter(col("batch_id") === batchId)
        .select("query_id", "neighbor_id", "cosine", "rn")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet

    val mid = got(1); val full = got(3)
    assert(mid.nonEmpty && full.nonEmpty)
    assert(mid == expect(chunkA),
      "mid-ingest answers must equal batch annTopK over the ingested prefix")
    assert(full == expect(vecs),
      "final answers must equal batch annTopK over the full corpus")
    // ingest actually changed at least one answer (otherwise the prefix
    // case proves nothing)
    assert(mid != full)
  }
}
