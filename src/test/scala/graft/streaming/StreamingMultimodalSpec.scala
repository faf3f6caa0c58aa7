package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.Multimodal
import graft.ext.Multimodal.Asset
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Parity pin for streaming multimodal ingestion: the real synthetic
  * asset corpus fed in arbitrary micro-batch slices must produce
  * exactly the batch pipeline's features and frame samples — the
  * backfill-with-batch / tail-with-stream contract. */
class StreamingMultimodalSpec extends SparkSpec {

  private def ckpt() = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "mmckpt").toString

  test("streaming decode+featurize and frame-sample == batch on any slicing") {
    val docs = Tables.documents(spark, sf())
    val assets = Multimodal.syntheticAssets(docs).collect().toSeq

    val mem = MemoryStream[Asset](Encoders.product[Asset], spark)
    import spark.implicits._
    val q1 = StreamingMultimodal.featurize(mem.toDS())
      .writeStream.format("memory").queryName("mm_feats")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    val q2 = StreamingMultimodal.frames(mem.toDS())
      .writeStream.format("memory").queryName("mm_frames")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try assets.grouped(97).foreach { c => // deliberately odd slice size
      mem.addData(c); q1.processAllAvailable(); q2.processAllAvailable()
    } finally { q1.stop(); q2.stop() }

    val sFeats = spark.table("mm_feats").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getSeq[Float](4).toList)).toMap
    val bFeats = Multimodal.decodeAndFeaturize(
      Multimodal.syntheticAssets(docs)).collect()
      .map(f => f.asset_id -> (f.width, f.height, f.channels,
        f.features.toList)).toMap
    assert(sFeats.size == assets.size && sFeats == bFeats)

    val sFrames = spark.table("mm_frames").collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        r.getAs[Array[Byte]](2).toList).toMap
    val bFrames = Multimodal.sampleFrames(
      Multimodal.syntheticAssets(docs)).collect()
      .map(f => (f.asset_id, f.frame_index) -> f.frame_bytes.toList).toMap
    assert(sFrames.nonEmpty && sFrames == bFrames)
  }
}
