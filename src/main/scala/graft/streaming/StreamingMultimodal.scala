package graft.streaming

import graft.ext.Multimodal
import graft.ext.Multimodal.{Asset, FrameSample, ImageFeatures}
import org.apache.spark.sql.Dataset

/** Streaming multimodal ingestion — the q40/q41/q79 decode pipeline on
  * a live asset stream, completing the streaming side of the fourth
  * LLM-pipeline family (dedup → StreamingIngest/StreamingLsh,
  * similarity → StreamingAnn, as-of enrichment → AsOfProcessor,
  * multimodal → here). The kernels are the SAME batch functions
  * (`Multimodal.decodeAndFeaturize` / `sampleFrames`): both are
  * stateless `mapPartitions`/`flatMap` transforms, so they compose
  * directly onto an unbounded Dataset — per MICRO-BATCH the codec/model
  * session still initializes once per partition and amortizes across
  * the batch, the property that matters when the decode step stops
  * being a stub. Batch ≡ streaming holds by construction (stateless,
  * row-wise deterministic); the spec pins it across arbitrary
  * micro-batch slicing anyway, because that is the claim a user relies
  * on when they backfill with the batch path and tail with this one.
  */
object StreamingMultimodal {

  /** Decode + featurize a streaming asset feed. Append-mode safe: no
    * state, no watermark required (attach one upstream if this feeds a
    * windowed aggregate). */
  def featurize(assets: Dataset[Asset], dim: Int = 16): Dataset[ImageFeatures] =
    Multimodal.decodeAndFeaturize(assets, dim)

  /** Frame-sample the video assets of a streaming feed. */
  def frames(assets: Dataset[Asset], stride: Int = 8,
      maxFrames: Int = 4): Dataset[FrameSample] =
    Multimodal.sampleFrames(assets, stride, maxFrames)
}
