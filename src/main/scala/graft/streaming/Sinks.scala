package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Sink patterns for the CTAS outputs (S3) when the target is a table
  * or object store rather than Kafka. */
object Sinks {

  /** Exactly-once parquet append via foreachBatch: each micro-batch
    * writes to a batchId-named subdirectory, skipping ids that already
    * committed — replays after a failure become no-ops, so downstream
    * readers of `path/` never see duplicates. (Spark's own parquet
    * streaming sink does the same via its _spark_metadata log; this
    * variant keeps plain directories any engine can read.) */
  def idempotentParquet(df: DataFrame, path: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dir = new java.io.File(s"$path/batch=$batchId")
        val marker = new java.io.File(dir, "_COMMITTED")
        if (!marker.exists()) {
          batch.write.mode("overwrite").parquet(dir.toString)
          marker.createNewFile()
          ()
        }
      }
}
