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
        // Hadoop FileSystem, not java.io.File: the path may be s3a://,
        // hdfs://, etc., and the marker must live WITH the data so a
        // driver failover still sees prior commits
        val dir = new org.apache.hadoop.fs.Path(s"$path/batch=$batchId")
        val marker = new org.apache.hadoop.fs.Path(dir, "_COMMITTED")
        val fs = dir.getFileSystem(
          batch.sparkSession.sessionState.newHadoopConf())
        if (!fs.exists(marker)) {
          batch.write.mode("overwrite").parquet(dir.toString)
          fs.create(marker, true).close()
        }
      }
}
