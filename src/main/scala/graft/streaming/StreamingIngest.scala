package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental ingest dedup — q134's new-batch-vs-index
  * pattern run continuously. Each micro-batch of documents is deduped
  * AGAINST the persistent index at `indexDir` (exact SHA-256 digest
  * hit, else informative-5-gram containment ≥ 0.8, else unique —
  * `Corpus2.ingestVerdicts`, the SAME function the batch query runs,
  * so batch ≡ streaming holds by construction); verdicts append to
  * `verdictDir`, then the batch itself joins the index. Cost per
  * micro-batch is O(batch), not O(corpus) — the property that makes
  * continuous ingest viable at 100 TB of accumulated index.
  *
  * Prime `indexDir` with the existing corpus (even an empty DataFrame
  * with the (doc_id, text) schema) before starting. `ingestVerdicts`
  * tells the sides apart by doc_id alone (its n-gram pass keeps only
  * doc_id + gram), so the batch's ids are remapped to the disjoint
  * negative range −(id+1) for the computation and mapped back on
  * output — a re-ingested id already present in the index is then
  * correctly an exact_dup OF ITSELF rather than a second "new" copy.
  * Ids are assumed ≥ 0. Replayed batches after a failure append
  * duplicate verdict rows — dedupe on (doc_id, batch_id) downstream,
  * or swap the sink for [[Sinks.idempotentParquet]]'s marker pattern.
  */
object StreamingIngest {

  def start(docs: DataFrame, indexDir: String, verdictDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // localCheckpoint: the micro-batch source is not re-readable
        // from the verdict plan's multiple branches
        val b = batch.select(col("doc_id").cast("long").as("doc_id"),
          col("text")).localCheckpoint()
        if (!b.isEmpty) {
          val index = spark.read.parquet(indexDir)
            .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          val neg = b.select((lit(-1L) - col("doc_id")).as("doc_id"),
            col("text"))
          val verdicts = graft.ext.Corpus2.ingestVerdicts(
            index.unionByName(neg), col("doc_id") < 0)
          verdicts
            .select((lit(-1L) - col("doc_id")).as("doc_id"), col("verdict"),
              col("matched_old_id"), col("containment"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(verdictDir)
          b.write.mode("append").parquet(indexDir)
        }
      }
      .start()
}
