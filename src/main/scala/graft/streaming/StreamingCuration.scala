package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming twins of the LLM-pipeline curation heads: the two queries
  * a continuously-fed corpus runs forever — exact dedup at q30b's
  * normalized-fingerprint grain and q227's filter-cascade funnel —
  * re-expressed as watermarked event-time window aggregates in append
  * mode. Both are arrival-order-insensitive by construction (min /
  * count / sum-of-flag aggregates only), so the streamed emission for a
  * closed window is IDENTICAL to the batch query over that window's
  * rows, for any shuffling or micro-batch slicing of arrival —
  * StreamingCurationSpec pins that parity. State per key is one
  * aggregation buffer; the watermark bounds and purges it, which is the
  * property that lets these run unattended against 100 TB/day of feed.
  *
  * Expected input schema (a documents-table event feed):
  * (doc_id LONG, source STRING, text STRING, event_time TIMESTAMP).
  */
object StreamingCuration {

  /** q30b's canonicalization, verbatim (Extensions.scala q30b): case-
    * fold, strip non-alphanumerics, collapse whitespace, md5. */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Per-window exact-dedup scorecard at the normalized-fingerprint
    * grain: for each (tumbling window, fingerprint) — the canonical
    * (minimum) doc_id and the copy count, emitted once when the
    * watermark closes the window. The streaming q30b. */
  def fingerprintDedup(docs: DataFrame, width: String = "1 minute",
      watermarkDelay: String = "30 seconds"): DataFrame =
    docs.withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), width).as("w"),
        normFingerprint(col("text")).as("norm_fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .select(col("w.start").as("window_start"), col("norm_fingerprint"),
        col("canonical_id"), col("n_copies"))

  /** Survivor stream: one document per normalized fingerprint (the
    * first to arrive inside the watermark horizon), duplicates dropped
    * exactly once — the emit-the-kept-copy path of streaming dedup.
    * Set-equality with batch holds (same fingerprints survive); WHICH
    * copy survives is arrival order, the documented divergence from
    * batch q30b's min-id canonical rule. */
  def dedupSurvivors(docs: DataFrame,
      watermarkDelay: String = "30 seconds"): DataFrame =
    docs.withColumn("norm_fingerprint", normFingerprint(col("text")))
      .withWatermark("event_time", watermarkDelay)
      .dropDuplicatesWithinWatermark("norm_fingerprint")

  /** q227's filter-cascade funnel per (window, source): survivors of
    * each successive integer-exact quality rule — R1 length ≥ 5 tokens,
    * R2 distinct tokens ≥ half, R3 mean token length ≤ 12 chars —
    * emitted once per closed window. The streaming curation report. */
  def filterCascade(docs: DataFrame, width: String = "1 minute",
      watermarkDelay: String = "30 seconds"): DataFrame = {
    val ntok = size(split(col("text"), " ")).cast("long")
    val ndis = size(array_distinct(split(col("text"), " "))).cast("long")
    val nch = length(translate(col("text"), " ", "")).cast("long")
    val p1 = ntok >= 5
    val p2 = ndis * 2 >= ntok
    val p3 = nch <= ntok * 12
    docs.withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), width).as("w"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(p1, 1L).otherwise(0L)).as("pass_len"),
        sum(when(p1 && p2, 1L).otherwise(0L)).as("pass_len_rep"),
        sum(when(p1 && p2 && p3, 1L).otherwise(0L)).as("pass_all"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_docs"), col("pass_len"), col("pass_len_rep"), col("pass_all"),
        graft.Num.r6(col("pass_all").cast("double")
          / col("n_docs").cast("double")).as("survival_share"))
  }
}
