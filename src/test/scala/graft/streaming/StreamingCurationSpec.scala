package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class DocEvent(doc_id: Long, source: String, text: String,
    event_time: java.sql.Timestamp)

/** Parity pins for the streaming curation twins: for shuffled arrival
  * and arbitrary micro-batch slicing, every window the watermark closes
  * must carry EXACTLY the rows the batch expression computes over that
  * window's documents — q30b's fingerprint scorecard and q227's funnel
  * are arrival-order-insensitive aggregates, so equality is exact, not
  * approximate. A late straggler window (the flush sentinel) is
  * excluded from comparison on both sides. */
class StreamingCurationSpec extends SparkSpec {

  private val t0 = 1704067200000L // 2024-01-01T00:00:00Z

  // 3 sources × repeated text pool → plenty of cross-window duplicates;
  // texts exercise all three cascade rules (short, repetitive, long-token)
  private val pool = Seq(
    "the quick brown fox jumps over the lazy dog",
    "spam spam spam spam spam spam spam spam",          // fails R2
    "tiny doc",                                          // fails R1
    "pneumonoultramicroscopicsilicovolcanoconiosis floccinaucinihilipilification " +
      "antidisestablishmentarianism supercalifragilisticexpialidocious " +
      "pseudopseudohypoparathyroidism electroencephalographically", // distinct long tokens: passes R1+R2, fails R3
    "a normal document with enough distinct tokens to pass every rule",
    "The Quick Brown Fox jumps over the lazy dog!!")     // q30b-dup of #1

  /** Events with BOUNDED arrival disorder: sorted by event_time plus a
    * jitter strictly under the 30 s watermark delay, so rows arrive out
    * of order (crossing micro-batch and window boundaries) but never
    * later than the watermark tolerates — the contract under which the
    * streamed window ≡ batch parity is exact. (Globally shuffled
    * arrival would make the watermark correctly DROP stragglers; that
    * divergence is the late-data rule, pinned in StreamingHealthSpec.) */
  private def mkDocs(n: Int, seed: Int): Seq[DocEvent] = {
    val rnd = new scala.util.Random(seed)
    val docs = (0 until n).map { i =>
      DocEvent(i.toLong, s"src${rnd.nextInt(3)}", pool(rnd.nextInt(pool.size)),
        new java.sql.Timestamp(t0 + rnd.nextInt(150) * 1000L)) // 0-150 s → 3 windows
    }
    docs.sortBy(d => d.event_time.getTime + rnd.nextInt(25000))
  }

  /** Flush sentinel: advances the watermark far past every real window
    * so append mode emits them all; its own window is dropped. */
  private val flush = DocEvent(999999L, "flush", "flush doc",
    new java.sql.Timestamp(t0 + 3600 * 1000L))

  private def runStream(docs: Seq[DocEvent], name: String,
      op: DataFrame => DataFrame): DataFrame = {
    val mem = MemoryStream[DocEvent](Encoders.product[DocEvent], spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ckpt").toString
    val q = op(mem.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      docs.grouped(math.max(1, docs.length / 5 + 1)).foreach { c =>
        mem.addData(c); q.processAllAvailable()
      }
      mem.addData(Seq(flush)); q.processAllAvailable()
      mem.addData(Seq(flush.copy(doc_id = 999998L))); q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("window_start") < to_timestamp(lit("2024-01-01 00:30:00")))
  }

  import spark.implicits._

  test("streaming fingerprint dedup ≡ batch q30b grouping per closed window") {
    val docs = mkDocs(400, seed = 7)
    val got = runStream(docs, "fp_dedup",
      df => StreamingCuration.fingerprintDedup(df))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = docs.toDF()
      .groupBy(window(col("event_time"), "1 minute").as("w"),
        StreamingCuration.normFingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("cid"), count(lit(1)).as("n"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want,
      s"streamed ${got.size} keys, batch ${want.size}; diff=${
        (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k)).take(3)}")
    // duplicates actually occurred (the test has teeth)
    assert(want.values.exists(_._2 > 1), "fixture produced no duplicates")
  }

  test("dedup survivors: exactly one doc per fingerprint, set-equal to batch") {
    val docs = mkDocs(300, seed = 13)
    val mem = MemoryStream[DocEvent](Encoders.product[DocEvent], spark)
    val ckpt = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ckpt").toString
    // delay longer than the 150 s data span: no fingerprint's dedup
    // state expires mid-stream, so exactly-one-survivor holds globally
    // (with a shorter horizon a fingerprint re-appearing after state
    // purge correctly survives again — that's the watermark contract)
    val q = StreamingCuration.dedupSurvivors(mem.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("fp_surv")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      docs.grouped(60).foreach { c => mem.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("fp_surv").filter(col("source") =!= "flush")
      .select("norm_fingerprint").as[String].collect()
    val want = docs.toDF()
      .select(StreamingCuration.normFingerprint(col("text")).as("fp"))
      .distinct().as[String].collect().toSet
    assert(got.toSet == want, "survivor fingerprint set != batch distinct set")
    assert(got.length == got.toSet.size, "a fingerprint survived twice")
  }

  test("streaming filter cascade ≡ batch q227 funnel per closed window") {
    val docs = mkDocs(500, seed = 29)
    val got = runStream(docs, "cascade",
      df => StreamingCuration.filterCascade(df))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ntok = size(split(col("text"), " ")).cast("long")
    val ndis = size(array_distinct(split(col("text"), " "))).cast("long")
    val nch = length(translate(col("text"), " ", "")).cast("long")
    val (p1, p2, p3) = (ntok >= 5, ndis * 2 >= ntok, nch <= ntok * 12)
    val want = docs.toDF()
      .groupBy(window(col("event_time"), "1 minute").as("w"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(p1, 1L).otherwise(0L)).as("a"),
        sum(when(p1 && p2, 1L).otherwise(0L)).as("b"),
        sum(when(p1 && p2 && p3, 1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getStruct(0).getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want, s"funnel mismatch; got=${got.size} want=${want.size}")
    // every rule bites somewhere (fixture exercises the full cascade)
    assert(want.values.exists(v => v._2 < v._1), "R1 never fired")
    assert(want.values.exists(v => v._3 < v._2), "R2 never fired")
    assert(want.values.exists(v => v._4 < v._3), "R3 never fired")
  }
}
