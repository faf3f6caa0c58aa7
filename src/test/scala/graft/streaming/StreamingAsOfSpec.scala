package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming as-of twin must reproduce the NATIVE batch operator
  * (`graft.plans.AsOfJoin`) exactly on the real events table — every
  * event enriched with the latest at-or-before purchase — under the
  * established arrival-disorder discipline: sorted chunks, shuffled
  * INSIDE each chunk, so no row is late yet arrival order within a
  * micro-batch is adversarial. Emission must also be FINAL: each probe
  * appears exactly once. */
class StreamingAsOfSpec extends SparkSpec {

  override protected def extraConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private def ckpt() = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), "ckpt").toString

  test("streaming as-of enrichment == native batch as-of join, shuffled arrival") {
    val events = Tables.events(spark, sf())
      .select(col("user_id").cast("long").as("user_id"), col("event_id"),
        col("ts"), unix_micros(col("ts")).as("us"), col("value"),
        col("event_type"))
      .collect()

    val tagged = events.flatMap { r =>
      val probe = AsOfInput(r.getLong(0), is_quote = false, r.getLong(1),
        r.getTimestamp(2), r.getLong(3), r.getDouble(4))
      if (r.getString(5) == "purchase")
        Seq(probe, AsOfInput(r.getLong(0), is_quote = true, -1L,
          r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      else Seq(probe)
    }.sortBy(_.us)

    val rnd = new scala.util.Random(7)
    val chunks = tagged.grouped(math.max(1, tagged.length / 6 + 1)).toSeq
      .map(c => rnd.shuffle(c.toSeq))

    val mem = MemoryStream[AsOfInput](Encoders.product[AsOfInput], spark)
    val q = StreamingAsOf.enrich(mem.toDF())
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").option("checkpointLocation", ckpt()).start()
    try {
      chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      // ratchet the watermark far past the last probe so all timers fire
      val lastUs = tagged.last.us
      (1 to 2).foreach { i =>
        val us = lastUs + 86400000000L * i
        mem.addData(AsOfInput(-999L, is_quote = true, -1L,
          new java.sql.Timestamp(us / 1000), us, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.table("asof_stream")
      .filter(col("k") =!= -999L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)),
         if (r.isNullAt(5)) None else Some(r.getDouble(5))))

    // final emission: each probe exactly once
    assert(streamed.length == events.length,
      s"expected ${events.length} enriched probes, got ${streamed.length}")
    val streamedMap = streamed.toMap

    val ev = Tables.events(spark, sf())
    val batch = graft.plans.AsOfJoin.join(
      ev.select(col("user_id"), col("event_id"), col("ts")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value")),
      "user_id", "ts", Seq("ts" -> "qts", "value" -> "qvalue"))
      .select(col("user_id"), col("event_id"), unix_micros(col("qts")),
        col("qvalue"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)),
         if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

    assert(streamedMap.keySet == batch.keySet)
    streamedMap.foreach { case (k, v) =>
      assert(v == batch(k), s"probe $k: streamed $v != batch ${batch(k)}")
    }
  }
}
