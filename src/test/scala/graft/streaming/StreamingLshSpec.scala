package graft.streaming

import graft.{SparkSpec, Tables}
import graft.ext.Dedup
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class LshDoc(doc_id: Long, text: String)

/** Parity pin for the streaming MinHash-LSH twin: ingesting the REAL
  * documents table in doc_id order (so "earlier" is globally the
  * smaller id, matching the operator's within-batch orientation) must
  * reproduce, for every doc, the batch-derived best-earlier-candidate —
  * computed inline from the SAME `Dedup.minhashSignatures` output: a
  * candidate is any earlier doc sharing ≥ 1 LSH band; the verdict is
  * the max signature-agreement estimate with ties to the smallest old
  * id. Batch-slicing independence comes free: the comparison holds for
  * whatever chunking the harness picks. */
class StreamingLshSpec extends SparkSpec {

  private def tmp(prefix: String) = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  test("streaming LSH near-dup verdicts == batch band-join semantics") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .collect().map(r => LshDoc(r.getLong(0), r.getString(1)))
      .sortBy(_.doc_id)

    // unseeded index root (the documented contract): readOrEmpty serves
    // typed empty frames until the first batch writes the partitioned parts
    val sigDir = tmp("lshsig") + "/idx"; val verdictDir = tmp("lshver")

    val mem = MemoryStream[LshDoc](Encoders.product[LshDoc], spark)
    val q = StreamingLsh.start(mem.toDF(), sigDir, verdictDir, tmp("lshckpt"))
    try docs.grouped(140).foreach { c => mem.addData(c); q.processAllAvailable() }
    finally q.stop()

    val got = spark.read.parquet(verdictDir)
      .select(col("doc_id"), col("old_id"), col("est_jaccard"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap

    // inline batch twin from the same signature function
    val sigRows = Dedup.minhashSignatures(
      Tables.documents(spark, sf())
        .select(col("doc_id").cast("long").as("doc_id"), col("text")))
      .collect()
      .map(r => r.getLong(0) -> (0 until Dedup.K).map(k =>
        r.getLong(r.fieldIndex(s"m$k"))).toArray)
      .sortBy(_._1)
    val rows = Dedup.K / Dedup.Bands
    def bands(sig: Array[Long]): Seq[(Int, Long)] =
      (0 until Dedup.Bands).map(b => b -> (0 until rows)
        .map(r => sig(b * rows + r) * math.pow(2, 31 * r).toLong).sum)
    val expected = sigRows.zipWithIndex.map { case ((id, sig), i) =>
      val myBands = bands(sig).toSet
      val cands = sigRows.take(i).filter { case (_, old) =>
        bands(old).exists(myBands.contains)
      }
      val best = cands.map { case (oid, old) =>
        val est = sig.zip(old).count { case (x, y) => x == y }.toDouble / Dedup.K
        (oid, est)
      }.sortBy { case (oid, est) => (-est, oid) }.headOption
      id -> best
    }.toMap

    assert(got.keySet == expected.keySet,
      s"verdict universes differ: stream-only=${(got.keySet -- expected.keySet).take(3)} " +
        s"batch-only=${(expected.keySet -- got.keySet).take(3)}")
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: streamed $v != batch ${expected(id)}")
    }
    // sanity: the real table must actually contain near-dup signal
    assert(got.values.count(_.isDefined) > 0)
  }
}
