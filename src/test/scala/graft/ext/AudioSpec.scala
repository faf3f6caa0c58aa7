package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the q153 audio-feature pass (value parity vs DuckDB
  * is the oracle gate's job; these pin the signal algebra itself). */
class AudioSpec extends SparkSpec {

  private def run() =
    Registry.queries("q153_audio_features")(spark, sf()).collect()

  test("q153: one row per audio asset, with conserved sample counts") {
    val rows = run()
    val nAudio = Tables.documents(spark, sf())
      .filter(col("doc_id") % 3 === 1).count()
    assert(rows.length == nAudio.toInt)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_samples")
      val f = r.getAs[Long]("n_frames")
      // 64-sample frames tile the signal exactly
      assert(f == (n + 63) / 64, s"asset ${r.get(0)}: $f frames for $n samples")
      // a zero crossing needs a predecessor: at most n-1 of them
      assert(r.getAs[Long]("zero_crossings") < n)
      assert(r.getAs[Long]("loudest_frame") < f)
    }
  }

  test("q153: energy bounds and integer mean-square are consistent") {
    run().foreach { r =>
      val n = r.getAs[Long]("n_samples")
      val e = r.getAs[Long]("total_energy")
      val pk = r.getAs[Int]("peak_amp").toLong
      assert(pk <= 128, "stub PCM is signed-8-bit")
      assert(e <= n * pk * pk, "frame energy cannot exceed n * peak^2")
      assert(r.getAs[Long]("mean_square_micro") == e * 1000000L / n)
    }
  }

  test("q153: zero crossings actually occur (stub waveform is not one-sided)") {
    val rows = run()
    assert(rows.forall(_.getAs[Long]("zero_crossings") > 0),
      "the (byte*131 + p*17) mod 256 - 128 stub must produce sign structure")
  }
}
