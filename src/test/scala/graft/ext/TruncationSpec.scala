package graft.ext

import graft.{Registry, SparkSpec}

/** Planted pin for q439: a corpus where the only distinguishing signal
  * of one true neighbor lives at dim 40 — every truncated width must
  * lose exactly that neighbor (recall 0.9), and the ten early-dim
  * decoys must fill the truncated ranking. Hand-computed end to end.
  */
class TruncationSpec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_trunc").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private def vec(assign: (Int, Float)*): Array[Float] = {
    val v = new Array[Float](64)
    assign.foreach { case (i, x) => v(i) = x }
    v
  }

  test("q439: a dim-40 neighbor is lost at every truncated width (recall 0.9)") {
    import spark.implicits._
    // probe 0 = e0 + e40. Corpus (ids >= 10 so only vec 0 is a probe):
    //   10: e0 + e40          full cos 1.0      trunc cos 1.0
    //   11..20: e0 - e40      full cos 0.0      trunc cos 1.0 (decoys)
    //   21: e0 + e1 + e40     full cos 0.8165   trunc cos 0.7071
    // full top-10 = {10, 21, 11..18}; truncated top-10 = {10, 11..19}
    // (all widths — nothing lives in dims 8..39) -> overlap 9.
    val rows = Seq((0L, vec(0 -> 1f, 40 -> 1f), 0)) ++
      Seq((10L, vec(0 -> 1f, 40 -> 1f), 0)) ++
      (11L to 20L).map(i => (i, vec(0 -> 1f, 40 -> -1f), 0)) ++
      Seq((21L, vec(0 -> 1f, 1 -> 1f, 40 -> 1f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = byName("q439_truncation_recall")
      .run(spark, plantDir("embeddings" -> df)).collect()
    assert(got.length == 3)
    got.zip(Seq(8L, 16L, 32L)).foreach { case (r, dims) =>
      assert(r.getAs[Long]("dims") == dims)
      assert(r.getAs[Long]("query_id") == 0L)
      assert(r.getAs[Long]("n_overlap") == 9L, s"dims=$dims: ${r}")
      assert(r.getAs[Double]("recall_at_10") == 0.9)
    }
  }
}
