package graft.ext

import graft.{Registry, SparkSpec}

/** Planted-fixture pins for batch 52: q379 Grubbs outlier test, q380
  * Honoré/Sichel vocabulary richness, q381 Allan variance, q382 Hopkins
  * clustering tendency.
  */
class Batch52Spec extends SparkSpec {

  private val byName = Registry.all.map(q => q.name -> q).toMap

  private def plantDir(tables: (String, org.apache.spark.sql.DataFrame)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_b52").toString
    tables.foreach { case (n, df) => df.write.mode("overwrite").parquet(s"$dir/$n.parquet") }
    dir
  }

  private val base = 1704067200000L
  private val dayMs = 86400000L
  private var id = 0L
  private def evAt(u: Long, ms: Long, t: String = "view") = {
    id += 1; (id, new java.sql.Timestamp(ms), u, t, 1.0, "{}")
  }
  private def toEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("q379: one 30-event day among nine 10-event days pins G = 2.846") {
    // y = [10 x9, 30]: mean 12, s = sqrt(40), maxdev |y-mean| = 18 at the
    // planted day -> G = 18/sqrt(40) = 2.8460...
    val rows = (0 until 10).flatMap { day =>
      val k = if (day == 5) 30 else 10
      (1 to k).map(i => evAt(i.toLong, base + day * dayMs))
    }
    val r = byName("q379_grubbs").run(spark, plantDir("events" -> toEvents(rows))).head()
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("peak_day") == base / dayMs + 5)
    assert(r.getAs[Long]("peak_y") == 30L)
    assert(math.abs(r.getAs[Double]("g_stat") - 2.846) < 1e-9)
  }

  test("q380: all-hapax source yields NULL R; a 2-dis-legomena source pins R=100 ln N, S=2/3") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c", "en", "srcA", 5L),          // V=3, V1=3 -> R NULL
      (2L, "a a b", "en", "srcB", 5L),          // srcB: a:2 b:2 c:3
      (3L, "b c c c", "en", "srcB", 7L))        //   V=3, V1=0, V2=2, N=7
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = byName("q380_vocab_richness").run(spark, plantDir("documents" -> d))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("srcA").isNullAt(rows("srcA").fieldIndex("honore_r")))
    assert(rows("srcA").getAs[Long]("v1") == 3L)
    // R = 100 * ln 7 * 3 / 3 = 194.5910...
    assert(math.abs(rows("srcB").getAs[Double]("honore_r") - 194.591) < 1e-3)
    assert(math.abs(rows("srcB").getAs[Double]("sichel_s") - 0.666667) < 1e-9)
    assert(rows("srcB").getAs[Long]("n_tokens") == 7L)
  }

  test("q381: an alternating 10/20 fortnight has AVAR 50 at tau=1 and 0 at even taus") {
    val rows = (0 until 16).flatMap { day =>
      val k = if (day % 2 == 0) 10 else 20
      (1 to k).map(i => evAt(i.toLong, base + day * dayMs))
    }
    val out = byName("q381_allan_variance")
      .run(spark, plantDir("events" -> toEvents(rows))).collect()
      .map(r => r.getAs[Long]("tau") -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 8L))
    assert(out(1L).getAs[Long]("n_diffs") == 15L)
    assert(out(1L).getAs[Long]("sum_d2") == 1500L)
    assert(math.abs(out(1L).getAs[Double]("avar") - 50.0) < 1e-9)
    // pairs of adjacent days all sum to 30: the oscillation aliases out
    assert(out(2L).getAs[Double]("avar") == 0.0)
    assert(out(4L).getAs[Double]("avar") == 0.0)
    assert(out(8L).getAs[Long]("n_diffs") == 1L)
    assert(out(8L).getAs[Double]("avar") == 0.0)
  }

  test("q382: two tight far-apart blobs read as clustered (H > 0.9); a uniform grid does not") {
    import spark.implicits._
    // 128 points in two radius-0.01 blobs at (0,0) and (10,10): probe
    // NN distances are box-scale, real NN distances are blob-scale
    def blob(cx: Float, off: Int) = (0 until 64).map { k =>
      ((off + k).toLong,
        Array(cx + 0.0001f * k, cx - 0.0001f * k), 0)
    }
    val clustered = (blob(0f, 0) ++ blob(10f, 64))
      .toDF("vec_id", "embedding", "label")
    val rc = byName("q382_hopkins").run(spark, plantDir("embeddings" -> clustered)).head()
    assert(rc.getAs[Long]("n_points") == 128L)
    assert(rc.getAs[Long]("m_probes") == 64L)
    assert(rc.getAs[Double]("hopkins") > 0.9)
    // 16x16 unit lattice: HYPER-uniform, i.e. more regular than a
    // Poisson scatter. Real-point NN distance is the full spacing
    // (w = 1) while a uniform probe lands ~1/6 mean-squared from its
    // nearest lattice site, so H ~ (1/6)/(1/6 + 1) = 0.143 — well
    // BELOW the 0.5 of true randomness, and nowhere near clustered.
    val grid = (for (i <- 0 until 16; j <- 0 until 16)
      yield ((i * 16 + j).toLong, Array(i.toFloat, j.toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    val rg = byName("q382_hopkins").run(spark, plantDir("embeddings" -> grid)).head()
    val h = rg.getAs[Double]("hopkins")
    assert(h > 0.08 && h < 0.25, s"lattice Hopkins $h out of the hyper-uniform band")
  }
}
