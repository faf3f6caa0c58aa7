package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalMiscSpec extends SparkSpec {

  test("image features: deterministic across runs, right shape") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sf()))
    val a = Multimodal.decodeAndFeaturize(assets).collect().sortBy(_.asset_id)
    val b = Multimodal.decodeAndFeaturize(assets).collect().sortBy(_.asset_id)
    assert(a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.toSeq == y.features.toSeq, s"nondeterministic ${x.asset_id}")
    }
    assert(a.forall(f => f.features.length == 16 && f.width >= 64 && f.channels == 3))
  }

  test("resize: target dimensions honored, deterministic, features re-derived") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sf()))
    val feats = Multimodal.decodeAndFeaturize(assets)
    val a = Multimodal.resize(feats, assets, 64, 64).collect().sortBy(_.asset_id)
    val b = Multimodal.resize(feats, assets, 64, 64).collect().sortBy(_.asset_id)
    assert(a.length == 500)
    assert(a.forall(f => f.width == 64 && f.height == 64 && f.features.length == 16))
    a.zip(b).foreach { case (x, y) =>
      assert(x.features.toSeq == y.features.toSeq)
    }
  }

  test("frame sampling: only video assets, bounded frames, slices line up") {
    val assets = Multimodal.syntheticAssets(Tables.documents(spark, sf()))
    val frames = Multimodal.sampleFrames(assets, stride = 8, maxFrames = 4).collect()
    val videoIds = assets.collect().filter(_.modality == "video").map(_.asset_id).toSet
    assert(frames.map(_.asset_id).toSet.subsetOf(videoIds))
    assert(frames.groupBy(_.asset_id).values.forall(_.length <= 4))
    assert(frames.filter(_.frame_index == 0).forall(_.frame_bytes.nonEmpty))
  }

  test("multimodal features flow into the ANN operator") {
    val feats = Multimodal.decodeAndFeaturize(
      Multimodal.syntheticAssets(Tables.documents(spark, sf())))
    val emb = feats.toDF().select(col("asset_id").as("vec_id"),
      Similarity.toDouble(col("features")).as("v"))
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val knn = Similarity.annTopK(emb, probes, 5, Similarity.hyperplanes(32, 16), 8)
    assert(knn.count() > 0)
  }

  test("approx distinct: exact counts match and HLL++ is within its 5% bound") {
    val rows = Registry.queries("q42_approx_distinct")(spark, sf("0.01")).collect()
    val exact = Tables.lineitem(spark, sf("0.01"))
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == exact(k), s"$k exact counts drifted")
      assert(r.getBoolean(3), s"$k orders estimate outside 5%")
      assert(r.getBoolean(4), s"$k parts estimate outside 5%")
    }
  }

  test("language id marks english-marker docs and never leaves the domain") {
    val df = Registry.queries("q44_language_id")(spark, sf())
    val langs = df.select("guessed_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de", "es", "unknown")))
    assert(df.filter(col("guessed_lang") === "en").count() > 0)
  }
}
