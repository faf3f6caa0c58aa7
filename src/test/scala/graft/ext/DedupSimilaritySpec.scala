package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Behavioral tests for the fuzzy ops on synthetic near-duplicates (the
  * driver corpus is all-distinct, so the oracle only proves the
  * computation, not the catch-rate). */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "while the cat sleeps near the warm fire in the old stone house"

  private lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact dup
    (2L, base.replace("quick", "fast")), // near dup, 1 token of 26
    (3L, base.replace("lazy dog", "sly wolf")), // near dup, 2 tokens
    (4L, "completely different content about spark engines and parquet files " +
      "with columnar storage formats and vectorized execution kernels all day"),
    (5L, "yet another unrelated document discussing watermarks state stores " +
      "and streaming aggregation semantics for event time processing pipelines"))
    .toDF("doc_id", "text")

  test("minhash-LSH finds the planted near-dups and skips unrelated docs") {
    val pairs = Dedup.jaccard(
      Dedup.lshCandidates(Dedup.minhashSignatures(docs)),
      Dedup.docShingles(docs))
      .select("doc_a", "doc_b", "jaccard")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 1.0, "exact dup must hit")
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) > 0.7, "1-token edit must hit")
    assert(!pairs.keys.exists { case (a, b) => b >= 4L && a < 4L },
      s"unrelated docs must not pair: ${pairs.keys}")
  }

  test("simhash: near-dups within small hamming distance, unrelated far") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(1L)) == 0)
    assert(ham(sig(0L), sig(2L)) <= 6, s"near-dup hamming ${ham(sig(0L), sig(2L))}")
    assert(ham(sig(0L), sig(4L)) >= 8, s"unrelated hamming ${ham(sig(0L), sig(4L))}")
  }

  test("LSH ANN reaches >= 0.6 mean recall@5 vs brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val approx = Similarity.annTopK(emb, probes, 5, Similarity.hyperplanes(32, 64), tables = 8)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = graft.Registry.queries("q33_knn_cosine")(spark, sf())
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }

  test("IVF ANN reaches >= 0.5 mean recall@5 with nprobe=4 of 16 cells") {
    val emb = Tables.embeddings(spark, sf())
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // deterministic centroids: a fixed spread of corpus vectors
    val centroids = emb.filter(col("vec_id") % 31 === 0).limit(16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val approx = Similarity.ivfTopK(emb, probes, 5, centroids, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = graft.Registry.queries("q33_knn_cosine")(spark, sf())
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"IVF mean recall@5 = $mean")
  }

  test("q35 on the driver corpus is consistent: all candidate pairs verified") {
    val df = graft.Registry.queries("q35_lsh_neardup_pairs")(spark, sf())
    // every emitted pair must have sane jaccard bounds
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("q140 SemDeDup: one verdict per vector, keep-lowest-id holds per cell") {
    val v = graft.Registry.queries("q140_semantic_dedup")(spark, sf()).cache()
    assert(v.count() == graft.Tables.embeddings(spark, sf()).count())
    // a dropped vector points at a lower id in the SAME cell
    val bad = v.filter(col("verdict") === "dropped").as("d")
      .join(v.as("k"), col("d.duplicate_of") === col("k.vec_id"))
      .filter(col("k.cell") =!= col("d.cell") ||
        col("d.duplicate_of") >= col("d.vec_id"))
    assert(bad.count() == 0, "duplicate_of must be a lower id in the same cell")
    // kept vectors carry the -1 sentinel; the lowest id of every cell
    // can never be dropped (it has no lower-id cluster-mate)
    assert(v.filter(col("verdict") === "kept" && col("duplicate_of") =!= -1L)
      .count() == 0)
    val cellMins = v.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(cellMins.join(v.filter(col("verdict") === "dropped"),
      Seq("cell", "vec_id")).count() == 0)
    v.unpersist()
  }
}
