package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the round-3 corpus-prep operators (value parity vs
  * DuckDB is covered by the oracle gate; these pin the relations the
  * oracle can't see). */
class CorpusSpec extends SparkSpec {

  test("q84 clusters: min-labeled, size >= 2, consistent with q80 survivors") {
    val cl = Registry.queries("q84_dup_clusters")(spark, sf()).cache()
    // cluster_id is the min member: <= every member, present as a member
    assert(cl.filter(col("cluster_id") > col("doc_id")).count() == 0)
    val ids = cl.select("doc_id").collect().map(_.getLong(0)).toSet
    val roots = cl.select("cluster_id").collect().map(_.getLong(0)).toSet
    assert(roots.subsetOf(ids), "a cluster_id is not itself a member")
    // every cluster has >= 2 members (nodes come from verified pairs)
    assert(cl.filter(col("cluster_size") < 2).count() == 0)
    // transitive closure can only merge, never split: every doc q80
    // dropped (has a direct smaller near-dup) must be clustered, with
    // cluster_id <= its q80 dup_of
    val q80 = Registry.queries("q80_neardup_survivors")(spark, sf())
    val dropped = q80.filter(!col("kept"))
      .select(col("doc_id"), col("dup_of"))
    val joined = dropped.join(cl, Seq("doc_id"), "left")
    assert(joined.filter(col("cluster_id").isNull).count() == 0,
      "q80-dropped doc missing from q84 clusters")
    assert(joined.filter(col("cluster_id") > col("dup_of")).count() == 0,
      "cluster root larger than direct dup_of")
    cl.unpersist()
  }

  test("q85 packing conserves docs and tokens") {
    val bins = Registry.queries("q85_pack_bins")(spark, sf())
    val docs = Tables.documents(spark, sf())
    val totalDocs = docs.count()
    val totalToks = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val agg = bins.agg(sum("n_docs"), sum("n_tokens")).head
    assert(agg.getLong(0) == totalDocs)
    assert(agg.getLong(1) == totalToks)
    // bin ids are dense from 0 within each source
    val bad = bins.groupBy("source")
      .agg(min("bin_id").as("mn"), max("bin_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0, "bin ids not dense per source")
  }

  test("q86 vocabulary: OOV of a vocab token is zero, rates in [0,1]") {
    val r = Registry.queries("q86_vocab_oov")(spark, sf())
    assert(r.filter(col("n_oov") > col("n_tokens")).count() == 0)
    assert(r.filter(col("oov_rate") < 0 || col("oov_rate") > 1).count() == 0)
  }

  test("q87 inverted index: df = postings length, postings sorted distinct") {
    val idx = Registry.queries("q87_inverted_index")(spark, sf())
      .withColumn("plist", split(col("postings"), ",").cast("array<long>"))
    assert(idx.filter(col("df") =!= size(col("plist"))).count() == 0)
    assert(idx.filter(col("plist") =!= sort_array(col("plist"))).count() == 0)
    assert(idx.filter(size(array_distinct(col("plist"))) =!= size(col("plist")))
      .count() == 0)
    // total_tf >= df always (a doc contributes at least one occurrence)
    assert(idx.filter(col("total_tf") < col("df")).count() == 0)
  }

  test("q88 quantization: 64 codes per vector, codes in [0,255], small error") {
    val q = Registry.queries("q88_quantize_int8")(spark, sf())
      .withColumn("codes", split(col("qvec"), ",").cast("array<long>"))
    assert(q.filter(size(col("codes")) =!= 64).count() == 0)
    assert(q.filter(exists(col("codes"), c => c < 0 || c > 255)).count() == 0)
    // affine int8 over [mn,mx] bounds the error by (mx-mn)/255/2 per dim;
    // embeddings are unit-ish floats, so a loose absolute cap holds
    assert(q.filter(col("max_abs_err") > 0.05).count() == 0)
  }

  test("q90 surprisal: positive, bounded by ln(vocab), frequent docs cheap") {
    val r = Registry.queries("q90_unigram_surprisal")(spark, sf())
    val vocab = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    val cap = math.log(vocab.toDouble) + 1e-9
    assert(r.filter(col("avg_surprisal") <= 0).count() == 0)
    // avg -ln p can exceed ln(vocab) only if p were below uniform-min;
    // a unigram model over its own corpus keeps every doc under the
    // worst single-token surprisal
    val worst = -math.log(1.0 / Tables.documents(spark, sf())
      .select(sum(size(split(col("text"), " ")))).head.getLong(0).toDouble)
    assert(r.filter(col("avg_surprisal") > worst).count() == 0,
      s"surprisal above worst-token bound $worst (vocab cap was $cap)")
  }

  test("q91 hard negatives: labels verified against the embeddings table") {
    val r = Registry.queries("q91_hard_negatives")(spark, sf())
    val lab = Tables.embeddings(spark, sf()).select(col("vec_id"), col("label"))
    // positive shares the probe's label
    assert(r.join(lab.withColumnRenamed("vec_id", "positive_id")
        .withColumnRenamed("label", "p_label"), Seq("positive_id"))
      .filter(col("p_label") =!= col("label")).count() == 0)
    // negative does not
    assert(r.join(lab.withColumnRenamed("vec_id", "negative_id")
        .withColumnRenamed("label", "n_label"), Seq("negative_id"))
      .filter(col("n_label") === col("label")).count() == 0)
  }

  test("q92 centroids: 64 dims x all labels, mean within [min,max]") {
    val r = Registry.queries("q92_label_centroids")(spark, sf())
    val labels = Tables.embeddings(spark, sf()).select("label").distinct().count()
    assert(r.count() == labels * 64)
    assert(r.filter(col("mean_x") < col("min_x") - 1e-6 ||
      col("mean_x") > col("max_x") + 1e-6).count() == 0)
  }

  test("curated corpus materializes partitioned by source; re-read prunes partitions") {
    // the write side of the pipeline: selected docs land as
    // source-partitioned parquet (the layout a 100 TB corpus ships),
    // and a per-source consumer reads ONLY its partition — asserted on
    // the executed plan's PartitionFilters, not just the row counts
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "curated").toString
    val docs = Tables.documents(spark, sf())
    val selected = Registry.queries("q89_curation_pipeline")(spark, sf())
      .filter(col("selected")).select("doc_id")
    val curated = docs.join(selected, Seq("doc_id"))
    curated.write.mode("overwrite").partitionBy("source").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() == curated.count())
    val one = back.filter(col("source") === "src1")
    val plan = one.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"no partition pruning in plan:\n${plan.take(600)}")
    assert(one.count() ==
      curated.filter(col("source") === "src1").count())
  }

  test("range-partitioned export: files hold disjoint doc_id ranges") {
    // the other 100 TB output layout: repartitionByRange + in-partition
    // sort gives globally ordered shards whose key ranges don't overlap
    // (consumers can binary-search the file list). Asserted on actual
    // per-file min/max, not on the plan.
    val out = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "ranged").toString
    Tables.documents(spark, sf())
      .repartitionByRange(4, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode("overwrite").parquet(out)
    val perFile = spark.read.parquet(out)
      .select(col("doc_id"), input_file_name().as("f"))
      .groupBy(col("f"))
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(perFile.length >= 2, "expected multiple range files")
    perFile.sliding(2).foreach { case Array((_, mxA), (mnB, _)) =>
      assert(mxA < mnB, s"overlapping ranges: $perFile")
    }
  }

  test("q93 overlap matrix: full upper triangle, jaccard in [0,1]") {
    val m = Registry.queries("q93_source_overlap")(spark, sf())
    val nSrc = Tables.documents(spark, sf()).select("source").distinct().count()
    assert(m.count() == nSrc * (nSrc - 1) / 2,
      "missing source pairs (corpus sources always share some shingle)")
    assert(m.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(m.filter(col("n_inter") > col("n_a") || col("n_inter") > col("n_b"))
      .count() == 0)
  }

  test("q94 vocab drift: total KL non-negative (Gibbs), counts conserved") {
    val r = Registry.queries("q94_vocab_drift")(spark, sf()).cache()
    assert(r.agg(sum("kl_contrib_pico")).head.getLong(0) >= 0L)
    val toks = Tables.documents(spark, sf())
      .select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(r.agg(sum(col("n_a") + col("n_b"))).head.getLong(0) == toks)
    r.unpersist()
  }

  test("q89 curation: stage flags consistent with the standalone operators") {
    val cur = Registry.queries("q89_curation_pipeline")(spark, sf()).cache()
    val q80 = Registry.queries("q80_neardup_survivors")(spark, sf())
      .select(col("doc_id"), col("kept"))
    assert(cur.join(q80, Seq("doc_id"))
      .filter(col("dedup_kept") =!= col("kept")).count() == 0)
    val q81 = Registry.queries("q81_decontaminate")(spark, sf())
      .select(col("doc_id"), col("contaminated"))
    assert(cur.join(q81, Seq("doc_id"))
      .filter(col("decontaminated") === col("contaminated")).count() == 0)
    // selected implies every stage passed and not benchmark
    assert(cur.filter(col("selected") &&
      (col("is_benchmark") || !col("quality_ok") || !col("not_repetitive") ||
        !col("dedup_kept") || !col("decontaminated"))).count() == 0)
    // benchmark docs are never selected
    assert(cur.filter(col("is_benchmark") && col("selected")).count() == 0)
    cur.unpersist()
  }
}
