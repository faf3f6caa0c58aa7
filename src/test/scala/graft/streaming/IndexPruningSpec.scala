package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 scale pin for the persistent streaming indexes: the
  * per-batch probe reads must PRUNE to the colliding buckets instead of
  * re-reading the whole corpus index (the round-8 scale-killer). Two
  * layers: the probe scan's plan carries a partition filter on the
  * bucket column, and the files that actually produce rows all live
  * under the probed buckets' directories. Plus compaction: after
  * [[StreamingSetJoin.compact]] each bucket holds ONE parquet file and
  * content is unchanged. */
class IndexPruningSpec extends SparkSpec {

  private def tmp(prefix: String) = java.nio.file.Files
    .createTempDirectory(java.nio.file.Paths.get("target"), prefix).toString

  test("probeIndex prunes the postings scan to the colliding buckets") {
    import spark.implicits._
    val dir = tmp("prune_post") + "/idx"
    // 4,000 postings spread over every bucket
    val pref = (0L until 4000L).map(i => (i * 2654435761L % 100000L, i, 40L))
      .toDF("sh", "doc_id", "n")
    StreamingSetJoin.primePostings(pref, dir)
    val allBuckets = spark.read.parquet(dir)
      .select(col("pb")).distinct().count()
    assert(allBuckets == StreamingSetJoin.Buckets,
      s"fixture must populate every bucket, got $allBuckets")

    val probed = StreamingSetJoin.probeIndex(spark, dir, "pb", Seq(3L, 7L),
      "sh BIGINT, doc_id BIGINT, n BIGINT, pb INT")
    // 1. the scan prunes at plan level: partition filter on pb
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pb"),
      s"probe scan must carry a partition filter on pb:\n$plan")
    // 2. only files under pb=3/pb=7 produce rows
    val files = probed.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => f.contains("pb=3") || f.contains("pb=7")),
      s"rows must come only from the probed buckets: ${files.take(3).mkString(",")}")
    // 3. the probed rows are exactly the colliding-bucket subset
    val expected = pref.filter(pmod(col("sh"), lit(StreamingSetJoin.Buckets))
      .isin(3L, 7L)).count()
    assert(probed.count() == expected)
  }

  test("compact rewrites each bucket to one file, content unchanged") {
    import spark.implicits._
    val dir = tmp("prune_compact") + "/idx"
    // three appends = three files per touched bucket
    (1 to 3).foreach { r =>
      val part = ((r * 1000L) until (r * 1000L + 500L))
        .map(i => (i % 1000L, i, 10L)).toDF("sh", "doc_id", "n")
      StreamingSetJoin.primePostings(part, dir)
    }
    val before = spark.read.parquet(dir)
      .select(col("sh"), col("doc_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val filesBefore = spark.read.parquet(dir).inputFiles.length
    StreamingSetJoin.compact(spark, dir, "pb")
    val after = spark.read.parquet(dir)
      .select(col("sh"), col("doc_id"), col("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val filesAfter = spark.read.parquet(dir).inputFiles.length
    assert(after == before, "compaction must not change index content")
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
    assert(filesAfter <= StreamingSetJoin.Buckets,
      s"one file per bucket expected, got $filesAfter")
  }

  test("ANN index read prunes to the probed cells") {
    import spark.implicits._
    val dir = tmp("prune_ann") + "/idx"
    val assigned = (0L until 600L)
      .map(i => (i, Seq(i.toDouble, 1.0), i % 6L)).toDF("vec_id", "v", "cell")
    StreamingAnn.writeIndex(assigned, dir)
    val probed = StreamingSetJoin.readOrEmpty(spark, dir,
        "vec_id BIGINT, v ARRAY<DOUBLE>, cell BIGINT")
      .filter(col("cell").isin(2L, 4L))
    val files = probed.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(f =>
      f.contains("cell=2") || f.contains("cell=4")),
      s"ANN probe must read only the probed cells: ${files.take(3).mkString(",")}")
    assert(probed.count() == 200)
  }
}
