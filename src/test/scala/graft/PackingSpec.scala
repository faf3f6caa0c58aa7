package graft

import graft.ext.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the greedy capacity-reset packing fold (q443/q444) on planted
  * fixtures where the pack assignment is hand-computable, plus the
  * invariants any packing must satisfy on the real corpus. */
class PackingSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, Int, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "n", "source")
      .select(col("doc_id"),
        // n whitespace tokens exactly
        concat_ws(" ", transform(sequence(lit(1), col("n")),
          i => concat(lit("t"), i))).as("text"),
        lit("en").as("lang"), col("source"),
        length(col("text")).as("n_chars"))
  }

  private def runQ443(rows: Seq[(Long, Int, String)]) = {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "pack").toString
    docsDf(rows).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Registry.queries("q443_sequence_packing")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("hand-computed greedy walk: resets, oversized singleton, shard boundary") {
    // one source, budget 128, shard = doc_id div 200:
    //   ids 0..3 (ntok 60, 60, 60, 50): 60+60=120 fits, +60 would be 180
    //   -> pack 0 = {60,60}=120; pack 1 = {60,50}=110
    //   id 4: ntok 140 > 128 -> oversized singleton pack 2
    //   id 5: ntok 10 -> pack 3 (started fresh after the oversize)
    //   id 200 starts shard 1 -> pack numbering restarts at 0
    val out = runQ443(Seq(
      (0L, 60, "s"), (1L, 60, "s"), (2L, 60, "s"), (3L, 50, "s"),
      (4L, 140, "s"), (5L, 10, "s"), (200L, 30, "s")))
    assert(out === Seq(
      ("s", 0L, 0L, 2L, 120L),
      ("s", 0L, 1L, 2L, 110L),
      ("s", 0L, 2L, 1L, 140L),
      ("s", 0L, 3L, 1L, 10L),
      ("s", 1L, 0L, 1L, 30L)))
  }

  test("sources pack independently") {
    val out = runQ443(Seq((0L, 100, "a"), (1L, 100, "b")))
    // same shard, different sources: each alone in its own pack 0
    assert(out === Seq(
      ("a", 0L, 0L, 1L, 100L),
      ("b", 0L, 0L, 1L, 100L)))
  }

  test("corpus invariants: token conservation, capacity, contiguous pack ids") {
    val df = Registry.queries("q443_sequence_packing")(spark, sf("0.01"))
      .collect()
    val totalPacked = df.map(_.getLong(4)).sum
    val totalDocs = df.map(_.getLong(3)).sum
    val expected = Tables.documents(spark, sf("0.01"))
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n")), count(lit(1))).collect()(0)
    assert(totalPacked === expected.getLong(0), "every token packed once")
    assert(totalDocs === expected.getLong(1), "every doc packed once")
    // capacity: a pack over budget must be a singleton (oversized doc)
    assert(df.forall(r => r.getLong(4) <= Packing.Budget || r.getLong(3) == 1L),
      "multi-doc packs never exceed the budget")
    // pack ids contiguous from 0 within each (source, shard)
    df.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(2)).sorted
      assert(ids === (0L until ids.length.toLong), "contiguous pack ids")
    }
  }

  test("q444 sweep: utilization falls as budget grows; oversize only at 64") {
    val rows = Registry.queries("q444_packing_efficiency")(spark, sf("0.01"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(64L, 128L, 256L, 512L))
    val nDocs = rows.map(_.getLong(2)).distinct
    assert(nDocs.length === 1, "every budget packs the same docs")
    // corpus docs are 10..99 tokens: only budget 64 can see an oversized
    // singleton, larger budgets never
    rows.filter(_.getLong(0) >= 128L)
      .foreach(r => assert(r.getLong(5) === 0L, "no oversize above 99 tokens"))
  }
}
