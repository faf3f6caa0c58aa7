package graft.ext

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the record-linkage and perceptual-hash operators
  * (value parity vs DuckDB is covered by the oracle gate; these pin
  * the recall/precision relations the oracle can't see). */
class LinkagePhashSpec extends SparkSpec {

  test("q148 linkage: blocking is lossless vs exhaustive all-pairs on shared tokens") {
    val out = Registry.queries("q148_fuzzy_linkage")(spark, sf()).cache()
    // precision: reported pairs are ordered, within distance, and honest
    assert(out.filter(col("name_a") >= col("name_b")).count() == 0)
    assert(out.filter(col("dist") > 4).count() == 0)
    val reLev = out.filter(
      levenshtein(col("name_a"), col("name_b")) =!= col("dist")).count()
    assert(reLev == 0, "reported dist must equal recomputed levenshtein")
    // recall: on the distinct-name universe (small by construction — the
    // catalog reuses names), brute-force every pair; any pair within
    // distance 4 that shares a first or last token MUST be reported
    val names = Tables.part(spark, sf()).select(col("p_name")).distinct()
      .select(col("p_name").as("name"),
        element_at(split(col("p_name"), " "), 1).as("tf"),
        element_at(split(col("p_name"), " "), -1).as("tl"))
    val exhaustive = names.as("a").crossJoin(names.as("b"))
      .filter(col("a.name") < col("b.name") &&
        (col("a.tf") === col("b.tf") || col("a.tl") === col("b.tl")) &&
        levenshtein(col("a.name"), col("b.name")) <= 4)
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
    val missed = exhaustive.join(out.select("name_a", "name_b"),
      Seq("name_a", "name_b"), "left_anti").count()
    assert(missed == 0, s"blocking dropped $missed true pairs")
    out.unpersist()
  }

  test("q149 phash: bands are 16-bit, popcnt consistent, one row per image asset") {
    val bands = Registry.queries("q149_phash_bands")(spark, sf()).cache()
    val images = Tables.documents(spark, sf())
      .filter(col("doc_id") % 3 === 0).count()
    assert(bands.count() == images, "one hash row per image-modality asset")
    for (b <- Seq("band0", "band1", "band2", "band3"))
      assert(bands.filter(col(b) < 0 || col(b) > 65535).count() == 0,
        s"$b escaped its 16-bit range")
    val badPop = bands.filter(col("popcnt") =!=
      expr("bit_count(band0) + bit_count(band1) + bit_count(band2) + bit_count(band3)")
        .cast("int")).count()
    assert(badPop == 0)
    bands.unpersist()
  }

  test("q150 phash near-dup: pigeonhole recall at Hamming <= 3, exact verify at <= 16") {
    val pairs = Registry.queries("q150_phash_neardup")(spark, sf()).cache()
    assert(pairs.filter(col("hamming") > 16 || col("hamming") < 0).count() == 0)
    assert(pairs.filter(col("asset_a") >= col("asset_b")).count() == 0)
    // pigeonhole: 64 bits in 4 bands — any pair at Hamming distance <= 3
    // leaves at least one band untouched, so the banded join MUST emit it
    val bands = Registry.queries("q149_phash_bands")(spark, sf())
      .select("asset_id", "band0", "band1", "band2", "band3")
    val close = bands.as("x").crossJoin(bands.as("y"))
      .filter(col("x.asset_id") < col("y.asset_id"))
      .withColumn("h", expr(
        """cast(bit_count(x.band0 ^ y.band0) + bit_count(x.band1 ^ y.band1)
           + bit_count(x.band2 ^ y.band2) + bit_count(x.band3 ^ y.band3) as int)"""))
      .filter(col("h") <= 3)
      .select(col("x.asset_id").as("asset_a"), col("y.asset_id").as("asset_b"),
        col("h"))
    val missed = close.join(pairs.select("asset_a", "asset_b"),
      Seq("asset_a", "asset_b"), "left_anti").count()
    assert(missed == 0, s"banded join missed $missed pairs with Hamming <= 3")
    pairs.unpersist()
  }
}
