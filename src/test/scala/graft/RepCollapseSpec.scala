package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equality pin for the round-8 rep-collapse re-plans: on a
  * DUPLICATE-HEAVY corpus (the regime the sf oracles barely exercise —
  * sf0.01 has zero duplicate texts), q35/q224/q225/q257 must equal the
  * ORIGINAL doc-level pipeline computed directly here (the exact code
  * the queries ran before round 8). The fixture plants near-dup text
  * families replicated 5–9× with interleaved ids, so every multiplicity
  * branch fires: same-group pairs, cross-group expansion with both id
  * orientations, groups of size 1, and an oversize spread of group
  * sizes. */
class RepCollapseSpec extends SparkSpec {
  import graft.ext.Dedup

  /** Near-dup families: base sentences long enough to shingle, with a
    * one-token variant inside each family so cross-group candidate
    * pairs exist; each (family, variant) text replicated `copies`
    * times with ids interleaved ACROSS groups (rep of one group can sit
    * between members of another). */
  private lazy val dir: String = {
    val base = Seq(
      "the quick brown fox jumps over the lazy dog near the river bank today",
      "the quick brown fox jumps over the lazy dog near the river bend today",
      "a completely different document about spark physical plans and shuffles",
      "a completely different document about spark logical plans and shuffles",
      "short one",  // < 3 tokens: no shingles, must stay out of every pair
      "unique text with no duplicate copies anywhere in this corpus at all")
    val copies = Seq(7, 5, 9, 6, 3, 1)
    val rows = for {
      (t, i) <- base.zipWithIndex
      c <- 0 until copies(i)
    } yield (c.toLong * 100 + i, t, "en", s"src${i % 2}", t.length.toLong)
    import spark.implicits._
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "repc").toString
    df.write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** The PRE-round-8 doc-level pipeline, reproduced verbatim: full
    * corpus signatures → banded candidates → exact Jaccard. */
  private def docLevel(s: SparkSession): DataFrame = {
    val hashed = Dedup.docShingles(Tables.documents(s, dir))
      .select(col("doc_id"), Dedup.hp(col("sh")).as("sh"))
    val sigs = Dedup.minhashSignatures(Tables.documents(s, dir))
    Dedup.jaccard(Dedup.lshCandidates(sigs), hashed)
  }

  private def collectSorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("q35 expansion equals the doc-level candidate join on heavy duplication") {
    val expected = docLevel(spark)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
        col("n_b"), graft.Num.r4(col("jaccard")).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    val actual = Registry.queries("q35_lsh_neardup_pairs")(spark, dir)
    assert(collectSorted(actual) === collectSorted(expected))
    // sanity: the fixture actually exercises multiplicity
    assert(actual.count() > 50, "fixture must produce a dense pair set")
  }

  test("q224 multiplicity aggregation equals the doc-level calibration") {
    val sigs = Dedup.minhashSignatures(Tables.documents(spark, dir))
    val ex = docLevel(spark)
      .select(col("doc_a"), col("doc_b"),
        floor(col("jaccard") * 1000000 + lit(0.500001)).cast("long").as("exq"))
    val matches = (0 until Dedup.K)
      .map(k => when(col(s"sa.m$k") === col(s"sb.m$k"), 1).otherwise(0))
      .reduce(_ + _)
    val expected = ex
      .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("exq"), matches.as("matches"))
      .groupBy(col("matches"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("exq")).as("sumex"),
        sum(abs(col("matches").cast("long") * lit(125000L) - col("exq")))
          .as("sumae"))
      .select(col("matches"), (col("matches") * lit(0.125)).as("est_jaccard"),
        col("n_pairs"),
        graft.Num.r6(col("sumex").cast("double")
          / (col("n_pairs") * lit(1000000.0))).as("mean_exact"),
        graft.Num.r6(col("sumae").cast("double")
          / (col("n_pairs") * lit(1000000.0))).as("mae"))
      .orderBy(col("matches"))
    val actual = Registry.queries("q224_minhash_calibration")(spark, dir)
    assert(collectSorted(actual) === collectSorted(expected))
  }

  test("q225 multiplicity aggregation equals the doc-level calibration") {
    val ex = docLevel(spark)
      .select(col("doc_a"), col("doc_b"),
        floor(col("jaccard") * 1000000 + lit(0.500001)).cast("long").as("exq"))
    val sh = Dedup.simhash(Tables.documents(spark, dir))
    val expected = ex
      .join(sh.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .select(col("exq"), bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .groupBy(col("hamming"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("exq") >= 800000L, 1L).otherwise(0L)).as("n_true"),
        sum(col("exq")).as("sumex"))
      .select(col("hamming"), col("n_pairs"), col("n_true"),
        graft.Num.r6(col("n_true").cast("double")
          / col("n_pairs").cast("double")).as("true_share"),
        graft.Num.r6(col("sumex").cast("double")
          / (col("n_pairs") * lit(1000000.0))).as("mean_exact"))
      .orderBy(col("hamming"))
    val actual = Registry.queries("q225_simhash_calibration")(spark, dir)
    assert(collectSorted(actual) === collectSorted(expected))
  }

  test("q257 drop-set predicate equals the doc-level threshold curve") {
    val docs = Tables.documents(spark, dir)
    val ex = docLevel(spark)
      .select(col("doc_a"), col("doc_b"),
        floor(col("jaccard") * 1000000 + lit(0.500001)).cast("long").as("exq"))
    val tk = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val tot = tk.agg(sum(col("ntok")).as("total_tokens"))
    val spine = spark.range(5, 10).select(col("id").as("tenths"))
    val fired = ex.crossJoin(broadcast(spine))
      .filter(col("exq") >= col("tenths") * lit(100000L))
    val pairs = fired.groupBy(col("tenths")).agg(count(lit(1)).as("n_pairs"))
    val drops = fired.select(col("tenths"), col("doc_b")).distinct()
      .join(tk, col("doc_b") === col("doc_id"))
      .groupBy(col("tenths"))
      .agg(count(lit(1)).as("n_dropped_docs"), sum(col("ntok")).as("tokens_dropped"))
    val expected = spine.join(pairs, Seq("tenths"), "left")
      .join(drops, Seq("tenths"), "left")
      .crossJoin(broadcast(tot))
      .select(col("tenths").as("threshold_tenths"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped_docs"), lit(0L)).as("n_dropped_docs"),
        coalesce(col("tokens_dropped"), lit(0L)).as("tokens_dropped"),
        graft.Num.r6(coalesce(col("tokens_dropped"), lit(0L)).cast("double")
          / col("total_tokens")).as("savings_share"))
      .orderBy(col("threshold_tenths"))
    val actual = Registry.queries("q257_dedup_threshold_curve")(spark, dir)
    assert(collectSorted(actual) === collectSorted(expected))
  }
}
