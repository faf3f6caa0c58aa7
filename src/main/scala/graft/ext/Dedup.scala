package graft.ext

import graft.{Query, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy-deduplication operators for a training-data pipeline: MinHash
  * signatures + LSH banding + Jaccard verification, and SimHash
  * fingerprints. All hashing is md5-prefix → int64 → modular
  * arithmetic — exact integer math that DuckDB reproduces bit-for-bit,
  * so even the hash-heavy operators are oracle-checked.
  *
  * Scale shape (the point of MinHash-LSH): raw text is shuffled ONCE
  * (shingle explode + distinct); signatures are k smallish integers per
  * doc; the candidate join shuffles only (band-key, doc_id) pairs; the
  * expensive Jaccard verification runs on candidate pairs only, never
  * on the n² cross product.
  */
object Dedup {

  val P = 1000000007L
  val K = 8          // minhash permutations
  val Bands = 4      // LSH bands of rows = K/Bands rows each
  val SimBits = 32   // simhash width

  def permA(k: Int): Long = 2L * k + 3
  def permB(k: Int): Long = 12345L + 104729L * k

  private def toks: Column = split(col("text"), " ")

  /** Word n-gram shingles of the `text` column (empty below n tokens). */
  def shingles(n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array())

  /** Cross-engine-exact 60-bit string hash, reduced mod P. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def hp(c: Column): Column = h60(c) % P

  /** SQL twins of the hash primitives. */
  def sqlH60(e: String): String =
    s"CAST(('0x' || SUBSTRING(md5($e), 1, 15)) AS BIGINT)"
  def sqlHp(e: String): String = s"${sqlH60(e)} % $P"

  /** (doc_id, shingle) pairs, distinct — the single raw-text shuffle. */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.repartition(col("doc_id")) // text files are few; spread the explode
      .select(col("doc_id"), explode(shingles(n)).as("sh")).distinct()

  /** MinHash signatures: K modular permutations of the shingle hash,
    * MIN per doc — one narrow aggregate after the shingle shuffle. */
  def minhashSignatures(docs: DataFrame, n: Int = 3): DataFrame =
    docShingles(docs, n)
      .select(col("doc_id"), hp(col("sh")).as("h"))
      .groupBy(col("doc_id"))
      .agg(min((col("h") * permA(0) + permB(0)) % P).as("m0"),
        (1 until K).map(k =>
          min((col("h") * permA(k) + permB(k)) % P).as(s"m$k")): _*)

  /** LSH candidate pairs: docs sharing any band of the signature.
    * Band key packs its rows into one long (rows are < P < 2^30). */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val rows = K / Bands
    val bandKey = (b: Int) => (0 until rows)
      .map(r => col(s"m${b * rows + r}") * math.pow(2, 31 * r).toLong)
      .reduce(_ + _)
    val banded = sigs.select(col("doc_id") +:
      (0 until Bands).map(b => bandKey(b).as(s"band$b")): _*)
      .select(col("doc_id"), explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard over shingle sets, evaluated for given pairs only. */
  def jaccard(pairs: DataFrame, shingleSets: DataFrame): DataFrame = {
    val counts = shingleSets.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(shingleSets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shingleSets.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.sh") === col("sb.sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    pairs.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"))
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
  }

  /** SimHash fingerprint over distinct tokens: per bit, majority vote of
    * the token hashes' bit values; 32 packed bits. */
  def simhash(docs: DataFrame): DataFrame = {
    val tokens = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(toks).as("t")).distinct()
      .select(col("doc_id"), h60(col("t")).as("h"))
    val votes = tokens.groupBy(col("doc_id")).agg(
      sum(when(shiftright(col("h"), 0).bitwiseAND(1) === 1, 1).otherwise(-1)).as("b0"),
      (1 until SimBits).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
          .as(s"b$b")): _*)
    votes.select(col("doc_id"),
      (0 until SimBits).map(b =>
        when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
  }

  /** One cached hashed-shingle frame per session, keyed by sf dir; a
    * request for a new dir unpersists the old entry so a session that
    * walks multiple scale factors holds at most one copy (two longs per
    * distinct (doc, shingle), MEMORY_AND_DISK so it spills, not OOMs). */
  private val shingleCache =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, (String, DataFrame)]()
  private def cachedHashedShingles(
      s: org.apache.spark.sql.SparkSession, d: String, docs: DataFrame): DataFrame =
    shingleCache.compute(s, (_, prev) => prev match {
      case (`d`, df) => (d, df)
      case other =>
        if (other != null) other._2.unpersist()
        (d, docShingles(docs).select(col("doc_id"), hp(col("sh")).as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    })._2

  // ----------------------------------------------------------------- SQL
  private def sqlShingles = // [array_to_string(t[i:i+2],' ') FOR i IN range(1,len(t)-1)]
    "[array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]"

  private def sqlDocShingles =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        shraw AS (SELECT doc_id, unnest($sqlShingles) AS sh FROM toks),
        sh AS (SELECT DISTINCT doc_id, sh FROM shraw)"""

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q34
    Query(
      "q34_minhash_signatures",
      (s, d) => minhashSignatures(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some(s"""
        WITH $sqlDocShingles,
        h AS (SELECT doc_id, ${sqlHp("sh")} AS h FROM sh)
        SELECT doc_id,
          ${(0 until K).map(k =>
            s"MIN((h * ${permA(k)} + ${permB(k)}) % $P) AS m$k").mkString(",\n          ")}
        FROM h GROUP BY doc_id ORDER BY doc_id"""),
      "MinHash signatures (K=8 modular permutations over 3-gram shingles), oracle-exact integer hashing"),

    // ---------------------------------------------------------------- q35
    Query(
      "q35_lsh_neardup_pairs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // hash shingles ONCE, persist, and run both the signature
        // aggregation and the Jaccard verification over the hashed ids —
        // one raw-text pass, and the verification join shuffles longs,
        // not shingle strings. The builder cannot see the caller's
        // action, so it cannot unpersist after it — instead the cache is
        // bounded to ONE entry per session: requesting a different sf
        // dir evicts the previous one (Bench/Verify run dirs serially).
        val hashed = cachedHashedShingles(s, d, docs)
        val sigs = hashed
          .groupBy(col("doc_id"))
          .agg(min((col("sh") * permA(0) + permB(0)) % P).as("m0"),
            (1 until K).map(k =>
              min((col("sh") * permA(k) + permB(k)) % P).as(s"m$k")): _*)
        jaccard(lshCandidates(sigs), hashed)
          .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"),
            col("n_b"), graft.Num.r4(col("jaccard")).as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some {
        val rows = K / Bands
        val bandKeySql = (b: Int) => (0 until rows)
          .map(r => s"m${b * rows + r} * ${math.pow(2, 31 * r).toLong}")
          .mkString(" + ")
        s"""
        WITH $sqlDocShingles,
        h AS (SELECT doc_id, ${sqlHp("sh")} AS h FROM sh),
        sig AS (
          SELECT doc_id,
            ${(0 until K).map(k =>
              s"MIN((h * ${permA(k)} + ${permB(k)}) % $P) AS m$k").mkString(",\n            ")}
          FROM h GROUP BY doc_id),
        banded AS (
          ${(0 until Bands).map(b =>
            s"SELECT doc_id, $b AS band, ${bandKeySql(b)} AS key FROM sig")
            .mkString("\n          UNION ALL ")}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
        counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
          SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
          FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
          GROUP BY c.doc_a, c.doc_b)
        SELECT c.doc_a, c.doc_b,
          COALESCE(i.n_inter, 0) AS n_inter, ca.n_sh AS n_a, cb.n_sh AS n_b,
          FLOOR((COALESCE(i.n_inter, 0) / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0))) * 10000 + 0.500001) / 10000 AS jaccard
        FROM cand c
        LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN counts ca ON ca.doc_id = c.doc_a
        JOIN counts cb ON cb.doc_id = c.doc_b
        ORDER BY c.doc_a, c.doc_b"""
      },
      "MinHash-LSH near-dup: banded candidate join + exact Jaccard verification on candidates only"),

    // ---------------------------------------------------------------- q36
    Query(
      "q36_simhash",
      (s, d) => simhash(Tables.documents(s, d)).orderBy(col("doc_id")),
      Some(s"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
          FROM documents),
        h AS (SELECT doc_id, ${sqlH60("t")} AS h FROM toks),
        votes AS (
          SELECT doc_id,
            ${(0 until SimBits).map(b =>
              s"SUM(CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS b$b")
              .mkString(",\n            ")}
          FROM h GROUP BY doc_id)
        SELECT doc_id,
          ${(0 until SimBits).map(b =>
            s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")} AS simhash
        FROM votes ORDER BY doc_id"""),
      "32-bit SimHash fingerprints (per-bit majority vote of token hashes)"))
}
