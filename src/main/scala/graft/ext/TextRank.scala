package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting and generic column profiling — the remaining
  * text-analysis / data-quality utilities of a training-data pipeline. */
object TextRank {

  /** (doc_id, term, tf, df, tfidf) for every term occurrence count —
    * two aggregations over one exploded token pass; the idf side is a
    * tiny per-term table joined back (broadcast at any realistic
    * vocabulary size). */
  def tfidf(docs: DataFrame): DataFrame = {
    // corpus size as a broadcast 1-row frame inside the same plan — a
    // driver-side count() would scan the source twice
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_total"))
    val terms = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDf))
      .withColumn("tfidf", col("tf") * log(col("n_total") / col("df")))
      .drop("n_total")
  }

  /** Generic profiling: one row per (column, metric) over any frame —
    * null count, distinct count, min/max as strings. One pass for the
    * counts; min/max typed then rendered. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    // One N-column agg with N countDistincts makes Catalyst Expand the
    // input N+1× (every row replicated per distinct group, all columns
    // carried) — 3M intermediate rows for a 600k-row table. Instead:
    // one cheap non-distinct pass for nulls/min/max (pure partial agg,
    // 32-row shuffle), plus one NARROW distinct per column (map-side
    // partial distinct, shuffles each column's distinct values only),
    // all submitted concurrently as independent jobs. Same shape a
    // 100 TB profiler wants: per-column work is independent, so it
    // parallelizes across the cluster instead of multiplying one scan.
    val basicAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val basicF = Future(df.agg(basicAggs.head, basicAggs.tail: _*).head())
    val distinctFs = cols.map(c =>
      Future(c -> df.select(col(c)).distinct().count()))
    val row = Await.result(basicF, 10.minutes)
    val distincts = distinctFs.map(Await.result(_, 10.minutes)).toMap
    cols.flatMap { c =>
      Seq(
        (c, "nulls", row.getAs[Long](s"${c}__nulls").toString),
        (c, "distinct", distincts(c).toString),
        (c, "min", String.valueOf(row.getAs[Any](s"${c}__min"))),
        (c, "max", String.valueOf(row.getAs[Any](s"${c}__max"))))
    }.toDF("column", "metric", "value")
  }

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q59
    Query(
      "q59_tfidf_top_terms",
      (s, d) => {
        tfidf(Tables.documents(s, d))
          .withColumn("tfidf", Num.r4(col("tfidf")))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(col("tfidf").desc, col("term"))))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn"), col("term"), col("tf"),
            col("df"), col("tfidf"))
          .orderBy(col("doc_id"), col("rn"))
      },
      Some(s"""
        WITH terms AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT COUNT(*) AS n FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, df.df,
            ${Num.sql("tf.tf * LN(CAST(n.n AS DOUBLE) / df.df)", 4)} AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, term) AS rn
          FROM scored)
        SELECT doc_id, rn, term, tf, df, tfidf
        FROM ranked WHERE rn <= 3
        ORDER BY doc_id, rn"""),
      "TF-IDF top-3 terms per document (rank on rounded weight, term tie-break)"),

    // ---------------------------------------------------------------- q60
    Query(
      "q60_profile",
      (s, d) =>
        profile(Tables.lineitem(s, d),
          Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"))
          .orderBy(col("column"), col("metric")),
      Some("""
        SELECT * FROM (
          SELECT 'l_orderkey' AS "column", 'nulls' AS metric,
            CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS VARCHAR) AS value FROM lineitem
          UNION ALL SELECT 'l_orderkey', 'distinct', CAST(COUNT(DISTINCT l_orderkey) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_orderkey', 'min', CAST(MIN(l_orderkey) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_orderkey', 'max', CAST(MAX(l_orderkey) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_quantity', 'nulls', CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_quantity', 'distinct', CAST(COUNT(DISTINCT l_quantity) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_quantity', 'min', CAST(MIN(l_quantity) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_quantity', 'max', CAST(MAX(l_quantity) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_returnflag', 'nulls', CAST(COUNT(*) FILTER (WHERE l_returnflag IS NULL) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_returnflag', 'distinct', CAST(COUNT(DISTINCT l_returnflag) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_returnflag', 'min', MIN(l_returnflag) FROM lineitem
          UNION ALL SELECT 'l_returnflag', 'max', MAX(l_returnflag) FROM lineitem
          UNION ALL SELECT 'l_shipdate', 'nulls', CAST(COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_shipdate', 'distinct', CAST(COUNT(DISTINCT l_shipdate) AS VARCHAR) FROM lineitem
          UNION ALL SELECT 'l_shipdate', 'min', STRFTIME(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') FROM lineitem
          UNION ALL SELECT 'l_shipdate', 'max', STRFTIME(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') FROM lineitem
        ) ORDER BY "column", metric"""),
      "generic column profiler: nulls/distinct/min/max per column as rows"),

    // ---------------------------------------------------------------- q67
    // ONE regex pass (round 9): the combined alternation already
    // tokenizes the text into maximal [a-z]+ runs, maximal [0-9]+ runs
    // and single other-chars (greedy + leftmost-first alternation make
    // each class token maximal), so the three class counts are exactly
    // the tokens-by-first-character counts — was four regexp_extract_all
    // passes per doc, the heaviest 100× entry (41.9 s) before the fuse.
    Query(
      "q67_regex_tokens",
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            regexp_extract_all(col("text"),
              lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)).as("toks"))
          .select(col("doc_id"),
            size(filter(col("toks"), t =>
              t.substr(1, 1) >= "a" && t.substr(1, 1) <= "z"))
              .cast("long").as("n_words"),
            size(filter(col("toks"), t =>
              t.substr(1, 1) >= "0" && t.substr(1, 1) <= "9"))
              .cast("long").as("n_numbers"),
            size(filter(col("toks"), t =>
              (t.substr(1, 1) < "0" || t.substr(1, 1) > "9") &&
                (t.substr(1, 1) < "a" || t.substr(1, 1) > "z")))
              .cast("long").as("n_punct"),
            size(col("toks")).cast("long").as("n_bpe_tokens"))
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
          CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_words,
          CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
          CAST(LEN(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_punct,
          CAST(LEN(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
        FROM documents ORDER BY doc_id"""),
      "BPE-ish regex tokenizer counts (word / number / punctuation classes)"),

    // ---------------------------------------------------------------- q68
    // Token-level Karp-Rabin rolling hash over 4-grams (base 131 mod P)
    // with winnowing-style selection (h % 16 == 0) — content-defined
    // document fingerprints, exact integer math on both engines.
    Query(
      "q68_rolling_fingerprint",
      (s, d) => {
        val P = graft.ext.Dedup.P
        val pows = Seq(1L, 131L, 17161L, 2248091L)
        // hash each token ONCE into a materialized array — computing
        // md5(split(...)) inside the rolling lambda would redo both per
        // gram per offset (4x per gram; 28s -> ~2s at sf0.1)
        val harr = transform(split(col("text"), " "), t => graft.ext.Dedup.hp(t))
        val withH = Tables.documents(s, d).withColumn("hs", harr)
        val roll = when(size(col("hs")) >= 4,
          transform(sequence(lit(1), size(col("hs")) - lit(3)), i =>
            pows.zipWithIndex.map { case (p, j) =>
              (element_at(col("hs"), i + lit(j)) * p) % P
            }.reduce(_ + _) % P))
          .otherwise(array().cast("array<bigint>"))
        val selected = filter(roll, h => h % 16 === 0)
        withH
          .select(col("doc_id"),
            size(roll).cast("long").as("n_grams"),
            size(selected).cast("long").as("n_selected"),
            array_min(selected).as("min_fp"),
            array_max(selected).as("max_fp"))
          .orderBy(col("doc_id"))
      },
      Some {
        val P = graft.ext.Dedup.P
        val inner = Seq(1L, 131L, 17161L, 2248091L).zipWithIndex
          .map { case (p, j) => s"hs[i+$j] * $p % $P" }.mkString(" + ")
        s"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        h AS (
          SELECT doc_id, [${graft.ext.Dedup.sqlHp("t")} FOR t IN toks] AS hs
          FROM t),
        r AS (
          SELECT doc_id,
            [($inner) % $P FOR i IN range(1, len(hs) - 2)] AS roll
          FROM h),
        sel AS (
          SELECT doc_id, roll, LIST_FILTER(roll, h -> h % 16 = 0) AS selected
          FROM r)
        SELECT doc_id,
          CAST(LEN(roll) AS BIGINT) AS n_grams,
          CAST(LEN(selected) AS BIGINT) AS n_selected,
          LIST_MIN(selected) AS min_fp,
          LIST_MAX(selected) AS max_fp
        FROM sel ORDER BY doc_id"""
      },
      "Karp-Rabin rolling-hash 4-gram fingerprints with winnowing selection"))
}
