package graft.ops

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Remaining coverage: approximate distinct (HLL++), the math scalar
  * library, marker-based language ID, and the shared-SQL entry path. */
object Misc {

  /** q77's format copies, written once per (session, sf dir). */
  private val fmtCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), String]()

  /** One SQL text that parses identically in Spark and DuckDB — used
    * verbatim for both sides of q45, demonstrating the `spark.sql`
    * entry path. */
  // CAST(SUM .. AS BIGINT): DuckDB's SUM(BIGINT) widens to HUGEINT
  // (decimal128 in arrow) which the driver's hash treats as != int64;
  // FLOOR (not a bare cast) because DuckDB ROUNDS double->int while
  // Spark truncates. Both spellings are no-ops in Spark, so the text
  // stays engine-portable.
  val SharedSql: String = """
    SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
      MIN(l_shipdate) AS first_ship, MAX(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** Language marker lists (shared by the Spark and SQL sides). */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"))

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q42
    // HLL++ differs from DuckDB's approx sketch, so the estimate itself
    // is not oracle-comparable. Instead the oracle verifies the ERROR
    // BOUND: Spark emits the exact counts plus booleans asserting the
    // HLL++ estimate is within 5% of exact (rsd 0.01 → the 5% gate sits
    // ~5 standard errors out, and the sketch is hash-deterministic for
    // a given input, so the booleans are stable per SF); the DuckDB
    // twin emits the same exact counts with TRUE. A regression in the
    // HLL++ path now flips a boolean and fails the hash compare.
    Query(
      "q42_approx_distinct",
      (s, d) => {
        // NEVER put multiple countDistinct columns in one agg: Catalyst
        // plans an Expand that multiplies every input row by the number
        // of distinct groups (measured 809 s at 100x — BENCH_100X r7).
        // Instead: one pure-HLL pass (partial-aggregated, no expand)
        // plus one pre-deduped distinct per column (map-side combine on
        // (flag, key) pairs), broadcast-joined on the 3-row flag grid.
        val li = Tables.lineitem(s, d)
        val approx = li.groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("a_ord"),
            approx_count_distinct(col("l_partkey"), 0.01).as("a_prt"))
        val eo = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_orders"))
        val ep = li.select(col("l_returnflag"), col("l_partkey")).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
        approx.join(broadcast(eo), Seq("l_returnflag"))
          .join(broadcast(ep), Seq("l_returnflag"))
          .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
            (abs(col("a_ord") - col("exact_orders")) <
              col("exact_orders") * 0.05).as("orders_within_5pct"),
            (abs(col("a_prt") - col("exact_parts")) <
              col("exact_parts") * 0.05).as("parts_within_5pct"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
          COUNT(DISTINCT l_orderkey) AS exact_orders,
          COUNT(DISTINCT l_partkey) AS exact_parts,
          TRUE AS orders_within_5pct,
          TRUE AS parts_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "HyperLogLog++ approximate distinct, oracle-checked against its 5% error bound"),

    // ---------------------------------------------------------------- q43
    Query(
      "q43_math_scalars",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_linenumber") === 1 && col("l_orderkey") < 500)
          .select(col("l_orderkey"),
            Num.r4(sqrt(col("l_quantity"))).as("sqrt_qty"),
            Num.r4(log(col("l_extendedprice"))).as("ln_price"),
            Num.r4(exp(col("l_discount"))).as("exp_disc"),
            Num.r4(pow(col("l_quantity"), lit(2))).as("qty_sq"),
            abs(col("l_quantity") - lit(25)).as("abs_dev"),
            signum(col("l_discount") - 0.05).as("disc_sign"),
            (col("l_orderkey") % 7).as("mod7"),
            floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
            ceil(col("l_quantity") / 10).cast("long").as("qty_ceil"),
            Num.r4(sin(col("l_quantity"))).as("sin_qty"))
          // l_orderkey alone is not unique even at l_linenumber = 1 —
          // break ties with the price-derived column for a total order
          .orderBy(col("l_orderkey"), col("ln_price"), col("sqrt_qty")),
      Some(s"""
        SELECT l_orderkey,
          ${Num.sql("SQRT(l_quantity)", 4)} AS sqrt_qty,
          ${Num.sql("LN(l_extendedprice)", 4)} AS ln_price,
          ${Num.sql("EXP(l_discount)", 4)} AS exp_disc,
          ${Num.sql("POW(l_quantity, 2)", 4)} AS qty_sq,
          ABS(l_quantity - 25) AS abs_dev,
          CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
          l_orderkey % 7 AS mod7,
          CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
          CAST(CEIL(l_quantity / 10) AS BIGINT) AS qty_ceil,
          ${Num.sql("SIN(l_quantity)", 4)} AS sin_qty
        FROM lineitem
        WHERE l_linenumber = 1 AND l_orderkey < 500
        ORDER BY l_orderkey, ln_price, sqrt_qty"""),
      "math scalar library (sqrt/ln/exp/pow/abs/sign/mod/floor/ceil/sin)"),

    // ---------------------------------------------------------------- q44
    Query(
      "q44_language_id",
      (s, d) => {
        val toks = split(col("text"), " ")
        val score = (lang: String) => size(filter(toks,
          t => Markers(lang).map(m => t === m).reduce(_ || _)))
        val en = score("en"); val de = score("de"); val es = score("es")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("labeled_lang"),
            en.cast("long").as("en_hits"), de.cast("long").as("de_hits"),
            es.cast("long").as("es_hits"),
            when(en >= de && en >= es && en > 0, "en")
              .when(de >= es && de > 0, "de")
              .when(es > 0, "es")
              .otherwise("unknown").as("guessed_lang"))
          .orderBy(col("doc_id"))
      },
      Some {
        def hits(lang: String) = {
          val list = Markers(lang).map(m => s"'$m'").mkString(", ")
          s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ($list))) AS BIGINT)"
        }
        s"""
        WITH t AS (
          SELECT doc_id, lang,
            ${hits("en")} AS en_hits, ${hits("de")} AS de_hits,
            ${hits("es")} AS es_hits
          FROM documents)
        SELECT doc_id, lang AS labeled_lang, en_hits, de_hits, es_hits,
          CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
               WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
               WHEN es_hits > 0 THEN 'es'
               ELSE 'unknown' END AS guessed_lang
        FROM t ORDER BY doc_id"""
      },
      "marker-word language identification with deterministic argmax tie rule"),

    // ---------------------------------------------------------------- q76
    // KMV (k-minimum-values) distinct sketch: unlike HLL++ (q42) this
    // approximate-distinct is DETERMINISTIC and cross-engine exact —
    // hash every key with the md5→int64 primitive, keep the k-th
    // smallest distinct hash h_k, estimate distinct ≈ (k-1)·2^60/h_k.
    // Scale shape (re-planned r3): a typed Aggregator keeps a bounded
    // sorted buffer of the k smallest distinct hashes, so map-side
    // combine caps every pre-shuffle buffer at k longs — the shuffle
    // moves ≤ k·partitions values per flag and NO global sort or full
    // `distinct()` exists anywhere in the plan. (The r2 plan's
    // row_number window over the 3-value flag key sorted every distinct
    // hash of a flag in one task — a single-task sort at 100 TB.)
    // The oracle's ROW_NUMBER..rn=256 twin still matches: the k-th
    // smallest of all distinct hashes equals the merged bounded top-k.
    // Exact countDistinct is deliberately NOT in the timed plan (it
    // would double the cost of an approximate operator); the <5%
    // accuracy bound is asserted against exact counts in MiscSpec.
    Query(
      "q76_kmv_distinct",
      (s, d) => {
        val k = 256
        val scale = lit((k - 1).toDouble) * lit(1L << 60)
        val kmin = udaf(new graft.functions.KMinValuesAggregator(k),
          org.apache.spark.sql.Encoders.scalaLong)
        Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            graft.ext.Dedup.h60(col("l_orderkey").cast("string")).as("h"))
          .groupBy(col("l_returnflag"))
          .agg(kmin(col("h")).as("hk"))
          .filter(col("hk") > 0) // -1 sentinel: fewer than k distinct keys
          .select(col("l_returnflag"),
            (scale / col("hk").cast("double")).as("kmv_est"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""
        WITH dh AS (
          SELECT DISTINCT l_returnflag,
            ${graft.ext.Dedup.sqlH60("CAST(l_orderkey AS VARCHAR)")} AS h
          FROM lineitem),
        hk AS (
          SELECT l_returnflag, h FROM (
            SELECT l_returnflag, h,
              ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
            FROM dh) WHERE rn = 256)
        SELECT l_returnflag, 255.0 * ${1L << 60} / CAST(h AS DOUBLE) AS kmv_est
        FROM hk ORDER BY l_returnflag"""),
      "deterministic approximate distinct via KMV sketch (k=256): bounded partial top-k, no global sort, oracle-exact"),

    // ---------------------------------------------------------------- q77
    // File-format scan surface (SURVEY §2.2): the same relation served
    // through csv, json and orc readers must agree with the parquet
    // original. The builder round-trips the 25-row nation dim through
    // each format (tiny, deterministic) and aggregates each read back.
    Query(
      "q77_multiformat_scan",
      (s, d) => {
        val nation = Tables.nation(s, d)
        // materialize the three format copies ONCE per (session, dir):
        // a bench invocation of a "scan" query should time the reads,
        // not re-pay the writes on every pass
        val base = fmtCache.computeIfAbsent((s, d), { _ =>
          val b = s"target/fmtcache/${new java.io.File(d).getName}"
          nation.coalesce(1).write.mode("overwrite")
            .option("header", "true").csv(s"$b/nation_csv")
          nation.coalesce(1).write.mode("overwrite").json(s"$b/nation_json")
          nation.coalesce(1).write.mode("overwrite").orc(s"$b/nation_orc")
          b
        })
        val reads = Seq(
          "csv" -> s.read.schema(nation.schema).option("header", "true")
            .csv(s"$base/nation_csv"),
          "json" -> s.read.schema(nation.schema).json(s"$base/nation_json"),
          "orc" -> s.read.orc(s"$base/nation_orc"))
        reads.map { case (fmt, df) =>
          df.agg(
            count(lit(1)).as("n_rows"),
            sum(col("n_nationkey").cast("long")).as("sum_key"),
            sum(length(col("n_name")).cast("long")).as("sum_name_len"))
            .select(lit(fmt).as("fmt"), col("n_rows"), col("sum_key"),
              col("sum_name_len"))
        }.reduce(_.unionByName(_)).orderBy(col("fmt"))
      },
      Some {
        val one = (fmt: String) => s"""
          SELECT '$fmt' AS fmt, COUNT(*) AS n_rows,
            CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
            CAST(SUM(LENGTH(n_name)) AS BIGINT) AS sum_name_len
          FROM nation"""
        s"""SELECT * FROM (${Seq("csv", "json", "orc").map(one).mkString(" UNION ALL ")})
        ORDER BY fmt"""
      },
      "csv/json/orc source scans round-tripped against the parquet original"),

    // ---------------------------------------------------------------- q45
    Query(
      "q45_sql_surface",
      (s, d) => {
        Seq("lineitem").foreach(t =>
          Tables(s, d, t).createOrReplaceTempView(t))
        s.sql(SharedSql)
      },
      Some(SharedSql),
      "spark.sql entry path: one ANSI SQL text evaluated verbatim by both engines"),

    // ---------------------------------------------------------------- q262
    // Language-ID confusion matrix: q44's marker-word classifier
    // evaluated against the labeled lang — WHERE the classifier's
    // errors go (q125 reports agreement rate; this reports the full
    // labeled × guessed cell structure, the artifact that says "de is
    // being eaten by unknown", not just "87% right"). Same scoring
    // and argmax tie rule as q44 so the matrix audits exactly the
    // deployed classifier; one corpus pass, (langs+1)² bounded output.
    Query(
      "q262_lang_confusion",
      (s, d) => {
        val toks = split(col("text"), " ")
        val score = (lang: String) => size(filter(toks,
          t => Markers(lang).map(m => t === m).reduce(_ || _)))
        val en = score("en"); val de = score("de"); val es = score("es")
        val guessed = Tables.documents(s, d)
          .select(col("lang").as("labeled_lang"),
            when(en >= de && en >= es && en > 0, "en")
              .when(de >= es && de > 0, "de")
              .when(es > 0, "es")
              .otherwise("unknown").as("guessed_lang"))
        val cells = guessed
          .groupBy(col("labeled_lang"), col("guessed_lang"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy(col("labeled_lang"))
          .agg(sum(col("n")).as("n_labeled"))
        cells.join(totals, Seq("labeled_lang"))
          .select(col("labeled_lang"), col("guessed_lang"), col("n"),
            Num.r6(col("n").cast("double") / col("n_labeled"))
              .as("share_of_labeled"),
            (col("labeled_lang") === col("guessed_lang")).as("correct"))
          .orderBy(col("labeled_lang"), col("guessed_lang"))
      },
      Some {
        def hits(lang: String) = {
          val list = Markers(lang).map(m => s"'$m'").mkString(", ")
          s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ($list))) AS BIGINT)"
        }
        s"""
        WITH t AS (
          SELECT lang AS labeled_lang,
            ${hits("en")} AS en_hits, ${hits("de")} AS de_hits,
            ${hits("es")} AS es_hits
          FROM documents),
        g AS (
          SELECT labeled_lang,
            CASE WHEN en_hits >= de_hits AND en_hits >= es_hits
                      AND en_hits > 0 THEN 'en'
                 WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                 WHEN es_hits > 0 THEN 'es'
                 ELSE 'unknown' END AS guessed_lang
          FROM t),
        cells AS (
          SELECT labeled_lang, guessed_lang, CAST(COUNT(*) AS BIGINT) AS n
          FROM g GROUP BY labeled_lang, guessed_lang),
        tot AS (
          SELECT labeled_lang, CAST(SUM(n) AS BIGINT) AS n_labeled
          FROM cells GROUP BY labeled_lang)
        SELECT c.labeled_lang, c.guessed_lang, c.n,
          ${Num.sql("CAST(c.n AS DOUBLE) / n_labeled", 6)}
            AS share_of_labeled,
          c.labeled_lang = c.guessed_lang AS correct
        FROM cells c JOIN tot USING (labeled_lang)
        ORDER BY c.labeled_lang, c.guessed_lang"""
      },
      "language-ID confusion matrix: q44's marker classifier vs the labeled lang, full labeled x guessed cells with per-label shares"))
}
