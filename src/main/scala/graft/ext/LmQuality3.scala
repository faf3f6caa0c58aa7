package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation: data-selection and multiple-testing operators.
  *
  *  - q186: DSIR-style hashed-n-gram importance weights (Xie et al.
  *    2023, "Data Selection for Language Models via Importance
  *    Resampling") — the lightweight target-vs-raw log-likelihood
  *    ratio a pretraining pipeline scores every candidate document
  *    with before resampling toward a target domain.
  *  - q190: Benjamini–Hochberg FDR control over the per-source KS
  *    drift tests (q174) — running one drift test per source without
  *    multiplicity control false-alarms at rate 1-(1-α)^m; BH is the
  *    standard step-up fix.
  */
object LmQuality3 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q186
    // DSIR importance weights: hash every whitespace token into 256
    // feature buckets (the cross-engine-exact md5 h60), fit add-1
    // multinomials for the TARGET domain (source 'src0') and the RAW
    // corpus, and score each document with the summed per-token
    // log-likelihood ratio ln p_t(b) − ln p_r(b). Positive scores are
    // target-like (kept by importance resampling). Cross-engine
    // exactness: each bucket's log-ratio is quantized to integer
    // nano-nats BEFORE the per-doc sum (q180's quantize-before-sum
    // rule), so per-doc totals are exact integer arithmetic. 100 TB
    // shape: ONE tokenize pass (checkpointed) feeds the 256-row bucket
    // tables (broadcast back) and the per-doc counts; everything else
    // is linear per-row math — no shuffle grows with the corpus beyond
    // the (doc, bucket) aggregate.
    Query(
      "q186_dsir_weights",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("w"))
          .select(col("doc_id"), col("source"),
            (Dedup.h60(concat(lit("f|"), col("w"))) % 256).as("b"))
          .localCheckpoint() // one corpus pass feeds raw, target, per-doc
        val raw = toks.groupBy(col("b")).agg(count(lit(1)).as("cr"))
        val tgt = toks.filter(col("source") === "src0")
          .groupBy(col("b")).agg(count(lit(1)).as("ct"))
        val tot = toks.agg(count(lit(1)).as("nr"),
          count(when(col("source") === "src0", 1)).as("nt"))
        // 256 bounded rows: add-1 smoothed log-ratio per bucket, in
        // integer nano-nats
        val scores = raw.join(tgt, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            floor((log((coalesce(col("ct"), lit(0L)) + lit(1.0)) /
                (col("nt") + lit(256.0))) -
              log((col("cr") + lit(1.0)) / (col("nr") + lit(256.0))))
              * lit(1e9) + lit(0.5)).cast("long").as("sq"))
        toks.groupBy(col("doc_id"), col("source"), col("b"))
          .agg(count(lit(1)).as("ndb"))
          .join(broadcast(scores), Seq("b"))
          .groupBy(col("doc_id"), col("source"))
          .agg(sum(col("ndb")).as("n_tokens"),
            sum(col("ndb") * col("sq")).as("ssum"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            Num.r4(col("ssum").cast("double") / lit(1e9)).as("dsir_score"),
            (col("ssum") > 0).as("selected"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH toks AS (
          SELECT doc_id, source,
            ${Dedup.sqlH60("'f|' || w")} % 256 AS b
          FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
                FROM documents)),
        raw AS (SELECT b, COUNT(*) AS cr FROM toks GROUP BY b),
        tgt AS (SELECT b, COUNT(*) AS ct FROM toks WHERE source = 'src0' GROUP BY b),
        tot AS (SELECT COUNT(*) AS nr,
                       COUNT(*) FILTER (WHERE source = 'src0') AS nt FROM toks),
        sc AS (
          SELECT r.b,
            CAST(FLOOR((LN((COALESCE(ct, 0) + 1.0) / (nt + 256.0))
                        - LN((cr + 1.0) / (nr + 256.0))) * 1e9 + 0.5) AS BIGINT) AS sq
          FROM raw r LEFT JOIN tgt USING (b) CROSS JOIN tot),
        db AS (SELECT doc_id, source, b, COUNT(*) AS ndb
               FROM toks GROUP BY doc_id, source, b)
        SELECT doc_id, source, CAST(SUM(ndb) AS BIGINT) AS n_tokens,
          FLOOR((CAST(SUM(ndb * sq) AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS dsir_score,
          SUM(ndb * sq) > 0 AS selected
        FROM db JOIN sc USING (b)
        GROUP BY doc_id, source ORDER BY doc_id"""),
      "DSIR importance weights: hashed-token target-vs-raw log-likelihood ratio per doc, integer nano-nat sums"),

    // ---------------------------------------------------------------- q190
    // Benjamini–Hochberg FDR over the q174 per-source KS drift tests:
    // the asymptotic two-sample p-value p = min(1, 2·exp(−2·ne·D²))
    // with ne = n1·n2/(n1+n2), then the BH step-up at α = 0.05 —
    // reject every source ranked at or below the LARGEST k with
    // p_(k) ≤ k·α/m. The KS numerator is the exact integer
    // |cum1·n2 − cum2·n1| (argmax can't flip); m = number of sources
    // is corpus-bounded, so the rank window runs on a bounded
    // checkpointed table and the step-up max is a 1-row broadcast.
    Query(
      "q190_fdr_drift",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // bounded (source × length) grid, one scan
        val lens = counts.select(col("n_chars")).distinct()
        val srcs = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n1"))
        val tot = counts.agg(sum(col("cnt")).as("n"),
          countDistinct(col("source")).as("m"))
        val wS = Window.partitionBy(col("source")).orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = srcs.crossJoin(broadcast(lens))
          .join(counts, Seq("source", "n_chars"), "left")
          .withColumn("cum1", sum(coalesce(col("cnt"), lit(0L))).over(wS))
        val cumAll = cum.groupBy(col("n_chars"))
          .agg(sum(col("cum1")).as("cumall"))
        val ks = cum.join(broadcast(cumAll), Seq("n_chars"))
          .crossJoin(broadcast(tot))
          .withColumn("num",
            abs(col("cum1").cast("decimal(38,0)") * (col("n") - col("n1")) -
              (col("cumall") - col("cum1")).cast("decimal(38,0)") * col("n1")))
        // per-source max |num| → D, p-value; ranked on an m-row table
        val perSrc = ks.groupBy(col("source"), col("n1"))
          .agg(max(col("num")).as("num"), max(col("n")).as("n"),
            max(col("m")).as("m"))
          .withColumn("dstat", col("num").cast("double") /
            (col("n1").cast("double") * (col("n") - col("n1")).cast("double")))
          .withColumn("ne", col("n1").cast("double") *
            (col("n") - col("n1")).cast("double") / col("n").cast("double"))
          .withColumn("p", least(lit(1.0),
            lit(2.0) * exp(lit(-2.0) * col("ne") * col("dstat") * col("dstat"))))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("p"), col("source"))).cast("long"))
          .localCheckpoint() // m rows; the rank window never sees corpus data
        val kmax = perSrc
          .filter(col("p") <= col("rank").cast("double") * lit(0.05) /
            col("m").cast("double"))
          .agg(coalesce(max(col("rank")), lit(0)).as("kmax"))
        perSrc.crossJoin(broadcast(kmax))
          .select(col("source"), col("n1").as("n_docs"),
            Num.r6(col("dstat")).as("ks_stat"),
            Num.r6(col("p")).as("p_value"),
            col("rank"),
            (col("rank") <= col("kmax")).as("bh_significant"))
          .orderBy(col("rank"), col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, n_chars, COUNT(*) AS cnt
          FROM documents GROUP BY source, n_chars),
        lens AS (SELECT DISTINCT n_chars FROM documents),
        srcs AS (SELECT source, COUNT(*) AS n1 FROM documents GROUP BY source),
        tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT source) AS m FROM documents),
        grid AS (
          SELECT s.source, s.n1, l.n_chars, COALESCE(c.cnt, 0) AS cnt
          FROM srcs s CROSS JOIN lens l
          LEFT JOIN counts c ON c.source = s.source AND c.n_chars = l.n_chars),
        cum AS (
          SELECT source, n1, n_chars,
            SUM(cnt) OVER (PARTITION BY source ORDER BY n_chars
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1
          FROM grid),
        call AS (SELECT n_chars, SUM(cum1) AS cumall FROM cum GROUP BY n_chars),
        pers AS (
          SELECT c.source, c.n1,
            MAX(ABS(CAST(c.cum1 AS HUGEINT) * (t.n - c.n1)
                    - CAST(call.cumall - c.cum1 AS HUGEINT) * c.n1)) AS num,
            MAX(t.n) AS n, MAX(t.m) AS m
          FROM cum c JOIN call USING (n_chars) CROSS JOIN tot t
          GROUP BY c.source, c.n1),
        pv AS (
          SELECT source, n1, n, m,
            CAST(num AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE))
              AS dstat,
            CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE) AS ne
          FROM pers),
        ranked AS (
          SELECT source, n1, dstat,
            LEAST(1.0, 2.0 * EXP(-2.0 * ne * dstat * dstat)) AS p, m,
            ROW_NUMBER() OVER (ORDER BY
              LEAST(1.0, 2.0 * EXP(-2.0 * ne * dstat * dstat)), source) AS rank
          FROM pv),
        kmax AS (
          SELECT COALESCE(MAX(rank), 0) AS kmax FROM ranked
          WHERE p <= CAST(rank AS DOUBLE) * 0.05 / m)
        SELECT source, CAST(n1 AS BIGINT) AS n_docs,
          FLOOR(dstat * 1000000 + 0.500001) / 1000000 AS ks_stat,
          FLOOR(p * 1000000 + 0.500001) / 1000000 AS p_value,
          CAST(rank AS BIGINT) AS rank,
          rank <= kmax AS bh_significant
        FROM ranked CROSS JOIN kmax
        ORDER BY rank, source"""),
      "Benjamini-Hochberg FDR step-up over per-source KS drift p-values (asymptotic two-sample formula)")
  )
}
