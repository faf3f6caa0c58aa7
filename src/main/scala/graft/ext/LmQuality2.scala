package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 continuation of the LM-pipeline quality family: the
  * Gopher-style repetition filters (Rae et al. 2021 §A1.1 run
  * repeated-n-gram fraction filters before training), the Zipf
  * rank-frequency slope (the one-number corpus health diagnostic — a
  * natural corpus sits near −1; boilerplate or template spam bends it),
  * and the two-sample Kolmogorov–Smirnov drift statistic per source
  * (the distribution-shift test a mixing pipeline runs before
  * reweighting).
  */
object LmQuality2 {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q171
    // Per-doc repetition metrics: share of bigram positions covered by
    // the doc's most frequent bigram, and the fraction of 5-gram
    // positions whose 5-gram repeats within the doc. TWO independent
    // single-pass pipelines (posexplode + doc_id lead window + grouped
    // count each — the q163 path), deliberately NOT a shared cached
    // n-gram table: materializing every position × 5 lead strings is a
    // multi-GB cache at 100× (it OOMed the 100× bench) while each pass
    // is a cheap columnar scan + one keyed shuffle. n_tokens falls out
    // of the 5-gram pass (positions + 4 — every doc has ≥ 5 tokens).
    // Ratios are double divisions of exact integers.
    Query(
      "q171_repetition",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        def toks(s2: org.apache.spark.sql.SparkSession) = Tables.documents(s2, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
        val topBg = toks(s)
          .withColumn("w2", lead(col("w1"), 1).over(w))
          .filter(col("w2").isNotNull)
          .groupBy(col("doc_id"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(max(col("c")).as("top"))
        val dup5 = toks(s)
          .withColumn("w2", lead(col("w1"), 1).over(w))
          .withColumn("w3", lead(col("w1"), 2).over(w))
          .withColumn("w4", lead(col("w1"), 3).over(w))
          .withColumn("w5", lead(col("w1"), 4).over(w))
          .filter(col("w5").isNotNull)
          .groupBy(col("doc_id"),
            concat_ws(" ", col("w1"), col("w2"), col("w3"), col("w4"), col("w5"))
              .as("g5"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("tot5"),
            coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup5"))
          .withColumn("n_tokens", col("tot5") + lit(4))
        topBg.join(dup5, Seq("doc_id"))
          .select(col("doc_id"), col("n_tokens"),
            Num.r4(col("top").cast("double") /
              (col("n_tokens") - lit(1)).cast("double")).as("top_bigram_share"),
            Num.r4(col("dup5").cast("double") / col("tot5").cast("double"))
              .as("dup_5gram_frac"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        ntok AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
        bg AS (
          SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
                                 FOR i IN range(1, len(t))]) AS g
          FROM toks),
        topbg AS (
          SELECT doc_id, MAX(c) AS top FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g)
          GROUP BY doc_id),
        g5 AS (
          SELECT doc_id, unnest([t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]
                                 FOR i IN range(1, len(t) - 3)]) AS g
          FROM toks),
        dup5 AS (
          SELECT doc_id, SUM(c) AS tot5,
            COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS dup5 FROM (
            SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY doc_id, g)
          GROUP BY doc_id)
        SELECT n.doc_id, n.n_tokens,
          FLOOR((CAST(top AS DOUBLE) / CAST(n_tokens - 1 AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS top_bigram_share,
          FLOOR((CAST(dup5 AS DOUBLE) / CAST(tot5 AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS dup_5gram_frac
        FROM ntok n JOIN topbg USING (doc_id) JOIN dup5 USING (doc_id)
        ORDER BY doc_id"""),
      "Gopher-style repetition filters: top-bigram coverage share + duplicate-5-gram fraction per doc"),

    // ---------------------------------------------------------------- q172
    // Zipf rank-frequency slope: OLS of ln(freq) on ln(rank) over the
    // corpus top-100 tokens. Token counting is one corpus-linear
    // groupBy; the top-100 cut is Spark's two-phase TakeOrdered (k rows
    // per partition cross the wire). Rank is computed WITHOUT a global
    // window: a broadcast self-join on the 100-row table counts strict
    // (cnt, tok) predecessors — bounded 100×100 work. Both ln() values
    // are micro-nat floor-quantized (the q109 ulp-absorbing cut), so
    // the normal-equation sums are exact integers on both engines and
    // slope/intercept are identical IEEE divisions of identical ints.
    Query(
      "q172_zipf_slope",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok")).limit(100)
          .localCheckpoint() // bounded 100-row table, feeds both join sides
        val before = tf.select(col("tok").as("btok"), col("cnt").as("bcnt"))
        val ranked = tf.join(broadcast(before),
            col("bcnt") > col("cnt") ||
              (col("bcnt") === col("cnt") && col("btok") < col("tok")),
            "left")
          .groupBy(col("tok"), col("cnt"))
          .agg((count(col("btok")) + lit(1)).as("rank"))
          .select(
            floor(log(col("rank").cast("double")) * lit(1000000.0))
              .cast("long").as("xq"),
            floor(log(col("cnt").cast("double")) * lit(1000000.0))
              .cast("long").as("yq"))
        ranked.agg(
            count(lit(1)).as("n"),
            sum(col("xq")).as("sx"), sum(col("yq")).as("sy"),
            sum((col("xq") * col("yq")).cast("decimal(38,0)")).as("sxy"),
            sum((col("xq") * col("xq")).cast("decimal(38,0)")).as("sxx"))
          .select(col("n").as("n_tokens"),
            (col("n") * col("sxy") -
              col("sx").cast("decimal(38,0)") * col("sy")).as("num"),
            (col("n") * col("sxx") -
              col("sx").cast("decimal(38,0)") * col("sx")).as("den"),
            col("sx"), col("sy"))
          .select(col("n_tokens"),
            Num.r4(col("num").cast("double") / col("den").cast("double"))
              .as("zipf_slope"),
            Num.r4((col("sy").cast("double") -
              (col("num").cast("double") / col("den").cast("double")) *
                col("sx").cast("double")) /
              (col("n_tokens").cast("double") * lit(1000000.0)))
              .as("zipf_intercept_ln"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        flat AS (SELECT unnest(t) AS tok FROM toks),
        tf AS (
          SELECT tok, COUNT(*) AS cnt FROM flat GROUP BY tok
          ORDER BY cnt DESC, tok LIMIT 100),
        ranked AS (
          SELECT a.tok, a.cnt, 1 + COUNT(b.tok) AS rank
          FROM tf a LEFT JOIN tf b
            ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.tok < a.tok)
          GROUP BY a.tok, a.cnt),
        q AS (
          SELECT CAST(FLOOR(LN(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS xq,
                 CAST(FLOOR(LN(CAST(cnt AS DOUBLE)) * 1000000) AS BIGINT) AS yq
          FROM ranked),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(xq) AS sx, SUM(yq) AS sy,
            SUM(CAST(xq AS HUGEINT) * yq) AS sxy,
            SUM(CAST(xq AS HUGEINT) * xq) AS sxx
          FROM q)
        SELECT n AS n_tokens,
          FLOOR((CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                 / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                * 10000 + 0.500001) / 10000 AS zipf_slope,
          FLOOR(((CAST(sy AS DOUBLE)
                  - (CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * 1000000.0))
                * 10000 + 0.500001) / 10000 AS zipf_intercept_ln
        FROM s"""),
      "Zipf rank-frequency slope over the top-100 tokens: integer-quantized ln OLS, rank without a global window"),

    // ---------------------------------------------------------------- q174
    // Two-sample KS statistic per source: doc-length distribution of
    // each source vs the rest of the corpus. D = max over the merged
    // support of |F1 − F2|, kept EXACT-INTEGER as
    // |cum1·(N−n1) − (cumAll−cum1)·n1| so the argmax can never flip on
    // FP association; the single division happens once per source at
    // the end. No global-partition window: per-source cumulatives ride
    // a source-partitioned window over the (source × length) grid, and
    // the all-corpus cumulative at each length is recovered by SUMMING
    // the per-source cumulatives at that length (every source holds
    // every grid length). The grid is sources × distinct-lengths —
    // bounded by the length domain, not the corpus.
    Query(
      "q174_ks_drift",
      (s, d) => {
        // ONE corpus pass: every other table below derives from the
        // bounded (source × length) counts grid, so the parquet scan
        // happens once no matter how many aggregates reference it
        val counts = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val lens = counts.select(col("n_chars")).distinct()
        val srcs = counts.groupBy(col("source")).agg(sum(col("cnt")).as("n1"))
        val tot = counts.agg(sum(col("cnt")).as("n"))
        val wS = Window.partitionBy(col("source")).orderBy(col("n_chars"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = srcs.crossJoin(broadcast(lens))
          .join(counts, Seq("source", "n_chars"), "left")
          .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
          .withColumn("cum1", sum(col("cnt0")).over(wS))
        val cumAll = cum.groupBy(col("n_chars"))
          .agg(sum(col("cum1")).as("cumall"))
        val stat = cum.join(broadcast(cumAll), Seq("n_chars"))
          .crossJoin(broadcast(tot))
          .withColumn("num",
            abs(col("cum1").cast("decimal(38,0)") * (col("n") - col("n1")) -
              (col("cumall") - col("cum1")).cast("decimal(38,0)") * col("n1")))
        stat.withColumn("rn", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("num").desc, col("n_chars"))))
          .filter(col("rn") === 1)
          .select(col("source"), col("n1").as("n_docs"),
            col("n_chars").as("ks_at_len"),
            Num.r6(col("num").cast("double") /
              (col("n1").cast("double") * (col("n") - col("n1")).cast("double")))
              .as("ks_stat"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, n_chars, COUNT(*) AS cnt
          FROM documents GROUP BY source, n_chars),
        lens AS (SELECT DISTINCT n_chars FROM documents),
        srcs AS (SELECT source, COUNT(*) AS n1 FROM documents GROUP BY source),
        tot AS (SELECT COUNT(*) AS n FROM documents),
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
        stat AS (
          SELECT c.source, c.n1, c.n_chars,
            ABS(CAST(c.cum1 AS HUGEINT) * (t.n - c.n1)
                - CAST(call.cumall - c.cum1 AS HUGEINT) * c.n1) AS num,
            t.n AS n
          FROM cum c JOIN call USING (n_chars) CROSS JOIN tot t),
        r AS (
          SELECT source, n1, n_chars, num, n,
            ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY num DESC, n_chars) AS rn
          FROM stat)
        SELECT source, CAST(n1 AS BIGINT) AS n_docs, n_chars AS ks_at_len,
          FLOOR((CAST(num AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
                * 1000000 + 0.500001) / 1000000 AS ks_stat
        FROM r WHERE rn = 1 ORDER BY source"""),
      "two-sample KS statistic per source vs rest-of-corpus over doc lengths: exact-integer argmax, no global window"),

    // ---------------------------------------------------------------- q180
    // Jensen–Shannon divergence between each source's token
    // distribution and the rest of the corpus — the SYMMETRIC, bounded
    // (≤ ln 2) drift measure that complements q113's PSI (which needs
    // binning and explodes on zero cells; JSD handles disjoint support
    // natively, the common case for source-specific vocabulary). The
    // grid is vocab × sources (counts-table-sized, never corpus-sized);
    // each term p·ln(p/m), q·ln(q/m) is computed from exact integer
    // counts and NANO-nat-quantized before the per-source sum (the
    // q109 cut at 1e9 — terms are O(1/vocab), so micro-nats would
    // round tiny contributions to zero).
    Query(
      "q180_jsd_drift",
      (s, d) => {
        // ONE corpus pass into the (source × token) counts — ct/ns/tot
        // all derive from the checkpointed vocab-sized table
        val cs = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val ct = cs.groupBy(col("tok")).agg(sum(col("c")).as("ctot"))
        val ns = cs.groupBy(col("source")).agg(sum(col("c")).as("n1"))
        val tot = ns.agg(sum(col("n1")).as("n"))
        val grid = ct.crossJoin(broadcast(ns))
          .join(cs, Seq("source", "tok"), "left")
          .withColumn("c1", coalesce(col("c"), lit(0L)))
          .crossJoin(broadcast(tot))
        val p = col("c1").cast("double") / col("n1").cast("double")
        val q = (col("ctot") - col("c1")).cast("double") /
          (col("n") - col("n1")).cast("double")
        val m = (p + q) / lit(2.0)
        val termP = when(col("c1") > 0, p * log(p / m)).otherwise(lit(0.0))
        val termQ = when(col("ctot") > col("c1"), q * log(q / m)).otherwise(lit(0.0))
        grid
          .withColumn("tp", floor(termP * lit(1e9) + lit(0.5)).cast("long"))
          .withColumn("tq", floor(termQ * lit(1e9) + lit(0.5)).cast("long"))
          .groupBy(col("source"))
          .agg(max(col("n1")).as("n_tokens"),
            count(when(col("c1") > 0, 1)).as("n_vocab"),
            sum(col("tp")).as("sp"), sum(col("tq")).as("sq"))
          .select(col("source"), col("n_tokens"), col("n_vocab"),
            Num.r6((col("sp") + col("sq")).cast("double") / lit(2.0e9))
              .as("jsd"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (
          SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
        cs AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY source, tok),
        ct AS (SELECT tok, SUM(c) AS ctot FROM cs GROUP BY tok),
        ns AS (SELECT source, SUM(c) AS n1 FROM cs GROUP BY source),
        tot AS (SELECT SUM(n1) AS n FROM ns),
        grid AS (
          SELECT ct.tok, ct.ctot, ns.source, ns.n1,
            COALESCE(cs.c, 0) AS c1, t.n
          FROM ct CROSS JOIN ns
          LEFT JOIN cs ON cs.source = ns.source AND cs.tok = ct.tok
          CROSS JOIN tot t),
        terms AS (
          SELECT source, n1, c1,
            CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p,
            CAST(ctot - c1 AS DOUBLE) / CAST(n - n1 AS DOUBLE) AS q
          FROM grid),
        qt AS (
          SELECT source, n1, c1,
            CAST(FLOOR(CASE WHEN c1 > 0
                   THEN p * LN(p / ((p + q) / 2.0)) ELSE 0.0 END
                 * 1e9 + 0.5) AS BIGINT) AS tp,
            CAST(FLOOR(CASE WHEN q > 0
                   THEN q * LN(q / ((p + q) / 2.0)) ELSE 0.0 END
                 * 1e9 + 0.5) AS BIGINT) AS tq
          FROM terms)
        SELECT source, CAST(MAX(n1) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) FILTER (WHERE c1 > 0) AS BIGINT) AS n_vocab,
          FLOOR((CAST(SUM(tp) + SUM(tq) AS DOUBLE) / 2e9)
                * 1000000 + 0.500001) / 1000000 AS jsd
        FROM qt GROUP BY source ORDER BY source"""),
      "Jensen-Shannon divergence per source vs rest-of-corpus token distribution: nano-nat quantized terms, bounded by ln 2")
  )
}
