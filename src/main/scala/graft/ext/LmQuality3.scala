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

    // ---------------------------------------------------------------- q191
    // Per-source conditional bigram entropy H(W₂|W₁) next to the
    // unigram entropy H(W₁) and the redundancy share 1 − H₂/H₁ — the
    // information-theoretic "how predictable is this source" audit
    // (Shannon 1951): boilerplate-heavy sources have high redundancy,
    // diverse prose low. H(W₂|W₁) = (1/N)·Σ c₁₂·ln(c₁/c₁₂),
    // H(W₁) = (1/N)·Σ c₁·ln(N/c₁) — each per-pair log is quantized to
    // integer nano-nats BEFORE the count-weighted sum (association-
    // proof); the grids are (source × vocab)-bounded like q180's.
    Query(
      "q191_conditional_entropy",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .select(col("source"), col("doc_id"), col("w1"),
            lead(col("w1"), 1).over(w).as("w2"))
          .filter(col("w2").isNotNull)
          .localCheckpoint() // one tokenize pass feeds all three grids
        val c2 = bg.groupBy(col("source"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("c12"))
        val c1 = c2.groupBy(col("source"), col("w1"))
          .agg(sum(col("c12")).as("c1"))
        val nTot = c1.groupBy(col("source")).agg(sum(col("c1")).as("n"))
        val h2 = c2.join(c1, Seq("source", "w1"))
          .select(col("source"), (col("c12") *
            floor(log(col("c1").cast("double") / col("c12").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long")).cast("decimal(38,0)").as("t"))
          .groupBy(col("source")).agg(sum(col("t")).as("s2"))
        val h1 = c1.join(broadcast(nTot), Seq("source"))
          .select(col("source"), (col("c1") *
            floor(log(col("n").cast("double") / col("c1").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long")).cast("decimal(38,0)").as("t"))
          .groupBy(col("source")).agg(sum(col("t")).as("s1"))
        h1.join(h2, Seq("source")).join(broadcast(nTot), Seq("source"))
          .select(col("source"), col("n").as("n_bigrams"),
            Num.r6(col("s1").cast("double") / col("n") / lit(1e9)).as("h_unigram"),
            Num.r6(col("s2").cast("double") / col("n") / lit(1e9)).as("h_cond"),
            Num.r6(lit(1.0) - (col("s2").cast("double") / col("s1").cast("double")))
              .as("redundancy"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                      FROM documents),
        bg AS (
          SELECT source, unnest([{'w1': t[i], 'w2': t[i+1]}
                                 FOR i IN range(1, len(t))], recursive := true)
          FROM toks),
        c2 AS (SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
               FROM bg GROUP BY source, w1, w2),
        c1 AS (SELECT source, w1, CAST(SUM(c12) AS BIGINT) AS c1
               FROM c2 GROUP BY source, w1),
        nt AS (SELECT source, CAST(SUM(c1) AS BIGINT) AS n FROM c1 GROUP BY source),
        h2 AS (
          SELECT c2.source, SUM(c12 * CAST(FLOOR(
              LN(CAST(c1 AS DOUBLE) / c12) * 1e9 + 0.5) AS BIGINT)) AS s2
          FROM c2 JOIN c1 USING (source, w1) GROUP BY c2.source),
        h1 AS (
          SELECT c1.source, SUM(c1 * CAST(FLOOR(
              LN(CAST(n AS DOUBLE) / c1) * 1e9 + 0.5) AS BIGINT)) AS s1
          FROM c1 JOIN nt USING (source) GROUP BY c1.source)
        SELECT source, n AS n_bigrams,
          FLOOR((CAST(s1 AS DOUBLE) / n / 1e9) * 1000000 + 0.500001) / 1000000
            AS h_unigram,
          FLOOR((CAST(s2 AS DOUBLE) / n / 1e9) * 1000000 + 0.500001) / 1000000
            AS h_cond,
          FLOOR((1.0 - CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS redundancy
        FROM h1 JOIN h2 USING (source) JOIN nt USING (source)
        ORDER BY source"""),
      "per-source conditional bigram entropy vs unigram entropy with redundancy share (Shannon predictability audit)"),

    // ---------------------------------------------------------------- q193
    // Source-purity audit: each document's TF-IDF cosine to its OWN
    // source's centroid; documents more than one stddev below their
    // source's mean cohesion are misfiled-content candidates (the
    // "this crawl bucket contains something else" check). Exactness:
    // TF-IDF weights are quantized to integer micro-units, centroids
    // kept as INTEGER component sums (divide-free until the final
    // cosine), and all dot/norm accumulations run in DECIMAL(38)/
    // HUGEINT. Scale shape: everything is sparse joins on term — the
    // centroid table is (source × vocab)-bounded, the doc-side join is
    // corpus-linear in token instances, and no dense vectors exist.
    Query(
      "q193_source_purity",
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), " ")).as("term"))
          .groupBy(col("doc_id"), col("source"), col("term"))
          .agg(count(lit(1)).as("tf"))
          .localCheckpoint() // one tokenize pass feeds df, weights, centroids
        val nDocs = tf.select(col("doc_id")).distinct().count()
        val df_ = tf.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val wts = tf.join(df_, Seq("term"))
          .select(col("doc_id"), col("source"), col("term"),
            floor(col("tf") * log(lit(nDocs.toDouble) / col("df").cast("double"))
              * lit(1e6) + lit(0.5)).cast("long").as("wq"))
        val cent = wts.groupBy(col("source"), col("term"))
          .agg(sum(col("wq")).as("cq"), count(lit(1)).as("nd"))
        val srcN = wts.select(col("source"), col("doc_id")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("n_src"))
        // dot(doc, centroid·n_src) and the two norms — integer sums
        val dots = wts.join(cent, Seq("source", "term"))
          .groupBy(col("doc_id"), col("source"))
          .agg(Exact.m2("wq", "cq").as("dot"),
            Exact.m2("wq", "wq").as("nd2"))
        val cnorm = cent.groupBy(col("source"))
          .agg(Exact.m2("cq", "cq").as("nc2"))
        val cos = dots.join(broadcast(cnorm), Seq("source"))
          .select(col("doc_id"), col("source"),
            (col("dot").cast("double") /
              (sqrt(col("nd2").cast("double")) * sqrt(col("nc2").cast("double"))))
              .as("c"))
          .localCheckpoint() // feeds per-source stats AND the output rows
        val stats = cos.groupBy(col("source"))
          .agg(avg(col("c")).as("mu"), stddev_samp(col("c")).as("sd"))
        cos.join(broadcast(stats), Seq("source"))
          .select(col("doc_id"), col("source"),
            Num.r4(col("c")).as("centroid_cos"),
            (col("c") < col("mu") - col("sd")).as("is_outlier"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tf AS (
          SELECT doc_id, source, term, CAST(COUNT(*) AS BIGINT) AS tf
          FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
                FROM documents)
          GROUP BY doc_id, source, term),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        wts AS (
          SELECT doc_id, source, term,
            CAST(FLOOR(tf * LN(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5)
                 AS BIGINT) AS wq
          FROM tf JOIN df USING (term) CROSS JOIN nd),
        cent AS (SELECT source, term, SUM(wq) AS cq
                 FROM wts GROUP BY source, term),
        dots AS (
          SELECT w.doc_id, w.source,
            SUM(CAST(w.wq AS HUGEINT) * c.cq) AS dot,
            SUM(CAST(w.wq AS HUGEINT) * w.wq) AS nd2
          FROM wts w JOIN cent c ON c.source = w.source AND c.term = w.term
          GROUP BY w.doc_id, w.source),
        cn AS (SELECT source, SUM(CAST(cq AS HUGEINT) * cq) AS nc2
               FROM cent GROUP BY source),
        cos AS (
          SELECT doc_id, d.source,
            CAST(dot AS DOUBLE) /
              (SQRT(CAST(nd2 AS DOUBLE)) * SQRT(CAST(nc2 AS DOUBLE))) AS c
          FROM dots d JOIN cn USING (source)),
        st AS (SELECT source, AVG(c) AS mu, STDDEV_SAMP(c) AS sd
               FROM cos GROUP BY source)
        SELECT doc_id, source,
          FLOOR(c * 10000 + 0.500001) / 10000 AS centroid_cos,
          (c < mu - sd) AS is_outlier
        FROM cos JOIN st USING (source)
        ORDER BY doc_id"""),
      "per-doc TF-IDF cosine to own-source centroid with below-mean-minus-sigma outlier flag (misfiled-content audit)"),

    // ---------------------------------------------------------------- q200
    // One DoReMi-style multiplicative-weights step over source mixture
    // weights (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures"):
    // each source's EXCESS cross-entropy under the corpus bigram LM
    // (the q163 model) drives w′ ∝ w·exp(η·excess), η = 1 — sources
    // the reference model finds hard gain weight, easy/templated ones
    // lose it. Per-instance NLL terms are quantized to integer
    // nano-nats before the per-source sums; the 20-row softmax
    // normalization quantizes each w·exp(·) to 1e-12 ticks so the
    // bounded sum is integer-exact too.
    Query(
      "q200_doremi_step",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .select(col("source"), col("doc_id"), col("w1"),
            lead(col("w1"), 1).over(w).as("w2"))
          .filter(col("w2").isNotNull)
        // per-source bigram counts FIRST: every later sum is then a
        // count-weighted fold over the (sources × vocab²)-bounded grid
        // — the corpus-sized instance join the first plan paid at 100×
        // (16 s) never happens (Σ_inst nq ≡ Σ_pairs cnt·nq exactly)
        val c2s = bg.groupBy(col("source"), col("w1"), col("w2"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val c2 = c2s.groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("n2"))
        val c1 = c2.groupBy(col("w1")).agg(sum(col("n2")).as("n1"))
        val v = c2.agg(countDistinct(col("w2")).as("vocab"))
        val nq = c2.join(c1, Seq("w1")).crossJoin(broadcast(v))
          .select(col("w1"), col("w2"),
            floor(-log((col("n2") + lit(0.5)) /
                (col("n1") + lit(0.5) * col("vocab")))
              * lit(1e9) + lit(0.5)).cast("long").as("nq"))
        val perSrc = c2s.join(nq, Seq("w1", "w2"))
          .groupBy(col("source"))
          .agg(sum(col("cnt")).as("n"), sum(col("cnt") * col("nq")).as("sq"))
          .localCheckpoint() // bounded |sources| rows
        val tot = perSrc.agg(sum(col("n")).as("nt"), sum(col("sq")).as("st"))
        val hs = col("sq").cast("double") / col("n") / lit(1e9)
        val hc = col("st").cast("double") / col("nt") / lit(1e9)
        val share = col("n").cast("double") / col("nt").cast("double")
        val scored = perSrc.crossJoin(broadcast(tot))
          .withColumn("excess", hs - hc)
          .withColumn("uq",
            floor(share * exp(col("excess")) * lit(1e12) + lit(0.5))
              .cast("long"))
          .localCheckpoint() // quantized unnormalized weights, bounded
        val z = scored.agg(sum(col("uq")).as("z"))
        scored.crossJoin(broadcast(z))
          .select(col("source"), col("n").as("n_bigrams"),
            Num.r6(share).as("token_share"),
            Num.r6(col("excess")).as("excess_nll"),
            Num.r6(col("uq").cast("double") / col("z").cast("double"))
              .as("new_weight"))
          .orderBy(col("source"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                      FROM documents),
        bg AS (
          SELECT source, unnest([{'w1': t[i], 'w2': t[i+1]}
                                 FOR i IN range(1, len(t))], recursive := true)
          FROM toks),
        c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM bg),
        inst AS (
          SELECT source,
            CAST(FLOOR(-LN((n2 + 0.5) / (n1 + 0.5 * vocab)) * 1e9 + 0.5)
                 AS BIGINT) AS nq
          FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v),
        ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n, SUM(nq) AS sq
               FROM inst GROUP BY source),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(sq) AS st FROM ps),
        sc AS (
          SELECT source, n,
            CAST(n AS DOUBLE) / nt AS share,
            CAST(sq AS DOUBLE) / n / 1e9 - CAST(st AS DOUBLE) / nt / 1e9
              AS excess
          FROM ps CROSS JOIN tot),
        uw AS (
          SELECT source, n, share, excess,
            CAST(FLOOR(share * EXP(excess) * 1e12 + 0.5) AS BIGINT) AS uq
          FROM sc),
        z AS (SELECT SUM(uq) AS z FROM uw)
        SELECT source, n AS n_bigrams,
          FLOOR(share * 1000000 + 0.500001) / 1000000 AS token_share,
          FLOOR(excess * 1000000 + 0.500001) / 1000000 AS excess_nll,
          FLOOR((CAST(uq AS DOUBLE) / z) * 1000000 + 0.500001) / 1000000
            AS new_weight
        FROM uw CROSS JOIN z ORDER BY source"""),
      "one DoReMi multiplicative-weights step over source mixture weights driven by excess corpus-LM cross-entropy, integer nano-nat and 1e-12-tick quantization"),

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
      "Benjamini-Hochberg FDR step-up over per-source KS drift p-values (asymptotic two-sample formula)"),

    // --------------------------------------------------------------- q227
    // Filter-cascade funnel: the curation report every pretraining
    // run starts with — per source, how many documents survive each
    // successive quality rule, in order: R1 length (≥ 5 tokens), R2
    // lexical diversity (distinct tokens ≥ half of tokens — the
    // cheap repetition cut), R3 token shape (mean token length ≤ 12
    // chars — the gibberish/minified cut). Ordered so the cheap rule
    // runs first and each column bounds the next — the funnel tells
    // you WHICH rule is eating a source, not just the final yield.
    // Every predicate is an INTEGER comparison (2·distinct ≥ n_tok;
    // chars ≤ 12·n_tok), so there is no threshold-boundary float
    // drift to absorb. One row-local pass (array_distinct, no token
    // explode), one grouped rollup on the bounded source grid.
    Query(
      "q227_filter_cascade",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("source"),
          size(split(col("text"), " ")).cast("long").as("ntok"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("ndis"),
          length(translate(col("text"), " ", "")).cast("long").as("nch"))
        docs
          .select(col("source"),
            (col("ntok") >= 5).as("p1"),
            (col("ndis") * 2 >= col("ntok")).as("p2"),
            (col("nch") <= col("ntok") * 12).as("p3"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("p1"), 1L).otherwise(0L)).as("pass_len"),
            sum(when(col("p1") && col("p2"), 1L).otherwise(0L))
              .as("pass_len_rep"),
            sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L))
              .as("pass_all"))
          .select(col("source"), col("n_docs"), col("pass_len"),
            col("pass_len_rep"), col("pass_all"),
            Num.r6(col("pass_all").cast("double")
              / col("n_docs").cast("double")).as("survival_share"))
          .orderBy(col("source"))
      },
      Some("""
        WITH f AS (
          SELECT source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
            CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
              AS ndis,
            CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS nch
          FROM documents),
        p AS (
          SELECT source, ntok >= 5 AS p1, ndis * 2 >= ntok AS p2,
            nch <= ntok * 12 AS p3
          FROM f)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(*) FILTER (WHERE p1) AS BIGINT) AS pass_len,
          CAST(COUNT(*) FILTER (WHERE p1 AND p2) AS BIGINT) AS pass_len_rep,
          CAST(COUNT(*) FILTER (WHERE p1 AND p2 AND p3) AS BIGINT) AS pass_all,
          FLOOR((CAST(COUNT(*) FILTER (WHERE p1 AND p2 AND p3) AS DOUBLE)
                 / COUNT(*)) * 1000000 + 0.500001) / 1000000
            AS survival_share
        FROM p GROUP BY source ORDER BY source"""),
      "per-source filter-cascade funnel (length, lexical diversity, token shape): integer-exact survivors after each successive rule"),

    // ---------------------------------------------------------------- q251
    // Character-class mix per source: letter/digit/space shares and
    // the non-ASCII count — the cheap script/encoding audit that
    // catches mojibake, binary spills and wrong-language drift before
    // tokenization sees them. Class counts are exact integers via
    // length-minus-stripped-length (one regexp_replace per class, no
    // per-char explode); all sums int64, shares divided once. The
    // punct_other share is the closed-form remainder, so the four
    // shares sum to 1 by construction.
    Query(
      "q251_charclass_mix",
      (s, d) => {
        def cls(re: String): org.apache.spark.sql.Column =
          length(col("text")) - length(regexp_replace(col("text"), re, ""))
        val per = Tables.documents(s, d)
          .select(col("source"), length(col("text")).as("nc"),
            cls("[A-Za-z]").as("lt"), cls("[0-9]").as("dg"),
            cls("[ ]").as("sp"), cls("[^\\x00-\\x7F]").as("na"))
        per.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nc")).as("n_chars"), sum(col("lt")).as("letters"),
            sum(col("dg")).as("digits"), sum(col("sp")).as("spaces"),
            sum(col("na")).as("nonascii_chars"))
          .select(col("source"), col("n_docs"), col("n_chars"),
            Num.r6(col("letters").cast("double") / col("n_chars"))
              .as("letter_share"),
            Num.r6(col("digits").cast("double") / col("n_chars"))
              .as("digit_share"),
            Num.r6(col("spaces").cast("double") / col("n_chars"))
              .as("space_share"),
            Num.r6((col("n_chars") - col("letters") - col("digits")
              - col("spaces")).cast("double") / col("n_chars"))
              .as("punct_other_share"),
            col("nonascii_chars"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH per AS (
          SELECT source, LENGTH(text) AS nc,
            LENGTH(text) - LENGTH(regexp_replace(text, '[A-Za-z]', '', 'g'))
              AS lt,
            LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g'))
              AS dg,
            LENGTH(text) - LENGTH(regexp_replace(text, '[ ]', '', 'g'))
              AS sp,
            LENGTH(text) - LENGTH(regexp_replace(text, '[^\\x00-\\x7F]', '',
              'g')) AS na
          FROM documents),
        agg AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(nc) AS BIGINT) AS n_chars,
            CAST(SUM(lt) AS BIGINT) AS letters,
            CAST(SUM(dg) AS BIGINT) AS digits,
            CAST(SUM(sp) AS BIGINT) AS spaces,
            CAST(SUM(na) AS BIGINT) AS nonascii_chars
          FROM per GROUP BY source)
        SELECT source, n_docs, n_chars,
          ${Num.sql("CAST(letters AS DOUBLE) / n_chars", 6)} AS letter_share,
          ${Num.sql("CAST(digits AS DOUBLE) / n_chars", 6)} AS digit_share,
          ${Num.sql("CAST(spaces AS DOUBLE) / n_chars", 6)} AS space_share,
          ${Num.sql("CAST(n_chars - letters - digits - spaces AS DOUBLE) / n_chars", 6)}
            AS punct_other_share,
          nonascii_chars
        FROM agg ORDER BY source"""),
      "character-class mix per source: exact-integer letter/digit/space/punct shares and non-ASCII count via length-minus-stripped-length")
  )
}
