package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 LM-pipeline operators: the statistical quality filter a
  * pretraining pipeline runs between heuristics and dedup — a corpus
  * bigram language model scoring per-document negative log-likelihood
  * (the classic "perplexity filter" proxy, here with the corpus as its
  * own LM) — and the dedup-aware train/test split that prevents
  * near-duplicate leakage across splits (the reason dedup runs BEFORE
  * splitting in every serious pipeline).
  */
object LmQuality {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q163
    // Per-doc bigram NLL under an add-k-smoothed corpus bigram LM:
    // P(w2|w1) = (c(w1,w2) + 0.5) / (c(w1) + 0.5*V). Docs scoring more
    // than one stddev above the corpus mean are outliers (the
    // high-perplexity tail a filter would drop). 100 TB shape: one
    // doc_id-shuffled window builds bigram instances (codegen; the q38
    // path), the count tables are vocab-bounded and AQE-broadcast when
    // small, the stats row broadcasts, and everything else is linear
    // per-row math.
    Query(
      "q163_bigram_nll",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .select(col("doc_id"), col("w1"), lead(col("w1"), 1).over(w).as("w2"))
          .filter(col("w2").isNotNull)
          .localCheckpoint() // feeds c2, c1, V and the instance join
        val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
        val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
        val v = bg.agg(countDistinct(col("w2")).as("vocab"))
        val nll = bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
          .crossJoin(broadcast(v))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            avg(-log((col("n2") + lit(0.5)) / (col("n1") + lit(0.5) * col("vocab"))))
              .as("nll"))
          .localCheckpoint() // feeds the stats row and the output
        val stats = nll.agg(avg(col("nll")).as("mu"),
          stddev_samp(col("nll")).as("sd"))
        nll.crossJoin(broadcast(stats))
          .select(col("doc_id"), col("n_bigrams"),
            Num.r4(col("nll")).as("bigram_nll"),
            (col("nll") > col("mu") + col("sd")).as("is_outlier"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        bg AS (
          SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
                                 FOR i IN range(1, len(t))], recursive := true)
          FROM toks),
        c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY w1),
        v AS (SELECT COUNT(DISTINCT w2) AS vocab FROM bg),
        nll AS (
          SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
            AVG(-LN((n2 + 0.5) / (n1 + 0.5 * vocab))) AS nll
          FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
          GROUP BY bg.doc_id),
        stats AS (SELECT AVG(nll) AS mu, STDDEV_SAMP(nll) AS sd FROM nll)
        SELECT doc_id, n_bigrams,
          FLOOR(nll * 10000 + 0.500001) / 10000 AS bigram_nll,
          (nll > mu + sd) AS is_outlier
        FROM nll CROSS JOIN stats
        ORDER BY doc_id"""),
      "per-doc NLL under an add-k corpus bigram LM with outlier flag (perplexity-filter proxy)"),

    // ---------------------------------------------------------------- q164
    // Dedup-aware train/val/test split: the split unit is the near-dup
    // CLUSTER (q84's transitive closure), so two near-duplicate
    // documents can never land in different splits — the leakage a
    // doc-hash split silently permits. Singletons are their own unit.
    // Assignment is the cross-engine-exact md5 hash of the unit, so the
    // split is reproducible, shuffle-free (per-row hash), and
    // membership-stable under re-runs.
    Query(
      "q164_dedup_split",
      (s, d) => {
        val labels = Dedup.clusterLabels(s, d)
          .select(col("doc_id"), col("cluster_id"))
        val unit = coalesce(col("cluster_id"), col("doc_id"))
        Tables.documents(s, d)
          .join(labels, Seq("doc_id"), "left")
          .select(col("doc_id"), unit.as("split_unit"),
            (Dedup.h60(concat_ws("", lit("s|"), unit.cast("string"))) % 5)
              .as("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH RECURSIVE ${Dedup.sqlClusterCtes}
        SELECT d.doc_id,
          COALESCE(c.cluster_id, d.doc_id) AS split_unit,
          ${Dedup.sqlH60("'s|' || CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)")} % 5 AS split
        FROM documents d LEFT JOIN clusters c ON c.doc = d.doc_id
        ORDER BY doc_id"""),
      "leakage-free split assignment: near-dup clusters are the split unit, md5-hashed to 5 folds"),

    // ---------------------------------------------------------------- q240
    // Stupid Backoff trigram scoring (Brants et al. 2007) — the
    // web-scale LM that skips normalization entirely: S(w₃|w₁w₂) =
    // tri/big if the trigram was seen, else 0.4·S(w₃|w₂), else
    // 0.4²·uni(w₃)/N, else 0.4²·(0.5/N) as the unseen-unigram floor.
    // Unlike q163 (add-k smoothing, trained and scored on the same
    // corpus), backoff only MEANS something out-of-sample, so counts
    // train on docs with doc_id % 3 ≠ 0 and score the held-out
    // doc_id % 3 = 0 third (the q199 train/eval discipline). Reported
    // per held-out doc: mean log-score (micro-nat quantized per
    // instance BEFORE the sum, one division at the end) and the
    // backoff share — how far the doc strays from trained context.
    // 100 TB shape: one tokenized pass each side, count tables bounded
    // by distinct n-grams, instance joins are hash shuffles on token
    // keys, the N row broadcasts; nothing quadratic anywhere.
    Query(
      "q240_stupid_backoff",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
          .select(col("doc_id"), col("w1"),
            lead(col("w1"), 1).over(w).as("w2"),
            lead(col("w1"), 2).over(w).as("w3"))
          .localCheckpoint() // feeds train counts AND held-out instances
        val train = toks.filter(col("doc_id") % 3 =!= 0)
        val tri = train.filter(col("w3").isNotNull)
          .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("n3"))
        val big = train.filter(col("w2").isNotNull)
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n2"))
        val uni = train.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
        val nTot = train.agg(count(lit(1)).as("nn"))
        val inst = toks.filter(col("doc_id") % 3 === 0 && col("w3").isNotNull)
          .join(tri, Seq("w1", "w2", "w3"), "left")
          .join(big.select(col("w1"), col("w2"), col("n2").as("c12")),
            Seq("w1", "w2"), "left")
          .join(big.select(col("w1").as("w2j"), col("w2").as("w3j"),
            col("n2").as("c23")),
            col("w2") === col("w2j") && col("w3") === col("w3j"), "left")
          .join(uni.select(col("w1").as("u2"), col("n1").as("cu2")),
            col("w2") === col("u2"), "left")
          .join(uni.select(col("w1").as("u3"), col("n1").as("cu3")),
            col("w3") === col("u3"), "left")
          .crossJoin(broadcast(nTot))
        val score =
          when(col("n3").isNotNull,
            col("n3").cast("double") / col("c12").cast("double"))
          .when(col("c23").isNotNull,
            lit(0.4) * col("c23").cast("double") / col("cu2").cast("double"))
          .when(col("cu3").isNotNull,
            lit(0.16) * col("cu3").cast("double") / col("nn").cast("double"))
          .otherwise(lit(0.16) * lit(0.5) / col("nn").cast("double"))
        inst
          .select(col("doc_id"),
            floor(log(score) * lit(1000000.0) + lit(0.5)).cast("long").as("lq"),
            when(col("n3").isNull, 1L).otherwise(0L).as("bo"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_trigrams"),
            sum(col("lq")).as("slq"), sum(col("bo")).as("nbo"))
          .select(col("doc_id"), col("n_trigrams"),
            Num.r4(col("slq").cast("double") / lit(1e6) /
              col("n_trigrams").cast("double")).as("sb_logscore"),
            Num.r6(col("nbo").cast("double") /
              col("n_trigrams").cast("double")).as("backoff_share"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
        tg AS (
          SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]}
                                 FOR i IN range(1, len(t)-1)], recursive := true)
          FROM toks WHERE len(t) >= 3),
        bg AS (
          SELECT doc_id, unnest([{'w1': t[i], 'w2': t[i+1]}
                                 FOR i IN range(1, len(t))], recursive := true)
          FROM toks WHERE len(t) >= 2),
        ug AS (SELECT doc_id, unnest(t) AS w FROM toks),
        tri AS (SELECT w1, w2, w3, COUNT(*) AS n3 FROM tg
                WHERE doc_id % 3 <> 0 GROUP BY 1, 2, 3),
        big AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg
                WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
        uni AS (SELECT w, COUNT(*) AS n1 FROM ug
                WHERE doc_id % 3 <> 0 GROUP BY 1),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM ug
               WHERE doc_id % 3 <> 0),
        inst AS (
          SELECT i.doc_id,
            CASE
              WHEN t.n3 IS NOT NULL
                THEN CAST(t.n3 AS DOUBLE) / b12.n2
              WHEN b23.n2 IS NOT NULL
                THEN 0.4 * b23.n2 / u2.n1
              WHEN u3.n1 IS NOT NULL
                THEN 0.16 * u3.n1 / nt.nn
              ELSE 0.16 * 0.5 / nt.nn
            END AS s,
            CASE WHEN t.n3 IS NULL THEN 1 ELSE 0 END AS bo
          FROM tg i
          LEFT JOIN tri t ON t.w1 = i.w1 AND t.w2 = i.w2 AND t.w3 = i.w3
          LEFT JOIN big b12 ON b12.w1 = i.w1 AND b12.w2 = i.w2
          LEFT JOIN big b23 ON b23.w1 = i.w2 AND b23.w2 = i.w3
          LEFT JOIN uni u2 ON u2.w = i.w2
          LEFT JOIN uni u3 ON u3.w = i.w3
          CROSS JOIN nt
          WHERE i.doc_id % 3 = 0),
        per AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
            SUM(CAST(FLOOR(LN(s) * 1000000.0 + 0.5) AS BIGINT)) AS slq,
            CAST(SUM(bo) AS BIGINT) AS nbo
          FROM inst GROUP BY doc_id)
        SELECT doc_id, n_trigrams,
          FLOOR((CAST(slq AS DOUBLE) / 1e6 / n_trigrams)
                * 10000 + 0.500001) / 10000 AS sb_logscore,
          FLOOR((CAST(nbo AS DOUBLE) / n_trigrams)
                * 1000000 + 0.500001) / 1000000 AS backoff_share
        FROM per ORDER BY doc_id"""),
      "Stupid Backoff trigram log-score of held-out docs (trained on doc_id%3!=0): micro-nat quantize-before-sum, per-doc backoff share")
  )
}
