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
      "leakage-free split assignment: near-dup clusters are the split unit, md5-hashed to 5 folds")
  )
}
