package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine classical classifiers, round-6 continuation: a multinomial
  * naive-Bayes text classifier and a single-split decision stump — the
  * two models a data-curation pipeline actually trains inside the
  * engine (fastText-style source/quality gating, one-rule baselines)
  * rather than exporting to a framework. Both follow the q199 in-engine
  * train/eval discipline: deterministic split, integer-quantized
  * scores so the argmax is exact cross-engine, and hold-out metrics as
  * the output.
  */
object Classify {

  /** The q269 naive-Bayes train/score pipeline up to per-eval-doc
    * predictions: (doc_id, source = truth, csrc = argmax class). Shared
    * with q274's McNemar comparison so both queries pin the SAME model.
    * Eval docs whose every token is out-of-vocabulary drop here (no
    * scored class), identically in the oracle.
    */
  private[ext] def nbPredictions(s: org.apache.spark.sql.SparkSession, d: String) = {
    // materialize the token explode ONCE — train stats, vocab and eval
    // counts all derive from it (13 scans → 2 in the physical plan)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .localCheckpoint()
    val train = docs.filter(col("doc_id") % 10 < 7)
    val eval_ = docs.filter(col("doc_id") % 10 >= 7)
    // class stats: train token mass per source, doc counts, vocab
    val clsTok = train.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val clsDoc = Tables.documents(s, d).filter(col("doc_id") % 10 < 7)
      .groupBy(col("source")).agg(count(lit(1)).as("docs_s"))
      .localCheckpoint() // bounded class table; also feeds the total
    val totDoc = clsDoc.agg(sum(col("docs_s")).as("docs_n"))
    val vocab = train.select(col("t")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v"))
    // 20-row class table: nano-quantized log-prior and the shared
    // OOV/zero-count log-likelihood ln(1/(ns+V))
    val cls = clsTok.join(clsDoc, Seq("source"))
      .crossJoin(broadcast(totDoc)).crossJoin(broadcast(vSize))
      .select(col("source"), col("ns"), col("v"),
        floor(log(col("docs_s").cast("double") / col("docs_n").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long").as("priorq"),
        floor(log(lit(1.0) / (col("ns").cast("double") + col("v").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long").as("unkq"))
    // (vocab × classes) grid of nano-quantized log-likelihoods
    val counts = train.groupBy(col("t"), col("source")).agg(count(lit(1)).as("ct"))
    val grid = vocab.crossJoin(broadcast(cls.select(col("source"), col("ns"), col("v"))))
      .join(counts, Seq("t", "source"), "left")
      .na.fill(0L, Seq("ct"))
      .select(col("t"), col("source").as("csrc"),
        floor(log((col("ct").cast("double") + lit(1.0)) /
          (col("ns").cast("double") + col("v").cast("double")))
          * lit(1e9) + lit(0.5)).cast("long").as("lq"))
    // eval tokens: per-doc counts, split known/unknown vs train vocab
    val evalCnt = eval_.groupBy(col("doc_id"), col("source"), col("t"))
      .agg(count(lit(1)).as("m"))
    val known = evalCnt.join(grid, Seq("t"))
      .groupBy(col("doc_id"), col("source"), col("csrc"))
      .agg(sum(col("m") * col("lq")).as("kscore"))
    val unk = evalCnt.join(vocab, Seq("t"), "left_anti")
      .groupBy(col("doc_id")).agg(sum(col("m")).as("m_unk"))
    val scored = known
      .join(unk, Seq("doc_id"), "left")
      .na.fill(0L, Seq("m_unk"))
      .join(broadcast(cls.select(col("source").as("csrc"),
        col("priorq"), col("unkq"))), Seq("csrc"))
      .select(col("doc_id"), col("source"), col("csrc"),
        (col("priorq") + col("kscore") + col("m_unk") * col("unkq")).as("score"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("csrc"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("csrc"))
  }

  /** The q269 oracle's shared CTE prefix, ending in `pred(doc_id,
    * source, csrc)` — q274's oracle appends to the same chain. */
  private[ext] val nbSqlPrefix: String = """
        WITH toks AS (
          SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
          FROM documents),
        train AS (SELECT * FROM toks WHERE doc_id % 10 < 7),
        ev AS (SELECT * FROM toks WHERE doc_id % 10 >= 7),
        clstok AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
                   FROM train GROUP BY source),
        clsdoc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_s
                   FROM documents WHERE doc_id % 10 < 7 GROUP BY source),
        totdoc AS (SELECT CAST(COUNT(*) AS BIGINT) AS docs_n
                   FROM documents WHERE doc_id % 10 < 7),
        vocab AS (SELECT DISTINCT t FROM train),
        vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
        cls AS (
          SELECT source, ns, v,
            CAST(FLOOR(LN(CAST(docs_s AS DOUBLE) / CAST(docs_n AS DOUBLE))
                       * 1e9 + 0.5) AS BIGINT) AS priorq,
            CAST(FLOOR(LN(1.0 / (CAST(ns AS DOUBLE) + CAST(v AS DOUBLE)))
                       * 1e9 + 0.5) AS BIGINT) AS unkq
          FROM clstok JOIN clsdoc USING (source)
          CROSS JOIN totdoc CROSS JOIN vsize),
        counts AS (SELECT t, source, CAST(COUNT(*) AS BIGINT) AS ct
                   FROM train GROUP BY t, source),
        grid AS (
          SELECT vocab.t, cls.source AS csrc,
            CAST(FLOOR(LN((CAST(COALESCE(ct, 0) AS DOUBLE) + 1.0)
                          / (CAST(ns AS DOUBLE) + CAST(v AS DOUBLE)))
                       * 1e9 + 0.5) AS BIGINT) AS lq
          FROM vocab CROSS JOIN cls
          LEFT JOIN counts ON counts.t = vocab.t AND counts.source = cls.source),
        evcnt AS (
          SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS m
          FROM ev GROUP BY doc_id, source, t),
        known AS (
          SELECT doc_id, source, csrc, SUM(m * lq) AS kscore
          FROM evcnt JOIN grid USING (t)
          GROUP BY doc_id, source, csrc),
        unk AS (
          SELECT doc_id, SUM(m) AS m_unk
          FROM evcnt ANTI JOIN vocab USING (t)
          GROUP BY doc_id),
        scored AS (
          SELECT known.doc_id, known.source, known.csrc,
            priorq + kscore + COALESCE(m_unk, 0) * unkq AS score
          FROM known
          LEFT JOIN unk ON unk.doc_id = known.doc_id
          JOIN (SELECT source AS csrc, priorq, unkq FROM cls) c
            ON c.csrc = known.csrc),
        pred AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, csrc) AS rn
            FROM scored) WHERE rn = 1)"""

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q269
    // Multinomial naive Bayes predicting `source` from tokens, trained
    // on doc_id%10<7, evaluated on the rest. Laplace-smoothed
    // log-likelihoods and log-priors are nano-quantized (⌊ln(·)·10⁹⌋,
    // the q205/q240 trick), so per-doc scores are exact int64 sums and
    // the (score DESC, source ASC) argmax cannot flip on a 1-ulp
    // engine difference. Out-of-vocabulary eval tokens carry the
    // ct=0 smoothed mass per class. Scale shape: the model is a
    // (vocab × classes) grid built once from one token-count pass;
    // scoring joins eval tokens to the grid on token (grid-bounded
    // fan-out of ×classes) plus a broadcast 20-row class table — no
    // all-pairs anywhere, everything corpus-linear.
    Query(
      "q269_naive_bayes",
      (s, d) => {
        nbPredictions(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n_eval"),
            count(when(col("csrc") === col("source"), 1)).as("n_correct"))
          .select(col("source"), col("n_eval"), col("n_correct"),
            Num.r4(col("n_correct").cast("double") / col("n_eval").cast("double"))
              .as("accuracy"))
          .orderBy(col("source"))
      },
      Some(nbSqlPrefix + """
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_eval,
          CAST(COUNT(*) FILTER (WHERE csrc = source) AS BIGINT) AS n_correct,
          FLOOR((CAST(COUNT(*) FILTER (WHERE csrc = source) AS DOUBLE)
                 / COUNT(*)) * 10000 + 0.500001) / 10000 AS accuracy
        FROM pred GROUP BY source ORDER BY source"""),
      "Multinomial naive Bayes source classifier: 70/30 doc_id split, nano-quantized Laplace log-likelihoods, per-source hold-out accuracy"),

    // ---------------------------------------------------------------- q270
    // One-rule decision stump: predict purchase vs non-purchase from
    // `value`, choosing the best of the 9 train-decile thresholds by
    // Gini gain. Thresholds are exact integer rank cuts over the
    // micro-quantized value (q256's rank-cut discipline); the Gini gain
    // is picocent-quantized from identical count-derived doubles so the
    // (gain DESC, cut ASC) argmax is exact. Train on event_id%10<7,
    // report the chosen stump and its hold-out confusion. The ×9
    // candidate fan-out is a constant factor on one shuffle — at 100 TB
    // this is one pass plus a 9-row broadcast.
    Query(
      "q270_decision_stump",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(col("event_id"),
            floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("bucket"),
            (col("event_type") === "purchase").cast("long").as("y"))
        val train = ev.filter(col("event_id") % 10 < 7)
        val eval_ = ev.filter(col("event_id") % 10 >= 7)
        // bounded cent-bucket histogram (value domain ≤ ~60k buckets),
        // cumulative counts over it — no raw-row global sort (q223)
        val hist = train.groupBy(col("bucket"))
          .agg(count(lit(1)).as("cnt"), sum(col("y")).as("a"))
        val cum = hist
          .withColumn("cumn", sum(col("cnt")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cuma", sum(col("a")).over(
            Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
          .localCheckpoint() // bounded; feeds cut pick + gain eval once
        val tot = train.agg(count(lit(1)).as("n"), sum(col("y")).as("atot"))
        // decile thresholds: smallest bucket whose cumulative count
        // reaches rank (j·n) div 10, j=1..9; coincident cuts dedupe
        val cuts = cum.crossJoin(broadcast(tot))
          .crossJoin(broadcast((1 to 9).toDF("j")))
          // integer div to mirror DuckDB's `//` — Spark's `/` on longs
          // is DOUBLE division
          .filter(col("cumn") >= expr("(j * n) div 10"))
          .groupBy(col("j")).agg(min(col("bucket")).as("cut"))
          .select(col("cut")).distinct()
        // per-cut left/right class counts from the cumulative histogram
        val splits = cuts.crossJoin(broadcast(tot))
          .join(cum.select(col("bucket"), col("cumn"), col("cuma")),
            col("bucket") === col("cut"))
          .select(col("cut"), col("n"), col("atot"),
            col("cumn").as("nl"), col("cuma").as("al"))
          .filter(col("nl") > 0 && col("nl") < col("n"))
        // Gini gain, picocent-quantized; fixed expression order
        val gained = splits
          .withColumn("nr", col("n") - col("nl"))
          .withColumn("ar", col("atot") - col("al"))
          .withColumn("pp", col("atot").cast("double") / col("n").cast("double"))
          .withColumn("pl", col("al").cast("double") / col("nl").cast("double"))
          .withColumn("pr", col("ar").cast("double") / col("nr").cast("double"))
          .withColumn("gp", lit(1.0) - col("pp") * col("pp")
            - (lit(1.0) - col("pp")) * (lit(1.0) - col("pp")))
          .withColumn("gl", lit(1.0) - col("pl") * col("pl")
            - (lit(1.0) - col("pl")) * (lit(1.0) - col("pl")))
          .withColumn("gr", lit(1.0) - col("pr") * col("pr")
            - (lit(1.0) - col("pr")) * (lit(1.0) - col("pr")))
          .withColumn("gainq", floor((col("gp")
            - (col("nl").cast("double") / col("n").cast("double")) * col("gl")
            - (col("nr").cast("double") / col("n").cast("double")) * col("gr"))
            * lit(1e12) + lit(0.5)).cast("long"))
        val best = gained
          .withColumn("rn", row_number().over(
            Window.orderBy(col("gainq").desc, col("cut"))))
          .filter(col("rn") === 1)
          .select(col("cut"), col("gainq"),
            (col("al") * 2 > col("nl")).as("left_label"),
            (col("ar") * 2 > col("nr")).as("right_label"))
        eval_.crossJoin(broadcast(best))
          .withColumn("pred", when(col("bucket") <= col("cut"),
            col("left_label")).otherwise(col("right_label")))
          .groupBy(col("cut"), col("gainq"), col("left_label"), col("right_label"))
          .agg(count(lit(1)).as("n_eval"),
            count(when(col("pred") === (col("y") === 1), 1)).as("n_correct"))
          .select(
            Num.r4(col("cut").cast("double") / lit(100.0)).as("cut_value"),
            Num.r6(col("gainq").cast("double") / lit(1e12)).as("gini_gain"),
            col("left_label"), col("right_label"), col("n_eval"), col("n_correct"),
            Num.r4(col("n_correct").cast("double") / col("n_eval").cast("double"))
              .as("accuracy"))
          .orderBy(col("cut_value"))
      },
      Some("""
        WITH ev AS (
          SELECT event_id,
            CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bucket,
            CAST(event_type = 'purchase' AS BIGINT) AS y
          FROM events),
        train AS (SELECT * FROM ev WHERE event_id % 10 < 7),
        eval_ AS (SELECT * FROM ev WHERE event_id % 10 >= 7),
        hist AS (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt,
            CAST(SUM(y) AS BIGINT) AS a
          FROM train GROUP BY bucket),
        cum AS (
          SELECT bucket,
            CAST(SUM(cnt) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn,
            CAST(SUM(a) OVER (ORDER BY bucket
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma
          FROM hist),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(y) AS BIGINT) AS atot FROM train),
        cuts AS (
          SELECT DISTINCT cut FROM (
            SELECT j, MIN(bucket) AS cut
            FROM cum CROSS JOIN tot
            CROSS JOIN (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS v(j))
            WHERE cumn >= (j * n) // 10
            GROUP BY j)),
        splits AS (
          SELECT cut, n, atot, cumn AS nl, cuma AS al
          FROM cuts CROSS JOIN tot
          JOIN cum ON cum.bucket = cuts.cut
          WHERE cumn > 0 AND cumn < n),
        gained AS (
          SELECT cut, n, atot, nl, al, n - nl AS nr, atot - al AS ar,
            CAST(FLOOR((
              (1.0 - (CAST(atot AS DOUBLE) / n) * (CAST(atot AS DOUBLE) / n)
                   - (1.0 - CAST(atot AS DOUBLE) / n) * (1.0 - CAST(atot AS DOUBLE) / n))
              - (CAST(nl AS DOUBLE) / n) *
                (1.0 - (CAST(al AS DOUBLE) / nl) * (CAST(al AS DOUBLE) / nl)
                     - (1.0 - CAST(al AS DOUBLE) / nl) * (1.0 - CAST(al AS DOUBLE) / nl))
              - (CAST(n - nl AS DOUBLE) / n) *
                (1.0 - (CAST(atot - al AS DOUBLE) / (n - nl)) * (CAST(atot - al AS DOUBLE) / (n - nl))
                     - (1.0 - CAST(atot - al AS DOUBLE) / (n - nl)) * (1.0 - CAST(atot - al AS DOUBLE) / (n - nl)))
              ) * 1e12 + 0.5) AS BIGINT) AS gainq
          FROM splits),
        best AS (
          SELECT cut, gainq, al * 2 > nl AS left_label,
            ar * 2 > nr AS right_label
          FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY gainq DESC, cut) AS rn
                FROM gained) WHERE rn = 1),
        scored AS (
          SELECT cut, gainq, left_label, right_label,
            CASE WHEN bucket <= cut THEN left_label ELSE right_label END AS pred,
            y = 1 AS truth
          FROM eval_ CROSS JOIN best)
        SELECT
          FLOOR((CAST(cut AS DOUBLE) / 100.0) * 10000 + 0.500001) / 10000
            AS cut_value,
          FLOOR((CAST(gainq AS DOUBLE) / 1e12) * 1000000 + 0.500001) / 1000000
            AS gini_gain,
          left_label, right_label,
          CAST(COUNT(*) AS BIGINT) AS n_eval,
          CAST(COUNT(*) FILTER (WHERE pred = truth) AS BIGINT) AS n_correct,
          FLOOR((CAST(COUNT(*) FILTER (WHERE pred = truth) AS DOUBLE) / COUNT(*))
                * 10000 + 0.500001) / 10000 AS accuracy
        FROM scored
        GROUP BY cut, gainq, left_label, right_label ORDER BY cut_value"""),
      "One-rule decision stump on value deciles predicting purchase events: exact rank cuts over a bounded histogram, picocent-quantized Gini gain, hold-out confusion"),

    // ---------------------------------------------------------------- q274
    // McNemar's paired test: is q269's naive Bayes actually better than
    // the prior-only baseline (always predict the majority train
    // source) on the SAME eval docs? Accuracy deltas on paired data
    // need the paired test — only the discordant counts b (NB right,
    // baseline wrong) and c (baseline right, NB wrong) carry signal.
    // Continuity-corrected χ²₁ = (max(|b−c|−1,0))²/(b+c), 5% critical
    // value 3.841. Integer counts end-to-end; one extra broadcast row
    // (the majority class) on top of the shared q269 pipeline.
    Query(
      "q274_mcnemar",
      (s, d) => {
        val pred = nbPredictions(s, d)
        val baseline = Tables.documents(s, d).filter(col("doc_id") % 10 < 7)
          .groupBy(col("source")).agg(count(lit(1)).as("docs_s"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("docs_s").desc, col("source"))))
          .filter(col("rn") === 1)
          .select(col("source").as("bsrc"))
        val paired = pred.crossJoin(broadcast(baseline))
          .select(
            (col("csrc") === col("source")).cast("long").as("nb_ok"),
            (col("bsrc") === col("source")).cast("long").as("base_ok"))
        paired.agg(
          count(lit(1)).as("n_eval"),
          sum(col("nb_ok")).as("nb_correct"),
          sum(col("base_ok")).as("base_correct"),
          sum(when(col("nb_ok") === 1 && col("base_ok") === 0, 1L).otherwise(0L)).as("b_disc"),
          sum(when(col("nb_ok") === 0 && col("base_ok") === 1, 1L).otherwise(0L)).as("c_disc"))
          .select(col("n_eval"), col("nb_correct"), col("base_correct"),
            col("b_disc"), col("c_disc"),
            when(col("b_disc") + col("c_disc") === 0, lit(0.0))
              .otherwise(Num.r4(
                pow(greatest(abs(col("b_disc") - col("c_disc")).cast("double") - lit(1.0), lit(0.0)), 2)
                  / (col("b_disc") + col("c_disc")).cast("double")))
              .as("mcnemar_stat"),
            (col("b_disc") + col("c_disc") > 0 &&
              pow(greatest(abs(col("b_disc") - col("c_disc")).cast("double") - lit(1.0), lit(0.0)), 2)
                / (col("b_disc") + col("c_disc")).cast("double") > lit(3.841458820694124))
              .as("significant"))
      },
      Some(nbSqlPrefix + """,
        baseline AS (
          SELECT source AS bsrc FROM (
            SELECT source, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, source) AS rn
            FROM documents WHERE doc_id % 10 < 7 GROUP BY source)
          WHERE rn = 1),
        paired AS (
          SELECT CAST(csrc = source AS BIGINT) AS nb_ok,
            CAST(bsrc = source AS BIGINT) AS base_ok
          FROM pred CROSS JOIN baseline),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
            CAST(SUM(nb_ok) AS BIGINT) AS nb_correct,
            CAST(SUM(base_ok) AS BIGINT) AS base_correct,
            CAST(SUM(CASE WHEN nb_ok = 1 AND base_ok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_disc,
            CAST(SUM(CASE WHEN nb_ok = 0 AND base_ok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc
          FROM paired)
        SELECT n_eval, nb_correct, base_correct, b_disc, c_disc,
          CASE WHEN b_disc + c_disc = 0 THEN 0.0
            ELSE FLOOR((POWER(GREATEST(CAST(ABS(b_disc - c_disc) AS DOUBLE) - 1.0, 0.0), 2)
                        / CAST(b_disc + c_disc AS DOUBLE)) * 10000 + 0.500001) / 10000
          END AS mcnemar_stat,
          (b_disc + c_disc > 0 AND
           POWER(GREATEST(CAST(ABS(b_disc - c_disc) AS DOUBLE) - 1.0, 0.0), 2)
             / CAST(b_disc + c_disc AS DOUBLE) > 3.841458820694124) AS significant
        FROM agg"""),
      "McNemar continuity-corrected paired test: q269 naive Bayes vs the majority-prior baseline on the shared eval docs")
  )
}
