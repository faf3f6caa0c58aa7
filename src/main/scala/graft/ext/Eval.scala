package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine model-evaluation operators: train a simple model on the
  * earlier part of the stream, evaluate it on the later part — the
  * time-split discipline (no leakage, q147's audit) applied to the
  * models the engine already fits. At 100 TB both run as one keyed
  * window pass plus bounded-grid joins; nothing here scans twice.
  */
object Eval {

  /** `mn + (mx−mn)·7/10` in exact integer µs — the shared 70/30
    * time-split cutoff. Spark spells integer division `div`, DuckDB
    * `//`; both floor on the positive operands here. */
  private val sparkCut = "mn + ((mx - mn) * 7) div 10"
  private val sqlCut = "mn + ((mx - mn) * 7) // 10"

  /** (pos, phat) for every vector under q214's deterministic centroid
    * classifier: p̂ = σ(10·(cos(v, c₊) − cos(v, c₋))) with label ≥ 5 as
    * the positive class. All centroid/dot/norm accumulations are exact
    * integers on the 1e-6 component grid; the only doubles are the
    * final cosines (identical operand order both engines). Shared by
    * q214 (ECE), q391 (Brier decomposition) and q394 (Youden J) so the
    * scorer exists exactly once. */
  private def centroidScored(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val ex = Tables.embeddings(s, d)
      .select(col("vec_id"), (col("label") >= 5).as("pos"),
        posexplode(Similarity.toDouble(col("embedding"))).as(Seq("dim", "x")))
      .select(col("vec_id"), col("pos"), col("dim"),
        floor(col("x") * lit(1e6) + lit(0.5)).cast("long").as("xq"))
      .localCheckpoint() // one explode feeds centroids AND scoring
    val cent = ex.groupBy(col("dim"))
      .agg(sum(when(col("pos"), col("xq")).otherwise(0L)).as("cp"),
        sum(when(!col("pos"), col("xq")).otherwise(0L)).as("cn"))
    val cnorm = cent.agg(
      sum((col("cp").cast("decimal(38,0)") * col("cp"))).as("p2"),
      sum((col("cn").cast("decimal(38,0)") * col("cn"))).as("n2"))
    val dots = ex.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("pos"))
      .agg(Exact.m2("xq", "cp").as("dp"),
        Exact.m2("xq", "cn").as("dn"),
        Exact.m2("xq", "xq").as("v2"))
    val margin =
      col("dp").cast("double") /
        (sqrt(col("v2").cast("double")) * sqrt(col("p2").cast("double"))) -
      col("dn").cast("double") /
        (sqrt(col("v2").cast("double")) * sqrt(col("n2").cast("double")))
    dots.crossJoin(broadcast(cnorm))
      .select(col("pos"),
        (lit(1.0) / (lit(1.0) + exp(lit(-10.0) * margin))).as("phat"))
  }

  /** DuckDB twin of [[centroidScored]], ending in `scored(pos, phat)`. */
  private val sqlCentroidScored: String = """ex AS (
          SELECT vec_id, label >= 5 AS pos,
            CAST(FLOOR(CAST(x AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS xq,
            dim
          FROM (SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS x,
                  unnest(range(0, len(embedding))) AS dim
                FROM embeddings)),
        cent AS (
          SELECT dim,
            SUM(CASE WHEN pos THEN xq ELSE 0 END) AS cp,
            SUM(CASE WHEN NOT pos THEN xq ELSE 0 END) AS cn
          FROM ex GROUP BY dim),
        cnorm AS (
          SELECT SUM(CAST(cp AS HUGEINT) * cp) AS p2,
            SUM(CAST(cn AS HUGEINT) * cn) AS n2
          FROM cent),
        dots AS (
          SELECT vec_id, MAX(pos) AS pos,
            SUM(CAST(xq AS HUGEINT) * cp) AS dp,
            SUM(CAST(xq AS HUGEINT) * cn) AS dn,
            SUM(CAST(xq AS HUGEINT) * xq) AS v2
          FROM ex JOIN cent USING (dim)
          GROUP BY vec_id),
        scored AS (
          SELECT pos,
            1.0 / (1.0 + EXP(-10.0 *
              (CAST(dp AS DOUBLE) / (SQRT(CAST(v2 AS DOUBLE)) * SQRT(CAST(p2 AS DOUBLE)))
               - CAST(dn AS DOUBLE) / (SQRT(CAST(v2 AS DOUBLE)) * SQRT(CAST(n2 AS DOUBLE))))))
              AS phat
          FROM dots CROSS JOIN cnorm)"""

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q199
    // Markov next-event prediction accuracy: fit the first-order
    // transition argmax on the first 70% of time (q111's matrix),
    // predict the next event type on the last 30%, report per-context
    // accuracy — the in-engine train/eval loop for the behavioral
    // model. Pairs are strictly consecutive per user (ts, event_id
    // order); a pair belongs to train/eval by its FROM event's time.
    // The transition grid is (types × types)-bounded; the argmax
    // tie-breaks (count DESC, to_type ASC) — cross-engine exact.
    Query(
      "q199_markov_eval",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("from_type"), unix_micros(col("ts")).as("us"))
          .withColumn("to_type", lead(col("from_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .localCheckpoint() // one keyed window pass feeds cut, train, eval
        val cut = pairs.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
          .select(expr(sparkCut).as("cut_us"))
        val cutP = pairs.crossJoin(broadcast(cut))
        val pred = cutP.filter(col("us") < col("cut_us"))
          .groupBy(col("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(Window.partitionBy(col("from_type"))
            .orderBy(col("n").desc, col("to_type"))))
          .filter(col("rn") === 1)
          .select(col("from_type"), col("to_type").as("pred_type"))
        cutP.filter(col("us") >= col("cut_us"))
          .join(broadcast(pred), Seq("from_type"))
          .groupBy(col("from_type"), col("pred_type"))
          .agg(count(lit(1)).as("n_eval"),
            count(when(col("to_type") === col("pred_type"), 1)).as("n_correct"))
          .select(col("from_type"), col("pred_type"), col("n_eval"),
            col("n_correct"),
            Num.r4(col("n_correct").cast("double") / col("n_eval").cast("double"))
              .as("accuracy"))
          .orderBy(col("from_type"))
      },
      Some(s"""
        WITH pairs AS (
          SELECT user_id, event_type AS from_type, epoch_us(ts) AS us,
            LEAD(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
          FROM events QUALIFY to_type IS NOT NULL),
        cut AS (SELECT $sqlCut AS cut_us
                FROM (SELECT MIN(us) AS mn, MAX(us) AS mx FROM pairs)),
        pred AS (
          SELECT from_type, to_type AS pred_type FROM (
            SELECT from_type, to_type,
              ROW_NUMBER() OVER (PARTITION BY from_type
                ORDER BY COUNT(*) DESC, to_type) AS rn
            FROM pairs CROSS JOIN cut WHERE us < cut_us
            GROUP BY from_type, to_type) WHERE rn = 1)
        SELECT from_type, pred_type,
          CAST(COUNT(*) AS BIGINT) AS n_eval,
          CAST(COUNT(*) FILTER (WHERE to_type = pred_type) AS BIGINT)
            AS n_correct,
          FLOOR((CAST(COUNT(*) FILTER (WHERE to_type = pred_type) AS DOUBLE)
                 / COUNT(*)) * 10000 + 0.500001) / 10000 AS accuracy
        FROM pairs CROSS JOIN cut JOIN pred USING (from_type)
        WHERE us >= cut_us
        GROUP BY from_type, pred_type ORDER BY from_type"""),
      "Markov next-event argmax trained on the first 70% of time, per-context accuracy on the last 30% (in-engine train/eval)"),

    // ---------------------------------------------------------------- q201
    // Split-conformal prediction intervals for the per-key persistence
    // forecast (next = current): calibration = absolute one-step moves
    // before the 70% cutoff, q̂ = the ⌈0.9·(n+1)⌉-th smallest
    // calibration move (the finite-sample conformal quantile, Vovk et
    // al.; Lei et al. 2018), coverage = share of post-cutoff moves
    // within ±q̂. Distribution-free calibration for ANY point
    // forecaster — persistence is the standard baseline. Everything is
    // integer micro-units; the rank selection is one key-partitioned
    // window; keys need ≥10 calibration and ≥5 eval moves.
    Query(
      "q201_conformal_persistence",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val moves = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            unix_micros(col("ts")).as("us"),
            floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("vq"))
          .withColumn("dq", abs(col("vq") - lag(col("vq"), 1).over(w)))
          .filter(col("dq").isNotNull)
          .localCheckpoint() // one keyed pass feeds cut, calibration, eval
        val cut = moves.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
          .select(expr(sparkCut).as("cut_us"))
        val cutM = moves.crossJoin(broadcast(cut))
        val cal = cutM.filter(col("us") < col("cut_us"))
        val nCal = cal.groupBy(col("user_id")).agg(count(lit(1)).as("n_cal"))
          .filter(col("n_cal") >= 10)
        // conformal rank k = ceil(0.9 (n+1)) — integer arithmetic both
        // engines: k = (9*(n+1) + 9) div 10
        val qhat = cal.join(nCal, Seq("user_id"))
          .withColumn("rk", row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("dq"), col("us"), col("event_id"))))
          .filter(col("rk") === (expr("(9 * (n_cal + 1) + 9) div 10")))
          .select(col("user_id"), col("n_cal"), col("dq").as("qq"))
        cutM.filter(col("us") >= col("cut_us"))
          .join(qhat, Seq("user_id"))
          .groupBy(col("user_id"), col("n_cal"), col("qq"))
          .agg(count(lit(1)).as("n_eval"),
            count(when(col("dq") <= col("qq"), 1)).as("n_in"))
          .filter(col("n_eval") >= 5)
          .select(col("user_id"), col("n_cal"), col("n_eval"),
            (col("qq").cast("double") / lit(1e6)).as("qhat"),
            Num.r4(col("n_in").cast("double") / col("n_eval").cast("double"))
              .as("coverage"))
          .orderBy(col("user_id"))
      },
      Some(s"""
        WITH moves AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
            ABS(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)
                - LAG(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT), 1)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS dq
          FROM events QUALIFY dq IS NOT NULL),
        cut AS (SELECT $sqlCut AS cut_us
                FROM (SELECT MIN(us) AS mn, MAX(us) AS mx FROM moves)),
        cal AS (SELECT * FROM moves CROSS JOIN cut WHERE us < cut_us),
        nc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_cal
               FROM cal GROUP BY user_id HAVING COUNT(*) >= 10),
        qh AS (
          SELECT user_id, n_cal, dq AS qq FROM (
            SELECT c.user_id, n.n_cal, c.dq,
              ROW_NUMBER() OVER (PARTITION BY c.user_id
                ORDER BY c.dq, c.us, c.event_id) AS rk
            FROM cal c JOIN nc n USING (user_id))
          WHERE rk = (9 * (n_cal + 1) + 9) // 10)
        SELECT m.user_id, q.n_cal, CAST(COUNT(*) AS BIGINT) AS n_eval,
          CAST(q.qq AS DOUBLE) / 1e6 AS qhat,
          FLOOR((CAST(COUNT(*) FILTER (WHERE m.dq <= q.qq) AS DOUBLE)
                 / COUNT(*)) * 10000 + 0.500001) / 10000 AS coverage
        FROM moves m CROSS JOIN cut
        JOIN qh q USING (user_id)
        WHERE m.us >= cut_us
        GROUP BY m.user_id, q.n_cal, q.qq
        HAVING COUNT(*) >= 5
        ORDER BY m.user_id"""),
      "split-conformal +-qhat intervals for the per-key persistence forecast: finite-sample 90% rank on calibration moves, coverage on the 30% eval tail"),

    // ---------------------------------------------------------------- q213
    // Cohen's κ between the recorded `lang` label and the q44/q125
    // marker-word guess — the chance-corrected single-number companion
    // to q125's confusion matrix (raw agreement over-credits whatever
    // the majority class is; κ subtracts the agreement two independent
    // raters would reach by chance). All integer counts off the
    // bounded confusion grid; po, pe and κ are identical IEEE ratios.
    Query(
      "q213_cohens_kappa",
      (s, d) => {
        val toks = split(col("text"), " ")
        val score = (lang: String) => size(filter(toks,
          t => graft.ops.Misc.Markers(lang).map(m => t === m).reduce(_ || _)))
        val en = score("en"); val de = score("de"); val es = score("es")
        val conf = Tables.documents(s, d)
          .select(col("lang").as("labeled"),
            when(en >= de && en >= es && en > 0, "en")
              .when(de >= es && de > 0, "de")
              .when(es > 0, "es")
              .otherwise("unknown").as("guessed"))
          .groupBy(col("labeled"), col("guessed"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // bounded |langs|² grid
        val rows = conf.groupBy(col("labeled")).agg(sum(col("n")).as("rl"))
        val cols = conf.groupBy(col("guessed")).agg(sum(col("n")).as("cl"))
        val agree = conf.agg(sum(col("n")).as("nn"),
          sum(when(col("labeled") === col("guessed"), col("n")).otherwise(0L))
            .as("diag"))
        val pe = rows.join(cols, col("labeled") === col("guessed"))
          .agg(coalesce(sum(col("rl") * col("cl")), lit(0L)).as("rc"))
        val po = col("diag").cast("double") / col("nn").cast("double")
        val peC = col("rc").cast("double") /
          (col("nn").cast("double") * col("nn").cast("double"))
        agree.crossJoin(broadcast(pe))
          .select(col("nn").as("n_docs"),
            Num.r6(po).as("p_observed"),
            Num.r6(peC).as("p_chance"),
            Num.r6((po - peC) / (lit(1.0) - peC)).as("kappa"))
      },
      Some {
        def hits(lang: String) = {
          val list = graft.ops.Misc.Markers(lang).map(m => s"'$m'").mkString(", ")
          s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ($list))) AS BIGINT)"
        }
        s"""
        WITH t AS (
          SELECT lang AS labeled,
            ${hits("en")} AS en_hits, ${hits("de")} AS de_hits,
            ${hits("es")} AS es_hits
          FROM documents),
        g AS (
          SELECT labeled,
            CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
                 WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                 WHEN es_hits > 0 THEN 'es'
                 ELSE 'unknown' END AS guessed
          FROM t),
        conf AS (SELECT labeled, guessed, CAST(COUNT(*) AS BIGINT) AS n
                 FROM g GROUP BY labeled, guessed),
        r AS (SELECT labeled, CAST(SUM(n) AS BIGINT) AS rl
              FROM conf GROUP BY labeled),
        c AS (SELECT guessed, CAST(SUM(n) AS BIGINT) AS cl
              FROM conf GROUP BY guessed),
        agree AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nn,
            CAST(SUM(CASE WHEN labeled = guessed THEN n ELSE 0 END) AS BIGINT)
              AS diag
          FROM conf),
        pe AS (
          SELECT CAST(COALESCE(SUM(rl * cl), 0) AS BIGINT) AS rc
          FROM r JOIN c ON r.labeled = c.guessed)
        SELECT nn AS n_docs,
          FLOOR((CAST(diag AS DOUBLE) / nn) * 1000000 + 0.500001) / 1000000
            AS p_observed,
          FLOOR((CAST(rc AS DOUBLE) / (CAST(nn AS DOUBLE) * nn))
                * 1000000 + 0.500001) / 1000000 AS p_chance,
          FLOOR(((CAST(diag AS DOUBLE) / nn
                  - CAST(rc AS DOUBLE) / (CAST(nn AS DOUBLE) * nn))
                 / (1.0 - CAST(rc AS DOUBLE) / (CAST(nn AS DOUBLE) * nn)))
                * 1000000 + 0.500001) / 1000000 AS kappa
        FROM agree CROSS JOIN pe"""
      },
      "Cohen's kappa between recorded lang and the marker-word guess: chance-corrected agreement off the bounded confusion grid"),

    // ---------------------------------------------------------------- q214
    // Expected calibration error of a deterministic centroid
    // classifier over the embeddings: score = cos-to-positive-centroid
    // minus cos-to-negative-centroid (labels ≥ 5 are positive),
    // p̂ = σ(10·margin), 10 equal-width bins, ECE = Σ (n_b/N)·|acc−conf|
    // (Guo et al. 2017) — the audit run before trusting a model's
    // probabilities. Centroid component sums and all dot/norm
    // accumulations are exact integers; p̂ is micro-quantized before
    // the per-bin sum so bin confidence is association-proof.
    Query(
      "q214_ece_calibration",
      (s, d) => {
        val binned = centroidScored(s, d)
          .select(col("pos"),
            least(lit(9), floor(col("phat") * lit(10.0)).cast("int")).as("bin"),
            floor(col("phat") * lit(1e6) + lit(0.5)).cast("long").as("pq"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), count(when(col("pos"), 1)).as("k"),
            sum(col("pq")).as("sp"))
          .localCheckpoint() // ≤10 bounded rows
        val tot = binned.agg(sum(col("n")).as("nt"),
          sum(abs(col("k") * lit(1000000L) - col("sp")).cast("decimal(38,0)"))
            .as("eceq"))
        binned.crossJoin(broadcast(tot))
          .select(col("bin"), col("n").as("n_points"),
            Num.r4(col("sp").cast("double") / col("n") / lit(1e6)).as("confidence"),
            Num.r4(col("k").cast("double") / col("n").cast("double")).as("accuracy"),
            Num.r6(col("eceq").cast("double") /
              (col("nt").cast("double") * lit(1e6))).as("ece"))
          .orderBy(col("bin"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        binned AS (
          SELECT LEAST(9, CAST(FLOOR(phat * 10.0) AS INT)) AS bin,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS k,
            CAST(SUM(CAST(FLOOR(phat * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sp
          FROM scored GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt,
            SUM(ABS(k * 1000000 - sp)) AS eceq
          FROM binned)
        SELECT bin, n AS n_points,
          FLOOR((CAST(sp AS DOUBLE) / n / 1e6) * 10000 + 0.500001) / 10000
            AS confidence,
          FLOOR((CAST(k AS DOUBLE) / n) * 10000 + 0.500001) / 10000 AS accuracy,
          FLOOR((CAST(eceq AS DOUBLE) / (CAST(nt AS DOUBLE) * 1e6))
                * 1000000 + 0.500001) / 1000000 AS ece
        FROM binned CROSS JOIN tot ORDER BY bin"""),
      "expected calibration error of a deterministic centroid classifier: 10-bin reliability table + ECE, exact integer machinery"),

    // ---------------------------------------------------------------- q216
    // Ranking-quality audit of the q109 BM25 ranker: nDCG@10, MRR and
    // P@10 against graded pseudo-relevance rel(doc) = number of
    // distinct probe terms the document contains (0..3) — the
    // standard offline retrieval eval (Järvelin & Kekäläinen 2002)
    // run against judgments the corpus itself defines, completing the
    // retrieval family (q109 scores, q120 fuses, q215 compares
    // rankers, q216 grades). Exactness: gains (2^rel − 1) are
    // integers via shiftleft; the position discounts 1/log2(pos+1)
    // are PRECOMPUTED integer micro-literals (no runtime
    // transcendental), so DCG and IDCG are exact int64 sums and the
    // one final division is bit-equal across engines. 100 TB shape:
    // BM25 is the q109 plan (broadcast idf, one token pass); both
    // top-10s are TakeOrdered (no global window on unbounded data);
    // everything after is 10-row driver-free algebra.
    Query(
      "q216_ndcg_bm25",
      (s, d) => {
        import graft.ext.Retrieval.{bm25Micro, dcgWeights}
        val rel = bm25Micro(s, d) // n_terms = distinct probe terms present
          .select(col("doc_id"), col("n_terms").cast("int").as("rel"))
          .localCheckpoint() // feeds ranking join AND ideal top-10
        val w10 = Window.orderBy(col("bm25_micro").desc, col("doc_id"))
        val ranked = bm25Micro(s, d)
          .orderBy(col("bm25_micro").desc, col("doc_id")).limit(10)
          .localCheckpoint() // bounded: the window below is 10 rows
          .withColumn("pos", row_number().over(w10))
          .join(rel, Seq("doc_id"))
        val wts = dcgWeights(s) // (pos, wq) 10-row literal
        val dcg = ranked.join(broadcast(wts), Seq("pos"))
          .agg(count(lit(1)).as("k_used"),
            sum(expr("(shiftleft(CAST(1 AS BIGINT), rel) - 1) * wq"))
              .as("dcg_q"),
            sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("hits"),
            min(when(col("rel") >= 2, col("pos"))).as("first_hi"))
        val wIdeal = Window.orderBy(col("rel").desc, col("doc_id"))
        val idcg = rel.filter(col("rel") >= 1)
          .orderBy(col("rel").desc, col("doc_id")).limit(10)
          .localCheckpoint() // bounded: the window below is 10 rows
          .withColumn("pos", row_number().over(wIdeal))
          .join(broadcast(wts), Seq("pos"))
          .agg(sum(expr("(shiftleft(CAST(1 AS BIGINT), rel) - 1) * wq"))
            .as("idcg_q"))
        dcg.crossJoin(broadcast(idcg))
          .select(col("k_used"),
            Num.r6(col("dcg_q").cast("double") / lit(1e6)).as("dcg"),
            Num.r6(col("idcg_q").cast("double") / lit(1e6)).as("idcg"),
            when(col("idcg_q") > 0,
              Num.r6(col("dcg_q").cast("double") / col("idcg_q").cast("double")))
              .as("ndcg"),
            Num.r6(coalesce(lit(1.0) / col("first_hi").cast("double"), lit(0.0)))
              .as("rr"),
            Num.r6(col("hits").cast("double") / col("k_used").cast("double"))
              .as("p_at_k"))
      },
      Some(s"""
        WITH ${Retrieval.bm25Ctes},
        rel AS MATERIALIZED (
          SELECT doc_id, CAST(n_terms AS INT) AS rel FROM bm),
        w AS (SELECT * FROM (VALUES ${Retrieval.sqlDcgWeights}) AS w(pos, wq)),
        ranked AS (
          SELECT doc_id, pos FROM (
            SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS pos
            FROM bm) WHERE pos <= 10),
        dcg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
            CAST(SUM(((1::BIGINT << rel) - 1) * wq) AS BIGINT) AS dcg_q,
            CAST(COUNT(*) FILTER (WHERE rel >= 1) AS BIGINT) AS hits,
            MIN(CASE WHEN rel >= 2 THEN pos END) AS first_hi
          FROM ranked JOIN rel USING (doc_id) JOIN w USING (pos)),
        ideal AS (
          SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS pos
          FROM rel WHERE rel >= 1),
        idcg AS (
          SELECT CAST(SUM(((1::BIGINT << rel) - 1) * wq) AS BIGINT) AS idcg_q
          FROM ideal JOIN w USING (pos) WHERE pos <= 10)
        SELECT k_used,
          FLOOR((CAST(dcg_q AS DOUBLE) / 1e6) * 1000000 + 0.500001) / 1000000
            AS dcg,
          FLOOR((CAST(idcg_q AS DOUBLE) / 1e6) * 1000000 + 0.500001) / 1000000
            AS idcg,
          CASE WHEN idcg_q > 0 THEN
            FLOOR((CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE))
                  * 1000000 + 0.500001) / 1000000 END AS ndcg,
          FLOOR(COALESCE(1.0 / CAST(first_hi AS DOUBLE), 0.0)
                * 1000000 + 0.500001) / 1000000 AS rr,
          FLOOR((CAST(hits AS DOUBLE) / CAST(k_used AS DOUBLE))
                * 1000000 + 0.500001) / 1000000 AS p_at_k
        FROM dcg CROSS JOIN idcg"""),
      "nDCG@10 / MRR / P@10 of the BM25 ranking vs term-count pseudo-relevance: integer gains + precomputed micro discount literals, exact int64 DCG sums"),

    // ---------------------------------------------------------------- q259
    // ROC operating points for the lexical-diversity score as an
    // is-English classifier — the threshold-choice table that q214's
    // ECE and q159's AUC summarize away: per cut-off, the exact
    // TP/FP/FN/TN a filter deployed AT that threshold would commit
    // to, plus Youden's J for the optimal-cut argmax. Scores are
    // integer micro ratios (distinct·1e6 div total — pure int64), the
    // threshold spine is 21 fixed micro literals, and every
    // confusion-cell count folds from one (score × label) grid — the
    // q159 no-per-threshold-rescan shape.
    Query(
      "q259_roc_points",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), (col("lang") === "en").as("pos"),
            explode(split(col("text"), " ")).as("t"))
          .groupBy(col("doc_id"), col("pos"))
          .agg((countDistinct(col("t")) * lit(1000000L)).as("dn"),
            count(lit(1)).as("tt"))
          .select(col("pos"), (col("dn") / col("tt")).cast("long").as("sc"))
        val grid = scored.groupBy(col("sc"), col("pos"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded (score × label) grid, one scan
        val tot = grid.agg(
          sum(when(col("pos"), col("c")).otherwise(0L)).as("p"),
          sum(when(!col("pos"), col("c")).otherwise(0L)).as("n"))
        val spine = s.range(0, 21)
          .select((col("id") * 50000L).as("threshold_micro"))
        broadcast(spine).join(grid, col("sc") >= col("threshold_micro"), "left")
          .groupBy(col("threshold_micro"))
          .agg(sum(when(col("pos"), col("c")).otherwise(0L)).as("tp"),
            sum(when(!col("pos"), col("c")).otherwise(0L)).as("fp"))
          .crossJoin(broadcast(tot))
          .select(col("threshold_micro"),
            coalesce(col("tp"), lit(0L)).as("tp"),
            coalesce(col("fp"), lit(0L)).as("fp"),
            (col("p") - coalesce(col("tp"), lit(0L))).as("fn"),
            (col("n") - coalesce(col("fp"), lit(0L))).as("tn"),
            Num.r6(coalesce(col("tp"), lit(0L)).cast("double") / col("p"))
              .as("tpr"),
            Num.r6(coalesce(col("fp"), lit(0L)).cast("double") / col("n"))
              .as("fpr"),
            Num.r6(coalesce(col("tp"), lit(0L)).cast("double") / col("p")
              - coalesce(col("fp"), lit(0L)).cast("double") / col("n"))
              .as("youden_j"))
          .orderBy(col("threshold_micro"))
      },
      Some(s"""
        WITH scored AS (
          SELECT pos, CAST(dn // tt AS BIGINT) AS sc FROM (
            SELECT doc_id, lang = 'en' AS pos,
              COUNT(DISTINCT t) * 1000000 AS dn, COUNT(*) AS tt
            FROM (SELECT doc_id, lang,
                    unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY doc_id, lang = 'en')),
        grid AS (
          SELECT sc, pos, CAST(COUNT(*) AS BIGINT) AS c
          FROM scored GROUP BY sc, pos),
        tot AS (
          SELECT
            CAST(SUM(CASE WHEN pos THEN c ELSE 0 END) AS BIGINT) AS p,
            CAST(SUM(CASE WHEN NOT pos THEN c ELSE 0 END) AS BIGINT) AS n
          FROM grid),
        spine AS (SELECT unnest(range(0, 21)) * 50000 AS threshold_micro),
        cells AS (
          SELECT s.threshold_micro,
            CAST(SUM(CASE WHEN g.pos THEN g.c ELSE 0 END) AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN NOT g.pos THEN g.c ELSE 0 END) AS BIGINT)
              AS fp
          FROM spine s LEFT JOIN grid g ON g.sc >= s.threshold_micro
          GROUP BY s.threshold_micro)
        SELECT threshold_micro,
          CAST(COALESCE(tp, 0) AS BIGINT) AS tp,
          CAST(COALESCE(fp, 0) AS BIGINT) AS fp,
          CAST(p - COALESCE(tp, 0) AS BIGINT) AS fn,
          CAST(n - COALESCE(fp, 0) AS BIGINT) AS tn,
          ${Num.sql("CAST(COALESCE(tp, 0) AS DOUBLE) / p", 6)} AS tpr,
          ${Num.sql("CAST(COALESCE(fp, 0) AS DOUBLE) / n", 6)} AS fpr,
          ${Num.sql(
            """CAST(COALESCE(tp, 0) AS DOUBLE) / p
               - CAST(COALESCE(fp, 0) AS DOUBLE) / n""", 6)} AS youden_j
        FROM cells CROSS JOIN tot
        ORDER BY threshold_micro"""),
      "ROC operating points for the lexical-diversity is-English classifier: exact confusion cells at 21 thresholds from one (score x label) grid, Youden's J per cut"),

    // ---------------------------------------------------------------- q365
    // Pinball (quantile) loss of the persistence forecast: predict
    // tomorrow's daily median and P90 of `value` by today's, score with
    // the τ-quantile check loss — the metric a quantile forecaster
    // (q161's bands, q249's Holt-Winters) is graded by. EVERYTHING is
    // exact integers: values are micro-quantized, the daily order
    // statistics are rank-selected (lower median = rank (n+1) div 2,
    // P90 = rank ceil(0.9n)), and 2·L(τ=.5) = |Δ| / 10·L(τ=.9) =
    // 9Δ⁺ + Δ⁻ are integer identities, so the cross-day means divide
    // exact int64 sums. Daily ranks partition by day (no global sort);
    // the day table is calendar-bounded.
    Query(
      "q365_pinball",
      (s, d) => {
        val vals = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("cast(floor(value * 1e6 + 0.5) as bigint)").as("vq"))
        val wDay = Window.partitionBy(col("day")).orderBy(col("vq"))
        val ranked = vals
          .withColumn("rn", row_number().over(wDay).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("day"))))
        val daily = ranked.groupBy(col("day"))
          .agg(
            max(when(col("rn") === expr("(n + 1) div 2"), col("vq"))).as("med"),
            max(when(col("rn") === expr("(9 * n + 9) div 10"), col("vq"))).as("p90"))
        val wOrd = Window.orderBy(col("day"))
        val scored = daily
          .withColumn("pmed", lag(col("med"), 1).over(wOrd))
          .withColumn("pp90", lag(col("p90"), 1).over(wOrd))
          .filter(col("pmed").isNotNull)
          .select(
            abs(col("med") - col("pmed")).as("l50x2"),
            when(col("p90") >= col("pp90"), (col("p90") - col("pp90")) * 9)
              .otherwise(col("pp90") - col("p90")).as("l90x10"))
        scored.agg(count(lit(1)).as("n_days_scored"),
            sum(col("l50x2")).as("s50"), sum(col("l90x10")).as("s90"))
          .select(col("n_days_scored"),
            Num.r6(col("s50").cast("double") /
              (lit(2.0) * col("n_days_scored").cast("double")) / lit(1e6))
              .as("pinball_p50"),
            Num.r6(col("s90").cast("double") /
              (lit(10.0) * col("n_days_scored").cast("double")) / lit(1e6))
              .as("pinball_p90"))
      },
      Some("""
        WITH vals AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vq
          FROM events),
        ranked AS (
          SELECT day, vq,
            ROW_NUMBER() OVER (PARTITION BY day ORDER BY vq) AS rn,
            CAST(COUNT(*) OVER (PARTITION BY day) AS BIGINT) AS n
          FROM vals),
        daily AS (
          SELECT day,
            MAX(CASE WHEN rn = (n + 1) // 2 THEN vq END) AS med,
            MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN vq END) AS p90
          FROM ranked GROUP BY day),
        scored AS (
          SELECT ABS(med - pmed) AS l50x2,
            CASE WHEN p90 >= pp90 THEN (p90 - pp90) * 9
                 ELSE pp90 - p90 END AS l90x10
          FROM (
            SELECT day, med, p90,
              LAG(med) OVER (ORDER BY day) AS pmed,
              LAG(p90) OVER (ORDER BY day) AS pp90
            FROM daily)
          WHERE pmed IS NOT NULL)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
          FLOOR((CAST(SUM(l50x2) AS DOUBLE) / (2.0 * COUNT(*)) / 1e6)
                * 1000000 + 0.500001) / 1000000 AS pinball_p50,
          FLOOR((CAST(SUM(l90x10) AS DOUBLE) / (10.0 * COUNT(*)) / 1e6)
                * 1000000 + 0.500001) / 1000000 AS pinball_p90
        FROM scored"""),
      "Pinball loss of the persistence median/P90 forecast: rank-selected exact daily order stats, integer check-loss identities 2L=|d| and 10L=9d+/d-"),

    // ---------------------------------------------------------------- q371
    // MASE-style scaled accuracy: persistence (lag-1) vs seasonal-naive
    // (lag-7) forecasts of daily volume on their common support
    // (t ≥ 8th day) — the scale-free forecast scorecard (Hyndman &
    // Koehler) that q220's backtest and q365's pinball report in raw
    // units. Both MAEs are exact integer |Δ| sums over the SAME days,
    // so the ratio (< 1 ⇒ yesterday beats last-week) is bit-stable.
    Query(
      "q371_seasonal_mase",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("dy"))
          .agg(count(lit(1)).as("y"))
        val w = Window.orderBy(col("dy"))
        val scored = daily
          .withColumn("p1", lag(col("y"), 1).over(w))
          .withColumn("p7", lag(col("y"), 7).over(w))
          .filter(col("p7").isNotNull)
        scored.agg(count(lit(1)).as("n_scored"),
            sum(abs(col("y") - col("p1"))).as("s1"),
            sum(abs(col("y") - col("p7"))).as("s7"))
          .select(col("n_scored"),
            Num.r6(col("s1").cast("double") / col("n_scored").cast("double"))
              .as("mae_persistence"),
            Num.r6(col("s7").cast("double") / col("n_scored").cast("double"))
              .as("mae_seasonal"),
            when(col("s7") > 0,
              Num.r4(col("s1").cast("double") / col("s7").cast("double")))
              .as("mase"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS dy,
            CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        scored AS (
          SELECT y, p1, p7 FROM (
            SELECT y, LAG(y, 1) OVER (ORDER BY dy) AS p1,
              LAG(y, 7) OVER (ORDER BY dy) AS p7
            FROM daily)
          WHERE p7 IS NOT NULL)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
          FLOOR((CAST(SUM(ABS(y - p1)) AS DOUBLE) / COUNT(*)) * 1000000
                + 0.500001) / 1000000 AS mae_persistence,
          FLOOR((CAST(SUM(ABS(y - p7)) AS DOUBLE) / COUNT(*)) * 1000000
                + 0.500001) / 1000000 AS mae_seasonal,
          CASE WHEN SUM(ABS(y - p7)) > 0 THEN
            FLOOR((CAST(SUM(ABS(y - p1)) AS DOUBLE) / SUM(ABS(y - p7)))
                  * 10000 + 0.500001) / 10000 END AS mase
        FROM scored"""),
      "Scaled forecast accuracy on daily volume: persistence vs seasonal-naive MAE (exact integer |delta| sums on common support) and their MASE ratio"),

    // ---------------------------------------------------------------- q391
    // Murphy (1973) decomposition of the Brier score for q214's
    // centroid classifier: Brier = REL − RES + UNC over the same 10
    // confidence bins — the proper-scoring-rule companion to ECE
    // (which only sees REL). REL penalizes bins whose confidence
    // p̄_k strays from their hit rate ō_k; RES rewards bins that
    // separate outcomes from the base rate; UNC = ō(1−ō) is the
    // irreducible outcome variance. p̂ is micro-quantized per point
    // (so the raw Brier sum is an exact integer sum of (pq − o·1e6)²
    // on DECIMAL), and each bin's REL/RES contribution is quantized
    // to the 1e-12 grid BEFORE the ≤10-term cross-bin sum. The raw
    // Brier uses binned-constant p̂ only inside REL/RES, so the
    // identity holds up to binning — both sides of it are printed.
    Query(
      "q391_brier_decomposition",
      (s, d) => {
        val binned = centroidScored(s, d)
          .select(col("pos"),
            least(lit(9), floor(col("phat") * lit(10.0)).cast("int")).as("bin"),
            floor(col("phat") * lit(1e6) + lit(0.5)).cast("long").as("pq"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), count(when(col("pos"), 1)).as("k"),
            sum(col("pq")).as("sp"),
            sum((col("pq") - when(col("pos"), 1000000L).otherwise(0L))
              .cast("decimal(38,0)")
              * (col("pq") - when(col("pos"), 1000000L).otherwise(0L)))
              .as("sq2"))
          .localCheckpoint() // ≤10 bounded rows
        val tot = binned.agg(sum(col("n")).as("nt"), sum(col("k")).as("kt"),
          sum(col("sq2")).as("sq2t"))
        val terms = binned.crossJoin(broadcast(tot))
          .select(col("n"), col("k"), col("nt"), col("kt"), col("sq2t"),
            // bin REL contribution n_k(p̄_k−ō_k)²/nt = dk²/(n_k·nt·1e12)
            floor((col("sp") - col("k") * lit(1000000L)).cast("double")
              * (col("sp") - col("k") * lit(1000000L)).cast("double")
              / (col("n").cast("double") * col("nt").cast("double") * lit(1e12))
              * lit(1e12) + lit(0.5)).cast("long").as("relq"),
            // bin RES contribution n_k(ō_k−ō)²/nt = dk2²/(n_k·nt³)
            floor((col("k") * col("nt") - col("kt") * col("n")).cast("double")
              * (col("k") * col("nt") - col("kt") * col("n")).cast("double")
              / (col("n").cast("double") * col("nt").cast("double")
                * col("nt").cast("double") * col("nt").cast("double"))
              * lit(1e12) + lit(0.5)).cast("long").as("resq"))
        terms.groupBy(col("nt"), col("kt"), col("sq2t"))
          .agg(sum(col("relq")).as("srel"), sum(col("resq")).as("sres"))
          .select(col("nt").as("n_points"),
            Num.r6(col("sq2t").cast("double")
              / (col("nt").cast("double") * lit(1e12))).as("brier"),
            Num.r6(col("srel").cast("double") / lit(1e12)).as("reliability"),
            Num.r6(col("sres").cast("double") / lit(1e12)).as("resolution"),
            Num.r6(col("kt").cast("double") * (col("nt") - col("kt")).cast("double")
              / (col("nt").cast("double") * col("nt").cast("double")))
              .as("uncertainty"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        binned AS (
          SELECT LEAST(9, CAST(FLOOR(phat * 10.0) AS INT)) AS bin,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS k,
            CAST(SUM(CAST(FLOOR(phat * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sp,
            SUM(CAST(CAST(FLOOR(phat * 1e6 + 0.5) AS BIGINT)
                - CASE WHEN pos THEN 1000000 ELSE 0 END AS HUGEINT)
              * (CAST(FLOOR(phat * 1e6 + 0.5) AS BIGINT)
                - CASE WHEN pos THEN 1000000 ELSE 0 END)) AS sq2
          FROM scored GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(k) AS BIGINT) AS kt,
            SUM(sq2) AS sq2t
          FROM binned),
        terms AS (
          SELECT n, k, nt, kt, sq2t,
            CAST(FLOOR(CAST(sp - k * 1000000 AS DOUBLE)
              * CAST(sp - k * 1000000 AS DOUBLE)
              / (CAST(n AS DOUBLE) * nt * 1e12) * 1e12 + 0.5) AS BIGINT)
              AS relq,
            CAST(FLOOR(CAST(k * nt - kt * n AS DOUBLE)
              * CAST(k * nt - kt * n AS DOUBLE)
              / (CAST(n AS DOUBLE) * nt * nt * CAST(nt AS DOUBLE)) * 1e12 + 0.5)
              AS BIGINT) AS resq
          FROM binned CROSS JOIN tot)
        SELECT nt AS n_points,
          FLOOR((CAST(sq2t AS DOUBLE) / (CAST(nt AS DOUBLE) * 1e12))
                * 1000000 + 0.500001) / 1000000 AS brier,
          FLOOR((CAST(SUM(relq) AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS reliability,
          FLOOR((CAST(SUM(resq) AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS resolution,
          FLOOR((CAST(kt AS DOUBLE) * (nt - kt) / (CAST(nt AS DOUBLE) * nt))
                * 1000000 + 0.500001) / 1000000 AS uncertainty
        FROM terms GROUP BY nt, kt, sq2t"""),
      "Murphy decomposition of the centroid classifier's Brier score: exact integer binned moments, per-bin REL/RES quantized before the 10-term sum"),

    // ---------------------------------------------------------------- q394
    // Youden's J operating point of the same classifier: sweep
    // thresholds on the 1e-3 p̂ grid and maximize J = TPR − FPR —
    // the standard threshold-selection readout next to the AUC
    // (q159) and the reliability diagram (q214). The argmax is
    // decided on the EXACT integer cross-product J·P·N =
    // cp·N − cn·P (no double compare), ties break toward the
    // smallest threshold. The sweep is a cumulative window over the
    // ≤1001-row threshold histogram, never over raw points.
    Query(
      "q394_youden_j",
      (s, d) => {
        val hist = centroidScored(s, d)
          .select(col("pos"),
            least(lit(1000), floor(col("phat") * lit(1000.0)).cast("long"))
              .as("g"))
          .groupBy(col("g"))
          .agg(count(when(col("pos"), 1)).as("p"),
            count(when(!col("pos"), 1)).as("q"))
          .localCheckpoint() // ≤1001 bounded rows
        val tot = hist.agg(sum(col("p")).as("pp"), sum(col("q")).as("qq"))
        val wdesc = Window.orderBy(col("g").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        hist
          .withColumn("cp", sum(col("p")).over(wdesc))
          .withColumn("cn", sum(col("q")).over(wdesc))
          .crossJoin(broadcast(tot))
          .withColumn("jx", col("cp") * col("qq") - col("cn") * col("pp"))
          .orderBy(col("jx").desc, col("g"))
          .limit(1)
          .select(Num.r4(col("g").cast("double") / lit(1000.0)).as("threshold"),
            Num.r4(col("cp").cast("double") / col("pp").cast("double")).as("tpr"),
            Num.r4(col("cn").cast("double") / col("qq").cast("double")).as("fpr"),
            Num.r4(col("cp").cast("double") / col("pp").cast("double")
              - col("cn").cast("double") / col("qq").cast("double"))
              .as("youden_j"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        hist AS (
          SELECT LEAST(1000, CAST(FLOOR(phat * 1000.0) AS BIGINT)) AS g,
            CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p,
            CAST(COUNT(*) FILTER (WHERE NOT pos) AS BIGINT) AS q
          FROM scored GROUP BY 1),
        tot AS (SELECT CAST(SUM(p) AS BIGINT) AS pp,
                  CAST(SUM(q) AS BIGINT) AS qq FROM hist),
        sweep AS (
          SELECT g,
            SUM(p) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
            SUM(q) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
          FROM hist)
        SELECT
          FLOOR((CAST(g AS DOUBLE) / 1000.0) * 10000 + 0.500001) / 10000
            AS threshold,
          FLOOR((CAST(cp AS DOUBLE) / pp) * 10000 + 0.500001) / 10000 AS tpr,
          FLOOR((CAST(cn AS DOUBLE) / qq) * 10000 + 0.500001) / 10000 AS fpr,
          FLOOR((CAST(cp AS DOUBLE) / pp - CAST(cn AS DOUBLE) / qq)
                * 10000 + 0.500001) / 10000 AS youden_j
        FROM sweep CROSS JOIN tot
        ORDER BY cp * qq - cn * pp DESC, g LIMIT 1"""),
      "Youden's J optimal threshold of the centroid classifier: exact integer argmax of J*P*N over the 1e-3 threshold grid"),

    // ---------------------------------------------------------------- q424
    // Gains/lift table of the centroid classifier: score-ranked
    // deciles (grid-grain — each 1e-3 score bucket is assigned whole
    // to the decile its cumulative END position lands in, documented)
    // with per-decile capture of positives and cumulative lift vs
    // the base rate. The targeting readout next to AUC (q159) and
    // Youden (q394): "call the top 20%, get what share of buyers?".
    // All counts exact integers on the ≤1001-row histogram.
    Query(
      "q424_gains_table",
      (s, d) => {
        val hist = centroidScored(s, d)
          .select(col("pos"),
            least(lit(1000), floor(col("phat") * lit(1000.0)).cast("long"))
              .as("g"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("c"), count(when(col("pos"), 1)).as("p"))
          .localCheckpoint() // ≤1001 bounded rows
        val wdesc = Window.orderBy(col("g").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cc", sum(col("c")).over(wdesc))
          .withColumn("cp", sum(col("p")).over(wdesc))
        val tot = hist.agg(sum(col("c")).as("n"), sum(col("p")).as("np"))
        cum.crossJoin(broadcast(tot))
          .withColumn("dec", expr("((cc - 1) * 10) div n + 1"))
          .groupBy(col("dec").as("decile"))
          .agg(sum(col("c")).as("n_cases"), sum(col("p")).as("n_pos"),
            max(col("cc")).as("cum_cases"), max(col("cp")).as("cum_pos"),
            max(col("n")).as("n"), max(col("np")).as("np"))
          .select(col("decile"), col("n_cases"), col("n_pos"),
            Num.r4(col("cum_pos").cast("double") / col("np").cast("double"))
              .as("cum_capture"),
            Num.r4((col("cum_pos").cast("double") / col("cum_cases").cast("double"))
              / (col("np").cast("double") / col("n").cast("double")))
              .as("cum_lift"))
          .orderBy(col("decile"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        hist AS (
          SELECT LEAST(1000, CAST(FLOOR(phat * 1000.0) AS BIGINT)) AS g,
            CAST(COUNT(*) AS BIGINT) AS c,
            CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p
          FROM scored GROUP BY 1),
        cum AS (
          SELECT g, c, p,
            SUM(c) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
            SUM(p) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
          FROM hist),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                  CAST(SUM(p) AS BIGINT) AS np FROM hist)
        SELECT CAST(((cc - 1) * 10) // n + 1 AS BIGINT) AS decile,
          CAST(SUM(c) AS BIGINT) AS n_cases,
          CAST(SUM(p) AS BIGINT) AS n_pos,
          FLOOR((CAST(MAX(cp) AS DOUBLE) / MAX(np)) * 10000 + 0.500001)
            / 10000 AS cum_capture,
          FLOOR(((CAST(MAX(cp) AS DOUBLE) / MAX(cc))
                 / (CAST(MAX(np) AS DOUBLE) / MAX(n))) * 10000 + 0.500001)
            / 10000 AS cum_lift
        FROM cum CROSS JOIN tot
        GROUP BY ((cc - 1) * 10) // n + 1
        ORDER BY decile"""),
      "Gains/lift table of the centroid classifier: grid-grain score deciles, exact cumulative capture and lift"),

    // ---------------------------------------------------------------- q425
    // Average precision (the PR-AUC summary) of the same classifier:
    // AP = Σ_blocks ΔR·P over the descending 1e-3 score grid, each
    // tie-block contributing its recall mass at the block-end
    // precision (documented block convention). The precision-side
    // complement to the ROC-side AUC (q159); per-block terms are
    // exact rationals quantized at 1e-12 before the ≤1001-term sum.
    Query(
      "q425_average_precision",
      (s, d) => {
        val hist = centroidScored(s, d)
          .select(col("pos"),
            least(lit(1000), floor(col("phat") * lit(1000.0)).cast("long"))
              .as("g"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("c"), count(when(col("pos"), 1)).as("p"))
          .localCheckpoint()
        val wdesc = Window.orderBy(col("g").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cc", sum(col("c")).over(wdesc))
          .withColumn("cp", sum(col("p")).over(wdesc))
        val tot = hist.agg(sum(col("p")).as("np"), sum(col("c")).as("n"))
        val terms = cum.crossJoin(broadcast(tot))
          .filter(col("p") > 0)
          .select(floor(col("p").cast("double") / col("np").cast("double")
            * (col("cp").cast("double") / col("cc").cast("double"))
            * lit(1e12) + lit(0.5)).cast("long").as("tq"))
        terms.agg(sum(col("tq")).as("sq"))
          .crossJoin(broadcast(tot))
          .select(col("n").as("n_points"), col("np").as("n_pos"),
            Num.r6(col("np").cast("double") / col("n").cast("double"))
              .as("base_rate"),
            Num.r6(col("sq").cast("double") / lit(1e12)).as("avg_precision"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        hist AS (
          SELECT LEAST(1000, CAST(FLOOR(phat * 1000.0) AS BIGINT)) AS g,
            CAST(COUNT(*) AS BIGINT) AS c,
            CAST(COUNT(*) FILTER (WHERE pos) AS BIGINT) AS p
          FROM scored GROUP BY 1),
        cum AS (
          SELECT g, c, p,
            SUM(c) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc,
            SUM(p) OVER (ORDER BY g DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
          FROM hist),
        tot AS (SELECT CAST(SUM(p) AS BIGINT) AS np,
                  CAST(SUM(c) AS BIGINT) AS n FROM hist),
        terms AS (
          SELECT CAST(FLOOR(CAST(p AS DOUBLE) / np
            * (CAST(cp AS DOUBLE) / cc) * 1e12 + 0.5) AS BIGINT) AS tq
          FROM cum CROSS JOIN tot WHERE p > 0)
        SELECT n AS n_points, np AS n_pos,
          FLOOR((CAST(np AS DOUBLE) / n) * 1000000 + 0.500001) / 1000000
            AS base_rate,
          FLOOR((CAST(SUM(tq) AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS avg_precision
        FROM terms CROSS JOIN tot
        GROUP BY n, np"""),
      "Average precision (PR-AUC) of the centroid classifier: block-convention AP over the descending score grid, 1e-12-quantized terms"),

    // ---------------------------------------------------------------- q426
    // Spiegelhalter's Z calibration test: Z = Σ(o−p)(1−2p) /
    // √(Σ(1−2p)²p(1−p)) — the single-number sharpness-adjusted
    // calibration check that complements the binned ECE (q214) and
    // the Brier decomposition (q391): it detects miscalibration the
    // 10-bin view averages away. With p̂ on the exact 1e-6 grid, the
    // numerator Σ(o·10⁶−pq)(10⁶−2pq) and the variance
    // Σ(10⁶−2pq)²·pq·(10⁶−pq) are EXACT integer sums on
    // DECIMAL/HUGEINT; only the final ratio is a double.
    Query(
      "q426_spiegelhalter_z",
      (s, d) => {
        val t = centroidScored(s, d)
          .select(when(col("pos"), 1000000L).otherwise(0L).as("o"),
            floor(col("phat") * lit(1e6) + lit(0.5)).cast("long").as("pq"))
        val m = t.agg(count(lit(1)).as("n"),
          sum(((col("o") - col("pq")) * (lit(1000000L) - lit(2) * col("pq")))
            .cast("decimal(38,0)")).as("num"),
          sum((lit(1000000L) - lit(2) * col("pq")).cast("decimal(38,0)")
            * (lit(1000000L) - lit(2) * col("pq")) * col("pq")
            * (lit(1000000L) - col("pq"))).as("den2"))
        m.select(col("n").as("n_points"),
            when(col("den2") <= 0, lit(null).cast("double"))
              .otherwise(Num.r4(col("num").cast("double")
                / sqrt(col("den2").cast("double")))).as("z_calibration"))
      },
      Some(s"""
        WITH $sqlCentroidScored,
        t AS (
          SELECT CASE WHEN pos THEN 1000000 ELSE 0 END AS o,
            CAST(FLOOR(phat * 1e6 + 0.5) AS BIGINT) AS pq
          FROM scored),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            SUM(CAST((o - pq) AS HUGEINT) * (1000000 - 2 * pq)) AS num,
            SUM(CAST((1000000 - 2 * pq) AS HUGEINT) * (1000000 - 2 * pq)
                * pq * (1000000 - pq)) AS den2
          FROM t)
        SELECT n AS n_points,
          CASE WHEN den2 <= 0 THEN NULL
               ELSE FLOOR((CAST(num AS DOUBLE) / SQRT(CAST(den2 AS DOUBLE)))
                          * 10000 + 0.500001) / 10000 END AS z_calibration
        FROM m"""),
      "Spiegelhalter calibration Z of the centroid classifier: exact integer numerator and variance on the 1e-6 probability grid")
  )
}
