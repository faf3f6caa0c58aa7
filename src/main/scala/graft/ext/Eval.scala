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
      "split-conformal +-qhat intervals for the per-key persistence forecast: finite-sample 90% rank on calibration moves, coverage on the 30% eval tail")
  )
}
