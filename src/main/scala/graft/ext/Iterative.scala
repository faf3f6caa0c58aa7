package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Iterative fixed-point continuation, batch 29: Markov stationary
  * distribution, per-source quantile normalization, and TextRank
  * keyword extraction. The two power iterations run in EXACT INTEGER
  * ppb arithmetic — transition weights are round-half-up rationals,
  * every per-iteration vector entry is an integer, so the k-th
  * iterate is bit-identical in Spark (driver-side loop over bounded
  * localCheckpoint'd frames) and DuckDB (recursive CTE with GROUP BY
  * in the recursive term). Zero-weight self-edges keep every node in
  * the recursive join alive — an outer join in the recursive term
  * would recurse forever on NULL iteration counters.
  */
/** Shared round-9 re-plan for the bounded Markov power iterations
  * (q292 / q305; q442 and q403 carry variants inline): the chains are
  * bounded by the event-type vocabulary, so instead of one Spark job
  * per iteration (driver loop + localCheckpoint, ~0.2 s of scheduler
  * overhead each at ANY scale factor) the states and edges pack into
  * ONE row and every round runs inside a single whole-stage-codegen
  * `aggregate` over arrays. The arithmetic is the same edge multiset
  * and the same (2·Σ ppb·vp + SCALE) div (2·SCALE) round-half-up on
  * exact int64 — integer sums are order-independent, so the iterates
  * are bit-identical to the loop form and the DuckDB recursive CTEs. */
private[ext] object MarkovPack {
  import org.apache.spark.sql.{Column, DataFrame}

  val SCALE = 1000000000L

  /** One-row frame (sts: sorted state array, es: edge struct array)
    * from a single-column states frame and an (i, j, ppb) edge frame. */
  def pack(states: DataFrame, edges: DataFrame): DataFrame =
    states.toDF("state").agg(sort_array(collect_list(col("state"))).as("sts"))
      .crossJoin(broadcast(edges.toDF("i", "j", "ppb")
        .agg(collect_list(struct(col("i"), col("j"), col("ppb"))).as("es"))))

  /** `rounds` forward power iterations (π ← πP) from the uniform
    * SCALE div |states| start: the inner filter matches edge TARGETS
    * (e.j = st), products read the accumulator at the SOURCE. */
  def forwardRounds(rounds: Int): Column = expr(s"""
    aggregate(sequence(1, $rounds),
      transform(sts, st -> ${SCALE}L div CAST(size(sts) AS BIGINT)),
      (acc, it) -> transform(sts, st ->
        (2 * aggregate(filter(es, e -> e.j = st), 0L,
             (s, e) -> s + e.ppb *
               element_at(acc, CAST(array_position(sts, e.i) AS INT)))
           + ${SCALE}L) div ${2 * SCALE}L))""")

  /** (state, vp) rows back out of a packed frame. */
  def unpack(packed: DataFrame, v: Column): DataFrame =
    packed.withColumn("vfin", v)
      .select(explode(arrays_zip(col("sts"), col("vfin"))).as("z"))
      .select(col("z.sts").as("state"), col("z.vfin").as("vp"))
}

object Iterative {

  /** Scala twin of the SQL `(2*w*SCALE + d) div (2*d)` round-half-up. */
  private val SCALE = 1000000000L

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q292
    // Stationary distribution of the user-journey Markov chain: the
    // long-run share of time spent in each event type, the natural
    // "where does traffic settle" companion to q111's one-step
    // matrix. 12 integer power iterations over the bounded
    // states×states matrix; row-normalized ppb weights; states with
    // no incoming edges decay to zero mass exactly as the math says.
    Query(
      "q292_markov_stationary",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("i"), col("next_type").as("j"))
          .agg(count(lit(1)).as("n"))
          // checkpoint the type-bounded matrix ONCE: tot/states/m would
          // each re-evaluate the events-window pipeline otherwise
          .localCheckpoint()
        val tot = trans.groupBy(col("i")).agg(sum(col("n")).as("t"))
        val states = trans.select(col("i").as("state"))
          .union(trans.select(col("j"))).distinct().localCheckpoint()
        val m = trans.join(broadcast(tot), Seq("i"))
          .select(col("i"), col("j"),
            expr(s"(2 * n * $SCALE + t) div (2 * t)").as("ppb"))
          .union(states.select(col("state"), col("state"), lit(0L)))
        // round 9: was 12 driver-loop Spark jobs — see [[MarkovPack]].
        // v0 = SCALE div |states| replaces the driver-side count().
        val v = MarkovPack.unpack(
          MarkovPack.pack(states, m), MarkovPack.forwardRounds(12))
        v.select(col("state").as("event_type"), col("vp").as("ppb"),
            Num.r6(col("vp").cast("double") / lit(1e9)).as("stationary_p"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH RECURSIVE trans AS (
          SELECT event_type AS i, next_type AS j, CAST(COUNT(*) AS BIGINT) AS n
          FROM (
            SELECT event_type,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY epoch_us(ts), event_id) AS next_type
            FROM events)
          WHERE next_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT i, CAST(SUM(n) AS BIGINT) AS t FROM trans GROUP BY i),
        states AS (SELECT DISTINCT i AS state FROM trans
                   UNION SELECT DISTINCT j FROM trans),
        m AS (
          SELECT i, j, (2 * n * $SCALE + t) // (2 * t) AS ppb
          FROM trans JOIN tot USING (i)
          UNION ALL SELECT state, state, 0 FROM states),
        kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
        v(iter, state, vp) AS (
          SELECT 0, state, $SCALE // k FROM states CROSS JOIN kk
          UNION ALL
          SELECT iter + 1, j, (2 * SUM(vp * ppb) + $SCALE) // ${2 * SCALE}
          FROM v JOIN m ON m.i = v.state WHERE iter < 12 GROUP BY iter + 1, j)
        SELECT state AS event_type, CAST(vp AS BIGINT) AS ppb,
          FLOOR((CAST(vp AS DOUBLE) / 1e9) * 1000000 + 0.500001) / 1000000
            AS stationary_p
        FROM v WHERE iter = 12 ORDER BY event_type"""),
      "Markov stationary distribution of event types: 12 exact-integer ppb power iterations over the bounded chain"),

    // ---------------------------------------------------------------- q293
    // Quantile normalization audit: each source's exact-rank decile
    // values of document length against the pooled deciles — the
    // table a normalization pass reads to remap per-source length
    // distributions onto the corpus distribution. All ranks are the
    // q281 ceil-rank discipline over bounded histograms; the only
    // global window is over distinct length values.
    Query(
      "q293_quantile_normalize",
      (s, d) => {
        val hist = Tables.documents(s, d)
          .groupBy(col("source"), col("n_chars").as("v"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds per-source and pooled rank scans
        val deciles = array((1 to 9).map(lit): _*)
        val wS = Window.partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ng = hist.groupBy(col("source")).agg(sum(col("c")).as("n"))
        val srcQ = hist.withColumn("cum", sum(col("c")).over(wS))
          .join(broadcast(ng), Seq("source"))
          .select(col("source"), col("v"), col("cum"), col("n"),
            explode(deciles).as("q"))
          .filter(col("cum") >= expr("(q * n + 9) div 10"))
          .groupBy(col("source"), col("q")).agg(min(col("v")).as("src_value"))
        val pooled = hist.groupBy(col("v")).agg(sum(col("c")).as("c"))
        val wP = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val np = pooled.agg(sum(col("c")).as("n"))
        val poolQ = pooled.withColumn("cum", sum(col("c")).over(wP))
          .crossJoin(broadcast(np))
          .select(col("v"), col("cum"), col("n"), explode(deciles).as("q"))
          .filter(col("cum") >= expr("(q * n + 9) div 10"))
          .groupBy(col("q")).agg(min(col("v")).as("pooled_value"))
        srcQ.join(broadcast(poolQ), Seq("q"))
          .select(col("source"), col("q").cast("long").as("decile"),
            col("src_value"), col("pooled_value"),
            (col("src_value") - col("pooled_value")).as("shift"))
          .orderBy(col("source"), col("decile"))
      },
      Some("""
        WITH hist AS (
          SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents GROUP BY source, n_chars),
        qs AS (SELECT UNNEST(GENERATE_SERIES(1, 9)) AS q),
        ng AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n
               FROM hist GROUP BY source),
        scum AS (
          SELECT source, v,
            SUM(c) OVER (PARTITION BY source ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        srcq AS (
          SELECT source, q, CAST(MIN(v) AS BIGINT) AS src_value
          FROM scum JOIN ng USING (source) CROSS JOIN qs
          WHERE cum >= (q * n + 9) // 10
          GROUP BY source, q),
        pooled AS (SELECT v, CAST(SUM(c) AS BIGINT) AS c FROM hist GROUP BY v),
        np AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM pooled),
        pcum AS (
          SELECT v, SUM(c) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM pooled),
        poolq AS (
          SELECT q, CAST(MIN(v) AS BIGINT) AS pooled_value
          FROM pcum CROSS JOIN np CROSS JOIN qs
          WHERE cum >= (q * n + 9) // 10
          GROUP BY q)
        SELECT source, CAST(q AS BIGINT) AS decile, src_value, pooled_value,
          src_value - pooled_value AS shift
        FROM srcq JOIN poolq USING (q)
        ORDER BY source, decile"""),
      "Quantile-normalization audit: per-source vs pooled exact-rank length deciles and their shifts"),

    // ---------------------------------------------------------------- q294
    // TextRank keywords: damped PageRank (d = 0.85 = 17/20, 10
    // iterations) over the adjacency graph of the top-100 corpus
    // tokens, edge weight = adjacent-cooccurrence count, symmetrized.
    // Same exact-integer ppb machinery as q292; 0.85·x rounds as
    // (17x+10) div 20 and the teleport term as (3e8+k) div (2k), so
    // both engines walk identical integer states. Top-10 keywords.
    Query(
      "q294_textrank",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "t")
        val top = toks.groupBy(col("t")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("t")).limit(100)
          .select(col("t")).localCheckpoint()
        val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val adj = toks.withColumn("nt", lead(col("t"), 1).over(wD))
          .filter(col("nt").isNotNull && col("t") =!= col("nt"))
          .select(col("t").as("a"), col("nt").as("b"))
          .join(broadcast(top.select(col("t").as("a"))), Seq("a"))
          .join(broadcast(top.select(col("t").as("b"))), Seq("b"))
        // round 9: count directed pairs FIRST, then symmetrize the
        // bounded (≤ 100² rows) count table — the old union(adj, adj)
        // shape evaluated the whole posexplode+window pipeline four
        // times (twice for und, twice more through deg); the checkpoint
        // pins the one remaining evaluation. w is unchanged:
        // #(a=i,b=j) + #(a=j,b=i) either way.
        val cnt = adj.groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val und = cnt.select(col("a").as("i"), col("b").as("j"), col("n"))
          .unionByName(cnt.select(col("b").as("i"), col("a").as("j"), col("n")))
          .groupBy(col("i"), col("j")).agg(sum(col("n")).as("w"))
        val deg = und.groupBy(col("i")).agg(sum(col("w")).as("dg"))
        val m = und.join(broadcast(deg), Seq("i"))
          .select(col("i"), col("j"),
            expr(s"(2 * w * $SCALE + dg) div (2 * dg)").as("ppb"))
          .union(top.select(col("t"), col("t"), lit(0L)))
        // round 9: was 10 driver-loop Spark jobs — MarkovPack's packing
        // with q294's damped update inline: the teleport base and the
        // 0.85-damping rounding wrap the same forward Σ ppb·vp, k =
        // size(sts) replaces the driver-side count(). Bit-identical.
        val packed = MarkovPack.pack(top.select(col("t").as("state")), m)
        val vfin = expr(s"""
          aggregate(sequence(1, 10),
            transform(sts, st -> ${SCALE}L div CAST(size(sts) AS BIGINT)),
            (acc, it) -> transform(sts, st ->
              (300000000L + CAST(size(sts) AS BIGINT))
                div (2 * CAST(size(sts) AS BIGINT))
              + (17 * ((2 * aggregate(filter(es, e -> e.j = st), 0L,
                   (s, e) -> s + e.ppb *
                     element_at(acc, CAST(array_position(sts, e.i) AS INT)))
                 + ${SCALE}L) div ${2 * SCALE}L) + 10) div 20))""")
        MarkovPack.unpack(packed, vfin)
          .orderBy(col("vp").desc, col("state")).limit(10)
          .select(col("state").as("keyword"), col("vp").as("rank_ppb"))
          .orderBy(col("rank_ppb").desc, col("keyword"))
      },
      Some(s"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, pos, t FROM (
            SELECT doc_id,
              UNNEST(string_split(text, ' ')) AS t,
              UNNEST(GENERATE_SERIES(1, LEN(string_split(text, ' ')))) AS pos
            FROM documents)),
        top AS (
          SELECT t FROM (SELECT t, COUNT(*) AS freq FROM toks GROUP BY t)
          ORDER BY freq DESC, t LIMIT 100),
        adj AS (
          SELECT a, b FROM (
            SELECT t AS a,
              LEAD(t) OVER (PARTITION BY doc_id ORDER BY pos) AS b
            FROM toks)
          WHERE b IS NOT NULL AND a <> b
            AND a IN (SELECT t FROM top) AND b IN (SELECT t FROM top)),
        und AS (
          SELECT i, j, CAST(COUNT(*) AS BIGINT) AS w FROM (
            SELECT a AS i, b AS j FROM adj
            UNION ALL SELECT b, a FROM adj)
          GROUP BY i, j),
        deg AS (SELECT i, CAST(SUM(w) AS BIGINT) AS dg FROM und GROUP BY i),
        m AS (
          SELECT i, j, (2 * w * $SCALE + dg) // (2 * dg) AS ppb
          FROM und JOIN deg USING (i)
          UNION ALL SELECT t, t, 0 FROM top),
        kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM top),
        v(iter, node, vp) AS (
          SELECT 0, t, $SCALE // k FROM top CROSS JOIN kk
          UNION ALL
          SELECT iter + 1, j,
            (SELECT (300000000 + k) // (2 * k) FROM kk)
            + (17 * ((2 * SUM(vp * ppb) + $SCALE) // ${2 * SCALE}) + 10) // 20
          FROM v JOIN m ON m.i = v.node WHERE iter < 10 GROUP BY iter + 1, j)
        SELECT node AS keyword, CAST(vp AS BIGINT) AS rank_ppb
        FROM v WHERE iter = 10
        ORDER BY rank_ppb DESC, keyword LIMIT 10"""),
      "TextRank keywords over the top-100 token adjacency graph (10 damped exact-integer ppb iterations, top 10)"),

    // ---------------------------------------------------------------- q442
    // Markov removal-effect attribution (the standard upgrade over
    // last-touch q105/q280): per-user journeys run START → touchpoints
    // → CONV at the first purchase (or → DROP if the user never
    // converts); first-order transition probabilities in round-half-up
    // ppb; conversion probability = 20-step absorption at CONV (the
    // truncation is part of the pinned semantics, applied identically
    // to every scenario); a channel's removal effect compares base
    // absorption against the chain with ALL edges touching the channel
    // deleted (mass into it implicitly flows to DROP); attribution
    // shares normalize the ppb effects. All five scenarios (base +
    // four removals) iterate in ONE frame keyed by (scenario, state) —
    // 20 driver-loop rounds over a ≤7-state chain per scenario, every
    // entry an exact integer, reproduced by the DuckDB recursive CTE
    // bit for bit. CONV holds value SCALE via a full-weight self-edge;
    // DROP holds 0; transient states carry q292's zero self-edges so
    // the recursive join keeps them alive.
    Query(
      "q442_markov_attribution",
      (s, d) => {
        val sp = s; import sp.implicits._
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val seq0 = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("rn", row_number().over(w))
        val firstP = seq0.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("rn")).as("prn"))
        val jour = seq0.join(firstP, Seq("user_id"), "left")
          .filter(col("prn").isNull || col("rn") <= col("prn"))
          .withColumn("state",
            when(col("event_type") === "purchase", "CONV")
              .otherwise(col("event_type")))
        val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
        val steps = jour
          .withColumn("next", coalesce(lead(col("state"), 1).over(w2),
            when(col("prn").isNull, lit("DROP"))))
          .filter(col("next").isNotNull)
          .select(col("state").as("i"), col("next").as("j"))
          .union(jour.filter(col("rn") === 1)
            .select(lit("START").as("i"), col("state").as("j")))
        // checkpoint the type-bounded matrix ONCE: tot/states/base each
        // re-evaluated the whole events-window pipeline otherwise (Spark
        // shares no common subtrees across a DataFrame DAG)
        val trans = steps.groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val tot = trans.groupBy(col("i")).agg(sum(col("n")).as("t"))
        val states = trans.select(col("i").as("state"))
          .union(trans.select(col("j"))).union(Seq("DROP").toDF("state"))
          .distinct().localCheckpoint()
        val channels = states
          .filter(!col("state").isin("START", "CONV", "DROP"))
          .select(col("state").as("removed"))
        val scen = channels.union(Seq("NONE").toDF("removed")).localCheckpoint()
        val base = trans.join(broadcast(tot), Seq("i"))
          .select(col("i"), col("j"),
            expr(s"(2 * n * $SCALE + t) div (2 * t)").as("ppb"))
          .union(states.select(col("state"), col("state"),
            when(col("state") === "CONV", lit(SCALE)).otherwise(lit(0L))))
        val m = base.crossJoin(broadcast(scen))
          .filter(col("i") =!= col("removed") && col("j") =!= col("removed"))
        // round 9: the 20 absorption rounds used to run as 20 driver-loop
        // Spark jobs (tiny join + shuffle + localCheckpoint each) over a
        // ≤7-state × ≤5-scenario frame — ~6 s of pure per-job overhead at
        // EVERY scale factor. The chain is bounded by construction (the
        // event-type vocabulary), so pack each scenario's states and edges
        // into ONE row and run all 20 rounds in a single whole-stage-codegen
        // aggregate over arrays. The arithmetic is the SAME edge multiset
        // and the same (2·Σ ppb·vp + SCALE) div (2·SCALE) round-half-up on
        // exact int64 — sums of integers are order-independent, so the
        // result is bit-identical to the loop (and to the unchanged DuckDB
        // recursive-CTE oracle). Absorption still runs BACKWARD: the inner
        // filter matches edge SOURCES (e.i = st) and the products read the
        // accumulator at the edge TARGET's position.
        val stv = states.crossJoin(broadcast(scen))
          .filter(col("state") =!= col("removed"))
          .groupBy(col("removed"))
          .agg(sort_array(collect_list(col("state"))).as("sts"))
        val packed = stv.join(
          m.groupBy(col("removed"))
            .agg(collect_list(struct(col("i"), col("j"), col("ppb"))).as("es")),
          Seq("removed"))
        val vfin = expr(s"""
          aggregate(sequence(1, 20),
            transform(sts, st -> IF(st = 'CONV', ${SCALE}L, 0L)),
            (acc, it) -> transform(sts, st ->
              (2 * aggregate(filter(es, e -> e.i = st), 0L,
                   (s, e) -> s + e.ppb *
                     element_at(acc, CAST(array_position(sts, e.j) AS INT)))
                 + ${SCALE}L) div ${2 * SCALE}L))""")
        val starts = packed.withColumn("vfin", vfin)
          .select(col("removed"),
            expr("""IF(array_position(sts, 'START') > 0,
              element_at(vfin, CAST(array_position(sts, 'START') AS INT)),
              CAST(NULL AS BIGINT))""").as("vp"))
          .localCheckpoint()
        val b = starts.filter(col("removed") === "NONE")
          .select(col("vp").as("base_ppb"))
        // base_ppb > 0 guard: on a corpus with zero conversions the
        // integer division below is NULL rows in Spark but a hard
        // division-by-zero ERROR in DuckDB — the degenerate case must
        // degrade identically (to zero rows) on both engines
        val eff = starts.filter(col("removed") =!= "NONE")
          .crossJoin(broadcast(b))
          .filter(col("base_ppb") > 0)
          .select(col("removed").as("channel"), col("base_ppb"),
            col("vp").as("removed_ppb"),
            (lit(SCALE) - expr(s"(2 * vp * $SCALE + base_ppb) div (2 * base_ppb)"))
              .as("re_ppb"))
        val sumRe = eff.agg(sum(col("re_ppb")).as("sre"))
        eff.crossJoin(broadcast(sumRe))
          .select(col("channel"),
            Num.r6(col("base_ppb").cast("double") / lit(1e9)).as("base_cvr"),
            Num.r6(col("removed_ppb").cast("double") / lit(1e9)).as("removed_cvr"),
            Num.r6(col("re_ppb").cast("double") / lit(1e9)).as("removal_effect"),
            Num.r4(col("re_ppb").cast("double") / col("sre").cast("double"))
              .as("attribution_share"))
          .orderBy(col("channel"))
      },
      Some(s"""
        WITH RECURSIVE seq0 AS (
          SELECT user_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS rn
          FROM events),
        firstp AS (
          SELECT user_id, MIN(rn) AS prn FROM seq0
          WHERE event_type = 'purchase' GROUP BY user_id),
        jour AS (
          SELECT s.user_id, s.rn, f.prn,
            CASE WHEN s.event_type = 'purchase' THEN 'CONV'
                 ELSE s.event_type END AS state
          FROM seq0 s LEFT JOIN firstp f USING (user_id)
          WHERE f.prn IS NULL OR s.rn <= f.prn),
        steps AS (
          SELECT state AS i,
            COALESCE(LEAD(state) OVER (PARTITION BY user_id ORDER BY rn),
              CASE WHEN prn IS NULL THEN 'DROP' END) AS j
          FROM jour
          UNION ALL
          SELECT 'START', state FROM jour WHERE rn = 1),
        trans AS (
          SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM steps
          WHERE j IS NOT NULL GROUP BY i, j),
        tot AS (SELECT i, CAST(SUM(n) AS BIGINT) AS t FROM trans GROUP BY i),
        states AS (SELECT DISTINCT i AS state FROM trans
                   UNION SELECT DISTINCT j FROM trans
                   UNION SELECT 'DROP'),
        scen AS (
          SELECT state AS removed FROM states
          WHERE state NOT IN ('START', 'CONV', 'DROP')
          UNION SELECT 'NONE'),
        mbase AS (
          SELECT i, j, (2 * n * $SCALE + t) // (2 * t) AS ppb
          FROM trans JOIN tot USING (i)
          UNION ALL
          SELECT state, state,
            CASE WHEN state = 'CONV' THEN $SCALE ELSE 0 END
          FROM states),
        m AS (
          SELECT sc.removed, mb.i, mb.j, mb.ppb
          FROM mbase mb CROSS JOIN scen sc
          WHERE mb.i <> sc.removed AND mb.j <> sc.removed),
        v(iter, removed, state, vp) AS (
          SELECT 0, sc.removed, st.state,
            CASE WHEN st.state = 'CONV' THEN $SCALE ELSE 0 END
          FROM states st CROSS JOIN scen sc WHERE st.state <> sc.removed
          UNION ALL
          SELECT iter + 1, m.removed, m.i,
            (2 * SUM(vp * ppb) + $SCALE) // ${2 * SCALE}
          FROM v JOIN m ON m.removed = v.removed AND m.j = v.state
          WHERE iter < 20 GROUP BY iter + 1, m.removed, m.i),
        starts AS (
          SELECT removed, CAST(vp AS BIGINT) AS vp FROM v
          WHERE iter = 20 AND state = 'START'),
        eff AS (
          SELECT s.removed AS channel, b.vp AS base_ppb, s.vp AS removed_ppb,
            $SCALE - (2 * s.vp * $SCALE + b.vp) // (2 * b.vp) AS re_ppb
          FROM starts s, (SELECT vp FROM starts WHERE removed = 'NONE') b
          WHERE s.removed <> 'NONE' AND b.vp > 0)
        SELECT channel,
          ${Num.sql("CAST(base_ppb AS DOUBLE) / 1e9", 6)} AS base_cvr,
          ${Num.sql("CAST(removed_ppb AS DOUBLE) / 1e9", 6)} AS removed_cvr,
          ${Num.sql("CAST(re_ppb AS DOUBLE) / 1e9", 6)} AS removal_effect,
          ${Num.sql("CAST(re_ppb AS DOUBLE) / CAST((SELECT SUM(re_ppb) FROM eff) AS DOUBLE)", 4)}
            AS attribution_share
        FROM eff ORDER BY channel"""),
      "Markov removal-effect channel attribution: 20-step exact-integer ppb absorption at CONV, base vs channel-removed chains, normalized shares")
  )
}
