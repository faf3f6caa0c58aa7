package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Distribution- and sequence-statistics operators: Markov event
  * transitions, per-source token entropy, PSI distribution drift,
  * equal-width histograms, and nearest-centroid label audit. Common
  * scale shape: one linear pass over the fact table, all global
  * scalars via broadcast 1-row aggregates (never a global window),
  * all unordered floating sums quantized to integers first.
  */
object Stats {

  private def toks = split(col("text"), " ")

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q111
    // First-order Markov transition matrix over each user's event
    // sequence (ordered by integer microseconds + event_id, the house
    // tie-break that makes ns-vs-µs timestamp precision invisible):
    // counts and row-normalized probabilities for event_type ->
    // next event_type. The sequence pass is one per-user window (hash
    // shuffle on user_id, in-partition sort); the matrix itself is
    // |states|² rows, so the normalizing join is a broadcast.
    Query(
      "q111_markov_transitions",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val cnt = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
        cnt.join(broadcast(tot), Seq("from_type"))
          .select(col("from_type"), col("to_type"), col("n"),
            Num.r4(col("n") / col("tot").cast("double")).as("p"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events),
        seq AS (
          SELECT event_type AS from_type,
            LEAD(event_type) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS to_type
          FROM ev),
        cnt AS (
          SELECT from_type, to_type, COUNT(*) AS n
          FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
        tot AS (SELECT from_type, SUM(n) AS tot FROM cnt GROUP BY from_type)
        SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
          ${Num.sql("n / CAST(tot AS DOUBLE)", 4)} AS p
        FROM cnt JOIN tot USING (from_type)
        ORDER BY from_type, to_type"""),
      "first-order Markov transition matrix (counts + row-normalized probabilities) over per-user event sequences"),

    // --------------------------------------------------------------- q112
    // Per-source token-distribution Shannon entropy — the diversity
    // signal used to weight sources in a training mix (low-entropy
    // sources are repetitive/templated). H = Σ (n/N)·ln(N/n) computed
    // as an INTEGER sum of n·⌊ln(N/n)·1e6⌉ micro-nats: the unordered
    // per-source group sum is exact, the one division at the end is
    // IEEE-exact on identical integers. One token pass, source-sized
    // result.
    Query(
      "q112_source_entropy",
      (s, d) => {
        val f = Tables.documents(s, d)
          .select(col("source"), explode(toks).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("n"))
        val tot = f.groupBy(col("source"))
          .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("vocab"))
        f.join(broadcast(tot), Seq("source"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            (col("n") * floor(log(col("n_tokens").cast("double") / col("n"))
              * 1000000 + lit(0.500001)).cast("long")).as("h_micro"))
          .groupBy(col("source"))
          .agg(max(col("n_tokens")).as("n_tokens"),
            max(col("vocab")).as("vocab"),
            sum(col("h_micro")).as("h_sum"))
          .select(col("source"), col("n_tokens"), col("vocab"),
            Num.r4(col("h_sum") / (col("n_tokens") * lit(1000000.0)))
              .as("entropy"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH f AS (
          SELECT source, t, COUNT(*) AS n FROM (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents) GROUP BY source, t),
        tot AS (
          SELECT source, SUM(n) AS n_tokens, COUNT(*) AS vocab
          FROM f GROUP BY source),
        h AS (
          SELECT f.source, tot.n_tokens, tot.vocab,
            f.n * CAST(FLOOR(LN(CAST(tot.n_tokens AS DOUBLE) / f.n) * 1000000
                             + 0.500001) AS BIGINT) AS h_micro
          FROM f JOIN tot USING (source))
        SELECT source, CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
          CAST(MAX(vocab) AS BIGINT) AS vocab,
          ${Num.sql("SUM(h_micro) / (MAX(n_tokens) * 1000000.0)", 4)} AS entropy
        FROM h GROUP BY source ORDER BY source"""),
      "per-source token Shannon entropy (training-mix diversity signal): integer micro-nat sum keeps ln() and the unordered group sum cross-engine exact"),

    // --------------------------------------------------------------- q113
    // Population-stability-index drift of each source's doc-length
    // distribution vs the rest of the corpus, over 10 fixed-width
    // integer bins (global min/max via a broadcast 1-row aggregate —
    // all-integer binning, so bin membership is trivially identical
    // across engines). Laplace-smoothed shares; each bin's PSI term is
    // quantized to a 1e-8 integer before the 10-term sum. The audit a
    // pipeline runs per crawl snapshot to catch a source whose content
    // shifted. Scale: docs-sized pass for the counts; everything after
    // is |sources|×10 rows.
    Query(
      "q113_psi_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val g = docs.agg(min(col("n_chars")).as("gmin"),
          max(col("n_chars")).as("gmax")) // 1 row
        // localCheckpoint: binned feeds three aggregates (per-source,
        // per-bin, per-source-total) — truncation stops each from
        // re-scanning documents
        val binned = docs.crossJoin(broadcast(g))
          .select(col("source"),
            least(lit(9), expr("((n_chars - gmin) * 10) div (gmax - gmin + 1)"))
              .as("bin"))
          .localCheckpoint()
        val sb = binned.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n_sb"))
        val gb = binned.groupBy(col("bin")).agg(count(lit(1)).as("n_gb"))
        val ts_ = binned.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
        val n = docs.agg(count(lit(1)).as("n_all")) // 1 row
        // dense (source × bin) grid so empty bins contribute their
        // smoothed term instead of silently vanishing
        val grid = ts_.select(col("source"), col("n_s"),
          explode(expr("sequence(0, 9)")).as("bin"))
        val pa = (coalesce(col("n_sb"), lit(0L)) + lit(1)) /
          (col("n_s") + lit(10)).cast("double")
        val pb = (col("n_gb") - coalesce(col("n_sb"), lit(0L)) + lit(1)) /
          (col("n_all") - col("n_s") + lit(10)).cast("double")
        grid
          .join(sb, Seq("source", "bin"), "left")
          .join(broadcast(gb), Seq("bin"))
          .crossJoin(broadcast(n))
          .select(col("source"), col("n_s"),
            (floor((pa - pb)
              * floor(log(pa / pb) * 1000000 + lit(0.500001)).cast("long")
              * 100 + lit(0.500001))).cast("long").as("term_q"))
          .groupBy(col("source"))
          .agg(max(col("n_s")).as("n_docs"), sum(col("term_q")).as("psi_q"))
          .select(col("source"), col("n_docs"),
            Num.r6(col("psi_q") / lit(100000000.0)).as("psi"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH g AS (SELECT MIN(n_chars) AS gmin, MAX(n_chars) AS gmax
                   FROM documents),
        binned AS (
          SELECT source,
            LEAST(9, ((n_chars - gmin) * 10) // (gmax - gmin + 1)) AS bin
          FROM documents CROSS JOIN g),
        sb AS (SELECT source, bin, COUNT(*) AS n_sb
               FROM binned GROUP BY source, bin),
        gb AS (SELECT bin, COUNT(*) AS n_gb FROM binned GROUP BY bin),
        ts AS (SELECT source, COUNT(*) AS n_s FROM binned GROUP BY source),
        n AS (SELECT COUNT(*) AS n_all FROM documents),
        grid AS (SELECT source, n_s, unnest(range(0, 10)) AS bin FROM ts),
        terms AS (
          SELECT grid.source, grid.n_s,
            CAST(FLOOR(
              ((COALESCE(n_sb, 0) + 1) / CAST(grid.n_s + 10 AS DOUBLE)
               - (n_gb - COALESCE(n_sb, 0) + 1)
                 / CAST(n_all - grid.n_s + 10 AS DOUBLE))
              * CAST(FLOOR(LN(
                  ((COALESCE(n_sb, 0) + 1) / CAST(grid.n_s + 10 AS DOUBLE))
                  / ((n_gb - COALESCE(n_sb, 0) + 1)
                     / CAST(n_all - grid.n_s + 10 AS DOUBLE))) * 1000000
                  + 0.500001) AS BIGINT)
              * 100 + 0.500001) AS BIGINT) AS term_q
          FROM grid
          LEFT JOIN sb ON sb.source = grid.source AND sb.bin = grid.bin
          JOIN gb ON gb.bin = grid.bin
          CROSS JOIN n)
        SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
          ${Num.sql("SUM(term_q) / 100000000.0", 6)} AS psi
        FROM terms GROUP BY source ORDER BY source"""),
      "population-stability-index drift of each source's doc-length distribution vs the rest of the corpus (10 integer bins, Laplace-smoothed, integer-quantized terms)"),

    // --------------------------------------------------------------- q114
    // Equal-width 20-bin histogram of l_extendedprice with global
    // min/max from a broadcast 1-row aggregate. Bin membership and the
    // bin edges are pure IEEE -,*,/ on identical inputs — bit-exact in
    // both engines with no rounding needed. The building block behind
    // every numeric-profile dashboard; at 100 TB it is one
    // partial-aggregated pass (20 groups).
    Query(
      "q114_histogram",
      (s, d) => {
        val g = Tables.lineitem(s, d)
          .agg(min(col("l_extendedprice")).as("gmin"),
            max(col("l_extendedprice")).as("gmax"))
        Tables.lineitem(s, d).crossJoin(broadcast(g))
          .select(col("gmin"), col("gmax"),
            least(lit(19), floor((col("l_extendedprice") - col("gmin"))
              / ((col("gmax") - col("gmin")) / lit(20.0))).cast("long"))
              .as("bin"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
            (max(col("gmin")) + col("bin") * ((max(col("gmax")) - max(col("gmin"))) / lit(20.0))).as("bin_lo"),
            (max(col("gmin")) + (col("bin") + 1) * ((max(col("gmax")) - max(col("gmin"))) / lit(20.0))).as("bin_hi"))
          .select(col("bin"), col("bin_lo"), col("bin_hi"), col("n"))
          .orderBy(col("bin"))
      },
      Some("""
        WITH g AS (SELECT MIN(l_extendedprice) AS gmin,
                          MAX(l_extendedprice) AS gmax FROM lineitem),
        b AS (
          SELECT gmin, gmax,
            LEAST(19, CAST(FLOOR((l_extendedprice - gmin)
              / ((gmax - gmin) / 20.0)) AS BIGINT)) AS bin
          FROM lineitem CROSS JOIN g)
        SELECT bin,
          MAX(gmin) + bin * ((MAX(gmax) - MAX(gmin)) / 20.0) AS bin_lo,
          MAX(gmin) + (bin + 1) * ((MAX(gmax) - MAX(gmin)) / 20.0) AS bin_hi,
          CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY bin ORDER BY bin"""),
      "equal-width 20-bin histogram of l_extendedprice (global min/max via broadcast 1-row aggregate; bit-exact IEEE bin math, no rounding needed)"),

    // --------------------------------------------------------------- q115
    // Nearest-centroid label audit: assign every embedding to its
    // closest per-label centroid by cosine and report the label-vs-
    // predicted confusion matrix — the standard mislabel/cluster-
    // coherence check before training on labeled data. Exactness: the
    // centroid is an exact rational (q92's integer micro-sum / n); dot
    // products and squared norms are quantized per-dimension to
    // integer micro-units so every unordered sum is integer; the final
    // cosine is IEEE ops on those integers, rounded r6, argmax broken
    // by label. Scale: centroids are a |labels|×|dims| broadcast; one
    // narrow pass over (vector × label) — no shuffle wider than
    // (vec_id, label) partial aggregation.
    Query(
      "q115_nearest_centroid",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("dim", "xf")))
          .select(col("vec_id"), col("label"), col("dim"),
            col("xf").cast("double").as("x"))
        val cent = e.groupBy(col("label").as("c_label"), col("dim"))
          .agg(count(lit(1)).as("nv"),
            sum(floor(col("x") * 1000000 + lit(0.5)).cast("long"))
              .as("sum_micro"))
          .select(col("c_label"), col("dim"),
            (col("sum_micro") / (col("nv") * lit(1000000.0))).as("c"))
        val cn = cent.groupBy(col("c_label"))
          .agg(sum(floor(col("c") * col("c") * 1000000 + lit(0.5))
            .cast("long")).as("cn2_micro"))
        val vn = e.groupBy(col("vec_id"))
          .agg(sum(floor(col("x") * col("x") * 1000000 + lit(0.5))
            .cast("long")).as("vn2_micro"))
        val dot = e.join(broadcast(cent), Seq("dim"))
          .groupBy(col("vec_id"), col("label"), col("c_label"))
          .agg(sum(floor(col("x") * col("c") * 1000000 + lit(0.5))
            .cast("long")).as("dot_micro"))
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("c_label"))
        dot.join(broadcast(cn), Seq("c_label"))
          .join(vn, Seq("vec_id"))
          .select(col("vec_id"), col("label"), col("c_label"),
            Num.r6(col("dot_micro")
              / sqrt((col("cn2_micro") * col("vn2_micro")).cast("double")))
              .as("cos"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .groupBy(col("label"), col("c_label").as("pred_label"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("pred_label"))
      },
      Some("""
        WITH e AS (
          SELECT vec_id, label,
            CAST(unnest(embedding) AS DOUBLE) AS x,
            unnest(range(0, len(embedding))) AS dim
          FROM embeddings),
        cent AS (
          SELECT label AS c_label, dim,
            SUM(CAST(FLOOR(x * 1000000 + 0.5) AS BIGINT))
              / (COUNT(*) * 1000000.0) AS c
          FROM e GROUP BY label, dim),
        cn AS (
          SELECT c_label,
            SUM(CAST(FLOOR(c * c * 1000000 + 0.5) AS BIGINT)) AS cn2_micro
          FROM cent GROUP BY c_label),
        vn AS (
          SELECT vec_id,
            SUM(CAST(FLOOR(x * x * 1000000 + 0.5) AS BIGINT)) AS vn2_micro
          FROM e GROUP BY vec_id),
        dot AS (
          SELECT e.vec_id, e.label, cent.c_label,
            SUM(CAST(FLOOR(e.x * cent.c * 1000000 + 0.5) AS BIGINT))
              AS dot_micro
          FROM e JOIN cent ON cent.dim = e.dim
          GROUP BY e.vec_id, e.label, cent.c_label),
        scored AS (
          SELECT dot.vec_id, dot.label, dot.c_label,
            FLOOR((dot_micro
              / SQRT(CAST(cn2_micro * vn2_micro AS DOUBLE))) * 1000000
              + 0.500001) / 1000000 AS cos
          FROM dot JOIN cn USING (c_label) JOIN vn ON vn.vec_id = dot.vec_id),
        pred AS (
          SELECT vec_id, label, c_label,
            ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cos DESC, c_label) AS rn
          FROM scored)
        SELECT label, c_label AS pred_label, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred WHERE rn = 1
        GROUP BY label, c_label ORDER BY label, pred_label"""),
      "nearest-centroid label audit (confusion matrix of label vs closest per-label cosine centroid): integer-quantized dots/norms make the argmax cross-engine exact"),

    // --------------------------------------------------------------- q131
    // Time-series similarity search (the EDBT/ICDE distributed-top-k
    // theme in PAPERS.md): each user's event-value series is resampled
    // onto a dense 8-bucket time grid (per-user span, integer-µs bin
    // math; empty buckets contribute 0 — a defined, deterministic
    // imputation), z-normalized, and ranked by squared distance to the
    // probe user's shape (user 0), top-10. Exactness: values quantize
    // to integer micro-units BEFORE every unordered sum (bucket sums,
    // series moments, squared diffs), so the whole pipeline is exact
    // integer arithmetic plus bit-identical IEEE division; std=0
    // series z-map to 0 by a CASE both engines share. Scale: one
    // user-key shuffle for spans+buckets, then the probe's 8-value
    // shape broadcasts — candidate scoring is a narrow per-user map,
    // the top-10 a TakeOrdered. Swapping the broadcast probe for an
    // LSH bucket join (q39's recipe) is the many-probe scale path.
    Query(
      "q131_series_similarity",
      (s, d) => {
        val B = 8
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            floor(col("value") * 1000000 + lit(0.5)).cast("long").as("v_micro"))
        val span = ev.groupBy(col("user_id"))
          .agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
        val bucket = ev.join(span, Seq("user_id"))
          .select(col("user_id"),
            expr(s"((us - us0) * $B) div (us1 - us0 + 1)").as("bin"),
            col("v_micro"))
          .groupBy(col("user_id"), col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("v_micro")).as("sum_micro"))
        val grid = span.select(col("user_id"),
            explode(lit((0 until B).toArray)).as("bin"))
          .join(bucket, Seq("user_id", "bin"), "left")
          .select(col("user_id"), col("bin"),
            coalesce(floor(col("sum_micro") / col("n") + lit(0.5)).cast("long"),
              lit(0L)).as("a_micro"))
        val stats = grid.groupBy(col("user_id"))
          .agg(sum(col("a_micro")).as("s1"),
            sum(col("a_micro") * col("a_micro")).as("s2"))
          .select(col("user_id"), (col("s1") / lit(B.toDouble)).as("mean"),
            sqrt(greatest(lit(0.0),
              col("s2") / lit(B.toDouble)
                - (col("s1") / lit(B.toDouble)) * (col("s1") / lit(B.toDouble))))
              .as("std"))
        // localCheckpoint: z is read twice (probe + candidates); without
        // truncation each reference re-evaluates the whole span/bucket/
        // grid lineage — the Explain audit showed 12 event-table scans
        val z = grid.join(stats, Seq("user_id"))
          .select(col("user_id"), col("bin"),
            when(col("std") > 0,
              floor((col("a_micro") - col("mean")) / col("std") * 1000000
                + lit(0.500001)).cast("long")).otherwise(lit(0L)).as("z_micro"))
          .localCheckpoint()
        val probe = broadcast(z.filter(col("user_id") === 0)
          .select(col("bin"), col("z_micro").as("p_micro")))
        z.filter(col("user_id") =!= 0)
          .join(probe, Seq("bin"))
          .select(col("user_id"),
            floor(((col("z_micro") - col("p_micro")) / lit(1000000.0))
              * ((col("z_micro") - col("p_micro")) / lit(1000000.0)) * 1000000
              + lit(0.5)).cast("long").as("d_micro"))
          .groupBy(col("user_id")).agg(sum(col("d_micro")).as("dist_sum"))
          .select(col("user_id"),
            Num.r4(col("dist_sum") / lit(1000000.0)).as("sq_dist"))
          .orderBy(col("sq_dist"), col("user_id")).limit(10)
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us,
            CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v_micro
          FROM events),
        span AS (SELECT user_id, MIN(us) AS us0, MAX(us) AS us1
                 FROM ev GROUP BY user_id),
        bucket AS (
          SELECT ev.user_id, ((us - us0) * 8) // (us1 - us0 + 1) AS bin,
            COUNT(*) AS n, SUM(v_micro) AS sum_micro
          FROM ev JOIN span ON span.user_id = ev.user_id
          GROUP BY ev.user_id, ((us - us0) * 8) // (us1 - us0 + 1)),
        grid AS (
          SELECT s.user_id, g.bin,
            COALESCE(CAST(FLOOR(sum_micro / n + 0.5) AS BIGINT), 0) AS a_micro
          FROM span s
          CROSS JOIN (SELECT unnest(range(0, 8)) AS bin) g
          LEFT JOIN bucket b ON b.user_id = s.user_id AND b.bin = g.bin),
        stats AS (
          SELECT user_id, SUM(a_micro) / 8.0 AS mean,
            SQRT(GREATEST(0.0, SUM(a_micro * a_micro) / 8.0
              - (SUM(a_micro) / 8.0) * (SUM(a_micro) / 8.0))) AS std
          FROM grid GROUP BY user_id),
        z AS (
          SELECT g.user_id, g.bin,
            CASE WHEN std > 0 THEN CAST(FLOOR((a_micro - mean) / std * 1000000
              + 0.500001) AS BIGINT) ELSE 0 END AS z_micro
          FROM grid g JOIN stats st ON st.user_id = g.user_id),
        probe AS (SELECT bin, z_micro AS p_micro FROM z WHERE user_id = 0),
        dist AS (
          SELECT z.user_id,
            SUM(CAST(FLOOR(((z_micro - p_micro) / 1000000.0)
              * ((z_micro - p_micro) / 1000000.0) * 1000000 + 0.5) AS BIGINT))
              AS dist_sum
          FROM z JOIN probe USING (bin)
          WHERE z.user_id <> 0
          GROUP BY z.user_id)
        SELECT user_id, ${Num.sql("dist_sum / 1000000.0", 4)} AS sq_dist
        FROM dist ORDER BY sq_dist, user_id LIMIT 10"""),
      "time-series similarity search: z-normalized 8-bucket resampled event-value shapes ranked by squared distance to a probe user (integer-quantized throughout)"),

    // ---------------------------------------------------------------- q403
    // Stationary distribution π and entropy rate of the q111 Markov
    // chain: 8 integer power-iteration rounds of π ← πP over the
    // event-type transition matrix (the long-run share of each event
    // type if the per-user dynamics ran forever), and the chain's
    // entropy rate Σ_b π(b)·H(row b) — the bits-per-step number that
    // upper-bounds how predictable q199's next-event model can ever
    // be. The matrix is type-bounded (k² cells); contributions divide
    // BEFORE the sum ((π_a·n_ab) div tot_a — q101's discipline), mass
    // renormalizes to S each round by truncating division, and row
    // entropies are pico-quantized per CELL before the row sum.
    Query(
      "q403_markov_stationary",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val cnt = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("a"), col("next_type").as("b"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // type-bounded matrix
        val tot = cnt.groupBy(col("a")).agg(sum(col("n")).as("ta"))
        val trans = cnt.join(broadcast(tot), Seq("a")).localCheckpoint()
        val types = trans.select(col("a").as("t")).distinct()
        val S = 1000000000L
        // round 9: was 8 driver-loop Spark jobs (two aggs + localCheckpoint
        // each) over the type-bounded chain. Pack types and the matrix into
        // one row and run the 8 rounds in a single codegen aggregate — the
        // same per-edge (pq·n) div ta contributions summed over the same
        // edge multiset, and the same per-round (x·S) div tx renormalization
        // (the singleton-array transform binds the un-normalized x vector
        // once so tx = Σx is computed from it, exactly the original two-step
        // x→tx dataflow), so every iterate is bit-identical. A type with no
        // incoming edges sums over an empty edge list to 0 — the original's
        // coalesce(NULL, 0) left-join case.
        val packed = types.agg(sort_array(collect_list(col("t"))).as("sts"))
          .crossJoin(broadcast(trans.agg(
            collect_list(struct(col("a"), col("b"), col("n"), col("ta")))
              .as("es"))))
        val vfin = expr(s"""
          aggregate(sequence(1, 8),
            transform(sts, st -> ${S}L div CAST(size(sts) AS BIGINT)),
            (acc, it) -> element_at(
              transform(
                array(transform(sts, st ->
                  aggregate(filter(es, e -> e.b = st), 0L,
                    (s, e) -> s + (element_at(acc,
                        CAST(array_position(sts, e.a) AS INT)) * e.n)
                      div e.ta))),
                xs -> transform(xs, xv ->
                  (xv * ${S}L) div aggregate(xs, 0L, (s, v) -> s + v))),
              1))""")
        val pi = packed.withColumn("vfin", vfin)
          .select(explode(arrays_zip(col("sts"), col("vfin"))).as("z"))
          .select(col("z.sts").as("t"), col("z.vfin").as("pq"))
        val rowH = trans
          .select(col("a"),
            floor((-(col("n").cast("double") / col("ta").cast("double"))
              * log(col("n").cast("double") / col("ta").cast("double")))
              * lit(1e12) + lit(0.5)).cast("long").as("hc"))
          .groupBy(col("a")).agg(sum(col("hc")).as("hq"))
        pi.join(rowH, pi("t") === rowH("a"), "left")
          .select(col("t").as("event_type"),
            Num.r6(col("pq").cast("double") / lit(S.toDouble)).as("pi"),
            Num.r6(coalesce(col("hq"), lit(0L)).cast("double") / lit(1e12))
              .as("h_row"),
            Num.r6(col("pq").cast("double") / lit(S.toDouble)
              * coalesce(col("hq"), lit(0L)).cast("double") / lit(1e12))
              .as("h_contrib"))
          .orderBy(col("event_type"))
      },
      Some {
        // every CTE in the chain is MATERIALIZED: DuckDB would otherwise
        // inline p_i into each of its references and re-evaluate the
        // whole event-sequence window 2^8 times (q126's lesson)
        def round(i: Int): String = {
          val p = i - 1
          s"""x$i AS MATERIALIZED (
                SELECT t.b AS t, CAST(SUM((p.pq * t.n) // t.ta) AS BIGINT) AS x
                FROM trans t JOIN p$p p ON p.t = t.a GROUP BY t.b),
          tx$i AS MATERIALIZED (SELECT SUM(x) AS tx FROM x$i),
          p$i AS MATERIALIZED (
                SELECT ty.t,
                  CAST(COALESCE((x.x * 1000000000) // t.tx, 0) AS BIGINT) AS pq
                FROM types ty LEFT JOIN x$i x ON x.t = ty.t
                CROSS JOIN tx$i t)"""
        }
        s"""
        WITH seq AS (
          SELECT event_type AS a,
            LEAD(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS b
          FROM events),
        cnt AS MATERIALIZED (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM seq
          WHERE b IS NOT NULL GROUP BY a, b),
        tot AS (SELECT a, CAST(SUM(n) AS BIGINT) AS ta FROM cnt GROUP BY a),
        trans AS MATERIALIZED (SELECT c.a, c.b, c.n, t.ta
                               FROM cnt c JOIN tot t USING (a)),
        types AS MATERIALIZED (SELECT DISTINCT a AS t FROM trans),
        p0 AS MATERIALIZED (
          SELECT t, 1000000000 // (SELECT COUNT(*) FROM types) AS pq
          FROM types),
        ${(1 to 8).map(round).mkString(",\n        ")},
        rowh AS (
          SELECT a, CAST(SUM(CAST(FLOOR((-(CAST(n AS DOUBLE) / ta)
            * LN(CAST(n AS DOUBLE) / ta)) * 1e12 + 0.5) AS BIGINT)) AS BIGINT)
            AS hq
          FROM trans GROUP BY a)
        SELECT p.t AS event_type,
          FLOOR((CAST(p.pq AS DOUBLE) / 1000000000) * 1000000 + 0.500001)
            / 1000000 AS pi,
          FLOOR((CAST(COALESCE(r.hq, 0) AS DOUBLE) / 1e12) * 1000000 + 0.500001)
            / 1000000 AS h_row,
          FLOOR((CAST(p.pq AS DOUBLE) / 1000000000
                 * CAST(COALESCE(r.hq, 0) AS DOUBLE) / 1e12)
                * 1000000 + 0.500001) / 1000000 AS h_contrib
        FROM p8 p LEFT JOIN rowh r ON r.a = p.t
        ORDER BY event_type"""
      },
      "Stationary distribution and entropy rate of the event-type Markov chain: 8 integer power-iteration rounds, divide-before-sum contributions, pico-quantized row entropies"))
}
