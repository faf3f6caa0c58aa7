package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity joins that scale WITHOUT a candidate sketch:
  * prefix filtering (the SSJoin/PPJoin family) and a sparse TF-IDF
  * postings join. These complement the probabilistic dedup paths
  * (MinHash-LSH q35, SimHash q36): LSH trades recall for speed, while
  * the prefix filter is EXACT — zero false negatives — so its output
  * is oracle-checked against a plain brute-force join.
  *
  * Both operators collapse exact-duplicate texts FIRST (representative
  * = min doc_id per distinct text — q30's grain, the repo's documented
  * production path for every pair-producing stage): verbatim
  * replication then adds ZERO pair work, because replicas collapse to
  * one representative before any join. Under the 100× verbatim
  * scale-up the pair stage is literally scale-CONSTANT (the distinct
  * corpus is unchanged); on real data it is linear in distinct
  * content. Exact-duplicate pairs themselves are q30's output, not
  * these operators' — reporting them here would only re-derive what
  * the cheaper fingerprint groupBy already knows.
  *
  * Scale shape past the collapse: the brute-force all-pairs join is
  * Θ(n²) and appears only in the ORACLE (DuckDB side, small SF). The
  * Spark side joins prefix elements only — under the rarest-first
  * global order each doc contributes n − ⌈τ·n⌉ + 1 prefix elements
  * and candidates must share a RARE element, so the candidate join is
  * near-linear on real corpora (why this family is the standard exact
  * dedup path at web scale). The TF-IDF postings join is bounded by
  * Σ_t df_t² over the MID-FREQUENCY vocabulary only (2 ≤ df ≤ N/10):
  * dropping the high-df head is the inverted-index discipline, and
  * the semantics are DEFINED over that vocabulary on both engines, so
  * the filter is the oracle's vocabulary, not an approximation of it.
  *
  * Exactness discipline (the repo-wide rules): similarity thresholds
  * are tested on INTEGER cross-multiplied forms (5·inter ≥ 3·union
  * for τ = 0.6), never on rounded doubles, so boundary pairs cannot
  * diverge between engines; TF-IDF weights are micro-quantized
  * integers; moment sums ride DECIMAL(38,0)/HUGEINT; the single
  * double division happens once at the end and is r4/r6-rounded with
  * the shared floor formula.
  */
object SetJoin {

  /** Jaccard threshold 3/5 as an exact integer predicate (shared with
    * the streaming twin, [[graft.streaming.StreamingSetJoin]]). */
  private[graft] val TauNum = 3L
  private[graft] val TauDen = 5L

  /** Exact-duplicate collapse: one representative (min doc_id) per
    * distinct text. One wide shuffle on the text column — the same
    * cost class as the shingle explode that follows it. */
  private def reps(docs: org.apache.spark.sql.DataFrame) =
    docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))

  private val sqlReps =
    "reps AS (SELECT MIN(doc_id) AS doc_id, text FROM documents GROUP BY text)"

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q435
    // Prefix-filtered exact near-dup join (PPJoin-lite) over the
    // rep-collapsed corpus: distinct hashed 3-gram shingle sets;
    // global rarest-first element order (df asc, hash asc); per-doc
    // prefix of length n − ⌈3n/5⌉ + 1; candidates = pairs sharing a
    // prefix element AND passing the length filter 5·min(n_a,n_b) ≥
    // 3·max(n_a,n_b); exact Jaccard verification on candidates only;
    // keep 5·inter ≥ 3·union. Prefix-filter completeness (Chaudhuri
    // et al., ICDE'06): two sets with overlap ≥ α share an element of
    // their (len − α + 1)-prefixes under any common total order;
    // J ≥ 3/5 gives α = max(⌈3n_a/5⌉, ⌈3n_b/5⌉) ≤ |A∩B|, and the
    // per-doc prefixes are at least that long — so the result EQUALS
    // the brute-force join, which is exactly what the oracle runs.
    Query(
      "q435_prefix_filter_join",
      (s, d) => {
        // materialize the hashed shingle sets ONCE: the plan reuses them
        // four times (df, prefix ranking, and both sides of the Jaccard
        // verification) and re-deriving them means four raw-text scans +
        // explodes — localCheckpoint cuts that to one, the same
        // discipline as q35's session cache and the Graph backbone
        val hashed = Dedup.docShingles(reps(Tables.documents(s, d)))
          .select(col("doc_id"), Dedup.hp(col("sh")).as("sh"))
          .distinct() // set semantics even under (improbable) mod-P collisions
          .localCheckpoint()
        val dfreq = hashed.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        // per-doc size rides the SAME doc_id exchange as the prefix rank
        // (an unordered count window, not a separate aggregate + join)
        val byDoc = Window.partitionBy(col("doc_id"))
        val pref = hashed.join(dfreq, "sh")
          .withColumn("rk", row_number().over(byDoc.orderBy(col("df"), col("sh"))))
          .withColumn("n", count(lit(1)).over(byDoc))
          .filter(col("rk") <= col("n") - expr(s"($TauNum * n + ${TauDen - 1}) div $TauDen") + 1)
          .select(col("doc_id"), col("sh"), col("rk"), col("n"))
          // both sides of the candidate self-join read this frame; without
          // a checkpoint Spark re-derives the df-join + double window per
          // side (the executed plan showed the subtree four times)
          .localCheckpoint()
        // positional filter (the PPJoin refinement): a matching prefix
        // element at ranks (rk_a, rk_b) can lead to overlap at most
        // min(n_a - rk_a, n_b - rk_b) + 1; J >= 3/5 forces overlap >=
        // ceil(3(n_a+n_b)/8) (O >= tau/(1+tau)*(n_a+n_b)), and the FIRST
        // shared element of a qualifying pair satisfies the bound, so
        // keeping pairs where ANY match passes loses nothing. Cuts the
        // candidate set ~3x at sf0.1 (193k -> 69k) before the distinct.
        val cand = pref.select(col("doc_id").as("doc_a"), col("sh"),
            col("rk").as("rk_a"), col("n").as("n_a"))
          .join(pref.select(col("doc_id").as("doc_b"), col("sh"),
            col("rk").as("rk_b"), col("n").as("n_b")), Seq("sh"))
          .filter(col("doc_a") < col("doc_b") &&
            least(col("n_a"), col("n_b")) * TauDen >=
              greatest(col("n_a"), col("n_b")) * TauNum &&
            least(col("n_a") - col("rk_a"), col("n_b") - col("rk_b")) + 1 >=
              expr(s"($TauNum * (n_a + n_b) + ${TauNum + TauDen - 1}) div ${TauNum + TauDen}"))
          .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b")).distinct()
        // verification via per-doc shingle ARRAYS (bounded by doc length),
        // not an exploded pair×shingle join: the candidate set is ~40% of
        // a sf0.1-sized corpus squared in the worst near-dup clusters, and
        // exploding each pair to its shingle rows cost ~10M intermediate
        // rows where this costs one merge pass per candidate.
        // round 10 (guide §1.2 step 2, per-task work): sort each doc's
        // set ONCE (amortized over all its candidate pairs) and count
        // the intersection with the codegen'd two-pointer merge —
        // array_intersect built an OpenHashSet per candidate pair
        // (allocation + hashing of every element, per pair). Counts are
        // identical on these duplicate-free sets.
        val sets = hashed.groupBy(col("doc_id"))
          .agg(sort_array(collect_list(col("sh"))).as("shs"))
        val inter = graft.functions.SetFunctions
          .sortedIntersectCount(col("sa"), col("sb"))
        cand
          .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), Seq("doc_a"))
          .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), Seq("doc_b"))
          .withColumn("n_inter", inter)
          .filter(col("n_inter") * TauDen >=
            (col("n_a") + col("n_b") - col("n_inter")) * TauNum)
          .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"),
            Num.r4(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
              .as("jaccard"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $sqlReps,
        ${Dedup.sqlDocShinglesFrom("reps")},
        h AS (SELECT DISTINCT doc_id, ${Dedup.sqlHp("sh")} AS sh FROM sh),
        counts AS (SELECT doc_id, COUNT(*) AS n FROM h GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
          FROM h a JOIN h b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b, i.n_inter, ca.n AS n_a, cb.n AS n_b,
          FLOOR((i.n_inter / (ca.n + cb.n - i.n_inter)) * 10000 + 0.500001) / 10000 AS jaccard
        FROM inter i
        JOIN counts ca ON ca.doc_id = i.doc_a
        JOIN counts cb ON cb.doc_id = i.doc_b
        WHERE i.n_inter * $TauDen >= (ca.n + cb.n - i.n_inter) * $TauNum
        ORDER BY doc_a, doc_b"""),
      "prefix-filtered EXACT Jaccard >= 0.6 join over the rep-collapsed corpus (rarest-first prefixes + length filter); oracle is the brute-force join the filter provably equals"),

    // ---------------------------------------------------------------- q436
    // Sparse TF-IDF top-k doc-doc cosine via the inverted index, over
    // the rep-collapsed corpus: only docs sharing a mid-frequency term
    // (2 <= df, 10*df <= N over distinct texts) are ever joined;
    // weights w = tf * round(ln(N/df)*1e6) are exact integers;
    // numerators and squared norms are DECIMAL(38,0)/HUGEINT moment
    // sums; the one double division is r6-rounded; top-3 neighbors per
    // doc by (cosine desc, neighbor id) under a doc-partitioned window.
    Query(
      "q436_sparse_topk_cosine",
      (s, d) => {
        val rep = reps(Tables.documents(s, d))
        val tf = rep
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val nDocs = rep.agg(count(lit(1)).as("n_docs"))
        val vocab = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
          .crossJoin(broadcast(nDocs)) // 1-row scalar frame (driver algebra)
          .filter(col("df") >= 2 && col("df") * 10 <= col("n_docs"))
          .select(col("t"),
            // 0.500001, not 0.5: Spark (java Math.log) and DuckDB (libm)
            // may differ by 1 ulp on ln; a bare .5 boundary would then
            // flip idfq by 1 between engines and cascade into the cosine
            // hash — same epsilon discipline as Num.r4/r6
            floor(log(col("n_docs").cast("double") / col("df").cast("double"))
              * lit(1e6) + lit(0.500001)).cast("long").as("idfq"))
        val post = tf.join(vocab, "t")
          .select(col("doc_id"), col("t"), (col("tf") * col("idfq")).as("w"))
        val norms = post.groupBy(col("doc_id"))
          .agg(Exact.m2("w", "w").as("norm2"))
          .select(col("doc_id"), sqrt(col("norm2").cast("double")).as("nrm"))
        val num = post.as("a")
          .join(post.as("b"),
            col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
            col("a.w").as("wa"), col("b.w").as("wb"))
          .groupBy(col("da"), col("db"))
          .agg(Exact.m2("wa", "wb").as("num"))
        val sym = num.select(col("da"), col("db"), col("num"))
          .union(num.select(col("db").as("da"), col("da").as("db"), col("num")))
        val scored = sym
          .join(norms.select(col("doc_id").as("da"), col("nrm").as("nrm_a")), Seq("da"))
          .join(norms.select(col("doc_id").as("db"), col("nrm").as("nrm_b")), Seq("db"))
          .select(col("da").as("doc_id"), col("db").as("neighbor"),
            Num.r6(col("num").cast("double") / (col("nrm_a") * col("nrm_b")))
              .as("cosine"))
        val topk = Window.partitionBy(col("doc_id"))
          .orderBy(col("cosine").desc, col("neighbor"))
        scored.withColumn("rk", row_number().over(topk))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("neighbor"), col("cosine"))
          .orderBy(col("doc_id"), col("rk"))
      },
      Some(s"""
        WITH $sqlReps,
        toks AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM reps),
        tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM toks GROUP BY doc_id, t),
        nd AS (SELECT COUNT(*) AS n_docs FROM reps),
        vocab AS (
          SELECT t, CAST(FLOOR(LN(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.500001) AS BIGINT) AS idfq
          FROM (SELECT t, COUNT(*) AS df FROM tf GROUP BY t), nd
          WHERE df >= 2 AND df * 10 <= n_docs),
        post AS (
          SELECT f.doc_id, f.t, f.tf * v.idfq AS w FROM tf f JOIN vocab v USING (t)),
        norms AS (
          SELECT doc_id, SQRT(CAST(SUM(CAST(w AS HUGEINT) * w) AS DOUBLE)) AS nrm
          FROM post GROUP BY doc_id),
        num AS (
          SELECT a.doc_id AS da, b.doc_id AS db, SUM(CAST(a.w AS HUGEINT) * b.w) AS num
          FROM post a JOIN post b ON a.t = b.t AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        sym AS (
          SELECT da, db, num FROM num
          UNION ALL SELECT db AS da, da AS db, num FROM num),
        scored AS (
          SELECT p.da AS doc_id, p.db AS neighbor,
            FLOOR((CAST(p.num AS DOUBLE) / (na.nrm * nb.nrm)) * 1000000 + 0.500001) / 1000000 AS cosine
          FROM sym p
          JOIN norms na ON na.doc_id = p.da
          JOIN norms nb ON nb.doc_id = p.db),
        ranked AS (
          SELECT doc_id, neighbor, cosine,
            ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cosine DESC, neighbor) AS rk
          FROM scored)
        SELECT doc_id, rk, neighbor, cosine FROM ranked WHERE rk <= 3
        ORDER BY doc_id, rk"""),
      "sparse TF-IDF top-3 doc-doc cosine via inverted-index postings join over the rep-collapsed corpus's mid-frequency vocabulary (exact integer weights, DECIMAL/HUGEINT moments)"))
}
