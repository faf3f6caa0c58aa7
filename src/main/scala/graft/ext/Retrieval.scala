package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-side operators for a training-data pipeline: BM25 scoring
  * (the standard lexical-retrieval baseline — used in practice to mine
  * hard negatives and to dedupe against benchmark queries) and one BPE
  * merge step (the inner loop of tokenizer training). Both follow the
  * corpus-pass-then-small-side shape: one linear pass over tokens, all
  * quadratic-ish work confined to the vocabulary-sized frame.
  */
object Retrieval {

  private def toks = split(col("text"), " ")

  /** Fixed query-term set for the BM25 oracle (present in the synthetic
    * vocabulary; the operator itself is term-set-generic). */
  private val Terms = Seq("join", "scan", "window")

  /** Per-doc BM25 against [[Terms]] as exact integers:
    * (doc_id, n_terms, bm25_micro). Shared by q109 (scoring) and q120
    * (hybrid fusion); see q109's scaladoc for the exactness argument. */
  private[ext] def bm25Micro(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks).as("t"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("t_tokens")) // 1 row
    val qtok = tok.filter(col("t").isin(Terms: _*))
    val dft = qtok.select(col("doc_id"), col("t")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("df")) // |terms| rows
    val tf = qtok.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val idf = dft.crossJoin(broadcast(stats))
      .select(col("t"), col("n_docs"), col("t_tokens"),
        floor(log((col("n_docs") - col("df") + lit(0.5))
            / (col("df") + lit(0.5)) + lit(1.0)) * 1000000
          + lit(0.500001)).cast("long").as("idf_micro"))
    tf.join(broadcast(idf), Seq("t"))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"),
        floor((col("idf_micro") / lit(1000000.0))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25)
              + lit(0.75) * (col("dl").cast("double") * col("n_docs"))
                / col("t_tokens"))) * 1000000
          + lit(0.500001)).cast("long").as("st_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("st_micro")).as("bm25_micro"))
  }

  /** The DuckDB CTE chain mirroring [[bm25Micro]], ending in
    * `bm(doc_id, n_terms, bm25_micro)`. */
  /** DCG position discounts 1/log2(pos+1) for pos 1..10 as PRE-
    * computed integer micro-literals — no runtime transcendental, so
    * q216's DCG sums are exact int64 on both engines. floor(1e6/
    * log2(pos+1) + 0.5), pinned by RetrievalEvalSpec. */
  private[graft] val DcgW: Seq[(Int, Long)] = Seq(
    1 -> 1000000L, 2 -> 630930L, 3 -> 500000L, 4 -> 430677L,
    5 -> 386853L, 6 -> 356207L, 7 -> 333333L, 8 -> 315465L,
    9 -> 301030L, 10 -> 289065L)

  /** [[DcgW]] as a 10-row broadcastable frame (pos, wq). */
  private[ext] def dcgWeights(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    DcgW.toDF("pos", "wq")
  }

  /** [[DcgW]] as a SQL VALUES body: `(1, 1000000), (2, 630930), …`. */
  private[ext] val sqlDcgWeights: String =
    DcgW.map { case (p, w) => s"($p, ${w}::BIGINT)" }.mkString(", ")

  private[ext] val bm25Ctes: String = """
        tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl),
        qtok AS (SELECT doc_id, t FROM tok WHERE t IN ('join','scan','window')),
        dft AS (SELECT t, COUNT(*) AS df
                FROM (SELECT DISTINCT doc_id, t FROM qtok) GROUP BY t),
        tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM qtok GROUP BY doc_id, t),
        idf AS (
          SELECT t, n_docs, t_tokens,
            CAST(FLOOR(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1000000
                       + 0.500001) AS BIGINT) AS idf_micro
          FROM dft CROSS JOIN stats),
        st AS (
          SELECT tf.doc_id,
            CAST(FLOOR((idf_micro / 1000000.0)
                * (tf * 2.2)
                / (tf + 1.2 * (0.25
                  + 0.75 * (CAST(dl AS DOUBLE) * n_docs) / t_tokens)) * 1000000
              + 0.500001) AS BIGINT) AS st_micro
          FROM tf JOIN idf USING (t) JOIN dl ON dl.doc_id = tf.doc_id),
        bm AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
            CAST(SUM(st_micro) AS BIGINT) AS bm25_micro
          FROM st GROUP BY doc_id)"""

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q433
    // RM3 pseudo-relevance feedback (Lavrenko & Croft relevance models,
    // the standard public query-expansion recipe): take the top-10
    // BM25 documents as the feedback set, estimate the relevance model
    // P(w|R) ∝ Σ_d P(w|d)·score(d), and emit the top-15 expansion
    // terms (original query terms excluded). Exactness: P(w|d) is the
    // integer division tf·1e6 div dl (exact on both engines), each
    // contribution multiplies the integer micro BM25 score (≤ 2e13 per
    // pair — safely int64), the numerator is an integer sum, and the
    // shared denominator Σ score·1e6 divides ONCE into a double both
    // engines compute from identical ints. Ranking/ties ride the exact
    // integer numerator, never the rounded weight. 100 TB shape: the
    // feedback set is a TakeOrdered(10) (never a global window), its
    // tokens arrive via a 10-row broadcast join, and the term aggregate
    // is narrow (term, int) rows.
    Query(
      "q433_rm3_expansion",
      (s, d) => {
        val top = bm25Micro(s, d)
          .orderBy(col("bm25_micro").desc, col("doc_id")).limit(10)
          .select(col("doc_id"), col("bm25_micro"))
        val ttok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("term"))
          .join(broadcast(top), Seq("doc_id"))
        val tf = ttok.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"), first(col("bm25_micro")).as("sc"))
        val dlt = ttok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val den = top.agg((sum(col("bm25_micro")) * lit(1000000L)).as("denom"))
        tf.join(broadcast(dlt), Seq("doc_id"))
          .filter(!col("term").isin(Terms: _*))
          .select(col("term"),
            (expr("tf * 1000000L div dl") * col("sc")).as("c"))
          .groupBy(col("term")).agg(sum(col("c")).as("w_num"))
          .crossJoin(broadcast(den))
          .select(col("term"), col("w_num"),
            Num.r6(col("w_num").cast("double") / col("denom").cast("double"))
              .as("rm_weight"))
          .orderBy(col("w_num").desc, col("term")).limit(15)
      },
      Some(s"""
        WITH $bm25Ctes,
        top10 AS (
          SELECT doc_id, bm25_micro FROM bm
          ORDER BY bm25_micro DESC, doc_id LIMIT 10),
        ttok AS (
          SELECT tok.doc_id, tok.t AS term, top10.bm25_micro
          FROM tok JOIN top10 USING (doc_id)),
        ftf AS (
          SELECT doc_id, term, COUNT(*) AS tf, MIN(bm25_micro) AS sc
          FROM ttok GROUP BY doc_id, term),
        dlt AS (SELECT doc_id, COUNT(*) AS dl FROM ttok GROUP BY doc_id),
        den AS (
          SELECT CAST(SUM(bm25_micro) * 1000000 AS BIGINT) AS denom
          FROM top10),
        nums AS (
          SELECT term,
            CAST(SUM((ftf.tf * 1000000 // dlt.dl) * ftf.sc) AS BIGINT) AS w_num
          FROM ftf JOIN dlt USING (doc_id)
          WHERE term NOT IN ('join', 'scan', 'window')
          GROUP BY term)
        SELECT term, w_num,
          ${Num.sql("CAST(w_num AS DOUBLE) / CAST(denom AS DOUBLE)", 6)} AS rm_weight
        FROM nums CROSS JOIN den
        ORDER BY w_num DESC, term LIMIT 15"""),
      "RM3 pseudo-relevance-feedback expansion terms: top-10 BM25 feedback set, integer-exact relevance-model weights, query terms excluded"),

    // --------------------------------------------------------------- q109
    // Okapi BM25 (k1=1.2, b=0.75) of every document against a fixed
    // query-term set. Cross-engine exactness: idf goes through ln(),
    // which is not correctly-rounded, so it is quantized to integer
    // micro-nats with the shared ulp-absorbing floor cut BEFORE any
    // arithmetic that mixes terms; the tf saturation factor is pure
    // IEEE +,*,/ on identical inputs (dl, N, T are integers), so it is
    // bit-identical across engines; per-term scores are quantized to
    // integer micro-units so the per-doc sum is order-independent.
    // 100 TB shape: doc lengths and term stats are one partial-agg
    // token pass; df/idf is a |terms|-row broadcast; no shuffle wider
    // than (doc_id) — the classic distributed BM25 plan.
    Query(
      "q109_bm25",
      (s, d) => bm25Micro(s, d)
        .select(col("doc_id"), col("n_terms"),
          Num.r4(col("bm25_micro") / lit(1000000.0)).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")),
      Some(s"""
        WITH $bm25Ctes
        SELECT doc_id, n_terms,
          ${Num.sql("bm25_micro / 1000000.0", 4)} AS bm25
        FROM bm ORDER BY bm25 DESC, doc_id"""),
      "Okapi BM25 (k1=1.2, b=0.75) vs a fixed term set: micro-nat-quantized idf + micro-quantized per-term scores keep ln() and the per-doc sum cross-engine exact"),

    // --------------------------------------------------------------- q110
    // One BPE merge step: the weighted count of adjacent character
    // pairs inside words — the statistic whose argmax picks the next
    // merge in byte-pair-encoding tokenizer training. The pair
    // explosion runs over the DISTINCT vocabulary weighted by word
    // frequency, not over the corpus: exactly how BPE training scales
    // (corpus-sized work is one frequency pass; the per-iteration work
    // is vocab-sized). Integer counts — exact everywhere.
    Query(
      "q110_bpe_merge",
      (s, d) => {
        val wf = Tables.documents(s, d)
          .select(explode(toks).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("n"))
          .filter(length(col("w")) >= 2)
        wf.select(col("n"),
            explode(expr(
              "transform(sequence(1, length(w)-1), i -> substring(w, i, 2))"))
              .as("pair"))
          .groupBy(col("pair")).agg(sum(col("n")).as("n_pair"))
          .orderBy(col("n_pair").desc, col("pair"))
          .limit(30)
      },
      Some("""
        WITH tok AS (
          SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        wf AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
        p AS (
          SELECT n, unnest([substring(w, CAST(i AS INT), 2)
                            FOR i IN range(1, LEN(w))]) AS pair
          FROM wf WHERE LEN(w) >= 2)
        SELECT pair, CAST(SUM(n) AS BIGINT) AS n_pair
        FROM p GROUP BY pair ORDER BY n_pair DESC, pair LIMIT 30"""),
      "one BPE tokenizer-training merge step: frequency-weighted adjacent char-pair counts over the distinct vocabulary (vocab-sized, not corpus-sized, per-iteration work)"),

    // --------------------------------------------------------------- q117
    // Per-source hapax share: the fraction of token occurrences that
    // are corpus hapax legomena (appear exactly once anywhere). High
    // hapax share flags noisy/OCR-garbage sources; near-zero flags
    // templated ones — a standard lexical-novelty audit next to
    // entropy (q112). Scale: one corpus frequency pass, then one
    // token-key shuffle joining occurrences to their corpus count —
    // integer counts throughout, one r4 at the end.
    Query(
      "q117_hapax_share",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("source"), explode(toks).as("t"))
        val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
        tok.join(freq, Seq("t"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("n") === 1, 1)).as("n_hapax"))
          .select(col("source"), col("n_tokens"), col("n_hapax"),
            Num.r4(col("n_hapax") / col("n_tokens").cast("double"))
              .as("hapax_rate"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH tok AS (
          SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS n_hapax,
          ${Num.sql("COUNT(*) FILTER (WHERE n = 1) / CAST(COUNT(*) AS DOUBLE)", 4)} AS hapax_rate
        FROM tok JOIN freq USING (t)
        GROUP BY source ORDER BY source"""),
      "per-source share of corpus hapax-legomena tokens (lexical-novelty / noise audit)"),

    // --------------------------------------------------------------- q120
    // Reciprocal-rank fusion of a lexical and a semantic ranking — the
    // standard hybrid-retrieval combiner (RRF, k=60): top-100 BM25
    // docs fused with the top-100 cosine neighbors of a probe
    // embedding (doc_id and vec_id are aligned in the corpus).
    // Exactness: both ranks come from INTEGER sort keys (bm25_micro,
    // cos_micro), so rank assignment can't flip on float ulps; the RRF
    // score is two exact divisions added in a fixed written order.
    // Scale: each arm ends in a bounded top-k (TakeOrdered); the
    // 100-row rank windows are k-sized by construction. At corpus
    // scale the semantic arm's exhaustive scan is replaced by the ANN
    // lists (q39/q78) — the fusion plan is unchanged.
    Query(
      "q120_rrf_fusion",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val lexTop = bm25Micro(s, d)
          .orderBy(col("bm25_micro").desc, col("doc_id")).limit(100)
          .withColumn("rank_lex", row_number().over(
            Window.orderBy(col("bm25_micro").desc, col("doc_id"))))
          .select(col("doc_id"), col("rank_lex"))
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
        val probe = broadcast(emb.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val semTop = emb.crossJoin(probe).filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            floor(Similarity.cosine(col("v"), col("qv")) * 1000000
              + lit(0.500001)).cast("long").as("cos_micro"))
          .orderBy(col("cos_micro").desc, col("vec_id")).limit(100)
          .withColumn("rank_sem", row_number().over(
            Window.orderBy(col("cos_micro").desc, col("vec_id"))))
          .select(col("vec_id").as("doc_id"), col("rank_sem"))
        lexTop.join(semTop, Seq("doc_id"), "full_outer")
          .select(col("doc_id"), col("rank_lex"), col("rank_sem"),
            Num.r6(
              coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60) + col("rank_sem")), lit(0.0)))
              .as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id")).limit(50)
      },
      Some(s"""
        WITH $bm25Ctes,
        lexr AS (
          SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY bm25_micro DESC, doc_id) AS BIGINT) AS rank_lex
          FROM bm QUALIFY rank_lex <= 100),
        emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings),
        probe AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
        sem AS (
          SELECT vec_id,
            CAST(FLOOR(
              (list_sum([v[i] * qv[i] FOR i IN range(1, 65)])
               / (sqrt(list_sum([x * x FOR x IN v]))
                  * sqrt(list_sum([x * x FOR x IN qv])))) * 1000000
              + 0.500001) AS BIGINT) AS cos_micro
          FROM emb CROSS JOIN probe WHERE vec_id <> 0),
        semr AS (
          SELECT vec_id AS doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY cos_micro DESC, vec_id) AS BIGINT) AS rank_sem
          FROM sem QUALIFY rank_sem <= 100)
        SELECT doc_id, rank_lex, rank_sem,
          ${Num.sql("COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_lex), CAST(0 AS DOUBLE)) + COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_sem), CAST(0 AS DOUBLE))", 6)} AS rrf
        FROM lexr l FULL OUTER JOIN semr r USING (doc_id)
        ORDER BY rrf DESC, doc_id LIMIT 50"""),
      "reciprocal-rank fusion (k=60) of top-100 BM25 and top-100 cosine rankings — the hybrid-retrieval combiner; integer sort keys make both rank lists cross-engine exact"),

    // --------------------------------------------------------------- q197
    // Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    // Lafferty 2001, µ=300) — the language-modeling IR baseline next
    // to q109's BM25: score(q,d) = Σ_t qn·ln((tf + µ·cf/N)/(dl + µ)),
    // where the smoothing term keeps zero-tf docs scoreable. Probes
    // are the first five tokens of the three lowest doc_ids (on real
    // data a shorter doc dense in those terms may legitimately outrank
    // the probe doc itself; the planted spec pins self-rank with
    // distinctive vocabulary instead). Exactness:
    // each per-(doc, term) log is quantized to integer nano-nats
    // before the multiplicity-weighted sum; ranks are integer-keyed.
    // 100 TB shape: one tokenize pass feeds tf/dl/cf/N; the probe set
    // is a ≤15-row broadcast, so the score grid is |q-terms|·n rows —
    // corpus-linear, shuffled only on (doc_id, term).
    Query(
      "q197_qlm_retrieval",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
          .localCheckpoint() // one pass feeds tf, dl, cf and N
        val tf = tok.groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val len = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val cf = tok.groupBy(col("t")).agg(count(lit(1)).as("cf"))
        val ntot = tok.agg(count(lit(1)).as("n"))
        val probes = Tables.documents(s, d).orderBy(col("doc_id")).limit(3)
          .select(col("doc_id").as("query_id"), explode(slice(toks, 1, 5)).as("t"))
          .groupBy(col("query_id"), col("t")).agg(count(lit(1)).as("qn"))
          .join(cf, Seq("t")).crossJoin(broadcast(ntot))
          .localCheckpoint() // ≤15 bounded rows
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sq").desc, col("doc_id"))
        len.crossJoin(broadcast(probes))
          .join(tf, Seq("doc_id", "t"), "left")
          .select(col("query_id"), col("doc_id"), col("qn"),
            floor(log((coalesce(col("tf"), lit(0L)) +
                lit(300.0) * col("cf") / col("n")) / (col("dl") + lit(300.0)))
              * lit(1e9) + lit(0.5)).cast("long").as("q"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg(sum(col("qn") * col("q")).as("sq"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 10)
          .select(col("query_id"), col("rank"), col("doc_id"),
            Num.r4(col("sq").cast("double") / lit(1e9)).as("qlm_score"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
               FROM tok GROUP BY doc_id, t),
        len AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
                FROM tok GROUP BY doc_id),
        cf AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cf FROM tok GROUP BY t),
        nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
        pr AS (
          SELECT doc_id AS query_id, unnest(string_split(text, ' ')[1:5]) AS t
          FROM (SELECT * FROM documents ORDER BY doc_id LIMIT 3)),
        probes AS (
          SELECT query_id, t, CAST(COUNT(*) AS BIGINT) AS qn
          FROM pr GROUP BY query_id, t),
        grid AS (
          SELECT p.query_id, l.doc_id, p.qn,
            CAST(FLOOR(LN((COALESCE(tf.tf, 0) + 300.0 * cf.cf / nt.n)
                          / (l.dl + 300.0)) * 1e9 + 0.5) AS BIGINT) AS q
          FROM probes p JOIN cf USING (t) CROSS JOIN nt
          CROSS JOIN len l
          LEFT JOIN tf ON tf.doc_id = l.doc_id AND tf.t = p.t),
        sc AS (
          SELECT query_id, doc_id, SUM(qn * q) AS sq
          FROM grid GROUP BY query_id, doc_id),
        ranked AS (
          SELECT query_id, doc_id, sq, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY sq DESC, doc_id) AS BIGINT) AS rank
          FROM sc)
        SELECT query_id, rank, doc_id,
          FLOOR((CAST(sq AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS qlm_score
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank"""),
      "query-likelihood retrieval with Dirichlet smoothing (mu=300): nano-nat per-term logs, probe docs from the corpus, top-10 per probe"),

    // --------------------------------------------------------------- q215
    // Ranker agreement: Kendall τ between the BM25 (q109) and
    // Dirichlet-QLM (q197's model, same fixed term set) top-100
    // rankings — the diagnostic that tells a hybrid-retrieval stack
    // (q120) whether its two signals actually disagree enough to be
    // worth fusing (τ → 1 means the second ranker adds nothing).
    // Both rankings are integer-keyed (micro/nano scores,
    // row_number over a TakeOrdered-bounded 100-row list); the pair
    // scan is the bounded m² intersection join. Ranks are distinct by
    // construction, so τ = (C − D) / (m(m−1)/2) needs no tie terms.
    Query(
      "q215_ranker_agreement",
      (s, d) => {
        val wLex = Window.orderBy(col("bm25_micro").desc, col("doc_id"))
        val lex = bm25Micro(s, d)
          .orderBy(col("bm25_micro").desc, col("doc_id")).limit(100)
          .withColumn("r1", row_number().over(wLex).cast("long"))
          .select(col("doc_id"), col("r1"))
          .localCheckpoint() // bounded 100-row list (rank after limit)
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
          .localCheckpoint()
        val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val cf = tok.filter(col("t").isin("join", "scan", "window"))
          .groupBy(col("t")).agg(count(lit(1)).as("cf"))
        val ntot = tok.agg(count(lit(1)).as("n"))
        val tf = tok.filter(col("t").isin("join", "scan", "window"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
        val qlmScore = dl.crossJoin(broadcast(cf.crossJoin(broadcast(ntot))))
          .join(tf, Seq("doc_id", "t"), "left")
          .select(col("doc_id"),
            floor(log((coalesce(col("tf"), lit(0L)) +
                lit(300.0) * col("cf") / col("n")) / (col("dl") + lit(300.0)))
              * lit(1e9) + lit(0.5)).cast("long").as("q"))
          .groupBy(col("doc_id")).agg(sum(col("q")).as("qlm_nano"))
        val wSem = Window.orderBy(col("qlm_nano").desc, col("doc_id"))
        val sem = qlmScore
          .orderBy(col("qlm_nano").desc, col("doc_id")).limit(100)
          .withColumn("r2", row_number().over(wSem).cast("long"))
          .select(col("doc_id"), col("r2"))
          .localCheckpoint()
        val common = lex.join(sem, Seq("doc_id")).localCheckpoint()
        val a = common.select(col("doc_id").as("i"), col("r1").as("r1i"),
          col("r2").as("r2i"))
        val b = common.select(col("doc_id").as("j"), col("r1").as("r1j"),
          col("r2").as("r2j"))
        val pairs = a.join(broadcast(b), col("i") < col("j"))
          .select((( (col("r1i") - col("r1j")) * (col("r2i") - col("r2j")) ) > 0)
            .as("conc"))
        val m = common.count() // bounded (≤100), plan-time constant
        pairs.agg(count(lit(1)).as("n_pairs"),
          count(when(col("conc"), 1)).as("concordant"))
          .select(lit(m).as("n_common"), col("n_pairs"), col("concordant"),
            (col("n_pairs") - col("concordant")).as("discordant"),
            // τ undefined when the lists share < 2 docs (can happen
            // when two rankers' top-100s are disjoint, e.g. under
            // heavy replication) — NULL, never a crash
            when(col("n_pairs") > 0,
              graft.Num.r4((col("concordant") * lit(2L) - col("n_pairs"))
                .cast("double") / col("n_pairs").cast("double")))
              .otherwise(lit(null).cast("double")).as("kendall_tau"))
      },
      Some(s"""
        WITH $bm25Ctes,
        lex AS (
          SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY bm25_micro DESC, doc_id) AS BIGINT) AS r1
          FROM bm QUALIFY r1 <= 100),
        dlq AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
                FROM tok GROUP BY doc_id),
        cfq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cf FROM tok
                WHERE t IN ('join','scan','window') GROUP BY t),
        ntq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok),
        tfq AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM tok
                WHERE t IN ('join','scan','window') GROUP BY doc_id, t),
        qs AS (
          SELECT d.doc_id,
            SUM(CAST(FLOOR(LN((COALESCE(tf, 0) + 300.0 * cf / n)
                              / (dl + 300.0)) * 1e9 + 0.5) AS BIGINT)) AS qlm_nano
          FROM dlq d CROSS JOIN cfq CROSS JOIN ntq
          LEFT JOIN tfq ON tfq.doc_id = d.doc_id AND tfq.t = cfq.t
          GROUP BY d.doc_id),
        sem AS (
          SELECT doc_id, CAST(ROW_NUMBER() OVER (
            ORDER BY qlm_nano DESC, doc_id) AS BIGINT) AS r2
          FROM qs QUALIFY r2 <= 100),
        common AS (SELECT doc_id, r1, r2 FROM lex JOIN sem USING (doc_id)),
        pairs AS (
          SELECT ((a.r1 - b.r1) * (a.r2 - b.r2)) > 0 AS conc
          FROM common a JOIN common b ON a.doc_id < b.doc_id)
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM common) AS n_common,
          CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(COUNT(*) FILTER (WHERE conc) AS BIGINT) AS concordant,
          CAST(COUNT(*) FILTER (WHERE NOT conc) AS BIGINT) AS discordant,
          CASE WHEN COUNT(*) > 0 THEN
            FLOOR((CAST(COUNT(*) FILTER (WHERE conc) * 2 - COUNT(*) AS DOUBLE)
                   / COUNT(*)) * 10000 + 0.500001) / 10000
          ELSE NULL END AS kendall_tau
        FROM pairs"""),
      "Kendall tau between BM25 and QLM top-100 rankings over the shared term set: bounded pair scan, hybrid-fusion diagnostic"))
}
