package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for a training-data pipeline: intra-doc
  * repetition scoring (Gopher-style quality signal) and token-window
  * chunking (context-length packing prep). Both are narrow per-row
  * transforms — no shuffle beyond the final presentation sort, linear
  * output, embarrassingly parallel at 100 TB.
  */
object Corpus {

  private def toks = split(col("text"), " ")

  /** Per-doc repetition metrics (n_tokens, n_bigrams, n_distinct_bigrams,
    * top_token_n) in ONE shuffle: posexplode, hash-exchange on doc_id,
    * then everything as window functions over that single partitioning —
    * lead(pos) for bigrams, count over (doc_id) / (doc_id, t) for token
    * tallies, and max(dense_rank ORDER BY bigram) for the distinct count
    * (windowed COUNT(DISTINCT) doesn't exist; every doc has exactly one
    * null-bigram row — the last token — so rank 1 is the null group and
    * distinct = max(rank) − 1). The three window sorts are in-partition;
    * the old plan paid a second (doc_id, t) shuffle plus a join.
    * Shared by q82 and q89. */
  def repetitionMetrics(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val byTok = Window.partitionBy(col("doc_id"), col("t"))
    val byBigram = Window.partitionBy(col("doc_id")).orderBy(col("b"))
    docs.select(col("doc_id"), posexplode(toks).as(Seq("pos", "t")))
      .withColumn("b",
        when(lead(col("t"), 1).over(byPos).isNotNull,
          concat_ws(" ", col("t"), lead(col("t"), 1).over(byPos))))
      .withColumn("n_tokens", count(lit(1)).over(byDoc))
      .withColumn("n_bigrams", count(col("b")).over(byDoc))
      .withColumn("tok_n", count(lit(1)).over(byTok))
      .withColumn("dr", dense_rank().over(byBigram))
      .groupBy(col("doc_id")).agg(
        max(col("n_tokens")).as("n_tokens"),
        max(col("n_bigrams")).as("n_bigrams"),
        (max(col("dr")) - 1).as("n_distinct_bigrams"),
        max(col("tok_n")).as("top_token_n"))
  }

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q82
    // Repetition signals (Rae et al., Gopher §A1.1: "fraction of
    // duplicate n-grams"): heavily repetitive docs are low-quality
    // training data. Per doc: duplicate-bigram fraction and the share
    // of the single most frequent token. Pure per-row array math — the
    // whole operator is a narrow projection.
    Query(
      "q82_repetition",
      (s, d) => {
        // EVERYTHING via explode + codegen'd window/aggregate, nothing
        // via per-row HOF lambdas: interpreted lambda eval costs ~10 µs
        // per element and Catalyst re-inlines the array construction
        // into every use (measured 11 s → <1 s at sf0.1). See
        // [[repetitionMetrics]] for the single-shuffle plan.
        repetitionMetrics(Tables.documents(s, d))
          .select(col("doc_id"), col("n_tokens"), col("n_bigrams"),
            Num.r4(lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams"))
              .as("dup_bigram_ratio"),
            Num.r4(col("top_token_n") / col("n_tokens")).as("top_token_share"),
            (lit(1.0) - col("n_distinct_bigrams") / col("n_bigrams") > 0.5 ||
              col("top_token_n") / col("n_tokens") > 0.3).as("repetitive"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        b AS (
          SELECT doc_id, tk,
            CASE WHEN LEN(tk) >= 2
              THEN [array_to_string(tk[i:i+1], ' ') FOR i IN range(1, LEN(tk))]
              ELSE [] END AS bg
          FROM t),
        m AS (
          SELECT doc_id, LEN(tk) AS n_tokens, LEN(bg) AS n_bigrams,
            LEN(list_distinct(bg)) AS n_distinct_bigrams,
            list_max([LEN(list_filter(tk, x -> x = u)) FOR u IN list_distinct(tk)]) AS top_token_n
          FROM b)
        SELECT doc_id, n_tokens, n_bigrams,
          FLOOR((1.0 - n_distinct_bigrams / n_bigrams) * 10000 + 0.500001) / 10000 AS dup_bigram_ratio,
          FLOOR((top_token_n / n_tokens) * 10000 + 0.500001) / 10000 AS top_token_share,
          (1.0 - n_distinct_bigrams / n_bigrams > 0.5
            OR top_token_n / n_tokens > 0.3) AS repetitive
        FROM m ORDER BY doc_id"""),
      "Gopher-style repetition quality signals: duplicate-bigram fraction + top-token share, pure narrow projection"),

    // ---------------------------------------------------------------- q83
    // Token-window chunking: fixed 32-token chunks, stride 24 (8-token
    // overlap) — the standard packing prep before tokenization. One
    // explode per doc, chunk count ~ n_tokens/stride; no shuffle until
    // the presentation sort. The trailing chunk may be short (kept:
    // dropping it would lose tail tokens).
    Query(
      "q83_chunk_windows",
      (s, d) => {
        val W = 32; val S = 24
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("tk"))
          .select(col("doc_id"), col("tk"),
            explode(sequence(lit(0),
              greatest(size(col("tk")) - 1, lit(0)), lit(S))).as("start"))
          .select(col("doc_id"), (col("start") / S).cast("long").as("chunk_id"),
            col("start").cast("long").as("token_start"),
            size(slice(col("tk"), col("start") + 1, lit(W))).as("n_tokens"),
            concat_ws(" ", slice(col("tk"), col("start") + 1, lit(W))).as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        st AS (
          SELECT doc_id, tk, UNNEST(range(0, GREATEST(LEN(tk), 1), 24)) AS start
          FROM t)
        SELECT doc_id, start // 24 AS chunk_id,
          CAST(start AS BIGINT) AS token_start,
          CAST(LEN(tk[start+1 : LEAST(start+32, LEN(tk))]) AS INT) AS n_tokens,
          array_to_string(tk[start+1 : LEAST(start+32, LEN(tk))], ' ') AS chunk_text
        FROM st ORDER BY doc_id, chunk_id"""),
      "fixed-window token chunking (32-token windows, stride 24) for context packing"),

    // ---------------------------------------------------------------- q85
    // Token-budget packing: assign docs to fixed-capacity context bins
    // (512 tokens) by OFFSET binning — bin = floor(exclusive-prefix-sum
    // / capacity) within each source shard, docs in doc_id order. This
    // is the parallel-friendly packing rule (greedy first-fit needs a
    // sequential scan; offset binning is one window cumsum and matches
    // it whenever docs are small vs the capacity). Partitioned by
    // `source`, so the window sort never sees the whole corpus — at
    // 100 TB each shard's cumsum runs independently after one shuffle.
    Query(
      "q85_pack_bins",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val cap = 512
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(toks).cast("long").as("n_tok"))
          .withColumn("off", sum(col("n_tok")).over(w) - col("n_tok"))
          .groupBy(col("source"),
            (col("off") / cap).cast("long").as("bin_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
            Num.r4(sum(col("n_tok")) / lit(cap.toDouble)).as("fill_ratio"))
          .orderBy(col("source"), col("bin_id"))
      },
      Some("""
        WITH t AS (
          SELECT doc_id, source,
            CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
          FROM documents),
        c AS (
          SELECT doc_id, source, n_tok,
            CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tok AS off
          FROM t)
        SELECT source, CAST(off // 512 AS BIGINT) AS bin_id,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
          FLOOR((SUM(n_tok) / 512.0) * 10000 + 0.500001) / 10000 AS fill_ratio
        FROM c GROUP BY source, bin_id ORDER BY source, bin_id"""),
      "token-budget packing into 512-token context bins via per-source offset binning (one windowed cumsum per shard)"),

    // ---------------------------------------------------------------- q86
    // Vocabulary build + OOV audit: top-24 tokens by corpus frequency
    // (total order: count desc, token asc) become the vocab; every doc
    // reports its out-of-vocabulary token share. Two passes over the
    // token stream: a partial-aggregated frequency count with a top-k
    // reduce (vocab is the small side by construction), then a
    // broadcast left join back. The vocab broadcast is what keeps the
    // second pass shuffle-free at 100 TB.
    Query(
      "q86_vocab_oov",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
        val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("t")).limit(24)
          .select(col("t"), lit(1).as("in_vocab"))
        tok.join(broadcast(vocab), Seq("t"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            count(when(col("in_vocab").isNull, 1)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            Num.r4(col("n_oov") / col("n_tokens").cast("double")).as("oov_rate"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
        vocab AS (SELECT t FROM freq ORDER BY n DESC, t LIMIT 24)
        SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(COUNT(*) FILTER (WHERE v.t IS NULL) AS BIGINT) AS n_oov,
          FLOOR((COUNT(*) FILTER (WHERE v.t IS NULL) / CAST(COUNT(*) AS DOUBLE)) * 10000 + 0.500001) / 10000 AS oov_rate
        FROM tok LEFT JOIN vocab v USING (t)
        GROUP BY tok.doc_id ORDER BY tok.doc_id"""),
      "top-24 vocabulary build + per-doc OOV rate via broadcast vocab join"),

    // ---------------------------------------------------------------- q87
    // Inverted-index build: term -> document frequency, total term
    // frequency, and the sorted posting list of doc_ids. Linear in the
    // corpus (every (term, doc) pair appears once); the known skew point
    // at 100 TB is the hot-term posting list (one executor materializes
    // collect_list for a stopword-grade term) — the scale path is range-
    // bucketing postings by (term, doc_id div B) and concatenating
    // per-bucket lists downstream, same total bytes, bounded task state.
    Query(
      "q87_inverted_index",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("term"))
        val tf = tok.groupBy(col("term"))
          .agg(count(lit(1)).as("total_tf"))
        val post = tok.distinct()
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"),
            sort_array(collect_list(col("doc_id"))).as("plist"))
        // postings serialized to a CSV string: the driver's comparator
        // sorts rows host-side, where array cells are unhashable —
        // scalar columns keep the oracle gate applicable
        post.join(tf, Seq("term"))
          .select(col("term"), col("df"), col("total_tf"),
            expr("array_join(transform(plist, x -> cast(x as string)), ',')")
              .as("postings"))
          .orderBy(col("term"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        tf AS (SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS total_tf
               FROM tok GROUP BY t),
        dl AS (SELECT DISTINCT t AS term, doc_id FROM tok),
        post AS (
          SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
            array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
          FROM dl GROUP BY term)
        SELECT p.term, p.df, t.total_tf, p.postings
        FROM post p JOIN tf t USING (term) ORDER BY p.term"""),
      "inverted-index build: per-term df, total tf and sorted posting lists (CSV-serialized for the scalar-only oracle gate)"),

    // ---------------------------------------------------------------- q90
    // Unigram-LM surprisal — the classic perplexity-proxy quality
    // filter (docs whose tokens are improbable under the corpus unigram
    // model are noise candidates). Cross-engine exactness trick: ln()
    // is NOT IEEE-correctly-rounded, so per-token -ln p is quantized to
    // integer MICRO-NATS (floor cut with the shared ulp-absorbing
    // offset) BEFORE summation — integer sums are order-independent and
    // exact in both engines, where a double sum over an unordered group
    // would not be. Scale shape: corpus total via a broadcast 1-row
    // aggregate, surprisal table broadcast, one token pass.
    Query(
      "q90_unigram_surprisal",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(toks).as("t"))
        val freq = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
        // corpus token total as a broadcast 1-row aggregate, NOT a
        // whole-frame window: a global WindowExec would funnel the
        // entire vocabulary through one partition, and at web scale
        // the vocabulary is NOT small (every typo/number is a token)
        val surp = freq
          .crossJoin(broadcast(freq.agg(sum(col("n")).as("total"))))
          .select(col("t"),
            floor(-log(col("n") / col("total").cast("double")) * 1000000
              + lit(0.500001)).cast("long").as("s_micro"))
        tok.join(broadcast(surp), Seq("t"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("s_micro")).as("surprisal_micro_sum"))
          .select(col("doc_id"), col("n_tokens"), col("surprisal_micro_sum"),
            Num.r4(col("surprisal_micro_sum")
              / (col("n_tokens") * lit(1000000.0))).as("avg_surprisal"))
          .orderBy(col("doc_id"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
        tot AS (SELECT SUM(n) AS total FROM freq),
        surp AS (
          SELECT t, CAST(FLOOR(-LN(n / CAST(total AS DOUBLE)) * 1000000 + 0.500001) AS BIGINT) AS s_micro
          FROM freq, tot)
        SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
          CAST(SUM(s.s_micro) AS BIGINT) AS surprisal_micro_sum,
          FLOOR((SUM(s.s_micro) / (COUNT(*) * 1000000.0)) * 10000 + 0.500001) / 10000 AS avg_surprisal
        FROM tok JOIN surp s ON s.t = tok.t
        GROUP BY tok.doc_id ORDER BY tok.doc_id"""),
      "unigram-LM surprisal per doc (perplexity-proxy quality): integer micro-nat quantization before the sum keeps ln() cross-engine-exact"),

    // ---------------------------------------------------------------- q93
    // Cross-source contamination matrix: pairwise 3-gram-shingle
    // Jaccard between source shards — the audit that catches one crawl
    // slice leaking into another. Distinct (source, shingle) pairs
    // self-join on the shingle: output is source-pair-bounded (not
    // corpus-bounded), and the join key is the shingle hash space. At
    // thousands of sources you'd sketch (MinHash per source) instead of
    // exact-joining; 20 sources is exact territory.
    Query(
      "q93_source_overlap",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val ssh = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), posexplode(toks).as(Seq("pos", "t")))
          .select(col("source"), col("t"),
            lead(col("t"), 1).over(w).as("t1"), lead(col("t"), 2).over(w).as("t2"))
          .filter(col("t1").isNotNull && col("t2").isNotNull)
          .select(col("source"),
            concat_ws(" ", col("t"), col("t1"), col("t2")).as("sh"))
          .distinct()
          // round 9: tot + both self-join sides read this — without the
          // checkpoint the posexplode+lead window pipeline ran 3×
          .localCheckpoint()
        val tot = ssh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
        val inter = ssh.as("a").join(ssh.as("b"),
          col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(tot.select(col("source").as("src_a"), col("n_sh").as("n_a")), Seq("src_a"))
          .join(tot.select(col("source").as("src_b"), col("n_sh").as("n_b")), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("n_inter"),
            Num.r4(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
              .as("jaccard"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
        shraw AS (
          SELECT source, unnest([array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]) AS sh
          FROM toks),
        ssh AS (SELECT DISTINCT source, sh FROM shraw),
        tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM ssh GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_inter
          FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
          GROUP BY a.source, b.source)
        SELECT i.src_a, i.src_b, ta.n_sh AS n_a, tb.n_sh AS n_b, i.n_inter,
          FLOOR((i.n_inter / (ta.n_sh + tb.n_sh - i.n_inter)) * 10000 + 0.500001) / 10000 AS jaccard
        FROM inter i
        JOIN tot ta ON ta.source = i.src_a
        JOIN tot tb ON tb.source = i.src_b
        ORDER BY i.src_a, i.src_b"""),
      "cross-source contamination matrix: pairwise shingle Jaccard between source shards"),

    // ---------------------------------------------------------------- q94
    // Vocabulary drift: per-token KL-divergence contribution between
    // the even-doc and odd-doc halves of the corpus (standing in for
    // week-over-week crawl snapshots) with Laplace smoothing. Exactness:
    // the smoothed probabilities are ratios of exact integers (identical
    // doubles both engines); the single ln() per token is absorbed into
    // an integer pico-nat quantization of the FINAL contribution, so no
    // unordered double aggregation exists anywhere.
    Query(
      "q94_vocab_drift",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select((col("doc_id") % 2).as("half"), explode(toks).as("t"))
        val fa = tok.filter(col("half") === 0)
          .groupBy(col("t")).agg(count(lit(1)).as("n_a"))
        val fb = tok.filter(col("half") === 1)
          .groupBy(col("t")).agg(count(lit(1)).as("n_b"))
        val vocab = fa.select(col("t")).unionByName(fb.select(col("t"))).distinct()
        val v = vocab.agg(count(lit(1)).as("nv"))
        val ta = fa.agg(sum(col("n_a")).as("tot_a"))
        val tb = fb.agg(sum(col("n_b")).as("tot_b"))
        val pA = (col("n_a") + 1) / (col("tot_a") + col("nv")).cast("double")
        val pB = (col("n_b") + 1) / (col("tot_b") + col("nv")).cast("double")
        vocab.join(fa, Seq("t"), "left").join(fb, Seq("t"), "left")
          .na.fill(0L, Seq("n_a", "n_b"))
          .crossJoin(broadcast(v)).crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
          .select(col("t"), col("n_a"), col("n_b"),
            (floor(pA * 1000000 + lit(0.500001)) / 1000000).as("p_a_r6"),
            (floor(pB * 1000000 + lit(0.500001)) / 1000000).as("p_b_r6"),
            floor(pA * log(pA / pB) * 1000000000000L + lit(0.500001))
              .cast("long").as("kl_contrib_pico"))
          .orderBy(col("t"))
      },
      Some("""
        WITH tok AS (
          SELECT doc_id % 2 AS half, unnest(string_split(text, ' ')) AS t FROM documents),
        fa AS (SELECT t, COUNT(*) AS n_a FROM tok WHERE half = 0 GROUP BY t),
        fb AS (SELECT t, COUNT(*) AS n_b FROM tok WHERE half = 1 GROUP BY t),
        vocab AS (SELECT t FROM fa FULL JOIN fb USING (t)),
        v AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv FROM vocab),
        ta AS (SELECT SUM(n_a) AS tot_a FROM fa),
        tb AS (SELECT SUM(n_b) AS tot_b FROM fb),
        j AS (
          SELECT vocab.t, COALESCE(fa.n_a, 0) AS n_a, COALESCE(fb.n_b, 0) AS n_b,
            (COALESCE(fa.n_a, 0) + 1) / CAST(tot_a + nv AS DOUBLE) AS p_a,
            (COALESCE(fb.n_b, 0) + 1) / CAST(tot_b + nv AS DOUBLE) AS p_b
          FROM vocab LEFT JOIN fa USING (t) LEFT JOIN fb USING (t), v, ta, tb)
        SELECT t, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
          FLOOR(p_a * 1000000 + 0.500001) / 1000000 AS p_a_r6,
          FLOOR(p_b * 1000000 + 0.500001) / 1000000 AS p_b_r6,
          CAST(FLOOR(p_a * LN(p_a / p_b) * 1000000000000 + 0.500001) AS BIGINT) AS kl_contrib_pico
        FROM j ORDER BY t"""),
      "vocabulary drift: per-token Laplace-smoothed KL contribution between corpus halves, pico-nat integer quantization"))
}
