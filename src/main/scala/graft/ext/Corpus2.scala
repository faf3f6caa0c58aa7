package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 corpus operators: character-n-gram Jaccard near-dup pairs,
  * deterministic weighted sampling (Efraimidis–Spirakis A-ES with a
  * hash-derived uniform), sqrt-temperature source mixing weights, a
  * trailing time-RANGE window aggregate, and SCD-2 validity-interval
  * construction from an event log. All five are oracle-exact.
  */
object Corpus2 {

  /** Distinct word 5-grams of `text`, one row per (doc, n-gram).
    * Word-level (not character-level) on purpose: the synthetic corpus
    * draws from a small word vocabulary, so its character-trigram space
    * is ~400 shapes with minimum document frequency in the hundreds —
    * useless as anchors — while word 5-grams have median df = 1 at
    * every SF (as real text does: a 5-word sequence recurring across
    * documents is itself evidence of duplication). Built on
    * [[Dedup.docShingles]] (posexplode + lead windows), not the HOF:
    * interpreted lambda shingling alone cost ~5 s at sf0.1. */
  private def ngrams(docs: org.apache.spark.sql.DataFrame) =
    Dedup.docShingles(docs, 5).select(col("doc_id"), col("sh").as("tg"))

  /** The q134 incremental-ingest dedup core, shared verbatim by the
    * batch query and the streaming `foreachBatch` twin
    * ([[graft.streaming.StreamingIngest]]) so batch ≡ streaming holds
    * by construction: `docs` is index ∪ incoming batch (doc_id, text),
    * `isNew` marks the incoming side — it must be a deterministic
    * predicate over `doc_id` alone (the n-gram pass keeps only
    * doc_id + gram). Per new doc, staged verdicts:
    * exact_dup (SHA-256 digest hit in the index, earliest old id) else
    * near_dup (containment of the doc's informative df≤20 5-grams in
    * one index doc ≥ 0.8; best = highest intersection, lowest old id)
    * else unique. Cost is O(batch), not O(corpus): the digest and
    * rare-gram joins key on content hashes. */
  def ingestVerdicts(docs: org.apache.spark.sql.DataFrame,
      isNew: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    val oldDig = docs.filter(!isNew)
      .select(sha2(col("text"), 256).as("dig"), col("doc_id").as("old_id"))
      .groupBy(col("dig")).agg(min(col("old_id")).as("exact_old"))
    val exact = docs.filter(isNew)
      .select(col("doc_id"), sha2(col("text"), 256).as("dig"))
      .join(oldDig, Seq("dig"), "left")
      .select(col("doc_id"), col("exact_old"))
    val w = Window.partitionBy(col("tg"))
    val rt = ngrams(docs).withColumn("df", count(lit(1)).over(w))
      .filter(col("df") <= 20).select(col("doc_id"), col("tg"))
      .localCheckpoint() // read 3x: new sizes, new side, old side
    val nNew = rt.filter(isNew).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_new"))
    val best = rt.filter(isNew).as("a")
      .join(rt.filter(!isNew).as("b"), col("a.tg") === col("b.tg"))
      .groupBy(col("a.doc_id").as("doc_id"), col("b.doc_id").as("old"))
      .agg(count(lit(1)).as("i"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("i"), (lit(0L) - col("old")).as("no"))).as("m"))
      .select(col("doc_id"), col("m.i").as("best_i"),
        (lit(0L) - col("m.no")).as("near_old"))
    exact
      .join(nNew, Seq("doc_id"), "left")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_old").isNotNull, lit("exact_dup"))
          .when(col("best_i") / col("n_new").cast("double") >= 0.8,
            lit("near_dup"))
          .otherwise(lit("unique")).as("verdict"),
        when(col("exact_old").isNotNull, col("exact_old"))
          .when(col("best_i") / col("n_new").cast("double") >= 0.8,
            col("near_old"))
          .otherwise(lit(-1L)).as("matched_old_id"),
        Num.r4(coalesce(col("best_i") / col("n_new").cast("double"),
          lit(0.0))).as("containment"))
      .orderBy(col("doc_id"))
  }

  private val sqlNgrams =
    """tri AS (
          SELECT DISTINCT doc_id, tg FROM (
            SELECT doc_id,
              unnest([array_to_string(t[i:i+4], ' ')
                      FOR i IN range(1, len(t) - 3)]) AS tg
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents)
            WHERE len(t) >= 5))"""

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q96
    // Word-5-gram Jaccard near-dup pairs — the n-gram-Jaccard member
    // of the dedup family (exact q30, MinHash-LSH q35, SimHash q36,
    // embedding-cosine q37). The metric is Jaccard over the
    // INFORMATIVE n-grams (document frequency <= 20) — the n-gram
    // analogue of stopword removal: boilerplate 5-grams shared by
    // everything carry no dedup signal and, crucially, would make any
    // exact pair computation quadratic in their df. With them excluded
    // the whole operator is ONE self-join on the n-gram key with
    // fan-out bounded by df^2 <= 400 per gram, then a per-pair count —
    // intersection and Jaccard in a single shuffle, no candidate
    // re-expansion stage (a first cut that re-joined candidates
    // against full gram sets measured 12.5 s at sf0.1; this plan is
    // ~1 s). Exact duplicates still score 1.0: a hot gram is excluded
    // from BOTH sets symmetrically.
    Query(
      "q96_ngram_jaccard",
      (s, d) => {
        val tri = ngrams(Tables.documents(s, d))
        val w = Window.partitionBy(col("tg"))
        val rt = tri.withColumn("df", count(lit(1)).over(w))
          .filter(col("df") <= 20).select(col("doc_id"), col("tg"))
          // round 9: referenced 3× (sizes/containment + both self-join
          // sides) — without the checkpoint the shingle+df-window
          // pipeline re-ran per reference
          .localCheckpoint()
        val sizes = rt.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = rt.as("a").join(rt.as("b"),
            col("a.tg") === col("b.tg") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("i"))
        inter
          .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            Num.r4(col("i") /
              (col("sa.n") + col("sb.n") - col("i")).cast("double"))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.5)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $sqlNgrams,
        rt AS (
          SELECT doc_id, tg FROM (
            SELECT doc_id, tg, COUNT(*) OVER (PARTITION BY tg) AS df
            FROM tri)
          WHERE df <= 20),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM rt GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
          FROM rt a JOIN rt b ON a.tg = b.tg AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        j AS (
          SELECT da AS doc_a, db AS doc_b,
            ${Num.sql("i / CAST(sa.n + sb.n - i AS DOUBLE)", 4)} AS jaccard
          FROM inter
          JOIN sizes sa ON sa.doc_id = da
          JOIN sizes sb ON sb.doc_id = db)
        SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.5
        ORDER BY doc_a, doc_b"""),
      "word-5-gram Jaccard (over informative df<=20 grams) in one bounded self-join — intersection, sizes and threshold with no candidate re-expansion"),

    // ---------------------------------------------------------------- q97
    // Deterministic weighted sampling (Efraimidis–Spirakis A-ES): pick
    // the k docs per source with the smallest -ln(u)/w, w = n_chars —
    // equivalent to sampling without replacement with probability
    // proportional to length. u comes from the md5 integer hash, so
    // the "random" draw is reproducible and oracle-checkable; the
    // priority is quantized to integer nano-units BEFORE ranking so a
    // non-correctly-rounded ln() can never flip an order between
    // engines (ulp-scale differences vanish under the floor cut).
    // 100 TB shape: narrow per-row math + one per-source top-k window.
    Query(
      "q97_weighted_sample",
      (s, d) => {
        val hm = Dedup.h60(col("doc_id").cast("string")) % 1000000L
        val prio = -log((hm + lit(1L)) / lit(1000001.0)) /
          col("n_chars").cast("double")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("prio_q"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("n_chars"),
            floor(prio * lit(1000000000.0) + lit(0.500001)).cast("long")
              .as("prio_q"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
            col("prio_q"))
          .orderBy(col("source"), col("rk"))
      },
      Some(s"""
        WITH p AS (
          SELECT source, doc_id, n_chars,
            CAST(FLOOR((-ln((${Dedup.sqlH60("CAST(doc_id AS VARCHAR)")} % 1000000 + 1)
                  / 1000001.0) / CAST(n_chars AS DOUBLE)) * 1000000000
                + 0.500001) AS BIGINT) AS prio_q
          FROM documents),
        r AS (
          SELECT source, doc_id, n_chars, prio_q,
            ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY prio_q, doc_id) AS rk
          FROM p)
        SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_chars, prio_q
        FROM r WHERE rk <= 3 ORDER BY source, rk"""),
      "A-ES weighted sampling: top-3 per source by hash-derived -ln(u)/n_chars priority, nano-quantized for cross-engine order stability"),

    // ---------------------------------------------------------------- q98
    // Source mixing weights with sqrt temperature (the multilingual /
    // multi-source rebalancing rule: target share proportional to
    // sqrt(actual tokens) upweights small sources without letting them
    // dominate). sqrt is IEEE-correctly-rounded so it is bit-equal in
    // both engines; it is still quantized to integer micro-units
    // before the group sum so the share denominators are order-
    // independent exact integers. One token-count pass, then a
    // 20-row whole-frame window — vocabulary-sized, like q90's.
    Query(
      "q98_mix_weights",
      (s, d) => {
        val all = Window.partitionBy()
        Tables.documents(s, d)
          .select(col("source"), size(split(col("text"), " ")).as("nt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("nt").cast("long")).as("n_tokens"))
          .withColumn("sq",
            floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0)
              + lit(0.500001)).cast("long"))
          .withColumn("tot_tokens", sum(col("n_tokens")).over(all))
          .withColumn("tot_sq", sum(col("sq")).over(all))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            Num.r6(col("n_tokens") / col("tot_tokens").cast("double"))
              .as("tok_share"),
            Num.r6(col("sq") / col("tot_sq").cast("double"))
              .as("target_share"),
            Num.r6((col("sq") / col("tot_sq").cast("double")) /
              (col("n_tokens") / col("tot_tokens").cast("double")))
              .as("weight"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH t AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY source),
        q AS (
          SELECT *, CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000
                     + 0.500001) AS BIGINT) AS sq
          FROM t),
        g AS (
          SELECT *, SUM(n_tokens) OVER () AS tot_tokens,
            SUM(sq) OVER () AS tot_sq
          FROM q)
        SELECT source, n_docs, n_tokens,
          ${Num.sql("n_tokens / CAST(tot_tokens AS DOUBLE)", 6)} AS tok_share,
          ${Num.sql("sq / CAST(tot_sq AS DOUBLE)", 6)} AS target_share,
          ${Num.sql(
            "(sq / CAST(tot_sq AS DOUBLE)) / (n_tokens / CAST(tot_tokens AS DOUBLE))",
            6)} AS weight
        FROM g ORDER BY source"""),
      "sqrt-temperature source mixing: per-source token share, target share, resampling weight (integer-quantized denominators)"),

    // ---------------------------------------------------------------- q99
    // Trailing 30-day revenue per customer at every order — a true
    // time-RANGE window frame (RANGE BETWEEN 30 PRECEDING AND CURRENT
    // ROW over epoch days), the SQL-surface member the ROWS-frame
    // queries (q11, q22) don't cover. Peers at the same day are all
    // included by RANGE semantics in both engines, so ties are not an
    // ordering hazard. Money through DECIMAL (exact), back to DOUBLE.
    // 100 TB shape: one hash exchange on o_custkey + in-partition sort.
    Query(
      "q99_trailing_window",
      (s, d) => {
        val day = datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01")))
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), day.as("d"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
          .withColumn("trail_n", count(lit(1)).over(w))
          .withColumn("trail_rev", sum(col("p")).over(w).cast("double"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("d").cast("long").as("epoch_day"),
            col("trail_n"), col("trail_rev"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
            date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
            CAST(o_totalprice AS DECIMAL(18,2)) AS p
          FROM orders)
        SELECT o_orderkey, o_custkey, CAST(d AS BIGINT) AS epoch_day,
          CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
          CAST(SUM(p) OVER w AS DOUBLE) AS trail_rev
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey"""),
      "trailing 30-day per-customer revenue via a time-RANGE window frame (peers included by RANGE, not row order)"),

    // ---------------------------------------------------------------- q100
    // SCD-2 validity intervals from the event log: each event is valid
    // [ts, next event's ts) per user, the classic slowly-changing-
    // dimension build every warehouse pipeline runs. lead() over
    // (ts, event_id) — event_id breaks ts ties, so the intervals are
    // well-defined even on duplicate timestamps. The open tail uses a
    // far-future sentinel (2200-01-01: inside TIMESTAMP_NS range, so
    // DuckDB's ns-typed COALESCE cannot overflow). Duration is exact
    // integer seconds via microsecond arithmetic; -1 marks the
    // still-current row. One hash exchange on user_id.
    Query(
      "q100_scd2_intervals",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("ts").as("valid_from"))
          .withColumn("nxt", lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("valid_from"), col("event_id"))))
          .withColumn("valid_to",
            coalesce(col("nxt"), lit("2200-01-01 00:00:00").cast("timestamp")))
          .withColumn("is_current", col("nxt").isNull)
          .withColumn("dur_s",
            when(col("nxt").isNull, lit(-1L))
              .otherwise(expr(
                "(unix_micros(nxt) - unix_micros(valid_from)) div 1000000")))
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), col("valid_from"), col("valid_to"),
            col("is_current"), col("dur_s"))
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      Some("""
        WITH x AS (
          SELECT user_id, event_id, event_type, value, ts AS valid_from,
            LEAD(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS nxt
          FROM events)
        SELECT user_id, event_id, event_type, value, valid_from,
          COALESCE(nxt, TIMESTAMP '2200-01-01 00:00:00') AS valid_to,
          nxt IS NULL AS is_current,
          CASE WHEN nxt IS NULL THEN CAST(-1 AS BIGINT)
               ELSE (epoch_us(nxt) - epoch_us(valid_from)) // 1000000
          END AS dur_s
        FROM x ORDER BY user_id, valid_from, event_id"""),
      "SCD-2 interval build from the event log: [ts, next-ts) validity, far-future sentinel tail, exact integer-second durations"),

    // ---------------------------------------------------------------- q102
    // PMI collocation mining: the top-50 adjacent token pairs by
    // pointwise mutual information, the classic collocation extractor
    // (Church & Hanks 1990). All counts are exact integers; the single
    // ln() runs over an identically-shaped double expression on both
    // engines and is floor-quantized to integer micro-nats, which both
    // ranks and outputs — no raw ln() double ever reaches the compare.
    // Totals come from 1-row aggregate frames broadcast into the plan
    // (a whole-frame window here would single-partition the token
    // table). 100 TB shape: one token shuffle for unigrams, one bigram
    // shuffle, vocabulary-sized joins, TakeOrdered(50) — no global sort.
    Query(
      "q102_pmi_collocations",
      (s, d) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " "))
            .as(Seq("pos", "t")))
        val bi = tok.withColumn("t2", lead(col("t"), 1).over(w))
          .filter(col("t2").isNotNull)
          .select(concat_ws(" ", col("t"), col("t2")).as("bg"))
        val uni = tok.groupBy(col("t")).agg(count(lit(1)).as("c"))
        val totU = tok.agg(count(lit(1)).as("nu"))
        val totB = bi.agg(count(lit(1)).as("nb"))
        val cab = bi.groupBy(col("bg")).agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .withColumn("w1", split(col("bg"), " ")(0))
          .withColumn("w2", split(col("bg"), " ")(1))
        cab
          .join(uni.select(col("t").as("w1"), col("c").as("ca")), Seq("w1"))
          .join(uni.select(col("t").as("w2"), col("c").as("cb")), Seq("w2"))
          .crossJoin(broadcast(totU)).crossJoin(broadcast(totB))
          .select(col("w1"), col("w2"), col("n_ab"),
            floor(log((col("n_ab") / col("nb").cast("double")) /
                ((col("ca") / col("nu").cast("double")) *
                  (col("cb") / col("nu").cast("double")))) * lit(1000000.0)
              + lit(0.500001)).cast("long").as("pmi_micro"))
          .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
          .limit(50)
      },
      Some("""
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        bi AS (
          SELECT unnest([array_to_string(t[i:i+1], ' ')
                         FOR i IN range(1, len(t))]) AS bg
          FROM toks),
        uni AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
        tu AS (SELECT COUNT(*) AS nu FROM tok),
        tb AS (SELECT COUNT(*) AS nb FROM bi),
        cab AS (
          SELECT bg, COUNT(*) AS n_ab,
            string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
          FROM bi GROUP BY bg HAVING COUNT(*) >= 5)
        SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
          CAST(FLOOR(ln((n_ab / CAST(nb AS DOUBLE)) /
              ((ua.c / CAST(nu AS DOUBLE)) * (ub.c / CAST(nu AS DOUBLE))))
            * 1000000 + 0.500001) AS BIGINT) AS pmi_micro
        FROM cab
        JOIN uni ua ON ua.t = cab.w1
        JOIN uni ub ON ub.t = cab.w2
        CROSS JOIN tu CROSS JOIN tb
        ORDER BY pmi_micro DESC, w1, w2 LIMIT 50"""),
      "PMI collocations: top-50 adjacent pairs by micro-nat-quantized pointwise mutual information (min support 5)"),

    // ---------------------------------------------------------------- q103
    // Robust outlier profile via MAD (median absolute deviation) — the
    // robust-statistics twin of q74's IQR rule. Both medians are
    // r4-quantized before any downstream arithmetic (q46 established
    // r4 as the cross-engine-safe precision for interpolated
    // percentiles), so the deviation values and the 3·1.4826·MAD
    // threshold comparison are bit-identical in both engines.
    // 100 TB shape: two grouped percentile passes + one narrow join —
    // same shape as q74.
    Query(
      "q103_mad_outliers",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(Num.r4(percentile(col("value"), lit(0.5))).as("med"))
        val dev = ev.join(broadcast(med), Seq("event_type"))
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(max(col("med")).as("med"),
            Num.r4(percentile(col("dev"), lit(0.5))).as("mad"),
            count(lit(1)).as("n"))
        dev.join(broadcast(mad.select(col("event_type"), col("mad"))),
            Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(when(col("dev") > col("mad") * lit(3.0) * lit(1.4826), 1))
            .as("n_outliers"))
          .join(mad, Seq("event_type"))
          .select(col("event_type"), col("n"), col("med"), col("mad"),
            col("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""
        WITH med AS (
          SELECT event_type,
            FLOOR(quantile_cont(value, 0.5) * 10000 + 0.500001) / 10000 AS med
          FROM events GROUP BY event_type),
        dev AS (
          SELECT e.event_type, e.value, ABS(e.value - m.med) AS dev, m.med
          FROM events e JOIN med m USING (event_type)),
        mad AS (
          SELECT event_type, MAX(med) AS med,
            FLOOR(quantile_cont(dev, 0.5) * 10000 + 0.500001) / 10000 AS mad,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM dev GROUP BY event_type)
        SELECT d.event_type, m.n, m.med, m.mad,
          CAST(COUNT(*) FILTER (WHERE d.dev > m.mad * 3.0 * 1.4826) AS BIGINT)
            AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY d.event_type, m.n, m.med, m.mad
        ORDER BY d.event_type"""),
      "MAD robust outliers per event type: r4-quantized medians, exact threshold compare at 3*1.4826*MAD"),

    // ---------------------------------------------------------------- q104
    // Retention cohort matrix: users cohorted by the epoch-week of
    // their first event; each cell counts distinct users from cohort w
    // active in week w + offset — the standard product-analytics
    // retention triangle. All time math is integer epoch-days/weeks
    // (exact). 100 TB shape: one groupBy for cohorts (user-sized,
    // broadcast-or-shuffle joined back), one distinct over
    // (user, week), one final small aggregate.
    Query(
      "q104_retention_cohorts",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val cohort = ev.groupBy(col("user_id"))
          .agg((min(col("day")) / 7).cast("long").as("cohort_week"))
        val active = ev.select(col("user_id"),
            (col("day") / 7).cast("long").as("week"))
          .distinct()
        active.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (col("week") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        cohort AS (
          SELECT user_id, MIN(day) // 7 AS cohort_week
          FROM ev GROUP BY user_id),
        active AS (SELECT DISTINCT user_id, day // 7 AS week FROM ev)
        SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
          CAST(COUNT(*) AS BIGINT) AS n_active
        FROM active a JOIN cohort c USING (user_id)
        GROUP BY c.cohort_week, week_offset
        ORDER BY c.cohort_week, week_offset"""),
      "retention cohort triangle: first-event epoch-week cohorts x active-week offsets, all-integer time math"),

    // ---------------------------------------------------------------- q105
    // Last-touch attribution: every purchase is attributed to the
    // latest STRICTLY-preceding view or click by the same user within
    // a 7-day window ('none' otherwise) — the classic marketing-
    // attribution join. One window pass over (ts, event_id) order with
    // last(_, ignoreNulls) over a 1-PRECEDING rows frame: no self-join,
    // no row explosion; both engines evaluate the identical frame.
    Query(
      "q105_last_touch",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val touch = when(col("event_type").isin("view", "click"), col("us"))
        val touchT = when(col("event_type").isin("view", "click"),
          col("event_type"))
        ev
          .withColumn("t_us", last(touch, ignoreNulls = true).over(w))
          .withColumn("t_type", last(touchT, ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us").as("purchase_us"),
            when(col("t_us").isNotNull &&
                col("us") - col("t_us") <= 604800000000L, col("t_type"))
              .otherwise(lit("none")).as("touch_type"),
            when(col("t_us").isNotNull &&
                col("us") - col("t_us") <= 604800000000L,
              col("us") - col("t_us")).otherwise(lit(-1L)).as("lag_us"))
          .orderBy(col("event_id"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events),
        t AS (
          SELECT *,
            last_value(CASE WHEN event_type IN ('view','click') THEN us END
                       IGNORE NULLS) OVER w AS t_us,
            last_value(CASE WHEN event_type IN ('view','click')
                            THEN event_type END IGNORE NULLS) OVER w AS t_type
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, us AS purchase_us,
          CASE WHEN t_us IS NOT NULL AND us - t_us <= 604800000000
               THEN t_type ELSE 'none' END AS touch_type,
          CAST(CASE WHEN t_us IS NOT NULL AND us - t_us <= 604800000000
               THEN us - t_us ELSE -1 END AS BIGINT) AS lag_us
        FROM t WHERE event_type = 'purchase'
        ORDER BY event_id"""),
      "last-touch attribution: latest strictly-preceding view/click within 7 days per purchase, single window pass"),

    // ---------------------------------------------------------------- q106
    // Containment near-dup pairs: C(A,B) = |A∩B| / |A| over the same
    // informative 5-grams as q96 — catches SUBSET duplication (a doc
    // quoted or embedded inside a larger one) that symmetric Jaccard
    // misses (a small doc inside a big one has low Jaccard but
    // containment ~1). Same single bounded self-join shape as q96.
    Query(
      "q106_containment",
      (s, d) => {
        val tri = ngrams(Tables.documents(s, d))
        val w = Window.partitionBy(col("tg"))
        val rt = tri.withColumn("df", count(lit(1)).over(w))
          .filter(col("df") <= 20).select(col("doc_id"), col("tg"))
          // round 9: referenced 3× (sizes/containment + both self-join
          // sides) — without the checkpoint the shingle+df-window
          // pipeline re-ran per reference
          .localCheckpoint()
        val sizes = rt.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val inter = rt.as("a").join(rt.as("b"),
            col("a.tg") === col("b.tg") && col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .agg(count(lit(1)).as("i"))
        inter
          .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
          .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            Num.r4(col("i") / col("sa.n").cast("double")).as("cont_a_in_b"),
            Num.r4(col("i") / col("sb.n").cast("double")).as("cont_b_in_a"))
          .filter(col("cont_a_in_b") >= 0.9 || col("cont_b_in_a") >= 0.9)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some(s"""
        WITH $sqlNgrams,
        rt AS (
          SELECT doc_id, tg FROM (
            SELECT doc_id, tg, COUNT(*) OVER (PARTITION BY tg) AS df
            FROM tri)
          WHERE df <= 20),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM rt GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
          FROM rt a JOIN rt b ON a.tg = b.tg AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
        j AS (
          SELECT da AS doc_a, db AS doc_b,
            ${Num.sql("i / CAST(sa.n AS DOUBLE)", 4)} AS cont_a_in_b,
            ${Num.sql("i / CAST(sb.n AS DOUBLE)", 4)} AS cont_b_in_a
          FROM inter
          JOIN sizes sa ON sa.doc_id = da
          JOIN sizes sb ON sb.doc_id = db)
        SELECT doc_a, doc_b, cont_a_in_b, cont_b_in_a FROM j
        WHERE cont_a_in_b >= 0.9 OR cont_b_in_a >= 0.9
        ORDER BY doc_a, doc_b"""),
      "containment-coefficient near-dup pairs over informative 5-grams: catches subset duplication symmetric Jaccard misses"),

    // --------------------------------------------------------------- q134
    // Incremental ingest dedup: the incoming batch (odd doc_ids) is
    // deduped AGAINST the existing corpus (even doc_ids) — the
    // operational shape of dedup in a continuously-fed pipeline, where
    // the new batch never self-joins and the old corpus is an index.
    // Two staged verdicts per new doc: exact_dup (SHA-256 digest hit
    // in the old corpus, earliest old id wins) else near_dup
    // (containment of the new doc's informative df<=20 5-grams in one
    // old doc >= 0.8; best match = highest intersection, then lowest
    // old id) else unique. Scale: the digest index and the rare-gram
    // join both key on content hashes — the new batch's cost is
    // proportional to ITS size, not the corpus's (the property that
    // makes nightly ingest O(batch)).
    Query(
      "q134_incremental_ingest",
      (s, d) =>
        ingestVerdicts(Tables.documents(s, d), col("doc_id") % 2 === 1),
      Some(s"""
        WITH $sqlNgrams,
        old_dig AS (
          SELECT sha256(text) AS dig, MIN(doc_id) AS exact_old
          FROM documents WHERE doc_id % 2 = 0 GROUP BY sha256(text)),
        exact AS (
          SELECT d.doc_id, o.exact_old
          FROM documents d LEFT JOIN old_dig o ON o.dig = sha256(d.text)
          WHERE d.doc_id % 2 = 1),
        rt AS (
          SELECT doc_id, tg FROM (
            SELECT doc_id, tg, COUNT(*) OVER (PARTITION BY tg) AS df
            FROM tri)
          WHERE df <= 20),
        n_new AS (
          SELECT doc_id, COUNT(*) AS n_new FROM rt
          WHERE doc_id % 2 = 1 GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id, b.doc_id AS old, COUNT(*) AS i
          FROM rt a JOIN rt b ON a.tg = b.tg
          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          GROUP BY a.doc_id, b.doc_id),
        best AS (
          SELECT doc_id, i AS best_i, old AS near_old FROM (
            SELECT doc_id, i, old, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY i DESC, old) AS rn
            FROM inter) WHERE rn = 1)
        SELECT e.doc_id,
          CASE WHEN exact_old IS NOT NULL THEN 'exact_dup'
               WHEN best_i / CAST(n_new AS DOUBLE) >= 0.8 THEN 'near_dup'
               ELSE 'unique' END AS verdict,
          CAST(CASE WHEN exact_old IS NOT NULL THEN exact_old
               WHEN best_i / CAST(n_new AS DOUBLE) >= 0.8 THEN near_old
               ELSE -1 END AS BIGINT) AS matched_old_id,
          ${Num.sql("COALESCE(best_i / CAST(n_new AS DOUBLE), 0)", 4)}
            AS containment
        FROM exact e
        LEFT JOIN n_new USING (doc_id)
        LEFT JOIN best USING (doc_id)
        ORDER BY e.doc_id"""),
      "incremental ingest dedup: new batch (odd ids) vs existing corpus (even ids) — staged exact-digest then rare-5-gram containment verdicts, O(batch) not O(corpus)"),

    // --------------------------------------------------------------- q155
    // Training-mix manifest — the capstone that composes the curation
    // signals into the artifact a pretraining run actually consumes:
    // per source, a token BUDGET from q98's sqrt-temperature shares
    // (B_s = G·sq_s div Σsq, G = half the corpus tokens), filled
    // greedily by QUALITY (integer type-token ratio in basis points,
    // doc_id tiebreak) until the running token prefix-sum exceeds the
    // budget. Everything is integer: the sqrt is the one correctly-
    // rounded IEEE call (q98's convention), quantized before any
    // ranking or division, so rank order, cumulative sums, and the
    // selection frontier are bit-identical across engines. Scale
    // shape: one doc-level pass, a ~|sources|-row broadcast budget
    // join, ONE per-source sort (the window) — no global sort, no
    // driver loop; conditional aggregation keeps a row per source even
    // when nothing fits its budget.
    Query(
      "q155_training_mix",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
          expr("cast(size(split(text, ' ')) as bigint)").as("nt"),
          expr("""cast(size(array_distinct(split(text, ' '))) as bigint) * 10000
                  div cast(size(split(text, ' ')) as bigint)""").as("q_bp"))
        val bySrc = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("src_tokens"))
          .withColumn("sq",
            floor(sqrt(col("src_tokens").cast("double")) * lit(1000000.0)
              + lit(0.500001)).cast("long"))
        // global scalars as a broadcast 1-row aggregate (q90 rule), not
        // a whole-frame window
        val budgets = bySrc.crossJoin(broadcast(
            bySrc.agg(sum(col("src_tokens")).as("tot_tokens"),
              sum(col("sq")).as("tot_sq"))))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            // DECIMAL(38,0) cross term (q145 pattern): (tot/2)·sq is
            // ~tot^1.5/2·1e6, past int64 near 1e10 total tokens — the
            // quotient (≤ tot/2) always fits back in BIGINT
            expr("""cast(cast(tot_tokens div 2 as decimal(38,0)) * sq
                    div tot_sq as bigint)""").as("budget_tokens"))
        val w = Window.partitionBy(col("source"))
          .orderBy(col("q_bp").desc, col("doc_id"))
        docs.join(broadcast(budgets), Seq("source"))
          .withColumn("cum", sum(col("nt")).over(w))
          .groupBy(col("source"))
          .agg(first(col("n_docs")).as("n_docs"),
            first(col("src_tokens")).as("src_tokens"),
            first(col("budget_tokens")).as("budget_tokens"),
            sum(when(col("cum") <= col("budget_tokens"), 1L).otherwise(0L))
              .as("n_selected"),
            sum(when(col("cum") <= col("budget_tokens"), col("nt"))
              .otherwise(0L)).as("tokens_selected"))
          // greatest(1,·) guards the all-zero-budget degenerate corpus
          // (Spark div 0 → NULL, DuckDB // 0 → error); tokens_selected
          // is then 0 too, so both engines agree on 0. The ×1e6 stays
          // int64-safe below ~9.2e12 selected tokens.
          .withColumn("utilization_micro",
            expr("tokens_selected * 1000000 div greatest(1L, budget_tokens)"))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            col("budget_tokens"), col("n_selected"), col("tokens_selected"),
            col("utilization_micro"))
          .orderBy(col("source"))
      },
      Some("""
        WITH docs AS (
          SELECT source, doc_id,
            CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS nt,
            CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) * 10000
              // CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS q_bp
          FROM documents),
        by_src AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(nt) AS BIGINT) AS src_tokens,
            CAST(FLOOR(sqrt(CAST(SUM(nt) AS DOUBLE)) * 1000000 + 0.500001)
              AS BIGINT) AS sq
          FROM docs GROUP BY source),
        tot AS (
          SELECT CAST(SUM(src_tokens) AS BIGINT) AS tot_tokens,
            CAST(SUM(sq) AS BIGINT) AS tot_sq
          FROM by_src),
        budgets AS (
          SELECT source, n_docs, src_tokens,
            CAST((CAST(tot_tokens AS HUGEINT) // 2) * sq // tot_sq AS BIGINT)
              AS budget_tokens
          FROM by_src CROSS JOIN tot),
        ranked AS (
          SELECT d.source, d.nt, b.n_docs, b.src_tokens, b.budget_tokens,
            SUM(d.nt) OVER (PARTITION BY d.source
              ORDER BY d.q_bp DESC, d.doc_id) AS cum
          FROM docs d JOIN budgets b USING (source))
        SELECT source, ANY_VALUE(n_docs) AS n_docs,
          ANY_VALUE(src_tokens) AS src_tokens,
          ANY_VALUE(budget_tokens) AS budget_tokens,
          CAST(SUM(CASE WHEN cum <= budget_tokens THEN 1 ELSE 0 END) AS BIGINT)
            AS n_selected,
          CAST(SUM(CASE WHEN cum <= budget_tokens THEN nt ELSE 0 END) AS BIGINT)
            AS tokens_selected,
          CAST(CAST(SUM(CASE WHEN cum <= budget_tokens THEN nt ELSE 0 END)
            AS BIGINT) * 1000000 // GREATEST(1, ANY_VALUE(budget_tokens))
            AS BIGINT) AS utilization_micro
        FROM ranked GROUP BY source ORDER BY source"""),
      "training-mix manifest: sqrt-temperature token budgets filled greedily by integer quality rank — the composed curation artifact"),

    // --------------------------------------------------------------- q157
    // Duplicated-span risk per document — the span-level complement to
    // the pairwise near-dup scores (q96/q106): how much of EACH doc is
    // made of 8-token spans that also appear elsewhere in the corpus
    // (the memorization-risk signal substring-dedup pipelines act on,
    // cf. PAPERS.md on training-data dedup). One distinct-span pass
    // (posexplode + lead windows, whole-stage codegen), spans hashed to
    // int64 before the df shuffle (the q34 narrow-shuffle convention;
    // both engines hash identically so the rare collision is
    // cross-engine-consistent), df via a per-span count window, then
    // one per-doc aggregate. Docs too short for any span keep a row
    // via the left join (n_spans = 0, risk 'low'). Corpus-linear; no
    // pairwise anything.
    Query(
      "q157_dup_span_risk",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val spans = Dedup.docShingles(docs, 8)
          .select(col("doc_id"), Dedup.hp(col("sh")).as("h"))
        val withDf = spans.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("h"))))
        val perDoc = withDf.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_spans"),
            sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_shared"),
            max(col("df")).as("max_df"))
        docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_spans"), lit(0L)).as("n_spans"),
            coalesce(col("n_shared"), lit(0L)).as("n_shared"),
            coalesce(col("max_df"), lit(0L)).as("max_df"))
          .withColumn("shared_bp",
            when(col("n_spans") === 0, lit(0L))
              .otherwise(expr("n_shared * 10000 div n_spans")))
          .withColumn("risk",
            when(col("shared_bp") >= 5000, "high")
              .when(col("shared_bp") >= 1000, "medium")
              .otherwise("low"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH sp AS (
          SELECT DISTINCT doc_id, sh FROM (
            SELECT doc_id,
              unnest([array_to_string(t[i:i+7], ' ')
                      FOR i IN range(1, len(t) - 6)]) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents)
            WHERE len(t) >= 8)),
        hs AS (SELECT doc_id, ${Dedup.sqlHp("sh")} AS h FROM sp),
        wd AS (
          SELECT doc_id, COUNT(*) OVER (PARTITION BY h) AS df FROM hs),
        per_doc AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
            CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
            CAST(MAX(df) AS BIGINT) AS max_df
          FROM wd GROUP BY doc_id),
        j AS (
          SELECT d.doc_id,
            COALESCE(n_spans, 0) AS n_spans,
            COALESCE(n_shared, 0) AS n_shared,
            COALESCE(max_df, 0) AS max_df
          FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id)
        SELECT doc_id, n_spans, n_shared, max_df,
          CAST(CASE WHEN n_spans = 0 THEN 0
               ELSE n_shared * 10000 // n_spans END AS BIGINT) AS shared_bp,
          CASE WHEN (CASE WHEN n_spans = 0 THEN 0
                     ELSE n_shared * 10000 // n_spans END) >= 5000 THEN 'high'
               WHEN (CASE WHEN n_spans = 0 THEN 0
                     ELSE n_shared * 10000 // n_spans END) >= 1000 THEN 'medium'
               ELSE 'low' END AS risk
        FROM j ORDER BY doc_id"""),
      "per-doc duplicated-span risk: share of 8-token spans appearing elsewhere in the corpus — span-level memorization audit, corpus-linear"))
}
