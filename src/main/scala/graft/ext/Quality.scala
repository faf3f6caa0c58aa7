package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** Data-quality operators: a declarative rule-check report (the
  * Deequ-style validation pass every ingest pipeline runs before
  * publishing a snapshot) and inter-event gap statistics (the
  * time-series liveness/cadence audit). All-integer counts; each rule
  * is one scan-level aggregate or one co-partitioned anti join — the
  * report is embarrassingly parallel at 100 TB and its output is
  * rule-count-sized.
  */
object Quality {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q121
    // Declarative data-quality rules over the snapshot: completeness
    // (null checks), validity (range checks), referential integrity
    // (FK orphans via anti join), uniqueness (key duplication), and
    // cross-field consistency. One row per rule with checked/violation
    // counts — the shape a quality gate consumes. Each rule is
    // independent, so Spark runs them as parallel jobs over their own
    // pruned scans; none shuffles wider than its aggregate.
    Query(
      "q121_dq_rules",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val ev = Tables.events(s, d)
        def rule(id: String, desc: String, checked: org.apache.spark.sql.Column,
            violated: org.apache.spark.sql.Column,
            src: org.apache.spark.sql.DataFrame) =
          src.agg(checked.as("n_checked"), violated.as("n_violations"))
            .select(lit(id).as("rule_id"), lit(desc).as("rule"),
              col("n_checked"), col("n_violations"))
        val orphans = li.select(col("l_orderkey"))
          .join(ord.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
        val r1 = li.agg(count(lit(1)).as("n_checked"))
          .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
          .select(lit("r1_fk_lineitem_orders").as("rule_id"),
            lit("every l_orderkey exists in orders").as("rule"),
            col("n_checked"), col("n_violations"))
        r1
          .unionByName(rule("r2_qty_range", "l_quantity in [1,50]",
            count(lit(1)),
            count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)), li))
          .unionByName(rule("r3_price_nonneg", "l_extendedprice >= 0",
            count(lit(1)),
            count(when(col("l_extendedprice") < 0, 1)), li))
          .unionByName(rule("r4_custkey_unique", "c_custkey unique",
            count(lit(1)),
            (count(lit(1)) - countDistinct(col("c_custkey"))), cust))
          .unionByName(rule("r5_event_value_notnull", "events.value not null",
            count(lit(1)), count(when(col("value").isNull, 1)), ev))
          .unionByName(rule("r6_date_order", "o_orderdate within TPC-H range",
            count(lit(1)),
            count(when(col("o_orderdate") < to_date(lit("1992-01-01")) ||
              col("o_orderdate") > to_date(lit("1998-12-31")), 1)), ord))
          .orderBy(col("rule_id"))
      },
      Some("""
        SELECT 'r1_fk_lineitem_orders' AS rule_id,
          'every l_orderkey exists in orders' AS rule,
          CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_checked,
          CAST((SELECT COUNT(*) FROM lineitem
                ANTI JOIN orders ON l_orderkey = o_orderkey) AS BIGINT)
            AS n_violations
        UNION ALL
        SELECT 'r2_qty_range', 'l_quantity in [1,50]',
          CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'r3_price_nonneg', 'l_extendedprice >= 0',
          CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) FILTER (WHERE l_extendedprice < 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'r4_custkey_unique', 'c_custkey unique',
          CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
        FROM customer
        UNION ALL
        SELECT 'r5_event_value_notnull', 'events.value not null',
          CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT)
        FROM events
        UNION ALL
        SELECT 'r6_date_order', 'o_orderdate within TPC-H range',
          CAST(COUNT(*) AS BIGINT),
          CAST(COUNT(*) FILTER (WHERE o_orderdate < DATE '1992-01-01'
            OR o_orderdate > DATE '1998-12-31') AS BIGINT)
        FROM orders
        ORDER BY rule_id"""),
      "Deequ-style data-quality report: completeness, validity, FK-orphan, uniqueness and range rules as one checked/violations row each"),

    // --------------------------------------------------------------- q122
    // Inter-event gap statistics per event type: the cadence audit
    // that catches dead sensors (huge max gap) and runaway producers
    // (tiny p50). Gaps are exact integer microseconds from a per-user
    // lag; min/max/count stay integer; mean is one exact-integer
    // division rounded r4; p50/p95 use interpolated percentiles over
    // integers (same QUANTILE_CONT twin as q46). One hash shuffle on
    // user_id for the lag, one |event_types|-group aggregate.
    Query(
      "q122_event_gaps",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap_us").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            min(col("gap_us")).as("min_gap_us"),
            max(col("gap_us")).as("max_gap_us"),
            Num.r4(sum(col("gap_us")) / count(lit(1)).cast("double"))
              .as("mean_gap_us"),
            Num.r4(percentile(col("gap_us"), lit(0.5))).as("p50_gap_us"),
            Num.r4(percentile(col("gap_us"), lit(0.95))).as("p95_gap_us"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events),
        g AS (
          SELECT event_type,
            us - LAG(us) OVER (PARTITION BY user_id
                               ORDER BY us, event_id) AS gap_us
          FROM ev)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
          CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
          ${Num.sql("SUM(gap_us) / CAST(COUNT(*) AS DOUBLE)", 4)} AS mean_gap_us,
          ${Num.sql("QUANTILE_CONT(gap_us, 0.5)", 4)} AS p50_gap_us,
          ${Num.sql("QUANTILE_CONT(gap_us, 0.95)", 4)} AS p95_gap_us
        FROM g WHERE gap_us IS NOT NULL
        GROUP BY event_type ORDER BY event_type"""),
      "inter-event gap statistics per event type (cadence/liveness audit): integer-µs gaps, interpolated percentiles"),

    // --------------------------------------------------------------- q125
    // Language-label agreement audit: the confusion matrix of the
    // recorded `lang` column vs the marker-word language guess (q44's
    // heuristic, same deterministic argmax tie rule), with per-pair
    // counts and the labeled-language share each cell represents. The
    // audit that catches mislabeled crawl slices before training on
    // the `lang` column. Narrow per-row scoring + one |langs|²-group
    // aggregate — embarrassingly parallel.
    Query(
      "q125_lang_agreement",
      (s, d) => {
        val toks = split(col("text"), " ")
        val score = (lang: String) => size(filter(toks,
          t => graft.ops.Misc.Markers(lang).map(m => t === m).reduce(_ || _)))
        val en = score("en"); val de = score("de"); val es = score("es")
        val guessed = Tables.documents(s, d)
          .select(col("lang").as("labeled_lang"),
            when(en >= de && en >= es && en > 0, "en")
              .when(de >= es && de > 0, "de")
              .when(es > 0, "es")
              .otherwise("unknown").as("guessed_lang"))
          .groupBy(col("labeled_lang"), col("guessed_lang"))
          .agg(count(lit(1)).as("n"))
        val tot = guessed.groupBy(col("labeled_lang"))
          .agg(sum(col("n")).as("n_labeled"))
        guessed.join(broadcast(tot), Seq("labeled_lang"))
          .select(col("labeled_lang"), col("guessed_lang"), col("n"),
            Num.r4(col("n") / col("n_labeled").cast("double")).as("share"))
          .orderBy(col("labeled_lang"), col("guessed_lang"))
      },
      Some {
        def hits(lang: String) = {
          val list = graft.ops.Misc.Markers(lang).map(m => s"'$m'").mkString(", ")
          s"CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), t -> t IN ($list))) AS BIGINT)"
        }
        s"""
        WITH t AS (
          SELECT lang AS labeled_lang,
            ${hits("en")} AS en_hits, ${hits("de")} AS de_hits,
            ${hits("es")} AS es_hits
          FROM documents),
        g AS (
          SELECT labeled_lang,
            CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
                 WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
                 WHEN es_hits > 0 THEN 'es'
                 ELSE 'unknown' END AS guessed_lang
          FROM t),
        c AS (SELECT labeled_lang, guessed_lang, COUNT(*) AS n
              FROM g GROUP BY labeled_lang, guessed_lang),
        tot AS (SELECT labeled_lang, SUM(n) AS n_labeled
                FROM c GROUP BY labeled_lang)
        SELECT labeled_lang, guessed_lang, CAST(n AS BIGINT) AS n,
          ${Num.sql("n / CAST(n_labeled AS DOUBLE)", 4)} AS share
        FROM c JOIN tot USING (labeled_lang)
        ORDER BY labeled_lang, guessed_lang"""
      },
      "language-label agreement audit: confusion matrix of recorded lang vs marker-word guess with per-label shares (mislabeled-slice detector)"),

    // --------------------------------------------------------------- q127
    // Join-key skew report: per candidate join column, the key-space
    // statistics that decide salting/broadcast strategy BEFORE a big
    // join runs — row count, distinct keys, hottest-key count, the
    // skew factor (hottest / average per key), and the top-3 hottest
    // keys. One partial-aggregated count per column; the top-3 is a
    // bounded TakeOrdered whose 3-row ordered concat follows q48's
    // sort-before-join recipe. The report q107's salted join would
    // consume to pick its salt fan-out.
    Query(
      "q127_skew_report",
      (s, d) => {
        def report(df: org.apache.spark.sql.DataFrame, label: String,
            column: String) = {
          // localCheckpoint: counts feeds both the stats aggregate and
          // the top-3 — truncation stops the second reference from
          // re-scanning the base table
          val counts = df.groupBy(col(column).cast("long").as("k"))
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint()
          val stats = counts.agg(sum(col("cnt")).as("n_rows"),
            count(lit(1)).as("n_keys"), max(col("cnt")).as("max_per_key"))
          val top3 = counts.orderBy(col("cnt").desc, col("k")).limit(3)
            .agg(array_join(transform(
              array_sort(collect_list(struct((lit(0L) - col("cnt")).as("nc"),
                col("k")))),
              e => concat_ws(":", e.getField("k"),
                lit(0L) - e.getField("nc"))), ",").as("top_keys"))
          stats.crossJoin(top3)
            .select(lit(label).as("join_key"), col("n_rows"), col("n_keys"),
              col("max_per_key"),
              Num.r4((col("max_per_key") * col("n_keys"))
                / col("n_rows").cast("double")).as("skew_factor"),
              col("top_keys"))
        }
        report(Tables.lineitem(s, d), "lineitem.l_suppkey", "l_suppkey")
          .unionByName(report(Tables.lineitem(s, d), "lineitem.l_orderkey",
            "l_orderkey"))
          .unionByName(report(Tables.orders(s, d), "orders.o_custkey",
            "o_custkey"))
          .unionByName(report(Tables.events(s, d), "events.user_id",
            "user_id"))
          .orderBy(col("join_key"))
      },
      Some {
        def one(label: String, table: String, column: String) = s"""
          SELECT '$label' AS join_key,
            CAST(s.n_rows AS BIGINT) AS n_rows,
            CAST(s.n_keys AS BIGINT) AS n_keys,
            CAST(s.max_per_key AS BIGINT) AS max_per_key,
            ${Num.sql("(s.max_per_key * s.n_keys) / CAST(s.n_rows AS DOUBLE)", 4)}
              AS skew_factor,
            t.top_keys
          FROM (
            SELECT SUM(cnt) AS n_rows, COUNT(*) AS n_keys,
              MAX(cnt) AS max_per_key
            FROM (SELECT CAST($column AS BIGINT) AS k, COUNT(*) AS cnt
                  FROM $table GROUP BY 1)) s
          CROSS JOIN (
            SELECT STRING_AGG(k || ':' || cnt, ',' ORDER BY cnt DESC, k)
              AS top_keys
            FROM (SELECT k, cnt
                  FROM (SELECT CAST($column AS BIGINT) AS k, COUNT(*) AS cnt
                        FROM $table GROUP BY 1)
                  ORDER BY cnt DESC, k LIMIT 3)) t"""
        Seq(one("lineitem.l_suppkey", "lineitem", "l_suppkey"),
          one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
          one("orders.o_custkey", "orders", "o_custkey"),
          one("events.user_id", "events", "user_id"))
          .mkString("", "\n          UNION ALL", "\n          ORDER BY join_key")
      },
      "join-key skew report per candidate key column: distinct keys, hottest-key count, skew factor, top-3 hottest keys (the pre-join salting decision input)"),

    // --------------------------------------------------------------- q141
    // Incremental aggregate maintenance (the materialized-view /
    // streaming-state primitive): the event log is split into a BASE
    // batch (even event_id) and a DELTA batch (odd), per-user partial
    // aggregates are computed independently on each, and the view is
    // produced by MERGING the partials — count+count, sum+sum,
    // least(min), greatest(max), avg from the merged sums. The DuckDB
    // oracle recomputes the same aggregates DIRECTLY from the full
    // log, so the hash-match is itself the proof that merge ≡
    // recompute. Values go through integer micro-units so the sums
    // are associativity-proof. At 100 TB this is the pattern that
    // turns a nightly full recompute into an O(delta) refresh.
    Query(
      "q141_incremental_agg",
      (s, d) => {
        val micro = floor(col("value") * 1000000 + lit(0.5)).cast("long")
        def partial(even: Boolean) = Tables.events(s, d)
          .filter((col("event_id") % 2 === 0) === even)
          .select(col("user_id"), micro.as("vm"), col("value"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("vm")).as("sm"),
            min(col("value")).as("mn"), max(col("value")).as("mx"))
        val merged = partial(even = true).as("b")
          .join(partial(even = false).as("dl"), Seq("user_id"), "full")
          .select(col("user_id"),
            (coalesce(col("b.n"), lit(0L)) + coalesce(col("dl.n"), lit(0L)))
              .as("n_events"),
            (coalesce(col("b.sm"), lit(0L)) + coalesce(col("dl.sm"), lit(0L)))
              .as("sum_micro"),
            least(col("b.mn"), col("dl.mn")).as("min_value"),
            greatest(col("b.mx"), col("dl.mx")).as("max_value"))
        merged.select(col("user_id"), col("n_events"), col("sum_micro"),
            col("min_value"), col("max_value"),
            Num.r6(col("sum_micro") / (col("n_events") * lit(1000000.0)))
              .as("avg_value"))
          .orderBy(col("user_id"))
      },
      Some(s"""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
            AS sum_micro,
          MIN(value) AS min_value, MAX(value) AS max_value,
          ${Num.sql("SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / (COUNT(*) * 1000000.0)", 6)}
            AS avg_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id"""),
      "incremental view maintenance: per-user aggregates merged from base+delta partials; the oracle recomputes directly from the full log, so hash-match proves merge = recompute"),

    // --------------------------------------------------------------- q226
    // Incremental JOIN maintenance — q141's discipline pushed through
    // a join: the enriched-aggregate view Σ(events ⋈ customer) is
    // maintained as merge(base ⋈ dim, delta ⋈ dim) where base/delta
    // split the log by event_id parity, and the DuckDB oracle
    // recomputes the SAME view from one direct join over the full
    // log — the hash-match is the proof that join distributes over
    // the union, i.e. that an O(delta) refresh of an enriched
    // materialized view is sound. Values go through per-row integer
    // micro quantization so the merged sums are associativity-proof.
    // At 100 TB: each part is one broadcast-dim join + partial agg on
    // the bounded (segment × type) grid; the delta batch never
    // re-touches base rows.
    Query(
      "q226_incremental_join",
      (s, d) => {
        val micro = floor(col("value") * 1000000 + lit(0.5)).cast("long")
        val dim = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
        def part(even: Boolean) = Tables.events(s, d)
          .filter((col("event_id") % 2 === 0) === even)
          .select(col("user_id"), col("event_type"), micro.as("vm"))
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("vm")).as("sm"))
        part(even = true).unionByName(part(even = false))
          .groupBy(col("c_mktsegment"), col("event_type"))
          .agg(sum(col("n")).as("n_events"), sum(col("sm")).as("sum_micro"))
          .select(col("c_mktsegment"), col("event_type"), col("n_events"),
            col("sum_micro"),
            Num.r6(col("sum_micro") / (col("n_events") * lit(1000000.0)))
              .as("avg_value"))
          .orderBy(col("c_mktsegment"), col("event_type"))
      },
      Some(s"""
        SELECT c_mktsegment, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
            AS sum_micro,
          ${Num.sql("SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / (COUNT(*) * 1000000.0)", 6)}
            AS avg_value
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY c_mktsegment, event_type
        ORDER BY c_mktsegment, event_type"""),
      "incremental maintenance of an ENRICHED view: merge(base JOIN dim, delta JOIN dim) hash-matches the direct full join — join distributes over union, O(delta) refresh is sound"),

    // --------------------------------------------------------------- q143
    // Functional-dependency discovery (schema profiling): for each
    // candidate pair A→B, the dependency holds iff every A value maps
    // to exactly one B value — i.e. COUNT(DISTINCT A) equals
    // COUNT(DISTINCT (A,B)). Reports both counts, the verdict, and
    // the number of violating A values (those with >1 distinct B).
    // The metadata-inference pass that finds natural keys, derivable
    // columns and denormalization candidates before anyone writes a
    // join. Scale: each candidate is two partial-aggregated distinct
    // counts plus one grouped distinct — per-candidate narrow jobs,
    // no row ever carries more than the two columns.
    Query(
      "q143_functional_deps",
      (s, d) => {
        def cand(table: String, df: org.apache.spark.sql.DataFrame,
            lhs: String, rhs: String) = {
          val pairs = df.select(col(lhs).as("a"), col(rhs).as("b"))
          val perA = pairs.groupBy(col("a"))
            .agg(count_distinct(col("b")).as("nb"))
          perA.agg(count(lit(1)).as("n_lhs"), sum(col("nb")).as("n_pairs"),
              count(when(col("nb") > 1, 1)).as("n_violating"))
            .select(lit(s"$table.$lhs -> $table.$rhs").as("candidate"),
              col("n_lhs"), col("n_pairs"),
              (col("n_violating") === 0).as("holds"), col("n_violating"))
        }
        Seq(
          cand("customer", Tables.customer(s, d), "c_custkey", "c_mktsegment"),
          cand("customer", Tables.customer(s, d), "c_nationkey", "c_mktsegment"),
          cand("orders", Tables.orders(s, d), "o_orderkey", "o_orderpriority"),
          cand("orders", Tables.orders(s, d), "o_custkey", "o_orderstatus"),
          cand("documents", Tables.documents(s, d), "doc_id", "source"),
          cand("documents", Tables.documents(s, d), "source", "lang"),
          cand("events", Tables.events(s, d), "user_id", "event_type"),
          cand("nation", Tables.nation(s, d), "n_nationkey", "n_regionkey"))
          .reduce(_.unionByName(_))
          .orderBy(col("candidate"))
      },
      Some {
        def cand(table: String, lhs: String, rhs: String) =
          s"""SELECT '$table.$lhs -> $table.$rhs' AS candidate,
            CAST(COUNT(*) AS BIGINT) AS n_lhs,
            CAST(SUM(nb) AS BIGINT) AS n_pairs,
            COUNT(*) FILTER (WHERE nb > 1) = 0 AS holds,
            CAST(COUNT(*) FILTER (WHERE nb > 1) AS BIGINT) AS n_violating
          FROM (SELECT $lhs AS a, COUNT(DISTINCT $rhs) AS nb
                FROM $table GROUP BY $lhs)"""
        Seq(
          cand("customer", "c_custkey", "c_mktsegment"),
          cand("customer", "c_nationkey", "c_mktsegment"),
          cand("orders", "o_orderkey", "o_orderpriority"),
          cand("orders", "o_custkey", "o_orderstatus"),
          cand("documents", "doc_id", "source"),
          cand("documents", "source", "lang"),
          cand("events", "user_id", "event_type"),
          cand("nation", "n_nationkey", "n_regionkey"))
          .mkString("", "\n          UNION ALL ", "\n          ORDER BY candidate")
      },
      "functional-dependency discovery over 8 candidate column pairs: per-candidate distinct counts, holds verdict, violating-key count — the natural-key / derivable-column profiling pass"))
}
