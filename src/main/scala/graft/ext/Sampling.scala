package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators a training pipeline runs constantly:
  * deterministic hash sampling (reproducible across engines, machines
  * and reruns — unlike seeded RNG sampling), train/test splitting by the
  * same mechanism, label-balance audits, and unpivot for long-format
  * exports. The hash selector reuses the engine's md5→int64 primitive,
  * so all of these are oracle-exact. */
object Sampling {

  /** Deterministic percentage selector: stable bucket in [0,100) from
    * the row key — membership never changes across runs or engines. */
  def hashBucket(key: Column): Column = Dedup.h60(key.cast("string")) % 100

  def sqlHashBucket(e: String): String =
    s"${Dedup.sqlH60(s"CAST($e AS VARCHAR)")} % 100"

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q69
    Query(
      "q69_unpivot",
      (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_custkey") < 50)
          .select(col("c_custkey"), col("c_acctbal"),
            col("c_nationkey").cast("double").as("c_nation_d"))
          .unpivot(Array(col("c_custkey")),
            Array(col("c_acctbal"), col("c_nation_d")),
            "attribute", "value")
          // Spark's unpivot keeps NULL values; DuckDB UNPIVOT excludes
          // them by default — align explicitly (no-op on this data)
          .filter(col("value").isNotNull)
          .orderBy(col("c_custkey"), col("attribute")),
      Some("""
        SELECT c_custkey, attribute, value
        FROM (
          SELECT c_custkey, c_acctbal,
            CAST(c_nationkey AS DOUBLE) AS c_nation_d
          FROM customer WHERE c_custkey < 50)
        UNPIVOT (value FOR attribute IN (c_acctbal, c_nation_d))
        ORDER BY c_custkey, attribute"""),
      "unpivot/melt to long format"),

    // ---------------------------------------------------------------- q70
    Query(
      "q70_hash_sample",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(hashBucket(col("l_orderkey") * 10 + col("l_linenumber")) < 10)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_sampled"),
            Num.r4(avg(col("l_quantity"))).as("avg_qty"))
          .orderBy(col("l_returnflag")),
      Some(s"""
        SELECT l_returnflag, COUNT(*) AS n_sampled,
          ${Num.sql("AVG(l_quantity)", 4)} AS avg_qty
        FROM lineitem
        WHERE ${sqlHashBucket("l_orderkey * 10 + l_linenumber")} < 10
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "~10% deterministic hash sample — reproducible membership, no RNG"),

    // ---------------------------------------------------------------- q71
    Query(
      "q71_train_test_split",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("split",
            when(hashBucket(col("doc_id")) < 80, "train").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("doc_id")).as("first_doc"))
          .orderBy(col("split")),
      Some(s"""
        SELECT CASE WHEN ${sqlHashBucket("doc_id")} < 80
                 THEN 'train' ELSE 'test' END AS split,
          COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          MIN(doc_id) AS first_doc
        FROM documents
        GROUP BY 1 ORDER BY split"""),
      "deterministic 80/20 train/test split by document hash"),

    // ---------------------------------------------------------------- q72
    Query(
      "q72_label_balance",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val totalDf = emb.agg(count(lit(1)).cast("double").as("n_total"))
        emb.groupBy(col("label"))
          .agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(totalDf))
          .select(col("label"), col("n"),
            Num.r4(col("n") / col("n_total")).as("fraction"))
          .orderBy(col("label"))
      },
      Some(s"""
        SELECT label, COUNT(*) AS n,
          ${Num.sql("COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM embeddings)", 4)} AS fraction
        FROM embeddings
        GROUP BY label ORDER BY label"""),
      "label distribution audit over the embeddings table"),

    // ---------------------------------------------------------------- q73
    Query(
      "q73_latest_per_key",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), col("value"))
          .orderBy(col("user_id"))
      },
      Some("""
        SELECT user_id, event_id, ts, event_type, value
        FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
        WHERE rn = 1
        ORDER BY user_id"""),
      "record-level dedup by recency: keep each key's latest event"),

    // ---------------------------------------------------------------- q74
    Query(
      "q74_iqr_outliers",
      (s, d) => {
        val ev = Tables.events(s, d)
        val bounds = ev.groupBy(col("event_type"))
          .agg(percentile(col("value"), lit(0.25)).as("q1"),
            percentile(col("value"), lit(0.75)).as("q3"))
          .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
          .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
        ev.join(broadcast(bounds), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
              .otherwise(0L)).as("n_outliers"),
            Num.r4(first(col("lo"))).as("lo"),
            Num.r4(first(col("hi"))).as("hi"))
          .orderBy(col("event_type"))
      },
      Some(s"""
        WITH b AS (
          SELECT event_type,
            QUANTILE_CONT(value, 0.25) AS q1, QUANTILE_CONT(value, 0.75) AS q3
          FROM events GROUP BY event_type),
        bb AS (
          SELECT event_type, q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
          FROM b)
        SELECT e.event_type, COUNT(*) AS n,
          CAST(SUM(CASE WHEN e.value < bb.lo OR e.value > bb.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          ${Num.sql("MIN(bb.lo)", 4)} AS lo,
          ${Num.sql("MIN(bb.hi)", 4)} AS hi
        FROM events e JOIN bb USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type"""),
      "IQR-rule outlier audit per group (1.5x interquartile fences, broadcast bounds join)"),

    // ---------------------------------------------------------------- q75
    Query(
      "q75_stratified_sample",
      (s, d) =>
        Tables.embeddings(s, d)
          .filter(hashBucket(col("vec_id")) < 20) // 20% within EVERY stratum
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_sampled"),
            min(col("vec_id")).as("first_vec"))
          .orderBy(col("label")),
      Some(s"""
        SELECT label, COUNT(*) AS n_sampled, MIN(vec_id) AS first_vec
        FROM embeddings
        WHERE ${sqlHashBucket("vec_id")} < 20
        GROUP BY label ORDER BY label"""),
      "deterministic 20% stratified sample (hash membership is label-independent, so every stratum is sampled at the same rate)"),

    // --------------------------------------------------------------- q144
    // Two-phase distributed top-k: each source shard first keeps its
    // OWN top-10 docs by length (a partitioned, bounded rank), and
    // the global top-10 is taken from the union of those partials —
    // sound because any global top-10 member is necessarily in its
    // shard's top-10. The DuckDB oracle runs the global ORDER BY
    // LIMIT directly, so the hash-match proves the shard-merge plan
    // equals the single global sort it replaces. This is how top-k
    // actually executes at 100 TB: k rows per shard cross the wire,
    // never the table.
    Query(
      "q144_topk_merge",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val perShard = Window.partitionBy(col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        val partials = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("rn", row_number().over(perShard))
          .filter(col("rn") <= 10).drop("rn")
        val globalTop = partials
          .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
        globalTop.withColumn("rank", row_number().over(
            Window.orderBy(col("n_chars").desc, col("doc_id"))))
          .select(col("rank"), col("doc_id"), col("source"), col("n_chars"))
          .orderBy(col("rank"))
      },
      Some("""
        SELECT ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank,
          doc_id, source, n_chars
        FROM documents
        ORDER BY n_chars DESC, doc_id
        LIMIT 10"""),
      "two-phase distributed top-k: per-source partial top-10s merged into the global top-10; the oracle's direct global sort proves the merge exact"),

    // --------------------------------------------------------------- q228
    // Sampler-bias audit: does the deterministic 10% hash sample
    // (q70's selector on doc_id) preserve the corpus's source mix?
    // Per source: population/sample counts and shares, the realized
    // sampling rate, and |sample_share − pop_share| — the audit a
    // pipeline runs before trusting any sampled statistic, and the
    // regression canary for the hash selector itself (a biased bucket
    // function shows up here before it corrupts downstream stats).
    // One pass, one bounded grid, two broadcast scalars.
    Query(
      "q228_sample_bias_audit",
      (s, d) => {
        val per = Tables.documents(s, d)
          .select(col("source"),
            (hashBucket(col("doc_id")) < 10).as("insample"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_pop"),
            sum(when(col("insample"), 1L).otherwise(0L)).as("n_sample"))
        val tot = per.agg(sum(col("n_pop")).as("t_pop"),
          sum(col("n_sample")).as("t_sample"))
        per.crossJoin(broadcast(tot))
          .select(col("source"), col("n_pop"), col("n_sample"),
            Num.r6(col("n_pop").cast("double") / col("t_pop"))
              .as("pop_share"),
            when(col("t_sample") > 0,
              Num.r6(col("n_sample").cast("double") / col("t_sample")))
              .as("sample_share"),
            Num.r6(col("n_sample").cast("double") / col("n_pop"))
              .as("rate"),
            when(col("t_sample") > 0,
              Num.r6(abs(col("n_sample").cast("double") / col("t_sample")
                - col("n_pop").cast("double") / col("t_pop"))))
              .as("abs_bias"))
          .orderBy(col("source"))
      },
      Some(s"""
        WITH per AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pop,
            CAST(COUNT(*) FILTER (WHERE ${sqlHashBucket("doc_id")} < 10)
                 AS BIGINT) AS n_sample
          FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(n_pop) AS BIGINT) AS t_pop,
                  CAST(SUM(n_sample) AS BIGINT) AS t_sample FROM per)
        SELECT source, n_pop, n_sample,
          FLOOR((CAST(n_pop AS DOUBLE) / t_pop) * 1000000 + 0.500001)
            / 1000000 AS pop_share,
          CASE WHEN t_sample > 0 THEN
            FLOOR((CAST(n_sample AS DOUBLE) / t_sample) * 1000000 + 0.500001)
              / 1000000 END AS sample_share,
          FLOOR((CAST(n_sample AS DOUBLE) / n_pop) * 1000000 + 0.500001)
            / 1000000 AS rate,
          CASE WHEN t_sample > 0 THEN
            FLOOR(ABS(CAST(n_sample AS DOUBLE) / t_sample
                      - CAST(n_pop AS DOUBLE) / t_pop)
                  * 1000000 + 0.500001) / 1000000 END AS abs_bias
        FROM per CROSS JOIN tot ORDER BY source"""),
      "sampler-bias audit: per-source population vs 10% hash-sample shares, realized rate, and absolute mix bias"),

    // ---------------------------------------------------------------- q402
    // Hash-uniformity audit: KS distance of the md5 A/B assignment
    // hash h60("ab|user_id")/2⁶⁰ from U(0,1) over distinct users —
    // the validity check under every hash-based sampler, salting key
    // and A/B arm in this engine (q75, q97, q107, q361, q389): a
    // biased hash silently biases them all. Sup over the 1024-bucket
    // grid (a documented lower bound of the exact D whose resolution
    // error ≤ 1/1024); the argmax is decided on the exact integer
    // |1024·cum − (g+1)·n|, and √n·D is reported for the Kolmogorov
    // scale. Bucket counts are one hash + one groupBy over users.
    Query(
      "q402_hash_uniformity",
      (s, d) => {
        val users = Tables.events(s, d).select(col("user_id")).distinct()
          .select((Dedup.h60(concat(lit("ab|"), col("user_id").cast("string")))
            % 1152921504606846976L).as("h")) // 2^60
          .select(expr("h div 1125899906842624").cast("long").as("g")) // 2^50 → 1024 buckets
        val hist = users.groupBy(col("g")).agg(count(lit(1)).as("c"))
        val wc = Window.orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wc))
          .localCheckpoint() // ≤1024 bounded rows
        val tot = cum.agg(max(col("cum")).as("n"))
        cum.crossJoin(broadcast(tot))
          .select(col("g"), col("n"),
            abs(lit(1024) * col("cum") - (col("g") + 1) * col("n")).as("dev"))
          .orderBy(col("dev").desc, col("g")).limit(1)
          .select(col("n").as("n_users"),
            col("g").as("argmax_bucket"),
            Num.r6(col("dev").cast("double")
              / (col("n").cast("double") * lit(1024.0))).as("d_stat"),
            Num.r4(sqrt(col("n").cast("double")) * col("dev").cast("double")
              / (col("n").cast("double") * lit(1024.0))).as("sqrt_n_d"))
      },
      Some(s"""
        WITH users AS (
          SELECT (${Dedup.sqlH60("'ab|' || CAST(user_id AS VARCHAR)")}
            % 1152921504606846976) // 1125899906842624 AS g
          FROM (SELECT DISTINCT user_id FROM events)),
        hist AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c
                 FROM users GROUP BY g),
        cum AS (
          SELECT g, SUM(c) OVER (ORDER BY g
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        tot AS (SELECT CAST(MAX(cum) AS BIGINT) AS n FROM cum)
        SELECT n AS n_users, g AS argmax_bucket,
          FLOOR((CAST(ABS(1024 * cum - (g + 1) * n) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 1024.0)) * 1000000 + 0.500001)
            / 1000000 AS d_stat,
          FLOOR((SQRT(CAST(n AS DOUBLE)) * ABS(1024 * cum - (g + 1) * n)
                 / (CAST(n AS DOUBLE) * 1024.0)) * 10000 + 0.500001) / 10000
            AS sqrt_n_d
        FROM cum CROSS JOIN tot
        ORDER BY ABS(1024 * cum - (g + 1) * n) DESC, g LIMIT 1"""),
      "KS uniformity audit of the md5 sampling/arm hash over distinct users: exact integer 1024-bucket sup, sqrt(n)*D Kolmogorov scale"))
}
