package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.functions._

/** The remaining classic sketch families, built DETERMINISTIC (seeded
  * md5-derived hashes, the q76-KMV primitive) so — unusually for
  * sketches — they are oracle-exact: Count-Min frequency estimation
  * and Bloom-filter membership with a measured false-positive rate.
  * Together with KMV (q76), HLL++ (q42), MinHash (q34), SimHash (q36)
  * and Space-Saving (streaming TopK) this completes the sketch
  * toolbox a 100 TB pipeline leans on when exact state is too big.
  */
object Sketches {

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q132
    // Count-Min sketch (depth 4 × width 1024) over event user_ids,
    // then point-estimates for the 10 highest-frequency users vs their
    // true counts. The CMS guarantee (est >= true, overestimate
    // bounded by row collisions) is visible in the output columns.
    // Scale: the sketch build is ONE partial-aggregated pass over a
    // 4×1024-cell key space — constant-size state regardless of the
    // user universe; estimates join a broadcast 10-row probe set
    // against the 4096-row sketch.
    Query(
      "q132_count_min",
      (s, d) => {
        val D = 4; val W = 1024
        val ev = Tables.events(s, d)
          .select(col("user_id").cast("string").as("uid"))
        def hj(j: Int, c: org.apache.spark.sql.Column) =
          Dedup.h60(concat(lit(s"cms$j|"), c)) % W
        val cells = ev.select(explode(array((0 until D).map(j =>
            struct(lit(j).as("depth"), hj(j, col("uid")).as("bucket"))): _*))
            .as("c"))
          .select(col("c.depth"), col("c.bucket"))
          .groupBy(col("depth"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
        val truth = Tables.events(s, d)
          .groupBy(col("user_id")).agg(count(lit(1)).as("true_n"))
          .orderBy(col("true_n").desc, col("user_id")).limit(10)
        val probes = truth.select(col("user_id"), col("true_n"),
          explode(array((0 until D).map(j =>
            struct(lit(j).as("depth"),
              hj(j, col("user_id").cast("string")).as("bucket"))): _*)).as("c"))
          .select(col("user_id"), col("true_n"),
            col("c.depth"), col("c.bucket"))
        broadcast(probes).join(cells, Seq("depth", "bucket"))
          .groupBy(col("user_id"), col("true_n"))
          .agg(min(col("cnt")).as("cms_est"))
          .select(col("user_id"), col("true_n"), col("cms_est"),
            (col("cms_est") - col("true_n")).as("overestimate"))
          .orderBy(col("true_n").desc, col("user_id"))
      },
      Some {
        def hj(j: Int, e: String) =
          s"${Dedup.sqlH60(s"'cms$j|' || $e")} % 1024"
        val cellUnion = (0 until 4).map(j =>
          s"SELECT $j AS depth, ${hj(j, "CAST(user_id AS VARCHAR)")} AS bucket FROM events")
          .mkString("\n            UNION ALL ")
        val probeUnion = (0 until 4).map(j =>
          s"SELECT user_id, true_n, $j AS depth, ${hj(j, "CAST(user_id AS VARCHAR)")} AS bucket FROM truth")
          .mkString("\n            UNION ALL ")
        s"""
        WITH cells AS (
          SELECT depth, bucket, COUNT(*) AS cnt FROM (
            $cellUnion)
          GROUP BY depth, bucket),
        truth AS (
          SELECT user_id, COUNT(*) AS true_n FROM events
          GROUP BY user_id ORDER BY true_n DESC, user_id LIMIT 10),
        probes AS (
            $probeUnion)
        SELECT user_id, CAST(true_n AS BIGINT) AS true_n,
          CAST(MIN(cnt) AS BIGINT) AS cms_est,
          CAST(MIN(cnt) - true_n AS BIGINT) AS overestimate
        FROM probes JOIN cells USING (depth, bucket)
        GROUP BY user_id, true_n
        ORDER BY true_n DESC, user_id"""
      },
      "Count-Min sketch (4x1024, seeded md5 hashes -> deterministic and oracle-exact): point estimates vs true counts for the top-10 users, overestimate visible"),

    // --------------------------------------------------------------- q133
    // Bloom-filter membership audit: a 2048-bit, 3-hash Bloom filter
    // over supplier keys probed with every customer key — reports
    // probe count, bloom positives, true members (exact anti-join
    // ground truth) and the measured false-positive rate. The
    // pre-join filter primitive (ship the bit set, not the table);
    // deterministic hashes make even the FP count reproducible.
    // Scale: the bit set is a <= m-row table (broadcast); probing is
    // a narrow map + one small join, ground truth one semi join.
    Query(
      "q133_bloom_filter",
      (s, d) => {
        val M = 2048; val K = 3
        def pos(j: Int, c: org.apache.spark.sql.Column) =
          Dedup.h60(concat(lit(s"bloom$j|"), c)) % M
        val bits = Tables.supplier(s, d)
          .select(explode(array((0 until K).map(j =>
            pos(j, col("s_suppkey").cast("string"))): _*)).as("bit"))
          .distinct() // the set bit positions
        val probes = Tables.customer(s, d)
          .select(col("c_custkey"),
            array((0 until K).map(j =>
              pos(j, col("c_custkey").cast("string"))): _*).as("pbits"))
        val tested = probes.select(col("c_custkey"),
            explode(col("pbits")).as("bit"))
          .join(broadcast(bits.withColumn("set", lit(1))), Seq("bit"), "left")
          .groupBy(col("c_custkey"))
          .agg((count(lit(1)) === count(col("set"))).as("bloom_positive"))
        val members = Tables.supplier(s, d)
          .select(col("s_suppkey").as("c_custkey")).distinct()
          .withColumn("is_member", lit(1))
        tested.join(members, Seq("c_custkey"), "left")
          .agg(count(lit(1)).as("n_probes"),
            count(when(col("bloom_positive"), 1)).as("n_bloom_positive"),
            count(col("is_member")).as("n_true_members"),
            count(when(col("bloom_positive") && col("is_member").isNull, 1))
              .as("n_false_positives"))
          .select(col("n_probes"), col("n_bloom_positive"),
            col("n_true_members"), col("n_false_positives"),
            Num.r6(col("n_false_positives")
              / (col("n_probes") - col("n_true_members")).cast("double"))
              .as("fp_rate"))
      },
      Some {
        def pos(j: Int, e: String) =
          s"${Dedup.sqlH60(s"'bloom$j|' || $e")} % 2048"
        val bitUnion = (0 until 3).map(j =>
          s"SELECT ${pos(j, "CAST(s_suppkey AS VARCHAR)")} AS bit FROM supplier")
          .mkString("\n            UNION ALL ")
        val probeBits = (0 until 3).map(j =>
          s"SELECT c_custkey, ${pos(j, "CAST(c_custkey AS VARCHAR)")} AS bit FROM customer")
          .mkString("\n            UNION ALL ")
        s"""
        WITH bits AS (SELECT DISTINCT bit FROM (
            $bitUnion)),
        pb AS (
            $probeBits),
        tested AS (
          SELECT c_custkey,
            COUNT(*) = COUNT(b.bit) AS bloom_positive
          FROM pb LEFT JOIN bits b USING (bit)
          GROUP BY c_custkey),
        members AS (SELECT DISTINCT s_suppkey AS c_custkey, 1 AS is_member
                    FROM supplier)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
          CAST(COUNT(*) FILTER (WHERE bloom_positive) AS BIGINT)
            AS n_bloom_positive,
          CAST(COUNT(is_member) AS BIGINT) AS n_true_members,
          CAST(COUNT(*) FILTER (WHERE bloom_positive AND is_member IS NULL)
            AS BIGINT) AS n_false_positives,
          ${Num.sql("COUNT(*) FILTER (WHERE bloom_positive AND is_member IS NULL) / CAST(COUNT(*) - COUNT(is_member) AS DOUBLE)", 6)} AS fp_rate
        FROM tested LEFT JOIN members USING (c_custkey)"""
      },
      "Bloom-filter membership audit (2048 bits, 3 seeded hashes): customer keys probed against the supplier-key filter with exact ground truth and measured FP rate"))
}
