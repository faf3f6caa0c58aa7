package graft.ext

import graft.{Query, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Storage-layout operators: the engine-side math behind multi-
  * dimensional file clustering (Z-order / space-filling curves). At
  * 100 TB the scan you avoid is worth more than the scan you speed
  * up — a Z-ordered layout lets a 2-D predicate prune most files,
  * where a 1-D sort only prunes on its leading column. The curve key
  * is pure integer arithmetic, so the audit is oracle-exact. */
object Layout {

  /** Bit i of a small non-negative integer column, arithmetically
    * ((x / 2^i) mod 2) — identical in Spark and ANSI SQL. */
  private def bit(x: Column, i: Int): Column =
    pmod(floor(x / lit(math.pow(2, i))).cast("long"), lit(2L))

  private def sqlBit(x: String, i: Int): String =
    s"CAST(FLOOR(($x) / ${1 << i}) AS BIGINT) % 2"

  def queries: Seq[Query] = Seq(
    // --------------------------------------------------------------- q139
    // Z-order layout audit over orders(o_orderdate, o_custkey): each
    // dimension is quantized to 16 equal-width bins from a broadcast
    // 1-row min/max aggregate, the two 4-bit bin ids are bit-
    // interleaved into an 8-bit Morton cell key, and the query
    // reports per-cell row counts plus the raw min/max of both
    // dimensions inside the cell. Sorting files by zcell gives every
    // cell tight ranges on BOTH columns — exactly the min/max file
    // statistics a 2-D predicate prunes on. A 1-D date sort would
    // leave o_custkey ranges spanning the whole domain.
    // Scale: bin boundaries are a broadcast scalar row (no global
    // sort), the cell key is a narrow per-row expression, and the
    // audit is one groupBy over <= 256 cells.
    Query(
      "q139_zorder_layout",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"),
            col("o_custkey"))
        val bounds = o.agg(min(col("day")).as("dmin"), max(col("day")).as("dmax"),
          min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"))
        def bin(x: Column, lo: Column, hi: Column): Column =
          floor((x - lo) * lit(16) / (hi + lit(1) - lo)).cast("long")
        def interleave(dbin: Column, cbin: Column): Column =
          (0 until 4).map(i =>
            bit(dbin, i) * lit(1L << (2 * i + 1)) +
              bit(cbin, i) * lit(1L << (2 * i))).reduce(_ + _)
        val binned = o.crossJoin(broadcast(bounds))
          .select(col("day"), col("o_custkey"),
            bin(col("day"), col("dmin"), col("dmax")).as("dbin"),
            bin(col("o_custkey"), col("cmin"), col("cmax")).as("cbin"))
        binned
          .select(interleave(col("dbin"), col("cbin")).as("zcell"),
            col("dbin"), col("cbin"), col("day"), col("o_custkey"))
          .groupBy(col("zcell"), col("dbin"), col("cbin"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("day")).as("min_day"), max(col("day")).as("max_day"),
            min(col("o_custkey")).as("min_cust"),
            max(col("o_custkey")).as("max_cust"))
          .orderBy(col("zcell"))
      },
      Some {
        val inter = (0 until 4).map(i =>
          s"${sqlBit("dbin", i)} * ${1L << (2 * i + 1)} + " +
            s"${sqlBit("cbin", i)} * ${1L << (2 * i)}").mkString(" + ")
        s"""
        WITH o AS (
          SELECT CAST(date_diff('day', DATE '1970-01-01',
            CAST(o_orderdate AS DATE)) AS BIGINT) AS day, o_custkey
          FROM orders),
        bounds AS (
          SELECT MIN(day) AS dmin, MAX(day) AS dmax,
            MIN(o_custkey) AS cmin, MAX(o_custkey) AS cmax FROM o),
        binned AS (
          SELECT day, o_custkey,
            CAST(FLOOR((day - dmin) * 16 / (dmax + 1 - dmin)) AS BIGINT)
              AS dbin,
            CAST(FLOOR((o_custkey - cmin) * 16 / (cmax + 1 - cmin)) AS BIGINT)
              AS cbin
          FROM o CROSS JOIN bounds)
        SELECT CAST($inter AS BIGINT) AS zcell, dbin, cbin,
          CAST(COUNT(*) AS BIGINT) AS n_rows,
          MIN(day) AS min_day, MAX(day) AS max_day,
          MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust
        FROM binned
        GROUP BY 1, 2, 3
        ORDER BY zcell"""
      },
      "Z-order (Morton) layout audit: 16x16 equal-width bins over (o_orderdate, o_custkey) bit-interleaved into cell keys, per-cell row counts and min/max pruning stats"))
}
