package graft.ops

import graft.ext.Exact
import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational wave: remaining analytic window functions, array
  * scalar functions, edit distance, conditional scalars. */
object Relational3 {

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q61
    Query(
      "q61_rank_variants",
      (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 200)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"),
            ntile(4).over(w).as("quartile"),
            Num.r4(percent_rank().over(w)).as("pct_rank"),
            Num.r4(cume_dist().over(w)).as("cume"),
            dense_rank().over(w).as("drank"),
            first(col("l_extendedprice")).over(wf).as("cheapest"),
            last(col("l_extendedprice")).over(wf).as("priciest"))
          // (l_orderkey, l_linenumber) is not unique; l_extendedprice
          // completes the total order (unique triple in this data)
          .orderBy(col("l_returnflag"), col("l_orderkey"),
            col("l_linenumber"), col("l_extendedprice"))
      },
      Some(s"""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          NTILE(4) OVER w AS quartile,
          ${Num.sql("PERCENT_RANK() OVER w", 4)} AS pct_rank,
          ${Num.sql("CUME_DIST() OVER w", 4)} AS cume,
          DENSE_RANK() OVER w AS drank,
          FIRST_VALUE(l_extendedprice) OVER wf AS cheapest,
          LAST_VALUE(l_extendedprice) OVER wf AS priciest
        FROM lineitem
        WHERE l_orderkey < 200
        WINDOW
          w AS (PARTITION BY l_returnflag
                ORDER BY l_extendedprice, l_orderkey, l_linenumber),
          wf AS (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY l_returnflag, l_orderkey, l_linenumber, l_extendedprice"""),
      "ntile / percent_rank / cume_dist / dense_rank / first+last over full frame"),

    // ---------------------------------------------------------------- q62
    Query(
      "q62_array_funcs",
      (s, d) => {
        val v = graft.ext.Similarity.toDouble(col("embedding"))
        Tables.embeddings(s, d)
          .filter(col("vec_id") < 100)
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            Num.r4(element_at(v, 1)).as("first_dim"),
            Num.r4(element_at(v, -1)).as("last_dim"),
            Num.r4(aggregate(v, lit(0.0), (acc, x) => acc + x)).as("sum_dims"),
            Num.r4(array_max(v)).as("max_dim"),
            Num.r4(array_min(v)).as("min_dim"),
            Num.r4(aggregate(slice(v, 1, 8), lit(0.0), (acc, x) => acc + x))
              .as("sum_first8"),
            size(filter(v, x => x > 0)).cast("long").as("n_positive"))
          .orderBy(col("vec_id"))
      },
      Some {
        val v = "CAST(embedding AS DOUBLE[])"
        s"""
        SELECT vec_id,
          CAST(LEN(embedding) AS BIGINT) AS dim,
          ${Num.sql(s"$v[1]", 4)} AS first_dim,
          ${Num.sql(s"$v[-1]", 4)} AS last_dim,
          ${Num.sql(s"LIST_SUM($v)", 4)} AS sum_dims,
          ${Num.sql(s"LIST_MAX($v)", 4)} AS max_dim,
          ${Num.sql(s"LIST_MIN($v)", 4)} AS min_dim,
          ${Num.sql(s"LIST_SUM(($v)[1:8])", 4)} AS sum_first8,
          CAST(LEN(LIST_FILTER($v, x -> x > 0)) AS BIGINT) AS n_positive
        FROM embeddings
        WHERE vec_id < 100
        ORDER BY vec_id"""
      },
      "array scalar library over embedding columns (indexing, slice, fold, min/max, filter)"),

    // ---------------------------------------------------------------- q64
    Query(
      "q64_edit_distance",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(col("doc_id") < 30)
          .select(col("doc_id"), substring(col("text"), 1, 60).as("prefix"))
        docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
            levenshtein(col("a.prefix"), col("b.prefix")).as("edit_dist"))
          .filter(col("edit_dist") <= 45)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""
        WITH p AS (
          SELECT doc_id, SUBSTRING(text, 1, 60) AS prefix
          FROM documents WHERE doc_id < 30)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          LEVENSHTEIN(a.prefix, b.prefix) AS edit_dist
        FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE LEVENSHTEIN(a.prefix, b.prefix) <= 45
        ORDER BY doc_a, doc_b"""),
      "pairwise Levenshtein edit distance on text prefixes (integer-exact both engines)"),

    // ---------------------------------------------------------------- q66
    Query(
      "q66_conditional_scalars",
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") < 300)
          .select(col("l_orderkey"), col("l_linenumber"),
            greatest(col("l_discount"), col("l_tax")).as("max_rate"),
            least(col("l_discount"), col("l_tax")).as("min_rate"),
            nullif(col("l_discount"), lit(0.0)).as("disc_or_null"),
            coalesce(nullif(col("l_discount"), lit(0.0)), col("l_tax"))
              .as("effective_rate"),
            when(col("l_returnflag") === "R", col("l_quantity")).as("returned_qty"))
          // non-unique (okey, line): sort every output column, with the
          // nullable ones last and NULLS FIRST pinned on both sides
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("max_rate"), col("min_rate"),
            col("disc_or_null").asc_nulls_first,
            col("effective_rate"), col("returned_qty").asc_nulls_first),
      Some("""
        SELECT l_orderkey, l_linenumber,
          GREATEST(l_discount, l_tax) AS max_rate,
          LEAST(l_discount, l_tax) AS min_rate,
          NULLIF(l_discount, 0.0) AS disc_or_null,
          COALESCE(NULLIF(l_discount, 0.0), l_tax) AS effective_rate,
          CASE WHEN l_returnflag = 'R' THEN l_quantity END AS returned_qty
        FROM lineitem
        WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber, max_rate, min_rate,
          disc_or_null NULLS FIRST, effective_rate, returned_qty NULLS FIRST"""),
      "conditional scalars: greatest/least/nullif/coalesce/partial CASE"),

    // ---------------------------------------------------------------- q411
    // Pooled log-log price elasticity of demand over lineitem: the
    // OLS slope of ln(quantity) on ln(unit price), with its SE and
    // R² — the canonical demand-curve read on the TPC-H side of the
    // house (the retail twin of q145's OLS trend on events). Unit
    // price clears to exact integer cents BEFORE the log (extended
    // price is line-total, so cents = extprice·100/qty truncated);
    // both lns are micro-quantized per row and the five regression
    // sums are exact integers on DECIMAL/HUGEINT.
    Query(
      "q411_price_elasticity",
      (s, d) => {
        val rows = Tables.lineitem(s, d)
          .select(col("l_quantity").cast("long").as("q"),
            expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
              .as("cents_total"))
          .filter(col("q") > 0)
          .select(
            floor(log(expr("cast(cents_total div q as double)")) * lit(1e6)
              + lit(0.5)).cast("long").as("x"),
            floor(log(col("q").cast("double")) * lit(1e6) + lit(0.5))
              .cast("long").as("y"))
        val ms = Exact.olsMoments()
        val m = rows.agg(ms.head, ms.tail: _*)
        m.select(col("n").as("n_lines"),
            Num.r4((col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double")
                - col("sx").cast("double") * col("sx").cast("double")))
              .as("elasticity"),
            Num.r4({
              val n = col("n").cast("double")
              val cxx = n * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")
              val cyy = n * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")
              val cxy = n * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")
              cxy * cxy / (cxx * cyy)
            }).as("r2"),
            Num.r6({
              val n = col("n").cast("double")
              val cxx = n * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")
              val cyy = n * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double")
              val cxy = n * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")
              sqrt((cyy - cxy * cxy / cxx) / ((n - 2.0) * cxx))
            }).as("se_elasticity"))
      },
      Some("""
        WITH rows_ AS (
          SELECT
            CAST(FLOOR(LN(CAST((CAST(CAST(l_extendedprice AS DECIMAL(18,2))
              * 100 AS BIGINT)) // CAST(l_quantity AS BIGINT) AS DOUBLE))
              * 1e6 + 0.5) AS BIGINT) AS x,
            CAST(FLOOR(LN(CAST(CAST(l_quantity AS BIGINT) AS DOUBLE))
              * 1e6 + 0.5) AS BIGINT) AS y
          FROM lineitem WHERE CAST(l_quantity AS BIGINT) > 0),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
            SUM(CAST(x AS HUGEINT) * x) AS sxx,
            SUM(CAST(x AS HUGEINT) * y) AS sxy,
            SUM(CAST(y AS HUGEINT) * y) AS syy
          FROM rows_)
        SELECT n AS n_lines,
          FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sy) /
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * sx)) * 10000 + 0.500001) / 10000
            AS elasticity,
          FLOOR((POW(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * sy, 2) /
                 ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * sx)
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * sy)))
                * 10000 + 0.500001) / 10000 AS r2,
          FLOOR(SQRT(((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * sy)
                      - POW(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * sy, 2)
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * sx))
                     / ((CAST(n AS DOUBLE) - 2.0)
                        * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * sx)))
                * 1000000 + 0.500001) / 1000000 AS se_elasticity
        FROM m"""),
      "Pooled log-log price elasticity over lineitem: exact cent unit prices, micro-quantized lns, exact integer OLS moments with SE and R2"),

    // ---------------------------------------------------------------- q412
    // Market-basket lift between part BRANDS co-ordered: for brand
    // pairs sharing ≥ 5 orders, lift = n_ab·N / (n_a·n_b) — the
    // TPC-H twin of q118's event-type association, with the pair
    // space bounded by |brands|² and ranked on the EXACT integer
    // cross product n_ab·N·10⁶ // (n_a·n_b) before any double math.
    Query(
      "q412_brand_lift",
      (s, d) => {
        val ob = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
          .distinct().localCheckpoint()
        val tot = ob.select(col("ok")).distinct().agg(count(lit(1)).as("nn"))
        val per = ob.groupBy(col("b")).agg(count(lit(1)).as("nb"))
        val pairs = ob.as("x").join(ob.as("y"),
            col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
          .groupBy(col("x.b").as("ba"), col("y.b").as("bb"))
          .agg(count(lit(1)).as("nab"))
          .filter(col("nab") >= 5)
        pairs
          .join(per.select(col("b").as("ba"), col("nb").as("na")), Seq("ba"))
          .join(per.select(col("b").as("bb"), col("nb").as("nbb")), Seq("bb"))
          .crossJoin(broadcast(tot))
          .withColumn("liftq",
            expr("cast(cast(nab as decimal(38,0)) * nn * 1000000 div "
              + "(cast(na as decimal(38,0)) * nbb) as bigint)"))
          .orderBy(col("liftq").desc, col("ba"), col("bb")).limit(10)
          .select(col("ba").as("brand_a"), col("bb").as("brand_b"),
            col("nab").as("n_both"),
            Num.r4(col("liftq").cast("double") / lit(1e6)).as("lift"))
      },
      Some("""
        WITH ob AS (
          SELECT DISTINCT l_orderkey AS ok, p_brand AS b
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        tot AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS nn FROM ob),
        per AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM ob GROUP BY b),
        pairs AS (
          SELECT x.b AS ba, y.b AS bb, CAST(COUNT(*) AS BIGINT) AS nab
          FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
          GROUP BY x.b, y.b HAVING COUNT(*) >= 5),
        scored AS (
          SELECT ba, bb, nab,
            CAST(CAST(nab AS HUGEINT) * nn * 1000000
              // (CAST(na.nb AS HUGEINT) * nbb.nb) AS BIGINT) AS liftq
          FROM pairs
          JOIN per na ON na.b = ba
          JOIN per nbb ON nbb.b = bb
          CROSS JOIN tot)
        SELECT ba AS brand_a, bb AS brand_b, nab AS n_both,
          FLOOR((CAST(liftq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS lift
        FROM scored ORDER BY liftq DESC, ba, bb LIMIT 10"""),
      "Brand co-order market-basket lift: top-10 pairs with support >= 5, exact integer lift ranking, brand-bounded pair space"),

    // ---------------------------------------------------------------- q413
    // Shipping-delay profile by order priority: days from order date
    // to line ship date — exact integer day arithmetic, per-priority
    // mean, ceil-rank P50/P90 on the bounded day-grid histogram, and
    // the >90-day long-tail share. The fulfilment-SLA view of the
    // lineitem/orders join (one broadcast-side dim join + bounded
    // per-priority grids, no global sort).
    Query(
      "q413_ship_delay",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val del = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("prio"),
            expr("datediff(l_shipdate, o_orderdate)").cast("long").as("dd"))
        val hist = del.groupBy(col("prio"), col("dd")).agg(count(lit(1)).as("c"))
          .localCheckpoint() // bounded priority × day grid
        val wc = Window.partitionBy(col("prio")).orderBy(col("dd"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("c")).over(wc))
        val tot = hist.groupBy(col("prio"))
          .agg(sum(col("c")).as("n"), sum(col("dd") * col("c")).as("sd"),
            sum(when(col("dd") > 90, col("c")).otherwise(0L)).as("late"))
        val p50 = cum.join(tot, Seq("prio"))
          .filter(Exact.ceilRank(col("cum"), 50, "n"))
          .groupBy(col("prio")).agg(min(col("dd")).as("p50"))
        val p90 = cum.join(tot, Seq("prio"))
          .filter(Exact.ceilRank(col("cum"), 90, "n"))
          .groupBy(col("prio")).agg(min(col("dd")).as("p90"))
        tot.join(p50, Seq("prio")).join(p90, Seq("prio"))
          .select(col("prio").as("priority"), col("n").as("n_lines"),
            Num.r4(col("sd").cast("double") / col("n").cast("double"))
              .as("mean_days"),
            col("p50").as("p50_days"), col("p90").as("p90_days"),
            Num.r4(col("late").cast("double") / col("n").cast("double"))
              .as("over_90d_share"))
          .orderBy(col("priority"))
      },
      Some("""
        WITH del AS (
          SELECT o_orderpriority AS prio,
            CAST(DATEDIFF('day', CAST(o_orderdate AS DATE),
              CAST(l_shipdate AS DATE)) AS BIGINT) AS dd
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        hist AS (SELECT prio, dd, CAST(COUNT(*) AS BIGINT) AS c
                 FROM del GROUP BY prio, dd),
        cum AS (
          SELECT prio, dd, c, SUM(c) OVER (PARTITION BY prio ORDER BY dd
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        tot AS (
          SELECT prio, CAST(SUM(c) AS BIGINT) AS n,
            CAST(SUM(dd * c) AS BIGINT) AS sd,
            CAST(SUM(CASE WHEN dd > 90 THEN c ELSE 0 END) AS BIGINT) AS late
          FROM hist GROUP BY prio),
        p50 AS (
          SELECT prio, CAST(MIN(dd) AS BIGINT) AS p50
          FROM cum JOIN tot USING (prio)
          WHERE cum >= (50 * n + 99) // 100 GROUP BY prio),
        p90 AS (
          SELECT prio, CAST(MIN(dd) AS BIGINT) AS p90
          FROM cum JOIN tot USING (prio)
          WHERE cum >= (90 * n + 99) // 100 GROUP BY prio)
        SELECT prio AS priority, n AS n_lines,
          FLOOR((CAST(sd AS DOUBLE) / n) * 10000 + 0.500001) / 10000
            AS mean_days,
          p50 AS p50_days, p90 AS p90_days,
          FLOOR((CAST(late AS DOUBLE) / n) * 10000 + 0.500001) / 10000
            AS over_90d_share
        FROM tot JOIN p50 USING (prio) JOIN p90 USING (prio)
        ORDER BY priority"""),
      "Shipping-delay profile by order priority: exact day arithmetic, ceil-rank P50/P90 on bounded grids, long-tail share"),

    // ---------------------------------------------------------------- q414
    // Discount-response table: per discount level (l_discount is a
    // discrete grid), line count, mean quantity, DECIMAL-exact gross
    // revenue, and the quantity LIFT vs the zero-discount baseline —
    // the categorical companion to q411's pooled elasticity: does a
    // deeper discount actually move volume? Quantity sums and cent
    // revenues are exact integers; the baseline join is a broadcast
    // 1-row scalar.
    Query(
      "q414_discount_response",
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .select(floor(col("l_discount") * lit(100.0) + lit(0.5)).cast("long")
            .as("disc_pct"),
            col("l_quantity").cast("long").as("q"),
            expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
              .as("cents"))
          .groupBy(col("disc_pct"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"),
            sum(col("cents")).as("sc"))
          .localCheckpoint() // discount-grid bounded
        val base = per.filter(col("disc_pct") === 0)
          .select(col("n").as("n0"), col("sq").as("sq0"))
        per.crossJoin(broadcast(base))
          .select(col("disc_pct"), col("n").as("n_lines"),
            Num.r4(col("sq").cast("double") / col("n").cast("double"))
              .as("avg_qty"),
            expr("cast(cast(sc as decimal(38,0)) as double) / 100")
              .as("gross_revenue"),
            Num.r4((col("sq").cast("double") / col("n").cast("double")) /
              (col("sq0").cast("double") / col("n0").cast("double")))
              .as("qty_lift_vs_0"))
          .orderBy(col("disc_pct"))
      },
      Some("""
        WITH per AS (
          SELECT CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS disc_pct,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
              AS BIGINT)) AS BIGINT) AS sc
          FROM lineitem GROUP BY 1),
        base AS (SELECT n AS n0, sq AS sq0 FROM per WHERE disc_pct = 0)
        SELECT disc_pct, n AS n_lines,
          FLOOR((CAST(sq AS DOUBLE) / n) * 10000 + 0.500001) / 10000 AS avg_qty,
          CAST(sc AS DOUBLE) / 100 AS gross_revenue,
          FLOOR(((CAST(sq AS DOUBLE) / n) / (CAST(sq0 AS DOUBLE) / n0))
                * 10000 + 0.500001) / 10000 AS qty_lift_vs_0
        FROM per CROSS JOIN base ORDER BY disc_pct"""),
      "Discount-response table per discount level: exact quantity/cent-revenue sums, quantity lift vs the zero-discount baseline"),

    // ---------------------------------------------------------------- q415
    // Revenue-mix drift by region: each region's revenue share in the
    // first vs second half of the order-date span (exact integer µs
    // midpoint, q364's convention) and the share delta — the market-
    // share-shift view of the static q05 rollup. Revenue rides exact
    // cents; shares divide exact integers; the region dimension chain
    // (customer→nation→region) is broadcast.
    Query(
      "q415_revenue_mix_drift",
      (s, d) => {
        val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .select(col("r_regionkey"), col("r_name"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name"))
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            // o_orderdate arrives as TIMESTAMP_NTZ; exact under the
            // pinned UTC session timezone (the Tables.events rule)
            unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
        val span = ord.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
        val rev = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            expr("cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)")
              .as("cents"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(dim), col("o_custkey") === col("c_custkey"))
          .crossJoin(broadcast(span))
          .select(col("r_name"),
            when(col("us") <= expr("mn + (mx - mn) div 2"), 1).otherwise(2)
              .as("half"), col("cents"))
        val per = rev.groupBy(col("r_name"))
          .agg(sum(when(col("half") === 1, col("cents")).otherwise(0L)).as("c1"),
            sum(when(col("half") === 2, col("cents")).otherwise(0L)).as("c2"))
          .localCheckpoint() // region-bounded
        val tot = per.agg(sum(col("c1")).as("t1"), sum(col("c2")).as("t2"))
        per.crossJoin(broadcast(tot))
          .select(col("r_name").as("region"),
            expr("cast(c1 as double) / 100").as("rev_h1"),
            expr("cast(c2 as double) / 100").as("rev_h2"),
            Num.r6(col("c1").cast("double") / col("t1").cast("double"))
              .as("share_h1"),
            Num.r6(col("c2").cast("double") / col("t2").cast("double"))
              .as("share_h2"),
            Num.r6(col("c2").cast("double") / col("t2").cast("double")
              - col("c1").cast("double") / col("t1").cast("double"))
              .as("share_delta"))
          .orderBy(col("region"))
      },
      Some("""
        WITH dim AS (
          SELECT c_custkey, r_name
          FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey),
        ord AS (SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS us
                FROM orders),
        span AS (SELECT CAST(MIN(us) AS BIGINT) AS mn,
                   CAST(MAX(us) AS BIGINT) AS mx FROM ord),
        rev AS (
          SELECT r_name,
            CASE WHEN us <= mn + (mx - mn) // 2 THEN 1 ELSE 2 END AS half,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS cents
          FROM lineitem
          JOIN ord ON l_orderkey = o_orderkey
          JOIN dim ON o_custkey = c_custkey
          CROSS JOIN span),
        per AS (
          SELECT r_name,
            CAST(SUM(CASE WHEN half = 1 THEN cents ELSE 0 END) AS BIGINT) AS c1,
            CAST(SUM(CASE WHEN half = 2 THEN cents ELSE 0 END) AS BIGINT) AS c2
          FROM rev GROUP BY r_name),
        tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS t1,
                  CAST(SUM(c2) AS BIGINT) AS t2 FROM per)
        SELECT r_name AS region,
          CAST(c1 AS DOUBLE) / 100 AS rev_h1,
          CAST(c2 AS DOUBLE) / 100 AS rev_h2,
          FLOOR((CAST(c1 AS DOUBLE) / t1) * 1000000 + 0.500001) / 1000000
            AS share_h1,
          FLOOR((CAST(c2 AS DOUBLE) / t2) * 1000000 + 0.500001) / 1000000
            AS share_h2,
          FLOOR((CAST(c2 AS DOUBLE) / t2 - CAST(c1 AS DOUBLE) / t1)
                * 1000000 + 0.500001) / 1000000 AS share_delta
        FROM per CROSS JOIN tot ORDER BY region"""),
      "Revenue-mix drift by region across the exact order-date midpoint: cent-exact half revenues, share deltas, broadcast dimension chain"),

    // ---------------------------------------------------------------- q417
    // Single-source risk: how many parts depend on exactly one
    // supplier? The distinct (part, supplier) frame from lineitem
    // gives each part's supplier count; the distribution (n_suppliers
    // → n_parts, share) is the procurement-risk histogram a supply-
    // chain owner reads next to q107's salted supplier join. Exact
    // integer counts, supplier-count-bounded output.
    Query(
      "q417_single_source_risk",
      (s, d) => {
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val per = ps.groupBy(col("l_partkey")).agg(count(lit(1)).as("ns"))
        val hist = per.groupBy(col("ns").as("n_suppliers"))
          .agg(count(lit(1)).as("n_parts"))
        val tot = hist.agg(sum(col("n_parts")).as("np"))
        hist.crossJoin(broadcast(tot))
          .select(col("n_suppliers"), col("n_parts"),
            Num.r6(col("n_parts").cast("double") / col("np").cast("double"))
              .as("share"))
          .orderBy(col("n_suppliers"))
      },
      Some("""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        per AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS ns
                FROM ps GROUP BY l_partkey),
        hist AS (SELECT ns AS n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_parts
                 FROM per GROUP BY ns),
        tot AS (SELECT CAST(SUM(n_parts) AS BIGINT) AS np FROM hist)
        SELECT n_suppliers, n_parts,
          FLOOR((CAST(n_parts AS DOUBLE) / np) * 1000000 + 0.500001) / 1000000
            AS share
        FROM hist CROSS JOIN tot ORDER BY n_suppliers"""),
      "Single-source procurement risk: per-part supplier-count distribution from the distinct (part,supplier) frame, exact counts"),

    // ---------------------------------------------------------------- q418
    // Law-of-one-price audit: the 10 parts whose unit price varies
    // most across their lines (CV of exact cent unit prices, parts
    // with ≥ 5 lines), ranked on the micro-quantized CV so both
    // engines agree on the cut — plus each part's exact line count
    // and mean price. Per-part moments are exact integers
    // (DECIMAL/HUGEINT squares); one groupBy, no window over raw
    // lines.
    Query(
      "q418_price_dispersion",
      (s, d) => {
        val up = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            expr("""cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)
              div cast(l_quantity as bigint)""").as("uc"))
        val m = up.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"), sum(col("uc")).as("su"),
            Exact.m2("uc", "uc").as("su2"))
          .filter(col("n") >= 5)
        val scored = m.withColumn("cvq",
          floor(sqrt(greatest(lit(0.0),
            (col("n").cast("double") * col("su2").cast("double")
              - col("su").cast("double") * col("su").cast("double"))
              / (col("n").cast("double") * (col("n") - 1).cast("double"))))
            / (col("su").cast("double") / col("n").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long"))
        scored.orderBy(col("cvq").desc, col("l_partkey")).limit(10)
          .select(col("l_partkey").as("part"), col("n").as("n_lines"),
            Num.r4(col("su").cast("double")
              / (col("n").cast("double") * lit(100.0))).as("mean_price"),
            Num.r4(col("cvq").cast("double") / lit(1e6)).as("price_cv"))
      },
      Some("""
        WITH up AS (
          SELECT l_partkey,
            CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              // CAST(l_quantity AS BIGINT) AS uc
          FROM lineitem),
        m AS (
          SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(uc) AS BIGINT) AS su,
            SUM(CAST(uc AS HUGEINT) * uc) AS su2
          FROM up GROUP BY l_partkey HAVING COUNT(*) >= 5),
        scored AS (
          SELECT l_partkey, n, su,
            CAST(FLOOR(SQRT(GREATEST(0.0,
                (CAST(n AS DOUBLE) * CAST(su2 AS DOUBLE)
                 - CAST(su AS DOUBLE) * su)
                / (CAST(n AS DOUBLE) * (n - 1))))
              / (CAST(su AS DOUBLE) / n) * 1e6 + 0.5) AS BIGINT) AS cvq
          FROM m)
        SELECT l_partkey AS part, n AS n_lines,
          FLOOR((CAST(su AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0))
                * 10000 + 0.500001) / 10000 AS mean_price,
          FLOOR((CAST(cvq AS DOUBLE) / 1e6) * 10000 + 0.500001) / 10000
            AS price_cv
        FROM scored ORDER BY cvq DESC, l_partkey LIMIT 10"""),
      "Law-of-one-price audit: top-10 parts by exact-cent unit-price CV (>= 5 lines), micro-quantized ranking"))
}
