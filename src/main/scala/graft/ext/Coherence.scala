package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coherence/diagnostics continuation, batch 42: UMass topic
  * coherence of each source's top tokens, successor entropy (the
  * unsupervised-segmentation branching signal), and the Ljung–Box
  * portmanteau test on AR(1) residuals. Every ln term is nano-
  * quantized before bounded sums; residuals are centi-quantized
  * integers before their autocorrelation sums.
  */
object Coherence {

  def queries: Seq[Query] = Seq(

    // ---------------------------------------------------------------- q336
    // UMass coherence of each source's top-10 tokens:
    // Σ_{rank i > rank j} ln((D(wi,wj)+1)/D(wj)) with document
    // co-occurrence counts — do a source's signature tokens actually
    // appear together? The per-source pair grid is 45 rows; the only
    // corpus-sized work is one distinct (doc, token) pass restricted
    // to the ≤ 10·|sources| candidate tokens.
    Query(
      "q336_umass_coherence",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("t"))
          .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        val wS = Window.partitionBy(col("source"))
          .orderBy(col("c").desc, col("t"))
        val top = counts.withColumn("rk", row_number().over(wS))
          .filter(col("rk") <= 10).select(col("source"), col("t"), col("rk"))
          .localCheckpoint() // bounded candidate set
        val cand = top.select(col("t")).distinct()
        val dt = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
          .join(broadcast(cand), Seq("t")).distinct()
          .localCheckpoint() // (doc, candidate-token) pairs
        val df = dt.groupBy(col("t")).agg(count(lit(1)).as("dfc"))
        val codoc = dt.select(col("doc_id"), col("t").as("t1"))
          .join(dt.select(col("doc_id"), col("t").as("t2")), Seq("doc_id"))
          .filter(col("t1") < col("t2"))
          .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("cd"))
        val pairs = top.select(col("source"), col("t").as("wi"), col("rk").as("ri"))
          .join(top.select(col("source"), col("t").as("wj"), col("rk").as("rj")),
            Seq("source"))
          .filter(col("ri") > col("rj"))
          .withColumn("t1", least(col("wi"), col("wj")))
          .withColumn("t2", greatest(col("wi"), col("wj")))
          .join(broadcast(codoc), Seq("t1", "t2"), "left")
          .na.fill(0L, Seq("cd"))
          .join(broadcast(df.select(col("t").as("wj"), col("dfc"))), Seq("wj"))
          .select(col("source"),
            floor(log((col("cd").cast("double") + lit(1.0)) /
              col("dfc").cast("double")) * lit(1e9) + lit(0.5))
              .cast("long").as("tq"))
        pairs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_pairs"), sum(col("tq")).as("st"))
          .select(col("source"), col("n_pairs"),
            Num.r4(col("st").cast("double") / lit(1e9)).as("umass_coherence"))
          .orderBy(col("source"))
      },
      Some("""
        WITH counts AS (
          SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT source, unnest(string_split(text, ' ')) AS t
                FROM documents)
          GROUP BY source, t),
        top AS (
          SELECT source, t, rk FROM (
            SELECT source, t,
              ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, t) AS rk
            FROM counts)
          WHERE rk <= 10),
        cand AS (SELECT DISTINCT t FROM top),
        dt AS (
          SELECT DISTINCT doc_id, t
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                FROM documents)
          WHERE t IN (SELECT t FROM cand)),
        df AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS dfc FROM dt GROUP BY t),
        codoc AS (
          SELECT a.t AS t1, b.t AS t2, CAST(COUNT(*) AS BIGINT) AS cd
          FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.t < b.t
          GROUP BY 1, 2),
        pairs AS (
          SELECT i.source,
            CAST(FLOOR(LN((COALESCE(cd, 0) + 1.0) / dfc) * 1e9 + 0.5)
              AS BIGINT) AS tq
          FROM top i JOIN top j ON j.source = i.source AND i.rk > j.rk
          LEFT JOIN codoc ON codoc.t1 = LEAST(i.t, j.t)
            AND codoc.t2 = GREATEST(i.t, j.t)
          JOIN df ON df.t = j.t)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          FLOOR((CAST(SUM(tq) AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS umass_coherence
        FROM pairs GROUP BY source ORDER BY source"""),
      "UMass topic coherence of each source's top-10 tokens (doc co-occurrence, nano-quantized ln terms)"),

    // ---------------------------------------------------------------- q337
    // Successor entropy for the top-20 tokens: how many distinct
    // tokens follow, and with what entropy — high branching marks
    // natural segmentation points (Harris 1955), the signal BPE-style
    // tokenizers exploit. One bigram pass; per-token term sums are
    // successor-bounded.
    Query(
      "q337_successor_entropy",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
        val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val big = toks.withColumn("w2", lead(col("w"), 1).over(wD))
          .filter(col("w2").isNotNull)
          .groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c"))
          .localCheckpoint()
        val ctx = big.groupBy(col("w"))
          .agg(sum(col("c")).as("tot"), count(lit(1)).as("n_successors"))
        val h = big.join(broadcast(ctx), Seq("w"))
          .select(col("w"),
            floor(-(col("c").cast("double") / col("tot").cast("double")) *
              log(col("c").cast("double") / col("tot").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long").as("hq"))
          .groupBy(col("w")).agg(sum(col("hq")).as("sh"))
        ctx.join(h, Seq("w"))
          .orderBy(col("tot").desc, col("w")).limit(20)
          .select(col("w").as("token"), col("tot").as("n_follows"),
            col("n_successors"),
            Num.r4(col("sh").cast("double") / lit(1e9)).as("successor_entropy"),
            Num.r4(exp(col("sh").cast("double") / lit(1e9)))
              .as("branching_perplexity"))
          .orderBy(col("n_follows").desc, col("token"))
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
            UNNEST(string_split(text, ' ')) AS w,
            UNNEST(GENERATE_SERIES(1, LEN(string_split(text, ' ')))) AS pos
          FROM documents),
        big AS (
          SELECT w, w2, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT w, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
            FROM toks)
          WHERE w2 IS NOT NULL GROUP BY w, w2),
        ctx AS (SELECT w, CAST(SUM(c) AS BIGINT) AS tot,
                  CAST(COUNT(*) AS BIGINT) AS n_successors
                FROM big GROUP BY w),
        h AS (
          SELECT big.w, CAST(SUM(CAST(FLOOR(
              -(CAST(c AS DOUBLE) / tot) * LN(CAST(c AS DOUBLE) / tot)
              * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sh
          FROM big JOIN ctx ON ctx.w = big.w GROUP BY big.w),
        top AS (
          SELECT ctx.w AS token, tot AS n_follows, n_successors, sh
          FROM ctx JOIN h ON h.w = ctx.w
          ORDER BY tot DESC, ctx.w LIMIT 20)
        SELECT token, n_follows, n_successors,
          FLOOR((CAST(sh AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS successor_entropy,
          FLOOR(EXP(CAST(sh AS DOUBLE) / 1e9) * 10000 + 0.500001) / 10000
            AS branching_perplexity
        FROM top ORDER BY n_follows DESC, token"""),
      "Successor entropy + branching perplexity for the top-20 tokens (Harris segmentation signal)"),

    // ---------------------------------------------------------------- q338
    // Ljung–Box portmanteau Q on the AR(1) residuals of daily volume
    // (lags 1–10): is anything left after the first-order fit? The φ
    // fit is closed-form; residuals become centi-quantized integers,
    // so every residual autocovariance is an exact integer sum and Q
    // assembles from nano-quantized ρ²/(n−k) terms.
    Query(
      "q338_ljung_box",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("x"))
        val wD = Window.orderBy(col("day"))
        val lagged = daily.withColumn("xl", lag(col("x"), 1).over(wD))
          .filter(col("xl").isNotNull)
        val mo = lagged.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sy"), sum(col("xl")).as("sx"),
          Exact.m2("xl", "xl").as("sxx"),
          Exact.m2("xl", "x").as("sxy"))
        val c = mo.select(col("n"),
          ((col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double") / col("n").cast("double")) /
            (col("sxx").cast("double") - col("sx").cast("double") *
              col("sx").cast("double") / col("n").cast("double"))).as("phi"),
          (col("sx").cast("double") / col("n").cast("double")).as("mx"),
          (col("sy").cast("double") / col("n").cast("double")).as("my"))
        val res = lagged.crossJoin(broadcast(c))
          .select(col("day"),
            floor((col("x").cast("double") - col("my") -
              col("phi") * (col("xl").cast("double") - col("mx")))
              * lit(1e2) + lit(0.5)).cast("long").as("e"))
          .withColumn("r", row_number().over(Window.orderBy(col("day"))).cast("long"))
          .localCheckpoint()
        val emo = res.agg(count(lit(1)).as("n"), sum(col("e")).as("se"),
          Exact.m2("e", "e").as("see"))
        val a = res.select(col("r").as("i"), col("e").as("ei"))
        val b = res.select(col("r").as("j"), col("e").as("ej"))
        val rho = a.join(b, col("j") - col("i") >= 1 && col("j") - col("i") <= 10)
          .groupBy((col("j") - col("i")).as("lag"))
          .agg(Exact.m2("ei", "ej").as("sp"),
            count(lit(1)).as("np"))
          .crossJoin(broadcast(emo))
          .select(col("lag"), col("n"),
            ((col("sp").cast("double") - col("np").cast("double") *
              (col("se").cast("double") / col("n").cast("double")) *
              (col("se").cast("double") / col("n").cast("double"))) /
              (col("see").cast("double") - col("se").cast("double") *
                col("se").cast("double") / col("n").cast("double"))).as("rho"))
        val q = rho.select(col("n"),
            floor(col("rho") * col("rho") /
              (col("n").cast("double") - col("lag").cast("double"))
              * lit(1e9) + lit(0.5)).cast("long").as("tq"))
          .groupBy(col("n")).agg(sum(col("tq")).as("st"), count(lit(1)).as("k"))
        q.select(col("n").as("n_resid"), col("k").as("n_lags"),
          Num.r4(col("n").cast("double") * (col("n").cast("double") + lit(2.0)) *
            col("st").cast("double") / lit(1e9)).as("ljung_box_q"))
      },
      Some("""
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        lagged AS (
          SELECT day, x, xl FROM (
            SELECT day, x, LAG(x) OVER (ORDER BY day) AS xl FROM daily)
          WHERE xl IS NOT NULL),
        mo AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(x) AS BIGINT) AS sy, CAST(SUM(xl) AS BIGINT) AS sx,
            SUM(CAST(xl AS HUGEINT) * xl) AS sxx,
            SUM(CAST(xl AS HUGEINT) * x) AS sxy
          FROM lagged),
        c AS (
          SELECT n,
            (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) /
              (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS phi,
            CAST(sx AS DOUBLE) / n AS mx, CAST(sy AS DOUBLE) / n AS my
          FROM mo),
        res AS (
          SELECT day,
            CAST(FLOOR((CAST(x AS DOUBLE) - my - phi * (xl - mx))
              * 1e2 + 0.5) AS BIGINT) AS e,
            CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS r
          FROM lagged CROSS JOIN c),
        emo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(e) AS BIGINT) AS se,
                  SUM(CAST(e AS HUGEINT) * e) AS see FROM res),
        rho AS (
          SELECT b.r - a.r AS lag, n,
            (CAST(SUM(CAST(a.e AS HUGEINT) * b.e) AS DOUBLE)
              - COUNT(*) * (CAST(se AS DOUBLE) / n) * (CAST(se AS DOUBLE) / n)) /
            (CAST(see AS DOUBLE) - CAST(se AS DOUBLE) * se / n) AS rho
          FROM res a JOIN res b ON b.r - a.r >= 1 AND b.r - a.r <= 10
          CROSS JOIN emo
          GROUP BY b.r - a.r, n, se, see),
        q AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS k,
            CAST(SUM(CAST(FLOOR(rho * rho / (CAST(n AS DOUBLE) - lag)
              * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS st
          FROM rho GROUP BY n)
        SELECT n AS n_resid, k AS n_lags,
          FLOOR((CAST(n AS DOUBLE) * (n + 2.0) * st / 1e9)
                * 10000 + 0.500001) / 10000 AS ljung_box_q
        FROM q"""),
      "Ljung-Box Q (lags 1-10) on AR(1) residuals of daily volume (centi-quantized residuals, exact rho sums)")
  )
}
