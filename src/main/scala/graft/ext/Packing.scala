package graft.ext

import graft.{Num, Query, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the LLM-pretraining batch-prep step that
  * concatenates documents into fixed token-budget contexts. Greedy
  * capacity-reset packing: walk docs in id order, start a new pack when
  * the running token count would exceed the budget; an oversized doc
  * (ntok > budget) becomes its own over-full pack (real pipelines then
  * split/truncate it — that decision is downstream of this operator).
  *
  * Distribution contract: packing is SEQUENTIAL within its unit, so the
  * unit must be bounded for the fold's state to be bounded. Packs form
  * within (source, shard) where shard = doc_id div 200 — pack
  * boundaries never cross shards, so every group is ≤ 200 docs
  * regardless of corpus size, per-group memory is O(shard), and
  * parallelism GROWS with data (2,500 shards × 20 sources at 100×)
  * instead of being capped at the source count. The wasted tail per
  * shard is the price; it amortizes to < 1 pack per 200 docs. This is
  * the standard sharded-packing layout for a 100 TB corpus: a
  * range-partitioned scan hands each task a contiguous (source, shard)
  * run and the fold never holds more than one shard.
  *
  * The fold itself is a typed `flatMapGroups` (operator-ladder tier (d),
  * justified: a running total with data-dependent RESET is not
  * expressible as a window aggregate — the reset makes each prefix sum
  * depend on the previous reset point). The DuckDB oracle walks the
  * same recursion with `WITH RECURSIVE` over per-shard row numbers.
  */
object Packing {

  /** Docs per packing shard: bounds the sequential fold's group size. */
  val ShardDocs = 200L

  /** q443's context budget in tokens (whitespace tokens; the corpus'
    * docs run 10–99 tokens, so budget 128 packs 1–4 docs). */
  val Budget = 128L

  /** q444's budget sweep — the context-length decision table. */
  val Budgets = Seq(64L, 128L, 256L, 512L)

  private[ext] case class DocTok(source: String, shard: Long,
      doc_id: Long, ntok: Long)
  private[ext] case class PackRow(source: String, shard: Long,
      pack_id: Long, n_docs: Long, tokens: Long)

  private def docToks(s: SparkSession, d: String): Dataset[DocTok] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("source"),
        expr(s"doc_id div $ShardDocs").as("shard"),
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
      .as[DocTok]
  }

  /** Greedy capacity-reset fold per (source, shard); deterministic:
    * groups sort by doc_id in memory (≤ [[ShardDocs]] rows). */
  private[ext] def packs(ds: Dataset[DocTok], cap: Long): Dataset[PackRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.source, r.shard))
      .flatMapGroups { (key: (String, Long), it: Iterator[DocTok]) =>
        val (src, shard) = key
        val docs = it.toArray.sortBy(_.doc_id)
        val out = scala.collection.mutable.ArrayBuffer.empty[PackRow]
        var pack = 0L; var run = 0L; var n = 0L
        docs.foreach { dk =>
          if (n > 0 && run + dk.ntok > cap) {
            out += PackRow(src, shard, pack, n, run)
            pack += 1; run = 0L; n = 0L
          }
          run += dk.ntok; n += 1
        }
        if (n > 0) out += PackRow(src, shard, pack, n, run)
        out.toSeq
      }
  }

  /** The oracle's shared CTE: per-shard row numbers + the recursive
    * greedy walk, parameterized by the budget expression (a literal for
    * q443, the sweep column for q444). */
  private def sqlWalk(budgetJoin: String, budgetCond: String,
      budgetKey: String): String = s"""
        t0 AS (
          SELECT source, doc_id // $ShardDocs AS shard, doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
            ROW_NUMBER() OVER (PARTITION BY source, doc_id // $ShardDocs
              ORDER BY doc_id) AS rn
          FROM documents),
        t AS (SELECT t0.*$budgetKey FROM t0$budgetJoin),
        v(source, shard$budgetCond, rn, ntok, pack, run) AS (
          SELECT source, shard$budgetCond, rn, ntok,
            CAST(0 AS BIGINT), ntok
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.source, t.shard${if (budgetCond.nonEmpty) ", t.budget" else ""},
            t.rn, t.ntok,
            CASE WHEN v.run + t.ntok > ${if (budgetCond.nonEmpty) "t.budget" else Budget.toString}
                 THEN v.pack + 1 ELSE v.pack END,
            CASE WHEN v.run + t.ntok > ${if (budgetCond.nonEmpty) "t.budget" else Budget.toString}
                 THEN t.ntok ELSE v.run + t.ntok END
          FROM v JOIN t ON t.source = v.source AND t.shard = v.shard
            ${if (budgetCond.nonEmpty) "AND t.budget = v.budget" else ""}
            AND t.rn = v.rn + 1)"""

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q443
    Query(
      "q443_sequence_packing",
      (s, d) => {
        packs(docToks(s, d), Budget).toDF()
          .select(col("source"), col("shard"), col("pack_id"),
            col("n_docs"), col("tokens"),
            Num.r6(col("tokens").cast("double") / lit(Budget.toDouble))
              .as("fill"))
          .orderBy(col("source"), col("shard"), col("pack_id"))
      },
      Some(s"""
        WITH RECURSIVE ${sqlWalk("", "", "")}
        SELECT source, shard, pack AS pack_id,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(ntok) AS BIGINT) AS tokens,
          ${Num.sql(s"CAST(SUM(ntok) AS DOUBLE) / $Budget", 6)} AS fill
        FROM v GROUP BY source, shard, pack
        ORDER BY source, shard, pack_id"""),
      "greedy sequence packing into 128-token contexts within bounded (source, doc_id-range) shards — the LLM batch-prep fold; oracle = DuckDB recursive walk of the same greedy recursion"),

    // ---------------------------------------------------------------- q444
    // Context-length decision table: the same greedy fold swept over
    // budgets 64/128/256/512 — packs produced, utilization (packed
    // tokens over pack capacity; can exceed 1 only via oversized
    // singletons, counted separately). Work is 4 linear folds; output 4
    // rows.
    Query(
      "q444_packing_efficiency",
      (s, d) => {
        val ds = docToks(s, d)
        Budgets.map { b =>
          packs(ds, b).toDF()
            .agg(count(lit(1)).as("n_packs"),
              sum(col("n_docs")).as("n_docs"),
              sum(col("tokens")).as("total_tokens"),
              sum(when(col("tokens") > b, 1L).otherwise(0L)).as("n_oversize"))
            // empty corpus: the oracle's per_pack CTE yields zero rows per
            // budget while a global agg yields one null-sum row — degrade
            // identically (never fires on a non-empty corpus: n_packs >= 1)
            .filter(col("n_packs") > 0)
            .select(lit(b).as("budget"), col("n_packs"), col("n_docs"),
              col("total_tokens"),
              Num.r6(col("total_tokens").cast("double")
                / (col("n_packs") * lit(b)).cast("double")).as("utilization"),
              col("n_oversize"))
        }.reduce(_ unionByName _).orderBy(col("budget"))
      },
      Some(s"""
        WITH RECURSIVE ${sqlWalk(
          s" CROSS JOIN (SELECT CAST(unnest([${Budgets.mkString(", ")}]) AS BIGINT) AS budget) b",
          ", budget", ", budget")},
        per_pack AS (
          SELECT budget, source, shard, pack,
            CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(SUM(ntok) AS BIGINT) AS tokens
          FROM v GROUP BY budget, source, shard, pack)
        SELECT budget,
          CAST(COUNT(*) AS BIGINT) AS n_packs,
          CAST(SUM(n_docs) AS BIGINT) AS n_docs,
          CAST(SUM(tokens) AS BIGINT) AS total_tokens,
          ${Num.sql("CAST(SUM(tokens) AS DOUBLE) / (COUNT(*) * budget)", 6)}
            AS utilization,
          CAST(SUM(CASE WHEN tokens > budget THEN 1 ELSE 0 END) AS BIGINT)
            AS n_oversize
        FROM per_pack GROUP BY budget ORDER BY budget"""),
      "packing-efficiency sweep over context budgets 64-512: packs, utilization, oversized-doc count — the context-length decision companion to q443")
  )
}
