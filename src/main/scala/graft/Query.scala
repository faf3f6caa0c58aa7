package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A driver-checkable query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin that MUST
  * produce identical column names, row order, and values on the same
  * parquet tables. Conventions that keep the hash-compare exact:
  *
  *  - every output column is aliased identically on both sides;
  *  - every query ends in a total-order ORDER BY over non-null keys;
  *  - money sums go through DECIMAL casts (exact) and back to DOUBLE;
  *  - statistically computed doubles (avg/stddev/corr/cosine) are
  *    round(x, 4) on both sides so floating-point association
  *    differences between engines cannot surface;
  *  - time arithmetic uses exact integer microseconds (`unix_micros` /
  *    `epoch_us`) so both engines see bit-identical inputs.
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

/** Cross-engine-stable rounding. `round()` differs between Spark
  * (decimal-string HALF_UP) and DuckDB (binary arithmetic) exactly when a
  * value like avg-of-2-decimal-cents lands on a half boundary
  * (239.93/8 = 29.99125), so oracle-checked queries round with the same
  * arithmetic formula on both sides: floor(x*10^n + 0.5)/10^n. Bit-equal
  * inputs then produce bit-equal outputs. */
object Num {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{floor, lit}
  def r4(c: Column): Column = floor(c * lit(10000.0) + lit(0.500001)) / lit(10000.0)
  def r6(c: Column): Column = floor(c * lit(1000000.0) + lit(0.500001)) / lit(1000000.0)
  /** The SQL twin of [[r4]]/[[r6]]. */
  def sql(e: String, digits: Int): String = {
    val p = math.pow(10, digits).toLong
    s"FLOOR(($e) * $p + 0.500001) / $p"
  }
}

object Registry {
  def all: Seq[Query] =
    ops.Relational.queries ++ ops.Temporal.queries ++
      ops.HealthQueries.queries ++ ops.Misc.queries ++
      ops.Analytics.queries ++ ops.Analytics2.queries ++
      ops.Analytics3.queries ++
      ops.Relational2.queries ++
      ops.Relational3.queries ++ ops.TimeModels.queries ++
      ops.TimeModels2.queries ++
      ext.Extensions.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.Multimodal.queries ++ ext.TextRank.queries ++
      ext.Sampling.queries ++ ext.Corpus.queries ++ ext.Corpus2.queries ++
      ext.Graph.queries ++ ext.Retrieval.queries ++ ext.Stats.queries ++
      ext.Behavior.queries ++ ext.Quality.queries ++ ext.Quality2.queries ++
      ext.Curves.queries ++
      ext.Sketches.queries ++ ext.Layout.queries ++ ext.Trend.queries ++
      ext.Linkage.queries ++ ext.VectorStats.queries ++ ext.Spectral.queries ++
      ext.LmQuality.queries ++ ext.LmQuality2.queries ++
      ext.LmQuality3.queries ++ ext.Similarity2.queries ++ ext.Eval.queries ++
      ext.Corpus3.queries ++ ext.Stats2.queries ++ ext.Classify.queries ++
      ext.Cohorts.queries ++ ext.Quality3.queries ++ ext.Behavior2.queries ++
      ext.Stats3.queries ++ ext.RankTests.queries ++ ext.Iterative.queries ++ ext.Curves2.queries ++ ext.Motifs.queries ++ ext.Depend.queries ++ ext.Weights.queries ++ ext.Tail.queries ++ ext.Agree.queries ++ ext.Profile.queries ++ ext.Curation2.queries ++ ext.Dynamics.queries ++ ext.Rates.queries ++ ext.Regress.queries ++ ext.Lexical.queries ++ ext.Coherence.queries ++ ext.Extreme.queries ++ ext.Calendar.queries ++ ext.Intrinsic.queries ++ ext.EmbedQuality.queries ++ ext.Stationarity.queries ++ ext.Lexical2.queries ++ ext.Curation3.queries ++ ext.Shift.queries ++ ext.Inequality.queries ++ ext.Product.queries ++ ext.Laws.queries ++ ext.SetJoin.queries ++ ext.Intervals.queries ++ ext.Causal.queries ++ ext.Packing.queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
