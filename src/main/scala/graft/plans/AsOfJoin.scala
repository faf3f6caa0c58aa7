package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.GraftShim

/** Native as-of join: a whole-operator Catalyst extension (logical node +
  * planner strategy + physical merge), the (c)-tier of the custom-operator
  * ladder. The engine already carries a composed as-of join
  * (`ops.Temporal.asofJoin`: union both sides, carry the quote forward
  * with `last(_, ignoreNulls)` over a per-key window) — correct and
  * linear, but it pays for generality: the union widens every probe row
  * by the quote payload BEFORE the shuffle, the window materializes a
  * carry column per payload column, and the probe/quote interleave rides
  * one sort of the combined stream.
  *
  * This operator instead tells Catalyst the join's real requirements —
  * `ClusteredDistribution` on each side's key and an ascending
  * (key, ts) ordering — and lets `EnsureRequirements` plan the minimal
  * physical prelude: one hash exchange per side, one sort per side, both
  * at the side's own width. The exec then merges each co-partition pair
  * in a single O(n+m) pass holding exactly ONE quote row of state, the
  * plan a hand-written 100 TB backfill would choose (quotes are usually
  * 100-1000× narrower and smaller than probes; shuffling them separately
  * instead of unioned into the probe stream is the win). At equal
  * timestamps the quote matches (`probe.ts >= quote.ts`, DuckDB ASOF
  * semantics); among quotes tied on (key, ts) the last in sort order
  * wins, so callers that need determinism dedupe quotes to one row per
  * (key, ts) — the same contract the composed operator documents.
  *
  * Scale shape: no union, no window, no carry columns; each side
  * shuffles once on its key, AQE still coalesces the exchanges, and the
  * merge is a streaming iterator (zero buffering beyond the lookahead
  * quote). Null keys/timestamps follow the sort's nulls-first order and
  * are consumed before any real match — callers filter them out, as SQL
  * `ON probe.ts >= quote.ts` would.
  *
  * OPERATOR SELECTION: this exec is the plan for HIGH-CARDINALITY keys
  * (parallelism = distinct keys spread over the hash space). When the
  * key has few distinct values AND the quote table is bounded (the
  * slowly-changing-dimension case), every shuffled as-of — this one or
  * the composed union+window — caps its sort at #keys tasks; use the
  * broadcast sorted-array composition instead (collect_list quotes per
  * key, broadcast, per-row binary search via the codegen'd
  * `asof_lookup` expression — q432 measured 21.8 s → 5.2 s at 100×
  * switching to it, with the gap growing in data volume).
  */
object AsOfJoin {

  /** `probes LEFT ASOF JOIN quotes ON key, probe.ts >= quote.ts`,
    * appending `quoteCols` (src → dst) from the latest matching quote.
    * Both inputs may share lineage (self-as-of): every right-side output
    * column is re-aliased, so the two subtrees never expose a shared
    * attribute id at the join.
    */
  def join(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteCols: Seq[(String, String)]): DataFrame =
    join(probes, quotes, key, ts, key, ts, quoteCols)

  /** As above, with the quote side's own key/ts column names. */
  def join(probes: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteKey: String, quoteTs: String,
      quoteCols: Seq[(String, String)]): DataFrame = {
    val spark = probes.sparkSession
    install(spark)
    val right = quotes.select(
      (Seq(col(quoteKey).as("__q_key"), col(quoteTs).as("__q_ts")) ++
        quoteCols.map { case (src, dst) => col(src).as(dst) }): _*)
    val lPlan = probes.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' in ${p.output.map(_.name)}"))
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "as-of join: children share attribute ids after re-aliasing")
    val plan = AsOfJoinPlan(lPlan, rPlan,
      Seq(attr(lPlan, key)), Seq(attr(rPlan, "__q_key")),
      attr(lPlan, ts), attr(rPlan, "__q_ts"))
    GraftShim.ofRows(spark, plan).drop("__q_key", "__q_ts")
  }

  /** Skew-resilient variant for hot keys (one instrument carrying a
    * double-digit share of all probes — the tick-data reality): probes
    * of keys in `hotKeys` spread across `salt` buckets by a hash of
    * `saltBy` (any probe column; a unique id gives the evenest split),
    * quotes of hot keys REPLICATE into every bucket, and the merge runs
    * on the composite (key, salt) — so each probe still sees its key's
    * full quote timeline and the result is EXACTLY the plain join's,
    * but the hot key's sort+merge is `salt`-way parallel instead of one
    * straggler task. Cold keys keep salt 0: one extra tiny column, no
    * replication — the q107/SkewBench selective-salting discipline.
    * Quote replication costs `salt × |hot quotes|`, which is the point:
    * quotes are the narrow side.
    */
  def joinSalted(probes: DataFrame, quotes: DataFrame, key: String,
      ts: String, quoteCols: Seq[(String, String)], salt: Int,
      hotKeys: Seq[Any], saltBy: String): DataFrame = {
    import org.apache.spark.sql.functions.{array, explode, hash, lit, pmod, when}
    val spark = probes.sparkSession
    install(spark)
    val hot = (c: org.apache.spark.sql.Column) => c.isInCollection(hotKeys)
    // pmod, not abs%: hash can return Int.MinValue, whose abs is still
    // negative — a probe salted to -k would silently never match
    val pSalted = probes.withColumn("__salt",
      when(hot(col(key)), pmod(hash(col(saltBy)), lit(salt))).otherwise(lit(0)))
    val qSalted = quotes.withColumn("__salt",
      explode(when(hot(col(key)),
        array((0 until salt).map(lit): _*)).otherwise(array(lit(0)))))
    val right = qSalted.select(
      (Seq(col(key).as("__q_key"), col("__salt").as("__q_salt"),
        col(ts).as("__q_ts")) ++
        quoteCols.map { case (src, dst) => col(src).as(dst) }): _*)
    val lPlan = pSalted.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).get
    val plan = AsOfJoinPlan(lPlan, rPlan,
      Seq(attr(lPlan, key), attr(lPlan, "__salt")),
      Seq(attr(rPlan, "__q_key"), attr(rPlan, "__q_salt")),
      attr(lPlan, ts), attr(rPlan, "__q_ts"))
    GraftShim.ofRows(spark, plan)
      .drop("__q_key", "__q_salt", "__q_ts", "__salt")
  }

  /** Idempotent runtime registration (Verify/Bench build plain sessions;
    * `GraftExtensions` injects the same strategy at session build). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Logical as-of join. Built only from analyzed children, so it enters
  * the analyzer already resolved; the optimizer treats it as opaque
  * (both sides are pre-projected to exactly the needed columns, so
  * there is nothing left to prune or push).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  require(leftKeys.length == rightKeys.length &&
    leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join keys must pair up with identical types")
  require(leftTs.dataType == rightTs.dataType,
    "as-of join timestamps must share a type")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming merge. `EnsureRequirements` supplies the hash
  * exchange + (key, ts) sort per side; each co-partition pair then
  * merges in one pass. State per partition: the lookahead quote and the
  * current carried quote — two rows, regardless of input size.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  // probes stream through in their sorted order, so the child's
  // required ordering is also the output ordering — lets a downstream
  // same-key window or orderBy skip its sort
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs
    val keyTypes = lKeys.map(_.dataType)
    val tsType = lTs.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (pIter, qIter) =>
        if (!pIter.hasNext) Iterator.empty
        else {
          val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
          val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
          val lTsProj = UnsafeProjection.create(Seq(lTs), leftOut)
          val rTsProj = UnsafeProjection.create(Seq(rTs), rightOut)
          val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
          val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
          // bind right attrs AS NULLABLE: unmatched probes emit the null
          // row, and a non-nullable binding would codegen an unchecked
          // field read (returning 0, not null) for exactly those rows
          val outProj = UnsafeProjection.create(
            outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
          val nullRight = new GenericInternalRow(rightOut.size)
          val joined = new JoinedRow

          new Iterator[InternalRow] {
            // lookahead quote (copied: child iterators reuse row buffers)
            private var lookRow: InternalRow = _
            private var lookKey: UnsafeRow = _
            private var lookTsRow: UnsafeRow = _
            // latest quote at-or-before the current probe
            private var curRow: InternalRow = _
            private var curKey: UnsafeRow = _

            private def pull(): Unit =
              if (qIter.hasNext) {
                lookRow = qIter.next().copy()
                lookKey = rKeyProj(lookRow).copy()
                lookTsRow = rTsProj(lookRow).copy()
              } else { lookRow = null; lookKey = null; lookTsRow = null }
            pull()

            override def hasNext: Boolean = pIter.hasNext

            override def next(): InternalRow = {
              val p = pIter.next()
              val pKey = lKeyProj(p)
              val pTs = lTsProj(p)
              var scan = lookRow != null
              while (scan) {
                val kc = keyOrd.compare(lookKey, pKey)
                if (kc < 0) {
                  // quote for an earlier key: no probe left that wants it
                  curRow = null; curKey = null
                  pull(); scan = lookRow != null
                } else if (kc == 0 && tsOrd.compare(lookTsRow, pTs) <= 0) {
                  curRow = lookRow; curKey = lookKey
                  pull(); scan = lookRow != null
                } else scan = false
              }
              val hit = curRow != null && keyOrd.compare(curKey, pKey) == 0
              outProj(if (hit) joined(p, curRow) else joined(p, nullRight))
            }
          }
        }
    }
  }
}
