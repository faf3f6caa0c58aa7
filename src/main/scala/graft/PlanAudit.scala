package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Mechanical plan-shape auditor for the scale failure classes a value
  * oracle cannot see. A query can be hash-exact at sf0.01 and still
  * carry a plan that dies at 100 TB — an unpartitioned window over an
  * unbounded child (single-task sort of the whole table) or a
  * cartesian product with no bounded side (O(n²) row explosion).
  * [[violations]] walks the physical plan (descending into AQE
  * wrappers and subquery plans) and returns one string per offence;
  * PlanAuditSpec pins the whole registry to zero.
  *
  * "Bounded" means the subtree provably produces O(k) rows regardless
  * of input scale: a literal LocalTableScan, a limit/TakeOrdered, a
  * grand-total aggregate (empty grouping → 1 row), or a localCheckpoint
  * scan (RDDScanExec — in this codebase every checkpoint is taken on an
  * already-bounded intermediate: top-k lists, band tables, probe grids;
  * a planted whole-table global window contains none of these, so the
  * gate stays red on the failure class it exists for). */
object PlanAudit {

  /** Every node in the plan, descending through AQE wrappers, reused
    * query stages, and subquery expressions. */
  def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
      case s: QueryStageExec => Seq(s.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(flatten)
  }

  /** True when the subtree provably yields O(k) rows at any scale. */
  def bounded(p: SparkPlan): Boolean = flatten(p).exists {
    case _: LocalTableScanExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: GlobalLimitExec => true
    case _: LocalLimitExec => true
    case _: CollectLimitExec => true // a bare root-level limit
    case h: HashAggregateExec =>
      h.groupingExpressions.isEmpty || timeGridAggregate(h, h.groupingExpressions)
    case h: ObjectHashAggregateExec =>
      h.groupingExpressions.isEmpty || timeGridAggregate(h, h.groupingExpressions)
    case h: SortAggregateExec =>
      h.groupingExpressions.isEmpty || timeGridAggregate(h, h.groupingExpressions)
    case _: RDDScanExec => true // localCheckpoint of a bounded frame
    case r: RangeExec => r.numElements <= BigInt(100000) // literal grids
    case _ => false
  }

  // ------------------------------------------------------- calendar grids
  // An aggregate whose EVERY grouping expression is a calendar
  // truncation/extraction (date_trunc, to_date, a cast to DATE, year/
  // month/day-of-week/...) yields O(active time units) rows — a domain
  // bounded by the data's calendar span, constant in row VOLUME. That is
  // the "day grid" argument 14 of the r7 hand-audited allowlist entries
  // carried; proving it mechanically keeps the gate red on genuinely
  // row-proportional groupings (ids, texts, raw values) while letting
  // day-grid scans pass. Grouping expressions in physical plans are
  // usually plain attributes whose defining expression lives in a
  // Project (or partial-aggregate result list) below — [[definingExpr]]
  // chases the exprId down the subtree, a few hops deep.

  import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Expression}

  /** Expression classes whose output domain is a calendar grid no
    * matter the input: truncations collapse to time units, extractions
    * to small integer ranges. */
  private val timeGridClasses = Set(
    // TruncDate stays unit-free: its INPUT is already DateType, so the
    // output domain is a subset of the day grid whatever the unit.
    // TruncTimestamp is handled separately below — its unit must be
    // minute or coarser (date_trunc('second', ts) is row-proportional
    // on dense event data, the same reason unixDivisorFloor exists)
    "TruncDate", "ParseToDate", "MakeDate",
    "Year", "Month", "Quarter", "DayOfWeek", "WeekDay", "WeekOfYear",
    "DayOfMonth", "DayOfYear", "Hour", "Minute", "LastDay", "NextDay")

  /** date_trunc units at least as coarse as a minute (Spark's accepted
    * unit vocabulary minus SECOND/MILLISECOND/MICROSECOND). */
  private val coarseTruncUnits = Set(
    "minute", "min", "hour", "day", "dd", "week",
    "month", "mon", "mm", "quarter", "year", "yyyy", "yy")

  private def timeGridAggregate(agg: SparkPlan,
      grouping: Seq[Expression]): Boolean =
    grouping.nonEmpty && grouping.forall(g => isTimeGrid(g, agg, depth = 6))

  /** Minimum literal divisor per unix-time extractor that lands the
    * quotient on (at least) the minute grid — the coarsest unit the r7
    * hand audit accepted as domain-bounded ("O(distinct lag minutes)").
    * `unix_micros(ts) div 86400000000` is the house day-grid idiom. */
  private val unixDivisorFloor = Map(
    "UnixMicros" -> 60000000L, "UnixMillis" -> 60000L,
    "UnixSeconds" -> 60L, "UnixTimestamp" -> 60L, "ToUnixTimestamp" -> 60L)

  private def isTimeGrid(e: Expression, scope: SparkPlan, depth: Int): Boolean =
    e match {
      case a: Alias => isTimeGrid(a.child, scope, depth)
      // a cast TO DateType lands on the day grid regardless of source;
      // casts of an already-grid value (date → timestamp for output
      // typing) stay on the grid
      case c: Cast =>
        c.dataType == org.apache.spark.sql.types.DateType ||
          isTimeGrid(c.child, scope, depth)
      // x div L where x is a unix-time quantity OR a DIFFERENCE of two
      // (lag/gap minutes — the round-10 quantized-grid prover): the
      // result is a grid of span/L units when L is at least one minute
      // in x's unit. [[timeScale]] chases x's unit through Subtract,
      // Min/Max, Lag/Lead and the defining Project/Window/aggregate
      // aliases, so `min(us − s_us) div 60000000` proves bounded while
      // a seconds-grain divisor (or an id) stays red.
      case d: org.apache.spark.sql.catalyst.expressions.IntegralDivide =>
        d.right match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            timeScale(d.left, scope, depth).exists(v >= _)
          case _ => false
        }
      // timestamp truncation is only a bounded grid for minute-or-coarser
      // units, mirroring unixDivisorFloor; finer or non-literal units fail
      case t: org.apache.spark.sql.catalyst.expressions.TruncTimestamp =>
        t.format match {
          case org.apache.spark.sql.catalyst.expressions.Literal(u, _) if u != null =>
            coarseTruncUnits.contains(u.toString.toLowerCase(java.util.Locale.ROOT))
          case _ => false
        }
      case attr: Attribute if depth > 0 =>
        definingExpr(scope, attr).exists(isTimeGrid(_, scope, depth - 1))
      case other => timeGridClasses.contains(other.getClass.getSimpleName)
    }

  /** The unit of a unix-time-scaled expression, as the minimum literal
    * divisor that lands its quotient on (at least) the minute grid —
    * 60000000 for µs quantities, 60000 for ms, 60 for s — or None when
    * the expression is not provably time-scaled. A DIFFERENCE of two
    * same-unit time quantities is span-bounded in that unit (lag/gap
    * histograms: O(span minutes) bins), and Min/Max/Lag/Lead/First/Last
    * preserve the unit; Sum does NOT (it grows with row count) and is
    * deliberately absent. */
  private def timeScale(e: Expression, scope: SparkPlan,
      depth: Int): Option[Long] = e match {
    case a: Alias => timeScale(a.child, scope, depth)
    case c: Cast => timeScale(c.child, scope, depth)
    case s: org.apache.spark.sql.catalyst.expressions.Subtract =>
      for {
        l <- timeScale(s.left, scope, depth)
        r <- timeScale(s.right, scope, depth)
      } yield math.max(l, r)
    case w: org.apache.spark.sql.catalyst.expressions.WindowExpression =>
      timeScale(w.windowFunction, scope, depth)
    case o: org.apache.spark.sql.catalyst.expressions.OffsetWindowFunction =>
      timeScale(o.input, scope, depth) // lag/lead keep the unit
    case ae: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression =>
      timeScale(ae.aggregateFunction, scope, depth)
    case m: org.apache.spark.sql.catalyst.expressions.aggregate.Min =>
      timeScale(m.child, scope, depth)
    case m: org.apache.spark.sql.catalyst.expressions.aggregate.Max =>
      timeScale(m.child, scope, depth)
    case f: org.apache.spark.sql.catalyst.expressions.aggregate.First =>
      timeScale(f.child, scope, depth)
    case l: org.apache.spark.sql.catalyst.expressions.aggregate.Last =>
      timeScale(l.child, scope, depth)
    case attr: Attribute if depth > 0 =>
      definingExpr(scope, attr).flatMap(timeScale(_, scope, depth - 1))
    case other => unixDivisorFloor.get(other.getClass.getSimpleName)
  }

  /** The expression an attribute was aliased from, found in a Project,
    * aggregate result list, aggregate-function result binding, or
    * window expression list anywhere in the subtree. */
  private def definingExpr(scope: SparkPlan, attr: Attribute): Option[Expression] =
    flatten(scope).iterator.flatMap {
      case pr: ProjectExec => pr.projectList
      case h: HashAggregateExec =>
        h.resultExpressions ++ h.groupingExpressions ++ aggBindings(h.aggregateExpressions)
      case h: ObjectHashAggregateExec =>
        h.resultExpressions ++ h.groupingExpressions ++ aggBindings(h.aggregateExpressions)
      case h: SortAggregateExec =>
        h.resultExpressions ++ h.groupingExpressions ++ aggBindings(h.aggregateExpressions)
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.windowExpression
      case _ => Nil
    }.collectFirst {
      case al: Alias if al.exprId == attr.exprId => al.child
    }

  /** An aggregate's result attribute, re-expressed as an alias of its
    * aggregate function so [[definingExpr]] can chase through it
    * (e.g. `lag_us` → `min(us − s_us)`). */
  private def aggBindings(
      aggs: Seq[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression])
      : Seq[Alias] =
    aggs.map(ae => Alias(ae.aggregateFunction, "agg")(exprId = ae.resultAttribute.exprId))

  /** One string per plan-shape offence; empty = clean. */
  def violations(df: DataFrame): Seq[String] = {
    val nodes = flatten(df.queryExecution.executedPlan)
    val cart = nodes.collect {
      case c: CartesianProductExec
          if !bounded(c.left) && !bounded(c.right) =>
        "CartesianProduct with no bounded side"
      case j: BroadcastNestedLoopJoinExec
          if !bounded(j.left) && !bounded(j.right) =>
        "BroadcastNestedLoopJoin with no bounded side"
    }
    val globalWin = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        "unpartitioned WindowExec over an unbounded child"
      case w: WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !bounded(w.child) =>
        "unpartitioned WindowGroupLimitExec over an unbounded child"
    }
    val globalSort = nodes.collect {
      // a global Sort is fine only as the query's output ORDER BY (root
      // side) or over a bounded frame; one feeding a computation node
      // (join/agg/window) would serialize the table through one range
      // exchange — flag Sort whose parent is a join or aggregate with
      // an unbounded child. Detected structurally: Sort(global=true)
      // directly under a join/aggregate node.
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.children.exists {
            case s: SortExec => s.global && !bounded(s.child)
            case _ => false
          } =>
        "global (non-keyed) Sort feeding a SortMergeJoin"
    }
    cart ++ globalWin ++ globalSort
  }
}
