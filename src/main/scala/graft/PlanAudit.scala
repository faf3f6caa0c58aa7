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
    case h: HashAggregateExec => h.groupingExpressions.isEmpty
    case h: ObjectHashAggregateExec => h.groupingExpressions.isEmpty
    case h: SortAggregateExec => h.groupingExpressions.isEmpty
    case _: RDDScanExec => true // localCheckpoint of a bounded frame
    case r: RangeExec => r.numElements <= BigInt(100000) // literal grids
    case _ => false
  }

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
