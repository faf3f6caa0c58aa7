package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `asof_lookup(arr, key)` — the broadcast as-of join's inner loop as a
  * native codegen'd expression: given `arr` sorted ascending by its
  * structs' FIRST field, return the last element whose first field is
  * `<= key`, else NULL. This is the per-row lookup of the bounded-quote
  * as-of pattern (q432: quotes collapse to one sorted array per key,
  * broadcast, every probe row finds its point-in-time match here).
  *
  * The higher-order-function spelling it replaces —
  * `element_at(filter(arr, x -> x.ts <= key), size(...))` — allocates a
  * filtered copy of the array per probe row and evaluates an
  * interpreted lambda per element (O(|arr|) both ways). This expression
  * binary-searches the sorted array in place inside whole-stage
  * codegen: O(log |arr|), zero allocation, no virtual calls.
  *
  * Contract: `arr` is ARRAY<STRUCT<...>> with no null elements (what
  * `sort_array(collect_list(struct(ts, ...)))` produces — collect_list
  * skips nulls, sort_array orders by the first field first), the first
  * struct field has the same type as `key`, and that type is one of the
  * integer-backed orderables (INT, BIGINT, DATE, TIMESTAMP,
  * TIMESTAMP_NTZ). First fields must not be null; ties on the first
  * field resolve to the LAST element in array order (sort_array breaks
  * first-field ties by the later fields, making the result
  * deterministic — max ts, then max payload).
  */
case class AsOfLookup(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  // NULL when the array is empty or every element is after the key, so
  // (as with DotProduct) this must not inherit the children's
  // nullability — a literal-false isNull would break the generated code
  override def nullable: Boolean = true

  private def keyIsLongBacked: Boolean = right.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case IntegerType | DateType => false
    case _ => false
  }

  private def numFields: Int =
    left.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].length

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(st: StructType, containsNull) =>
      if (containsNull)
        TypeCheckResult.TypeCheckFailure(
          "asof_lookup needs an array WITHOUT null elements " +
            "(build it with sort_array(collect_list(...)))")
      else if (st.isEmpty || st.head.dataType != right.dataType)
        TypeCheckResult.TypeCheckFailure(
          s"asof_lookup: first struct field (${st.headOption.map(_.dataType)}) " +
            s"must match the key type (${right.dataType})")
      else right.dataType match {
        case LongType | IntegerType | DateType | TimestampType |
            TimestampNTZType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"asof_lookup key must be an integer-backed orderable, got $t")
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"asof_lookup needs ARRAY<STRUCT<...>>, got $t")
  }

  override def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val key = if (keyIsLongBacked) k.asInstanceOf[Long]
              else k.asInstanceOf[Int].toLong
    val nf = numFields
    var lo = 0; var hi = arr.numElements() - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val ts = if (keyIsLongBacked) arr.getStruct(mid, nf).getLong(0)
               else arr.getStruct(mid, nf).getInt(0).toLong
      if (ts <= key) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) null else arr.getStruct(ans, nf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val ans = ctx.freshName("ans")
      val ts = ctx.freshName("ts")
      val nf = numFields
      val getTs =
        if (keyIsLongBacked) s"$a.getStruct($mid, $nf).getLong(0)"
        else s"(long) $a.getStruct($mid, $nf).getInt(0)"
      val key = if (keyIsLongBacked) k else s"(long) $k"
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |int $ans = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $ts = $getTs;
         |  if ($ts <= $key) { $ans = $mid; $lo = $mid + 1; } else { $hi = $mid - 1; }
         |}
         |if ($ans < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $a.getStruct($ans, $nf);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AsOfLookup = copy(left = newLeft, right = newRight)
}

object TemporalFunctions {
  /** asof_lookup(arr, key) over a first-field-sorted ARRAY<STRUCT>. */
  def asofLookup(arr: Column, key: Column): Column =
    GraftShim.column(AsOfLookup(
      GraftShim.expression(arr), GraftShim.expression(key)))
}
