package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over ARRAY<DOUBLE> columns.
  *
  * The higher-order-function form `aggregate(zip_with(a, b, *), 0d, +)`
  * allocates an intermediate array and evaluates a lambda per element —
  * ~40× slower on the all-pairs similarity join (q37: 12.5M pairs × 64
  * dims at sf0.1). This expression generates a tight primitive loop
  * inside whole-stage codegen: no allocation, no virtual calls. The
  * summation order (sequential, index ascending) is IDENTICAL to the
  * HOF fold it replaces, so oracle-checked results are bit-unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Can return NULL on a length mismatch even when both children are
  // non-null, so this must NOT inherit BinaryExpression's
  // `left.nullable || right.nullable`: with two non-nullable children
  // that default makes ev.isNull the literal `false`, the generated
  // `false = true;` fails to compile, and the whole projection silently
  // falls back to interpreted mode — the exact hot path this
  // expression exists to speed up.
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(DoubleType, containsNull = false) ||
        t == ArrayType(DoubleType, containsNull = true)
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs ARRAY<DOUBLE> on both sides, got ${left.dataType} / ${right.dataType}")
  }

  // Semantics match the HOF form it replaces exactly: mismatched
  // lengths or a null element yield NULL (zip_with pads with nulls, so
  // the fold nulls out) — required for RewriteDotProduct to be a pure
  // optimization. The null branches compile away when both inputs are
  // containsNull = false.
  private def elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (elementsNullable)
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** dot(a, b) over ARRAY<DOUBLE> columns (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(DotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))
}
