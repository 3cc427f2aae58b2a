package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float|double>` columns — the fused
  * form of `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, v) =>
  * acc + v)`: one loop, no intermediate array, whole-stage codegen.
  *
  * Semantics replicate the built-in chain EXACTLY so the
  * [[graft.plans.FuseDotProduct]] optimizer rule may substitute it:
  * sequential double accumulation in element order (bit-identical sums),
  * and null when the arrays differ in length or any element is null
  * (zip_with pads the shorter side with null, which nulls the product and
  * then the running sum).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOf(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOf(left).isDefined && elemOf(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val (lt, rt) = (elemOf(left).get, elemOf(right).get)
    def get(v: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => v.getFloat(i).toDouble
      case _ => v.getDouble(i)
    }
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += get(x, lt, i) * get(y, rt, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def accessor(t: DataType) =
        if (t == FloatType) "getFloat" else "getDouble"
      val (la, ra) = (accessor(elemOf(left).get), accessor(elemOf(right).get))
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += ((double) $a.$la($i)) * ((double) $b.$ra($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
