package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-bit SimHash over an `array<long>` of token hashes: per bit b,
  * sum +1/−1 across tokens by bit b of each hash; the fingerprint sets bit
  * b when the sum is positive.
  *
  * The portable formulation — 64 separate `aggregate` folds OR-ed together
  * — re-reads the hash array 64 times and expands into enormous generated
  * code (64 inlined fold loops per occurrence), well past the JIT's happy
  * zone. This expression is ONE loop carrying 64 counters: O(tokens)
  * array reads, compact codegen, whole-stage friendly — the textbook case
  * for a custom Catalyst expression (a reduction builtins can only express
  * by repeating the pass per output bit). Bit semantics are identical to
  * the fold chain on non-null input (DedupSpec asserts equality); a null
  * element or null array yields null (standard expression nulling).
  * Registered for SQL as `simhash64` via [[GraftFunctions.register]].
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val h = x.getLong(i)
      var b = 0
      while (b < 64) {
        cnt(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $cnt[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $fp = 0L;
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ($cnt[$b] > 0) $fp |= (1L << $b);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object SimHash64 {
  def apply(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))
}
