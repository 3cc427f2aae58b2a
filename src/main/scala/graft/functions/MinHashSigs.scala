package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash slots over an `array<long>` of shingle base
  * hashes, in ONE pass: slot j = min over elements h of the builtin
  * `array_min(transform(bh, h => xxhash64(h, j)))` value — both reduce
  * to `XXH64.hashInt(j, XXH64.hashLong(h, 42))` (Spark's own static
  * hash; the int literal slot index hashes via hashInt), so bit parity
  * is structural, and DedupSpec asserts it.
  *
  * The builtin formulation materializes `numHashes` intermediate arrays
  * per row (one `transform` per slot) and traverses the base-hash array
  * `numHashes` times; this expression carries the `numHashes` running
  * minima through a single traversal with zero allocation beyond the
  * output. Null/empty semantics: empty or null array → null (the builtin
  * chain's `array_min(empty)` also nulls every slot); a null ELEMENT →
  * null (builtins would skip it — base hashes are never null by
  * construction, shingles are non-null strings).
  * Registered for SQL as `minhash_sigs(bh, n)`.
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<bigint> and numHashes > 0, got " +
        s"${other.simpleString} / $numHashes")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val base = XXH64.hashLong(x.getLong(i), 42L)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, base)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
  : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $base = $xxh.hashLong($a.getLong($i), 42L);
         |    for (int $j = 0; $j < $numHashes; $j++) {
         |      long $v = $xxh.hashInt($j, $base);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}

object MinHashSigs {
  def apply(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(c), numHashes))
}
