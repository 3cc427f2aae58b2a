package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy hitters: the exact-candidate frequent-items sketch.
  *
  * A bounded (k-slot) frequency map per partition, merged by summing slots
  * and re-compressing — the classic mergeable summary. Guarantees: every
  * value with true frequency > N/k survives; reported counts undercount by
  * at most N/k. This is the 100 TB replacement for an exact value_counts
  * when the value domain is unbounded (user-agents, URLs, shingles): fixed
  * memory per partition, one pass, no shuffle of the raw column.
  *
  * Returns map<string, long> of surviving candidates → lower-bound counts.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Misra-Gries decrement step, weighted (merge feeds whole partial counts
    * through here). A full buffer is decremented by min(residual, smallest
    * counter) — never the full weight at once: decrementing by the whole
    * incoming count would over-punish every resident counter AND drop the
    * incoming key's residual weight, losing heavy keys that arrive as merged
    * partials. Zeroed slots are evicted (freeing room), and the loop repeats
    * until the residual is absorbed as decrements or inserted.
    */
  private def offer(buf: mutable.HashMap[String, Long], key: String,
      inc: Long): Unit = {
    var rem = inc
    while (rem > 0) {
      if (buf.contains(key) || buf.size < k) {
        buf.update(key, buf.getOrElse(key, 0L) + rem)
        rem = 0
      } else {
        val dec = math.min(rem, buf.valuesIterator.min)
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { kk =>
          val v = buf(kk) - dec
          if (v <= 0) dead += kk else buf.update(kk, v)
        }
        dead.foreach(buf.remove)
        rem -= dec
      }
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
  : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long])
  : mutable.HashMap[String, Long] = {
    other.foreach { case (key, cnt) => offer(buf, key, cnt) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (key, cnt) => (-cnt, key) }
    new ArrayBasedMapData(
      new GenericArrayData(sorted.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(sorted.map(_._2)))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, cnt) => out.writeUTF(key); out.writeLong(cnt) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
  : mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => buf.update(in.readUTF(), in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHitters =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  def apply(c: Column, k: Int): Column =
    Bridge.column(
      HeavyHitters(Bridge.expression(c), k).toAggregateExpression())
}
