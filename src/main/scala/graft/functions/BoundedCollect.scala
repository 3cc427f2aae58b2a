package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType}

/** `collect_list` with a hard per-group element bound: the buffer stops
  * growing at `limit + 1` elements, so an over-cap group is observable
  * (`size(result) > limit`) without ever materializing it.
  *
  * This is the memory-safe primitive under the dedup bucket operators
  * ([[graft.ops.Dedup.lshCandidatePairs]] and friends): they group docs by
  * a bucket key and DROP over-cap buckets, but with a plain `collect_list`
  * a degenerate bucket (constant boilerplate at web scale — millions of
  * identical fingerprints in one 16-bit chunk) buffers every id in one
  * aggregation row in one task before the size filter can discard it.
  * Bounding inside the aggregate makes the worst-case per-group memory
  * `limit + 1` elements BY CONSTRUCTION, per partial AND after merge, while
  * under-cap groups collect exactly what `collect_list` would (arrival
  * order; nulls skipped, matching `collect_list`). Which elements survive
  * in an over-cap group is unspecified — every caller drops those groups.
  *
  * Elements may be any data type (ids, structs); partials serialize each
  * element through an `UnsafeProjection` of the child type.
  */
case class BoundedCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]] {

  require(limit >= 0, s"limit must be non-negative, got $limit")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType)

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow)
  : mutable.ArrayBuffer[Any] = {
    if (buf.size <= limit) {
      val v = child.eval(input)
      // values handed out by eval may be backed by reused row buffers —
      // copy before retaining across rows (the collect_list contract)
      if (v != null) buf += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val it = other.iterator
    while (buf.size <= limit && it.hasNext) buf += it.next()
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  @transient private lazy val proj =
    UnsafeProjection.create(Array(child.dataType))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val bytes = proj(InternalRow(v)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      row.pointTo(b, b.length)
      buf += InternalRow.copyValue(row.get(0, child.dataType))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollect =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BoundedCollect {
  def apply(c: Column, limit: Int): Column =
    Bridge.column(
      BoundedCollect(Bridge.expression(c), limit).toAggregateExpression())
}
