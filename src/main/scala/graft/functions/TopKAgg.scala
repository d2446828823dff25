package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Grouped top-k as a bounded-heap aggregate.
  *
  * The window formulation (`row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k`) shuffles and fully sorts EVERY row of every group; this
  * aggregate keeps a k-bounded min-heap per group and benefits from
  * map-side partial aggregation — only k rows per (mapper, group) reach
  * the shuffle. At 100 TB with small k that's the difference between
  * shuffling the fact table and shuffling k x |groups| rows.
  *
  * Returns array<struct<ord: double, payload: long>> sorted descending by
  * (ord, payload) — ties broken by payload for determinism.
  */
case class TopKAgg(ordExpr: Expression, payloadExpr: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  private val ordering: Ordering[(Double, Long)] = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, ordering)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)], v: (Double, Long)): Unit = {
    if (buf.size < k) buf.offer(v)
    else if (ordering.compare(v, buf.peek()) > 0) { buf.poll(); buf.offer(v) }
  }

  override def update(buf: java.util.PriorityQueue[(Double, Long)],
                      input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val o = ordExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (o != null && p != null)
      offer(buf, (o.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(b1: java.util.PriorityQueue[(Double, Long)],
                     b2: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size)).sorted(ordering.reverse)
    new GenericArrayData(arr.map { case (o, p) =>
      InternalRow(o, p)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (o, p) = it.next(); bb.putDouble(o); bb.putLong(p) }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.offer((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", DoubleType), StructField("payload", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ordExpr, payloadExpr)
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ordExpr = cs(0), payloadExpr = cs(1))
}

object TopKAgg {
  import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
  /** topK(ord, payload, k): array of the k largest (ord, payload) pairs. */
  def top_k(ord: Column, payload: Column, k: Int): Column =
    column(TopKAgg(expression(ord), expression(payload), k).toAggregateExpression())
}
