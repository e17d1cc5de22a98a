package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate`:
  * approximate top items over a string column with ≤ `k-1` counters of
  * state per partition, merged once — the sketch path for corpora where
  * an exact `groupBy(token).count()` would shuffle the full key set
  * (trillions of tokens at 100 TB; this ships k counters per partition).
  *
  * Guarantees (mergeable-summaries semantics): after observing n items,
  * every item with true count > n/k is present, and each reported
  * estimate lies in [true − n/k, true]. Counter VALUES depend on merge
  * order (within the bound), so this is deliberately not in the oracle
  * contract — SketchSpec asserts the bounds instead, the same policy as
  * the HLL/quantile sketches.
  *
  * Output: array<struct<item:string, est:bigint>> sorted by
  * (est desc, item) — deterministic given the final counter state.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k >= 2, "heavy_hitters needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def offer(b: mutable.HashMap[UTF8String, Long], item: UTF8String, w: Long): Unit =
    b.get(item) match {
      case Some(c) => b.update(item, c + w)
      case None if b.size < k - 1 => b.update(item.clone(), w)
      case None =>
        // decrement-all by min(w, smallest counter would go negative):
        // classic MG decrements by 1 per arrival; weighted form subtracts
        // d = min(w, min counter), re-offers the remainder
        val d = math.min(w, b.values.min)
        val dead = b.iterator.flatMap { case (i, c) =>
          if (c - d <= 0) Some(i) else None
        }.toList
        b.mapValuesInPlace((_, c) => c - d)
        dead.foreach(b.remove)
        if (w - d > 0) offer(b, item, w - d)
    }

  override def update(
      b: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[UTF8String], 1L)
    b
  }

  override def merge(
      x: mutable.HashMap[UTF8String, Long],
      y: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    // merge = add counters, then truncate back to k-1 by subtracting the
    // k-th largest count (Agarwal et al., mergeable summaries)
    y.foreach { case (i, c) => x.update(i, x.getOrElse(i, 0L) + c) }
    if (x.size > k - 1) {
      val kth = x.values.toArray.sorted(Ordering[Long].reverse)(k - 1)
      val dead = x.iterator.flatMap { case (i, c) => if (c - kth <= 0) Some(i) else None }.toList
      x.mapValuesInPlace((_, c) => c - kth)
      dead.foreach(x.remove)
    }
    x
  }

  override def eval(b: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = b.toArray.sortBy { case (i, c) => (-c, i.toString) }
    new GenericArrayData(sorted.map { case (i, c) =>
      new GenericInternalRow(Array[Any](i, c)): Any
    })
  }

  override def serialize(b: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val items = b.toArray
    val bytes = items.map(_._1.getBytes)
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), ib) =>
      bb.putInt(ib.length); bb.put(ib); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val ib = new Array[Byte](len)
      bb.get(ib)
      b.update(UTF8String.fromBytes(ib), bb.getLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(child = newChildren.head)
}

object HeavyHittersAgg {
  /** Aggregate Column over a string column: items with frequency > n/k
    * are guaranteed present; estimates within n/k of truth. */
  def of(item: Column, k: Int): Column =
    bridge.column(HeavyHittersAgg(bridge.expression(item), k).toAggregateExpression())
}
