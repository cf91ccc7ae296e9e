package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded heavy-hitters state: item -> (count, maxError). When full,
  * a new item evicts the current minimum and inherits its count as
  * error (Metwally et al., "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", 2005). Counts are exact whenever
  * distinct items <= capacity.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  val counts = mutable.HashMap.empty[String, (Long, Long)]

  def add(item: String, weight: Long = 1L): Unit =
    counts.get(item) match {
      case Some((c, e)) => counts.update(item, (c + weight, e))
      case None if counts.size < capacity => counts.update(item, (weight, 0L))
      case None =>
        val (minItem, (minC, _)) = counts.minBy { case (i, (c, _)) => (c, i) }
        counts.remove(minItem)
        counts.update(item, (minC + weight, minC))
    }

  /** Min count = the floor any evicted item's true count could have
    * reached; 0 while under capacity (nothing was ever evicted).
    */
  private def floor: Long =
    if (counts.size < capacity) 0L else counts.valuesIterator.map(_._1).min

  def mergeIn(other: SpaceSavingBuffer): Unit = {
    // mergeable space-saving (Agarwal et al., "Mergeable summaries"):
    // an item missing from one side may have been evicted there with
    // true count up to that side's min — add the floor to both count
    // and error so estimates stay overestimates after the merge.
    val fSelf = floor
    val fOther = other.floor
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    (counts.keySet ++ other.counts.keySet).foreach { i =>
      val (cA, eA) = counts.getOrElse(i, (fSelf, fSelf))
      val (cB, eB) = other.counts.getOrElse(i, (fOther, fOther))
      merged.update(i, (cA + cB, eA + eB))
    }
    counts.clear()
    counts ++= merged
    while (counts.size > capacity) {
      val (minItem, _) = counts.minBy { case (i, (c, _)) => (c, i) }
      counts.remove(minItem)
    }
  }
}

/** Aggregate: space-saving top-k by frequency of a string column.
  * TypedImperativeAggregate = opaque mutable buffer + explicit
  * serialize/merge, so Spark partial-aggregates it map-side and
  * merges per-partition sketches at the reducer — constant memory
  * per partition regardless of key cardinality (what makes a top-k
  * over a 100 TB column feasible at all).
  *
  * Returns array<struct<item,cnt,err>> of the k most frequent, count
  * desc then item asc (deterministic; err is the overestimate bound).
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: SpaceSavingBuffer): Any = {
    val top = b.counts.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) =>
        InternalRow(UTF8String.fromString(i), c, e)
      }
    new GenericArrayData(top.toArray[Any])
  }

  override def serialize(b: SpaceSavingBuffer): Array[Byte] =
    SpaceSavingCodec.write(b)

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingCodec.read(bytes)

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SpaceSavingTopK = copy(child = cs.head)
}

/** Shared wire format for [[SpaceSavingBuffer]] — one codec for the
  * in-flight partial-aggregate state AND the storable sketch value,
  * so a sketch written by [[SpaceSavingSketchAgg]] is exactly the
  * bytes [[SpaceSavingMergeTopK]] consumes.
  */
object SpaceSavingCodec {
  def write(b: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (i, (c, e)) =>
      val bytes = i.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  def read(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.counts.update(new String(b, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }
}

/** The space-saving state AS a storable binary value (the
  * [[HllSketchAgg]] pattern for heavy hitters): pre-aggregate a
  * segment once, re-merge later with [[SpaceSavingMergeTopK]].
  * Counts stay exact whenever per-merged-scope distinct items fit
  * the capacity; otherwise the mergeable-summaries floor bound
  * applies (err tracks it).
  */
case class SpaceSavingSketchAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)
  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }
  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.mergeIn(o); b
  }
  override def eval(b: SpaceSavingBuffer): Any = SpaceSavingCodec.write(b)
  override def serialize(b: SpaceSavingBuffer): Array[Byte] = SpaceSavingCodec.write(b)
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingCodec.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SpaceSavingSketchAgg = copy(child = cs.head)
}

/** Merge stored [[SpaceSavingSketchAgg]] binaries and emit the top-k
  * (same output shape and ordering as [[SpaceSavingTopK]]).
  */
case class SpaceSavingMergeTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)
  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)
  override def update(b: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) b.mergeIn(SpaceSavingCodec.read(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: SpaceSavingBuffer, o: SpaceSavingBuffer): SpaceSavingBuffer = {
    b.mergeIn(o); b
  }
  override def eval(b: SpaceSavingBuffer): Any = {
    val top = b.counts.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(k)
      .map { case (i, (c, e)) => InternalRow(UTF8String.fromString(i), c, e) }
    new GenericArrayData(top.toArray[Any])
  }
  override def serialize(b: SpaceSavingBuffer): Array[Byte] = SpaceSavingCodec.write(b)
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer =
    SpaceSavingCodec.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingMergeTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingMergeTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): SpaceSavingMergeTopK = copy(child = cs.head)
}
