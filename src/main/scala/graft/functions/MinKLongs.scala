package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded set of the k smallest distinct longs — the raw KMV
  * (k-minimum-values) sketch over a hashed column. Insert prunes on
  * the current k-th value, so a partial holds at most k entries.
  */
final class MinKBuffer(val k: Int) {
  val set: scala.collection.mutable.TreeSet[Long] =
    scala.collection.mutable.TreeSet.empty[Long]

  def add(v: Long): Unit = {
    if (set.size < k) set.add(v)
    else if (v < set.last && !set.contains(v)) {
      set.add(v)
      set.remove(set.last)
    }
  }

  def mergeIn(o: MinKBuffer): Unit = o.set.foreach(add)
}

/** min_k(expr, k): the k smallest DISTINCT long values, ascending —
  * the KMV distinct/overlap sketch when expr is a hash. Mergeable
  * (union-then-trim is associative+commutative): map-side partials
  * move k values per group per partition, never the value stream —
  * the property that lets a 100 TB vocabulary overlap query move
  * only k-row sketches per corpus slice. Deterministic for a given
  * input set (pure set algebra, no RNG), so results are identical on
  * any partitioning.
  */
case class MinKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {
  require(k >= 1 && k <= (1 << 20), "k must be in [1, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_k needs BIGINT, got ${child.dataType.sql}")

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(b: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: MinKBuffer, o: MinKBuffer): MinKBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: MinKBuffer): Any =
    new GenericArrayData(b.set.toArray)

  override def serialize(b: MinKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.set.size)
    b.set.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MinKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MinKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => buf.set.add(in.readLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MinKLongs = copy(child = cs.head)
}
