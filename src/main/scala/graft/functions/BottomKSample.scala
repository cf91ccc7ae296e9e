package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k sampling helpers. MD5 of "seed:id" gives a uniform,
  * engine-independent priority (DuckDB's md5 produces the identical
  * hex, so the oracle replays the exact sample) — ThreadLocal digest
  * because MessageDigest is stateful and the same aggregate instance
  * can be driven from multiple tasks.
  */
object BottomKAlgos {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def priority(seed: String, id: Long): String = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s"$seed:$id".getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    bytes.foreach { b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)) }
    sb.toString
  }
}

/** Bounded bottom-k set of (priority, id), kept sorted; insert is
  * O(log k) and the k-th priority prunes everything above it.
  */
final class BottomKBuffer(val k: Int) {
  val set: scala.collection.mutable.TreeSet[(String, Long)] =
    scala.collection.mutable.TreeSet.empty[(String, Long)]

  def add(priority: String, id: Long): Unit = {
    if (set.size < k) set.add((priority, id))
    else if (Ordering[(String, Long)].lt((priority, id), set.last)) {
      set.add((priority, id))
      if (set.size > k) set.remove(set.last)
    }
  }

  def mergeIn(o: BottomKBuffer): Unit = o.set.foreach { case (p, i) => add(p, i) }
}

/** C29: deterministic bottom-k uniform sample per group (the KMV
  * construction): keep the k ids with the SMALLEST md5(seed||id).
  * Mergeable — union-then-trim is associative and commutative, so
  * map-side partials hold k entries each and the shuffle moves k rows
  * per group per partition instead of the whole group. Because the
  * priority is a pure hash, the sample is identical on any engine,
  * any partitioning, and any re-materialization of a 100 TB corpus —
  * the property reservoir sampling (RNG state per partition) cannot
  * give. Emits the sampled ids ordered by priority.
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    seed: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {
  require(k >= 1 && k <= (1 << 20), "k must be in [1, 2^20]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_sample needs BIGINT, got ${child.dataType.sql}")

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      b.add(BottomKAlgos.priority(seed, id), id)
    }
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: BottomKBuffer): Any =
    new GenericArrayData(b.set.toArray.map(_._2))

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.set.size)
    b.set.foreach { case (p, i) => out.writeUTF(p); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BottomKBuffer(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val p = in.readUTF(); val i = in.readLong(); buf.set.add((p, i))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BottomKSample = copy(child = cs.head)
}
