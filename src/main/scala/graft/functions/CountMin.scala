package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005): a depth x width
  * counter grid; each key increments one counter per row (row i's
  * position derived from the double-hashing scheme h1 + i*h2, h2
  * forced odd, width a power of two so the mix is a mask, not a
  * mod). Point frequency = min over rows — ALWAYS an overestimate,
  * within eps*N (eps = e/width) with probability 1 - e^-depth.
  *
  * The grid is LINEAR: merge = element-wise add, so the sketch of a
  * corpus equals the union of its shards' sketches BIT-FOR-BIT —
  * partial aggregation and store-then-merge are exact with respect
  * to the sketch (stronger than HLL's order-invariance; spec'd).
  * Completes the storable sketch store: HLL = cardinality,
  * SpaceSaving = heavy hitters, KMV = sample, GK/t-digest =
  * quantiles, Bloom = membership, CMS = point frequency.
  */
final class CmsBuffer(val depth: Int, val widthLog2: Int) {
  val width: Int = 1 << widthLog2
  val counts: Array[Long] = new Array[Long](depth * width)

  def add(h: Long, inc: Long = 1L): Unit = {
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < depth) {
      val idx = ((h + i * h2) & (width - 1)).toInt
      counts(i * width + idx) += inc
      i += 1
    }
  }

  def query(h: Long): Long = {
    val h2 = (h >>> 32) | 1L
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val idx = ((h + i * h2) & (width - 1)).toInt
      val c = counts(i * width + idx)
      if (c < est) est = c
      i += 1
    }
    est
  }

  def mergeIn(o: CmsBuffer): Unit = {
    require(o.depth == depth && o.widthLog2 == widthLog2,
      s"CMS shape mismatch: ${o.depth}x${o.widthLog2} vs ${depth}x$widthLog2")
    var i = 0
    while (i < counts.length) { counts(i) += o.counts(i); i += 1 }
  }
}

object CmsCodec {
  def write(b: CmsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 8 * b.counts.length)
    bb.put(b.depth.toByte).put(b.widthLog2.toByte)
    var i = 0
    while (i < b.counts.length) { bb.putLong(b.counts(i)); i += 1 }
    bb.array()
  }

  def read(bytes: Array[Byte]): CmsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new CmsBuffer(bb.get().toInt, bb.get().toInt)
    var i = 0
    while (i < buf.counts.length) { buf.counts(i) = bb.getLong(); i += 1 }
    buf
  }
}

/** Aggregate a key column into a serialized CMS grid (binary) — the
  * storable form: build per segment (day, shard), store, re-merge
  * with [[CmsUnionSketch]], probe with [[CmsQuery]].
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = 4,
    widthLog2: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {
  require(depth >= 1 && depth <= 16, "cms depth must be in [1, 16]")
  require(widthLog2 >= 4 && widthLog2 <= 24, "cms widthLog2 must be in [4, 24]")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, widthLog2)
  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(XxHash64Function.hash(v, child.dataType, 42L))
    b
  }
  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = { b.mergeIn(o); b }
  override def eval(b: CmsBuffer): Any = CmsCodec.write(b)
  override def serialize(b: CmsBuffer): Array[Byte] = CmsCodec.write(b)
  override def deserialize(bytes: Array[Byte]): CmsBuffer = CmsCodec.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CmsSketchAgg = copy(child = cs.head)
}

/** Fold stored CMS binaries ([[CmsSketchAgg]] output) into one merged
  * sketch — element-wise add, so fold order and sharding never change
  * a single counter.
  */
case class CmsUnionSketch(
    child: Expression,
    depth: Int = 4,
    widthLog2: Int = 11,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(depth, widthLog2)
  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) b.mergeIn(CmsCodec.read(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = { b.mergeIn(o); b }
  override def eval(b: CmsBuffer): Any = CmsCodec.write(b)
  override def serialize(b: CmsBuffer): Array[Byte] = CmsCodec.write(b)
  override def deserialize(bytes: Array[Byte]): CmsBuffer = CmsCodec.read(bytes)
  override def withNewMutableAggBufferOffset(o: Int): CmsUnionSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnionSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): CmsUnionSketch = copy(child = cs.head)
}

/** Inner product of two stored CMS binaries: min over the depth rows
  * of the per-row counter dot product — the classic join-cardinality
  * estimator (Cormode & Muthukrishnan 2005 §4.2): for sketches of
  * join-key columns A and B, every row's dot product >= |A join B|
  * exactly (each true (a,b) key pair lands in the same bucket per
  * row), with expected overshoot N_A*N_B/width per row. The
  * optimizer-statistics use of CMS, complementing [[CmsQuery]]'s
  * point frequency. One evaluation over two driver-sized binaries —
  * never in a fact-table hot path.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = CmsCodec.read(a.asInstanceOf[Array[Byte]])
    val y = CmsCodec.read(b.asInstanceOf[Array[Byte]])
    require(x.depth == y.depth && x.widthLog2 == y.widthLog2,
      s"CMS shape mismatch: ${x.depth}x${x.widthLog2} vs ${y.depth}x${y.widthLog2}")
    // saturating accumulation: at ~1e11+ rows into a 4x16384 grid the
    // per-row dot product approaches Long.MaxValue — overflow must
    // pin to the ceiling (a huge-but-ordered estimate), never wrap to
    // a garbage negative
    var est = Long.MaxValue
    var i = 0
    while (i < x.depth) {
      var dot = 0L
      var b2 = 0
      while (b2 < x.width && dot != Long.MaxValue) {
        try dot = Math.addExact(dot,
          Math.multiplyExact(x.counts(i * x.width + b2), y.counts(i * y.width + b2)))
        catch { case _: ArithmeticException => dot = Long.MaxValue }
        b2 += 1
      }
      if (dot < est) est = dot
      i += 1
    }
    est
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsInnerProduct = copy(left = l, right = r)
}

/** Point-frequency probe into a stored CMS binary: min over the
  * depth rows at the key's positions. Deserializes the sketch per
  * evaluation (CodegenFallback) — meant for probe-frame-sized plans
  * (keys joined against ONE broadcast sketch), not fact-table hot
  * paths; the build/merge side is where the volume lives.
  */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val buf = CmsCodec.read(sketch.asInstanceOf[Array[Byte]])
    buf.query(XxHash64Function.hash(key, right.dataType, 42L))
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsQuery = copy(left = l, right = r)
}
