package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bounded weighted-compactor quantile summary (the single-compactor
  * shape of KLL / mergeable equi-depth summaries — Karnin, Lang,
  * Liberty 2016 — with DETERMINISTIC pair collapsing instead of coin
  * flips: the kept element of each adjacent pair alternates by pair
  * index, so runs are reproducible; like t-digest, the state still
  * depends on merge order, so accuracy assertions must hold under ANY
  * partitioning — rank error stays O(collapses/capacity), ~1% at
  * capacity 2048 on 1e6 rows, asserted at 5%).
  */
final class QuantileBuffer(val capacity: Int) {
  var values: Array[Double] = new Array[Double](capacity + 1)
  var weights: Array[Long] = new Array[Long](capacity + 1)
  var size: Int = 0

  def add(v: Double, w: Long = 1L): Unit = {
    values(size) = v; weights(size) = w; size += 1
    if (size > capacity) compact()
  }

  /** Sort by value and collapse adjacent pairs: survivor alternates
    * left/right by pair index (deterministic, bias-balancing); its
    * weight absorbs the partner's. Halves the buffer.
    */
  def compact(): Unit = {
    val idx = (0 until size).sortBy(i => (values(i), weights(i), i))
    val nv = new Array[Double](capacity + 1)
    val nw = new Array[Long](capacity + 1)
    var out = 0
    var p = 0
    while (p + 1 < size) {
      val (i, j) = (idx(p), idx(p + 1))
      val keepLeft = (p / 2) % 2 == 0
      nv(out) = if (keepLeft) values(i) else values(j)
      nw(out) = weights(i) + weights(j)
      out += 1; p += 2
    }
    if (p < size) { nv(out) = values(idx(p)); nw(out) = weights(idx(p)); out += 1 }
    values = nv; weights = nw; size = out
  }

  def mergeIn(o: QuantileBuffer): Unit = {
    var i = 0
    while (i < o.size) { add(o.values(i), o.weights(i)); i += 1 }
  }

  /** Weighted quantile: smallest value whose cumulative weight reaches
    * q of the total.
    */
  def quantile(q: Double): Double = {
    if (size == 0) return Double.NaN
    val idx = (0 until size).sortBy(i => values(i))
    val total = weights.take(size).sum
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var k = 0
    while (k < size) {
      cum += weights(idx(k))
      if (cum >= target) return values(idx(k))
      k += 1
    }
    values(idx(size - 1))
  }
}

/** B21b (sketch tier): approximate quantile as a
  * TypedImperativeAggregate — fixed memory per group per partition,
  * map-side partials, merge = re-feed the partner's weighted items.
  * The scale path where exact `percentile`'s full sort-per-group is
  * unaffordable.
  */
case class ApproxQuantile(
    child: Expression,
    q: Double,
    capacity: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileBuffer] {
  require(q > 0.0 && q < 1.0, "quantile q must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  // nullable: a group whose inputs are ALL null has an empty buffer —
  // return SQL NULL to match exact percentile's semantics (a NaN here
  // would silently break parity with the exact aggregate)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): QuantileBuffer =
    new QuantileBuffer(capacity)

  override def update(b: QuantileBuffer, input: InternalRow): QuantileBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => other.toString.toDouble
    })
    b
  }

  override def merge(b: QuantileBuffer, o: QuantileBuffer): QuantileBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: QuantileBuffer): Any =
    if (b.size == 0) null else b.quantile(q)

  override def serialize(b: QuantileBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.capacity); out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.values(i)); out.writeLong(b.weights(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new QuantileBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): ApproxQuantile =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ApproxQuantile =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ApproxQuantile = copy(child = cs.head)
}
