package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Boxing-free index sort for the sketch buffers: both summaries
  * sort their (double value, long weight) buffer on EVERY compaction
  * (~capacity/2 inserts apart), and `(0 until n).sortBy(tuple)` paid
  * a boxed tuple allocation per element per compaction — the
  * dominant constant in a 600k-insert aggregate. This is a plain
  * dual-pivot-free quicksort on an int index array comparing
  * (primary, secondary, index); the trailing index key makes every
  * key distinct, which reproduces a STABLE sort's order exactly, so
  * sketch states are bit-identical to the sortBy form.
  */
private[functions] object IndexSort {
  /** Sorted index array over (primary(i)[, secondary(i)], i);
    * `secondary` may be null to compare (primary(i), i) only.
    */
  def sorted(n: Int, primary: Array[Double],
             secondary: Array[Long]): Array[Int] = {
    val idx = new Array[Int](n)
    var i = 0
    while (i < n) { idx(i) = i; i += 1 }
    def less(a: Int, b: Int): Boolean = {
      val c = java.lang.Double.compare(primary(a), primary(b))
      if (c != 0) c < 0
      else if (secondary != null && secondary(a) != secondary(b))
        secondary(a) < secondary(b)
      else a < b
    }
    def sort(lo: Int, hi: Int): Unit =
      if (hi - lo < 12) { // insertion sort for small ranges
        var i = lo + 1
        while (i <= hi) {
          val v = idx(i)
          var j = i - 1
          while (j >= lo && less(v, idx(j))) { idx(j + 1) = idx(j); j -= 1 }
          idx(j + 1) = v
          i += 1
        }
      } else {
        // median-of-three pivot; all keys distinct (index tiebreak)
        val mid = (lo + hi) >>> 1
        val pivot =
          if (less(idx(lo), idx(mid)))
            (if (less(idx(mid), idx(hi))) idx(mid)
             else if (less(idx(lo), idx(hi))) idx(hi) else idx(lo))
          else
            (if (less(idx(lo), idx(hi))) idx(lo)
             else if (less(idx(mid), idx(hi))) idx(hi) else idx(mid))
        var i = lo
        var j = hi
        while (i <= j) {
          while (less(idx(i), pivot)) i += 1
          while (less(pivot, idx(j))) j -= 1
          if (i <= j) {
            val t = idx(i); idx(i) = idx(j); idx(j) = t
            i += 1; j -= 1
          }
        }
        if (lo < j) sort(lo, j)
        if (i < hi) sort(i, hi)
      }
    if (n > 1) sort(0, n - 1)
    idx
  }
}

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
    val idx = IndexSort.sorted(size, values, weights)
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
    val idx = IndexSort.sorted(size, values, null)
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
