package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog register file: 2^p byte registers holding the max
  * leading-zero rank seen per bucket (Flajolet et al. 2007,
  * "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm"). Deterministic (xxhash64, fixed seed) and
  * mergeable by register-wise max — merge order never changes the
  * estimate, which is what makes map-side partial aggregation exact
  * with respect to the sketch.
  */
final class HllBuffer(val p: Int) {
  val m: Int = 1 << p
  val regs: Array[Byte] = new Array[Byte](m)

  def add(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = if (w == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeIn(o: HllBuffer): Unit = {
    var i = 0
    while (i < m) { if (o.regs(i) > regs(i)) regs(i) = o.regs(i); i += 1 }
  }

  def estimate: Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      z += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / z
    // small-range correction: linear counting while registers are
    // sparse (the raw estimator is biased low there)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** B9 (sketch tier): approximate COUNT(DISTINCT) as a
  * TypedImperativeAggregate — bounded memory (2^p bytes) per group
  * per partition regardless of cardinality, partials merged
  * register-wise. At 100 TB this replaces the exact distinct's
  * full shuffle of every key with a fixed-size sketch per group.
  * Standard error ~ 1.04/sqrt(2^p) (p=12 -> ~1.6%).
  */
case class HllDistinct(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {
  require(p >= 4 && p <= 18, "hll precision p must be in [4, 18]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)

  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(XxHash64Function.hash(v, child.dataType, 42L))
    b
  }

  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.mergeIn(o); b }

  override def eval(b: HllBuffer): Any = math.round(b.estimate)

  override def serialize(b: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + b.m)
    out(0) = b.p.toByte
    System.arraycopy(b.regs, 0, out, 1, b.m)
    out
  }

  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.m)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HllDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllDistinct = copy(child = cs.head)
}

/** The HLL register file AS a value: aggregates a key column into the
  * serialized sketch (binary) instead of the estimate, so sketches
  * can be stored per segment (day, partition, shard) and re-merged
  * later — the pre-aggregated form that makes sliding-window and
  * rollup distinct counts segment-frame-sized instead of
  * fact-sized. Pair with [[HllMergeEstimate]].
  */
case class HllSketchAgg(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {
  require(p >= 4 && p <= 18, "hll precision p must be in [4, 18]")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)
  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(XxHash64Function.hash(v, child.dataType, 42L))
    b
  }
  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.mergeIn(o); b }
  override def eval(b: HllBuffer): Any = serialize(b)
  override def serialize(b: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + b.m)
    out(0) = b.p.toByte
    System.arraycopy(b.regs, 0, out, 1, b.m)
    out
  }
  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.m)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllSketchAgg = copy(child = cs.head)
}

/** Union serialized HLL sketches (the [[HllSketchAgg]] output) into
  * one MERGED SKETCH (binary), not an estimate — the fold step of an
  * incrementally-maintained sketch table: yesterday's stored register
  * file unions with today's batch sketch and the result is stored
  * back. Register-wise max, so fold order never matters.
  */
case class HllUnionSketch(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {
  require(p >= 4 && p <= 18, "hll precision p must be in [4, 18]")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)
  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == b.m + 1 && bytes(0).toInt == b.p,
        s"sketch precision ${bytes(0)} != aggregate precision ${b.p}")
      b.mergeIn(deserialize(bytes))
    }
    b
  }
  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.mergeIn(o); b }
  override def eval(b: HllBuffer): Any = serialize(b)
  override def serialize(b: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + b.m)
    out(0) = b.p.toByte
    System.arraycopy(b.regs, 0, out, 1, b.m)
    out
  }
  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.m)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): HllUnionSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnionSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllUnionSketch = copy(child = cs.head)
}

/** Merge serialized HLL sketches (the [[HllSketchAgg]] output) back
  * into one estimate — register-wise max, so merge order and
  * partial-aggregation grouping never change the result.
  */
case class HllMergeEstimate(
    child: Expression,
    p: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllBuffer] {
  require(p >= 4 && p <= 18, "hll precision p must be in [4, 18]")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def createAggregationBuffer(): HllBuffer = new HllBuffer(p)
  override def update(b: HllBuffer, input: InternalRow): HllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == b.m + 1 && bytes(0).toInt == b.p,
        s"sketch precision ${bytes(0)} != aggregate precision ${b.p}")
      b.mergeIn(deserialize(bytes))
    }
    b
  }
  override def merge(b: HllBuffer, o: HllBuffer): HllBuffer = { b.mergeIn(o); b }
  override def eval(b: HllBuffer): Any = math.round(b.estimate)
  override def serialize(b: HllBuffer): Array[Byte] = {
    val out = new Array[Byte](1 + b.m)
    out(0) = b.p.toByte
    System.arraycopy(b.regs, 0, out, 1, b.m)
    out
  }
  override def deserialize(bytes: Array[Byte]): HllBuffer = {
    val buf = new HllBuffer(bytes(0).toInt)
    System.arraycopy(bytes, 1, buf.regs, 0, buf.m)
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): HllMergeEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): HllMergeEstimate = copy(child = cs.head)
}
