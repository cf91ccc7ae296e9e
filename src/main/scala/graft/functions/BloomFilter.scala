package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter bit/hash kernels, shared verbatim by the aggregate
  * (build side) and the probe expression (query side) so the two can
  * never drift — and static, so the probe call sits inside
  * whole-stage codegen (Bloom 1970, "Space/time trade-offs in hash
  * coding with allowable errors"; double hashing per Kirsch &
  * Mitzenmacher 2006).
  *
  * Blob layout: [numBits int][k int][bit bytes], big-endian ints.
  */
object BloomAlgos {
  final val HeaderBytes = 8

  /** splitmix64 finalizer — deterministic 64->64 mixing, no state. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def add(bits: Array[Byte], numBits: Int, k: Int, v: Long): Unit = {
    val h1 = mix64(v)
    val h2 = mix64(v ^ 0x5555555555555555L) | 1L
    var h = h1
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h, numBits.toLong).toInt
      bits(idx >>> 3) = (bits(idx >>> 3) | (1 << (idx & 7))).toByte
      h += h2
      i += 1
    }
  }

  /** Probe against a serialized blob (header + bits) — the form the
    * aggregate emits and the filter column carries.
    */
  def mightContain(blob: Array[Byte], v: Long): Boolean = {
    val numBits = readInt(blob, 0)
    val k = readInt(blob, 4)
    val h1 = mix64(v)
    val h2 = mix64(v ^ 0x5555555555555555L) | 1L
    var h = h1
    var i = 0
    while (i < k) {
      val idx = java.lang.Math.floorMod(h, numBits.toLong).toInt
      if ((blob(HeaderBytes + (idx >>> 3)) & (1 << (idx & 7))) == 0) return false
      h += h2
      i += 1
    }
    true
  }

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
}

final class BloomBuffer(val numBits: Int, val k: Int) {
  val bits: Array[Byte] = new Array[Byte]((numBits + 7) >>> 3)
  def add(v: Long): Unit = BloomAlgos.add(bits, numBits, k, v)
  def mergeIn(o: BloomBuffer): Unit = {
    var i = 0
    while (i < bits.length) { bits(i) = (bits(i) | o.bits(i)).toByte; i += 1 }
  }
}

/** Mergeable Bloom filter over a LONG key column (fingerprints,
  * shingle hashes) as a TypedImperativeAggregate: fixed 2^~numBits
  * bits per group regardless of input size, partials merged by
  * bitwise OR (order-insensitive — map-side partial aggregation is
  * exact with respect to the sketch). Emits the serialized blob
  * (BinaryType) for [[BloomMightContain]] to probe.
  *
  * The 100 TB decontamination pattern: aggregate the benchmark key
  * set into one ~100 KB blob, broadcast it, and prefilter the corpus
  * scan down to near-certain hits BEFORE any shuffle; a small exact
  * semi-join then removes the false positives, so the final result
  * is exact while the corpus-sized shuffle disappears. False-positive
  * rate ~ (1 - e^(-k*n/m))^k.
  */
case class BloomFilterAgg(
    child: Expression,
    numBits: Int = 1 << 20,
    k: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomBuffer] {
  require(numBits >= 64 && (numBits & 7) == 0, "numBits must be >= 64 and byte-aligned")
  require(k >= 1 && k <= 16, "k must be in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_agg needs BIGINT, got ${child.dataType.sql}")
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomBuffer = new BloomBuffer(numBits, k)

  override def update(b: BloomBuffer, input: InternalRow): BloomBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: BloomBuffer, o: BloomBuffer): BloomBuffer = { b.mergeIn(o); b }

  override def eval(b: BloomBuffer): Any = serialize(b)

  override def serialize(b: BloomBuffer): Array[Byte] = {
    val out = new Array[Byte](BloomAlgos.HeaderBytes + b.bits.length)
    BloomAlgos.writeInt(out, 0, b.numBits)
    BloomAlgos.writeInt(out, 4, b.k)
    System.arraycopy(b.bits, 0, out, BloomAlgos.HeaderBytes, b.bits.length)
    out
  }

  override def deserialize(bytes: Array[Byte]): BloomBuffer = {
    val buf = new BloomBuffer(BloomAlgos.readInt(bytes, 0), BloomAlgos.readInt(bytes, 4))
    System.arraycopy(bytes, BloomAlgos.HeaderBytes, buf.bits, 0, buf.bits.length)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): BloomFilterAgg = copy(child = cs.head)
}

/** Probe a [[BloomFilterAgg]] blob for a LONG key — runs inside
  * whole-stage codegen (one static call on the raw blob bytes, no
  * deserialization), so the corpus-side prefilter costs a few array
  * reads per row.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs (BINARY, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(blob: Any, v: Any): Any =
    BloomAlgos.mightContain(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, v) => s"graft.functions.BloomAlgos.mightContain($b, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain = copy(left = l, right = r)
}
