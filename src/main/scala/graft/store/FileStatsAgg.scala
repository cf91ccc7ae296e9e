package graft.store

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import graft.functions.{BloomAlgos, BloomBuffer}

/** Per-output-partition stats of one write task (rows, key range,
  * optional secondary-index Bloom bits). One map entry per Spark
  * output partition == one parquet part file (the store writes with
  * an exact `repartitionByRange(filesPerCommit, key)`, never
  * AQE-coalesced, never maxRecordsPerFile-split — and the consumer
  * verifies the pid↔file bijection before trusting the stats).
  */
private[store] final class PartFileStats {
  var rows: Long = 0L
  var mn: Long = Long.MaxValue
  var mx: Long = Long.MinValue
  var bloom: BloomBuffer = null
}

/** Collects [[SnapshotStore.writeDataFiles]]'s per-file manifest
  * stats (rows, min/max key, secondary Bloom) DURING the write job
  * via `Dataset.observe`, instead of a second job that re-reads the
  * just-written parquet (r17, verdict item 4 — what real table
  * formats do: stats ride the writer). Children:
  *   - pid: the OUTPUT partition id (spark_partition_id projected
  *     above the range exchange — one output partition per part
  *     file);
  *   - key: the store key cast to long (the manifest index domain);
  *   - idxHash (optional): xxhash64 of the secondary index column —
  *     the SAME expression the old stats job aggregated with
  *     bloom_agg, so write-side bits and read-side probes can never
  *     diverge.
  *
  * Merge is keep-first per pid: a speculative duplicate of a task
  * reports identical stats for its pid (the staged input frame and
  * the range partitioning are deterministic), so dropping the second
  * copy makes the fold idempotent under retries.
  */
case class FileStatsAgg(
    pid: Expression,
    key: Expression,
    idxHash: Option[Expression],
    numBits: Int = 1 << 14,
    k: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[Int, PartFileStats]] {

  override def children: Seq[Expression] = Seq(pid, key) ++ idxHash.toSeq

  override def checkInputDataTypes(): TypeCheckResult =
    if (pid.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(s"pid must be INT, got ${pid.dataType.sql}")
    else if (key.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"key must be BIGINT, got ${key.dataType.sql}")
    else if (idxHash.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure("idxHash must be BIGINT")
    else TypeCheckResult.TypeCheckSuccess

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("mn", LongType, nullable = false),
    StructField("mx", LongType, nullable = false),
    StructField("bloom", BinaryType, nullable = true))))

  override def createAggregationBuffer(): java.util.HashMap[Int, PartFileStats] =
    new java.util.HashMap[Int, PartFileStats]()

  override def update(b: java.util.HashMap[Int, PartFileStats],
                      input: InternalRow): java.util.HashMap[Int, PartFileStats] = {
    val p = pid.eval(input).asInstanceOf[Int]
    var s = b.get(p)
    if (s == null) {
      s = new PartFileStats
      if (idxHash.isDefined) s.bloom = new BloomBuffer(numBits, k)
      b.put(p, s)
    }
    s.rows += 1L
    // the key child is Cast(keyCol, long): null mirrors the old stats
    // job's min()/max(), which skip nulls while count() bills the row
    val kv = key.eval(input)
    if (kv != null) {
      val kl = kv.asInstanceOf[Long]
      if (kl < s.mn) s.mn = kl
      if (kl > s.mx) s.mx = kl
    }
    idxHash.foreach { e =>
      // xxhash64 is never null (a null input leaves the seed) — same
      // semantics as the bloom_agg(xxhash64(c)) the job path used
      val h = e.eval(input)
      if (h != null) s.bloom.add(h.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: java.util.HashMap[Int, PartFileStats],
                     o: java.util.HashMap[Int, PartFileStats]): java.util.HashMap[Int, PartFileStats] = {
    val it = o.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // keep-first: a duplicate pid is a speculative re-run of the
      // same deterministic task — identical stats, drop the copy
      if (!b.containsKey(e.getKey)) b.put(e.getKey, e.getValue)
    }
    b
  }

  override def eval(b: java.util.HashMap[Int, PartFileStats]): Any = {
    import scala.jdk.CollectionConverters._
    val rows = b.entrySet().iterator().asScala.map { e =>
      val s = e.getValue
      InternalRow(e.getKey.intValue(), s.rows, s.mn, s.mx,
        if (s.bloom == null) null else serializeBloom(s.bloom))
    }.toArray[Any]
    new GenericArrayData(rows)
  }

  private def serializeBloom(bb: BloomBuffer): Array[Byte] = {
    // blob layout identical to BloomFilterAgg.serialize — the probe
    // side (bloom_might_contain / BloomAlgos.mightContain) reads both
    val out = new Array[Byte](BloomAlgos.HeaderBytes + bb.bits.length)
    BloomAlgos.writeInt(out, 0, bb.numBits)
    BloomAlgos.writeInt(out, 4, bb.k)
    System.arraycopy(bb.bits, 0, out, BloomAlgos.HeaderBytes, bb.bits.length)
    out
  }

  override def serialize(b: java.util.HashMap[Int, PartFileStats]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeInt(b.size())
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val s = e.getValue
      d.writeInt(e.getKey)
      d.writeLong(s.rows); d.writeLong(s.mn); d.writeLong(s.mx)
      if (s.bloom == null) d.writeInt(-1)
      else {
        val blob = serializeBloom(s.bloom)
        d.writeInt(blob.length); d.write(blob)
      }
    }
    d.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Int, PartFileStats] = {
    val d = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = d.readInt()
    val m = new java.util.HashMap[Int, PartFileStats](math.max(4, n * 2))
    var i = 0
    while (i < n) {
      val p = d.readInt()
      val s = new PartFileStats
      s.rows = d.readLong(); s.mn = d.readLong(); s.mx = d.readLong()
      val blen = d.readInt()
      if (blen >= 0) {
        val blob = new Array[Byte](blen)
        d.readFully(blob)
        val bb = new BloomBuffer(BloomAlgos.readInt(blob, 0), BloomAlgos.readInt(blob, 4))
        System.arraycopy(blob, BloomAlgos.HeaderBytes, bb.bits, 0, bb.bits.length)
        s.bloom = bb
      }
      m.put(p, s)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): FileStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FileStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): FileStatsAgg =
    copy(pid = cs(0), key = cs(1), idxHash = idxHash.map(_ => cs(2)))
}
