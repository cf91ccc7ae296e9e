package graft.cdc

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-Avro twin of [[ChangeModel]] (r15 verdict task 6): the same
  * OGG-style change record carried as schema-registry-shaped Avro
  * binary instead of JSON — the most common real-world CDC wire
  * encoding. The reference consumes JSON only
  * [ref: KuduManager.scala:50-66]; this models the deployment where
  * the topic carries Avro and the writer schema is known out-of-band
  * (registry), so each message is the RAW Avro binary body with no
  * per-record header.
  *
  * Spark's native path for this is spark-avro's `from_avro`
  * (AvroDataToCatalyst); that module is not shipped in this
  * environment, so the decode is a Scala UDF over avro-core with the
  * identical contract: writer-schema decode into the
  * [[ChangeModel.recordSchema]] struct, PERMISSIVE on malformed bytes
  * (null record, mirroring from_json's and from_avro's
  * mode=PERMISSIVE) — swap [[decoded]] for `from_avro(col, schema)`
  * when the package is on the classpath and nothing else changes.
  *
  * Scale notes: encode/decode are per-row, shuffle-free and
  * ThreadLocal-reused (no per-row codec allocation); the landed Avro
  * lines table is corpus-fingerprinted like every other derived input
  * (paid once, read by all consumers).
  */
object AvroChangeModel {

  /** Writer schema — the registry entry. Field names/types mirror
    * [[ChangeModel.recordSchema]] exactly; payload fields are
    * nullable unions because OGG omits absent columns.
    */
  val schemaJson: String =
    """{"type":"record","name":"ChangeRecord","namespace":"graft.cdc",
      | "fields":[
      |  {"name":"table","type":"string"},
      |  {"name":"op_type","type":"string"},
      |  {"name":"current_ts","type":"string"},
      |  {"name":"after","type":{"type":"record","name":"After","fields":[
      |    {"name":"ID","type":["null","long"],"default":null},
      |    {"name":"USER_ID","type":["null","long"],"default":null},
      |    {"name":"EVENT_TYPE","type":["null","string"],"default":null},
      |    {"name":"VALUE","type":["null","double"],"default":null}]}}
      | ]}""".stripMargin

  @transient lazy val schema: Schema = new Schema.Parser().parse(schemaJson)
  @transient private lazy val afterSchema: Schema =
    schema.getField("after").schema()

  // Avro codecs are not thread-safe; reuse per executor thread so the
  // hot path allocates no per-row machinery (decoder/encoder reuse is
  // the documented avro-core fast path).
  private val writers = ThreadLocal.withInitial[GenericDatumWriter[GenericRecord]](
    () => new GenericDatumWriter[GenericRecord](schema))
  private val readers = ThreadLocal.withInitial[GenericDatumReader[GenericRecord]](
    () => new GenericDatumReader[GenericRecord](schema))
  private val encoderHolder = new ThreadLocal[BinaryEncoder]
  private val decoderHolder = new ThreadLocal[BinaryDecoder]

  private[cdc] def encodeRecord(table: String, opType: String, ts: String,
                                id: java.lang.Long, userId: java.lang.Long,
                                eventType: String,
                                value: java.lang.Double): Array[Byte] = {
    val after = new GenericData.Record(afterSchema)
    after.put("ID", id)
    after.put("USER_ID", userId)
    after.put("EVENT_TYPE", eventType)
    after.put("VALUE", value)
    val rec = new GenericData.Record(schema)
    rec.put("table", table)
    rec.put("op_type", opType)
    rec.put("current_ts", ts)
    rec.put("after", after)
    val out = new ByteArrayOutputStream(64)
    val enc = EncoderFactory.get().directBinaryEncoder(out, encoderHolder.get())
    encoderHolder.set(enc)
    writers.get().write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decoded record as Spark-friendly options; None = malformed
    * (PERMISSIVE). */
  case class AfterRec(ID: Option[Long], USER_ID: Option[Long],
                      EVENT_TYPE: Option[String], VALUE: Option[Double])
  case class ChangeRec(table: String, op_type: String, current_ts: String,
                       after: AfterRec)

  private def str(a: AnyRef): String =
    if (a == null) null else a.toString

  private[cdc] def decodeRecord(bytes: Array[Byte]): ChangeRec =
    if (bytes == null) null
    else try {
      val dec = DecoderFactory.get().binaryDecoder(bytes, decoderHolder.get())
      decoderHolder.set(dec)
      val rec = readers.get().read(null, dec)
      val after = rec.get("after").asInstanceOf[GenericRecord]
      ChangeRec(
        str(rec.get("table")), str(rec.get("op_type")),
        str(rec.get("current_ts")),
        AfterRec(
          Option(after.get("ID").asInstanceOf[java.lang.Long]).map(_.longValue),
          Option(after.get("USER_ID").asInstanceOf[java.lang.Long]).map(_.longValue),
          Option(str(after.get("EVENT_TYPE"))),
          Option(after.get("VALUE").asInstanceOf[java.lang.Double]).map(_.doubleValue)))
    } catch { case _: Exception => null } // PERMISSIVE: null record

  // UDF seam uses JVM primitives (Spark's Scala-UDF reflection has no
  // boxed-type support); `events` carries no nulls, and a null input
  // short-circuits to a null body before the UDF runs — the decode
  // side treats that as malformed, which is the right PERMISSIVE
  // reading for a message with no payload.
  private val encodeUdf = udf(
    (table: String, opType: String, ts: String, id: Long, userId: Long,
     eventType: String, value: Double) =>
      encodeRecord(table, opType, ts, id, userId, eventType, value))
  private val decodeUdf = udf(decodeRecord _)

  /** Derive the binary-Avro change stream from `events` — the exact
    * logical records of [[ChangeModel.changeLines]], Avro-encoded.
    * Columns (id, body: binary, ts).
    */
  def avroChangeLines(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("id"),
      encodeUdf(
        lit("PUB.EVENTS"),
        ChangeModel.opTypeOf(col("event_type")),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        col("event_id"), col("user_id"), col("event_type"), col("value"))
        .as("body"),
      col("ts"))

  /** [[avroChangeLines]] landed once per corpus — same lineage-sharing
    * rationale as [[ChangeModel.linesTable]]: the Avro topic is the
    * pipeline's INPUT, fabricated once, read by every consumer.
    */
  def avroLinesTable(spark: SparkSession, dir: String): DataFrame =
    graft.sources.DerivedTable.readOrBuild(
      spark, "cdc-avro-lines", dir, Seq("events"), "v1") {
      avroChangeLines(graft.sources.Tables(spark, dir).events)
    }

  /** A1-Avro: decode binary Avro change records into the same typed
    * columns [[CdcOps.parse]] yields from JSON — downstream (A2-A6
    * routing, upsert, soft delete, audit) is byte-identical by
    * construction because the column contract is identical. Works
    * unchanged under Structured Streaming (stateless projection).
    */
  def parseAvro(lines: DataFrame): DataFrame =
    lines
      .withColumn("r", decodeUdf(col("body")))
      .select(
        col("r.table").as("table"),
        col("r.op_type").as("op_type"),
        col("r.current_ts").as("current_ts"),
        col("r.after.ID").as("id"),
        col("r.after.USER_ID").as("user_id"),
        col("r.after.EVENT_TYPE").as("event_type"),
        col("r.after.VALUE").as("value"))
}
