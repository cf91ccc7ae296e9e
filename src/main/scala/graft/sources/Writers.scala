package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output layout management: date-partitioned parquet, the layout a
  * 100 TB event store actually uses. Readers filtering on the
  * partition column scan only matching directories (partition
  * pruning — asserted in PlanShapeSpec, visible as PartitionFilters
  * in the scan node).
  */
object Writers {

  /** Write events partitioned by event date. */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  /** Write the CDC snapshot partitioned by table-route, mirroring the
    * reference's one-Kudu-table-per-source layout
    * [ref: KuduManager.scala:66-70].
    */
  def writeSnapshotByTable(snapshot: DataFrame, path: String): Unit =
    snapshot
      .withColumn("tab_name", lower(element_at(split(col("table"), "\\."), 2)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("tab_name")
      .parquet(path)

  // ------------------------------------------------- interchange formats
  //
  // CSV/JSON import-export with scale-sane defaults: the READ side
  // always takes an EXPLICIT schema (schema inference is a full extra
  // pass over the data — at 100 TB that is a second job before the
  // first) and defaults to FAILFAST so silent NULL-filled rows can't
  // leak into a pipeline; callers that expect dirty input use
  // PERMISSIVE + the corrupt-record column (the batch twin of the
  // CDC dead-letter quarantine). Timestamps are pinned to an explicit
  // UTC format so a round-trip is bit-stable across locales/engines.

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("timestampFormat", TsFmt)
      // render in UTC regardless of session timezone — without this
      // the XXX offset (and the bytes) vary per cluster config
      .option("timeZone", "UTC")
      .csv(path)

  /** `multiLine` defaults true to stay lossless against [[writeCsv]]
    * output (which quotes embedded newlines — line-mode would split
    * those records and FAILFAST on data the writer itself produced),
    * but multiLine files are NOT splittable: one task per file. For
    * large externally-produced CSVs known to be newline-free, pass
    * `multiLine = false` to keep splittable line-mode reads. */
  def readCsv(spark: org.apache.spark.sql.SparkSession,
              schema: org.apache.spark.sql.types.StructType,
              path: String, mode: String = "FAILFAST",
              multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", "true").option("timestampFormat", TsFmt)
      .option("timeZone", "UTC")
      .option("multiLine", multiLine.toString)
      .option("mode", mode)
      .csv(path)

  /** ORC interchange — the columnar exchange format next to parquet
    * (splittable, predicate-pushdown-capable, zlib by default). Spark
    * ships a native vectorized ORC reader, so a scan here gets the
    * same columnar batch path as parquet. Schema is still explicit on
    * read: ORC files carry their own schema, but pinning it rejects
    * drifted files at plan time instead of failing mid-job. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: org.apache.spark.sql.SparkSession,
              schema: org.apache.spark.sql.types.StructType,
              path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Avro interchange — the row-oriented exchange format of the
    * streaming world (the reference's Kafka payloads are the classic
    * Avro habitat). Spark's built-in `avro` source maps TimestampType
    * to the timestamp-micros logical type, so the round-trip is
    * µs-exact. Schema pinned on read for the same plan-time-rejection
    * property as ORC/CSV/JSON. */
  // the short name "avro" resolves through the jar's
  // META-INF/services registration, which the unmanaged-classpath
  // build does not surface to the ServiceLoader — the fully-qualified
  // provider class is the documented fallback and hits the exact
  // same FileFormat
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).format(AvroProvider).save(path)

  def readAvro(spark: org.apache.spark.sql.SparkSession,
               schema: org.apache.spark.sql.types.StructType,
               path: String): DataFrame =
    spark.read.schema(schema).format(AvroProvider).load(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFmt)
      .option("timeZone", "UTC")
      .json(path)

  def readJson(spark: org.apache.spark.sql.SparkSession,
               schema: org.apache.spark.sql.types.StructType,
               path: String, mode: String = "FAILFAST"): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", TsFmt)
      .option("timeZone", "UTC")
      .option("mode", mode)
      .json(path)
}
