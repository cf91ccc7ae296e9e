package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{DerivedTable, Tables, Writers}

/** D-block interchange gates: prove the CSV / JSON / ORC write→read
  * paths are LOSSLESS by round-tripping the events table through each
  * format and oracle-comparing a full-column exact aggregate against
  * the parquet original in DuckDB. The interchange copy lands once
  * per corpus through the [[DerivedTable]] seam (fingerprint-keyed,
  * atomic rename — the same discipline as every landed artifact), so
  * the gate bills the READ path plus the aggregate, the way a real
  * pipeline consumes an exported dataset.
  *
  * The aggregate covers every column with engine-exact arithmetic
  * (SURVEY §6 rules): long sums for the id columns, an epoch-micros
  * XOR for the timestamp (both engines truncate ns→us by floor), scaled
  * cents for the double, character length for the JSON payload. Any
  * row lost, duplicated, reordered into a different group, or
  * corrupted in transit moves at least one sum.
  */
object InterchangeQueries {

  /** Shared round-trip check body: read-back frame → one exact
    * aggregate per event_type. */
  private def auditAgg(back: DataFrame): DataFrame =
    back.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("event_id")).as("sum_event_id"),
      sum(col("user_id")).as("sum_user_id"),
      // XOR, not sum: epoch micros (~1.7e15) summed over a 1M-row
      // group overflows a long; bit_xor is an exact order-independent
      // checksum at any group size
      expr("bit_xor(unix_micros(ts))").as("xor_ts_us"),
      sum(round(col("value") * 100).cast("long")).as("sum_cents"),
      sum(length(col("props"))).as("sum_props_len"))
      .orderBy(col("event_type"))

  /** D6a: CSV round-trip — writeCsv quotes embedded newlines/commas
    * in the JSON payload; readCsv replays the pinned UTC micros
    * timestamp format under FAILFAST, so a single malformed cell
    * fails the query instead of nulling the row. */
  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val back = DerivedTable.readOrBuildAs(spark, "rt-csv", dir,
      Seq("events"), "v1")(
      tmp => Writers.writeCsv(ev, tmp))(
      root => Writers.readCsv(spark, ev.schema, root))
    auditAgg(back)
  }

  /** D6b: JSON-lines round-trip — schema-pinned FAILFAST read; the
    * props column is a JSON *string inside* the JSON line, so this
    * also exercises writer-side string escaping. */
  def qJsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val back = DerivedTable.readOrBuildAs(spark, "rt-json", dir,
      Seq("events"), "v1")(
      tmp => Writers.writeJson(ev, tmp))(
      root => Writers.readJson(spark, ev.schema, root))
    auditAgg(back)
  }

  /** D7: ORC round-trip — native columnar interchange; types
    * (timestamp micros, doubles, strings) survive in-format, the
    * pinned read schema rejects drift at plan time. */
  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
    val back = DerivedTable.readOrBuildAs(spark, "rt-orc", dir,
      Seq("events"), "v1")(
      tmp => Writers.writeOrc(ev, tmp))(
      root => Writers.readOrc(spark, ev.schema, root))
    auditAgg(back)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_csv_roundtrip"  -> (qCsvRoundtrip _),
    "q_json_roundtrip" -> (qJsonRoundtrip _),
    "q_orc_roundtrip"  -> (qOrcRoundtrip _),
  )

  // one oracle body: the comparison against the PARQUET ORIGINAL is
  // the gate — if the interchange copy drifted from the original in
  // any value, the Spark aggregate (over the copy) and the DuckDB
  // aggregate (over the original) diverge
  private val auditSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(event_id) AS BIGINT) AS sum_event_id,
      |  CAST(sum(user_id) AS BIGINT) AS sum_user_id,
      |  CAST(bit_xor(epoch_us(ts)) AS BIGINT) AS xor_ts_us,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(sum(length(props)) AS BIGINT) AS sum_props_len
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_csv_roundtrip"  -> auditSql,
    "q_json_roundtrip" -> auditSql,
    "q_orc_roundtrip"  -> auditSql,
  )
}
