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
}
