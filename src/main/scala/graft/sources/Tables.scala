package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema + events/documents/
  * embeddings tables. One parquet file per table under `dir`.
  *
  * At cluster scale these would be partitioned/bucketed table paths;
  * the loaders are the single seam where that changes.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects; read it as a long and truncate to micros (matching
    * DuckDB's ns->us cast semantics, floor division).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}
