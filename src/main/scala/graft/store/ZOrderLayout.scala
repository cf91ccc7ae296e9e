package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** D5: multi-dimensional (Z-order) file clustering — the layout
  * command that makes 2-D predicates prune files.
  *
  * Range-clustering on ONE key (what SnapshotStore.writeDataFiles
  * does) gives tight per-file ranges on that key and useless ranges
  * on every other column: a predicate on the second dimension reads
  * the whole table. Clustering on the Morton interleave of two
  * normalized dimensions gives each file a tight bounding RECTANGLE,
  * so a predicate on either dimension (or both) skips most files —
  * the OPTIMIZE ZORDER BY of the big table formats, and the right
  * layout for a 100 TB fact table queried by (tenant, time),
  * (user, time), etc.
  *
  * The z-value is a derived clustering key only — it never persists
  * in the data files.
  */
object ZOrderLayout {

  /** Per-file bounding rectangle (rows + min/max of both dims). */
  final case class FileRect(path: String, rows: Long,
      minA: Long, maxA: Long, minB: Long, maxB: Long)

  /** Write `df` into `nFiles` files clustered by the z-order of the
    * two (long-castable, non-negative, < 2^21 after the caller's
    * normalization) dimension columns. Normalize BOTH dims to the
    * same bit width first (e.g. scale each into [0, 1024)): with
    * unequal widths the wider dimension owns every high interleave
    * bit and the layout degenerates to a one-dimensional sort.
    */
  def writeClustered(df: DataFrame, aCol: String, bCol: String,
      nFiles: Int, path: String): Unit =
    df.withColumn("__z", graft.functions.z_interleave(col(aCol), col(bCol)))
      .repartitionByRange(nFiles, col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The per-file min/max index of both dimensions — what a manifest
    * would store at commit time (one stats pass, same as
    * SnapshotStore.writeDataFiles).
    */
  def fileStats(spark: SparkSession, path: String,
      aCol: String, bCol: String): Seq[FileRect] =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(aCol)).cast("long").as("minA"), max(col(aCol)).cast("long").as("maxA"),
        min(col(bCol)).cast("long").as("minB"), max(col(bCol)).cast("long").as("maxB"))
      .collect()
      .map(r => FileRect(r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

  /** Files whose bounding rectangle intersects the query rectangle
    * ([aLo,aHi] x [bLo,bHi]; pass Long.Min/MaxValue for an open
    * side). The skip check a 2-D readRange would run.
    */
  def planFiles(stats: Seq[FileRect], aLo: Long, aHi: Long,
      bLo: Long, bHi: Long): Seq[FileRect] =
    stats.filter(f => f.maxA >= aLo && f.minA <= aHi &&
      f.maxB >= bLo && f.minB <= bHi)
}
