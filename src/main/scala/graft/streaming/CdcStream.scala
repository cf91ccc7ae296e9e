package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.CdcOps

/** A9: the reference's whole pipeline — Kafka DStream → per-record
  * Kudu upsert [ref: ConsumerMain.scala:91-152] — as Structured
  * Streaming: file/Kafka source of JSON change lines → foreachBatch
  * merge into a versioned parquet snapshot.
  *
  * Offset management (the reference's zk/local-file/Kafka-commit
  * triple [ref: ConsumerMain.scala:128-151]) is subsumed by the
  * checkpoint WAL: source offsets commit atomically with batch
  * completion, so restart resumes exactly where it stopped.
  *
  * The snapshot store is a poor-man's table format: each batch writes
  * `v<epoch>` and atomically flips a LATEST pointer file (parquet has
  * no ACID overwrite; on a cluster this seam is where Delta/Iceberg
  * slot in — the merge logic is unchanged).
  */
object CdcStream {

  private val Pointer = "LATEST"

  def readSnapshot(spark: SparkSession, snapshotDir: String): Option[DataFrame] = {
    val p = Paths.get(snapshotDir, Pointer)
    if (Files.exists(p)) {
      val v = Files.readString(p).trim
      Some(spark.read.parquet(s"$snapshotDir/$v"))
    } else None
  }

  private def writeSnapshot(df: DataFrame, snapshotDir: String, batchId: Long): Unit = {
    val version = s"v$batchId"
    df.write.mode("overwrite").parquet(s"$snapshotDir/$version")
    val prev = {
      val p = Paths.get(snapshotDir, Pointer)
      if (Files.exists(p)) Some(Files.readString(p).trim) else None
    }
    val tmp = Paths.get(snapshotDir, s".$Pointer.tmp")
    Files.writeString(tmp, version)
    Files.move(tmp, Paths.get(snapshotDir, Pointer),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // GC: keep current + immediately-previous version (in-flight
    // readers of prev finish safely); older versions go. At cluster
    // scale this is the table format's vacuum.
    val keep = Set(Some(version), prev).flatten
    val listing = Files.list(Paths.get(snapshotDir))
    try listing.forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("v") && !keep(name)) {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
        finally walk.close()
      }
    } finally listing.close()
  }

  /** Start the ingest: `linesDir` is watched for files of JSON change
    * lines (the file-source stand-in for a Kafka topic; swapping in
    * `format("kafka")` changes only this reader).
    */
  def start(spark: SparkSession, linesDir: String, snapshotDir: String,
            checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(snapshotDir))
    val lines = spark.readStream.text(linesDir).withColumnRenamed("value", "line")
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val parsed = CdcOps.parse(batch)
        // delete_state is derived from op_type, so it is recomputed
        // after every merge; logical deletes survive because the D
        // record itself stays in the snapshot
        // [ref: KuduManager.scala:74-80].
        val merged = readSnapshot(batch.sparkSession, snapshotDir) match {
          case Some(existing) => existing.drop("delete_state").unionByName(parsed)
          case None           => parsed
        }
        // Last-write-wins over (existing ∪ new) — identical semantics
        // to replaying the whole log, but each batch only shuffles
        // snapshot+delta.
        val next = CdcOps.softDeleteSnapshot(merged, col("user_id"))
        writeSnapshot(next, snapshotDir, batchId)
      }
      .start()
  }
}
