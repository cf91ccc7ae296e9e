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
        //
        // Incremental compaction (A16): only the DELTA is snapshotted
        // (a window over the batch), then folded into the base via a
        // keyed full-outer merge — compact(snapshot(A), B) ==
        // snapshot(A ∪ B), so semantics equal replaying the whole
        // log while each batch's window shuffle is delta-sized. With
        // a bucketed base table the merge join needs no base
        // exchange at all.
        val next = readSnapshot(batch.sparkSession, snapshotDir) match {
          case Some(existing) =>
            CdcOps.decorateSoftDelete(
              CdcOps.compactSnapshot(
                existing.drop("delete_state"), parsed, "user_id"))
          case None => CdcOps.softDeleteSnapshot(parsed, col("user_id"))
        }
        writeSnapshot(next, snapshotDir, batchId)
      }
      .start()
  }
}
