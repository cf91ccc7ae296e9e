package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A12: per-batch throughput reporting — the Spark-native form of the
  * reference's LoggerManager batch log (start/end time, tables,
  * total, rec/s) [ref: LoggerManager.scala:38-60, ConsumerMain.scala:111-121].
  *
  * A StreamingQueryListener gets these numbers from the engine
  * instead of hand-timing: numInputRows and processedRowsPerSecond
  * per micro-batch, with no accumulator plumbing.
  */
object RateListener {
  final case class BatchRate(batchId: Long, timestamp: String,
                             numInputRows: Long, rowsPerSecond: Double)
}

/** @param logDir optional sync-log sink: every batch line is also
  *   appended to `<logDir>/sync-<yyyyMMdd>.log` — the reference's
  *   local-FS/HDFS batch log with daily rotation
  *   [ref: LoggerManager.scala:62-100]. On a cluster the same path
  *   points at HDFS-backed storage; the listener runs on the driver
  *   either way, exactly like the reference's logger.
  */
final class RateListener(logDir: Option[String] = None) extends StreamingQueryListener {
  import RateListener.BatchRate

  def this() = this(None)

  private val batches = ArrayBuffer.empty[BatchRate]
  @volatile private var logWarned = false

  def reports: Seq[BatchRate] = batches.synchronized(batches.toSeq)

  /** The reference's log line, reconstructed per batch. */
  def formatted: Seq[String] = reports.map(line)

  private def line(b: BatchRate): String =
    // Locale.ROOT: the f-interpolator uses the JVM default locale,
    // which would render the rate as "1234,5678" under e.g. de_DE and
    // break every consumer parsing the line back
    "[ graft ] batch=%d time=%s total=%d rate=%.4f rec/s".formatLocal(
      java.util.Locale.ROOT, b.batchId, b.timestamp, b.numInputRows,
      b.rowsPerSecond)

  /** Today's sync-log file under `logDir` (daily rotation like the
    * reference's dated log names).
    */
  def logFile: Option[Path] = logDir.map { d =>
    val day = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
    Paths.get(d, s"sync-$day.log")
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (p.numInputRows > 0) {
      // non-finite rates (NaN on no measurement, Infinity on a
      // sub-millisecond batch) would print unparseably — report 0.0
      val rate = Option(p.processedRowsPerSecond)
        .filter(java.lang.Double.isFinite(_)).getOrElse(0.0)
      val b = BatchRate(p.batchId, p.timestamp, p.numInputRows, rate)
      batches.synchronized { batches += b }
      // a broken sink must not break the listener: an unwritable /
      // vanished logDir would otherwise throw on EVERY batch in the
      // listener thread. Log the failure once and keep reporting
      // (the reference's logger likewise tolerates sink failures).
      logFile.foreach { f =>
        try {
          Files.createDirectories(f.getParent)
          Files.writeString(f, line(b) + "\n",
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        } catch {
          case e: Exception =>
            if (!logWarned) {
              logWarned = true
              System.err.println(s"[ graft ] sync-log append failed (further failures silent): $e")
            }
        }
      }
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
