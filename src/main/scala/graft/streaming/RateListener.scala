package graft.streaming

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

final class RateListener extends StreamingQueryListener {
  import RateListener.BatchRate

  private val batches = ArrayBuffer.empty[BatchRate]

  def reports: Seq[BatchRate] = batches.synchronized(batches.toSeq)

  /** The reference's log line, reconstructed per batch. */
  def formatted: Seq[String] = reports.map { b =>
    f"[ graft ] batch=${b.batchId} time=${b.timestamp} total=${b.numInputRows} rate=${b.rowsPerSecond}%.4f rec/s"
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (p.numInputRows > 0) {
      val rate = Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0)
      batches.synchronized {
        batches += BatchRate(p.batchId, p.timestamp, p.numInputRows, rate)
      }
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
