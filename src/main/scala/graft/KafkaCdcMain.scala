package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{CdcStream, KafkaCdcSource, OffsetLogListener, RateListener}

/** The cluster entry point the reference's ConsumerMain is — the A9
  * CDC fold reading REAL Kafka [ref: ConsumerMain.scala:41-152,
  * KafkaManager.scala:39-77]: `format("kafka")` with the deploy
  * config's broker/topic-set/client-option pass-through, the
  * throughput log, and the external offset log, folding into one
  * SnapshotStore per deployment name.
  *
  * Opt-in and environmental by design: this container ships no
  * spark-sql-kafka connector and no broker, so the main COMPILES
  * in-repo (nothing here names a Kafka class — `format("kafka")`
  * resolves at runtime) and runs where the connector jar is on the
  * classpath (`--packages org.apache.spark:spark-sql-kafka-0-10`).
  * Everything downstream of the reader — the fold, the store, the
  * listeners — is the exact code the in-repo gates drive through the
  * graftlines/file sources (`q_stream_cdc_snapshot`,
  * `q_stream_kafka_seam`), so the swap is reader-only, proven by
  * [[graft.streaming.KafkaCdcSource.sourceOptions]] being spec'd
  * without a broker.
  *
  * Usage:
  * {{{
  *   GRAFT_CONF=deploy.properties spark-submit --class graft.KafkaCdcMain \
  *     --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 graft.jar [name]
  * }}}
  * `deploy.properties` needs `kafka.broker` and `kafka.topic` (comma
  * list, the reference's `tt` split [ref: ConsumerMain.scala:44]);
  * `kafka.*` client keys (SSL keystore/truststore …) pass through
  * verbatim. `[name]` (default "cdc") scopes the store, checkpoint,
  * sync log and offset log so several pipelines share one config.
  *
  * Resume: the checkpoint WAL owns offsets. If `offset.log` exists
  * under the deployment dir AND the checkpoint does not (fresh
  * checkpoint after migration/loss), the log's last consumed ranges
  * seed `startingOffsets` — the reference's
  * zk/local-file resume [ref: ReadByAssignOffset.scala:57-61]
  * without its double-count window (the WAL takes over after batch 0).
  */
object KafkaCdcMain {

  /** Seed `startingOffsets` from the external offset log ONLY when
    * the WAL cannot resume by itself: a populated checkpoint always
    * wins, so the seed can never rewind a WAL-committed range — the
    * double-count window the reference's three offset backends left
    * open is structurally closed. Pure decision, spec'd broker-free.
    */
  def resumeSeed(checkpointDir: String,
                 offsetLogFile: java.nio.file.Path): Option[Seq[String]] =
    if (!Files.exists(Paths.get(checkpointDir)) && Files.exists(offsetLogFile)) {
      import scala.jdk.CollectionConverters._
      Some(Files.readAllLines(offsetLogFile).asScala.toSeq)
    } else None

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("cdc")
    val cfg = GraftConfig.fromEnv()
    require(cfg.kafkaBrokers.nonEmpty,
      "kafka.broker must be set in the GRAFT_CONF properties file")
    require(cfg.kafkaTopics.nonEmpty,
      "kafka.topic must be set in the GRAFT_CONF properties file")
    val spark = GraftConfig.session(cfg, appName = s"graft-kafka-$name")

    val storeDir = s"${cfg.storeRoot}/$name"
    val checkpointDir = s"${cfg.checkpointRoot}/$name"
    val offsetLogFile = Paths.get(storeDir, "offset.log")

    val seed = KafkaCdcMain.resumeSeed(checkpointDir, offsetLogFile)

    // the reference's two driver-side records: the throughput line
    // per batch (LoggerManager) and the consumed-range log
    spark.streams.addListener(new RateListener(Some(s"$storeDir/_synclog")))
    spark.streams.addListener(OffsetLogListener.kafka(offsetLogFile.toString))

    val lines = KafkaCdcSource.fromConfig(spark, cfg, offsetLog = seed)
    val query = CdcStream.startFromLines(lines, storeDir, checkpointDir,
      trigger = cfg.trigger)
    query.awaitTermination()
  }
}
