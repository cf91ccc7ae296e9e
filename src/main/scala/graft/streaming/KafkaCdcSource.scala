package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The Kafka face of the CDC ingest — the reference's KafkaManager
  * re-expressed [ref: KafkaManager.scala:39-77].
  *
  * The cluster path: `format("kafka")` (needs spark-sql-kafka on the
  * classpath; not present in this container, so this reader compiles
  * but is exercised on a real cluster — CdcStream's file source
  * covers the pipeline end-to-end in tests; the two produce the same
  * `line` column and share everything downstream).
  *
  * Offset semantics map 1:1:
  *  - subscribe-latest       = the reference's no-arg mode (Kafka own storage)
  *  - resume-from-offset-log = the zk / local-file modes: the stored
  *    `topic,partition,from,until` lines [ref: ZookeeperManager.scala:101,
  *    files/offset.log] become a `startingOffsets` JSON assignment —
  *    and after that first batch, the checkpoint WAL owns offsets
  *    (subsuming the reference's three storage backends).
  */
object KafkaCdcSource {

  /** Translate the reference's offset-log lines
    * (`topic,partition,fromOffset,untilOffset`) into the
    * startingOffsets JSON Structured Streaming expects; replay begins
    * at each partition's *until* offset, exactly like
    * ReadByAssignOffset [ref: ReadByAssignOffset.scala:57-61].
    */
  def offsetLogToStartingOffsets(lines: Seq[String]): String = {
    val byTopic = lines.filter(_.nonEmpty).map { l =>
      val Array(topic, partition, _, until) = l.split(",").map(_.trim)
      (topic, partition.toInt, until.toLong)
    }.groupBy(_._1)
    byTopic.toSeq.sortBy(_._1).map { case (topic, parts) =>
      val ps = parts.sortBy(_._2)
        .map { case (_, p, off) => s""""$p": $off""" }.mkString(", ")
      s""""$topic": {$ps}"""
    }.mkString("{", ", ", "}")
  }

  /** The COMPLETE option map handed to `format("kafka")` — extracted
    * as a pure function so the mapping is unit-testable without a
    * broker (the sandbox has none): topic set → `subscribe` (the
    * reference's comma-joined `kafka.topic=tt` list
    * [ref: ConsumerMain.scala:44]), stored offset log →
    * `startingOffsets` assignment JSON, and every `kafka.*` client
    * option (SSL keystore/truststore etc.) forwarded verbatim.
    * Client options cannot shadow the three keys the engine owns —
    * the engine's values win, like the reference hard-coding its
    * broker/topic wiring around the passthrough props.
    */
  def sourceOptions(brokers: String, topics: Seq[String],
                    offsetLog: Option[Seq[String]] = None,
                    clientOptions: Map[String, String] = Map.empty): Map[String, String] =
    clientOptions ++ Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topics.mkString(","),
      "failOnDataLoss" -> "false",
      "startingOffsets" ->
        offsetLog.fold("latest")(offsetLogToStartingOffsets))

  /** Build the Kafka line stream (one `line` column, like the file
    * source) from either the latest offsets or a stored offset log.
    * `clientOptions` are forwarded verbatim — they arrive already in
    * the `kafka.*` form the source expects, so the reference's
    * SSL/auth surface (keystore/truststore [ref: README.md]) is a
    * pass-through from [[graft.GraftConfig.kafkaOptions]].
    */
  def readChangeLines(spark: SparkSession, brokers: String, topics: Seq[String],
                      offsetLog: Option[Seq[String]] = None,
                      clientOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format("kafka")
      .options(sourceOptions(brokers, topics, offsetLog, clientOptions))
      .load().select(col("value").cast("string").as("line"))

  /** Config-driven form: brokers/topics/client options from the
    * deploy properties file (the reference's ConsumerMain wiring
    * [ref: ConsumerMain.scala:41-45]).
    */
  def fromConfig(spark: SparkSession, cfg: graft.GraftConfig,
                 offsetLog: Option[Seq[String]] = None): DataFrame =
    readChangeLines(spark, cfg.kafkaBrokers, cfg.kafkaTopics, offsetLog,
      cfg.kafkaOptions)
}
