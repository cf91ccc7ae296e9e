package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ann.Ann
import graft.store.SnapshotStore

/** Streaming ANN index maintenance — the A24/A26 landed-artifact
  * lifecycle applied to the C7b IVF index (the reference's
  * consume → upsert → queryable-table loop
  * [ref: ConsumerMain.scala:91-152, KuduManager.scala:72-114], with
  * the Kudu table replaced by the index's LIST table):
  *
  *  - the coarse quantizer is built ONCE from a bootstrap corpus and
  *    landed as a parquet artifact ([[landCentroids]]) — the
  *    frozen-quantizer discipline every production IVF service
  *    follows (adding vectors never moves centroids, so a vector's
  *    list assignment is a pure function of the landed artifact);
  *  - each arriving vector batch is assigned to its nearest frozen
  *    centroid (ONE broadcast pass, batch-sized —
  *    [[Ann.ivfListEntries]]) and UPSERTED into the list table
  *    through the [[SnapshotStore]] copy-on-write merge keyed on
  *    vec_id: only data files whose vec_id range the batch touches
  *    are rewritten, so maintenance cost scales with the batch,
  *    never with index size;
  *  - queries read the landed centroids + the store's current
  *    snapshot ([[queryTopK]]) — never the raw corpus — with
  *    snapshot isolation between micro-batches.
  *
  * Exactly-once: the merge is txn-guarded (a replayed foreachBatch
  * batchId folds as a no-op), and the upsert fold itself is
  * idempotent per vec_id, so a re-delivered vector converges to the
  * same row either way.
  */
object IvfStream {

  private val keyCol = "neighbor_id"

  /** One-shot quantizer build + landing: `nLists` deterministic
    * centroids from the bootstrap corpus, written to
    * `indexDir/cents`. The returned frame is the landed copy.
    */
  def landCentroids(emb: DataFrame, indexDir: String, nLists: Int = 8): Unit = {
    val cents = Ann.ivfCentroids(emb, nLists)
    cents.write.mode("overwrite").parquet(s"$indexDir/cents")
    // the landed parquet is now the authority — drop the build's
    // session-lifetime cache pin
    cents.unpersist()
    ()
  }

  def centroids(spark: SparkSession, indexDir: String): DataFrame =
    spark.read.parquet(s"$indexDir/cents")

  def readLists(spark: SparkSession, storeDir: String): Option[DataFrame] =
    new SnapshotStore(spark, storeDir, keyCol).read()

  /** Upsert fold: a delta row replaces the stored row with the same
    * vec_id (anti-join + union — deterministic, idempotent).
    */
  private def upsert(base: DataFrame, delta: DataFrame): DataFrame =
    base.join(delta.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(delta)

  /** Fold one vector batch into the maintained list table (the
    * foreachBatch body, callable directly for batch backfills).
    */
  def mergeBatch(batch: DataFrame, indexDir: String, storeDir: String,
                 txn: Option[Long]): Long = {
    val spark = batch.sparkSession
    val store = new SnapshotStore(spark, storeDir, keyCol)
    val entries = Ann.ivfListEntries(batch, centroids(spark, indexDir))
    store.mergeWith(entries, init = identity[DataFrame], fold = upsert, txn = txn)
  }

  /** Start the maintenance stream over a parquet file stream of
    * embedding rows (schema from `schemaDir` — any existing
    * embeddings parquet). `indexDir` must already hold landed
    * centroids ([[landCentroids]]).
    */
  def start(spark: SparkSession, vecsDir: String, schemaDir: String,
            indexDir: String, storeDir: String,
            checkpointDir: String): StreamingQuery = {
    Files.createDirectories(Paths.get(storeDir))
    val schema = spark.read.parquet(schemaDir).schema
    spark.readStream.schema(schema).parquet(vecsDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, indexDir, storeDir, Some(batchId))
        ()
      }
      .start()
  }

  /** IVF top-k against the maintained index: landed centroids + the
    * store's current list-table snapshot. The corpus is never read.
    */
  def queryTopK(spark: SparkSession, indexDir: String, storeDir: String,
                queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame =
    Ann.ivfQueryTopK(centroids(spark, indexDir),
      readLists(spark, storeDir).getOrElse(
        throw new IllegalStateException(s"no list table at $storeDir")),
      queries, k, nprobe)
}
