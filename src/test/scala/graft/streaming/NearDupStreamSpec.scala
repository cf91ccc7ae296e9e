package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.sources.Tables
import graft.store.SnapshotStore

/** NearDupStream — streaming MinHash-LSH index maintenance:
  * two-arrival convergence to the one-shot C2 scan, txn-guarded
  * replay no-op, re-delivery idempotence.
  */
class NearDupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.GraftSession.local(cores = 4, appName = "neardup-spec")

  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def fp(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("two arrivals converge to the one-shot C2 pair set") {
    val docs = Tables(spark, sfDir).documents
    val storeDir = tmp("nd-store").toString
    NearDupStream.mergeBatch(docs.filter(col("doc_id") % 2 === 1),
      storeDir, txn = Some(0L))
    NearDupStream.mergeBatch(docs.filter(col("doc_id") % 2 === 0),
      storeDir, txn = Some(1L))
    val got = NearDupStream.pairs(spark, storeDir, minJaccard = 0.8)
    val want = Dedup.minhashLsh(docs, minJaccard = 0.8)
    assert(fp(got) == fp(want))
    assert(got.count() > 0, "the sf0.001 corpus must contain near-dups")
  }

  test("replayed txn is a no-op; re-delivery under a new txn is idempotent") {
    val docs = Tables(spark, sfDir).documents
    val storeDir = tmp("nd2-store").toString
    val b = docs.filter(col("doc_id") % 2 === 0)
    NearDupStream.mergeBatch(docs.filter(col("doc_id") % 2 === 1),
      storeDir, txn = Some(0L))
    NearDupStream.mergeBatch(b, storeDir, txn = Some(1L))
    val sig = new SnapshotStore(spark, s"$storeDir/sig", "doc_id")
    val buk = new SnapshotStore(spark, s"$storeDir/bucket", "bkey")
    val (vs, vb) = (sig.currentVersion.get, buk.currentVersion.get)
    val before = fp(NearDupStream.pairs(spark, storeDir))
    // replayed foreachBatch txn: both stores no-op
    NearDupStream.mergeBatch(b, storeDir, txn = Some(1L))
    assert(sig.currentVersion.get == vs && buk.currentVersion.get == vb)
    // genuine re-delivery under a new txn: idempotent folds converge
    NearDupStream.mergeBatch(b, storeDir, txn = Some(2L))
    assert(fp(NearDupStream.pairs(spark, storeDir)) == before)
  }
}
