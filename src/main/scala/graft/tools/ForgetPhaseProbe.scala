package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only (r16): per-phase wall/job breakdown of the store-lifecycle
  * forget gates — mergeBatch / forget / pairs for the near-dup index.
  */
object ForgetPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "forget-phase-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.NearDupStream
    val docs = graft.sources.Tables(spark, sfDir).documents
    def phase[T](name: String)(body: => T): T = {
      val g = s"phase-$name-${System.nanoTime()}"
      spark.sparkContext.setJobGroup(g, name)
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      val nj = spark.sparkContext.statusTracker.getJobIdsForGroup(g).length
      println(f"[phase] $name%-22s $sec%6.2f s  jobs=$nj%3d")
      r
    }
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      val root = java.nio.file.Files.createTempDirectory("fpp").toString
      spark.catalog.clearCache()
      phase("mergeBatch")(NearDupStream.mergeBatch(docs, root, txn = Some(0L)))
      phase("forget")(NearDupStream.forget(spark, root,
        docs.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select(col("doc_id")), txn = Some(1L)))
      phase("pairs")(NearDupStream.pairs(spark, root, minJaccard = 0.8)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
