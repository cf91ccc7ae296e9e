package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.dedup.Dedup

object EmbCcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(8, "emb-cc-probe")
    spark.sparkContext.setLogLevel("WARN")
    import PerfProbe.time
    val emb = Tables(spark, sfDir).embeddings
    time("pairs count") {
      Dedup.embeddingNearDups(emb, 0.4).select(col("id_a"), col("id_b")).count()
    }
    time("cc count") {
      val pairs = Dedup.embeddingNearDups(emb, 0.4).select(col("id_a"), col("id_b"))
      val (cc, rel) = Dedup.connectedComponentsReleasable(
        pairs, emb.select(col("vec_id").as("id")))
      val n = cc.count()
      rel(); n
    }
    spark.stop()
  }
}
