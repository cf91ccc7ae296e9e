package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.dedup.Dedup

/** Dev-only: stage timings for q_dedup_eval. */
object DedupEvalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "dedup-eval-probe")
    spark.sparkContext.setLogLevel("WARN")
    import PerfProbe.time
    val docs = Tables(spark, sfDir).documents
    docs.count()
    time("simhashPairs maxHamming=3") {
      Dedup.simhashPairs(docs, maxHamming = 3).count()
    }
    time("truth: plain co-shingle join") {
      val sh = Dedup.hashedShingles(docs)
        .select(col("doc_id"), size(col("shh")).as("c"), explode(col("shh")).as("gh"))
      sh.select(col("gh"), col("doc_id").as("id_a"), col("c").as("ca"))
        .join(sh.select(col("gh"), col("doc_id").as("id_b"), col("c").as("cb")), Seq("gh"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(count(lit(1)).as("inter"), max(col("ca")).as("ca"), max(col("cb")).as("cb"))
        .filter(col("inter") * 2 >= col("ca") + col("cb") - col("inter"))
        .count()
    }
    time("truth: prefix-filtered join") {
      Dedup.ngramJaccardPairsPrefix(docs, 0.5, Int.MaxValue).count()
    }
    spark.stop()
  }
}
