package graft.tools

import org.apache.spark.sql.functions._

/** Dev check: does EliminateSorts strip ngramJaccard's orderBy when
  * its output feeds the CC edge pipeline (explode/distinct)?
  */
object SortCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "sort-check")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001").documents
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, 0.5).select("id_a", "id_b")
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
    val p = edges.queryExecution.executedPlan.toString
    val sorts = "Sort \\[".r.findAllIn(p).length
    println(s"[sortcheck] Sort nodes in edges plan: $sorts")
    spark.stop()
  }
}
