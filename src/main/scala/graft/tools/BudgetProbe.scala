package graft.tools

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev-only: the 100x leg of the containment-family scale ladder.
  * Replicates sf0.1 documents in-plan (df per shingle scales with the
  * factor, candidate mass sum(df^2) with its square) and asks the
  * adaptive dispatcher to plan containment pairs under the DEFAULT
  * pairMassBudget. Expected: the 25x-ish regime stays admitted
  * (~1.75e9 mass, r6 probe), 100x REFUSES fast with the estimate in
  * the message — the budget guard failing closed exactly where the
  * candidate shuffle alone would be hundreds of GB.
  */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val spark = graft.GraftSession.local(32, "budget-probe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.1").documents
      .crossJoin(spark.range(factor).select(col("id").as("rep")))
      .select((col("doc_id") * lit(1000L) + col("rep")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    val t0 = System.nanoTime()
    val stats = Dedup.shingleStats(docs)
    println(f"[budget-probe] factor=$factor skew=${stats.skew}%.2f " +
      f"estPairMass=${stats.estPairMass}%.3g statsJob=${(System.nanoTime()-t0)/1e9}%.1f s")
    try {
      Dedup.containmentPairsAdaptive(docs, 0.6, precomputed = Some(stats))
      println("[budget-probe] ADMITTED (plan built)")
    } catch {
      case e: IllegalStateException =>
        println(s"[budget-probe] REFUSED: ${e.getMessage}")
    }
    spark.stop()
  }
}
