package graft.tools

/** Dev-only: count() (column-pruned) vs toRdd.count() (full row
  * materialization) per query — quantifies how much of each query's
  * projection the count() action lets Catalyst prune.
  */
object ActionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "action-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      graft.SparkEntry.queries(n)(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      val tCount = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
      val tFull = (System.nanoTime() - t1) / 1e9
      println(f"[probe] $n%-24s count=$tCount%6.2f  full=$tFull%6.2f")
    }
    spark.stop()
  }
}
