package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only A/B of AQE's OptimizeSkewedJoin on a hot-key fact-fact
  * join (the measurement behind the PlanShapeSpec pin): one key owns
  * 95% of the left side, broadcast is off (the 100 TB stand-in), and
  * the same join runs with the skew split disabled vs enabled. With
  * the split off the hot partition is one straggler task; with it on
  * the hot partition fans over many tasks.
  * Run: `sbt "runMain graft.tools.SkewJoinProbe [hotRowsMillions]"`.
  */
object SkewJoinProbe {
  def main(args: Array[String]): Unit = {
    val hotM = if (args.nonEmpty) args(0).toInt else 40
    val spark = graft.GraftSession.local(32, "skewjoin-probe")
    spark.sparkContext.setLogLevel("WARN")
    val hot = hotM * 1000000L
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the default 256MB threshold is sized for executor-scale
    // partitions; scale it with the probe (mechanism identical)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16MB")

    def run(skewOn: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val left = spark.range(0L, hot + 200000L)
        .select(when(col("id") < hot, 0L).otherwise(col("id")).as("k"),
          col("id").as("va"))
      val right = spark.range(0L, hot + 200000L)
        .select(col("id").as("k"), (col("id") * 2).as("vb"))
      val j = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("va") + col("vb")).as("s"))
      val t0 = System.nanoTime()
      val n = j.collect().head.getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      val p = j.queryExecution.executedPlan.toString
      println(f"[skewjoin] skew=$skewOn%-5s $dt%7.2f s  rows=$n  " +
        s"splitEngaged=${p.contains("skew=true")}")
      dt
    }
    val off = run(skewOn = false)
    val on = run(skewOn = true)
    println(f"[skewjoin] speedup with OptimizeSkewedJoin: ${off / on}%.2fx")
    spark.stop()
  }
}
