package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only experiment (r16 optimization): quantify the AQE per-stage
  * job overhead inside the CC star loop at local[32]. Runs
  * q_connected_components twice — AQE on (session default) and AQE
  * off — with the Bench cold-cache discipline, printing wall time and
  * scheduled-job counts. Not part of the driver contract.
  */
object CcAqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "cc-aqe-probe")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_connected_components")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Seq("true", "false").foreach { aqe =>
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        (1 to 2).foreach { run =>
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          val group = s"ccaqe-$name-$aqe-$run"
          spark.sparkContext.setJobGroup(group, name)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          spark.sparkContext.clearJobGroup()
          val nj = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
          println(f"[ccaqe] $name%-26s aqe=$aqe%-5s run$run $sec%6.2f s  jobs=$nj%3d")
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
