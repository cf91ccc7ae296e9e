package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only targeted timer: time named queries at a given SF dir
  * (min of 2 runs, cache cleared between), without running the whole
  * Bench suite. Usage: runMain graft.tools.TimeQueries <sfDir> <q1,q2,...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = names.split(',').toSeq
    picked.foreach { n =>
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save() // warmup
    }
    picked.foreach { n =>
      val t = (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"TIMEQ $n%-28s $t%8.3f s")
    }
    spark.stop()
  }
}
