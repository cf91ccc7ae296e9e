package graft.tools

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev-only scheduled-job profiler for the local-ratio-weak queries:
  * the r10 verdict's residual claim is "these shapes pay the
  * measured ~0.25-0.3s/job local[32] scheduling floor", and this
  * probe turns that from prose into a committed artifact
  * (JOBPROFILE.json). For each named contract query it runs the
  * Bench methodology (warm once, min-of-2 cold-cache timings) while
  * a SparkListener counts scheduled jobs, completed stages and
  * tasks of the MEASURED run, then emits one JSON object per query:
  * {"query":…, "sec":…, "jobs":…, "stages":…, "tasks":…,
  *  "sec_per_job":…} — sec_per_job ≈ the per-scheduled-job overhead
  * the shape pays at local[32] (observed 0.03-0.15s depending on
  * stage size); a query whose wall is dominated by jobs × that
  * overhead is scheduling-bound, not compute-bound, and amortizes
  * at cluster scale where per-stage work is seconds, not
  * milliseconds. Not part of the driver contract.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "job-probe")
    spark.sparkContext.setLogLevel("WARN")
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_negative_sample", "q_textrank", "q_bloom_contamination",
      "q_bootstrap_ci", "q_semantic_dedup", "q_pagerank", "q_triangles")
    // warm pass: JIT, codegen, file listing, DerivedTable landings
    names.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    val out = new StringBuilder("[\n")
    names.zipWithIndex.foreach { case (n, i) =>
      var best = Double.MaxValue
      var bj, bs, bt = 0
      (1 to 2).foreach { run =>
        spark.catalog.clearCache()
        // job count comes from the synchronous status tracker (a
        // per-run job group); the async listener supplies stage/task
        // counts after a short drain
        val group = s"jobprobe-$n-$run"
        spark.sparkContext.setJobGroup(group, n)
        stages.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        Thread.sleep(400) // drain the async listener bus
        val nj = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        if (sec < best) { best = sec; bj = nj; bs = stages.get(); bt = tasks.get() }
      }
      out.append(f"""  {"query":"$n","sec":$best%.3f,"jobs":$bj,"stages":$bs,"tasks":$bt,"sec_per_job":${best / math.max(1, bj)}%.3f}""")
      out.append(if (i == names.length - 1) "\n" else ",\n")
      println(f"[jobprobe] $n%-26s ${best}%6.2f s  jobs=$bj%3d stages=$bs%3d tasks=$bt%5d  sec/job=${best / math.max(1, bj)}%6.3f")
    }
    out.append("]\n")
    val target = sys.env.getOrElse("GRAFT_JOBPROFILE_OUT", "/root/repo/JOBPROFILE.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(target),
      out.toString.getBytes("UTF-8"))
    spark.stop()
  }
}
