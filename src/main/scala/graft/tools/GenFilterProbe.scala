package graft.tools

/** Dev-only (r16): measure InferFiltersFromGenerate's cost on the
  * spread shingle kernels — the inferred size(generator)>0 filter
  * pushes below the spread exchange and re-evaluates the expensive
  * kernel on the unspread side.
  */
object GenFilterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "genfilter-probe")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_ngram_jaccard", "q_dedup_eval", "q_containment_pairs")
    val rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      Seq("", rule).foreach { excl =>
        spark.conf.set("spark.sql.optimizer.excludedRules", excl)
        (1 to 2).foreach { run =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"[genfilter] $name%-22s excl=${excl.nonEmpty}%-5s run$run $sec%6.2f s")
        }
      }
      spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    spark.stop()
  }
}
