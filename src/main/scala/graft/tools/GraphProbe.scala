package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: per-phase wall times of the iterative graph queries
  * (q_pagerank's round loop), to separate scheduling floor from plan
  * cost. Usage: runMain graft.tools.GraphProbe <sfDir>
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    // warmup JVM/codegen on the smallest corpus
    graft.operators.AnalyticsQueries.qPagerank(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { it =>
      println(s"--- iteration $it")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val S = 1000000000000L
      val edges = t("pairs-read") {
        graft.operators.AnalyticsQueries.copurchasePairs(spark, sfDir)
      }
      val nPairs = t("metadata-count")(edges.count())
      val both = t("repartition+cache") {
        val loopParts = math.max(1, math.min(32, (2 * nPairs / 100000L).toInt + 1))
        val b = edges.filter(col("support") >= 2)
          .select(col("p1").as("u"), col("p2").as("v"))
        val bb = b.unionAll(b.select(col("v").as("u"), col("u").as("v")))
          .repartition(loopParts, col("u")).cache()
        bb.count() // materialize
        bb
      }
      val deg = t("degree+cache") {
        val d = both.groupBy(col("u")).agg(count(lit(1)).as("d")).cache()
        d.count()
        d
      }
      val nF = broadcast(deg.agg(count(lit(1)).as("n")))
      var r: DataFrame = deg.crossJoin(nF)
        .select(col("u"), col("d"), expr(s"${S}L div n").as("pr"))
      for (round <- 1 to 3) {
        r = t(s"round-$round") {
          val inflow = both
            .join(r.select(col("u"), col("d"), col("pr")), "u")
            .select(col("v"), expr("(85 * (pr div d)) div 100").as("c"))
            .groupBy(col("v")).agg(sum(col("c")).as("inflow"))
          deg.join(inflow.withColumnRenamed("v", "u"), Seq("u"), "left")
            .crossJoin(nF)
            .select(col("u"), col("d"),
              expr(s"(15 * (${S}L div n)) div 100 + coalesce(inflow, 0L)").as("pr"))
            .localCheckpoint(true)
        }
      }
      t("top20+collect")(r.orderBy(col("pr").desc, col("u")).limit(20).collect())
      both.unpersist(); deg.unpersist()

      println(s"--- textrank iteration $it")
      spark.catalog.clearCache()
      val docs = graft.sources.Tables(spark, sfDir).documents
      val toks = docs.select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
      val edges0 = toks.select(explode(expr(
          "transform(sequence(0, size(w) - 2), i -> struct(w[i] as w1, w[i+1] as w2))")).as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
        .distinct().cache()
      val nE = t("tr-edges+cache")(edges0.count())
      val tr = t("tr-5-rounds+top50") {
        graft.text.TextAnalysis.textrank(docs, iterations = 5)
          .orderBy(col("r").desc, col("w")).limit(50).collect()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      t("tr-rounds-noAQE") {
        graft.text.TextAnalysis.textrank(docs, iterations = 5)
          .orderBy(col("r").desc, col("w")).limit(50).collect()
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      println(s"tr edges=$nE rows=${tr.length}")
      edges0.unpersist()
    }
    spark.stop()
  }
}
