package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage dissection for q_negative_sample. */
object NegProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "neg-probe")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.sources.Tables(spark, sfDir)

    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min match { case s => println(f"[neg] $name%-30s $s%6.3f s") }
    }

    // warm
    graft.SparkEntry.queries("q_negative_sample")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    val join = t.lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    time("join only")(join.write.format("noop").mode("overwrite").save())
    val posSets = join.groupBy(col("o_custkey").as("cust"))
      .agg(collect_set(col("l_partkey").cast("long")).as("pos_parts"))
    time("join+collect_set")(posSets.write.format("noop").mode("overwrite").save())
    val width = math.min(32, spark.sparkContext.defaultParallelism)
    val mx = t.part.agg(max(col("p_partkey")).cast("long").as("maxpk"))
    val cand = posSets.repartition(width).crossJoin(broadcast(mx))
      .select(col("cust"), col("pos_parts"),
        explode(sequence(lit(0), lit(5))).as("slot"), col("maxpk"))
      .withColumn("h",
        conv(substring(md5(concat(lit("graft-neg:"), col("cust"), lit(":"), col("slot"))), 1, 14), 16, 10)
          .cast("long"))
      .withColumn("partkey", (pmod(col("h"), col("maxpk")) + lit(1L)).cast("long"))
      .filter(!array_contains(col("pos_parts"), col("partkey")))
      .select(col("cust").as("custkey"), col("slot").cast("long").as("slot"), col("partkey"))
    time("full no-sort")(cand.write.format("noop").mode("overwrite").save())
    time("full with sort")(cand.orderBy(col("custkey"), col("slot"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
