package graft.tools

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Dev-only: stage timings for the co-purchase pair kernel. */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "pair-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      sys.env.getOrElse("GRAFT_OHA_THRESHOLD", "128"))
    import PerfProbe.time

    // warm
    Tables(spark, sfDir).lineitem.count()

    time("scan lineitem") {
      Tables(spark, sfDir).lineitem.select(col("l_orderkey"), col("l_partkey")).count()
    }
    time("groupBy collect_set") {
      Tables(spark, sfDir).lineitem
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("s"))
        .count()
    }
    time("collect_set + explode pairs") {
      Tables(spark, sfDir).lineitem
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("s"))
        .select(explode(expr(
          """flatten(transform(s, (x, i) ->
            |  transform(slice(s, i + 2, size(s)), y -> struct(x AS p1, y AS p2))))"""
            .stripMargin)).as("p"))
        .count()
    }
    time("full copurchasePairs") {
      graft.operators.AnalyticsQueries.copurchasePairs(spark, sfDir).count()
    }
    time("mapPartitions variant") {
      import spark.implicits._
      Tables(spark, sfDir).lineitem
        .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)]
        .repartition(col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("l_partkey"))
        .mapPartitions { it =>
          val buf = new scala.collection.mutable.ArrayBuffer[Long](32)
          var curKey = Long.MinValue
          var started = false
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](64)
          new Iterator[(Long, Long)] {
            private var pending: Iterator[(Long, Long)] = Iterator.empty
            private def flush(): Iterator[(Long, Long)] = {
              out.clear()
              var i = 0
              while (i < buf.length) {
                var j = i + 1
                while (j < buf.length) { out += ((buf(i), buf(j))); j += 1 }
                i += 1
              }
              buf.clear()
              out.iterator
            }
            def hasNext: Boolean = {
              while (!pending.hasNext && (it.hasNext || buf.nonEmpty)) {
                if (it.hasNext) {
                  val (k, p) = it.next()
                  if (!started || k == curKey) {
                    started = true; curKey = k
                    if (buf.isEmpty || buf.last != p) buf += p
                  } else {
                    pending = flush().toArray.iterator
                    curKey = k; buf += p
                  }
                } else pending = flush().toArray.iterator
              }
              pending.hasNext
            }
            def next(): (Long, Long) = pending.next()
          }
        }.toDF("p1", "p2")
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .count()
    }
    time("self-join variant") {
      val items = Tables(spark, sfDir).lineitem
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val a = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
      val b = items.select(col("l_orderkey"), col("l_partkey").as("p2"))
      a.join(b, "l_orderkey").filter(col("p1") < col("p2"))
        .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("support"))
        .count()
    }
    spark.stop()
  }
}
