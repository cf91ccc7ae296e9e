package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only A/B of the plain vs prefix-filtered n-gram Jaccard paths
  * on a flat corpus (testdata documents) and a Zipfian synthetic one
  * — the measurement behind ngramJaccardAdaptive's trigger. Run:
  * `sbt "runMain graft.tools.SkewProbe"` (env: SPARK_GRAFT_SF_DIR,
  * GRAFT_ZIPF_DOCS).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = sys.env.getOrElse("GRAFT_ZIPF_DOCS", "20000").toLong
    val spark = graft.GraftSession.local(32, "skew-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.Dedup

    def timeIt(name: String)(f: => Long): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[skew] $name%-32s $dt%8.2f s  rows=$n")
      dt
    }

    val flat = graft.sources.Tables(spark, sfDir).documents
    flat.count()
    println(f"[skew] flat corpus skew   = ${Dedup.shingleDfSkew(flat)}%.2f")
    timeIt("flat plain")(Dedup.ngramJaccardPairs(flat, 0.5).count())
    timeIt("flat prefix")(Dedup.ngramJaccardPairsPrefix(flat, 0.5).count())

    // materialize the synthetic corpus to parquet so generation cost
    // isn't billed to either path
    val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
    Corpora.zipf(spark, nDocs).write.mode("overwrite").parquet(tmp)
    val zipf = spark.read.parquet(tmp)
    println(s"[skew] zipf corpus docs   = ${zipf.count()}")
    println(f"[skew] zipf corpus skew   = ${Dedup.shingleDfSkew(zipf)}%.2f")
    val tPlain = math.min(
      timeIt("zipf plain #1")(Dedup.ngramJaccardPairs(zipf, 0.5).count()),
      timeIt("zipf plain #2")(Dedup.ngramJaccardPairs(zipf, 0.5).count()))
    val tPrefix = math.min(
      timeIt("zipf prefix #1")(Dedup.ngramJaccardPairsPrefix(zipf, 0.5).count()),
      timeIt("zipf prefix #2")(Dedup.ngramJaccardPairsPrefix(zipf, 0.5).count()))
    println(f"[skew] zipf speedup plain/prefix = ${tPlain / tPrefix}%.2fx")
    spark.stop()
  }
}
