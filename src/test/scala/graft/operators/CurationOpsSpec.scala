package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C71 q_dup_weights and C72 q_lm_buckets — semantic invariants over
  * the sf0.001 corpus (the exact frames are oracle-gated; these pin
  * the properties the oracle hash can't explain when it fails).
  */
class CurationOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = graft.GraftSession.local(cores = 4, appName = "curation-ops-spec")

  test("C71: dup weights invert cluster size and cover every doc exactly once") {
    val w = PipelineQueries.qDupWeights(spark, sf).cache()
    val cl = PipelineQueries.qDupClusters(spark, sf)
    val nDocs = cl.count()
    assert(w.count() === nDocs, "one weight row per doc")
    assert(w.select(col("doc_id")).distinct().count() === nDocs)
    assert(w.filter(expr("weight_ppm != 1000000 div cluster_size")).count() === 0L)
    // singletons carry full weight; clustered docs share it
    assert(w.filter(col("cluster_size") === 1L && col("weight_ppm") =!= 1000000L).count() === 0L)
    assert(w.filter(col("cluster_size") > 1L && col("weight_ppm") >= 1000000L).count() === 0L)
    // per-cluster sizes must agree with the C19 cluster map
    val sizesFromClusters = cl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"))
      .join(cl, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("n"))
    val mismatch = w.join(sizesFromClusters, Seq("doc_id"))
      .filter(col("cluster_size") =!= col("n")).count()
    assert(mismatch === 0L)
    w.unpersist()
  }

  test("C73: DSIR weights score only the raw pool and normalize by floor division") {
    import graft.sources.Tables
    val w = CorpusQueries.qDsirWeights(spark, sf).cache()
    val docs = Tables(spark, sf).documents
    // target (src0) docs are never scored; every raw doc is
    val srcOf = docs.select(col("doc_id"), col("source"))
    assert(w.join(srcOf, Seq("doc_id")).filter(col("source") === "src0").count() === 0L)
    assert(w.count() === docs.filter(col("source") =!= "src0").count())
    // n_tok is the document's token count (the bucket tf partition it)
    val nt = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    assert(w.join(nt, Seq("doc_id")).filter(col("n_tok") =!= col("n")).count() === 0L)
    // explicit floor division parity, including negative totals
    assert(w.filter(
      expr("imp_milli_per_tok != (imp_ebits * 1000 - pmod(imp_ebits * 1000, n_tok)) div n_tok"))
      .count() === 0L)
    assert(w.filter(col("imp_ebits") < 0).count() > 0L, "raw-typical docs score negative")
    w.unpersist()
  }

  test("C72: lm buckets are balanced terciles ordered by score within each language") {
    val b = CorpusQueries.qLmBuckets(spark, sf).cache()
    // ranks are a 1..n permutation per language
    val byLang = b.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), min(col("lang_rank")).as("lo"),
        max(col("lang_rank")).as("hi"),
        countDistinct(col("lang_rank")).as("nd"))
    assert(byLang.filter(col("lo") =!= 1L || col("hi") =!= col("n") || col("nd") =!= col("n"))
      .count() === 0L)
    // tercile sizes differ by at most one within a language
    val sizes = b.groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("c"))
      .groupBy(col("lang")).agg(max(col("c")).as("mx"), min(col("c")).as("mn"),
        countDistinct(col("bucket")).as("nb"))
    assert(sizes.filter(col("nb") === 3 && col("mx") - col("mn") > 1).count() === 0L)
    // bucket order respects the (score, doc_id) order: the worst row
    // of head precedes the best row of middle, and middle of tail
    val rk = b.withColumn("key",
      struct(col("ppl_milli_ebits"), col("doc_id")))
    def edge(bk: String, agg: String): org.apache.spark.sql.DataFrame =
      rk.filter(col("bucket") === bk).groupBy(col("lang"))
        .agg((if (agg == "max") max(col("key")) else min(col("key"))).as(s"${bk}_$agg"))
    val bad = edge("head", "max").join(edge("middle", "min"), Seq("lang"))
      .filter(col("head_max") >= col("middle_min")).count() +
      edge("middle", "max").join(edge("tail", "min"), Seq("lang"))
        .filter(col("middle_max") >= col("tail_min")).count()
    assert(bad === 0L)
    b.unpersist()
  }
}
