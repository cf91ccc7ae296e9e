package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** C74 q_novelty_curve, C75 q_zipf_octaves, F15 q_burst_detect —
  * semantic invariants over the sf0.001 tables (the exact frames are
  * oracle-gated; these pin the properties a hash mismatch can't
  * explain on its own).
  */
class CorpusCurveSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    graft.GraftSession.local(cores = 4, appName = "corpus-curve-spec")

  test("C74: every gram is novel exactly once and deciles tile the corpus") {
    import graft.sources.Tables
    val c = CorpusQueries.qNoveltyCurve(spark, sf).cache()
    val docs = Tables(spark, sf).documents
    // deciles tile the corpus: every doc in exactly one bucket
    assert(c.agg(sum(col("n_docs"))).first().getLong(0) === docs.count())
    assert(c.filter(col("bucket") < 0 || col("bucket") > 9).count() === 0L)
    // each distinct gram string is a first occurrence exactly once
    val distinctGrams = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 8)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 7), i -> array_join(slice(w, i, 8), ' '))"))
        .as("s"))
      .distinct().count()
    assert(c.agg(sum(col("n_novel"))).first().getLong(0) === distinctGrams)
    // novelty is a proper ppm share
    assert(c.filter(col("n_novel") > col("n_grams")).count() === 0L)
    assert(c.filter(
      expr("novelty_ppm != n_novel * 1000000 div greatest(n_grams, 1L)"))
      .count() === 0L)
    // the first decile contains the corpus's first doc: it cannot be
    // all-repeat (its first doc's grams are first occurrences)
    assert(c.filter(col("bucket") === 0L).first().getAs[Long]("n_novel") > 0L)
    c.unpersist()
  }

  test("C75: octaves are capacity-bounded and masses tile the token count") {
    import graft.sources.Tables
    val z = CorpusQueries.qZipfOctaves(spark, sf).cache()
    // octave k holds ranks [2^k, 2^(k+1)): at most 2^k types, head = rank 1 alone
    assert(z.filter(col("n_types") > col("lo_rank")).count() === 0L)
    assert(z.filter(col("octave") === 0L).first().getAs[Long]("n_types") === 1L)
    assert(z.filter(col("octave") === 0L).first().getAs[Long]("decay_ppm") === -1L)
    // masses tile the corpus token count exactly
    val nTok = Tables(spark, sf).documents
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n"))).first().getLong(0)
    assert(z.agg(sum(col("mass"))).first().getLong(0) === nTok)
    // ppm shares sum to 1e6 minus floor-division dust (< one per row)
    val ppm = z.agg(sum(col("mass_ppm"))).first().getLong(0)
    assert(ppm <= 1000000L && ppm > 1000000L - z.count())
    z.unpersist()
  }

  test("C76: cluster labels are top-3 member terms with contiguous ranks") {
    import graft.sources.Tables
    val ct = PipelineQueries.qClusterTerms(spark, sf).cache()
    assert(ct.count() > 0L)
    // <=3 labels per cluster, ranks contiguous from 1
    val perCluster = ct.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n"), min(col("rnk")).as("lo"), max(col("rnk")).as("hi"))
    assert(perCluster.filter(col("n") > 3 || col("lo") =!= 1L ||
      col("hi") =!= col("n")).count() === 0L)
    // every label term occurs in some member document of its cluster
    val members = PipelineQueries.qEmbeddingClusters(spark, sf)
      .select(col("cluster_id"), col("id").as("doc_id"))
    val toks = Tables(spark, sf).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val inMember = ct.join(members, Seq("cluster_id"))
      .join(toks, Seq("doc_id", "term"))
      .select(col("cluster_id"), col("term")).distinct()
    assert(ct.select(col("cluster_id"), col("term")).distinct()
      .except(inMember).count() === 0L)
    ct.unpersist()
  }

  test("F16: the survival curve is a proper censored KM estimate") {
    val s = TimeSeriesQueries.qSurvival(spark, sf).cache()
    // deaths never exceed the risk set; risk set shrinks with t
    assert(s.filter(col("d") > col("n_risk")).count() === 0L)
    val rows = s.orderBy(col("t")).collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_risk") >= b.getAs[Long]("n_risk"))
        assert(a.getAs[Long]("surv_ppm") >= b.getAs[Long]("surv_ppm"),
          "survival is monotone nonincreasing")
      case _ => ()
    }
    assert(rows.head.getAs[Long]("surv_ppm") <= 1000000L)
    assert(s.agg(sum(col("d"))).first().getLong(0) > 0L,
      "the gate must exercise the death path")
    s.unpersist()
  }

  test("F15: burst segments are maximal disjoint above-median calendar runs") {
    import spark.implicits._
    val b = TimeSeriesQueries.qBurstDetect(spark, sf).cache()
    assert(b.count() > 0L, "synthetic series must produce segments")
    // run length bookkeeping: n_days spans the calendar interval
    assert(b.filter(expr("n_days != datediff(end_day, start_day) + 1")).count() === 0L)
    assert(b.filter(col("total_cnt") < col("peak_cnt")).count() === 0L)
    // segments are disjoint, ordered, and MAXIMAL (a gap of >= 1
    // non-burst day between consecutive segments)
    val segs = b.select(col("start_day").cast("string"), col("end_day").cast("string"))
      .as[(String, String)].collect()
    segs.sliding(2).foreach {
      case Array((_, e1), (s2, _)) =>
        assert(java.time.LocalDate.parse(s2).toEpochDay >
          java.time.LocalDate.parse(e1).toEpochDay + 1)
      case _ => ()
    }
    b.unpersist()
  }
}
