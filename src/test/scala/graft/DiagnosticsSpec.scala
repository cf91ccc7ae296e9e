package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DiagnosticsQueries

/** G-block invariants beyond the DuckDB oracle rows: the CMS
  * inner-product estimator's theorem-level guarantees, the prefix
  * scan's partitioning invariance, and the binning/robust-stats
  * structural properties.
  */
class DiagnosticsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "diagnostics-spec")
  val dir = "/root/testdata/sf0.001"

  test("G2: cms_inner is >= the exact join size on known keys") {
    import spark.implicits._
    // |A join B| on key: A = {1x3, 2x2}, B = {2x5, 3x1} -> 2*5 = 10
    val a = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
      .agg(graft.functions.cms_sketch(col("k"), 4, 11).as("sk"))
    val b = Seq(2L, 2L, 2L, 2L, 2L, 3L).toDF("k")
      .agg(graft.functions.cms_sketch(col("k"), 4, 11).as("sk2"))
    val est = a.crossJoin(b)
      .select(graft.functions.cms_inner(col("sk"), col("sk2")).as("est"))
      .collect()(0).getLong(0)
    assert(est >= 10L, s"inner-product estimate $est under-counts the true join size 10")
    // tiny corpora, 2048-wide grid: no collisions, estimate is exact
    assert(est == 10L, s"estimate $est should be collision-free here")
  }

  test("G2: cms_inner rejects shape-mismatched sketches") {
    import spark.implicits._
    val a = Seq(1L).toDF("k").agg(graft.functions.cms_sketch(col("k"), 4, 11).as("sk"))
    val b = Seq(1L).toDF("k").agg(graft.functions.cms_sketch(col("k"), 4, 12).as("sk2"))
    val ex = intercept[Exception] {
      a.crossJoin(b).select(graft.functions.cms_inner(col("sk"), col("sk2"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("G3: lateness scan is partitioning-invariant (4 vs 1 range partitions)") {
    // the distributed two-phase scan must equal the single-partition
    // truth; qLatenessAudit uses 32 range partitions — recompute the
    // same audit through the oracle-shaped single window and compare
    import org.apache.spark.sql.expressions.Window
    val ev = graft.sources.Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val w = Window.orderBy(col("user_id"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val truth = ev.withColumn("late", max(col("us")).over(w) - col("us"))
      .withColumn("bucket",
        when(col("late") === 0L, "a_on_time")
          .when(col("late") <= 60L * 1000000L, "b_le_1m")
          .when(col("late") <= 3600L * 1000000L, "c_le_1h")
          .when(col("late") <= 86400L * 1000000L, "d_le_1d")
          .otherwise("e_gt_1d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("late")).as("max_lateness_us"))
    val got = DiagnosticsQueries.qLatenessAudit(spark, dir)
    assert(got.exceptAll(truth).count() == 0 && truth.exceptAll(got).count() == 0,
      "distributed scan diverged from the single-window truth")
  }

  test("E19/C65/C66: bootstrap centers on truth, ablation partitions, card bounds") {
    // bootstrap: weights have mean 1 per row, so the average of the 16
    // deterministic replicate sums must sit near the true total (the
    // spread IS the CI; 10% is far outside any plausible drift)
    val boots = graft.operators.AnalyticsQueries.qBootstrapCi(spark, dir).collect()
    assert(boots.length == 16)
    val trueSum = boots.head.getLong(2).toDouble
    val meanBoot = boots.map(_.getLong(1)).sum.toDouble / boots.length
    assert(math.abs(meanBoot / trueSum - 1.0) < 0.10,
      s"bootstrap mean $meanBoot far from true $trueSum")
    // ablation: every row partitions the same corpus (group + rest =
    // constant), and shares sum to <= 1e6 ppm
    val ab = graft.operators.CorpusQueries.qSourceAblation(spark, dir).collect()
    val totDocs = ab.map(r => r.getLong(1) + r.getLong(3)).distinct
    assert(totDocs.length == 1, s"doc totals disagree across rows: $totDocs")
    assert(ab.map(_.getLong(5)).sum <= 1000000L)
    // card: structural bounds per language row
    val card = graft.operators.CorpusQueries.qDatasetCard(spark, dir).collect()
    card.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"dup_docs > n_docs: $r")
      assert(r.getLong(4) <= r.getLong(1), s"short_docs > n_docs: $r")
      assert(r.getLong(6) <= 1000000L, s"top_source_ppm > 1e6: $r")
    }
  }

  test("G8: drift halves tile the corpus and reach never exceeds the type's user base") {
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    val sd = DiagnosticsQueries.qStatsDrift(spark, dir).cache()
    val ev = Tables(spark, dir).events
    assert(sd.agg(sum(col("n_a") + col("n_b"))).head().getLong(0) === ev.count())
    val reach = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
    assert(sd.join(reach, Seq("event_type"))
      .filter(col("users_a") > col("u") || col("users_b") > col("u"))
      .count() === 0L)
    assert(sd.filter(expr("n_ratio_ppm != n_b * 1000000 div n_a")).count() === 0L)
    sd.unpersist()
  }

  test("G4/G5: MAD is non-negative and bins are equi-depth with monotone bounds") {
    val rs = DiagnosticsQueries.qRobustStats(spark, dir).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getLong(3) >= 0L, s"negative MAD: $r")
    }
    val bins = DiagnosticsQueries.qEquidepthBins(spark, dir).collect()
      .groupBy(_.getString(0))
    bins.foreach { case (et, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      val ns = sorted.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$et bins not equi-depth: ${ns.mkString(",")}")
      // bin value ranges never overlap going up
      sorted.sliding(2).foreach {
        case Array(lo, hi) =>
          assert(lo.getLong(4) <= hi.getLong(3),
            s"$et bins overlap: ${lo.getLong(4)} > ${hi.getLong(3)}")
        case _ => ()
      }
    }
  }
}
