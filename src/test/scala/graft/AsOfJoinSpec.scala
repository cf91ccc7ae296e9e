package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin
import graft.sources.Tables

/** The custom LogicalPlan + Strategy + sort-merge exec as-of join,
  * verified against the oracle-checked window composition.
  */
class AsOfJoinSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = GraftSession.local(cores = 4, appName = "asof-spec")

  private def sides: (DataFrame, DataFrame) = {
    val ev = Tables(spark, sf).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"))
    (purchases, clicks)
  }

  test("custom as-of join matches the oracle-checked window composition") {
    val (purchases, clicks) = sides
    val custom = AsOfJoin(purchases, clicks,
        purchases("p_user"), clicks("c_user"), purchases("p_us"), clicks("c_us"),
        clicks("click_id"))
      .select(col("purchase_id").as("event_id"), col("p_user").as("user_id"),
        col("click_id"))
    val composed = graft.operators.Relational.qAsofJoin(spark, sf)
    assert(custom.exceptAll(composed).count() == 0 &&
      composed.exceptAll(custom).count() == 0)
    assert(custom.count() == composed.count() && custom.count() > 0)
  }

  test("custom as-of plan is one exchange + sort per side, no window") {
    val (purchases, clicks) = sides
    val custom = AsOfJoin(purchases, clicks,
      purchases("p_user"), clicks("c_user"), purchases("p_us"), clicks("c_us"),
        clicks("click_id"))
    val p = custom.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 exchanges (one per side):\n$p")
  }

  test("A27: point-in-time features never leak future or label-row data") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.CdcQueries.qPitFeatures(spark, sf).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // leakage-freedom: the joined feature is never the label event
      // itself and never comes from after the label timestamp
      assert(out.filter(col("feat_id") === col("event_id")).count() == 0)
      assert(out.filter(col("feat_age_us") < 0).count() == 0)
      // version counter agrees with an independent exact recount
      val ev = graft.sources.Tables(spark, sf).events
      val dim = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("d_user"), unix_micros(col("ts")).as("d_us"))
      val recount = out.join(dim,
          col("user_id") === col("d_user") && col("d_us") <= col("label_ts_us"), "left")
        .groupBy(col("event_id"), col("n_versions"))
        .agg(count(col("d_user")).as("n_chk"))
      assert(recount.filter(col("n_versions") =!= col("n_chk")).count() == 0)
    } finally out.unpersist()
  }
}
