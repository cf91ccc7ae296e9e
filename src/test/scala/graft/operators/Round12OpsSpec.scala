package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operators — F18 q_theil_sen, G9 q_ks_drift,
  * G10 q_mutual_info, C86 q_l_diversity, C87 q_embargo_split,
  * C88 q_token_entropy: semantic invariants over the sf0.001 tables
  * (the exact frames are oracle-gated; these pin the properties a
  * hash mismatch can't explain on its own).
  */
class Round12OpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  lazy val spark: SparkSession =
    graft.GraftSession.local(cores = 4, appName = "round12-ops-spec")

  test("F18: distributed Theil-Sen equals the local pairwise-slope median") {
    val res = TimeSeriesQueries.qTheilSen(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // local truth from the collected daily series (calendar-bounded)
    val daily = graft.sources.Tables(spark, sf).events
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield {
        val num = (pts(j)._2 - pts(i)._2) * 10000L
        num / (pts(j)._1 - pts(i)._1) // JVM / truncates like Spark div
      }).sorted
      val lower = slopes((slopes.size + 1) / 2 - 1)
      assert(res(et) === ((slopes.size.toLong, lower)),
        s"$et: distributed (n, slope) ${res(et)} != local (${slopes.size}, $lower)")
    }
    // robustness: corrupting ONE day by 100x moves the pairwise-slope
    // median far less than it moves the mean pairwise slope
    val pts = daily.head._2.map(t => (t._2, t._3)).sortBy(_._1).toArray
    def slopesOf(p: Array[(Long, Long)]): Seq[Long] = (for {
      i <- p.indices; j <- p.indices if p(i)._1 < p(j)._1
    } yield ((p(j)._2 - p(i)._2) * 10000L) / (p(j)._1 - p(i)._1)).sorted
    def med(s: Seq[Long]): Long = s((s.size + 1) / 2 - 1)
    def mean(s: Seq[Long]): Long = s.sum / s.size
    val corrupted = pts.updated(pts.length / 2,
      (pts(pts.length / 2)._1, pts(pts.length / 2)._2 * 100L))
    val (s0, s1) = (slopesOf(pts), slopesOf(corrupted))
    val medShift = math.abs(med(s1) - med(s0))
    val meanShift = math.abs(mean(s1) - mean(s0))
    assert(medShift * 5 < meanShift,
      s"median shifted $medShift vs mean $meanShift — not outlier-robust")
  }

  test("G9: KS ppm is bounded, and a source vs itself reads zero") {
    val ks = DiagnosticsQueries.qKsDrift(spark, sf).collect()
    assert(ks.nonEmpty)
    ks.foreach { r =>
      val ppm = r.getAs[Long]("ks_ppm")
      assert(ppm >= 0L && ppm <= 1000000L, s"ks_ppm $ppm out of [0, 1e6]")
    }
    // local truth for one source: brute-force D over the value grid
    val docs = graft.sources.Tables(spark, sf).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val src = docs.head._1
    val s = docs.filter(_._1 == src).map(_._2).sorted
    val rest = docs.filterNot(_._1 == src).map(_._2).sorted
    val grid = docs.map(_._2).distinct.sorted
    val dNum = grid.map { v =>
      val cs = s.count(_ <= v).toLong
      val cr = rest.count(_ <= v).toLong
      math.abs(cs * rest.length - cr * s.length)
    }.max
    val expected = dNum * 1000000L / (s.length.toLong * rest.length)
    val got = ks.find(_.getString(0) == src).get.getAs[Long]("ks_ppm")
    assert(got === expected, s"$src: distributed $got != local $expected")
  }

  test("G10: MI cells tile the fact table and replay the elog lift locally") {
    val cells = DiagnosticsQueries.qMutualInfo(spark, sf).collect()
    val n = graft.sources.Tables(spark, sf).events.count()
    assert(cells.map(_.getAs[Long]("n_xy")).sum === n, "cells must tile the table")
    // local elog replay on the bounded cell grid
    def elog(x: Long): Long = {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x) // = length(bin(x))
      val mant = if (len - 1 >= 3) x >> (len - 4) else x << (4 - len)
      8L * (len - 1) + mant - 8L
    }
    val nx = cells.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n_xy")).sum)
    val ny = cells.groupBy(_.getAs[Long]("vbucket")).view
      .mapValues(_.map(_.getAs[Long]("n_xy")).sum)
    cells.foreach { r =>
      val lift = elog(r.getAs[Long]("n_xy") * n) -
        elog(nx(r.getString(0)) * ny(r.getAs[Long]("vbucket")))
      assert(r.getAs[Long]("lift_e8") === lift,
        s"cell (${r.getString(0)}, ${r.getAs[Long]("vbucket")}) lift mismatch")
    }
  }

  test("C86: l-diversity never exceeds group size and the flag is consistent") {
    val res = CurationQueries.qLDiversity(spark, sf).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val (grpN, lDist, viol) = (r.getAs[Long]("grp_n"),
        r.getAs[Long]("l_distinct"), r.getAs[Long]("violates_l5"))
      assert(lDist >= 1L && lDist <= grpN, s"l_distinct $lDist vs grp_n $grpN")
      assert(viol === (if (lDist < 5) 1L else 0L))
    }
  }

  test("C87: embargo splits are exhaustive, ordered, and gapped by >= 3 days") {
    val res = CurationQueries.qEmbargoSplit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val total = graft.sources.Tables(spark, sf).events.count()
    assert(res.values.map(_.getAs[Long]("n_rows")).sum === total,
      "splits must tile the table")
    def d(split: String, c: String) =
      java.time.LocalDate.parse(res(split).getAs[String](c))
    assert(res.contains("train") && res.contains("test"))
    // train strictly precedes test with the full embargo width between
    val gapDays = java.time.temporal.ChronoUnit.DAYS
      .between(d("train", "max_d"), d("test", "min_d"))
    assert(gapDays >= 3L, s"train->test gap $gapDays < embargo width 3")
    res.get("embargo").foreach { _ =>
      assert(d("train", "max_d").isBefore(d("embargo", "min_d")))
      assert(d("embargo", "max_d").isBefore(d("test", "min_d")))
    }
  }

  test("E22: BFS levels alternate bipartite sides and never exceed the node universe") {
    val lv = AnalyticsQueries.qBfsLevels(spark, sf).collect()
    assert(lv.nonEmpty && lv.head.getAs[Long]("lvl") === 0L)
    lv.foreach { r =>
      val (l, p, s) = (r.getAs[Long]("lvl"), r.getAs[Long]("n_parts"),
        r.getAs[Long]("n_supps"))
      // bipartite: even levels are parts only, odd levels suppliers only
      if (l % 2 == 0) assert(s === 0L, s"level $l has suppliers")
      else assert(p === 0L, s"level $l has parts")
    }
    // seed level is exactly one part; discovered set bounded by universe
    assert(lv.head.getAs[Long]("n_parts") === 1L)
    val li = graft.sources.Tables(spark, sf).lineitem
    val nParts = li.select(col("l_partkey")).distinct().count()
    val nSupps = li.select(col("l_suppkey")).distinct().count()
    assert(lv.map(_.getAs[Long]("n_parts")).sum <= nParts)
    assert(lv.map(_.getAs[Long]("n_supps")).sum <= nSupps)
  }

  test("F20: STL components reconstruct the series exactly; trend is spike-immune") {
    val stl = TimeSeriesQueries.qStlDecompose(spark, sf).collect()
    assert(stl.nonEmpty)
    // exact reconstruction: r = trend + seasonal + residual, per row
    stl.foreach { r =>
      assert(r.getAs[Long]("revenue_cents") ===
        r.getAs[Long]("trend") + r.getAs[Long]("seasonal") +
          r.getAs[Long]("residual"))
    }
    // robustness: the windowed MEDIAN trend of a locally-spiked
    // series equals the unspiked trend away from the spike's window
    val vals = stl.map(_.getAs[Long]("revenue_cents"))
    def trendOf(v: Array[Long]): Array[Long] = v.indices.map { i =>
      val w = v.slice(math.max(0, i - 3), math.min(v.length, i + 4)).sorted
      w((w.length + 1) / 2 - 1)
    }.toArray
    val spiked = vals.updated(vals.length / 2, vals(vals.length / 2) * 1000L)
    val (t0, t1) = (trendOf(vals), trendOf(spiked))
    val changed = t0.indices.count(i => t0(i) != t1(i))
    assert(changed <= 7, s"a single spike moved $changed trend points (window is 7)")
  }

  test("E23: assortativity moments are symmetric and corr2 is a valid ppm") {
    val r = AnalyticsQueries.qAssortativity(spark, sf).collect()(0)
    val m = r.getAs[Long]("m")
    assert(m > 0L && m % 2 == 0L, "both orientations of every edge")
    // symmetry of the doubled edge list: den_x == den_y (gated as
    // BIGINT since r14 — hash-stable across engines)
    assert(r.getAs[Long]("den_x") === r.getAs[Long]("den_y"))
    val c2 = r.getAs[Long]("corr2_ppm")
    assert(c2 >= -1000000L && c2 <= 1000000L, s"corr2_ppm $c2 out of range")
  }

  test("F21: TWAP is bounded by the day's value range and weights durations") {
    import org.apache.spark.sql.expressions.Window
    val tw = TimeSeriesQueries.qTwap(spark, sf).collect()
    assert(tw.nonEmpty)
    // twap lies within [min, max] cents of the contributing rows
    val ev = graft.sources.Tables(spark, sf).events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type"), col("d"))
      .orderBy(col("us"), col("event_id"))
    val rng = ev.withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .groupBy(col("event_type"), col("d"))
      .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    tw.foreach { r =>
      val (lo, hi) = rng((r.getString(0), r.getDate(1).toString))
      val t = r.getAs[Long]("twap_milli")
      assert(t >= lo * 1000 - 1000 && t <= hi * 1000 + 1000,
        s"twap $t outside day range [$lo, $hi] cents")
    }
  }

  test("E24: clustering coefficient is a valid ppm and zero-triangle nodes read 0") {
    val cc = AnalyticsQueries.qClusteringCoef(spark, sf).collect()
    cc.foreach { r =>
      val (d, t, c) = (r.getAs[Long]("deg"), r.getAs[Long]("tri"),
        r.getAs[Long]("cc_ppm"))
      assert(d >= 3L)
      assert(c >= 0L && c <= 1000000L, s"cc_ppm $c out of [0, 1e6]")
      assert(2 * t <= d * (d - 1), "more triangles than neighbour pairs")
      if (t == 0L) assert(c === 0L)
    }
  }

  test("C88: entropy histogram tiles the corpus; a one-token doc reads 0 bits") {
    val hist = CorpusQueries.qTokenEntropy(spark, sf).collect()
    val nDocs = graft.sources.Tables(spark, sf).documents.count()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === nDocs)
    hist.foreach { r =>
      val b = r.getAs[Long]("h_bits")
      assert(b >= 0L && b <= 20L, s"h_bits $b out of a sane range")
    }
    // elog identity: a document of T copies of one token has
    // H8 = elog(T) - (T * elog(T)) div T = 0 exactly
    def elog(x: Long): Long = {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val mant = if (len - 1 >= 3) x >> (len - 4) else x << (4 - len)
      8L * (len - 1) + mant - 8L
    }
    (1L to 64L).foreach { t =>
      assert(elog(t) - (t * elog(t)) / t === 0L, s"uniform doc T=$t not 0 bits")
    }
  }
}
