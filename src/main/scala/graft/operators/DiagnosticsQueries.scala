package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** G-block: engine-diagnostics and distributed-primitive operators —
  * the queries an engine operator (or the engine itself) runs to
  * understand and plan over the data: join-key skew profiling,
  * sketch-based join-cardinality estimation (optimizer statistics),
  * a distributed prefix-scan (the primitive behind watermark/lateness
  * audits), robust dispersion statistics, and equi-depth binning.
  * All integer-exact (or exact-value + deterministic-gate) so every
  * query carries a DuckDB oracle.
  */
object DiagnosticsQueries {

  /** G1: join-key skew profile — the diagnostic run before choosing a
    * skew strategy (salt? AQE? broadcast?): per-key counts of the
    * fact table's join key, top-15 hottest keys with their corpus
    * share and hot-vs-mean ratio in exact ppm. One fact-sized
    * aggregate + a one-row totals broadcast + a tiny top-k — the
    * profile costs one linear pass at any scale.
    */
  def qKeySkew(spark: SparkSession, dir: String): DataFrame = {
    val cnts = Tables(spark, dir).lineitem
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val tot = broadcast(cnts.agg(
      count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows")))
    cnts.crossJoin(tot)
      .select(col("l_partkey"), col("cnt"),
        expr("cnt * 1000000 div n_rows").as("share_ppm"),
        expr("cnt * n_keys * 1000000 div n_rows").as("vs_mean_ppm"))
      .orderBy(col("cnt").desc, col("l_partkey"))
      .limit(15)
  }

  /** G2: sketch-based join-cardinality estimation — the optimizer
    * statistic: |A join B| estimated as the CMS inner product
    * (min over rows of the counter dot product, Cormode &
    * Muthukrishnan 2005 §4.2), here for the self-join on l_partkey
    * (= sum of squared key counts, the statistic that costs a
    * fact-fact join). The estimate is >= exact BY CONSTRUCTION
    * (every true pair collides with itself in every row) and
    * overshoots by ~N²/width per row in expectation; the oracle
    * gates both sides (B9b accuracy-gate pattern — the exact value
    * is replayed in SQL, the deterministic sketch properties are
    * asserted as booleans). Scale shape: ONE linear sketch pass +
    * one per-key aggregate for the exact twin; at 100 TB only the
    * sketch pass runs (the exact side here exists to gate it) and
    * the estimate costs a 512 KiB-binary dot product on the driver.
    */
  def qJoinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables(spark, dir).lineitem.select(col("l_partkey"))
    val sk = keys.agg(
      graft.functions.cms_sketch(col("l_partkey"), 4, 14).as("sk"),
      count(lit(1)).as("n_rows"))
    val exact = keys.groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_pairs"),
        count(lit(1)).as("n_keys"))
    val est = graft.functions.cms_inner(col("sk"), col("sk"))
    broadcast(sk).crossJoin(exact)
      .select(col("n_rows"), col("n_keys"), col("exact_pairs"),
        (est >= col("exact_pairs")).as("est_ge_exact"),
        (est <= col("exact_pairs") +
          expr("8 * (n_rows * n_rows div 16384)") + lit(1L))
          .as("est_within_bound"))
  }

  /** G3: event-time lateness audit (distributed prefix scan) — how
    * late do events arrive relative to the high-water mark, the
    * number a streaming watermark is tuned from. Arrival order here
    * is a per-user backfill replay ((user_id, event_id) — files
    * landed per user, replayed in user order), which makes lateness
    * real: a later user's early events arrive far behind the global
    * high-water mark. The running max over arrival order is a PREFIX
    * SCAN, computed distributedly (never a single-partition global
    * window): range-repartition on the arrival key, per-partition max
    * aggregated into a partition-count-sized frame, exclusive prefix
    * max over that tiny frame, broadcast back as each partition's
    * offset, then an in-partition running max — the textbook
    * two-phase scan, all partitions working in parallel at any scale.
    * Result is partitioning-invariant (the oracle replays it as one
    * global window).
    *
    * Partition stability is BY CONSTRUCTION, not by planner courtesy:
    * the range exchange is planned ONCE (`.rdd` freezes the physical
    * plan into a single RDD lineage), the per-partition max pass and
    * the offset-seeded scan pass both read that one materialized
    * shuffle output (map-output reuse across jobs on the same
    * ShuffleDependency), so the two phases cannot see different
    * partitionings. This replaced an earlier two-plan-branch form
    * whose correctness rode on ReuseExchange deduping two identical
    * range exchanges — a dependency whose PlanShapeSpec tripwire
    * fired (6 distinct exchanges) in round 7. The per-partition max
    * collect is 32 longs (partition-count-sized, never data-sized);
    * the construction-time job makes this an eagerQueries member,
    * same contract as qPpsSample's prefix sum.
    */
  def qLatenessAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parts = Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .repartitionByRange(32, col("user_id"), col("event_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .as[(Long, Long, Long)].rdd
    // phase 1: ONE long per partition to the driver (32 values)
    val partMax = parts.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue
      it.foreach(t => if (t._3 > m) m = t._3)
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    // exclusive prefix max: partition i's seed = max over partitions < i
    val bcPre = spark.sparkContext.broadcast(
      partMax.scanLeft(Long.MinValue)(math.max))
    // phase 2: offset-seeded in-partition running max, all parallel
    val late = parts.mapPartitionsWithIndex { (i, it) =>
      var run = bcPre.value(i)
      it.map { case (_, _, us) =>
        if (us > run) run = us
        run - us
      }
    }.toDF("late")
    late
      .withColumn("bucket",
        when(col("late") === 0L, "a_on_time")
          .when(col("late") <= 60L * 1000000L, "b_le_1m")
          .when(col("late") <= 3600L * 1000000L, "c_le_1h")
          .when(col("late") <= 86400L * 1000000L, "d_le_1d")
          .otherwise("e_gt_1d"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_events"), max(col("late")).as("max_lateness_us"))
      .orderBy(col("bucket"))
  }

  /** G4: robust dispersion statistics — per-event-type exact median
    * and MAD (median absolute deviation), the outlier-resistant
    * center/spread pair a data-quality monitor tracks. Both medians
    * computed exactly by the rank trick: row_number + count, sum the
    * middle one-or-two values, keep everything doubled (med2x) /
    * quadrupled (mad4x) so no division ever happens — integer-exact
    * in any engine. ONE fact shuffle total (groupByKey on
    * event_type), then ONE in-task pass per group computes both
    * medians: sort the group's cents, take the middles, derive the
    * absolute deviations, sort those, take the middles again. The
    * per-group buffer is exactly what a Window operator with an
    * unbounded frame would hold for the same group — identical
    * memory posture, but one pass instead of the four buffering
    * window passes (rank, count, median-sum, deviation-rank) the
    * declarative form needs because the median must join back to
    * every row before the MAD sort (measured: 1.13s two-scan-plus-
    * join -> 0.93s stacked-windows -> 0.45s this shape at sf0.1).
    * Per-group parallelism at any scale, like the windows.
    */
  def qRobustStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables(spark, dir).events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
      .as[(String, Long, Long)]
    ev.groupByKey(_._1).mapGroups { (k, it) =>
      val buf = it.map(t => (t._2, t._3)).toArray
      // event_id tiebreak keeps the in-group order total (it cannot
      // change either median VALUE, but keeps the scan deterministic)
      java.util.Arrays.sort(buf, Ordering.Tuple2[Long, Long])
      val n = buf.length
      def mid2x(a: Array[Long]): Long =
        if (n % 2 == 1) 2L * a((n + 1) / 2 - 1)
        else a(n / 2 - 1) + a(n / 2)
      val cents = buf.map(_._1)
      val med2x = mid2x(cents)
      val devs = cents.map(c => math.abs(2L * c - med2x)).sorted
      (k, n.toLong, med2x, mid2x(devs))
    }.toDF("event_type", "n", "med2x", "mad4x")
      .orderBy(col("event_type"))
  }

  /** G5: equi-depth binning (feature discretization) — cut each
    * event-type's value distribution into 8 equal-population bins
    * (the quantile-bucketing step before feature crossing /
    * monotonic-model input), reporting each bin's population and
    * exact cent bounds. ntile over a per-group window with a total
    * tiebreak — per-group parallelism, engine-identical semantics.
    */
  def qEquidepthBins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    Tables(spark, dir).events
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"), col("event_id"))
      .withColumn("bin", ntile(8).over(w).cast("long"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy(col("event_type"), col("bin"))
  }

  /** G6: robust anomaly flag — daily revenue days more than 3 MADs
    * from the series median (the robust twin of F2's 3-sigma flag: a
    * handful of genuine spikes inflate a sigma and mask each other,
    * but barely move a median/MAD). Both medians come from the G4
    * rank trick on the DAY-level aggregate (the F2 precedent: ordered
    * windows run over the day frame, never the fact table — the day
    * frame is calendar-bounded at any corpus size), and the flag
    * |x − med| > 3·MAD is compared as 2·dev2x > 3·mad4x — division-
    * free integer arithmetic, exact in any engine.
    */
  def qRobustAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir).orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("r"))
    def med2xOf(df: DataFrame, valueCol: String, out: String): DataFrame =
      df.withColumn("rn", row_number().over(
          Window.orderBy(col(valueCol), col("d"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .filter(col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("n div 2 + 1"))
        .agg(sum(col(valueCol) *
          when(col("n") % 2 === 1, 2L).otherwise(1L)).as(out))
    val med = med2xOf(daily, "r", "med2x")
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("dev2x", abs(col("r") * 2 - col("med2x")))
    val mad = med2xOf(dev.select(col("d"), col("dev2x")), "dev2x", "mad4x")
    dev.crossJoin(broadcast(mad))
      .select(col("d"), col("r").as("revenue_cents"), col("dev2x"),
        (col("dev2x") * 2 > col("mad4x") * 3).cast("long").as("is_outlier"))
      .orderBy(col("d"))
  }

  /** G8: temporal stats-drift monitor — the week-over-week column
    * profile a long-running ingest alerts on: per event_type, the
    * first half of the event window vs the second (cut at the exact
    * micros midpoint, a data-derived constant both engines compute
    * identically), comparing row count, distinct-user reach, and
    * exact milli-cent mean. All ratios in truncated ppm/milli so the
    * frame replays bit-exactly. Plan: one fact scan → one
    * (event_type, half, user) collapse (map-side combined — the only
    * fact-sized shuffle) → a 25-row pivot; per-type parallelism at
    * any scale. The drift twin of C62 (which monitors SPLIT
    * composition; this monitors the time axis).
    */
  def qStatsDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts")).as("us"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val halves = ev.crossJoin(broadcast(mid))
      .withColumn("h", when(col("us") < col("mid"), "a").otherwise("b"))
      .groupBy(col("event_type"), col("h"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .groupBy(col("event_type"), col("h"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("users"),
        sum(col("c")).as("cents"))
    halves.groupBy(col("event_type"))
      .agg(
        sum(when(col("h") === "a", col("n"))).as("n_a"),
        sum(when(col("h") === "b", col("n"))).as("n_b"),
        sum(when(col("h") === "a", col("users"))).as("users_a"),
        sum(when(col("h") === "b", col("users"))).as("users_b"),
        sum(when(col("h") === "a", col("cents"))).as("c_a"),
        sum(when(col("h") === "b", col("cents"))).as("c_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("users_a"), col("users_b"),
        expr("c_a * 1000 div n_a").as("mean_milli_a"),
        expr("c_b * 1000 div n_b").as("mean_milli_b"),
        expr("n_b * 1000000 div n_a").as("n_ratio_ppm"),
        expr("c_b * 1000 div n_b - c_a * 1000 div n_a").as("mean_delta_milli"))
      .orderBy(col("event_type"))
  }

  /** G9: two-sample Kolmogorov–Smirnov drift per source — the
    * distribution-shape complement of G8's moment drift: each
    * document source's length (n_chars) ECDF is compared against the
    * REST of the corpus, D = max_v |F_s(v) − F_rest(v)|, reported in
    * exact ppm via integer cross-multiplication
    * (|cum_s·n_rest − cum_rest·n_s| needs no division until the final
    * scaled one). The evaluation grid is distinct-values × sources —
    * bounded by the value DOMAIN (doc-length range) times the source
    * count, never by corpus size — so the only fact-sized work is the
    * (source, value) count aggregate; everything after runs on the
    * grid. The ingest-governance use: a source whose length
    * distribution drifts from the corpus (truncation bug, boilerplate
    * injection) fires here even when its mean stays flat.
    */
  def qKsDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents.select(col("source"), col("n_chars"))
    val cnts = docs.groupBy(col("source"), col("n_chars")).agg(count(lit(1)).as("c"))
    val vals = docs.select(col("n_chars")).distinct()
    val bySrc = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val tot = broadcast(docs.agg(count(lit(1)).as("n_tot")))
    val gcum = Window.orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // per-value global counts, cumulated over the bounded value grid
    val globalCum = docs.groupBy(col("n_chars")).agg(count(lit(1)).as("g"))
      .withColumn("cum_g", sum(col("g")).over(gcum)).drop("g")
    val scum = Window.partitionBy(col("source")).orderBy(col("n_chars"))
      .rowsBetween(Window.unboundedPreceding, 0)
    vals.crossJoin(broadcast(bySrc))
      .join(cnts, Seq("source", "n_chars"), "left")
      .withColumn("cum_s", sum(coalesce(col("c"), lit(0L))).over(scum))
      .join(broadcast(globalCum), Seq("n_chars"))
      .crossJoin(tot)
      .select(col("source"), col("n_s"), (col("n_tot") - col("n_s")).as("n_rest"),
        // decimal(38,0) headroom: cum·n cross-products overflow Long
        // past ~10^6-10^7 rows per side (the qAssortativity lesson) —
        // Spark (non-ANSI) would wrap silently while the DuckDB
        // oracle raises, so the claim of exactness at scale needs the
        // wide type on BOTH sides of the parity gate.
        abs(col("cum_s").cast("decimal(38,0)")
            * (col("n_tot") - col("n_s")).cast("decimal(38,0)") -
          (col("cum_g") - col("cum_s")).cast("decimal(38,0)")
            * col("n_s").cast("decimal(38,0)")).as("d_num"))
      .groupBy(col("source"), col("n_s"), col("n_rest"))
      .agg(max(col("d_num")).as("d_max"))
      .select(col("source"), col("n_s"), col("n_rest"),
        expr("cast(d_max * 1000000 div (cast(n_s as decimal(38,0)) " +
          "* cast(n_rest as decimal(38,0))) as bigint)").as("ks_ppm"))
      .orderBy(col("source"))
  }

  /** The reusable two-sample KS kernel behind G9 and the A34
    * streaming drift monitor: `a` and `b` are per-value count frames
    * (v: long, c: long); returns ONE row (n_a, n_b, ks_ppm) with
    * D in exact ppm by the same integer cross-multiplication as
    * [[qKsDrift]]. The grid is the union of both samples' distinct
    * values — bounded by the value domain; the cumsum window runs
    * over that bounded grid.
    */
  def ksStat(a: DataFrame, b: DataFrame): DataFrame = {
    val g = a.select(col("v"), col("c").as("ca"))
      .join(b.select(col("v"), col("c").as("cb")), Seq("v"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val tot = broadcast(g.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b")))
    val w = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
    g.withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .crossJoin(tot)
      .select(col("n_a"), col("n_b"),
        // same decimal(38,0) headroom as qKsDrift: exact at any scale
        abs(col("cum_a").cast("decimal(38,0)") * col("n_b").cast("decimal(38,0)")
          - col("cum_b").cast("decimal(38,0)") * col("n_a").cast("decimal(38,0)"))
          .as("dn"))
      .groupBy(col("n_a"), col("n_b")).agg(max(col("dn")).as("d"))
      .select(col("n_a"), col("n_b"),
        expr("cast(d * 1000000 div (cast(n_a as decimal(38,0)) " +
          "* cast(n_b as decimal(38,0))) as bigint)").as("ks_ppm"))
  }

  /** G10: mutual information between a categorical and a bucketed
    * numeric column (event_type × $25 value bucket) — the feature-
    * relevance statistic a feature-selection pass computes per
    * candidate column pair. Per-cell pointwise contribution in
    * fixed-point eighth-bits: lift_e8 = elog(n_xy·N) − elog(n_x·n_y)
    * ≈ 8·log2(P(x,y)/(P(x)P(y))) — pure integer arithmetic (the C69
    * elog kernel), so both engines agree bit-exactly; MI itself is
    * Σ n_xy·lift_e8 / (8N) bits, recoverable from the emitted cells.
    * Shape: one fact-sized (x, bucket) count, two grid-sized marginal
    * aggregates joined back broadcast — cells are bounded by
    * |types| × |buckets|, never corpus size.
    */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusQueries.sparkElog
    val ev = Tables(spark, dir).events.select(col("event_type"),
      expr("cast(round(value * 100) as bigint) div 2500").as("vbucket"))
    val cells = ev.groupBy(col("event_type"), col("vbucket"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy(col("event_type")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("vbucket")).agg(sum(col("n_xy")).as("n_y"))
    val tot = broadcast(cells.agg(sum(col("n_xy")).as("n_tot")))
    cells.join(broadcast(mx), Seq("event_type"))
      .join(broadcast(my), Seq("vbucket"))
      .crossJoin(tot)
      .withColumn("pnum", col("n_xy") * col("n_tot"))
      .withColumn("pden", col("n_x") * col("n_y"))
      .select(col("event_type"), col("vbucket"), col("n_xy"),
        (expr(sparkElog("pnum")) - expr(sparkElog("pden"))).as("lift_e8"))
      .orderBy(col("event_type"), col("vbucket"))
  }

  /** G11: Pearson chi-squared contingency audit of the source×lang
    * table — the categorical-independence sibling of G10's mutual
    * information (MI measures shared bits; chi² gives the classical
    * test statistic a drift monitor thresholds against). Zero cells
    * are REAL cells here (O=0 still contributes E = R·C/N), so the
    * grid is the full margin cross product, not just observed pairs.
    * Per-cell term = (O·N − R·C)²·1000 / (R·C·N), an exact rational
    * whose cross-products run in decimal(38,0)/HUGEINT — at 100 TB
    * O·N ≈ 1e12·1e12 is far past BIGINT before the cells are. The
    * corpus pass is one (source, lang) count; everything downstream
    * is margin-bounded (sources × langs rows).
    */
  def qChi2Contingency(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir).documents
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
    val rmarg = cells.groupBy(col("source")).agg(sum(col("o")).as("r"))
    val cmarg = cells.groupBy(col("lang")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("nn"))
    rmarg.crossJoin(broadcast(cmarg))
      .join(cells, Seq("source", "lang"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("o0", coalesce(col("o"), lit(0L)))
      .withColumn("dev",
        expr("CAST(o0 AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c"))
      .withColumn("term_milli",
        expr("CAST((dev * dev * 1000) div (CAST(r AS DECIMAL(38,0)) * c * nn) AS BIGINT)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_cells"), sum(col("o0")).as("n_docs"),
        sum(col("term_milli")).as("chi2_milli"))
      .orderBy(col("source"))
  }

  /** G12: hash-partition balance audit — simulate the 32-way hash
    * exchange each candidate join/agg key would produce and report
    * its balance (max-bucket share vs the uniform ideal, in ppm of
    * ideal). G1 ranks hot KEYS; this measures the EXCHANGE those
    * keys produce — the number that actually predicts a straggler
    * task. Buckets come from md5 (engine-portable, unlike either
    * engine's internal hash), so Spark and DuckDB agree exactly and
    * the audit is reproducible anywhere. One map + 32-row aggregate
    * per audited key; output is keys × 1 rows.
    */
  def qPartitionBalance(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // bucket = first 8 md5 hex chars mod 32 — identical in DuckDB as
    // (('0x' || substr(md5(k),1,8))::BIGINT % 32)
    def buckets(df: org.apache.spark.sql.DataFrame, key: String, name: String) =
      df.select(col(key).cast("string").as("k"))
        .select(pmod(conv(substring(md5(col("k")), 1, 8), 16, 10).cast("long"),
          lit(32L)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_rows"),
          max(col("n")).as("max_bucket"), min(col("n")).as("min_bucket"))
        .select(lit(name).as("audit_key"), col("n_buckets"), col("n_rows"),
          col("max_bucket"), col("min_bucket"),
          expr("max_bucket * 32 * 1000000 div n_rows").as("max_vs_ideal_ppm"))
    buckets(t.orders, "o_custkey", "orders.o_custkey")
      .unionAll(buckets(t.lineitem, "l_partkey", "lineitem.l_partkey"))
      .unionAll(buckets(t.events, "user_id", "events.user_id"))
      .orderBy(col("audit_key"))
  }

  /** G13: population stability index (PSI) drift — the classical
    * risk-model drift score next to G9's KS (KS reads the worst
    * single point of the ECDF gap; PSI reads the whole distribution
    * reshape and is what model-governance thresholds are written
    * against, conventionally 0.1/0.25). Reference = the frozen
    * src0-4 n_chars distribution (the A34 convention); each source
    * scores against it over fixed $100-width buckets with Laplace
    * +1 smoothing on the shared bucket grid (PSI is undefined on
    * zero cells). Each term (p−q)(log p − log q) is rewritten as
    * (c·Nr − r·Ns)·(elog(c·Nr) − elog(r·Ns)) / (8·Ns·Nr) — the two
    * factors always share sign, so every term is ≥ 0 and the whole
    * statistic is exact-integer in eighth-bit units (the C69 elog
    * kernel). Scale bound, stated honestly: the cross-products
    * c·Nr / r·Ns are computed in BIGINT because the elog kernel
    * reads bit-length + top nibble via bin()/shifts, which Spark
    * only defines on longs — so the formulation holds while
    * Ns·Nr < 2⁶³ (≈3·10⁹ rows on EACH side simultaneously). Past
    * that, coarsen the bucket width or score against a fixed-size
    * reference sample (both preserve PSI's governance thresholds);
    * only the (cn−rn) difference and the final div run in
    * decimal(38,0), which they must (the difference of two ~2⁶²
    * products can cancel catastrophically in floating point, never
    * in exact decimal). One fact-sized
    * (source, bucket) count; the grid is sources × value-domain
    * buckets (PlanShape-allowlisted, domain-bounded).
    */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CorpusQueries.sparkElog
    val d = Tables(spark, dir).documents
      .select(col("source"), expr("n_chars div 100").as("bkt"))
    val refCnt = d.filter(col("source").isin("src0", "src1", "src2", "src3", "src4"))
      .groupBy(col("bkt")).agg(count(lit(1)).as("r"))
    val srcCnt = d.groupBy(col("source"), col("bkt")).agg(count(lit(1)).as("c"))
    val grid = d.select(col("source")).distinct()
      .crossJoin(broadcast(d.select(col("bkt")).distinct()))
    val cells = grid
      .join(srcCnt, Seq("source", "bkt"), "left")
      .join(broadcast(refCnt), Seq("bkt"), "left")
      .select(col("source"),
        (coalesce(col("c"), lit(0L)) + 1L).as("cs"),
        (coalesce(col("r"), lit(0L)) + 1L).as("rs"))
    val margins = cells.groupBy(col("source"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("cs")).as("ns"),
        sum(col("rs")).as("nr"))
    cells.join(margins, Seq("source"))
      .withColumn("cn", expr("cs * nr")).withColumn("rn", expr("rs * ns"))
      .withColumn("term",
        expr(s"""(CAST(cn - rn AS DECIMAL(38,0))
                 | * (${sparkElog("cn")} - ${sparkElog("rn")})
                 | * 1000) div (8 * CAST(ns AS DECIMAL(38,0)) * nr)""".stripMargin))
      .groupBy(col("source"))
      .agg(first(col("ns")).as("n_smoothed"), first(col("n_buckets")).as("n_buckets"),
        sum(col("term")).cast("long").as("psi_milli_ebits"))
      .orderBy(col("source"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_psi_drift"         -> (qPsiDrift _),
    "q_partition_balance" -> (qPartitionBalance _),
    "q_chi2_contingency" -> (qChi2Contingency _),
    "q_ks_drift"       -> (qKsDrift _),
    "q_mutual_info"    -> (qMutualInfo _),
    "q_stats_drift"    -> (qStatsDrift _),
    "q_robust_anomaly" -> (qRobustAnomaly _),
    "q_key_skew"       -> (qKeySkew _),
    "q_join_size_est"  -> (qJoinSizeEst _),
    "q_lateness_audit" -> (qLatenessAudit _),
    "q_robust_stats"   -> (qRobustStats _),
    "q_equidepth_bins" -> (qEquidepthBins _),
  )

  val oracles: Map[String, String] = {
    import graft.operators.CorpusQueries.duckElog
    Map(
    "q_psi_drift" ->
      s"""WITH d AS (SELECT source, n_chars // 100 AS bkt FROM documents),
         |ref AS (SELECT bkt, CAST(count(*) AS BIGINT) AS r FROM d
         |        WHERE source IN ('src0','src1','src2','src3','src4')
         |        GROUP BY 1),
         |sc AS (SELECT source, bkt, CAST(count(*) AS BIGINT) AS c
         |       FROM d GROUP BY 1, 2),
         |grid AS (SELECT s.source, b.bkt
         |         FROM (SELECT DISTINCT source FROM d) s
         |         CROSS JOIN (SELECT DISTINCT bkt FROM d) b),
         |cells AS (SELECT g.source,
         |            COALESCE(sc.c, 0) + 1 AS cs, COALESCE(ref.r, 0) + 1 AS rs
         |          FROM grid g
         |            LEFT JOIN sc ON sc.source = g.source AND sc.bkt = g.bkt
         |            LEFT JOIN ref ON ref.bkt = g.bkt),
         |m AS (SELECT source, CAST(count(*) AS BIGINT) AS n_buckets,
         |        CAST(sum(cs) AS BIGINT) AS ns, CAST(sum(rs) AS BIGINT) AS nr
         |      FROM cells GROUP BY 1),
         |prod AS (SELECT c.source, m.ns, m.nr, m.n_buckets,
         |           CAST(c.cs * m.nr AS BIGINT) AS cn,
         |           CAST(c.rs * m.ns AS BIGINT) AS rn
         |         FROM cells c JOIN m ON c.source = m.source),
         |t AS (SELECT source, ns, n_buckets,
         |        (CAST(cn - rn AS HUGEINT)
         |          * (${duckElog("cn")} - ${duckElog("rn")})
         |          * 1000) // (8 * CAST(ns AS HUGEINT) * nr) AS term
         |      FROM prod)
         |SELECT source, CAST(min(ns) AS BIGINT) AS n_smoothed,
         |  CAST(min(n_buckets) AS BIGINT) AS n_buckets,
         |  CAST(sum(term) AS BIGINT) AS psi_milli_ebits
         |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "q_partition_balance" ->
      """WITH src AS (
        |  SELECT 'orders.o_custkey' AS audit_key,
        |    CAST(o_custkey AS VARCHAR) AS k FROM orders
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        |  UNION ALL
        |  SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events),
        |bk AS (SELECT audit_key,
        |         CAST(('0x' || substr(md5(k), 1, 8)) AS BIGINT) % 32 AS b,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM src GROUP BY 1, 2)
        |SELECT audit_key, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(max(n) AS BIGINT) AS max_bucket,
        |  CAST(min(n) AS BIGINT) AS min_bucket,
        |  CAST(max(n) * 32 * 1000000 // sum(n) AS BIGINT) AS max_vs_ideal_ppm
        |FROM bk GROUP BY audit_key ORDER BY audit_key""".stripMargin,

    "q_chi2_contingency" ->
      """WITH cells AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
        |               FROM documents GROUP BY 1, 2),
        |rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM cells),
        |grid AS (SELECT rm.source, cm.lang, rm.r, cm.c, tot.nn,
        |           COALESCE(cells.o, 0) AS o0
        |         FROM rm CROSS JOIN cm CROSS JOIN tot
        |           LEFT JOIN cells ON cells.source = rm.source
        |             AND cells.lang = cm.lang),
        |terms AS (SELECT source, o0,
        |            CAST(((CAST(o0 AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
        |                * (CAST(o0 AS HUGEINT) * nn - CAST(r AS HUGEINT) * c)
        |                * 1000)
        |              // (CAST(r AS HUGEINT) * c * nn) AS BIGINT) AS term_milli
        |          FROM grid)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(o0) AS BIGINT) AS n_docs,
        |  CAST(sum(term_milli) AS BIGINT) AS chi2_milli
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,

    // the A34 streamed drift monitor (DriftMonitorStream, query
    // registered in StreamQueries) must equal the batch KS of each
    // cumulative arrival prefix vs the frozen src0-4 reference —
    // batch 0 = odd doc_ids, batch 1 = everything
    "q_stream_drift" ->
      """WITH ref AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE source IN ('src0','src1','src2','src3','src4')
        |  GROUP BY 1),
        |bids AS (SELECT * FROM (VALUES (0), (1)) t(batch_id)),
        |cum AS (SELECT batch_id, n_chars AS v, CAST(count(*) AS BIGINT) AS ca
        |        FROM bids, documents WHERE batch_id = 1 OR doc_id % 2 = 1
        |        GROUP BY 1, 2),
        |vals AS (SELECT v FROM cum UNION SELECT v FROM ref),
        |grid AS (SELECT b.batch_id, va.v,
        |           coalesce(c.ca, 0) AS ca, coalesce(r.c, 0) AS cb
        |         FROM bids b CROSS JOIN (SELECT DISTINCT v FROM vals) va
        |           LEFT JOIN cum c ON c.batch_id = b.batch_id AND c.v = va.v
        |           LEFT JOIN ref r ON r.v = va.v),
        |cs AS (SELECT batch_id, v, ca, cb,
        |         CAST(sum(ca) OVER (PARTITION BY batch_id ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |         CAST(sum(cb) OVER (PARTITION BY batch_id ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        |       FROM grid),
        |tot AS (SELECT batch_id, max(cum_a) AS n_a, max(cum_b) AS n_b
        |        FROM cs GROUP BY 1)
        |SELECT CAST(t.batch_id AS BIGINT) AS batch_id,
        |  CAST(n_a AS BIGINT) AS n_cum, CAST(n_b AS BIGINT) AS n_ref,
        |  CAST(max(abs(CAST(cum_a AS HUGEINT) * n_b - CAST(cum_b AS HUGEINT) * n_a)) * 1000000
        |    // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS ks_ppm
        |FROM cs JOIN tot t USING (batch_id)
        |GROUP BY t.batch_id, n_a, n_b
        |ORDER BY batch_id""".stripMargin,

    "q_ks_drift" ->
      """WITH d AS (SELECT source, n_chars FROM documents),
        |cnts AS (SELECT source, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
        |vals AS (SELECT DISTINCT n_chars FROM d),
        |bysrc AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
        |tot AS (SELECT count(*) AS n_tot FROM d),
        |gcum AS (SELECT n_chars, CAST(sum(count(*)) OVER (ORDER BY n_chars
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_g
        |         FROM d GROUP BY n_chars),
        |grid AS (SELECT b.source, b.n_s, v.n_chars,
        |           CAST(sum(coalesce(c.c, 0)) OVER (PARTITION BY b.source
        |             ORDER BY v.n_chars
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_s
        |         FROM vals v CROSS JOIN bysrc b
        |           LEFT JOIN cnts c ON c.source = b.source AND c.n_chars = v.n_chars)
        |SELECT source, CAST(n_s AS BIGINT) AS n_s,
        |  CAST(n_tot - n_s AS BIGINT) AS n_rest,
        |  CAST(max(abs(CAST(cum_s AS HUGEINT) * (n_tot - n_s)
        |      - CAST(cum_g - cum_s AS HUGEINT) * n_s))
        |    * 1000000 // (CAST(n_s AS HUGEINT) * (n_tot - n_s)) AS BIGINT) AS ks_ppm
        |FROM grid JOIN gcum USING (n_chars), tot
        |GROUP BY source, n_s, n_tot
        |ORDER BY source""".stripMargin,

    "q_mutual_info" -> {
      import graft.operators.CorpusQueries.duckElog
      s"""WITH ev AS (SELECT event_type,
         |    CAST(round(value * 100) AS BIGINT) // 2500 AS vbucket FROM events),
         |cells AS (SELECT event_type, vbucket, CAST(count(*) AS BIGINT) AS n_xy
         |          FROM ev GROUP BY 1, 2),
         |mx AS (SELECT event_type, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY 1),
         |my AS (SELECT vbucket, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n_tot FROM cells),
         |j AS (SELECT event_type, vbucket, n_xy,
         |        n_xy * n_tot AS pnum, n_x * n_y AS pden
         |      FROM cells JOIN mx USING (event_type) JOIN my USING (vbucket), tot)
         |SELECT event_type, vbucket, n_xy,
         |  CAST(${duckElog("pnum")} - ${duckElog("pden")} AS BIGINT) AS lift_e8
         |FROM j ORDER BY event_type, vbucket""".stripMargin
    },

    "q_stats_drift" ->
      """WITH ev AS (SELECT event_type, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents, epoch_us(ts) AS us
        |  FROM events),
        |mid AS (SELECT CAST((min(us) + max(us)) // 2 AS BIGINT) AS mid FROM ev),
        |lab AS (SELECT event_type, user_id, cents,
        |          CASE WHEN us < mid THEN 'a' ELSE 'b' END AS h FROM ev, mid),
        |pu AS (SELECT event_type, h, user_id, count(*) AS n, sum(cents) AS c
        |       FROM lab GROUP BY 1, 2, 3),
        |hv AS (SELECT event_type, h, CAST(sum(n) AS BIGINT) AS n,
        |         count(*) AS users, CAST(sum(c) AS BIGINT) AS cents
        |       FROM pu GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN h = 'a' THEN n END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN h = 'b' THEN n END) AS BIGINT) AS n_b,
        |  CAST(sum(CASE WHEN h = 'a' THEN users END) AS BIGINT) AS users_a,
        |  CAST(sum(CASE WHEN h = 'b' THEN users END) AS BIGINT) AS users_b,
        |  CAST(sum(CASE WHEN h = 'a' THEN cents END) * 1000
        |       // sum(CASE WHEN h = 'a' THEN n END) AS BIGINT) AS mean_milli_a,
        |  CAST(sum(CASE WHEN h = 'b' THEN cents END) * 1000
        |       // sum(CASE WHEN h = 'b' THEN n END) AS BIGINT) AS mean_milli_b,
        |  CAST(sum(CASE WHEN h = 'b' THEN n END) * 1000000
        |       // sum(CASE WHEN h = 'a' THEN n END) AS BIGINT) AS n_ratio_ppm,
        |  CAST(sum(CASE WHEN h = 'b' THEN cents END) * 1000
        |         // sum(CASE WHEN h = 'b' THEN n END)
        |       - sum(CASE WHEN h = 'a' THEN cents END) * 1000
        |         // sum(CASE WHEN h = 'a' THEN n END) AS BIGINT) AS mean_delta_milli
        |FROM hv GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_robust_anomaly" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |r1 AS (SELECT d, r, row_number() OVER (ORDER BY r, d) AS rn,
        |    count(*) OVER () AS n FROM daily),
        |med AS (SELECT CAST(sum(r * CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END)
        |    AS BIGINT) AS med2x
        |  FROM r1 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1),
        |dev AS (SELECT d, r, abs(r * 2 - med2x) AS dev2x
        |  FROM daily CROSS JOIN med),
        |r2 AS (SELECT d, dev2x, row_number() OVER (ORDER BY dev2x, d) AS rn,
        |    count(*) OVER () AS n FROM dev),
        |mad AS (SELECT CAST(sum(dev2x * CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END)
        |    AS BIGINT) AS mad4x
        |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1)
        |SELECT dev.d, dev.r AS revenue_cents, dev.dev2x,
        |  CAST(dev.dev2x * 2 > mad.mad4x * 3 AS BIGINT) AS is_outlier
        |FROM dev CROSS JOIN mad ORDER BY dev.d""".stripMargin,

    "q_key_skew" ->
      """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows FROM c)
        |SELECT l_partkey, cnt,
        |  cnt * 1000000 // n_rows AS share_ppm,
        |  cnt * n_keys * 1000000 // n_rows AS vs_mean_ppm
        |FROM c CROSS JOIN t
        |ORDER BY cnt DESC, l_partkey LIMIT 15""".stripMargin,

    "q_join_size_est" ->
      """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c * c) AS BIGINT) AS exact_pairs,
        |  true AS est_ge_exact, true AS est_within_bound
        |FROM c""".stripMargin,

    "q_lateness_audit" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |r AS (SELECT us, max(us) OVER (ORDER BY user_id, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - us AS late
        |  FROM e)
        |SELECT CASE WHEN late = 0 THEN 'a_on_time'
        |    WHEN late <= 60000000 THEN 'b_le_1m'
        |    WHEN late <= 3600000000 THEN 'c_le_1h'
        |    WHEN late <= 86400000000 THEN 'd_le_1d'
        |    ELSE 'e_gt_1d' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(late) AS BIGINT) AS max_lateness_us
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_robust_stats" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents, event_id FROM events),
        |r1 AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
        |med AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
        |    CAST(sum(cents * CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
        |      AS med2x
        |  FROM r1 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |  GROUP BY event_type),
        |d AS (SELECT e.event_type, abs(e.cents * 2 - m.med2x) AS dev2x,
        |    e.event_id
        |  FROM e JOIN med m ON e.event_type = m.event_type),
        |r2 AS (SELECT event_type, dev2x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev2x, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM d),
        |mad AS (SELECT event_type,
        |    CAST(sum(dev2x * CASE WHEN n % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
        |      AS mad4x
        |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
        |  GROUP BY event_type)
        |SELECT med.event_type, med.n, med.med2x, mad.mad4x
        |FROM med JOIN mad ON med.event_type = mad.event_type
        |ORDER BY med.event_type""".stripMargin,

    "q_equidepth_bins" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents, event_id FROM events),
        |b AS (SELECT event_type, cents,
        |    ntile(8) OVER (PARTITION BY event_type
        |      ORDER BY cents, event_id) AS bin FROM e)
        |SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n,
        |  min(cents) AS min_cents, max(cents) AS max_cents
        |FROM b GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin,
  )
  }
}
