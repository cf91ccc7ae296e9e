package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema + events/documents/
  * embeddings tables. One parquet file per table under `dir`.
  *
  * At cluster scale these would be partitioned/bucketed table paths;
  * the loaders are the single seam where that changes.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def load(name: String): DataFrame =
    Tables.loadCached(spark, s"$dir/$name.parquet")

  def region: DataFrame     = load("region")
  def nation: DataFrame     = load("nation")
  def customer: DataFrame   = load("customer")
  def supplier: DataFrame   = load("supplier")
  def part: DataFrame       = load("part")
  def orders: DataFrame     = load("orders")
  def lineitem: DataFrame   = load("lineitem")
  /** events.ts may be TIMESTAMP(NANOS) in parquet, which Spark's
    * vectorized reader rejects; with nanosAsLong it surfaces as a
    * LONG, truncated here to micros (matching DuckDB's ns->us cast,
    * floor division). A table already written at micros reads as a
    * plain timestamp and passes through — the loader serves both.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ rejects unix_micros & friends; session tz is UTC, so
        // the cast is instant-preserving
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame  = load("documents")
  def embeddings: DataFrame = load("embeddings")
}

object Tables {
  /** Per-(path, mtime) parquet schema cache: `spark.read.parquet`
    * without an explicit schema runs a footer-inference JOB on every
    * call — a fixed ~10 ms tax per table load that multiplies across
    * the 200-query surface and, at cluster scale, serializes on the
    * driver before any real work. The schema of a landed table is
    * immutable for a given mtime, so infer once and replay it with
    * `.schema(...)` (zero jobs) afterwards. Keyed by mtime so a
    * rewritten table re-infers.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Spread a frame that arrived as ONE scan split across the machine
    * before per-row-expensive map work (gram explodes, payload
    * hashing): a single small parquet file otherwise serializes the
    * whole map pass onto one core (the DerivedTable landed-layout
    * lesson). Guard is strictly ==1 — with even a few splits the
    * exchange is measured pure overhead (q_memorization: -22% at
    * sf0.1 single-split, +22% at 25x two-split). Plan-time partition
    * check, no job; a no-op at cluster scale where scans have many
    * splits.
    */
  private[graft] def spreadIfOneSplit(df: DataFrame): DataFrame = {
    val width = math.min(32, df.sparkSession.sparkContext.defaultParallelism)
    // Never probe .rdd on a frame whose plan already redistributes:
    // under AQE, materializing the RDD of a plan that contains an
    // exchange RUNS its query stages — a full eager pass billed at
    // construction and then repeated by the real action (the r16
    // nested-spread regression: dedup kernel entries re-spread a
    // frame their caller had already spread). Any node below also
    // means the rows leave the scan's split layout downstream, so the
    // one-split serialization this guard exists for cannot occur.
    import org.apache.spark.sql.catalyst.plans.logical._
    // ADVICE r16: Dataset.distinct()/dropDuplicates lower to
    // Deduplicate (not Distinct), and Except/Intersect also imply a
    // shuffle — all must be treated as already-redistributed or the
    // probe below would eagerly execute their shuffle under AQE (the
    // exact regression this guard fixed). KNOWN LIMITATION, accepted:
    // a broadcast-only Join keeps the streamed side's 1-split scan
    // layout, so a single-split frame behind one silently skips the
    // spread — perf-only, and no current call site passes a join
    // (they pass scan/project/filter/generate shapes).
    val redistributed = df.queryExecution.analyzed.exists {
      case _: RepartitionOperation | _: Join | _: Aggregate | _: Sort |
          _: Window | _: Distinct | _: Deduplicate | _: Except |
          _: Intersect | _: GlobalLimit => true
      case _ => false
    }
    if (redistributed) df
    else if (df.rdd.getNumPartitions == 1) df.repartition(width) else df
  }

  private[graft] def loadCached(spark: SparkSession, path: String): DataFrame = {
    // lastModified() == 0 means "not a local file we can fingerprint"
    // (scheme path, missing dir) — fall back to uncached inference
    // rather than serve a potentially-stale schema forever
    val mtime = new java.io.File(path).lastModified()
    if (mtime == 0L) spark.read.parquet(path)
    else {
      // bound the cache: rewritten-in-place tables leave dead mtime
      // keys behind; a rare full clear just re-infers once per table
      if (schemaCache.size > 1024) schemaCache.clear()
      val schema = schemaCache.computeIfAbsent(path + "@" + mtime,
        _ => spark.read.parquet(path).schema)
      spark.read.schema(schema).parquet(path)
    }
  }
}
