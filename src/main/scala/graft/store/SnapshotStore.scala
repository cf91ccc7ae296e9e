package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.CdcOps

/** One data file of a committed snapshot version, with its key-range
  * index entry (rows + min/max of the store's key column).
  */
final case class DataFileEntry(path: String, rows: Long, minKey: Long, maxKey: Long)

/** Minimal table-format seam over parquet — the role Kudu plays in
  * the reference: a continuously-upserted, snapshot-readable table
  * [ref: KuduManager.scala:108-120].
  *
  * Layout under `root/`:
  *   - `data/v<N>/part-*.parquet` — version N's data files,
  *     range-clustered on the key so each file covers a tight key
  *     span (what makes the manifest index prune).
  *   - `_manifests/m<N>.tsv` — version N's manifest: the explicit
  *     data-file list plus a per-file key-range index
  *     (path, rows, minKey, maxKey).
  *   - `LATEST` — pointer to the current version, flipped by atomic
  *     rename; commit order is data files -> manifest -> pointer, so
  *     a crash at any point leaves the previous version intact.
  *
  * Reads are SNAPSHOT-ISOLATED: the file list is resolved from one
  * manifest at DataFrame-construction time, never by directory
  * listing — a concurrent merge can add files and flip the pointer
  * without tearing an in-flight reader (vacuum retains enough
  * versions for readers to finish; see `keepVersions`).
  *
  * This is deliberately the smallest honest subset of a
  * Delta/Iceberg-style format: single writer (the streaming sink),
  * manifest-level file skipping, no schema evolution. On a real
  * cluster the same seam is where a full table format slots in — the
  * merge fold (CdcOps.compactSnapshot) is unchanged.
  */
final class SnapshotStore(
    val spark: SparkSession,
    val root: String,
    val keyCol: String,
    filesPerCommit: Int = 4,
    keepVersions: Int = 2) {

  require(keepVersions >= 1, "keepVersions must be >= 1")

  private val manifestDir = Paths.get(root, "_manifests")
  private val pointer = Paths.get(root, "LATEST")
  Files.createDirectories(manifestDir)

  def currentVersion: Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong) else None

  /** The key-range index of a committed version. */
  def manifest(v: Long): Seq[DataFileEntry] =
    Files.readAllLines(manifestDir.resolve(s"m$v.tsv")).asScala.toSeq
      .filterNot(l => l.startsWith("#") || l.isEmpty)
      .map { l =>
        val Array(p, r, mn, mx) = l.split("\t")
        DataFileEntry(p, r.toLong, mn.toLong, mx.toLong)
      }

  /** Snapshot-isolated read of the current version (None if nothing
    * has been committed yet).
    */
  def read(): Option[DataFrame] = currentVersion.map(readVersion)

  def readVersion(v: Long): DataFrame = {
    val files = manifest(v).map(_.path)
    require(files.nonEmpty, s"version $v has no data files")
    spark.read.parquet(files: _*)
  }

  /** Manifest-index file pruning for a key range — which data files
    * can contain keys in [lo, hi]. Exposed so plan/pruning behavior
    * is spec-assertable.
    */
  def plannedFiles(lo: Long, hi: Long): Seq[DataFileEntry] =
    currentVersion.toSeq.flatMap(manifest).filter(f => f.maxKey >= lo && f.minKey <= hi)

  /** Key-range read: file-skip via the manifest index (files are
    * range-clustered at commit, so a point/range lookup touches a
    * fraction of the table — Kudu's key-range-partition read path),
    * then the exact row filter on what remains.
    */
  def readRange(lo: Long, hi: Long): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed version in $root"))
    val all = manifest(v)
    val hit = all.filter(f => f.maxKey >= lo && f.minKey <= hi)
    val base =
      if (hit.isEmpty) spark.read.parquet(all.head.path).limit(0)
      else spark.read.parquet(hit.map(_.path): _*)
    base.filter(col(keyCol) >= lo && col(keyCol) <= hi)
  }

  /** Commit a full snapshot as the next version. Data files are
    * range-clustered on the key (tight per-file key spans -> the
    * manifest index prunes); stats are collected in one small job
    * over the just-written files (what real formats do at write
    * time). The pointer flip is last and atomic.
    */
  def commit(next: DataFrame): Long = {
    val v = currentVersion.map(_ + 1L).getOrElse(0L)
    val dataDir = Paths.get(root, "data", s"v$v")
    next.repartitionByRange(filesPerCommit, col(keyCol))
      .write.mode("overwrite").parquet(dataDir.toString)
    val entries = spark.read.parquet(dataDir.toString)
      .groupBy(input_file_name().as("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("long").as("mn"),
        max(col(keyCol)).cast("long").as("mx"))
      .collect()
      .map(r => DataFileEntry(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.minKey)
    require(entries.nonEmpty, "commit of an empty snapshot is not supported")
    val body = (s"# graft-manifest v1 key=$keyCol" +:
      entries.map(e => s"${e.path}\t${e.rows}\t${e.minKey}\t${e.maxKey}"))
      .mkString("\n")
    val tmpM = manifestDir.resolve(s".m$v.tsv.tmp")
    Files.writeString(tmpM, body)
    Files.move(tmpM, manifestDir.resolve(s"m$v.tsv"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val tmpP = Paths.get(root, s".LATEST.tmp")
    Files.writeString(tmpP, v.toString)
    Files.move(tmpP, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    vacuum(v)
    v
  }

  /** The Kudu-role MERGE: fold a batch of parsed CDC change rows into
    * the stored snapshot via the incremental compaction fold
    * (compact(snapshot(A), B) == snapshot(A ∪ B) for any log split)
    * and commit the result. Soft-delete decoration is recomputed
    * after every fold (delete_state derives from op_type; D rows'
    * payloads are nulled) [ref: KuduManager.scala:72-114].
    */
  def merge(deltas: DataFrame): Long = {
    val next = read() match {
      case Some(base) =>
        CdcOps.decorateSoftDelete(
          CdcOps.compactSnapshot(base.drop("delete_state"), deltas, keyCol))
      case None =>
        CdcOps.softDeleteSnapshot(deltas, col(keyCol))
    }
    commit(next)
  }

  /** Drop data + manifests older than the retention window. Current
    * and previous `keepVersions` versions stay so in-flight
    * snapshot-isolated readers finish safely — the table format's
    * vacuum.
    */
  private def vacuum(current: Long): Unit = {
    val cutoff = current - keepVersions
    val dataRoot = Paths.get(root, "data")
    if (Files.exists(dataRoot)) {
      val listing = Files.list(dataRoot)
      try listing.forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("v") && name.drop(1).forall(_.isDigit) &&
            name.drop(1).toLong <= cutoff) {
          val walk = Files.walk(p)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
          finally walk.close()
        }
      } finally listing.close()
    }
    val mlisting = Files.list(manifestDir)
    try mlisting.forEach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("m") && name.endsWith(".tsv") &&
          name.stripPrefix("m").stripSuffix(".tsv").forall(_.isDigit) &&
          name.stripPrefix("m").stripSuffix(".tsv").toLong <= cutoff)
        Files.deleteIfExists(p)
    } finally mlisting.close()
  }
}
