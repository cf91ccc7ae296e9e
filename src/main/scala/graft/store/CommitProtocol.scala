package graft.store

import java.nio.file.{Files, Path, StandardCopyOption}

/** The commit seam of [[SnapshotStore]] (r13 verdict task 5): the five
  * primitives whose ATOMICITY the store's crash-safety and
  * optimistic-concurrency guarantees actually rest on, extracted so a
  * non-POSIX filesystem can supply its own implementations without
  * touching the commit ordering logic (data files → manifest → header
  * → pointer, CAS under [[exclusive]]).
  *
  * Contract each primitive must honour:
  *   - [[exclusive]] — at most one committer per store root may run
  *     `body` at a time, across processes sharing the root. The CAS
  *     check (re-read pointer, compare to basis) runs inside it.
  *   - [[readPointer]]/[[flipPointer]] — the pointer flip is the
  *     commit point: a reader must observe either the old or the new
  *     version id, never a torn/partial write.
  *   - [[landFile]]/[[landDir]] — move a fully-written staging
  *     file/directory to its final name such that readers never see a
  *     half-written manifest. `landFile` may replace an existing
  *     target (re-publish after crash); `landDir` requires the target
  *     to be absent (callers delete stale targets inside
  *     [[exclusive]] first).
  *
  * [[AtomicRenameCommit]] is the POSIX implementation (what local
  * disk and HDFS give: atomic same-directory rename + OS file locks).
  * On an object store WITHOUT atomic rename (S3), implement this
  * trait with conditional-put primitives instead: `flipPointer` = a
  * compare-and-swap PUT of the pointer object (`If-Match` etag),
  * `exclusive` = a lease object claimed by conditional create, and
  * `landFile`/`landDir` = plain PUTs (objects are immutable-once-
  * written, so visibility is already atomic per object — the
  * manifest-header tag, not directory listing, decides what is
  * committed). The store never lists directories to decide
  * commit-ness, which is what makes this seam sufficient.
  */
trait CommitProtocol {
  /** Run `body` as the sole committer of `root` (cross-process). */
  def exclusive[T](root: String)(body: => T): T

  /** Current committed version, or None before any commit. */
  def readPointer(pointer: Path): Option[Long]

  /** Atomically publish `v` as the current version. */
  def flipPointer(pointer: Path, v: Long): Unit

  /** Atomically move a staged FILE to `target`, replacing any stale
    * target from a crashed earlier attempt at the same version.
    */
  def landFile(tmp: Path, target: Path): Unit

  /** Atomically move a staged DIRECTORY to `target` (target absent —
    * the caller clears crash leftovers under [[exclusive]]).
    */
  def landDir(tmp: Path, target: Path): Unit
}

/** POSIX/HDFS implementation: atomic same-volume rename for
  * publication, two-level locking for exclusivity (JVM-wide monitor
  * per canonical root — FileChannel throws
  * OverlappingFileLockException on same-JVM contention — plus an OS
  * file lock for cross-process writers on one host).
  */
object AtomicRenameCommit extends CommitProtocol {
  def exclusive[T](root: String)(body: => T): T =
    SnapshotStore.rootMonitor(root).synchronized {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(root, ".COMMIT.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val lk = ch.lock(); try body finally lk.release() }
      finally ch.close()
    }

  def readPointer(pointer: Path): Option[Long] =
    if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong)
    else None

  def flipPointer(pointer: Path, v: Long): Unit = {
    val tmpP = pointer.resolveSibling(".LATEST.tmp")
    Files.writeString(tmpP, v.toString)
    Files.move(tmpP, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def landFile(tmp: Path, target: Path): Unit =
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

  def landDir(tmp: Path, target: Path): Unit =
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
}
