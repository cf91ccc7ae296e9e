package graft.store

import java.nio.file.{Files, Path, StandardCopyOption}

/** Object-store implementation of [[CommitProtocol]] — the emulated
  * conditional-put double (r14 verdict task 1) that makes the S3
  * design sketched in the seam's Scaladoc EXECUTABLE, so StoreSpec's
  * commit-order / CAS-race / crash cases prove the trait is
  * sufficient for a store without atomic rename or file locks.
  *
  * Primitive mapping (local-FS emulation → the S3 call it stands in
  * for; the store itself never sees the difference):
  *
  *   - [[exclusive]] — a LEASE OBJECT claimed by conditional create
  *     (`Files.createFile`, the POSIX O_EXCL analog of
  *     `PUT If-None-Match: *`). Contenders spin; a lease older than
  *     [[ConditionalPutCommit.leaseTtlMs]] is from a DEAD committer
  *     (crashed between claim and release) and is broken in place —
  *     the LIST-FREE stale-staging cleanup the seam was suspected of
  *     missing: takeover needs only a GET of the one lease object's
  *     age, never a directory listing.
  *   - [[readPointer]]/[[flipPointer]] — the pointer is a small
  *     versioned object replaced by an etag-conditional put
  *     (`PUT If-Match`): the flip re-reads the object, compares the
  *     etag (content hash) captured at read, and only then writes.
  *     A JVM-wide monitor per pointer path stands in for the
  *     SERVER-SIDE atomicity of S3's conditional PUT (the object
  *     flips all-or-nothing on the service; a local truncate-write
  *     needs the monitor to emulate that) — it is NOT a lock the
  *     protocol design relies on: the CAS decision is the etag
  *     compare, and a mismatch throws rather than overwrites.
  *   - [[landFile]]/[[landDir]] — plain PUTs: a full-object copy to
  *     the final name, then delete of the staging copy. Objects are
  *     immutable-once-written and atomically visible per object on a
  *     real store, which is exactly why the store's formats never
  *     require rename: the manifest-header tag (not directory
  *     listing, not rename completion) decides what is committed,
  *     and a half-landed manifest directory without its header is
  *     invisible to readers (StoreSpec's crash cases pin this).
  *
  * What this double does NOT emulate: network partitions and S3's
  * read-after-overwrite consistency window. It emulates the PRIMITIVE
  * SEMANTICS (per-object visibility, conditional create/replace, no
  * rename, no locks) and every crash point BETWEEN primitives — the
  * surface the commit ordering logic actually depends on.
  */
object ConditionalPutCommit extends CommitProtocol {

  /** A lease older than this is a dead committer's and may be broken.
    * Spec-visible so the takeover case can age a lease artificially.
    */
  private[graft] val leaseTtlMs: Long = 60000L

  /** Give up claiming the lease after this long — a wedged store must
    * fail loudly, not hang the caller forever.
    */
  private[graft] val claimTimeoutMs: Long = 30000L

  def exclusive[T](root: String)(body: => T): T = {
    val lease = java.nio.file.Paths.get(root, ".LEASE")
    val deadline = System.nanoTime() + claimTimeoutMs * 1000000L
    var claimed = false
    while (!claimed) {
      try {
        // conditional create: PUT If-None-Match:* — exactly one
        // contender per object name succeeds
        Files.createFile(lease)
        Files.writeString(lease,
          s"${ProcessHandle.current().pid()}@${System.currentTimeMillis()}")
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // held: break it only if the holder is provably dead (lease
          // age beyond TTL) — the list-free takeover path
          val stale = try {
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lease).toMillis
            age > leaseTtlMs
          } catch { case _: java.nio.file.NoSuchFileException => false }
          if (stale) Files.deleteIfExists(lease) // next loop re-claims
          else if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"could not claim commit lease $lease within ${claimTimeoutMs}ms")
          else Thread.sleep(5)
      }
    }
    try body finally Files.deleteIfExists(lease)
  }

  def readPointer(pointer: Path): Option[Long] = {
    // GET: record the etag this reader observed, so a flipPointer on
    // the same thread (the commit path: casCheck re-reads, then
    // flips) carries it as its If-Match basis
    val v =
      if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong)
      else None
    seenEtag.put(etagKey(pointer), currentEtag(pointer))
    v
  }

  // etag observed by this committer's last read of each pointer —
  // what a real client would carry from GET to PUT If-Match. Keyed
  // per (pointer, thread) so concurrent committers carry their own.
  private val seenEtag =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Long]]()
  private def etagKey(p: Path): String =
    p.toAbsolutePath.normalize().toString + "#" + Thread.currentThread().getId

  def flipPointer(pointer: Path, v: Long): Unit = {
    // GET (capture etag) → PUT If-Match: the flip only lands if the
    // object is still at the etag this committer read. Under the
    // store's exclusive() section the compare never fails — the
    // COMMIT-CONTENT CAS is SnapshotStore.casCheck — but the etag
    // path is the wire shape an S3 deployment runs, and a flip
    // racing OUTSIDE the lease (a protocol-misusing caller) throws
    // instead of silently overwriting. The monitor stands in for the
    // service-side atomicity of the conditional PUT (see class doc).
    val expected =
      Option(seenEtag.get(etagKey(pointer))).getOrElse(currentEtag(pointer))
    pointerMonitor(pointer).synchronized {
      if (currentEtag(pointer) != expected)
        throw new IllegalStateException(
          s"conditional put of $pointer failed: etag moved since read")
      Files.writeString(pointer, v.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.WRITE)
      seenEtag.remove(etagKey(pointer))
    }
  }

  /** Plain PUT: whole-object copy to the final name (replace allowed —
    * re-publish after crash), then delete the staging copy.
    */
  def landFile(tmp: Path, target: Path): Unit = {
    Files.copy(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    Files.deleteIfExists(tmp)
  }

  /** One PUT per contained object; the target "directory" is only a
    * key prefix on a real store. The caller guarantees the target is
    * absent (stale targets are cleared under [[exclusive]] first).
    */
  def landDir(tmp: Path, target: Path): Unit = {
    Files.createDirectories(target)
    val walk = Files.walk(tmp)
    try {
      val files = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
        walk.forEach(p => if (Files.isRegularFile(p)) buf += p)
        buf.toSeq
      }
      files.foreach { f =>
        val dest = target.resolve(tmp.relativize(f))
        Files.createDirectories(dest.getParent)
        Files.copy(f, dest, StandardCopyOption.REPLACE_EXISTING)
      }
    } finally walk.close()
    val w = Files.walk(tmp)
    try w.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally w.close()
  }

  private def currentEtag(pointer: Path): Option[Long] =
    if (Files.exists(pointer))
      Some(java.util.Arrays.hashCode(Files.readAllBytes(pointer)).toLong)
    else None

  private val pointerMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def pointerMonitor(p: Path): Object =
    pointerMonitors.computeIfAbsent(
      p.toAbsolutePath.normalize().toString, _ => new Object)
}
