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
    // Every claim carries a UNIQUE token: release and stale-break are
    // conditional deletes on that token (DELETE If-Match), so a holder
    // can never delete a lease that was broken out from under it and
    // re-claimed by someone else — the token IS the ownership proof.
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.nanoTime() + claimTimeoutMs * 1000000L
    var claimed = false
    while (!claimed) {
      try {
        // conditional create: PUT If-None-Match:* — exactly one
        // contender per object name succeeds. CREATE_NEW writes the
        // token in the same call, so no observer sees an empty lease
        // with a settled mtime.
        Files.writeString(lease, token,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // held: break it only if the holder is provably dead (lease
          // age beyond TTL) — the list-free takeover path. Capture the
          // token OBSERVED stale, then delete only if the object still
          // carries that token (conditional delete): a fresh re-claim
          // between the age check and the delete has a new token and
          // survives. The monitor stands in for the service-side
          // atomicity of DELETE If-Match (same emulation discipline
          // as flipPointer's conditional put).
          val observedStale: Option[String] = try {
            val tok = Files.readString(lease)
            val age = System.currentTimeMillis() -
              Files.getLastModifiedTime(lease).toMillis
            if (age > leaseTtlMs) Some(tok) else None
          } catch { case _: java.nio.file.NoSuchFileException => None }
          observedStale match {
            case Some(tok) =>
              leaseMonitor(lease).synchronized {
                val unchanged = try Files.readString(lease) == tok
                  catch { case _: java.nio.file.NoSuchFileException => false }
                if (unchanged) Files.deleteIfExists(lease)
              } // next loop re-claims
            case None =>
              if (System.nanoTime() > deadline)
                throw new IllegalStateException(
                  s"could not claim commit lease $lease within ${claimTimeoutMs}ms")
              else Thread.sleep(5)
          }
      }
    }
    heldLease.set((lease.toAbsolutePath.normalize(), token))
    try body finally {
      heldLease.remove()
      // conditional release: delete only OUR lease. If the token no
      // longer matches, the lease was broken (this holder overran the
      // TTL) and the current holder's lease must not be destroyed.
      leaseMonitor(lease).synchronized {
        val mine = try Files.readString(lease) == token
          catch { case _: java.nio.file.NoSuchFileException => false }
        if (mine) Files.deleteIfExists(lease)
      }
    }
  }

  // the lease this thread currently holds (path -> token), carried so
  // flipPointer can re-verify ownership at the commit point
  private val heldLease = new ThreadLocal[(Path, String)]()

  private val leaseMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def leaseMonitor(p: Path): Object =
    leaseMonitors.computeIfAbsent(
      p.toAbsolutePath.normalize().toString, _ => new Object)

  def readPointer(pointer: Path): Option[Long] = {
    // GET: record the etag this reader observed, so a flipPointer on
    // the same thread (the commit path: casCheck re-reads, then
    // flips) carries it as its If-Match basis. Read UNDER the pointer
    // monitor: flipPointer truncate-writes the object in place, and a
    // real store serves either the old or the new object, never a
    // torn one — the monitor emulates that read atomicity (a reader
    // outside it could observe an empty/partial file and crash).
    pointerMonitor(pointer).synchronized {
      val v =
        if (Files.exists(pointer)) Some(Files.readString(pointer).trim.toLong)
        else None
      seenEtag.put(etagKey(pointer), currentEtag(pointer))
      v
    }
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
    // Ownership re-verify at the commit point: if this thread claimed
    // a lease for this store root (exclusive()), the lease object must
    // still carry OUR token. A holder that overran the TTL and was
    // broken must fail here — flipping anyway could publish the losing
    // writer's manifest over the new holder's commit.
    Option(heldLease.get()).foreach { case (leasePath, token) =>
      if (leasePath.getParent == pointer.toAbsolutePath.normalize().getParent) {
        val stillMine = try Files.readString(leasePath) == token
          catch { case _: java.nio.file.NoSuchFileException => false }
        if (!stillMine)
          throw new IllegalStateException(
            s"commit lease $leasePath lost before pointer flip " +
              "(lease broken as stale — this committer overran the TTL)")
      }
    }
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
