package graft.tsdb

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

/** Thrown when the maintenance lease is held by a live foreign writer
  * past the bounded wait — a distinct type so OPPORTUNISTIC callers (the
  * auto-flush inside a plain write) can yield instead of failing the
  * caller's write, while explicit maintenance calls surface it.
  */
final class LeaseHeldException(msg: String) extends IllegalStateException(msg)

/** Cross-PROCESS maintenance lease for a shared store root.
  *
  * The reference explicitly supports multiple stateless processes sharing
  * one Redis (README.md:4): its write path is safe because every Redis
  * command is atomic, and its purge path is safe because enqueue/ack run
  * as server-side Lua scripts (lua-scripts/ack-purge.lua:1-28 — one atomic
  * unit). This engine's file-backed analog keeps the WRITE path
  * coordination-free across processes by construction — L0 batch files and
  * activity logs are writer-unique (`...-$writerId.parquet`,
  * `act-$writerId.jsonl`), so concurrent writers never touch the same
  * file — but the MAINTENANCE operations (L0 flush, purge scan/ack,
  * compaction) rewrite shared partition directories with atomic renames
  * and must be mutually exclusive across processes, or an ack's partition
  * swap can drop a concurrent flush's freshly-landed rows.
  *
  * This lease is that exclusion — the Lua-script-atomicity analog:
  *
  *  - '''Acquire''' = atomic create-if-absent (`CREATE_NEW`, the same
  *    SET-NX rendering the epoch file uses) of `nsRoot/lease` containing
  *    `writerId expiryTs`. Only `CREATE_NEW` ever installs a record, so
  *    two contenders can never both think they won.
  *  - '''Contention''' = bounded wait (poll every 25 ms up to `waitMs`),
  *    then a golden-message failure — maintenance from a second process is
  *    SERIALIZED, not interleaved, and cleanly refused if the holder won't
  *    yield in time.
  *  - '''Crash recovery''' = TTL takeover: a record whose `expiryTs` has
  *    passed is deleted (a targeted delete of the observed-expired record)
  *    and acquisition retried via `CREATE_NEW`. A crashed holder therefore
  *    blocks maintenance for at most `ttlMs`.
  *  - '''Reentrancy''' = per-instance depth counter (purgeScan → flushL0
  *    nests); within-JVM mutual exclusion is the store's `mutationLock`,
  *    which is always held around `withLease`.
  *
  * Known benign race, documented: between "read expired record" and
  * "delete it", a fresh holder may have replaced the file, and the delete
  * then removes a live lease. The window is microseconds against a TTL of
  * tens of seconds, requires a crashed-holder takeover to even arise, and
  * its worst case is the pre-lease status quo (two concurrent maintainers).
  * On a real cluster the same protocol rides on the object store's
  * conditional-put (S3 If-None-Match / HDFS create-exclusive), which
  * closes the window; the logical design is unchanged.
  */
final class MaintenanceLease(
    nsRoot: Path,
    writerId: String,
    clock: () => Long,
    ttlMs: Long,
    waitMs: Long) {

  private val leaseFile = nsRoot.resolve("lease")
  private var depth = 0 // guarded by the store's mutationLock

  private def record(expiry: Long): Array[Byte] =
    s"$writerId $expiry".getBytes(StandardCharsets.UTF_8)

  private def readRecord(): Option[(String, Long)] =
    try {
      val s = new String(Files.readAllBytes(leaseFile), StandardCharsets.UTF_8).trim
      val i = s.lastIndexOf(' ')
      if (i < 0) None else Some((s.substring(0, i), s.substring(i + 1).toLong))
    } catch { case _: java.io.IOException => None } // vanished between list+read

  private def tryCreate(): Boolean =
    try {
      Files.write(leaseFile, record(clock() + ttlMs),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  private def acquire(): Unit = {
    val deadline = clock() + waitMs
    while (true) {
      if (tryCreate()) return
      readRecord() match {
        case Some((owner, expiry)) if owner == writerId =>
          // our own stale record (a crash before release within this
          // writerId's lifetime): safe to reclaim — one instance per id
          Files.deleteIfExists(leaseFile)
        case Some((_, expiry)) if expiry <= clock() =>
          Files.deleteIfExists(leaseFile) // TTL takeover (see scaladoc race note)
        case Some((owner, expiry)) =>
          if (clock() >= deadline)
            throw new LeaseHeldException(
              s"Maintenance lease for this store root is held by writer '$owner' " +
                s"(expires in ${expiry - clock()} ms). Concurrent maintenance " +
                "(flush/purge/compaction) on a shared root is serialized; " +
                "retry after the holder finishes or its lease expires.")
          Thread.sleep(25)
        case None => () // holder released between exists-check and read; retry
      }
    }
  }

  private def release(): Unit =
    readRecord() match {
      case Some((owner, _)) if owner == writerId => Files.deleteIfExists(leaseFile)
      case _ => () // lost to a TTL takeover — nothing of ours to remove
    }

  /** Run `body` holding the cross-process lease (reentrant). */
  def withLease[A](body: => A): A = {
    if (depth > 0) { depth += 1; try body finally depth -= 1 }
    else {
      acquire()
      depth = 1
      try body finally { depth = 0; release() }
    }
  }
}
