package graft.sources.lance

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Advisory single-maintainer lock for sidecar INDEX updates (FTS /
  * scalar / sketch refresh): unlike the lance datasets themselves —
  * whose manifest commits are atomic and optionally CAS'd — an index
  * update spans SEVERAL sidecar datasets (postings append + vocabulary
  * merge + stats + built-version), so two racing updaters can
  * double-merge the tail into the vocabulary and silently corrupt
  * document frequencies. The lock turns that race into a loud refusal.
  *
  * Implementation: create-no-overwrite of `<ix>/_maintenance.lock`
  * (atomic on the stores the commit protocol targets) whose CONTENT is
  * a per-acquisition owner token. Only create / delete / stat / read are
  * used — the primitives that are native on object stores; no renames.
  *
  * Races the protocol closes (the round-8 version's stale-break was
  * delete-then-create, which let two breakers both "win"):
  *
  *  1. Double stale-break: breaking a stale lock requires first winning
  *     a create-no-overwrite BREAK-CLAIM file — exactly one breaker
  *     holds the claim, re-verifies the lock is STILL the stale one it
  *     observed, and only then deletes it. A second breaker either sees
  *     the live claim (and refuses) or arrives after the break, when the
  *     ordinary create-race decides the new holder.
  *  2. Breaking a FRESH lock: the claim holder re-stats the lock before
  *     deleting; a lock file cannot be REPLACED while it exists (creates
  *     are no-overwrite), so a still-stale re-stat proves the delete
  *     removes the same dead holder's file.
  *  3. Cascading delete: release deletes the lock ONLY if it still
  *     carries the releaser's own token, so a holder whose lock was
  *     somehow reclaimed cannot remove the new holder's lock on the way
  *     out. Acquisition likewise read-verifies its own token after the
  *     create.
  *
  * A live-but-slow holder never goes stale: a daemon heartbeat bumps
  * the lock mtime every `staleMs / 4` while the work runs, so `staleMs`
  * only has to exceed one heartbeat gap, not the whole update.
  */
object MaintenanceLock {

  final class ConcurrentMaintenance(msg: String)
    extends RuntimeException(msg)

  private def readToken(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), StandardCharsets.UTF_8))
      } finally in.close()
    } catch { case _: java.io.IOException => None } // vanished under us

  /** Create-no-overwrite with `token` as content; false if it exists. */
  private def tryCreate(fs: FileSystem, p: Path, token: String): Boolean =
    try {
      val out = fs.create(p, false)
      try out.write(token.getBytes(StandardCharsets.UTF_8)) finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  private def ageOf(fs: FileSystem, p: Path): Option[Long] =
    try Some(System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }

  /** A crashed breaker's claim lingers at most this long. Claims are
    * held for milliseconds (stat + delete), so 10 s is already ~1000×
    * the hold time. */
  private val claimStaleMs = 10000L

  def withLock[A](indexPath: String, conf: Configuration,
                  staleMs: Long = 600000L)(f: => A): A = {
    val (fs, p) = LanceFormat.fileSystem(s"$indexPath/_maintenance.lock", conf)
    val claim = new Path(p.getParent, "_maintenance.lock.break")
    val token = UUID.randomUUID().toString
    var acquired = false
    var attempts = 0
    while (!acquired) {
      attempts += 1
      if (attempts > 4)
        throw new ConcurrentMaintenance(
          s"index $indexPath: lost the maintenance-lock race — retry")
      if (tryCreate(fs, p, token)) {
        // Read-verify: only the token proves the lock on disk is OURS
        // (guards against any interleave that replaced the file).
        acquired = readToken(fs, p).contains(token)
      } else ageOf(fs, p) match {
        case None => () // released/broken under us — loop and re-create
        case Some(age) if age < staleMs =>
          throw new ConcurrentMaintenance(
            s"index $indexPath is being updated by another maintainer " +
              s"(lock age ${age / 1000}s) — retry after it finishes")
        case Some(_) => // stale: win the break-claim, then delete the corpse
          ageOf(fs, claim) match {
            case Some(cage) if cage >= claimStaleMs =>
              fs.delete(claim, false) // crashed breaker's claim
            case Some(_) =>
              throw new ConcurrentMaintenance(
                s"index $indexPath: another maintainer is breaking the " +
                  "stale lock — retry")
            case None =>
              if (tryCreate(fs, claim, token) &&
                  readToken(fs, claim).contains(token)) {
                try {
                  // Sole breaker: the lock cannot have been REPLACED while
                  // it existed (creates are no-overwrite), so a re-stat
                  // that still shows stale proves we delete the corpse,
                  // not a fresh holder's lock.
                  if (ageOf(fs, p).exists(_ >= staleMs)) fs.delete(p, false)
                } finally fs.delete(claim, false)
              }
          }
      }
      // loop: re-attempt the create (ordinary race decides the holder)
    }
    // Heartbeat: keep the mtime fresh so a long update is never judged
    // stale by other maintainers.
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(staleMs / 4, 1000L))
          try fs.setTimes(p, System.currentTimeMillis(), -1)
          catch { case _: java.io.IOException => () } // store hiccup
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-maintenance-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try f
    finally {
      beat.interrupt()
      // Ownership-verified release: never delete a lock that is no
      // longer ours.
      if (readToken(fs, p).contains(token)) fs.delete(p, false)
    }
  }
}
