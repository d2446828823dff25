package graft.sources.lance

import org.apache.hadoop.conf.Configuration

/** Advisory single-maintainer lock for sidecar INDEX updates (FTS /
  * scalar / sketch refresh): unlike the lance datasets themselves —
  * whose manifest commits are atomic and optionally CAS'd — an index
  * update spans SEVERAL sidecar datasets (postings append + vocabulary
  * merge + stats + built-version), so two racing updaters can
  * double-merge the tail into the vocabulary and silently corrupt
  * document frequencies. The lock turns that race into a loud refusal.
  *
  * Implementation: create-no-overwrite of `<ix>/_maintenance.lock`
  * (atomic on the stores the commit protocol targets). A crashed
  * holder's lock goes stale after `staleMs` and is broken by the next
  * acquirer.
  */
object MaintenanceLock {

  final class ConcurrentMaintenance(msg: String)
    extends RuntimeException(msg)

  def withLock[A](indexPath: String, conf: Configuration,
                  staleMs: Long = 600000L)(f: => A): A = {
    val (fs, p) = LanceFormat.fileSystem(s"$indexPath/_maintenance.lock", conf)
    if (fs.exists(p)) {
      val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
      if (age < staleMs)
        throw new ConcurrentMaintenance(
          s"index $indexPath is being updated by another maintainer " +
            s"(lock age ${age / 1000}s) — retry after it finishes")
      fs.delete(p, false) // stale: a crashed holder; break the lock
    }
    val out =
      try fs.create(p, false)
      catch {
        case _: java.io.IOException =>
          throw new ConcurrentMaintenance(
            s"index $indexPath: lost the maintenance-lock race — retry")
      }
    out.close()
    try f finally fs.delete(p, false)
  }
}
