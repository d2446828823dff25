package graft.sources.lance

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
  * Implementation: ELECTION BY UNIQUE FILES. Each acquirer creates its
  * own uniquely-named entry `<ix>/_maintenance.lock.<millis>-<token>`
  * (never contended — no create-no-overwrite semantics required; local
  * filesystems implement exclusive create as a non-atomic
  * check-then-act, which broke two earlier token-verified designs under
  * an 8-thread hammer), waits an ordering beat, then lists the
  * directory: the lexicographically-smallest live entry owns the lock.
  * Losers delete their entry and refuse loudly.
  *
  * Why one winner: the entry NAME embeds its creation time and is
  * immutable, so all contenders agree on the ordering. The beat between
  * create and list makes name-order consistent with real-time order —
  * for B to usurp a winner A, B's name must sort below A's while B's
  * create happened after A's listing; A listed at least `beatMs` after
  * A created, so B's timestamp (and hence name) is strictly larger.
  * Listing-after-write is consistent on local filesystems and on the
  * object stores the commit protocol targets (S3 is strongly
  * consistent).
  *
  * Staleness: a crashed holder's entry stops heartbeating and is
  * deleted by any later contender once its mtime is `staleMs` old; the
  * daemon heartbeat bumps the live holder's mtime every `staleMs / 4`,
  * so a live-but-slow update is never judged stale. Release deletes
  * only the holder's OWN uniquely-named entry — there is no file any
  * two maintainers both believe they own, so no cascade deletes.
  */
object MaintenanceLock {

  final class ConcurrentMaintenance(msg: String)
    extends RuntimeException(msg)

  private val Prefix = "_maintenance.lock."
  /** Orders name-assignment consistently with create-before-list. */
  private val beatMs = 5L

  private def entries(fs: FileSystem, dir: Path): Seq[(String, Long)] =
    (try fs.listStatus(dir) catch {
      case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus]
    }).toSeq
      .filter(_.getPath.getName.startsWith(Prefix))
      .map(st => (st.getPath.getName, st.getModificationTime))

  def withLock[A](indexPath: String, conf: Configuration,
                  staleMs: Long = 600000L)(f: => A): A = {
    val (fs, dir) = LanceFormat.fileSystem(indexPath, conf)
    val token = UUID.randomUUID().toString
    val myName = f"$Prefix%s${System.currentTimeMillis()}%020d-$token%s"
    val myPath = new Path(dir, myName)
    fs.mkdirs(dir)
    val out = fs.create(myPath, true) // unique name — never contended
    out.close()
    var acquired = false
    try {
      Thread.sleep(beatMs) // ordering beat (see scaladoc)
      val now = System.currentTimeMillis()
      val all = entries(fs, dir)
      // sweep corpses so a crashed holder can't block forever; a LIVE
      // holder's heartbeat keeps its mtime < staleMs old
      val (stale, live) = all.partition { case (n, m) =>
        n != myName && now - m >= staleMs
      }
      stale.foreach { case (n, _) =>
        try fs.delete(new Path(dir, n), false)
        catch { case _: java.io.IOException => () }
      }
      val winner = live.map(_._1).min // myName is always in `live`
      if (winner != myName) {
        val age = live.find(_._1 == winner).map(now - _._2).getOrElse(0L)
        throw new ConcurrentMaintenance(
          s"index $indexPath is being updated by another maintainer " +
            s"(lock age ${age / 1000}s) — retry after it finishes")
      }
      acquired = true
    } finally {
      if (!acquired) fs.delete(myPath, false)
    }
    // Heartbeat: keep our entry's mtime fresh so a long update is never
    // judged stale by other maintainers.
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted) {
          Thread.sleep(math.max(staleMs / 4, 1000L))
          try fs.setTimes(myPath, System.currentTimeMillis(), -1)
          catch { case _: java.io.IOException => () } // store hiccup
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-maintenance-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try f
    finally {
      beat.interrupt()
      fs.delete(myPath, false) // only ever our own unique entry
    }
  }
}
