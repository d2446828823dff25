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
  * Losers delete their entry and refuse loudly. The winner lists TWICE
  * (a confirm beat between them), so a contender whose create was
  * in-flight-but-invisible during the first listing is seen by the
  * second before the winner enters.
  *
  * Why one winner: the entry NAME embeds its creation time and is
  * immutable, so all contenders agree on the ordering. The beats
  * between create and the listings make name-order consistent with
  * real-time order — for B to usurp a winner A undetected, B's name
  * must sort below A's while B's create surfaced after A's CONFIRM
  * listing, which requires B's clock to lag A's by more than two beats
  * plus A's create-to-confirm latency. Listing-after-write is
  * consistent on local filesystems and on the object stores the commit
  * protocol targets (S3 is strongly consistent).
  *
  * CLOCK DOMAINS — the election alone is therefore conditional: it is
  * airtight single-host (one clock; hammer-tested) and on clusters
  * whose clock skew is below the beat, but a badly skewed contender on
  * another driver could still surface a smaller-sorting name after the
  * confirm listing. The [[Fence]] closes that for what actually
  * matters — COMMITS: the critical section receives a fence and calls
  * `fence.check()` immediately before every sidecar commit; the check
  * re-lists and refuses if any smaller-sorting live entry exists (or if
  * the holder's own entry was swept). Both parties' entries exist
  * before either party's fence, and names order totally, so at most one
  * of two racing maintainers passes its pre-commit fence — the other
  * aborts with nothing published. The residual window is the
  * fence-to-commit gap (one listing call), not the whole update.
  *
  * Staleness: a crashed holder's entry stops heartbeating and is
  * deleted by any later contender once its mtime is `staleMs` old. The
  * daemon heartbeat re-PUTs the entry (create-overwrite of the same
  * name) every `staleMs / 4` — NOT `FileSystem.setTimes`, which is a
  * base-class no-op on S3A/GCS-style stores (object stores never update
  * last-modified in place); a fresh PUT refreshes the mtime on every
  * store. If a paused holder's entry IS swept and a rival enters, the
  * holder's next heartbeat resurrects its (smaller-sorting) entry and
  * the pre-commit fences arbitrate: the rival's fence sees the
  * resurrected smaller name and aborts, so still at most one commit
  * lands. Staleness compares the lister's local clock against store
  * mtimes — `staleMs` must exceed worst-case lister-vs-store clock
  * disagreement (the 10-minute default dwarfs NTP-managed skew).
  * Release deletes only the holder's OWN uniquely-named entry — there
  * is no file any two maintainers both believe they own, so no cascade
  * deletes.
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

  /** Fencing handle for the critical section: [[check]] re-lists the
    * lock directory and throws [[ConcurrentMaintenance]] if this holder
    * no longer owns the election — its entry was swept as stale, or a
    * smaller-sorting live entry (a clock-skewed contender from another
    * driver) has surfaced. Call it immediately before each sidecar
    * COMMIT: a usurped holder then aborts having published nothing,
    * instead of double-merging. Cost is one directory listing. */
  final class Fence private[MaintenanceLock] (fs: FileSystem, dir: Path,
                                              myName: String, staleMs: Long) {
    def check(): Unit = {
      val now = System.currentTimeMillis()
      val all = entries(fs, dir)
      if (!all.exists(_._1 == myName))
        throw new ConcurrentMaintenance(
          s"maintenance fence on $dir: this holder's lock entry is gone " +
            "(swept as stale after a pause?) — refusing to commit; retry")
      val live = all.filter { case (n, m) => n == myName || now - m < staleMs }
      val winner = live.map(_._1).min
      if (winner != myName)
        throw new ConcurrentMaintenance(
          s"maintenance fence on $dir: usurped by a smaller-sorting live " +
            s"entry ($winner) — refusing to commit; retry")
    }
  }

  def withLock[A](indexPath: String, conf: Configuration,
                  staleMs: Long = 600000L)(f: => A): A =
    withLockFenced(indexPath, conf, staleMs)(_ => f)

  def withLockFenced[A](indexPath: String, conf: Configuration,
                        staleMs: Long = 600000L)(f: Fence => A): A = {
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
      def refuse(liveNow: Seq[(String, Long)], winner: String): Nothing = {
        val age = liveNow.find(_._1 == winner)
          .map(System.currentTimeMillis() - _._2).getOrElse(0L)
        throw new ConcurrentMaintenance(
          s"index $indexPath is being updated by another maintainer " +
            s"(lock age ${age / 1000}s) — retry after it finishes")
      }
      val winner = live.map(_._1).min // myName is always in `live`
      if (winner != myName) refuse(live, winner)
      // confirm beat: list once more after another beat, so a contender
      // whose create was in flight (slow PUT, GC pause between its
      // timestamp assignment and visibility) during the first listing is
      // seen now rather than after we enter
      Thread.sleep(beatMs)
      val now2 = System.currentTimeMillis()
      val live2 = entries(fs, dir).filter { case (n, m) =>
        n == myName || now2 - m < staleMs }
      val winner2 = live2.map(_._1).min
      if (winner2 != myName) refuse(live2, winner2)
      acquired = true
    } finally {
      if (!acquired) fs.delete(myPath, false)
    }
    // Heartbeat: re-PUT our entry so its mtime stays fresh on EVERY
    // store (setTimes is a no-op on object stores — pinned by
    // MaintenanceLockSpec's s3like heartbeat test). The name (and so
    // the election order) never changes.
    // `released` closes the interrupt/create race on release: an in-flight
    // re-PUT that completes AFTER the release delete would resurrect an
    // orphan entry with a fresh mtime that sorts below every future
    // contender — locking all maintainers out for up to staleMs. The beat
    // re-checks the flag after every create and deletes its own orphan;
    // release additionally joins the thread before deleting, so the
    // normal path never races at all.
    @volatile var released = false
    val beat = new Thread(() => {
      try {
        while (!Thread.currentThread().isInterrupted && !released) {
          Thread.sleep(math.max(staleMs / 4, 1000L))
          try {
            if (!released) {
              fs.create(myPath, true).close()
              if (released) fs.delete(myPath, false) // raced the release
            }
          } catch { case _: java.io.IOException => () } // store hiccup
        }
      } catch {
        case _: InterruptedException => ()
        case _: java.io.IOException  => ()
      }
    }, s"graft-maintenance-heartbeat")
    beat.setDaemon(true)
    beat.start()
    val fence = new Fence(fs, dir, myName, staleMs)
    try f(fence)
    finally {
      released = true
      beat.interrupt()
      try beat.join(10000L) catch { case _: InterruptedException => () }
      fs.delete(myPath, false) // only ever our own unique entry
    }
  }
}
