package graft.sources.lance

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Race matrix for [[MaintenanceLock]]'s election protocol. Two earlier
  * designs (delete-then-create; owner-token create-no-overwrite with a
  * break claim) both double-admitted under an 8-thread hammer because
  * local filesystems implement exclusive create as a non-atomic
  * check-then-act. The election design never contends on a shared file:
  * each acquirer writes a uniquely-named entry and the smallest live
  * name wins. These tests pin single-entry under contention, stale-
  * corpse sweeping, live-entry refusal, and heartbeat renewal.
  */
class MaintenanceLockSpec extends AnyFunSuite {
  private def conf = graft.TestSpark.spark.sessionState.newHadoopConf()

  /** A dead holder's entry: new-style unique name, old mtime. */
  private def plantStale(ix: String, ageMs: Long): Path = {
    val (fs, dir) = LanceFormat.fileSystem(ix, conf)
    fs.mkdirs(dir)
    val old = System.currentTimeMillis() - ageMs
    val p = new Path(dir, f"_maintenance.lock.$old%020d-dead-holder")
    val out = fs.create(p, true); out.close()
    fs.setTimes(p, old, -1)
    p
  }

  private def lockEntries(ix: String): Seq[String] = {
    val (fs, dir) = LanceFormat.fileSystem(ix, conf)
    fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("_maintenance.lock")).toSeq
  }

  test("a stale (dead-holder) entry is swept and the new maintainer acquires") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_stale").toString
    plantStale(ix, ageMs = 60000)
    var ran = false
    MaintenanceLock.withLock(ix, conf, staleMs = 1000) { ran = true }
    assert(ran)
    assert(lockEntries(ix).isEmpty, "stale corpse and own entry must be gone")
  }

  test("contending maintainers: exactly one enters, never two at once") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_race").toString
    val threads = 8
    for (_ <- 1 to 10) { // repeat to widen the race window
      plantStale(ix, ageMs = 60000)
      val inside = new AtomicInteger(0)
      val maxInside = new AtomicInteger(0)
      val winners = new AtomicInteger(0)
      val losers = new AtomicInteger(0)
      val unexpected = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(threads)
      (1 to threads).foreach { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try {
              MaintenanceLock.withLock(ix, conf, staleMs = 30000) {
                val n = inside.incrementAndGet()
                maxInside.accumulateAndGet(n, math.max)
                Thread.sleep(20)
                inside.decrementAndGet()
                winners.incrementAndGet()
              }
            } catch {
              case _: MaintenanceLock.ConcurrentMaintenance =>
                losers.incrementAndGet()
              case t: Throwable =>
                unexpected.compareAndSet(null, t)
            }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      if (unexpected.get() != null) throw unexpected.get()
      assert(winners.get() >= 1, "someone must win the election")
      assert(winners.get() + losers.get() == threads)
      assert(maxInside.get() == 1,
        s"double-admit: ${maxInside.get()} maintainers inside the critical section")
      assert(lockEntries(ix).isEmpty,
        s"litter: ${lockEntries(ix).mkString(",")}")
    }
  }

  test("a live holder is refused; release removes only the holder's own entry") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_live").toString
    MaintenanceLock.withLock(ix, conf, staleMs = 60000) {
      val e = intercept[MaintenanceLock.ConcurrentMaintenance] {
        MaintenanceLock.withLock(ix, conf, staleMs = 60000) { fail("must not run") }
      }
      assert(e.getMessage.contains("maintainer"))
      assert(lockEntries(ix).size == 1, "loser must have cleaned its entry")
    }
    assert(lockEntries(ix).isEmpty)
  }

  /** A live contender entry whose NAME is back-dated — the multi-driver
    * clock-skew shape: a contender on a machine whose clock lags created
    * its entry AFTER the winner's listings, yet its name sorts below the
    * winner's. The election alone cannot see it; the pre-commit fence
    * must. */
  private def plantSkewed(ix: String): Path = {
    val (fs, dir) = LanceFormat.fileSystem(ix, conf)
    val old = System.currentTimeMillis() - 60000
    val p = new Path(dir, f"_maintenance.lock.$old%020d-skewed-driver")
    val out = fs.create(p, true); out.close() // fresh mtime -> live
    p
  }

  test("pre-commit fence refuses when a clock-skewed usurper surfaces after the election") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_skew").toString
    var checkedBefore = false
    MaintenanceLock.withLockFenced(ix, conf, staleMs = 60000) { fence =>
      fence.check() // un-contended: passes
      checkedBefore = true
      // the skewed contender's entry lands after our election listings
      // but sorts below our name — exactly the window the verdict names
      plantSkewed(ix)
      val e = intercept[MaintenanceLock.ConcurrentMaintenance] { fence.check() }
      assert(e.getMessage.contains("usurped"))
    }
    assert(checkedBefore)
    // our release removed only OUR entry; the skewed winner's remains
    assert(lockEntries(ix).size == 1 &&
      lockEntries(ix).head.contains("skewed-driver"))
  }

  test("pre-commit fence refuses when the holder's own entry was swept") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_swept").toString
    MaintenanceLock.withLockFenced(ix, conf, staleMs = 60000) { fence =>
      val (fs, dir) = LanceFormat.fileSystem(ix, conf)
      // simulate a rival's stale-sweep of a long-paused holder
      lockEntries(ix).foreach(n => fs.delete(new Path(dir, n), false))
      val e = intercept[MaintenanceLock.ConcurrentMaintenance] { fence.check() }
      assert(e.getMessage.contains("gone") || e.getMessage.contains("swept"))
    }
  }

  test("heartbeat keeps the holder live on object-store semantics where setTimes is a no-op") {
    // s3like models S3A/GCS: last-modified never updates in place, so an
    // mtime heartbeat via FileSystem.setTimes silently does nothing and a
    // live-but-slow holder would be swept as a corpse mid-update. The
    // re-PUT heartbeat must keep the entry fresh there.
    val hc = graft.TestSpark.spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3like.impl", classOf[OverwritingFs].getName)
    hc.set("fs.AbstractFileSystem.s3like.impl", classOf[OverwritingAbstractFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("mlock_s3beat")
    val ix = s"s3like://$dir/ix"
    // sanity: setTimes really is inert through this scheme
    val (fs, d) = LanceFormat.fileSystem(ix, conf)
    fs.mkdirs(d)
    val probe = new Path(d, "probe")
    fs.create(probe, true).close()
    val m0 = fs.getFileStatus(probe).getModificationTime
    fs.setTimes(probe, m0 - 100000, -1)
    assert(fs.getFileStatus(probe).getModificationTime == m0,
      "s3like must model setTimes as a no-op for this test to mean anything")
    var rivalRefused = false
    MaintenanceLock.withLockFenced(ix, conf, staleMs = 1500) { fence =>
      Thread.sleep(2600) // > staleMs: only the re-PUT beats keep us live
      intercept[MaintenanceLock.ConcurrentMaintenance] {
        MaintenanceLock.withLock(ix, conf, staleMs = 1500) { fail("must not run") }
      }
      rivalRefused = true
      fence.check() // still the owner after the rival's attempt
    }
    assert(rivalRefused)
  }

  test("heartbeat keeps a slow holder's entry fresh past staleMs") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_beat").toString
    // staleMs=1500 -> heartbeat every max(375,1000)=1000ms; the holder
    // works for 2.6s, so without the beat its entry would be judged a
    // corpse at t=1.5s and a rival would sweep it and enter
    val rivalRefused = new AtomicInteger(0)
    MaintenanceLock.withLock(ix, conf, staleMs = 1500) {
      Thread.sleep(2600) // beats at ~1.0s and ~2.0s keep age < 1500ms
      intercept[MaintenanceLock.ConcurrentMaintenance] {
        MaintenanceLock.withLock(ix, conf, staleMs = 1500) {
          rivalRefused.decrementAndGet() // must not run
        }
      }
      rivalRefused.incrementAndGet()
    }
    assert(rivalRefused.get() == 1)
  }
}
