package graft.sources.lance

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Race matrix for [[MaintenanceLock]]'s owner-token protocol: the
  * round-8 lock's stale-break was delete-then-create, which let two
  * breakers both "win" and re-admitted the silent double-merge the lock
  * exists to prevent. These tests pin the three closures: single-winner
  * stale break (atomic rename), ownership-verified release (a holder
  * whose lock was claimed must not delete the claimant's lock), and
  * heartbeat renewal (a live-but-slow holder never goes stale).
  */
class MaintenanceLockSpec extends AnyFunSuite {
  private def conf = graft.TestSpark.spark.sessionState.newHadoopConf()

  private def makeStale(ix: String, ageMs: Long): Path = {
    val (fs, p) = LanceFormat.fileSystem(s"$ix/_maintenance.lock", conf)
    val out = fs.create(p, true)
    out.write("dead-holder-token".getBytes(StandardCharsets.UTF_8))
    out.close()
    fs.setTimes(p, System.currentTimeMillis() - ageMs, -1)
    p
  }

  test("a stale lock is broken and the breaker acquires") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_stale").toString
    makeStale(ix, ageMs = 60000)
    var ran = false
    MaintenanceLock.withLock(ix, conf, staleMs = 1000) { ran = true }
    assert(ran)
    val (fs, p) = LanceFormat.fileSystem(s"$ix/_maintenance.lock", conf)
    assert(!fs.exists(p), "released lock must be gone")
  }

  test("two breakers of one stale lock: exactly one enters, never both at once") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_race").toString
    val threads = 8
    for (_ <- 1 to 10) { // repeat to widen the race window
      makeStale(ix, ageMs = 60000)
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
      assert(winners.get() >= 1, "someone must break the stale lock and win")
      assert(winners.get() + losers.get() == threads)
      assert(maxInside.get() == 1,
        s"double-break: ${maxInside.get()} maintainers inside the critical section")
      val (fs, p) = LanceFormat.fileSystem(s"$ix/_maintenance.lock", conf)
      assert(!fs.exists(p), "all paths must leave no lock behind")
      // no broken-* litter left behind either
      val litter = fs.listStatus(new Path(ix))
        .map(_.getPath.getName).filter(_.startsWith("_maintenance.lock"))
      assert(litter.isEmpty, s"litter: ${litter.mkString(",")}")
    }
  }

  test("release is ownership-verified: a claimed lock is not deleted by the old holder") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_own").toString
    val (fs, p) = LanceFormat.fileSystem(s"$ix/_maintenance.lock", conf)
    MaintenanceLock.withLock(ix, conf, staleMs = 60000) {
      // simulate a breaker legitimately claiming the lock mid-hold
      val out = fs.create(p, true)
      out.write("breaker-token".getBytes(StandardCharsets.UTF_8))
      out.close()
    }
    assert(fs.exists(p), "old holder must not cascade-delete the breaker's lock")
    val in = fs.open(p)
    val buf = new Array[Byte](64); val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, StandardCharsets.UTF_8) == "breaker-token")
    fs.delete(p, false)
  }

  test("heartbeat keeps a slow holder's lock fresh past staleMs") {
    val ix = java.nio.file.Files.createTempDirectory("mlock_beat").toString
    // staleMs=1500 -> heartbeat every max(375,1000)=1000ms; the holder
    // works for 2.6s, so without the beat the lock would be stale at
    // t=1.5s and a rival would break it
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
