package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Direct crash-recovery coverage for the shared publication discipline
  * ([[graft.ops.StoreLifecycle]]) — the integration suite proves the nine
  * stores' probes through it; this one proves the swap machinery itself
  * against the failure points the Scaladoc claims: a failed build leaves
  * the live store untouched, a crashed swap's `.old` is recoverable and
  * swept, and stale `.next-*` garbage never accumulates. */
class StoreLifecycleSpec extends AnyFunSuite {
  private val root = "/tmp/graft-lifecycle-unit"

  private def fresh(name: String): String = {
    val dir = s"$root/$name"
    graft.ops.Scale.deleteRecursively(new java.io.File(root))
    dir
  }

  private def writeStore(dir: String, payload: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/data.txt"), payload)
  }

  private def readStore(dir: String): String =
    Files.readString(Paths.get(s"$dir/data.txt"))

  test("publish creates a fresh store; republish replaces it atomically") {
    val store = fresh("basic")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v1"))
    assert(readStore(store) === "v1")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v2"))
    assert(readStore(store) === "v2")
    assert(!Files.exists(Paths.get(s"$store.old")), ".old must be swept after the swap")
  }

  test("a failed build leaves the live store untouched; its .next garbage is swept by the next publish") {
    val store = fresh("failedbuild")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v1"))
    intercept[RuntimeException] {
      graft.ops.StoreLifecycle.publish(store) { tmp =>
        writeStore(tmp, "half-written")
        throw new RuntimeException("simulated build crash")
      }
    }
    assert(readStore(store) === "v1", "live store must survive a failed build")
    val leftovers = Paths.get(store).toAbsolutePath.getParent.toFile.listFiles()
      .filter(_.getName.startsWith("failedbuild.next-"))
    assert(leftovers.length === 1, "the crashed build's .next dir remains until the next publish")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v2"))
    assert(readStore(store) === "v2")
    val after = Paths.get(store).toAbsolutePath.getParent.toFile.listFiles()
      .filter(_.getName.startsWith("failedbuild.next-"))
    assert(after.isEmpty, "stale .next-* must be swept before the next build")
  }

  test("a crashed prior swap's .old leftover is swept, never resurrected") {
    val store = fresh("oldleftover")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "live"))
    writeStore(s"$store.old", "stale-pre-crash")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "next"))
    assert(readStore(store) === "next")
    assert(!Files.exists(Paths.get(s"$store.old")))
  }

  test("first build (no live store) swaps in without an .old phase") {
    val store = fresh("firstbuild")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v1"))
    assert(readStore(store) === "v1")
    assert(!Files.exists(Paths.get(s"$store.old")))
  }

  test("writer lock: a concurrent second writer refuses loudly; the lock releases with its owner") {
    val store = fresh("lockrace")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val owner = new Thread(() =>
      graft.ops.StoreLifecycle.withWriterLock(store) {
        entered.countDown(); release.await()
      })
    owner.start()
    entered.await()
    // a LIVE lock (fresh mtime) must refuse — publish, append-style direct
    // lock, and takeover-race all route through the same acquire
    val e = intercept[IllegalStateException](
      graft.ops.StoreLifecycle.publish(store)(writeStore(_, "lost-update")))
    assert(e.getMessage.contains("another writer holds"))
    assert(!Files.exists(Paths.get(store)), "the refused publish must not have built")
    release.countDown(); owner.join()
    assert(!Files.exists(Paths.get(s"$store.lock")), "owner exit releases the lock")
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "v1"))
    assert(readStore(store) === "v1")
  }

  test("writer lock: a stale lock from a crashed writer is taken over") {
    val store = fresh("lockstale")
    Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
    val lock = Paths.get(s"$store.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "recovered"))
    assert(readStore(store) === "recovered")
    assert(!Files.exists(lock), "the takeover's lock is released after the publish")
  }

  test("writer lock: rivals racing a stale takeover — exactly one writer inside at a time") {
    val store = fresh("lockrace")
    Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
    val lock = Paths.get(s"$store.lock")
    Files.createFile(lock)
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
    // 8 rivals all see the SAME stale lock and race the takeover: the
    // rename-based path guarantees at most one is ever inside the body
    // (delete-then-create could remove a rival's FRESH lock — two
    // winners); losers refuse loudly, they never block or corrupt
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        start.await()
        try graft.ops.StoreLifecycle.withWriterLock(store) {
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(30) // widen the overlap window
          inside.decrementAndGet()
          winners.incrementAndGet()
        } catch { case _: IllegalStateException => () }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
    assert(winners.get() >= 1, "the stale lock must be taken over by someone")
    assert(maxInside.get() === 1,
      s"${maxInside.get()} writers inside the lock concurrently — takeover race lost twice")
    assert(!Files.exists(lock))
  }

  test("writer lock heartbeat: a live holder outliving the stale threshold is never stolen") {
    val store = fresh("lockbeat")
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    // 1200 ms: the beat fires every 300 ms, leaving ~900 ms of slack — a
    // 300 ms threshold left only 225 ms and flaked under box load (one
    // failure observed in ~30 soak runs); production thresholds are hours
    val staleMs = 1200L
    val owner = new Thread(() =>
      graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs) {
        entered.countDown(); release.await()
      })
    owner.start()
    entered.await()
    // hold well past the stale threshold: the heartbeat (threshold/4)
    // keeps the mtime fresh, so a second writer judging by the SAME
    // threshold must still refuse instead of taking over
    Thread.sleep(3 * staleMs)
    val e = intercept[IllegalStateException](
      graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs)(()))
    assert(e.getMessage.contains("another writer holds"))
    release.countDown(); owner.join()
    assert(!Files.exists(Paths.get(s"$store.lock")))
  }

  test("writer lock: a heartbeat firing between a rival's age-check and its takeover move loses the rival, not the holder") {
    // The exact interleaving that broke r12, latch-sequenced: the rival
    // age-checks a stale-LOOKING lock (the holder's beats had stalled),
    // then the holder's heartbeat fires, THEN the rival proceeds. The r12
    // rename-based takeover moved the just-refreshed lock aside anyway;
    // the mutex-serialized takeover must re-read the age under the mutex,
    // see the beat's fresh mtime, and throw lost-race — holder unharmed.
    val store = fresh("lockbeatrace")
    val staleMs = 100000L // beat interval staleMs/4 is huge: WE fire the beat
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs) {
        entered.countDown(); release.await()
      })
    holder.start()
    entered.await()
    val lock = Paths.get(s"$store.lock")
    // simulate a stalled-beat holder: age the live lock past the threshold
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * staleMs))
    val sawStale = new java.util.concurrent.CountDownLatch(1)
    val beatFired = new java.util.concurrent.CountDownLatch(1)
    graft.ops.StoreLifecycle.takeoverPause = () => {
      sawStale.countDown()
      beatFired.await() // hold the rival between its age-check and its move
    }
    try {
      val rivalErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val rival = new Thread(() =>
        try graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs)(())
        catch { case t: Throwable => rivalErr.set(t) })
      rival.start()
      sawStale.await() // rival has age-checked: it believes the lock is stale
      // the holder's heartbeat fires NOW (mtime refreshed to current)
      Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis()))
      beatFired.countDown() // rival resumes its takeover
      rival.join()
      assert(rivalErr.get() != null, "the rival must lose, not enter")
      assert(rivalErr.get().getMessage.contains("lost the takeover race"))
      assert(Files.exists(lock), "the holder's refreshed lock must survive the rival")
      release.countDown(); holder.join()
      assert(!Files.exists(lock), "the holder still owns and releases its lock")
    } finally graft.ops.StoreLifecycle.takeoverPause = () => ()
  }

  test("writer lock: a PRE-SEEDED stale takeover mutex under the 8-rival stale-lock race — exactly one writer inside") {
    // The adversarial spec that killed two designs: r13's delete+recreate
    // mutex cleanup let two rivals each delete the other's fresh
    // re-creation, and the rename-aside-with-restore replacement could
    // vacate the mutex path mid-restore and admit a third creator (both
    // reproduced here as "2 writers inside"). Under the flock mutex the
    // pre-seeded file is an inert rendezvous — the kernel arbitrates.
    // Both the lock AND its mutex file start stale (crashed holder +
    // crashed taker), 8 rivals race.
    for (round <- 1 to 3) {
      val store = fresh(s"mutexstale$round")
      Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
      val lock = Paths.get(s"$store.lock")
      val mutex = Paths.get(s"$store.lock.takeover")
      val past = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs)
      Files.createFile(lock); Files.setLastModifiedTime(lock, past)
      Files.createFile(mutex); Files.setLastModifiedTime(mutex, past)
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
      val winners = new java.util.concurrent.atomic.AtomicInteger(0)
      val start = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          start.await()
          try graft.ops.StoreLifecycle.withWriterLock(store) {
            val now = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, now))
            Thread.sleep(30)
            inside.decrementAndGet()
            winners.incrementAndGet()
          } catch { case _: IllegalStateException => () }
        })
      }
      threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())
      assert(winners.get() >= 1, s"round $round: the stale lock must be taken over")
      assert(maxInside.get() === 1,
        s"round $round: ${maxInside.get()} writers inside concurrently — the stale-mutex cleanup raced")
      assert(!Files.exists(lock))
      // no trash/claim orphans. The bare mutex MAY remain in one narrow
      // legal outcome: a loser that moved a winner's fresh re-creation
      // restores it (safety over litter — it ages out); everything else
      // must be cleaned.
      val litter = Paths.get(store).toAbsolutePath.getParent.toFile.listFiles()
        .filter(f => f.getName.startsWith(s"mutexstale$round.lock") &&
          f.toPath != mutex)
      assert(litter.isEmpty, s"round $round protocol litter: ${litter.map(_.getName).mkString(",")}")
      Files.deleteIfExists(mutex)
    }
  }

  test("writer lock: a claimant parked pre-REPLACE holds the mutex — a second rival loses deterministically, never double-enters") {
    // The pre-REPLACE point inside the mutexed section is where every
    // historical breach materialized (r12 TOCTOU; the r13 mutex-file
    // cleanups — both delete+recreate and rename-aside-with-restore —
    // could vacate the mutex path and admit a second claimant here,
    // reproduced by the 8-rival spec). With the flock mutex: park rival #1
    // pre-REPLACE (flock held, lock pinned stale), then prove rival #2
    // cannot acquire the mutex and loses — even with a pre-seeded orphan
    // rendezvous file standing in for a crashed taker's leftovers.
    val store = fresh("mutexdet")
    Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
    val lock = Paths.get(s"$store.lock")
    val mutex = Paths.get(s"$store.lock.takeover")
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs)
    Files.createFile(lock); Files.setLastModifiedTime(lock, past)
    // a crashed taker's leftover rendezvous file, aged stale: under the
    // flock design it is inert (the corpse's kernel lock died with it)
    Files.createFile(mutex); Files.setLastModifiedTime(mutex, past)
    val claimParked = new java.util.concurrent.atomic.AtomicInteger(0)
    val proceedClaim = new java.util.concurrent.CountDownLatch(1)
    graft.ops.StoreLifecycle.claimPause = () => {
      claimParked.incrementAndGet(); proceedClaim.await()
    }
    try {
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
      val entered = new java.util.concurrent.atomic.AtomicInteger(0)
      val lostRace = new java.util.concurrent.atomic.AtomicInteger(0)
      val finished = new java.util.concurrent.atomic.AtomicInteger(0)
      def rival() = new Thread(() => {
        try graft.ops.StoreLifecycle.withWriterLock(store) {
          val now = inside.incrementAndGet()
          maxInside.updateAndGet(m => math.max(m, now))
          Thread.sleep(30)
          inside.decrementAndGet()
          entered.incrementAndGet()
        } catch {
          case e: IllegalStateException =>
            assert(e.getMessage.contains("lost the takeover race"))
            lostRace.incrementAndGet()
        } finally finished.incrementAndGet()
      })
      val deadline = System.currentTimeMillis() + 30000
      val r1 = rival(); r1.start() // rival #1: takeover → parks pre-REPLACE
      while (claimParked.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      assert(claimParked.get() === 1, "rival #1 must reach the claim point")
      val r2 = rival(); r2.start() // rival #2 races a HELD mutex + stale lock
      // #2 must die of lost-race WITHOUT ever reaching the claim point
      while (finished.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(5)
      val concurrentClaimants = claimParked.get()
      proceedClaim.countDown()
      r1.join(); r2.join()
      assert(concurrentClaimants === 1,
        s"$concurrentClaimants claimants reached the pre-REPLACE point concurrently — the mutex admitted two")
      assert(entered.get() === 1, s"${entered.get()} rivals entered — exactly one must win the claim")
      assert(lostRace.get() === 1, "the mutex loser must throw lost-race")
      assert(maxInside.get() === 1)
      assert(!Files.exists(lock))
      Files.deleteIfExists(mutex) // tests may clean the rendezvous; prod never does
    } finally graft.ops.StoreLifecycle.claimPause = () => ()
  }

  test("writer lock: an orphaned FRESH takeover mutex cannot get a live holder's lock stolen") {
    // ADVICE r13: a taker that died inside its ms critical section leaves
    // a mutex leftover that (under the r13 file-based design) blocked the
    // holder's heartbeat until the unrefreshed lock aged into takeover
    // eligibility — a stray file getting a HEALTHY holder's lock stolen.
    // Under the flock design the leftover FILE carries no lock (the
    // kernel released the corpse's flock), so the beat is never starved;
    // the mtime refresher below keeps the file looking maximally "alive"
    // to prove no mtime heuristic on the mutex remains in play.
    val store = fresh("mutexorphan")
    val staleMs = 1200L
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val owner = new Thread(() =>
      graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs) {
        entered.countDown(); release.await()
      })
    owner.start()
    entered.await()
    val mutex = Paths.get(s"$store.lock.takeover")
    try Files.createFile(mutex) catch { case _: java.nio.file.FileAlreadyExistsException => () }
    val refresher = new Thread(() => {
      try while (!Thread.interrupted()) {
        Thread.sleep(100)
        try Files.setLastModifiedTime(mutex, java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis()))
        catch { case _: java.io.IOException => () }
      } catch { case _: InterruptedException => () }
    })
    refresher.setDaemon(true); refresher.start()
    try {
      Thread.sleep(3 * staleMs) // well past the stale threshold
      val e = intercept[IllegalStateException](
        graft.ops.StoreLifecycle.withWriterLock(store, staleAfterMs = staleMs)(()))
      assert(e.getMessage.contains("another writer holds"),
        "the live holder must still refuse rivals despite the orphaned mutex")
    } finally { refresher.interrupt(); refresher.join() }
    release.countDown(); owner.join()
    // the orphan file carries no flock, so release acquires the mutex
    // normally and deletes the holder's lock
    assert(!Files.exists(Paths.get(s"$store.lock")),
      "release must clean the lock — the orphan rendezvous file never held it")
    Files.deleteIfExists(mutex) // tests may clean the rendezvous; prod never does
  }

  test("heartbeat fallback never re-owns a stolen lock — token-verified touch leaves a foreign lock byte-for-byte and mtime alone") {
    // The ONE mtime write outside the takeover mutex (the busy>=6
    // starvation fallback) is touchIfOwned; pin its contract so a future
    // refactor cannot widen the window: against a lock whose content is a
    // FOREIGN token (a landed takeover), the touch must change neither
    // content nor mtime and must tell the beat to stop.
    val store = fresh("touchstolen")
    Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
    val lock = Paths.get(s"$store.lock")
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 5000)
    // 1) stolen: the path holds the NEW owner's token
    Files.writeString(lock, "new-owner-token")
    Files.setLastModifiedTime(lock, past)
    assert(!graft.ops.StoreLifecycle.touchIfOwned(lock, "old-owner-token"),
      "a foreign token must stop the beat")
    assert(Files.readString(lock) === "new-owner-token",
      "the stolen lock's content must never regress to the old owner")
    assert(Files.getLastModifiedTime(lock) === past,
      "the stolen lock's mtime must not be freshened by the old owner's beat")
    // 2) still ours: the touch freshens mtime, content untouched
    Files.writeString(lock, "old-owner-token")
    Files.setLastModifiedTime(lock, past)
    assert(graft.ops.StoreLifecycle.touchIfOwned(lock, "old-owner-token"))
    assert(Files.getLastModifiedTime(lock).toMillis > past.toMillis,
      "an owned lock's mtime must be freshened")
    assert(Files.readString(lock) === "old-owner-token")
    // 3) gone (released under us): definitive stop
    Files.delete(lock)
    assert(!graft.ops.StoreLifecycle.touchIfOwned(lock, "old-owner-token"))
  }

  test("crashed-taker .claim-* orphans are swept at threshold/16, not the full stale age") {
    // r14 verdict cosmetic item: live claims exist for milliseconds (they
    // are staged INSIDE the held mutex), so hour-old sweep litter served
    // nothing. A claim older than threshold/16 but far younger than the
    // threshold must be swept by the next takeover's mutexed section.
    val store = fresh("claimsweep")
    Files.createDirectories(Paths.get(store).toAbsolutePath.getParent)
    val lock = Paths.get(s"$store.lock")
    Files.writeString(lock, "crashed-owner")
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
    val orphan = Paths.get(s"$store.lock.claim-deadbeef")
    Files.writeString(orphan, "crashed-taker")
    // aged past threshold/16 (the sweep age) but well under the threshold
    // (the r14 sweep age, under which this orphan lingered a full hour)
    Files.setLastModifiedTime(orphan, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - graft.ops.StoreLifecycle.DefaultStaleAfterMs / 8))
    graft.ops.StoreLifecycle.publish(store)(writeStore(_, "recovered"))
    assert(readStore(store) === "recovered")
    assert(!Files.exists(orphan), "the sub-threshold claim orphan must be swept")
    assert(!Files.exists(lock))
  }

  test("writer lock is reentrant per thread — composed verbs on one root acquire once") {
    val store = fresh("lockreenter")
    graft.ops.StoreLifecycle.withWriterLock(store) {
      // e.g. the triage append holds the root while the band append and the
      // embedded publish run on the same path
      graft.ops.StoreLifecycle.publish(store)(writeStore(_, "nested"))
      assert(Files.exists(Paths.get(s"$store.lock")),
        "the outer acquisition still holds after the nested verb returns")
    }
    assert(readStore(store) === "nested")
    assert(!Files.exists(Paths.get(s"$store.lock")))
  }
}
