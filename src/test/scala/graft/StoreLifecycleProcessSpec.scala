package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Cross-PROCESS writer-lock holder: acquires the store's writer lock,
  * prints `HELD`, sleeps, releases. Run as a separate JVM by
  * [[StoreLifecycleProcessSpec]] — the in-JVM specs share a reentrancy
  * map and a filesystem view; only a second process proves the
  * create-exclusive / atomic-replace protocol across OS process
  * boundaries, which is the deployment shape (concurrent store verbs are
  * separate Spark drivers, not threads). */
object LockHolderMain {
  def main(args: Array[String]): Unit = {
    val store = args(0)
    val holdMs = args(1).toLong
    graft.ops.StoreLifecycle.withWriterLock(store) {
      println("HELD"); Console.flush()
      Thread.sleep(holdMs)
    }
    println("RELEASED"); Console.flush()
  }
}

/** Cross-PROCESS mid-swap crasher: publishes a v2 build but parks forever
  * BETWEEN [[graft.ops.StoreLifecycle.swapIn]]'s two renames (live already
  * moved to `.old`, the new build not yet moved in) — the parent spec
  * kill -9s it there, leaving the torn window an OS crash would: no live
  * root, `.old` = last good store, the crashed holder's lock behind. */
object SwapCrashMain {
  def main(args: Array[String]): Unit = {
    val store = args(0)
    graft.ops.StoreLifecycle.swapPause = () => {
      println("MIDSWAP"); Console.flush()
      Thread.sleep(600000) // killed here
    }
    graft.ops.StoreLifecycle.publish(store) { tmp =>
      java.nio.file.Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data.txt"), "v2-mid-crash")
      Files.writeString(Paths.get(s"$tmp/meta.txt"), "v=2\n")
      Files.write(Paths.get(s"$tmp/_SUCCESS"), Array.empty[Byte])
    }
  }
}

/** Cross-PROCESS stale-takeover racer: waits for the parent's go-file
  * (so two racers attempt the SAME pre-aged stale lock near-simultaneously
  * across JVM boundaries), then tries to acquire. The winner prints `WON`,
  * holds long enough that the rival's attempt lands while held, and
  * releases; the loser prints `LOST <message>` from the loud
  * IllegalStateException — either the mutex lost-race or, if it arrived
  * after the winner's REPLACE landed, the fresh-lock refusal. */
object StaleRaceMain {
  def main(args: Array[String]): Unit = {
    val store = args(0)
    val goFile = args(1)
    println("READY"); Console.flush()
    while (!Files.exists(Paths.get(goFile))) Thread.sleep(2)
    try {
      graft.ops.StoreLifecycle.withWriterLock(store) {
        println("WON"); Console.flush()
        Thread.sleep(3000)
      }
      println("EXITED"); Console.flush()
    } catch {
      case e: IllegalStateException =>
        println(s"LOST ${e.getMessage.linesIterator.next()}"); Console.flush()
    }
  }
}

/** The writer-lock protocol across real process boundaries: a live
  * second JVM refuses, a kill -9'd holder's lock survives fresh (refused
  * until stale), and a stale crashed-holder lock is taken over — the
  * exact crashed-writer story the takeover exists for, exercised with an
  * actual dead process instead of a thread standing in for one. */
class StoreLifecycleProcessSpec extends AnyFunSuite {
  private val root = "/tmp/graft-lifecycle-proc"

  private def fresh(name: String): String = {
    graft.ops.Scale.deleteRecursively(new java.io.File(root))
    Files.createDirectories(Paths.get(root))
    s"$root/$name"
  }

  private def spawnHolder(store: String, holdMs: Long): Process =
    spawn("graft.LockHolderMain", store, holdMs.toString)

  private def spawn(mainClass: String, args: String*): Process = {
    val java = s"${System.getProperty("java.home")}/bin/java"
    val pb = new ProcessBuilder(
      (Seq(java, "-cp", System.getProperty("java.class.path"), mainClass)
        ++ args): _*)
    pb.redirectErrorStream(true)
    pb.start()
  }

  /** Block until the subprocess prints `marker` (its acquisition point). */
  private def awaitMarker(p: Process, marker: String, timeoutMs: Long): Unit = {
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream))
    val deadline = System.currentTimeMillis() + timeoutMs
    var line = r.readLine()
    while (line != null && !line.contains(marker)) {
      assert(System.currentTimeMillis() < deadline, s"no $marker within ${timeoutMs} ms")
      line = r.readLine()
    }
    assert(line != null, s"holder exited before printing $marker")
  }

  test("cross-process: a second JVM holding the lock refuses this one; release hands it over") {
    val store = fresh("proclive")
    val holder = spawnHolder(store, holdMs = 4000)
    try {
      awaitMarker(holder, "HELD", 30000)
      val e = intercept[IllegalStateException](
        graft.ops.StoreLifecycle.withWriterLock(store)(()))
      assert(e.getMessage.contains("another writer holds"))
      assert(holder.waitFor(30, java.util.concurrent.TimeUnit.SECONDS),
        "holder process must exit")
      assert(!Files.exists(Paths.get(s"$store.lock")),
        "the holder's release must remove the lock")
      // and the lock is free for this process now
      graft.ops.StoreLifecycle.withWriterLock(store)(())
      assert(!Files.exists(Paths.get(s"$store.lock")))
    } finally { holder.destroyForcibly(); () }
  }

  test("cross-process crash: a kill -9'd holder's lock refuses while fresh, takes over once stale") {
    val store = fresh("proccrash")
    val holder = spawnHolder(store, holdMs = 60000)
    try {
      awaitMarker(holder, "HELD", 30000)
      holder.destroyForcibly()
      assert(holder.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      val lock = Paths.get(s"$store.lock")
      assert(Files.exists(lock), "a killed holder leaves its lock behind")
      // fresh mtime: the crashed lock still refuses (age <= threshold) —
      // takeover must never fire early just because the process is gone
      val e = intercept[IllegalStateException](
        graft.ops.StoreLifecycle.withWriterLock(store)(()))
      assert(e.getMessage.contains("another writer holds"))
      // age it past the threshold: the takeover path claims it
      Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
      var entered = false
      graft.ops.StoreLifecycle.withWriterLock(store) { entered = true }
      assert(entered, "stale crashed-process lock must be taken over")
      assert(!Files.exists(lock))
      // no protocol litter: no .claim-* / .stale-* left behind; the bare
      // `.lock.takeover` rendezvous file is BY DESIGN permanent (a flock
      // file is never unlinked — the flock-unlink race)
      val litter = Paths.get(root).toFile.listFiles()
        .filter(f => (f.getName.contains(".takeover") ||
            f.getName.contains(".claim-") || f.getName.contains(".stale-")) &&
          !f.getName.endsWith(".lock.takeover"))
      assert(litter.isEmpty, s"protocol litter: ${litter.map(_.getName).mkString(",")}")
    } finally { holder.destroyForcibly(); () }
  }

  test("cross-process: two LIVE JVMs racing a pre-aged stale lock — exactly one wins the flock + REPLACE, the loser throws loudly") {
    // The r14 verdict's last uncovered adversary: the in-JVM 8-rival spec
    // proves the mutex within one process; the kernel guarantees exactly
    // one flock winner ACROSS processes — this spec says so with two real
    // second JVMs attempting the same stale takeover simultaneously.
    val store = fresh("procstalerace")
    val lock = Paths.get(s"$store.lock")
    Files.writeString(lock, "crashed-owner-token")
    Files.setLastModifiedTime(lock, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
    val goFile = s"$root/procstalerace.go"
    val r1 = spawn("graft.StaleRaceMain", store, goFile)
    val r2 = spawn("graft.StaleRaceMain", store, goFile)
    try {
      // ONE reader per process for its whole life: a second BufferedReader
      // on the same stream could miss lines the first buffered ahead
      val rd1 = new java.io.BufferedReader(
        new java.io.InputStreamReader(r1.getInputStream))
      val rd2 = new java.io.BufferedReader(
        new java.io.InputStreamReader(r2.getInputStream))
      def awaitReady(rd: java.io.BufferedReader): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        var line = rd.readLine()
        while (line != null && !line.contains("READY")) {
          assert(System.currentTimeMillis() < deadline, "no READY within 30 s")
          line = rd.readLine()
        }
        assert(line != null, "racer exited before READY")
      }
      awaitReady(rd1); awaitReady(rd2)
      Files.write(Paths.get(goFile), Array.empty[Byte]) // both attempt NOW
      def drain(p: Process, rd: java.io.BufferedReader): Seq[String] = {
        assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
          "racer process must exit")
        Iterator.continually(rd.readLine()).takeWhile(_ != null).toSeq
      }
      val (o1, o2) = (drain(r1, rd1), drain(r2, rd2))
      val all = o1 ++ o2
      val wins = all.count(_ == "WON")
      val losses = all.filter(_.startsWith("LOST"))
      assert(wins === 1, s"exactly one racer must win the takeover; output: $all")
      assert(losses.size === 1, s"exactly one racer must lose loudly; output: $all")
      assert(losses.head.contains("lost the takeover race") ||
        losses.head.contains("another writer holds"),
        s"the loser's error must be one of the two loud refusals: ${losses.head}")
      assert(all.contains("EXITED"), "the winner must complete its hold and release")
      assert(!Files.exists(lock), "the winner's release must remove the lock")
      val litter = Paths.get(root).toFile.listFiles()
        .filter(f => f.getName.startsWith("procstalerace.") &&
          f.getName != "procstalerace.go" &&
          f.getName != "procstalerace.lock.takeover") // permanent rendezvous
      assert(litter.isEmpty, s"race litter: ${litter.map(_.getName).mkString(",")}")
    } finally { r1.destroyForcibly(); r2.destroyForcibly(); () }
  }

  test("cross-process crash MID-SWAP: kill -9 between the two renames — probes refuse the torn root loudly, the next publish recovers") {
    val store = fresh("procmidswap")
    def publishV(v: String): Unit =
      graft.ops.StoreLifecycle.publish(store) { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(s"$tmp/data.txt"), v)
        Files.writeString(Paths.get(s"$tmp/meta.txt"), s"v=$v\n")
        Files.write(Paths.get(s"$tmp/_SUCCESS"), Array.empty[Byte])
      }
    publishV("v1")
    assert(graft.ops.StoreLifecycle.readMeta(store)("v") === "v1")
    val crasher = spawn("graft.SwapCrashMain", store)
    try {
      awaitMarker(crasher, "MIDSWAP", 30000)
      crasher.destroyForcibly()
      assert(crasher.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
      // the torn window an OS crash leaves: live root GONE, .old = last
      // good store, the dead holder's lock behind
      assert(!Files.exists(Paths.get(store)), "mid-swap: the live root is gone")
      assert(Files.readString(Paths.get(s"$store.old/data.txt")) === "v1",
        ".old must hold the last good store")
      assert(Files.exists(Paths.get(s"$store.lock")),
        "the killed publisher leaves its lock")
      // a probe NEVER sees a torn root as data: readMeta refuses loudly
      val torn = intercept[IllegalArgumentException](
        graft.ops.StoreLifecycle.readMeta(store))
      assert(torn.getMessage.contains("not a published store"))
      // a rival publish while the crashed lock is FRESH refuses (the
      // crashed-holder contract — takeover only once stale)
      val refused = intercept[IllegalStateException](publishV("v2"))
      assert(refused.getMessage.contains("another writer holds"))
      // age the lock past the threshold: the next publish takes over,
      // sweeps the crash's .old and .next-* garbage, and lands v2
      Files.setLastModifiedTime(Paths.get(s"$store.lock"),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * graft.ops.StoreLifecycle.DefaultStaleAfterMs))
      publishV("v2")
      assert(graft.ops.StoreLifecycle.readMeta(store)("v") === "v2")
      assert(Files.readString(Paths.get(s"$store/data.txt")) === "v2")
      assert(!Files.exists(Paths.get(s"$store.old")), ".old swept by the recovery publish")
      val litter = Paths.get(root).toFile.listFiles()
        .filter(f => f.getName.startsWith("procmidswap.") &&
          f.getName != "procmidswap" &&
          f.getName != "procmidswap.lock.takeover") // permanent rendezvous
      assert(litter.isEmpty, s"crash litter: ${litter.map(_.getName).mkString(",")}")
    } finally { crasher.destroyForcibly(); () }
  }
}
