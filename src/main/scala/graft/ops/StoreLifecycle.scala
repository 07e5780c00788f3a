package graft.ops

/** The stored-index family's ONE publication discipline — extracted from
  * the per-store hand-rolled copies (band / span / paragraph / line-df /
  * winnow / IVF / Bloom / quality-model stores) so the build and compact
  * verbs of every store share a single, drift-proof implementation:
  *
  *   1. the new layout is FULLY written into a `.next-<uuid>` side
  *      directory beside the live store (Spark writes, driver-side file
  *      writes — the builder never touches the live path);
  *   2. the swap is two atomic renames: live → `.old`, next → live;
  *   3. `.old` is deleted after the swap lands.
  *
  * A crash anywhere leaves either the untouched live store (before the
  * first rename) or a recoverable `.old` beside the new live one — never a
  * half-written live index; a leftover `.old` or `.next-*` from a crashed
  * prior run is swept before the next swap. Probes racing a swap keep
  * reading whichever snapshot their query planned against (local-FS
  * rename semantics; on an object store the same discipline rides the
  * store's atomic-rename or versioned-prefix primitive).
  *
  * Single-writer contract, shared by every store verb that mutates
  * (build / append / compact): one owner runs the daily loop. The swap
  * protects READERS against torn state; two concurrent WRITERS are a
  * lost-update race by construction (last publish wins one increment's
  * rows/bits away) — ENFORCED since r12 by [[withWriterLock]]: every
  * mutating verb takes a create-exclusive `<store>.lock` sibling file for
  * its duration, so a second concurrent writer REFUSES LOUDLY instead of
  * silently losing an update. A lock left by a crashed process is taken
  * over once it is older than `staleAfterMs` (or removed by the
  * operator); a LIVE holder heartbeats the lock's mtime at a quarter of
  * the threshold, so a healthy verb that runs longer than `staleAfterMs`
  * (a multi-hour 100 TB build) can never have its lock stolen mid-run —
  * age-based takeover only ever fires on a holder that stopped beating.
  */
object StoreLifecycle {
  private def path(s: String) = java.nio.file.Paths.get(s)

  /** Default stale age for crashed-writer takeover: long enough that no
    * healthy verb on this family's stores holds a lock that long. */
  val DefaultStaleAfterMs: Long = 60L * 60 * 1000

  // locks held by THIS thread — nested verbs under one owner (the triage
  // append runs the band append on the same root; every build/compact
  // runs publish) re-enter instead of self-deadlocking
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Run `body` holding the store's writer lock (`<store>.lock`, a
    * SIBLING of the store root — the root itself is renamed during
    * swaps). Create-exclusive acquisition: a live second writer gets a
    * loud IllegalStateException naming the lock; a lock older than
    * `staleAfterMs` is presumed crashed and taken over (the takeover
    * itself re-races through create-exclusive, so two takeover attempts
    * cannot both win). Reentrant per thread, so composed verbs on one
    * root acquire once. */
  def withWriterLock[T](storeDir: String,
                        staleAfterMs: Long = DefaultStaleAfterMs)(body: => T): T = {
    val canonical = path(storeDir).toAbsolutePath.normalize.toString
    if (held.get.contains(canonical)) body
    else {
      val lock = path(s"$canonical.lock")
      acquire(lock, staleAfterMs)
      // HEARTBEAT: a healthy verb that legitimately outlives the stale
      // threshold (a multi-hour 100 TB build) must not age into takeover
      // eligibility mid-run — a daemon refreshes the lock's mtime at a
      // quarter of the threshold, so takeover only ever fires on a holder
      // that stopped beating (crashed/hung), never on a live one
      val beat = new Thread(() => {
        try {
          var live = true
          while (live && !Thread.interrupted()) {
            Thread.sleep(math.max(50L, staleAfterMs / 4))
            // a TRANSIENT touch failure (NFS blip) must not kill the
            // beat — a dead heartbeat re-exposes a healthy multi-hour
            // holder to stale-age takeover; only a lock that is truly
            // GONE (released/stolen) ends the loop
            try java.nio.file.Files.setLastModifiedTime(lock,
              java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
            catch {
              case _: java.io.IOException =>
                live = java.nio.file.Files.exists(lock)
            }
          }
        } catch {
          case _: InterruptedException => () // released
        }
      }, s"graft-lock-heartbeat-${path(storeDir).getFileName}")
      beat.setDaemon(true)
      beat.start()
      held.set(held.get + canonical)
      try body
      finally {
        held.set(held.get - canonical)
        beat.interrupt()
        java.nio.file.Files.deleteIfExists(lock); ()
      }
    }
  }

  private def acquire(lock: java.nio.file.Path, staleAfterMs: Long): Unit = {
    val parent = lock.toAbsolutePath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    try { java.nio.file.Files.createFile(lock); () }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val age =
          try System.currentTimeMillis() -
            java.nio.file.Files.getLastModifiedTime(lock).toMillis
          catch { case _: java.io.IOException => Long.MaxValue } // vanished: retry below
        if (age <= staleAfterMs)
          throw new IllegalStateException(
            s"another writer holds $lock (age ${age} ms <= stale threshold " +
              s"$staleAfterMs ms) — store verbs are single-writer; wait for " +
              "the owner, or remove the lock if its process is dead")
        // stale: take over by atomically MOVING the dead writer's lock
        // aside — rename, not delete-then-create: a deleteIfExists here
        // could remove a RIVAL taker's freshly created lock (both rivals
        // saw the same stale file), letting two writers win. Exactly one
        // mover succeeds; the loser's move throws and fails loudly.
        val tomb = lock.resolveSibling(
          s"${lock.getFileName}.stale-${java.util.UUID.randomUUID().toString.take(8)}")
        try java.nio.file.Files.move(lock, tomb)
        catch {
          case _: java.io.IOException =>
            throw new IllegalStateException(
              s"lost the takeover race for stale $lock — another writer is live")
        }
        java.nio.file.Files.deleteIfExists(tomb)
        try { java.nio.file.Files.createFile(lock); () }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new IllegalStateException(
              s"lost the takeover race for stale $lock — another writer is live")
        }
    }
  }

  /** Run `build` against a `.next-<uuid>` side directory (created by the
    * builder's own writes; pass-through path string), then [[swapIn]] it.
    * The live store stays fully readable until the build is complete.
    * Stale `.next-*` siblings from a crashed prior build are swept first
    * (safe under the single-writer contract — no other build can own
    * them), so a failed build's garbage never accumulates. */
  def publish(storeDir: String)(build: String => Unit): Unit =
    withWriterLock(storeDir) {
      sweepStaleNext(storeDir)
      val next = s"$storeDir.next-${java.util.UUID.randomUUID().toString.take(8)}"
      build(next)
      swapIn(storeDir, next)
    }

  /** The ONE reader of the store-meta contract every store writes:
    * require the `_SUCCESS`-last publish marker (refusing a torn root
    * loudly), then parse `meta.txt`'s `k=v` lines. Each store picks its
    * typed fields from the map — one parser, one error text, instead of
    * a per-store hand-rolled copy that drifts. */
  def readMeta(storeDir: String): Map[String, String] = {
    require(java.nio.file.Files.exists(path(s"$storeDir/_SUCCESS")),
      s"no _SUCCESS marker at $storeDir — not a published store")
    new String(java.nio.file.Files.readAllBytes(path(s"$storeDir/meta.txt")),
      "UTF-8").linesIterator.filter(_.contains("="))
      .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
  }

  private def sweepStaleNext(storeDir: String): Unit = {
    val live = path(storeDir).toAbsolutePath
    val parent = live.getParent
    val prefix = s"${live.getFileName}.next-"
    if (parent != null && java.nio.file.Files.isDirectory(parent)) {
      val stale = parent.toFile.listFiles()
      if (stale != null)
        stale.filter(_.getName.startsWith(prefix)).foreach(Scale.deleteRecursively)
    }
  }

  /** The two-rename atomic swap: live → `.old` (skipped on first build),
    * `tmpDir` → live, `.old` deleted. Each rename is atomic; a crash
    * between them leaves a recoverable `.old`, never a torn live store. */
  def swapIn(storeDir: String, tmpDir: String): Unit = {
    val live = path(storeDir)
    val old = path(s"$storeDir.old")
    Scale.deleteRecursively(old.toFile) // a crashed prior swap's leftover
    if (java.nio.file.Files.exists(live))
      java.nio.file.Files.move(live, old,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    java.nio.file.Files.move(path(tmpDir), live,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Scale.deleteRecursively(old.toFile)
  }
}
