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
  *
  * Takeover protocol (r13 — the r12 rename-based takeover lost a TOCTOU:
  * a rival that age-checked the OLD stale lock could `move` aside the
  * winner's FRESH lock, because rename cannot re-verify what it moves).
  * Filesystems give no compare-and-swap on mtime, so every mtime
  * DECISION is now serialized through a second create-exclusive file,
  * `<store>.lock.takeover`:
  *
  *   - a TAKEOVER re-reads the lock's age UNDER the mutex and, if still
  *     stale, atomically REPLACES it (`ATOMIC_MOVE + REPLACE_EXISTING`
  *     of a pre-staged claim file) — the lock path is never empty, so a
  *     rival's plain `createFile` cannot slip in mid-takeover;
  *   - the HEARTBEAT touches mtime under the same mutex, so an age read
  *     inside a takeover can never race a live holder's beat;
  *   - RELEASE deletes under the mutex only after verifying the owner
  *     token, so a releasing holder whose lock was legitimately taken
  *     over never deletes the new owner's lock.
  *
  * The lock file's CONTENT is the owner's token (UUID): beat and release
  * verify it, so a holder whose lock was stolen (its beats stalled past
  * `staleAfterMs` — the one documented breach window, a holder the
  * contract already presumes dead) stops beating and leaves the new
  * owner's lock alone instead of fighting over the path.
  *
  * r14 replaces the mutex's ARBITRATION: the `.takeover` sibling is now a
  * permanent rendezvous file locked with an OS ADVISORY FILE LOCK
  * (`FileChannel.tryLock`) instead of a create-exclusive file with its
  * own mtime-staleness recovery. Every recovery protocol for a "stale"
  * mutex FILE — r13's delete+recreate, and the atomic rename-aside with
  * verify-and-restore tried first this round — leaves a window where the
  * path is vacated while a live claimant still believes it holds it,
  * admitting a third creator (the adversarial 8-rival spec REPRODUCED a
  * double-entry through the rename-aside restore). The kernel releases a
  * flock when its holder dies, so the mutex needs no staleness heuristic,
  * no recovery protocol, and a crashed taker can never starve the
  * heartbeat. The r13 residuals close with it:
  *
  *   - stale-mutex recovery races: GONE (no recovery protocol exists);
  *   - orphaned-mutex heartbeat starvation: GONE (a corpse's flock dies
  *     with it); a belt-and-braces token-verified direct touch remains
  *     for pathological live contention;
  *   - release NEVER deletes without the mutex: if the mutex stays busy,
  *     the lock is left to age out (safe-but-slow), closing the
  *     read-token-then-delete race with an in-flight takeover.
  *
  * The LOCK file keeps its r13 lease semantics (mtime age + owner token +
  * heartbeat + REPLACE-takeover) — it must survive holder crashes and be
  * age-adjudicated, which a flock cannot express; only the ms-scale mutex
  * moved to the kernel.
  */
object StoreLifecycle {
  private def path(s: String) = java.nio.file.Paths.get(s)
  import java.nio.file.{Files, Path, FileAlreadyExistsException, NoSuchFileException}

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
      val token = java.util.UUID.randomUUID().toString
      acquire(lock, token, staleAfterMs)
      // HEARTBEAT: a healthy verb that legitimately outlives the stale
      // threshold (a multi-hour 100 TB build) must not age into takeover
      // eligibility mid-run — a daemon refreshes the lock's mtime at a
      // quarter of the threshold, so takeover only ever fires on a holder
      // that stopped beating (crashed/hung), never on a live one. Each
      // touch runs under the takeover mutex, so a takeover's age check
      // can never interleave with a beat (the r12 TOCTOU).
      val beat = new Thread(() => {
        try {
          var live = true
          var busy = 0
          var interval = math.max(50L, staleAfterMs / 4)
          def touchOwn(): Unit = live = touchIfOwned(lock, token)
          while (live && !Thread.interrupted()) {
            Thread.sleep(interval)
            interval = math.max(50L, staleAfterMs / 4)
            tryMutex(lock) match {
              case Some(m) =>
                busy = 0
                try touchOwn() finally m.release()
              case None =>
                // mutex busy (a rival mid-takeover-attempt, or another
                // beat): retry SOON, not a full period later — a skipped
                // tick must not let the mtime age toward the threshold.
                // (A crashed taker cannot block here: the kernel released
                // its flock with the process.)
                interval = math.max(25L, staleAfterMs / 16)
                busy += 1
                if (busy >= 6) {
                  // pathological contention (rivals looping takeover
                  // attempts for ~6 × threshold/16): belt-and-braces —
                  // don't let OUR lock age toward the threshold while
                  // starved. This is the ONE mtime write not serialized
                  // through the mutex; [[touchIfOwned]]'s Scaladoc carries
                  // the benign-consequence proof (token-verified; an
                  // interleaved takeover requires the lock already past
                  // the threshold; worst case freshens the NEW owner's
                  // already-fresh lock once, never re-owns it) and the
                  // "heartbeat fallback never re-owns a stolen lock" spec
                  // pins it.
                  busy = 0
                  touchOwn()
                }
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
        release(lock, token, staleAfterMs)
      }
    }
  }

  /** One token-verified mtime freshen of OUR lock — the beat's single
    * touch primitive, shared by its mutexed path and the busy>=6
    * starvation fallback (the one call site that runs it WITHOUT the
    * takeover mutex). Returns whether the beat should stay alive: false
    * on a definitive verdict (lock gone, or its content is a foreign
    * token — stolen, the new owner beats now); true on success AND on a
    * transient I/O blip (a dead heartbeat re-exposes a healthy multi-hour
    * holder to stale-age takeover, so only definitive verdicts stop it).
    *
    * Why the un-mutexed fallback call is safe (the read-token-then-touch
    * window): the touch is TOKEN-VERIFIED, so it only ever fires after
    * reading our own token at the path; for a takeover to land between
    * that read and the `setLastModifiedTime`, the lock must already be
    * past `staleAfterMs` (takeover fires on stale locks only) — i.e. our
    * beats have been starved for the full threshold, the one documented
    * breach window the contract already presumes fatal. Worst case in
    * that window: the rival's REPLACE lands first and our touch freshens
    * the NEW owner's already-fresh lock once — mtime only, NEVER content,
    * so the stolen lock is never re-written into the old owner's name and
    * ownership cannot regress; the next beat tick reads the foreign token
    * and exits. Spec-pinned ("heartbeat fallback never re-owns a stolen
    * lock"). */
  private[graft] def touchIfOwned(lock: Path, token: String): Boolean =
    readToken(lock) match {
      case Some(t) if t == token =>
        try { Files.setLastModifiedTime(lock,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())); true }
        catch {
          case _: NoSuchFileException => false // released under us
          case _: java.io.IOException => true // indeterminate: keep beating
        }
      case Some(_) => false // stolen: the new owner beats now
      case None => Files.exists(lock) // unreadable ≠ gone
    }

  private def nowMs(): Long = System.currentTimeMillis()

  private def readAgeMs(p: Path): Option[Long] =
    try Some(nowMs() - Files.getLastModifiedTime(p).toMillis)
    catch { case _: java.io.IOException => None } // vanished or unreadable

  private def readToken(p: Path): Option[String] =
    try Some(new String(Files.readAllBytes(p), "UTF-8"))
    catch { case _: java.io.IOException => None }

  /** Test seam: invoked after an acquire observes a stale lock and before
    * it enters the takeover mutex — the adversarial spec interleaves a
    * heartbeat at the exact point that broke the r12 rename takeover. */
  private[graft] var takeoverPause: () => Unit = () => ()

  /** Test seam: invoked INSIDE the takeover's mutexed section, after the
    * age re-check confirms the lock is still stale and before the REPLACE
    * claim — parking here pins the lock in its stale state, so the
    * deterministic mutex-race spec can prove at most one claimant ever
    * reaches this point concurrently (two could, under the r13
    * delete+recreate mutex cleanup). */
  private[graft] var claimPause: () => Unit = () => ()

  /** A held takeover mutex: the open channel + its OS lock. Releasing
    * closes both; the rendezvous FILE is never deleted (see [[tryMutex]]). */
  private final class MutexHold(ch: java.nio.channels.FileChannel,
                                fl: java.nio.channels.FileLock) {
    def release(): Unit = {
      try fl.release() catch { case _: java.io.IOException => () }
      try ch.close() catch { case _: java.io.IOException => () }
    }
  }

  /** The serialization point for every mtime DECISION (takeover age
    * re-check, heartbeat touch, release-delete): an OS ADVISORY FILE LOCK
    * (`FileChannel.tryLock`) on a permanent `<lock>.takeover` rendezvous
    * sibling.
    *
    * Why a flock and not a lock FILE (r14): the r13 design arbitrated the
    * mutex with its own create-exclusive file plus mtime-staleness
    * recovery, and EVERY recovery protocol for a "stale" mutex file —
    * delete+recreate (r13) and atomic rename-aside with verify-and-restore
    * (tried this round) — leaves a window in which the path is vacated
    * while a live claimant still believes it holds it, admitting a third
    * creator: the adversarial 8-rival spec REPRODUCED a double-entry
    * through the rename-aside restore. An OS flock has exactly the
    * semantics a millisecond-scale mutex needs and none of those failure
    * modes: the kernel releases it when its holder dies (no staleness
    * heuristic, no recovery protocol, no orphan starvation of the
    * heartbeat), and acquisition has exactly one winner across processes
    * and threads. The rendezvous FILE is NEVER deleted — unlinking and
    * recreating a flock file lets two holders lock two different inodes
    * of the same path (the classic flock-unlink race); one empty sibling
    * per store root is the entire footprint. The LOCK file keeps its
    * mtime+token lease semantics (it must survive holder crashes and be
    * age-adjudicated); only the mutex arbitration changes. */
  private def tryMutex(lock: Path): Option[MutexHold] = {
    val mutex = lock.resolveSibling(s"${lock.getFileName}.takeover")
    val ch =
      try java.nio.channels.FileChannel.open(mutex,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      catch { case _: java.io.IOException => return None }
    val fl =
      try ch.tryLock()
      catch {
        // held by another thread of THIS JVM (beat vs release contention)
        case _: java.nio.channels.OverlappingFileLockException => null
        case _: java.io.IOException => null
      }
    if (fl == null) {
      try ch.close() catch { case _: java.io.IOException => () }
      None
    } else Some(new MutexHold(ch, fl))
  }

  private def lostRace(lock: Path): Nothing =
    throw new IllegalStateException(
      s"lost the takeover race for stale $lock — another writer is live")

  private def acquire(lock: Path, token: String, staleAfterMs: Long): Unit = {
    val parent = lock.toAbsolutePath.getParent
    if (parent != null) Files.createDirectories(parent)
    def createOwn(): Boolean =
      try { Files.write(lock, token.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW); true }
      catch { case _: FileAlreadyExistsException => false }
    if (!createOwn()) {
      val age = readAgeMs(lock).getOrElse(Long.MaxValue) // vanished: re-race under the mutex
      if (age <= staleAfterMs)
        throw new IllegalStateException(
          s"another writer holds $lock (age ${age} ms <= stale threshold " +
            s"$staleAfterMs ms) — store verbs are single-writer; wait for " +
            "the owner, or remove the lock if its process is dead")
      takeoverPause()
      // stale: take over UNDER the mutex. Beats touch mtime under the same
      // mutex, so the age re-read below cannot race a live holder's beat —
      // the r12 defect, where a rival age-checked the OLD stale lock and
      // then renamed aside whatever file was at the path by move time.
      val mutex = tryMutex(lock).getOrElse(lostRace(lock))
      try {
        readAgeMs(lock) match {
          case Some(a) if a <= staleAfterMs => lostRace(lock) // beat fired / rival won
          case Some(_) =>
            claimPause()
            // still stale under the mutex: REPLACE atomically with a
            // pre-staged claim carrying our token — the lock path is never
            // empty, so no rival's plain createFile can slip in mid-takeover.
            // A taker that crashed between staging and moving its claim
            // left a .claim-* orphan — swept here. We hold the mutex, and
            // claims are staged INSIDE it, so any claim visible now is
            // orphaned by construction; the age guard (threshold/16, the
            // beat's busy-retry granularity) is clock-skew belt-and-braces
            // only. Live claims exist for milliseconds — an hour-old sweep
            // age just let litter linger (r14 verdict's cosmetic item).
            val parentDir = lock.toAbsolutePath.getParent
            val claimPrefix = s"${lock.getFileName}.claim-"
            Option(parentDir.toFile.listFiles()).getOrElse(Array.empty)
              .filter(f => f.getName.startsWith(claimPrefix) &&
                readAgeMs(f.toPath).exists(_ > math.max(1L, staleAfterMs / 16)))
              .foreach(f => Files.deleteIfExists(f.toPath))
            val claim = lock.resolveSibling(
              s"${lock.getFileName}.claim-${token.take(8)}")
            Files.write(claim, token.getBytes("UTF-8"))
            try Files.move(claim, lock,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            catch {
              case e: java.io.IOException =>
                Files.deleteIfExists(claim)
                throw new IllegalStateException(
                  s"takeover replace failed for stale $lock", e)
            }
          case None =>
            // the stale lock vanished (its owner released): plain exclusive
            // create still decides — a concurrent fresh writer may win it
            if (!createOwn()) lostRace(lock)
        }
      } finally mutex.release()
    }
  }

  /** Token-verified release: delete only a lock we still own, under the
    * mutex, so a holder whose lock was legitimately taken over (beats
    * stalled past the threshold) never deletes the NEW owner's lock. A
    * mutex held by an in-flight takeover clears in milliseconds — retry
    * briefly; if it never clears there is NO safe delete (read-token-
    * then-delete without the mutex is read-then-act: a takeover landing
    * between them would lose the NEW owner's lock), so the lock is left
    * to age into takeover after `staleAfterMs` — the same safe-but-slow
    * stance as an unreadable token. */
  private def release(lock: Path, token: String, staleAfterMs: Long): Unit = {
    var tries = 0
    var m = tryMutex(lock)
    while (m.isEmpty && tries < 200) {
      Thread.sleep(5); tries += 1
      m = tryMutex(lock)
    }
    // POSITIVE verification only: an unreadable token (transient I/O)
    // leaves the lock behind rather than risking the new owner's
    m.foreach { h =>
      try { if (readToken(lock).contains(token)) Files.deleteIfExists(lock); () }
      finally h.release()
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

  /** Test seam: invoked between the swap's two renames — the cross-process
    * crash spec parks a second JVM here and kill -9s it, proving the torn
    * window (live gone, `.old` = last good store) refuses probes loudly
    * and the next publish recovers. */
  private[graft] var swapPause: () => Unit = () => ()

  /** The two-rename atomic swap: live → `.old` (skipped on first build),
    * `tmpDir` → live, `.old` deleted. Each rename is atomic; a crash
    * between them leaves a recoverable `.old`, never a torn live store. */
  def swapIn(storeDir: String, tmpDir: String): Unit = {
    val live = path(storeDir)
    val old = path(s"$storeDir.old")
    Scale.deleteRecursively(old.toFile) // a crashed prior swap's leftover
    if (java.nio.file.Files.exists(live)) {
      java.nio.file.Files.move(live, old,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      swapPause()
    }
    java.nio.file.Files.move(path(tmpDir), live,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Scale.deleteRecursively(old.toFile)
  }
}
