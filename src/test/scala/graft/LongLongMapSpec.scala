package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.LongLongMap

/** Focused spec for the primitive union-find map (r16, ADVICE r15): the
  * map must behave exactly like mutable.HashMap[Long, Long] under the
  * operations the single-task union-find finisher performs — update,
  * getOrElse, contains, keysSnapshot — including growth across many
  * resizes, adversarial keys (0, Long.MinValue/MaxValue, consecutive
  * ids), and value overwrites. */
class LongLongMapSpec extends AnyFunSuite {

  test("randomized parity with mutable.HashMap across growth and overwrites") {
    val rnd = new scala.util.Random(20260818L)
    val m = new LongLongMap()
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    // keyspace small enough to force frequent overwrites, large enough to
    // force several resizes from the 16-slot floor
    val keys = Array.fill(50000)(rnd.nextLong() % 8000)
    keys.foreach { k =>
      val v = rnd.nextLong()
      m.update(k, v); ref.update(k, v)
      // interleaved reads on a random existing/missing key
      val probe = rnd.nextLong() % 8000
      assert(m.getOrElse(probe, Long.MinValue + 1) ===
        ref.getOrElse(probe, Long.MinValue + 1))
      assert(m.contains(probe) === ref.contains(probe))
    }
    assert(m.size === ref.size)
    assert(m.keysSnapshot.sorted.toSeq === ref.keys.toSeq.sorted)
    ref.foreach { case (k, v) => assert(m.getOrElse(k, v - 1) === v) }
  }

  test("adversarial keys: 0, MinValue, MaxValue, dense consecutive runs") {
    val m = new LongLongMap()
    val ks = Seq(0L, Long.MinValue, Long.MaxValue, -1L, 1L) ++ (100L to 400L)
    ks.zipWithIndex.foreach { case (k, i) => m.update(k, i.toLong) }
    ks.zipWithIndex.foreach { case (k, i) =>
      assert(m.contains(k))
      assert(m.getOrElse(k, -999L) === i.toLong)
    }
    assert(!m.contains(999999L))
    assert(m.getOrElse(999999L, -7L) === -7L)
    assert(m.size === ks.size)
    assert(m.keysSnapshot.sorted.toSeq === ks.sorted)
  }

  test("keysSnapshot is immune to value writes during iteration (the r15 HashMap bug class)") {
    val m = new LongLongMap()
    (1L to 1000L).foreach(k => m.update(k, k))
    val snap = m.keysSnapshot
    // mutate every value mid-"iteration" the way find()'s path compression
    // does, then confirm the snapshot still yields every key exactly once
    snap.foreach(k => m.update(k, 1L))
    assert(snap.sorted.toSeq === (1L to 1000L).toSeq)
    assert(m.size === 1000)
    assert((1L to 1000L).forall(k => m.getOrElse(k, -1L) == 1L))
  }
}
