package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.BloomDedup
import graft.streaming.{DocIn, DocStreams}

class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  // deterministic fuzz corpus: `n` docs, ids offset, roughly `dupEvery`-th
  // doc reuses an earlier PREFIX (first 80 chars) with a distinct tail —
  // exercising exactly the content-key space the gate answers
  private def fuzz(n: Int, offset: Long, seed: Int,
                   prefixPool: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val pfx = s"prefix-${rnd.nextInt(prefixPool)}-" + ("x" * 70)
      (offset + i, s"${pfx.take(80)} tail-$seed-$i-${rnd.nextInt(1000)}")
    }
  }

  test("gate: exact_dup matches the key join, no false negatives, fp flag true") {
    val shared = "the very same eighty-character prefix " + ("p" * 50)
    val hist = docsDf(1L -> s"${shared.take(80)} old tail",
      2L -> ("completely different history doc " + ("h" * 60)))
    val inc = docsDf(10L -> s"${shared.take(80)} NEW tail", // prefix dup
      11L -> ("fresh incoming document " + ("f" * 60)))
    val out = BloomDedup.exactBloomGate(hist, inc, expectedItems = 100)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)))
    assert(out.toSeq === Seq((10L, true, false, true), (11L, false, false, true)))
  }

  test("no false negatives over a 600-doc fuzz corpus (structural guarantee)") {
    // 300 history + 300 incoming over a 120-prefix pool → dense cross-slice
    // key collisions; every exact dup MUST be a bloom hit
    val hist = docsDf(fuzz(300, 0, seed = 7, prefixPool = 120): _*)
    val inc = docsDf(fuzz(300, 1000, seed = 8, prefixPool = 120): _*)
    val out = BloomDedup.exactBloomGate(hist, inc, expectedItems = 300).collect()
    val dups = out.count(_.getBoolean(1))
    assert(dups > 50, s"fixture degenerated: only $dups exact dups")
    assert(out.forall(!_.getBoolean(2)), "a true duplicate slipped the gate")
  }

  test("measured FP rate within 3x fpp on a tightly-sized filter") {
    // filter sized to EXACTLY its content (no slack hiding the FP rate):
    // 2000 history keys, 2000 disjoint probe keys, fpp = 1%
    val hist = docsDf((0 until 2000).map(i =>
      (i.toLong, s"hist-key-$i " + ("a" * 70))): _*)
    val inc = docsDf((0 until 2000).map(i =>
      (10000L + i, s"probe-key-$i " + ("b" * 70))): _*)
    val bytes = BloomDedup.buildFilterBytes(hist, expectedItems = 2000, fpp = 0.01)
    val hits = BloomDedup.probe(inc, bytes).filter(col("bloom_hit")).count()
    assert(hits <= 60, s"FP rate ${hits / 2000.0} above 3x fpp")
    // and the gate's oracle-checked flag agrees
    val flag = BloomDedup.exactBloomGate(hist, inc, expectedItems = 2000)
      .select("fp_within_bound").distinct().collect()
    assert(flag.map(_.getBoolean(0)).toSeq === Seq(true))
  }

  test("append == rebuild byte-for-byte (bitwise OR store merge)") {
    val a = docsDf(fuzz(200, 0, seed = 3, prefixPool = 500): _*)
    val b = docsDf(fuzz(200, 500, seed = 4, prefixPool = 500): _*)
    val base = java.nio.file.Files.createTempDirectory("bloomstore").toString
    BloomDedup.buildBloomStore(a, s"$base/incr", expectedItems = 1000)
    BloomDedup.appendToBloomStore(b, s"$base/incr")
    BloomDedup.buildBloomStore(a.union(b), s"$base/full", expectedItems = 1000)
    val incr = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/incr/bloom.bin"))
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/full/bloom.bin"))
    assert(java.util.Arrays.equals(incr, full),
      "merged store bytes differ from a from-scratch rebuild")
  }

  test("stored gate equals the in-line gate on the fixture split") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val hist = docs.filter(col("doc_id") % 7 =!= 0)
    val inc = docs.filter(col("doc_id") % 7 === 0)
    val base = java.nio.file.Files.createTempDirectory("bloomstore").toString
    BloomDedup.buildBloomStore(hist.filter(col("doc_id") % 2 === 1),
      s"$base/s", expectedItems = 1000000L)
    BloomDedup.appendToBloomStore(hist.filter(col("doc_id") % 2 === 0), s"$base/s")
    val stored = BloomDedup.gateStored(inc, s"$base/s", hist).collect().toSeq
    val inline = BloomDedup.exactBloomGate(hist, inc, 1000000L).collect().toSeq
    assert(stored === inline)
    assert(stored.exists(_.getBoolean(1)), "fixture has no cross-slice prefix dups")
  }

  test("production probe plan: no join, no shuffle, single incoming scan") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val bytes = BloomDedup.buildFilterBytes(
      docs.filter(col("doc_id") % 7 =!= 0), expectedItems = 100)
    val p = BloomDedup.probe(docs.filter(col("doc_id") % 7 === 0), bytes)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(2000))
    assert(!p.contains("Exchange"), p.take(2000))
    // BloomFilterMightContain's prettyName
    assert(p.contains("might_contain"), p.take(2000))
    // exactly one parquet scan: the incoming side — history text is never
    // rescanned (it lives only in the folded filter literal)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("streaming bloom gate equals the batch probe under micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val bytes = BloomDedup.buildFilterBytes(
      docs.filter(col("doc_id") % 7 =!= 0), expectedItems = 1000000L)
    val incoming = docs.filter(col("doc_id") % 7 === 0).orderBy("doc_id")
      .collect().map(r => DocIn(r.getAs[Long]("doc_id"),
        new Timestamp(1000L + r.getAs[Long]("doc_id")),
        r.getAs[String]("text"), r.getAs[String]("lang"),
        r.getAs[String]("source")))
    val input = MemoryStream[DocIn]
    val q = DocStreams.bloomGateStream(input.toDF(), bytes)
      .writeStream.format("memory").queryName("bloom_gate_out")
      .outputMode("append").start()
    try {
      val rnd = new scala.util.Random(42)
      var rest = incoming.toSeq
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(40)
        input.addData(rest.take(k): _*); q.processAllAvailable()
        rest = rest.drop(k)
      }
      val streamed = spark.table("bloom_gate_out")
        .select("doc_id", "bloom_hit").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
      val batch = BloomDedup.probe(
        docs.filter(col("doc_id") % 7 === 0), bytes)
        .select("doc_id", "bloom_hit").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sorted.toSeq
      assert(streamed === batch)
      assert(streamed.exists(_._2), "no bloom hits in the fixture split")
    } finally q.stop()
  }
}
