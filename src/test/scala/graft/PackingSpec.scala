package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (String, Long, Int)*) =
    rows.map { case (src, id, n) => (src, id, ("w " * n).trim) }
      .toDF("source", "doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("pack assigns contiguous sequence ranges; docs split across boundaries") {
    // budget 10: doc1 (7 tok) → seq 0 only; doc2 (6 tok) spans 0..1;
    // doc3 (9 tok) occupies 1..2 (cum 13..22)
    val out = Packing.pack(docsDf(("s", 1L, 7), ("s", 2L, 6), ("s", 3L, 9)), budget = 10)
      .collect()
    val bySeq = out.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"), r.getAs[Long]("n_seqs")))
    assert(bySeq.toSeq === Seq((1L, 0L, 0L, 1L), (2L, 0L, 1L, 2L), (3L, 1L, 2L, 2L)))
  }

  test("pack streams are independent per source and sequences are gap-free") {
    val out = Packing.pack(
      docsDf(("a", 1L, 5), ("a", 2L, 5), ("b", 3L, 5), ("b", 4L, 5)), budget = 10)
      .collect()
    // each source restarts at sequence 0
    assert(out.filter(_.getString(0) == "a").map(_.getAs[Long]("first_seq")).min === 0L)
    assert(out.filter(_.getString(0) == "b").map(_.getAs[Long]("first_seq")).min === 0L)
    // exactly-10-token budget boundary: doc 2 of 'a' is [5,10) → still seq 0
    val a2 = out.find(r => r.getString(0) == "a" && r.getAs[Long]("doc_id") == 2L).get
    assert((a2.getAs[Long]("first_seq"), a2.getAs[Long]("last_seq")) === (0L, 0L))
  }

  test("mixture quotas sum to the budget exactly and track token shares") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val budget = 999983L // prime: forces nonzero remainders
    val out = Packing.mixture(docs, budget).collect()
    assert(out.map(_.getAs[Long]("quota_tokens")).sum === budget)
    val total = out.map(_.getAs[Long]("n_tokens")).sum
    out.foreach { r =>
      val exact = budget.toDouble * r.getAs[Long]("n_tokens") / total
      // largest remainder never deviates more than one token from exact
      assert(math.abs(r.getAs[Long]("quota_tokens") - exact) <= 1.0, r.toString)
      assert(r.getAs[Long]("extra") == 0L || r.getAs[Long]("extra") == 1L)
    }
    // deterministic under repartitioning
    val again = Packing.mixture(docs.repartition(13), budget).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("mixture remainder tie-break is by source ascending") {
    // two equal sources, odd budget: one must get the extra token — the
    // lexicographically first
    val out = Packing.mixture(docsDf(("a", 1L, 10), ("b", 2L, 10)), budgetTokens = 21L)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota_tokens")).toMap
    assert(out === Map("a" -> 11L, "b" -> 10L))
  }

  test("packSharded restarts streams at shard boundaries; one-shard == pack") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    // shardSize beyond the id range → every source is one shard: the result
    // is pack's exactly (shard column aside)
    val oneShard = Packing.packSharded(docs, shardSize = 1000000L).drop("shard").collect()
    val plain = Packing.pack(docs).collect()
    assert(oneShard.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
    // sharded: each (source, shard) stream restarts at sequence 0 and is
    // gap-free — the independently consumable unit
    val sharded = Packing.packSharded(docs, shardSize = 100L).collect()
    sharded.groupBy(r => (r.getString(0), r.getAs[Long]("shard"))).foreach {
      case (_, rows) =>
        val covered = rows.flatMap(r =>
          r.getAs[Long]("first_seq") to r.getAs[Long]("last_seq")).toSet
        assert(covered.min === 0L)
        assert(covered === (0L to covered.max).toSet)
    }
    // within a shard the assignment is pack's: replaying pack on the
    // shard's rows alone yields identical (first_seq, last_seq)
    val shard0 = docs.filter(col("doc_id") < 100)
    val replay = Packing.pack(shard0).collect()
      .map(r => (r.getString(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"))).toSet
    val fromSharded = sharded.filter(_.getAs[Long]("shard") == 0L)
      .map(r => (r.getString(0), r.getAs[Long]("doc_id"),
        r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"))).toSet
    assert(fromSharded === replay)
    // deterministic under repartitioning
    val again = Packing.packSharded(docs.repartition(13), shardSize = 100L).collect()
    assert(again.map(_.toSeq).toSeq === sharded.map(_.toSeq).toSeq)
  }

  test("mixtureSampled covers every quota greedily in md5 order") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val budget = 10000L
    val out = Packing.mixtureSampled(docs, budget).collect()
    val quotas = Packing.mixture(docs, budget).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("quota_tokens")).toMap
    val srcSizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (src, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("pick_rank"))
      // picks are the md5-rank prefix: contiguous from 1
      assert(sorted.map(_.getAs[Int]("pick_rank")).toSeq === (1 to rows.length))
      // greedy rule: every pick started under the quota...
      sorted.foreach { r =>
        assert(r.getAs[Long]("cum_tokens") - r.getAs[Int]("n_tokens") < quotas(src))
      }
      // ...and the quota is COVERED (or the source ran out of docs)
      assert(sorted.last.getAs[Long]("cum_tokens") >= quotas(src) ||
        rows.length.toLong == srcSizes(src), src)
    }
    // deterministic under repartitioning (md5 order, no RNG)
    val again = Packing.mixtureSampled(docs.repartition(13), budget).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("pack result is independent of input partitioning") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val a = Packing.pack(docs).collect()
    val b = Packing.pack(docs.repartition(13)).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // token-exact: within each source, every sequence index up to the max
    // is covered by some document (no holes)
    val seqs = a.groupBy(_.getString(0)).map { case (_, rows) =>
      val covered = rows.flatMap(r =>
        r.getAs[Long]("first_seq") to r.getAs[Long]("last_seq")).toSet
      covered === (0L to covered.max).toSet
    }
    assert(seqs.forall(identity))
  }

  test("qualityBudget two-phase plan equals the naive global-window selection") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val budget = 20000L
    val out = Packing.qualityBudget(docs, budget).collect()
    // naive reference: one global window in (q_scaled desc, doc_id) order
    val naive = docs.selectExpr("doc_id", "source",
        "CAST(size(split(text, ' ')) AS LONG) AS n_tokens",
        """(100000000L * size(array_distinct(split(text, ' ')))
          |  * least(size(split(text, ' ')), 30))
          | div (size(split(text, ' ')) * 30L) AS q_scaled""".stripMargin)
      .selectExpr("*",
        "CAST(sum(n_tokens) OVER (ORDER BY q_scaled DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS LONG) AS cum_tokens",
        "CAST(row_number() OVER (ORDER BY q_scaled DESC, doc_id ASC) AS LONG) AS pick_rank")
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .selectExpr("pick_rank", "doc_id", "source", "q_scaled", "n_tokens", "cum_tokens")
      .orderBy("pick_rank").collect()
    assert(out.map(_.toSeq).toSeq === naive.map(_.toSeq).toSeq)
    // the budget is covered: last doc's cum reaches it, one before does not
    assert(out.last.getAs[Long]("cum_tokens") >= budget)
    assert(out.last.getAs[Long]("cum_tokens") - out.last.getAs[Long]("n_tokens") < budget)
    // quality-first: pick order is non-increasing in q_scaled
    val qs = out.map(_.getAs[Long]("q_scaled"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    // deterministic under repartitioning
    val again = Packing.qualityBudget(docs.repartition(13), budget).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("packStats: fragmentation, tail waste, and fill rate from the pack relation") {
    // one source, budget 10: docs 6+6+7+3 tokens -> cum 6,12,19,22.
    // doc2 spans seqs 0-1 (split), doc3 spans 1-1? cum-1=18 -> seq 1,
    // first = 12 div 10 = 1 -> not split; doc4 cum-1=21 -> seq 2, first 19 div 10=1 -> split.
    val docs = docsDf(("s", 1L, 6), ("s", 2L, 6), ("s", 3L, 7), ("s", 4L, 3))
    val r = Packing.packStats(docs, budget = 10).collect().head
    assert(r.getString(0) === "s")
    assert(r.getLong(1) === 4L)           // n_docs
    assert(r.getLong(2) === 22L)          // total_tokens
    assert(r.getLong(3) === 3L)           // n_seqs (last cum 22 -> seq 2)
    assert(r.getLong(4) === 2L)           // docs 2 and 4 split
    assert(r.getDouble(5) === 0.5)        // split_frac
    assert(r.getLong(6) === 8L)           // 3*10 - 22
    assert(r.getDouble(7) === 0.733333)   // fill
    // invariant on the fixture: waste < budget per source (split packing
    // wastes only the final partial sequence)
    val fix = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = Packing.packStats(fix).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      assert(row.getLong(6) >= 0 && row.getLong(6) < 256,
        s"${row.getString(0)}: tail_waste ${row.getLong(6)} outside [0, budget)")
    }
  }

  test("sourceTemperature: alpha=1 reproduces natural shares; alpha<1 boosts the tail") {
    // 90/10 token split across two sources
    val docs = docsDf(("big", 1L, 90), ("small", 2L, 10))
    val natural = Packing.sourceTemperature(docs, alpha = 1.0).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // weight == share, boost == 1 at alpha=1
    natural.values.foreach { case (share, weight, boost) =>
      assert(math.abs(weight - share) <= 1e-6 && math.abs(boost - 1.0) <= 1e-6)
    }
    val flat = Packing.sourceTemperature(docs, alpha = 0.3).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // tail source upsampled, head source downsampled; weights still sum to 1
    assert(flat("small")._3 > 1.0 && flat("big")._3 < 1.0)
    assert(math.abs(flat.values.map(_._2).sum - 1.0) <= 1e-5)
    // alpha=0.3 weight for the 90% source: p^.3 / (p^.3 + q^.3)
    val w90 = math.pow(0.9, 0.3) / (math.pow(0.9, 0.3) + math.pow(0.1, 0.3))
    assert(math.abs(flat("big")._2 - w90) <= 1e-6)
  }

  test("sourceTemperature: expected tokens redistribute the real corpus budget") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = Packing.sourceTemperature(docs).collect()
    val total = out.map(_.getLong(2)).sum
    // expected_tokens sums back to the corpus total (round-2 tolerance x sources)
    assert(math.abs(out.map(_.getDouble(6)).sum - total) <= 0.01 * out.length)
    // deterministic under repartitioning (decimal-routed weight sum)
    val again = Packing.sourceTemperature(docs.repartition(13)).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
