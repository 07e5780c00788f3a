package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("split assignment is deterministic and stable under repartitioning") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Sampling.assignSplits(docs).orderBy("doc_id").collect()
    val b = Sampling.assignSplits(docs.repartition(13)).orderBy("doc_id").collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("split proportions track the requested percentages") {
    val docs = Tables.load(spark, dir, "documents")
    val n = docs.count().toDouble
    val counts = Sampling.assignSplits(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 5/5/90 with a hash-bucket tolerance on a 500-doc corpus
    assert(counts("val") / n > 0.01 && counts("val") / n < 0.12, counts.toString)
    assert(counts("test") / n > 0.01 && counts("test") / n < 0.12, counts.toString)
    assert(counts("train") / n > 0.8, counts.toString)
    // every doc lands in exactly one split
    assert(counts.values.sum === n.toLong)
  }

  test("sample flag is independent of split membership (separate hash regions)") {
    val docs = Tables.load(spark, dir, "documents")
    val rows = Sampling.assignSplits(docs).collect()
    val overallRate = rows.count(_.getAs[Int]("sampled") == 1).toDouble / rows.length
    val trainRate = {
      val t = rows.filter(_.getAs[String]("split") == "train")
      t.count(_.getAs[Int]("sampled") == 1).toDouble / t.length
    }
    assert(overallRate > 0.1 && overallRate < 0.3, overallRate.toString)
    assert(math.abs(trainRate - overallRate) < 0.1, s"$trainRate vs $overallRate")
  }

  test("stratifiedSample takes exactly perStratum docs per language, deterministically") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.stratifiedSample(docs, perStratum = 7).collect()
    val langs = docs.select("lang").distinct().count()
    assert(out.length.toLong === langs * 7)
    val again = Sampling.stratifiedSample(docs.repartition(13), perStratum = 7).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq) // layout-independent
  }

  test("epochShuffle is a seeded permutation: exhaustive, contiguous, seed-sensitive") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.epochShuffle(docs).collect()
    // every doc exactly once, shards cover 0..7
    assert(out.length.toLong === docs.count())
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    assert(out.map(_.getInt(1)).distinct.sorted.toSeq === (0 to 7))
    // positions are 1..n contiguous per shard
    out.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // layout-independent, seed-dependent
    val again = Sampling.epochShuffle(docs.repartition(13)).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    val other = Sampling.epochShuffle(docs, seed = "s43").collect()
    assert(other.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq !==
      out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq)
    // the permutation decorrelates doc order: within a shard, consecutive
    // positions are not consecutive ids (any fixed stride would be)
    val shard0 = out.filter(_.getInt(1) == 0).sortBy(_.getLong(2)).map(_.getLong(0))
    assert(shard0.zip(shard0.tail).count { case (a, b) => b == a + 1 } < shard0.length / 4)
  }

  test("clusterSplit is leakage-free: every near-dup cluster maps to exactly one split") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.clusterSplit(docs)
    // the invariant the operator exists for: no cluster straddles splits
    val leaky = out.groupBy("cluster_id")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(leaky.isEmpty, leaky.collect().mkString(", "))
    // every doc gets exactly one row, and multi-doc clusters exist in the
    // fixture (otherwise the test proves nothing beyond assignSplits)
    assert(out.count() === docs.count())
    val multi = out.groupBy("cluster_id").count().filter(col("count") > 1).count()
    assert(multi > 0, "fixture has no multi-doc near-dup clusters")
  }

  test("clusterSplit singletons reproduce the per-doc hash bucket; members follow the cluster") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.clusterSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val clusterOf = out.map { case (d, c, _) => d -> c }.toMap
    def splitOf(key: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 4), 16) % 100
      if (b < 10) "val" else if (b < 20) "test" else "train"
    }
    out.foreach { case (doc, cluster, split) =>
      // split is a pure function of the CLUSTER id (10/10/80 buckets)
      assert(split === splitOf(cluster), s"doc $doc cluster $cluster")
      // singletons: cluster_id == doc_id by coalesce
      if (out.count(_._2 == cluster) == 1) assert(cluster === doc)
    }
    // a doc whose own-id split disagrees with its cluster's split proves
    // the key really is the cluster id, not the doc id
    val moved = out.exists { case (doc, cluster, _) =>
      clusterOf(doc) != doc && splitOf(doc) != splitOf(cluster)
    }
    assert(moved, "no cluster member's own-id split differs from its cluster's — fixture too weak to distinguish keys")
  }

  test("interleave stride-schedules sources evenly with deterministic tie-breaks") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    // source a: 4 docs (vt .25 .5 .75 1), source b: 2 docs (vt .5 1) →
    // schedule a a b a a b (ties at .5 and 1.0 break to source 'a')
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"), (4L, "x", "a"),
      (5L, "x", "b"), (6L, "x", "b")
    ).toDF("doc_id", "text", "source")
    val out = Sampling.interleave(docs).collect()
    assert(out.map(_.getAs[String]("source")).toSeq === Seq("a", "a", "b", "a", "a", "b"))
    // vt is non-decreasing down the schedule and per-source ranks are 1..n
    val vts = out.map(_.getAs[Double]("vt"))
    assert(vts.zip(vts.tail).forall { case (x, y) => x <= y })
    assert(out.filter(_.getAs[String]("source") == "a").map(_.getAs[Long]("src_rank")).toSeq
      === Seq(1L, 2L, 3L, 4L))
    // prefix proportionality on the real corpus: any prefix holds each
    // source within ±2 of its proportional share (the stride lag bound)
    val corpus = Tables.load(spark0, SparkTestSession.sfDir, "documents")
    val sched = Sampling.interleave(corpus).collect()
    val total = sched.length
    val share = sched.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    val running = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    sched.zipWithIndex.foreach { case (r, i) =>
      val s = r.getAs[String]("source")
      running(s) += 1
      val expect = (i + 1).toDouble * share(s) / total
      assert(math.abs(running(s) - expect) <= 2.0,
        s"source $s drifted to ${running(s)} vs $expect at prefix ${i + 1}")
    }
  }

  test("dsirWeights: target-vocabulary docs outweigh off-target docs; features count unigrams+bigrams") {
    import spark.implicits._
    // targets (doc_id % 11 == 0) speak "alpha beta"; raw doc 1 copies that
    // vocabulary, raw doc 2 speaks a disjoint one → weight(1) > weight(2)
    val df = Seq(
      (0L, "alpha beta alpha beta alpha"),
      (11L, "beta alpha beta alpha beta"),
      (1L, "alpha beta alpha beta gamma"),
      (2L, "delta epsilon zeta eta theta"),
      (3L, "solo")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = Sampling.dsirWeights(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getBoolean(1) && out(11L).getBoolean(1))
    assert(!out(1L).getBoolean(1) && !out(2L).getBoolean(1))
    // 5 tokens → 5 unigrams + 4 bigrams; 1 token → 1 unigram, no bigram
    assert(out(1L).getLong(2) === 9L)
    assert(out(3L).getLong(2) === 1L)
    assert(out(1L).getDouble(3) > out(2L).getDouble(3),
      s"target-like doc must outweigh off-target: ${out(1L)} vs ${out(2L)}")
  }

  test("DSIR store: fit once, serve equals the in-line weights; unseen buckets take the recorded add-1 default") {
    val docs = Tables.load(spark, dir, "documents")
    val base = java.nio.file.Files.createTempDirectory("dsirstore").toString
    Sampling.buildDsirStore(docs, s"$base/m")
    val stored = Sampling.scoreAgainstDsirStore(docs, s"$base/m")
      .collect().map(_.toSeq).toSeq
    val inline = Sampling.dsirWeights(docs).collect().map(_.toSeq).toSeq
    assert(stored === inline)
    // a tiny-corpus store leaves most buckets unseen: a novel-vocabulary
    // doc must score n_feats × the recorded add-1 default, not drop rows
    import spark.implicits._
    def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    Sampling.buildDsirStore(df(0L -> "alpha beta", 1L -> "beta gamma"), s"$base/tiny")
    val (_, dim, _, tt, rt) = Sampling.loadDsirStore(spark, s"$base/tiny")
    val novel = Sampling.scoreAgainstDsirStore(
      df(7L -> "zzqx1 zzqx7 zzqx13"), s"$base/tiny").collect()
    assert(novel.length === 1 && novel.head.getLong(2) === 5L) // 3 unigrams + 2 bigrams
    val default = math.log((1.0 / (tt + dim)) / (1.0 / (rt + dim)))
    assert(math.abs(novel.head.getDouble(3) - 5 * default) < 1e-5,
      s"unseen-bucket weight ${novel.head.getDouble(3)} vs expected ${5 * default}")
  }

  test("dsirSample selects ~frac of the corpus, enriched in target-like docs, stable under repartitioning") {
    val docs = Tables.load(spark, dir, "documents")
    val out = Sampling.dsirSample(docs).collect()
    val n = out.length
    val sel = out.filter(_.getBoolean(4))
    // quantile-threshold selection: within a few ties of 20%
    assert(math.abs(sel.length - 0.2 * n) <= 3, s"${sel.length} of $n selected")
    // importance resampling must enrich target-like weight
    val selMean = sel.map(_.getDouble(2)).sum / sel.length
    val unselMean = out.filterNot(_.getBoolean(4)).map(_.getDouble(2)).sum / (n - sel.length)
    assert(selMean > unselMean, s"selected mean $selMean <= unselected $unselMean")
    val b = Sampling.dsirSample(docs.repartition(13)).collect().map(_.toSeq).toSeq
    assert(out.map(_.toSeq).toSeq === b)
  }

  test("dsirSample: scientific-notation temperatures work, and T → 0 approaches top-frac by weight") {
    val docs = Tables.load(spark, dir, "documents")
    // regression: Double.toString(1e-4) = "1.0E-4"; the old string-built
    // SQL appended e0 → "1.0E-4e0", a parse error at runtime. lit() must
    // carry the exact double instead.
    val tiny = Sampling.dsirSample(docs, temperature = 1e-4).collect()
    assert(tiny.nonEmpty)
    val sel = tiny.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(sel.nonEmpty)
    // at T = 1e-4 the Gumbel term is negligible against weight/T: the
    // selected set is the deterministic top-frac by weight (the paper's
    // T → 0 degeneracy)
    val byWeight = tiny.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      .take(sel.size).map(_.getLong(0)).toSet
    assert(sel === byWeight)
  }

  test("dsirWeights is stable under repartitioning and total over the corpus") {
    val docs = Tables.load(spark, dir, "documents")
    val a = Sampling.dsirWeights(docs).collect().map(_.toSeq).toSeq
    val b = Sampling.dsirWeights(docs.repartition(13)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.length === docs.count())
  }
}
