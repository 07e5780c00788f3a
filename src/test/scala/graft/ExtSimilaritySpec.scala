package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Similarity

class ExtSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bruteForceTopK ranks by cosine with vec_id tiebreak") {
    // query = vec 0 along x; 1 is closest (30°), then 2 (60°), then 3 (90°)
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.866f, 0.5f)),
      (2L, Array(0.5f, 0.866f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(df, nQueries = 1, k = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L)))
    val cosines = out.map(_.getAs[Double]("cosine"))
    assert(cosines.sameElements(cosines.sorted.reverse))
  }

  test("knnGraph restricted to the query slice equals lshTopK row-for-row") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val knn = Similarity.knnGraph(embs, k = 5)
      .filter(col("vec_id") < 10)
      .select("vec_id", "rank", "neighbor_id", "cosine")
      .collect().map(_.toSeq).toSeq
    val lsh = Similarity.lshTopK(embs, nQueries = 10, k = 5)
      .select(col("query_id").as("vec_id"), col("rank").cast("int"),
        col("neighbor_id"), col("cosine"))
      .collect().map(_.toSeq).toSeq
    assert(knn === lsh)
    // and it really is corpus-wide: (nearly) every vector has neighbors
    val n = embs.count()
    val covered = Similarity.knnGraph(embs, k = 5)
      .select("vec_id").distinct().count()
    assert(covered > n * 9 / 10, s"$covered of $n vectors have ring neighbors")
  }

  test("knnGraph bucket cap: high cap exact; over-cap bucket drops from candidate generation") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val exact = Similarity.knnGraph(embs).collect().map(_.toSeq).toSeq
    val high = Similarity.knnGraph(embs, maxBucket = Some(1000000))
      .collect().map(_.toSeq).toSeq
    assert(high === exact)
    // a fixture where one bucket is a 100-clone mega-cluster: capped at 8,
    // those clones supply no candidates; the organic pair still pairs up
    val clones = (0 until 100).map(i => (1000L + i, Array.fill(64)(1.0f)))
    val organic = Seq(
      (1L, Array.fill(64)(-1.0f)),
      (2L, Array.tabulate(64)(d => if (d == 0) -0.9f else -1.0f)))
    val df = (clones ++ organic).toDF("vec_id", "embedding")
    val capped = Similarity.knnGraph(df, maxBucket = Some(8)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(capped.forall { case (a, b) => a < 1000L && b < 1000L },
      s"clone-bucket candidates must be dropped: $capped")
    assert(capped === Set((1L, 2L), (2L, 1L)))
  }

  test("lshTopK pairs vectors within the multi-probe bucket ring and reranks exactly") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.lshTopK(embs, nQueries = 5, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // small-corpus planes floor is 4 → bucket ids fit in 4 bits, and every
    // returned neighbor differs from its query
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 16))
    assert(rows.forall(r => r.getLong(0) !== r.getAs[Long]("neighbor_id")))
    // ranks are 1..n contiguous per query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length).toSeq)
    }
  }

  test("ivfTopK probes nProbe lists and reranks with the exact scoring core") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.ivfTopK(embs).collect()
    assert(out.nonEmpty)
    // list ids are centroid vec_ids; neighbors never echo the query
    assert(out.forall(r => r.getAs[Long]("list_id") >= 100L && r.getAs[Long]("list_id") < 116L))
    assert(out.forall(r => r.getLong(0) !== r.getAs[Long]("neighbor_id")))
    // ranks contiguous per query, cosines non-increasing
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rs.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // IVF cosines equal the exact brute-force cosines for the same pairs
    // (same quantized-integer scoring core, candidate set aside)
    val bf = Similarity.bruteForceTopK(embs, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val overlaps = out.flatMap { r =>
      bf.get((r.getLong(0), r.getAs[Long]("neighbor_id"))).map(_ -> r.getAs[Double]("cosine"))
    }
    assert(overlaps.nonEmpty)
    overlaps.foreach { case (expected, got) => assert(got === expected) }
  }

  test("ivfHierTopK with nGroups=1 degenerates to ivfTopK bit-for-bit") {
    // one leader → level-1 trivially picks its group, whose members are
    // ALL centroids in id order → level-2 ≡ the flat argmax, probes ≡ the
    // flat nProbe-nearest lists, so the whole relation must be identical
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val hier = Similarity.ivfHierTopK(embs, nGroups = 1).collect().map(_.toString).toSeq
    val flat = Similarity.ivfTopK(embs).collect().map(_.toString).toSeq
    assert(hier === flat)
    assert(hier.nonEmpty)
  }

  test("ivfHierTopK: grouped probes keep the exact scoring core and stay within one group") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.ivfHierTopK(embs).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("list_id") >= 100L && r.getAs[Long]("list_id") < 116L))
    assert(out.forall(r => r.getLong(0) !== r.getAs[Long]("neighbor_id")))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rs.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // same quantized-integer scoring core as brute force on overlapping pairs
    val bf = Similarity.bruteForceTopK(embs, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val overlaps = out.flatMap { r =>
      bf.get((r.getLong(0), r.getAs[Long]("neighbor_id"))).map(_ -> r.getAs[Double]("cosine"))
    }
    assert(overlaps.nonEmpty)
    overlaps.foreach { case (expected, got) => assert(got === expected) }
  }

  test("assignClustersHier with nGroups=1 equals assignClusters; default grouping is total") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val one = Similarity.assignClustersHier(embs, nGroups = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val flat = Similarity.assignClusters(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(one === flat)
    // default (√nList groups): every vector still lands in exactly one of
    // the 16 centroid-labeled clusters
    val hier = Similarity.assignClustersHier(embs).collect()
    assert(hier.length === flat.length)
    assert(hier.forall(r => r.getLong(1) >= 100L && r.getLong(1) < 116L))
  }

  test("kmeansRunHier with nGroups=1 degenerates to kmeansRun bit-for-bit") {
    // one leader → every round's level-2 argmax ranks ALL centroids in id
    // order ≡ the flat argmax, so every round's assignment — and therefore
    // every centroid update and the final report — must be identical
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val hier = Similarity.kmeansRunHier(embs, nGroups = 1).collect().map(_.toString).toSeq
    val flat = Similarity.kmeansRun(embs).collect().map(_.toString).toSeq
    assert(hier === flat)
    assert(hier.nonEmpty)
  }

  test("kmeansRunHier (grouped): valid report shape, labels stay the seed ids") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.kmeansRunHier(embs, nGroups = 4).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) >= 100L && r.getLong(0) < 116L))
    // every surviving cluster reports all 64 dims with one member count
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (0 until 64))
      assert(rs.map(_.getAs[Long]("n_members")).distinct.length === 1)
    }
  }

  test("ivfTrainedHierTopK with nGroups=1 degenerates to ivfTrainedTopK bit-for-bit") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val hier = Similarity.ivfTrainedHierTopK(embs, nGroups = 1).collect().map(_.toString).toSeq
    val flat = Similarity.ivfTrainedTopK(embs).collect().map(_.toString).toSeq
    assert(hier === flat)
    assert(hier.nonEmpty)
  }

  test("ivfTrainedHierTopK (grouped): ranked per query, exact scoring core kept") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.ivfTrainedHierTopK(embs, nGroups = 4).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rs.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // same quantized-integer scoring core as brute force on overlapping pairs
    val bf = Similarity.bruteForceTopK(embs, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val overlaps = out.flatMap { r =>
      bf.get((r.getLong(0), r.getAs[Long]("neighbor_id"))).map(_ -> r.getAs[Double]("cosine"))
    }
    assert(overlaps.nonEmpty)
    overlaps.foreach { case (expected, got) => assert(got === expected) }
  }

  test("sampled training: rounds fit on the md5 slice, search covers the full corpus, stable under repartition") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val n = embs.count()
    // the fitting report aggregates ONLY the training slice (~40% + seeds)
    val report = Similarity.kmeansRunHier(embs, nGroups = 4, trainSamplePct = 40).collect()
    val trained = report.filter(_.getInt(1) == 0).map(_.getAs[Long]("n_members")).sum
    assert(trained < n, s"sampled trainer aggregated $trained of $n vectors")
    assert(trained > n / 5, s"only $trained of $n trained — bucket slice off")
    // pct = 100 is the identity
    assert(Similarity.kmeansRunHier(embs, nGroups = 4, trainSamplePct = 100)
      .collect().map(_.toString).toSeq ===
      Similarity.kmeansRunHier(embs, nGroups = 4).collect().map(_.toString).toSeq)
    // the sampled-trained SEARCH still ranks over the full corpus and is
    // layout-independent (md5 bucket, no RNG)
    val a = Similarity.ivfTrainedHierTopK(embs, nGroups = 4, trainSamplePct = 40)
      .collect().map(_.toString).toSeq
    val b = Similarity.ivfTrainedHierTopK(embs.repartition(13), nGroups = 4,
      trainSamplePct = 40).collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("trained IVF store: probe equals in-line trained-hier search; appends are order-independent") {
    import org.apache.spark.sql.functions.col
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivftrainedstore").toString
    // full lifecycle on the whole corpus: train + publish + probe ≡ in-line
    Similarity.buildTrainedIvfStore(embs, s"$base/full", nGroups = 4)
    val stored = Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), s"$base/full")
      .collect().map(_.toString).toSeq
    val inline = Similarity.ivfTrainedHierTopK(embs, nGroups = 4)
      .collect().map(_.toString).toSeq
    assert(stored === inline)
    assert(stored.nonEmpty)
    // frozen trained quantizer ⇒ appends commute: train+build on the
    // sub-300 slice, then fold the rest in, in two different batch orders
    def lists(dir: String) =
      spark.read.parquet(s"$dir/lists").collect()
        .map(_.toString).sorted.toSeq
    Similarity.buildTrainedIvfStore(embs.filter(col("vec_id") < 300), s"$base/a", nGroups = 4)
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 0), s"$base/a")
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 1), s"$base/a")
    Similarity.buildTrainedIvfStore(embs.filter(col("vec_id") < 300), s"$base/b", nGroups = 4)
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 1), s"$base/b")
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 0), s"$base/b")
    assert(lists(s"$base/a") === lists(s"$base/b"))
    graft.ops.Scale.deleteRecursively(new java.io.File(base))
  }

  test("ivfTrainedTopK: trained-quantizer search keeps the exact scoring core") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.ivfTrainedTopK(embs).collect()
    assert(out.nonEmpty)
    // list ids are the surviving seed labels; neighbors never echo the query
    assert(out.forall(r => r.getAs[Long]("list_id") >= 100L && r.getAs[Long]("list_id") < 116L))
    assert(out.forall(r => r.getLong(0) !== r.getAs[Long]("neighbor_id")))
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rs.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // candidate routing changed (trained lists), the scoring core did not:
    // any (query, neighbor) also in brute-force top-10 has the same cosine
    val bf = Similarity.bruteForceTopK(embs, nQueries = 10, k = 10).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("cosine")).toMap
    val overlaps = out.flatMap { r =>
      bf.get((r.getLong(0), r.getAs[Long]("neighbor_id"))).map(_ -> r.getAs[Double]("cosine"))
    }
    assert(overlaps.nonEmpty)
    overlaps.foreach { case (expected, got) => assert(got === expected) }
    // deterministic under repartitioning (training collects are id-ordered)
    val again = Similarity.ivfTrainedTopK(embs.repartition(9)).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("kmeansStep: members partition the corpus; means sit in range; shift is exact") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val n = embs.count()
    val out = Similarity.kmeansStep(embs).collect()
    assert(out.nonEmpty)
    // every (cluster, dim) row: dim ∈ [0, 64); each cluster emits all 64 dims
    val perCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    perCluster.values.foreach(rows =>
      assert(rows.map(_.getAs[Int]("dim")).sorted.toSeq === (0 until 64)))
    // member counts are per-cluster constants and partition the corpus
    val sizes = perCluster.map { case (_, rows) =>
      val ms = rows.map(_.getAs[Long]("n_members")).distinct
      assert(ms.length === 1); ms.head
    }
    assert(sizes.sum === n)
    // new_x is the exact mean; shift = new_x - old_x within round-off
    out.foreach { r =>
      val mean = r.getAs[Long]("sum_x").toDouble / r.getAs[Long]("n_members")
      assert(math.abs(r.getAs[Double]("new_x") - mean) < 1e-6)
      assert(math.abs(r.getAs[Double]("shift") - (mean - r.getAs[Long]("old_x"))) < 1e-6)
    }
  }

  test("kmeansRun round 1 reproduces kmeansStep's assignment sums") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val run1 = Similarity.kmeansRun(embs, iters = 1).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Int]("dim")) ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("sum_x"))).toMap
    val step = Similarity.kmeansStep(embs).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Int]("dim")) ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("sum_x"))).toMap
    assert(run1 === step)
  }

  test("kmeansRun reaches a fixpoint on separated groups and early-stops exactly") {
    // two tight groups around orthogonal directions with centroids 0 and 1
    // seeded one in each: assignments are stable from round 1, so the
    // fixpoint is reached at round 2 and extra iterations are the identity
    val df = Seq(
      (0L, Array(1.0f, 0.05f)), (1L, Array(0.05f, 1.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(0.95f, 0.0f)),
      (4L, Array(0.1f, 0.9f)), (5L, Array(0.0f, 0.95f))
    ).toDF("vec_id", "embedding")
    val r2 = Similarity.kmeansRun(df, nList = 2, centroidBase = 0, iters = 2)
      .collect().map(_.toSeq).toSeq
    val r7 = Similarity.kmeansRun(df, nList = 2, centroidBase = 0, iters = 7)
      .collect().map(_.toSeq).toSeq
    assert(r2 === r7)
    // both clusters survive with all their members
    assert(r2.map(_.head).distinct.length === 2)
  }

  test("clusterSample takes an exact per-cluster quota, stable under repartitioning") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.clusterSample(embs, perCluster = 5).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rows.length))
    }
    val again = Similarity.clusterSample(embs.repartition(9), perCluster = 5).collect()
    assert(out.map(_.toSeq).sortBy(_.toString).toSeq ===
      again.map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("sqTopK: hand-computed SQ8 codes, ADC ranking, and fixture sanity") {
    // 2-dim corpus: dim1 range [-1,1] -> span 20000, dim2 [0,1] -> span 10000
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),   // query
      (1L, Array(0.9f, 0.1f)),   // codes (242, 25)  -> closest
      (2L, Array(0.1f, 0.9f)),   // codes (140, 229)
      (3L, Array(-1.0f, 1.0f))   // codes (0, 255)   -> opposite
    ).toDF("vec_id", "embedding")
    val out = Similarity.sqTopK(df, nQueries = 1, k = 3).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq((0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L)))
    // rank-1 ADC dot, by hand: vq=(2550000,0); deq(v1)=(-2550000+242*20000, 25*10000)
    assert(out.head.getAs[Long]("adist") === 2550000L * 2290000L)
    // fixture: contiguous ranks, no self-match, score non-increasing per query
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val rows = Similarity.sqTopK(embs, nQueries = 5, k = 5).collect()
    assert(rows.length === 25)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to 5).toSeq)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      val byRank = rs.sortBy(_.getInt(1)).map(_.getAs[Long]("adist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("explicit planesOverride skips the sizing count and matches the derived result") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    // planesFor(500, 32) = 4, so overriding with 4 must be byte-identical
    val derived = Similarity.lshTopK(embs, nQueries = 3, k = 3).collect()
    val overridden = Similarity.lshTopK(embs, nQueries = 3, k = 3, planesOverride = 4).collect()
    assert(derived.map(_.toSeq).toSeq === overridden.map(_.toSeq).toSeq)
  }

  test("planesFor scales with corpus size and floors at 4") {
    assert(Similarity.planesFor(500) === 4)
    assert(Similarity.planesFor(2000) === 6)
    assert(Similarity.planesFor(1000000000L) === 25)
    assert(Similarity.planesFor(10) === 4)
  }

  test("srp_bucket matches the oracle's LCG hyperplane signs and is deterministic") {
    graft.functions.GraftFunctions.register(spark)
    // manual reference: bit p = sign of Σ_i x_i · ((1103515245·(p·dim+i+1)+12345) mod 2³¹ − 2³⁰)
    val xs = Array.tabulate(64)(i => ((i * 37) % 101 - 50).toLong)
    def planeV(p: Int, i: Int, dim: Int): Long =
      (1103515245L * (p.toLong * dim + i + 1) + 12345L) % 2147483648L - 1073741824L
    val expected = (0 until 4).map { p =>
      val dot = xs.indices.map(i => xs(i) * planeV(p, i, 64)).sum
      if (dot > 0) 1L << p else 0L
    }.sum
    val got = spark.sql(
      s"SELECT srp_bucket(CAST(array(${xs.mkString(",")}) AS ARRAY<BIGINT>), 4) AS b")
      .collect().head.getLong(0)
    assert(got === expected)
  }

  test("hardNegatives slices the post-ceiling rank band and drops near-dups") {
    // query 0 along x; 1 is a 0.9999-cosine near-dup (above the 0.99
    // ceiling), the rest fan out at increasing angles
    val vecs = (0L, Array(1.0f, 0.0f)) +: (1L to 8L).map { i =>
      val theta = if (i == 1) 0.001 else (i - 1) * 0.2
      (i, Array(math.cos(theta).toFloat, math.sin(theta).toFloat))
    }
    val df = spark.createDataFrame(vecs).toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(df, nQueries = 1, posK = 2, negK = 3, dupCeil = 0.99)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // near-dup 1 excluded BEFORE ranking, so ranks 1,2 = vecs 2,3
    // (positives, skipped) and the band is ranks 3..5 = vecs 4,5,6
    assert(out.toSeq === Seq((3, 4L), (4, 5L), (5, 6L)))
  }

  test("hardNegatives band continues exactly where bruteForceTopK's ranking leaves off when no near-dups exist") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    // fixture has no >=0.95-cosine pairs (FIXTURES.md), so the ceiling is
    // a no-op and the band must equal brute-force ranks posK+1..posK+negK
    val brute = Similarity.bruteForceTopK(docs, nQueries = 3, k = 15).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .filter(_._2 > 5)
    val hard = Similarity.hardNegatives(docs, nQueries = 3, posK = 5, negK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(hard.toSeq === brute.toSeq)
    // band bounds: exactly negK rows per query, ranks in (posK, posK+negK]
    assert(hard.groupBy(_._1).forall(_._2.length == 10))
    assert(hard.forall(r => r._2 > 5 && r._2 <= 15))
  }

  test("recallEval reports hits/expected per method; full-probe IVF recovers the exact top-k") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.recallEval(docs).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("ivf", "lsh"))
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2), r.toString)
      assert(r.getDouble(3) ===
        math.round(r.getLong(1).toDouble / r.getLong(2) * 1e6) / 1e6, r.toString)
    }
    // probing every list degrades IVF to exact search (each vector lives in
    // exactly one list, all probed) — recall must be exactly 1
    val exact = Similarity.bruteForceTopK(docs, nQueries = 3, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Similarity.ivfTopK(docs, nQueries = 3, k = 5, nList = 16, nProbe = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }

  test("geometry matches a brute-force stride-pair cosine histogram on the fixture") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.geometry(embs).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    // driver-side reference with the same quantization (round HALF_UP)
    val vecs = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(f =>
        BigDecimal(f.toDouble * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
      .toMap
    val n = vecs.size.toLong
    val brute = vecs.keys.toSeq.flatMap { a =>
      val b = (a + 997L) % n
      if (b == a || !vecs.contains(b)) None
      else {
        val (qa, qb) = (vecs(a), vecs(b))
        val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
        val cos = dot / (math.sqrt(qa.map(x => x * x).sum.toDouble) *
          math.sqrt(qb.map(x => x * x).sum.toDouble))
        Some(math.min(math.floor(cos * 10).toInt, 9))
      }
    }.groupBy(identity).map { case (bk, xs) => bk -> xs.size.toLong }
    assert(out === brute)
    // sanity: the sampled pair count is the corpus size (dense ids) and
    // a synthetic clustered corpus is NOT collapsed: mass is spread
    assert(out.values.sum === n)
    assert(out.size >= 2)
    // degenerate corpus: identical vectors collapse into the top bucket
    val same = (0L to 9L).map(i => (i, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val c = Similarity.geometry(same, stride = 3).collect()
    assert(c.length === 1 && c.head.getInt(0) === 9 && c.head.getLong(2) === 10L)
  }

  test("pqLloyd: training monotonically cuts total quantization distortion vs the seed codebook") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val vecs = Similarity.quantized(embs)
    val qs = vecs.select("vec_id", "q").collect()
      .map(r => r.getSeq[Long](1).toArray)
    val sd = 8
    val seedBooks: Array[Array[Array[Long]]] = {
      val seeds = vecs.filter(col("vec_id") >= 100 && col("vec_id") < 116)
        .orderBy("vec_id").collect().map(_.getSeq[Long](1).toArray)
      Array.tabulate(8)(m => seeds.map(_.slice(m * sd, (m + 1) * sd)))
    }
    val trained = Similarity.pqLloyd(vecs, nSub = 8, nCode = 16, centroidBase = 100, iters = 3)
    def distortion(books: Array[Array[Array[Long]]]): BigInt =
      qs.foldLeft(BigInt(0)) { (acc, q) =>
        acc + (0 until 8).map { m =>
          books(m).map { cw =>
            var s = BigInt(0)
            var d = 0
            while (d < sd) {
              val diff = BigInt(q(m * sd + d) - cw(d)); s += diff * diff; d += 1
            }
            s
          }.min
        }.sum
      }
    val seedD = distortion(seedBooks)
    val trainD = distortion(trained)
    // Lloyd rounds cannot increase total L2 distortion (assignment and
    // update are both argmin steps, up to the integer-mean rounding whose
    // per-codeword effect is bounded by the cell count — on this fixture
    // the improvement is far above that noise)
    assert(trainD < seedD, s"trained distortion $trainD !< seed $seedD")
    assert(trainD > 0)
  }

  test("ivfPqTrainedTopK is deterministic under repartitioning") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val a = Similarity.ivfPqTrainedTopK(embs).collect().map(_.toSeq).toSeq
    val b = Similarity.ivfPqTrainedTopK(embs.repartition(13)).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // every query emits exactly k contiguous ranks
    a.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.map(_(1).asInstanceOf[Int]).sorted === (1 to 5))
    }
  }

  test("centroidClassifierEval: confusion matrix on a hand-built two-label space") {
    val spark0 = spark
    import spark0.implicits._
    // train (ids % 5 != 0): label 0 near (1,0), label 1 near (0,1).
    // test (ids % 5 == 0): id 5 (label 0, at (1,0)) → pred 0;
    // id 10 (LABELED 0 but pointing at (0,1)) → pred 1 (off-diagonal);
    // id 15 (label 1, at (0,1)) → pred 1.
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.1f, 0.9f), 1),
      (5L, Array(1.0f, 0.0f), 0), (10L, Array(0.0f, 1.0f), 0),
      (15L, Array(0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidClassifierEval(df).collect()
      .map(r => (r.getAs[Int]("actual"), r.getAs[Int]("pred_label"),
        r.getAs[Long]("n"), r.getAs[Long]("n_actual"), r.getAs[Double]("recall")))
    assert(out.toSeq === Seq(
      (0, 0, 1L, 2L, 0.5), (0, 1, 1L, 2L, 0.5), (1, 1, 1L, 1L, 1.0)))
  }

  test("rangeSearch emits exactly the neighbors at or above the cosine threshold") {
    val spark0 = spark
    import spark0.implicits._
    // query v0 = (1,0): v1 at cos ~0.866, v2 at cos ~0.5, v3 at cos 0,
    // v4 opposite at cos -1 — threshold 0.6 keeps only v1
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.866f, 0.5f)),
      (2L, Array(0.5f, 0.866f)),
      (3L, Array(0.0f, 1.0f)),
      (4L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val hit = Similarity.rangeSearch(df, nQueries = 1, threshold = 0.6).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(hit.toSeq === Seq((0L, 1L)))
    // dropping the threshold admits v2; v3 (cos 0) and v4 (cos -1) need <= 0
    val loose = Similarity.rangeSearch(df, nQueries = 1, threshold = 0.4).collect()
      .map(_.getAs[Long]("neighbor_id"))
    assert(loose.toSeq === Seq(1L, 2L))
    // the result set equals brute-force top-k filtered at the threshold
    val brute = Similarity.bruteForceTopK(df, nQueries = 1, k = 4).collect()
      .filter(_.getAs[Double]("cosine") >= 0.4)
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    val rs = Similarity.rangeSearch(df, nQueries = 1, threshold = 0.4).collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine"))).toSet
    assert(rs === brute)
  }

  test("ivf store: build+append probe equals the in-line ivfTopK relation") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivfstore").toString
    Similarity.buildIvfStore(embs.filter(col("vec_id") < 300), s"$base/s")
    Similarity.appendToIvfStore(embs.filter(col("vec_id") >= 300), s"$base/s")
    val stored = Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), s"$base/s")
      .collect().toSeq
    val inline = Similarity.ivfTopK(embs).collect().toSeq
    assert(stored === inline)
    assert(stored.nonEmpty)
  }

  test("hier ivf store: build+append probe equals in-line ivfHierTopK; append == rebuild; compaction keeps the scheme") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivfhierstore").toString
    Similarity.buildIvfStore(embs.filter(col("vec_id") < 300), s"$base/s", nGroups = 4)
    Similarity.appendToIvfStore(embs.filter(col("vec_id") >= 300), s"$base/s")
    val stored = Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), s"$base/s")
      .collect().toSeq
    val inline = Similarity.ivfHierTopK(embs).collect().toSeq
    assert(stored === inline)
    assert(stored.nonEmpty)
    // append ≡ rebuild under the recorded two-level scheme
    Similarity.buildIvfStore(embs, s"$base/full", nGroups = 4)
    def rel(d: String) = spark.read.parquet(s"$d/lists")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rel(s"$base/s") === rel(s"$base/full"))
    // the hier marker (and therefore the probe scheme) survives compaction
    Similarity.compactIvfStore(spark, s"$base/s")
    val after = Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), s"$base/s")
      .collect().toSeq
    assert(after === stored)
  }

  test("ivf store: append == rebuild (frozen quantizer, order-independent lists)") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivfstore").toString
    Similarity.buildIvfStore(embs.filter(col("vec_id") < 300), s"$base/incr")
    Similarity.appendToIvfStore(embs.filter(col("vec_id") >= 300), s"$base/incr")
    Similarity.buildIvfStore(embs, s"$base/full")
    def rel(d: String) = spark.read.parquet(s"$d/lists")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rel(s"$base/incr") === rel(s"$base/full"))
  }

  test("ivf store: compaction is pure layout (probe relation and rows unchanged)") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivfstore").toString
    Similarity.buildIvfStore(embs.filter(col("vec_id") < 300), s"$base/s")
    // several small appends -> a multi-batch layout worth compacting
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 0), s"$base/s")
    Similarity.appendToIvfStore(
      embs.filter(col("vec_id") >= 300 && col("vec_id") % 2 === 1), s"$base/s")
    val before = Similarity.ivfAgainstStore(
      embs.filter(col("vec_id") < 10), s"$base/s").collect().toSeq
    val rowsBefore = spark.read.parquet(s"$base/s/lists").count()
    Similarity.compactIvfStore(spark, s"$base/s")
    val after = Similarity.ivfAgainstStore(
      embs.filter(col("vec_id") < 10), s"$base/s").collect().toSeq
    assert(after === before)
    assert(spark.read.parquet(s"$base/s/lists").count() === rowsBefore)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/s.old")))
  }

  test("ivf store probe plan: pruned lists scan, no corpus rescan") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val base = java.nio.file.Files.createTempDirectory("ivfstore").toString
    Similarity.buildIvfStore(embs.filter(col("vec_id") < 300), s"$base/s")
    Similarity.appendToIvfStore(embs.filter(col("vec_id") >= 300), s"$base/s")
    val p = Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), s"$base/s")
      .queryExecution.executedPlan.toString
    // exactly two parquet scans: the 10-query slice of embeddings and the
    // stored lists — the corpus embeddings are never rescanned at probe time
    assert("FileScan parquet".r.findAllIn(p).size === 2, p.take(3000))
    // the probe set reaches the lists scan as a pushed IN filter, so the
    // range-clustered store file-prunes to the probed lists' key ranges
    assert(p.contains("In(list_id"), p.take(3000))
  }

  test("hybridRrf: fuses both rank lists, surfaces single-retriever docs, rrf ordered") {
    val docsDf = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.hybridRrf(docsDf, embs).collect()
    assert(out.nonEmpty)
    // per query: ranks are 1..n and rrf is non-increasing
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length))
      val scores = sorted.map(_.getAs[Double]("rrf_score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // every fused row was found by at least one retriever
    assert(out.forall(r => !r.isNullAt(3) || !r.isNullAt(4)))
    // the point of RRF vs the cascade: docs the text stage never found
    // (r_text null) can still surface on vector rank alone
    assert(out.exists(_.isNullAt(3)))
    // both-list docs outscore the same ranks alone: spot-check the formula
    val r = out.head
    val expected =
      (if (r.isNullAt(3)) 0.0 else 1.0 / (60 + r.getInt(3))) +
        (if (r.isNullAt(4)) 0.0 else 1.0 / (60 + r.getInt(4)))
    assert(math.abs(r.getAs[Double]("rrf_score") - expected) < 1e-6)
  }

  test("semDedupTrained: same relation shape over trained clusters, one keeper per group") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val seeded = Similarity.semDedup(embs)
    val trained = Similarity.semDedupTrained(embs)
    assert(seeded.columns.toSeq === trained.columns.toSeq)
    val rows = trained.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(1)).foreach { case (g, members) =>
      assert(members.count(_.getBoolean(4)) === 1, s"group $g must keep exactly one")
      assert(members.length >= 2, s"group $g: singletons never emit")
    }
  }

  test("semDedup: intra-cluster groups, paper keeper rule, boundary pairs scoped out") {
    // two clusters around the x/y seeds (100/101); {0,1} and {2,3} are
    // intra-cluster near-dups; 5 is a singleton in cluster 100; {6,7} are
    // near-dups of each other but land in DIFFERENT clusters — scoped out
    // by design (the paper's trade). Keeper = LOWEST cosine to centroid:
    // in group {0,1} that is vec 1 (0.9320 < 0.9363), NOT the min id —
    // distinguishing the paper rule from a min-id keeper.
    val df = Seq(
      (0L, Array(0.91f, 0.34f)), (1L, Array(0.9f, 0.35f)),
      (2L, Array(0.35f, 0.9f)), (3L, Array(0.34f, 0.91f)),
      (5L, Array(0.9f, -0.35f)),
      (6L, Array(0.72f, 0.69f)), (7L, Array(0.69f, 0.72f)),
      (100L, Array(1.0f, 0.0f)), (101L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(df, eps = 0.95, nList = 2).collect()
    val rows = out.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))).toSeq
    assert(rows === Seq(
      (100L, 0L, 0L, false), (100L, 0L, 1L, true),
      (101L, 2L, 2L, true), (101L, 2L, 3L, false)))
    // cent_cos is the member's cosine to its OWN centroid, rounded
    val cc = out.map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(cc(1L) < cc(0L))
    // nothing qualifies at a bar above every intra-cluster pair (the
    // closest pair measures cosine 0.999906)
    assert(Similarity.semDedup(df, eps = 0.99995, nList = 2).isEmpty)
    // density guard: a cap >= the largest cluster is the identity; a cap
    // below cluster 100's size (5 members incl. seed) drops its groups
    // while the smaller cluster (4 members) still scores
    assert(Similarity.semDedup(df, eps = 0.95, nList = 2,
      maxClusterSize = Some(9)).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4))).toSeq === rows)
    val capped = Similarity.semDedup(df, eps = 0.95, nList = 2,
      maxClusterSize = Some(4)).collect()
    assert(capped.map(_.getLong(0)).distinct.toSeq === Seq(101L))
  }
}
