package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Graph}

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("triangles: hand-built diamond graph (K4 minus one edge)") {
    // edges: 1-2, 1-3, 2-3, 2-4, 3-4 -> triangles {1,2,3} and {2,3,4}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val out = Graph.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 2L, 1L, 1.0),
      (2L, 3L, 2L, 0.666667),
      (3L, 3L, 2L, 0.666667),
      (4L, 2L, 1L, 1.0)))
  }

  test("triangles: a star has none; degree-1 nodes report clustering 0") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val out = Graph.triangles(star).collect()
    assert(out.forall(_.getLong(2) === 0L))
    // hub has degree 4, clustering 0; leaves degree 1, clustering 0
    assert(out.find(_.getLong(0) == 1L).get.getLong(1) === 4L)
    assert(out.forall(_.getDouble(3) === 0.0))
  }

  test("degreeHist buckets node degrees with exact shares") {
    // star 1-{2,3,4,5}: hub degree 4, four leaves degree 1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val out = Graph.degreeHist(star).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 4L, 5L, 0.8), (4L, 1L, 5L, 0.2)))
    // histogram mass equals the connected-node count on the real graph
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val edges = Dedup.simhashPairs(docs).select("a", "b")
    val hist = Graph.degreeHist(edges).collect()
    val nNodes = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id"))).distinct().count()
    assert(hist.map(_.getLong(1)).sum === nNodes)
    assert(hist.forall(_.getLong(2) === nNodes))
  }

  test("triangles on the simhash graph match a brute-force 3-edge closure") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val edges = Dedup.simhashPairs(docs).select("a", "b")
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = es.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    def connected(x: Long, y: Long) = es((math.min(x, y), math.max(x, y)))
    val brute = nodes.combinations(1).flatMap(_.headOption).map { u =>
      val nbrs = nodes.filter(v => v != u && connected(u, v))
      u -> nbrs.combinations(2).count { case Seq(v, w) => connected(v, w) }
    }.toMap
    val out = Graph.triangles(edges).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) === brute(r.getLong(0)).toLong,
        s"node ${r.getLong(0)}: engine ${r.getLong(2)} vs brute ${brute(r.getLong(0))}")
    }
    // sum of per-node counts = 3x the number of distinct triangles
    assert(out.map(_.getLong(2)).sum % 3 === 0)
  }

  test("triangles maxOutDeg: k >= max oriented out-degree reproduces the exact result") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val edges = Dedup.simhashPairs(docs).select("a", "b")
    val exact = Graph.triangles(edges).collect().map(_.toSeq).toSeq
    // a cap no node reaches must be a bit-for-bit no-op
    val capped = Graph.triangles(edges, maxOutDeg = Some(1 << 20)).collect().map(_.toSeq).toSeq
    assert(capped === exact)
  }

  test("triangles maxOutDeg: a small budget only ever undercounts, never invents") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val edges = Dedup.simhashPairs(docs).select("a", "b")
    val exact = Graph.triangles(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val capped = Graph.triangles(edges, maxOutDeg = Some(2)).collect()
    assert(capped.nonEmpty && capped.length === exact.size) // every node still reported
    capped.foreach { r =>
      val (deg, tri) = exact(r.getLong(0))
      assert(r.getLong(1) === deg, "degrees are never capped, only wedge budgets")
      assert(r.getLong(2) <= tri, s"node ${r.getLong(0)}: capped ${r.getLong(2)} > exact $tri")
    }
    // the diamond graph's max oriented out-degree is 2 -> cap 2 stays exact
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    assert(Graph.triangles(diamond, Some(2)).collect().map(_.toSeq).toSeq ===
      Graph.triangles(diamond).collect().map(_.toSeq).toSeq)
  }

  test("pagerank: 10 rounds match the reference recurrence; checkpoint bounds the plan") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val pairs = Dedup.simhashPairs(docs).select("a", "b")
    // driver-side reference: the same all-BIGINT floor-division recurrence
    val es = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (es ++ es.map(p => (p._2, p._1))).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.length.toLong).toMap
    var ref = adj.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 10)
      ref = adj.map { case (v, nbrs) =>
        v -> (150000L + 85L * nbrs.map(u => ref(u) / deg(u)).sum / 100L)
      }
    val out = Graph.pagerank(pairs, iterations = 10)
    out.collect().foreach { r =>
      assert(r.getLong(2) === ref(r.getLong(0)),
        s"node ${r.getLong(0)}: engine ${r.getLong(2)} vs reference ${ref(r.getLong(0))}")
    }
    // lineage guard: the every-5-rounds localCheckpoint keeps the final
    // plan's join count at <= one checkpoint window's worth, instead of
    // growing linearly with iterations
    def joins(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    val unchecked = Graph.pagerank(pairs, iterations = 10, checkpointEvery = 1000)
    val window5 = Graph.pagerank(pairs, iterations = 5, checkpointEvery = 1000)
    assert(joins(out) < joins(unchecked))
    assert(joins(out) <= joins(window5))
  }

  test("pagerank: hand-unrolled floor-division recurrence on a path graph") {
    // path 1-2-3; pr0 = 1e6 each; pr'(v) = 150000 + 85*sum(pr(u) div deg(u)) div 100
    // round 1: ends 575000, center 1850000
    // round 2: ends 936250, center 1127500
    // round 3: ends 629187 (85*563750 div 100), center 1741625
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val out = Graph.pagerank(edges, iterations = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 629187L), (2L, 2L, 1741625L), (3L, 1L, 629187L)))
  }

  test("pagerank: symmetric nodes tie; hubs outrank leaves; deterministic") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val out = Graph.pagerank(star).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Set(out(2L), out(3L), out(4L), out(5L)).size === 1) // leaves identical
    assert(out(1L) > out(2L))                                  // hub dominates
    // total quantized mass stays within floor-loss of the initial 5e6
    assert(out.values.sum <= 5000000L && out.values.sum > 4000000L)
    // determinism on the real near-dup graph under repartitioning
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val pairs = Dedup.simhashPairs(docs)
    val a = Graph.pagerank(pairs).collect().map(_.toSeq).toSeq
    val b = Graph.pagerank(pairs.repartition(13)).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("band-capped edges: graph ops equal the same ops on the organically surviving pairs") {
    // a 30-clone template family saturates its band buckets (cap=8 drops
    // them); graph ops over the capped edge relation must equal the same
    // ops run on the manually filtered pair list — the composition the
    // graph_*_capped queries rely on
    val family = (0L until 30L).map(i =>
      (1000L + i, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    val organic = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine eleven"))
    val corpus = (family ++ organic).toDF("doc_id", "text")
    val capped = Dedup.simhashPairs(corpus, maxBandBucket = Some(8))
    val manual = Dedup.simhashPairs(corpus)
      .filter(col("a") < 1000L && col("b") < 1000L)
    assert(Graph.degreeHist(capped).collect().map(_.toSeq).toSeq ===
      Graph.degreeHist(manual).collect().map(_.toSeq).toSeq)
    assert(Graph.pagerank(capped).collect().map(_.toSeq).toSeq ===
      Graph.pagerank(manual).collect().map(_.toSeq).toSeq)
    assert(Graph.triangles(capped, maxOutDeg = Some(8)).collect().map(_.toSeq).toSeq ===
      Graph.triangles(manual, maxOutDeg = Some(8)).collect().map(_.toSeq).toSeq)
    // the family really was dense enough to bind: uncapped sees its pairs
    assert(Dedup.simhashPairs(corpus).filter(col("a") >= 1000L).count() === 30L * 29L / 2L)
  }

  test("components: per-cluster census with density; id = member minimum") {
    // triangle {1,2,3} (clique, density 1) + path 10-11-12 (density 2/3)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L))
      .toDF("a", "b")
    val out = Graph.components(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 3L, 3L, 1.0), (10L, 3L, 2L, 0.666667)))
  }
}
