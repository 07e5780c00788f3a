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

  test("lshTopK only pairs vectors within the same bucket and reranks exactly") {
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    val out = Similarity.lshTopK(embs, planes = 4, nQueries = 5, k = 5)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // bucket ids fit in 4 bits and every returned neighbor differs from its query
    assert(rows.forall(r => r.getAs[Long]("bucket") >= 0 && r.getAs[Long]("bucket") < 16))
    assert(rows.forall(r => r.getLong(0) !== r.getAs[Long]("neighbor_id")))
    // ranks are 1..n contiguous per query
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length).toSeq)
    }
  }

  test("hyperplanes are deterministic and broadcast-sized") {
    val h1 = Similarity.hyperplanes(spark, 4, 64).collect()
    val h2 = Similarity.hyperplanes(spark, 4, 64).collect()
    assert(h1.map(_.toSeq).toSeq === h2.map(_.toSeq).toSeq)
    assert(h1.length === 256)
    assert(h1.forall(r => math.abs(r.getLong(2)) <= (1L << 30)))
  }
}
