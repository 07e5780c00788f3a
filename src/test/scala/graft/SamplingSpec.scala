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
}
