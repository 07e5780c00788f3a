package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.LmFilter

class LmFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")

  test("perplexityFilter: schema, ref slice, tertile balance, kept == head+middle") {
    val out = LmFilter.perplexityFilter(docs).collect()
    assert(out.length === docs.count())
    out.foreach { r =>
      assert(r.getAs[Boolean]("in_ref") === (r.getAs[Long]("doc_id") % 3 == 0))
      val b = r.getAs[Int]("bucket")
      assert(b >= 1 && b <= 3)
      assert(r.getAs[Boolean]("kept") === (b <= 2))
      assert(!r.getAs[Double]("ce_nats").isNaN
        && !r.getAs[Double]("ce_nats").isInfinite)
    }
    // per-lang tertiles: every language splits into all three buckets,
    // each within one doc + remainder of n/3 (exact interpolated cutoffs)
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_.getAs[Int]("bucket")).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set(1, 2, 3), s"$lang missing a bucket: $sizes")
      val n = rs.size
      sizes.values.foreach(s =>
        assert(math.abs(s - n / 3.0) <= 2.0, s"$lang unbalanced tertiles: $sizes"))
    }
    // head docs score LOWER cross-entropy than tail docs within a language
    byLang.foreach { case (lang, rs) =>
      val maxHead = rs.filter(_.getAs[Int]("bucket") == 1).map(_.getAs[Double]("ce_nats")).max
      val minTail = rs.filter(_.getAs[Int]("bucket") == 3).map(_.getAs[Double]("ce_nats")).min
      assert(maxHead <= minTail, s"$lang: head ce $maxHead > tail ce $minTail")
    }
  }

  test("stored LM serve equals the in-line filter row-for-row (fit, publish, serve)") {
    val store = java.nio.file.Files.createTempDirectory("graft_lm_spec").toString + "/m"
    LmFilter.buildLmStore(docs, store)
    val served = LmFilter.scoreAgainstLmStore(docs, store).collect().map(_.toSeq)
    val inline = LmFilter.perplexityFilter(docs).collect().map(_.toSeq)
    assert(served.toSeq === inline.toSeq)
  }

  test("serving NEW text: unseen tokens score the smoothed floor, unseen language lands in the tail") {
    val store = java.nio.file.Files.createTempDirectory("graft_lm_new").toString + "/m"
    LmFilter.buildLmStore(docs, store)
    val (_, _, tots, _, lambda, _) = LmFilter.loadLmStore(spark, store)
    val enTot = tots.filter(col("lang") === "en").collect()(0)
    val (t, v) = (enTot.getAs[Long]("t"), enTot.getAs[Long]("v"))
    val novel = Seq(
      (900001L, "qzxv1 qzxv2 qzxv3", "en"),   // seen lang, all-unseen tokens
      (900002L, "qzxv1 qzxv2 qzxv3", "xx"))   // unseen lang
      .toDF("doc_id", "text", "lang")
    val out = LmFilter.scoreAgainstLmStore(novel, store)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // every term: bf/cf/uf all miss -> p = (1-λ)·1/(T_en+V_en+1), no ln(0)
    val floorCe = -math.log((1 - lambda) * (1.0 / (t + v + 1)))
    val en = out(900001L)
    assert(math.abs(en.getAs[Double]("ce_nats") - floorCe) < 1e-6)
    assert(en.getAs[Int]("bucket") === 3, "floor-scored doc must be tail")
    // an unseen LANGUAGE has no model rows and no totals: p coalesces to
    // the finite (1-λ)·1/(0+0+1) floor, and the missing cutoffs quarantine
    val xx = out(900002L)
    assert(math.abs(xx.getAs[Double]("ce_nats") - (-math.log(1 - lambda))) < 1e-6)
    assert(xx.getAs[Int]("bucket") === 3 && !xx.getAs[Boolean]("kept"),
      "unseen language must quarantine to the tail")
  }

  test("single-token document scores its LANGUAGE's unigram arm (one context-free term)") {
    val store = java.nio.file.Files.createTempDirectory("graft_lm_one").toString + "/m"
    LmFilter.buildLmStore(docs, store)
    val (uni, _, tots, _, lambda, _) = LmFilter.loadLmStore(spark, store)
    val enTot = tots.filter(col("lang") === "en").collect()(0)
    val (t, v) = (enTot.getAs[Long]("t"), enTot.getAs[Long]("v"))
    val word = uni.filter(col("lang") === "en").orderBy(desc("uf")).limit(1).collect()(0)
    val (tok, uf) = (word.getAs[String]("token"), word.getAs[Long]("uf"))
    val one = Seq((900003L, tok, "en")).toDF("doc_id", "text", "lang")
    val r = LmFilter.scoreAgainstLmStore(one, store).collect()(0)
    assert(r.getAs[Long]("n_terms") === 1L)
    val expected = -math.log((1 - lambda) * ((uf + 1).toDouble / (t + v + 1)))
    assert(math.abs(r.getAs[Double]("ce_nats") - expected) < 1e-6)
  }

  test("per-language models: the same token sequence scores differently under different language models") {
    // one corpus, two languages with DIFFERENT reference text: a doc's ce
    // must depend on which language's model judges it (the CCNet property
    // a single mixed-language LM cannot have)
    import spark.implicits._
    val corpus = ((0L until 30L).map(i => (i, s"alpha beta gamma d$i", "aa")) ++
      (30L until 60L).map(i => (i, s"zeta eta theta d$i", "bb")))
      .toDF("doc_id", "text", "lang")
    val store = java.nio.file.Files.createTempDirectory("graft_lm_perlang").toString + "/m"
    LmFilter.buildLmStore(corpus, store)
    val probe = Seq((900005L, "alpha beta gamma", "aa"),
                    (900006L, "alpha beta gamma", "bb"))
      .toDF("doc_id", "text", "lang")
    val out = LmFilter.scoreAgainstLmStore(probe, store)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ce_nats")).toMap
    assert(out(900005L) < out(900006L),
      s"aa-reference text must score lower under the aa model: $out")
  }

  test("every interpolated probability stays in (0, 1]: cross-entropy is never negative") {
    // regression for the cur-side-only unigram table: doc-INITIAL tokens
    // trained the bigram table but not the context counts, so a
    // sentence-starter's bf/cf could exceed 1 (ln p > 0) and text built
    // from doc-initial phrases scored NEGATIVE ce — an inverted ranking
    import spark.implicits._
    val corpus = (0L until 30L).map(i => (i, s"start tok w$i w${i + 1} w$i end", "en"))
      .toDF("doc_id", "text", "lang")
    val store = java.nio.file.Files.createTempDirectory("graft_lm_pos").toString + "/m"
    LmFilter.buildLmStore(corpus, store)
    // the adversarial doc is NOTHING BUT the doc-initial bigram repeated
    val adv = Seq((900004L, "start tok start tok start tok", "en"))
      .toDF("doc_id", "text", "lang")
    val advCe = LmFilter.scoreAgainstLmStore(adv, store)
      .collect()(0).getAs[Double]("ce_nats")
    assert(advCe > 0, s"doc-initial-phrase doc scored ce $advCe <= 0")
    // and corpus-wide on the real fixture: no doc anywhere scores <= 0
    assert(LmFilter.perplexityFilter(docs).filter(col("ce_nats") <= 0).count() === 0)
  }

  test("a torn store (no _SUCCESS) is refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_torn").toString
    val e = intercept[IllegalArgumentException] {
      LmFilter.scoreAgainstLmStore(docs, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }
}
