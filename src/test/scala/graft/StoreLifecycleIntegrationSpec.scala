package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.{BloomDedup, Clean, Dedup, Similarity, TextAnalysis}

/** MULTI-DAY lifecycle integration (VERDICT r10 #7): one suite drives
  * build (day 0) → three daily appends → compact → probe for every stored
  * index TOGETHER, asserting each lifecycle probe ≡ the probe against a
  * ONE-SHOT store built over all four days at once. The per-store specs
  * each prove append ≡ rebuild in isolation; this catches cross-store
  * drift in the shared lifecycle conventions (disjoint-batch contract,
  * StoreLifecycle publish, compaction-preserves-relation) that those
  * can't — a regression in ONE family's append or compact verb fails
  * here even if its narrow spec wasn't updated.
  *
  * Day slices follow the registry's split convention: history =
  * doc_id % 7 != 0 cut into four disjoint ranges (the daily batches),
  * probe = the doc_id % 7 == 0 increment — guaranteed to contain exact
  * and near hits against history (the fixture's seeded clone topology).
  */
class StoreLifecycleIntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
  private lazy val hist = docs.filter(col("doc_id") % 7 =!= 0)
  private lazy val inc = docs.filter(col("doc_id") % 7 === 0)
  // four disjoint daily batches covering history exactly
  private lazy val days: Seq[DataFrame] = Seq(
    hist.filter(col("doc_id") < 200),
    hist.filter(col("doc_id") >= 200 && col("doc_id") < 300),
    hist.filter(col("doc_id") >= 300 && col("doc_id") < 400),
    hist.filter(col("doc_id") >= 400))

  private lazy val embs =
    spark.read.parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
  // day 0 must contain the coarse-quantizer rows [100, 116)
  private lazy val embDays: Seq[DataFrame] = Seq(
    embs.filter(col("vec_id") < 200),
    embs.filter(col("vec_id") >= 200 && col("vec_id") < 300),
    embs.filter(col("vec_id") >= 300 && col("vec_id") < 400),
    embs.filter(col("vec_id") >= 400))

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft-lifecycle-it/$name"
    graft.ops.Scale.deleteRecursively(new java.io.File(dir))
    dir
  }

  private def assertSameRelation(label: String, lifecycle: DataFrame,
                                 oneshot: DataFrame): Unit = {
    val a = lifecycle.collect().map(_.toString).sorted.toSeq
    val b = oneshot.collect().map(_.toString).sorted.toSeq
    assert(a === b, s"$label: lifecycle probe diverges from one-shot rebuild")
    assert(a.nonEmpty, s"$label: probe relation is empty — fixture lost its hits")
  }

  /** Run one family through the shared shape: build(day0) → append ×3 →
    * compact → probe, vs probe(one-shot build over all days). */
  private def drive(name: String,
                    build: (DataFrame, String) => Unit,
                    append: (DataFrame, String) => Unit,
                    compact: Option[String => Unit],
                    probe: String => DataFrame,
                    batches: Seq[DataFrame] = null): Unit = {
    val bs = Option(batches).getOrElse(days)
    val lc = fresh(s"$name-lifecycle")
    build(bs.head, lc)
    bs.tail.foreach(append(_, lc))
    compact.foreach(_(lc))
    val os = fresh(s"$name-oneshot")
    build(bs.reduce(_.unionByName(_)), os)
    assertSameRelation(name, probe(lc), probe(os))
  }

  test("band store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("band",
      (df, dir) => Dedup.buildBandStore(df, dir),
      (df, dir) => Dedup.appendToBandStore(df, dir),
      Some(dir => Dedup.compactBandStore(spark, dir)),
      dir => Dedup.incrementalStored(inc, dir))
  }

  test("span store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("span",
      (df, dir) => Dedup.buildSpanStore(df, dir),
      (df, dir) => Dedup.appendToSpanStore(df, dir),
      Some(dir => Dedup.compactSpanStore(spark, dir)),
      dir => Dedup.spansAgainstStore(inc, dir))
  }

  test("paragraph store: 3 daily appends probe ≡ one-shot rebuild") {
    drive("paragraph",
      (df, dir) => Dedup.buildParagraphStore(df, dir),
      (df, dir) => Dedup.appendToParagraphStore(df, dir),
      None, // duplicate hashes across appends are folded by the probe's DISTINCT
      dir => Dedup.paragraphsAgainstStore(inc, dir))
  }

  test("line-df store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("linedf",
      (df, dir) => Clean.buildLineDfStore(df, dir),
      (df, dir) => Clean.appendToLineDfStore(df, dir),
      Some(dir => Clean.compactLineDfStore(spark, dir)),
      dir => Clean.boilerplateAgainstStore(inc, dir, minDf = 2))
  }

  test("winnow store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("winnow",
      (df, dir) => TextAnalysis.buildWinnowStore(df, dir),
      (df, dir) => TextAnalysis.appendToWinnowStore(df, dir),
      Some(dir => TextAnalysis.compactWinnowStore(spark, dir)),
      dir => TextAnalysis.winnowAgainstStore(inc, dir))
  }

  test("IVF store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("ivf",
      (df, dir) => Similarity.buildIvfStore(df, dir),
      (df, dir) => Similarity.appendToIvfStore(df, dir),
      Some(dir => Similarity.compactIvfStore(spark, dir)),
      dir => Similarity.ivfAgainstStore(embs.filter(col("vec_id") < 10), dir),
      batches = embDays)
  }

  test("Bloom store: 3 daily appends probe ≡ one-shot rebuild (bit-identical)") {
    // same sizing for both roots — equal bit-array size and hash count are
    // what make the OR-merge ≡ rebuild (buildBloomStore's meta contract)
    val lc = fresh("bloom-lifecycle")
    BloomDedup.buildBloomStore(days.head, lc, expectedItems = 1000)
    days.tail.foreach(BloomDedup.appendToBloomStore(_, lc))
    val os = fresh("bloom-oneshot")
    BloomDedup.buildBloomStore(hist, os, expectedItems = 1000)
    val a = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$lc/bloom.bin"))
    val b = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$os/bloom.bin"))
    assert(java.util.Arrays.equals(a, b),
      "bloom: OR-merged filter bytes diverge from one-shot build")
    assertSameRelation("bloom",
      BloomDedup.probeStored(inc, lc), BloomDedup.probeStored(inc, os))
  }

  test("triage store: 3 daily appends + compact probe ≡ one-shot rebuild") {
    drive("triage",
      (df, dir) => Dedup.buildTriageStore(df, dir, expectedItems = 1000),
      (df, dir) => Dedup.appendToTriageStore(df, dir),
      Some(dir => Dedup.compactTriageStore(spark, dir)),
      dir => Dedup.ingestTriageStored(inc, dir))
  }
}
