package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Clean

/** Crafted-input coverage for the cleaning family (ext/Clean.scala): the
  * registry queries exercise these ops on derived corpus text, while these
  * specs pin the per-rule semantics on adversarial rows — overlapping PII
  * classes, all-boilerplate documents, rule-boundary quality docs. */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("piiScrub counts and redacts each class without double counting") {
    val out = Clean.piiScrub(docsDf(
      1L -> "mail bob@x.io and jane.doe+tag@sub.domain.org today",
      2L -> "call (123) 456-7890 now",
      3L -> "server 192.168.0.1 up",
      4L -> "ref 1234567 and 99999 short",
      5L -> "clean text only"
    )).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(out(1L).getAs[Int]("n_email") === 2)
    assert(out(1L).getAs[Int]("n_id") === 0)
    assert(out(2L).getAs[Int]("n_phone") === 1)
    assert(out(2L).getAs[Int]("n_ip") === 0)
    assert(out(3L).getAs[Int]("n_ip") === 1)
    assert(out(3L).getAs[Int]("n_id") === 0)
    // 1234567 redacted as <ID>; 99999 is only 5 digits — kept
    assert(out(4L).getAs[Int]("n_id") === 1)
    assert(out(5L).getAs[Int]("changed") === 0)
    assert(out(2L).getAs[Int]("changed") === 1)
  }

  test("piiScrub: an email's digit run is claimed by the email class, not the id class") {
    val out = Clean.piiScrub(docsDf(1L -> "write a1234567@example.com please")).head()
    assert(out.getAs[Int]("n_email") === 1)
    assert(out.getAs[Int]("n_id") === 0)
  }

  test("piiScrub scrubbed md5 equals the expected sentinel replacement") {
    val out = Clean.piiScrub(docsDf(1L -> "at bob@x.io or 10.0.0.1 end")).head()
    val expected = "at <EMAIL> or <IP> end"
    assert(out.getAs[String]("scrub_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(out.getAs[Int]("n_chars_scrubbed") === expected.length)
  }

  test("boilerplate drops lines at df >= minDf and keeps unique lines in order") {
    val docs = docsDf(
      1L -> "header\nbody one\nfooter",
      2L -> "header\nbody two\nfooter",
      3L -> "header\nbody three\nfooter",
      4L -> "header\nfooter" // every line boilerplate
    )
    val out = Clean.boilerplate(docs, minDf = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_lines") === 3)
    assert(out(1L).getAs[Int]("n_kept") === 1)
    assert(out(1L).getAs[Int]("n_removed") === 2)
    // the all-boilerplate doc survives with zero kept lines
    assert(out(4L).getAs[Int]("n_kept") === 0)
    assert(out(4L).getAs[String]("clean_md5") ===
      "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("boilerplate preserves kept-line order in the reassembled digest") {
    val docs = docsDf(
      1L -> "z last\nshared\na first\nshared",
      2L -> "shared\nmid",
      3L -> "shared\nother")
    val out = Clean.boilerplate(docs, minDf = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 keeps "z last" then "a first" in ORIGINAL order (not sorted text)
    val expected = "z last\na first"
    assert(out(1L).getAs[String]("clean_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("boilerplateAgainstStore drops lines by HISTORICAL df only, keeping increment order") {
    val dir = java.nio.file.Files.createTempDirectory("linedf_store").toString
    try {
      // history: "header"/"footer" in 3 docs each, "rare" in 1
      val hist = docsDf(
        1L -> "header\nbody one\nfooter",
        2L -> "header\nbody two\nfooter\nrare",
        3L -> "header\nbody three\nfooter")
      Clean.buildLineDfStore(hist, dir)
      // increment: repeated "fresh" lines within the increment do NOT make
      // it boilerplate (historical df decides; within-increment repetition
      // is the batch operator's contract)
      val inc = docsDf(
        10L -> "header\nfresh\nfooter",
        11L -> "fresh\nrare\nonly here",
        12L -> "header\nfooter")
      val out = Clean.boilerplateAgainstStore(inc, dir, minDf = 3)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(out(10L).getAs[Int]("n_kept") === 1)
      assert(out(10L).getAs[String]("clean_md5") === md5("fresh"))
      // "rare" has historical df 1 < 3 → kept
      assert(out(11L).getAs[Int]("n_kept") === 3)
      assert(out(11L).getAs[String]("clean_md5") === md5("fresh\nrare\nonly here"))
      // all-boilerplate doc survives with the empty digest
      assert(out(12L).getAs[Int]("n_kept") === 0)
      assert(out(12L).getAs[String]("clean_md5") === md5(""))
    } finally graft.ops.Scale.deleteRecursively(new java.io.File(dir))
  }

  test("line-df store: append over disjoint doc batches equals a from-scratch rebuild; compaction preserves probes") {
    val dir1 = java.nio.file.Files.createTempDirectory("linedf_a").toString
    val dir2 = java.nio.file.Files.createTempDirectory("linedf_b").toString
    try {
      val day0 = docsDf(1L -> "shared\nalpha", 2L -> "shared\nbeta")
      val day1 = docsDf(3L -> "shared\ngamma", 4L -> "shared\ndelta\nbeta")
      Clean.buildLineDfStore(day0, dir1)
      Clean.appendToLineDfStore(day1, dir1)
      Clean.buildLineDfStore(day0.unionByName(day1), dir2)
      val probe = docsDf(20L -> "shared\nbeta\nnovel")
      // "shared" df 4 ≥ 3 boiler; "beta" df 2 < 3 kept (summed across
      // append rows in dir1, single rows in dir2)
      val a = Clean.boilerplateAgainstStore(probe, dir1, minDf = 3).collect().map(_.toSeq)
      val b = Clean.boilerplateAgainstStore(probe, dir2, minDf = 3).collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
      assert(a.head(2) === 2) // n_kept: beta + novel
      // compaction collapses per-append rows without changing any probe
      Clean.compactLineDfStore(spark, dir1)
      val rows = spark.read.parquet(s"$dir1/linedf")
      assert(rows.groupBy("h").count().filter(col("count") > 1).count() === 0L,
        "compaction left duplicate keys")
      val c = Clean.boilerplateAgainstStore(probe, dir1, minDf = 3).collect().map(_.toSeq)
      assert(c.toSeq === a.toSeq)
    } finally {
      graft.ops.Scale.deleteRecursively(new java.io.File(dir1))
      graft.ops.Scale.deleteRecursively(new java.io.File(dir2))
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val oldSnap = docsDf(1L -> "same", 2L -> "will change", 3L -> "will vanish")
    val newSnap = docsDf(1L -> "same", 2L -> "did change", 4L -> "brand new")
    val out = graft.ext.Clean.snapshotDiff(oldSnap, newSnap)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("decontaminateStored equals the one-shot decontaminate on the live fixture") {
    val d = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val store = java.nio.file.Files.createTempDirectory("evalstore").toString
    graft.ext.Dedup.buildEvalStore(d.filter(col("doc_id") % 11 === 0), store)
    val stored = graft.ext.Dedup.decontaminateStored(d.filter(col("doc_id") % 11 =!= 0), store)
    val oneShot = graft.ext.Dedup.decontaminate(d)
    assert(stored.collect().toSeq === oneShot.collect().toSeq)
    // the probe plan reads the hash index, never the eval slice's text:
    // exactly one documents scan (the incoming side)
    // an executed AQE plan prints Final AND Initial sections — count the
    // scans of the final plan only
    val p = stored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val docScans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents.parquet"))
    assert(docScans === 1, s"$docScans documents scans (eval text rescanned?)\n$p")
    graft.ops.Scale.deleteRecursively(new java.io.File(store))
  }

  test("gopherQuality gates each rule independently") {
    val longDoc = (1 to 40).map(i => s"word$i").mkString(" ") + " the"
    val out = Clean.gopherQuality(docsDf(
      1L -> longDoc,                         // passes everything
      2L -> "a the cat",                     // too few words
      3L -> (Seq.fill(40)("extraordinarily").mkString(" ") + " the"), // mean len too high + low distinct
      4L -> (1 to 40).map(i => s"w$i").mkString(" ") // no stopword; mean len < 3
    )).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("pass_all") === 1)
    assert(out(2L).getAs[Int]("pass_word_count") === 0)
    assert(out(3L).getAs[Int]("pass_mean_len") === 0)
    assert(out(3L).getAs[Int]("pass_distinct") === 0)
    assert(out(4L).getAs[Int]("pass_stopword") === 0)
    assert(out(4L).getAs[Int]("pass_all") === 0)
  }

  test("production Cols variants differ from the oracle operators ONLY by the sort") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val oldSnap = docs.filter(col("doc_id") % 11 =!= 0)
    // each pair: (sorted oracle operator, no-sort production twin)
    val pairs = Seq(
      "piiScrub" -> (Clean.piiScrub(docs), Clean.piiScrubCols(docs)),
      "gopher" -> (Clean.gopherQuality(docs), Clean.gopherQualityCols(docs)),
      "boilerplate" -> (Clean.boilerplate(docs, 3), Clean.boilerplateCols(docs, 3)),
      "snapshotDiff" -> (Clean.snapshotDiff(oldSnap, docs),
        Clean.snapshotDiffCols(oldSnap, docs)))
    for ((name, (sorted, cols)) <- pairs) {
      // same relation (row set), sort being the only difference
      val a = sorted.collect().map(_.toString).sorted.toSeq
      val b = cols.collect().map(_.toString).sorted.toSeq
      assert(a === b, s"$name: Cols variant changed the relation")
      // and the production plan carries NO global sort (a sort-merge
      // join's LOCAL sorts and array_sort expressions are fine — the
      // batch-ism being shed is the total order across partitions)
      val globalSorts = cols.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
      }
      assert(globalSorts.isEmpty, s"$name: production plan still globally sorts")
      val sortedHasIt = sorted.queryExecution.optimizedPlan.collect {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
      }
      assert(sortedHasIt.nonEmpty, s"$name: oracle operator lost its sort?")
    }
  }
}
