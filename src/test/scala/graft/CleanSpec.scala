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
}
