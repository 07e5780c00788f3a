package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Shape

class ShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pkChunkedScan partitions the id space exactly: union ≡ unchunked scan") {
    val dir = SparkTestSession.sfDir
    val full = graft.ops.Extract.objectScan(spark, dir, "orders",
      Seq("o_orderkey", "o_custkey")).collect().map(_.toSeq).sortBy(_.head.toString)
    val chunked = graft.ops.Extract.pkChunkedScan(spark, dir, "orders", "o_orderkey",
      Seq("o_orderkey", "o_custkey"), nChunks = 8)
    assert(chunked.collect().map(_.toSeq).sortBy(_.head.toString).toSeq === full.toSeq)
    // no row is lost or duplicated across chunk boundaries
    assert(chunked.select("o_orderkey").distinct().count() === full.length.toLong)
    // degenerate: more chunks than the key span still covers every row
    val region = graft.ops.Extract.objectScan(spark, dir, "region", Nil)
    val rchunk = graft.ops.Extract.pkChunkedScan(spark, dir, "region", "r_regionkey",
      Nil, nChunks = 64)
    assert(rchunk.count() === region.count())
  }

  test("dropAttributes removes the envelope column, no-op otherwise") {
    val df = Seq((1, "t")).toDF("id", "attributes")
    assert(Shape.dropAttributes(df).columns.toSeq === Seq("id"))
    val df2 = Seq((1, "t")).toDF("id", "x")
    assert(Shape.dropAttributes(df2).columns.toSeq === Seq("id", "x"))
  }

  test("lowercaseColumns mirrors rs_name lowering") {
    val df = Seq((1, "a")).toDF("Id", "FirstName")
    assert(Shape.lowercaseColumns(df).columns.toSeq === Seq("id", "firstname"))
  }

  test("coerceTimestamps converts timestamp and date columns to epoch millis") {
    val df = Seq(("2024-03-01 12:00:00", "2024-03-01"))
      .toDF("ts", "d")
      .select(col("ts").cast("timestamp"), col("d").cast("date"), lit("keep").as("s"))
    val out = Shape.coerceTimestamps(df)
    val row = out.head()
    assert(row.getLong(0) === 1709294400000L) // 2024-03-01T12:00Z
    assert(row.getLong(1) === 1709251200000L) // 2024-03-01T00:00Z
    assert(row.getString(2) === "keep")       // non-temporal untouched
  }

  test("auditColumn stamps one constant per batch") {
    val df = Seq(1, 2, 3).toDF("id")
    val out = Shape.auditColumn(df, 1234567890123L)
    val vals = out.select("time_fetched_from_salesforce_at").distinct().collect()
    assert(vals.map(_.getLong(0)).toSeq === Seq(1234567890123L))
  }

  test("sanitizeCsv strips CR/LF from string columns only") {
    val df = Seq((1, "a\r\nb\nc")).toDF("id", "s")
    val out = Shape.sanitizeCsv(df).head()
    assert(out.getString(1) === "abc")
    assert(out.getInt(0) === 1)
  }

  test("flattenRelationship: inner semantics — parents without children dropped, parent cols discarded") {
    val df = Seq(
      (1, Some(Seq((10, "a"), (11, "b")))),
      (2, None),          // relationship key absent → dropped (ref :158)
      (3, Some(Seq.empty[(Int, String)]))) // empty records → dropped
      .toDF("parent_id", "recs")
      .select(col("parent_id"),
        struct(col("recs").as("records")).as("contacts"))
    val out = Shape.flattenRelationship(df, "contacts")
    assert(out.columns.toSeq === Seq("_1", "_2"))
    assert(out.count() === 2)
    assert(out.select("_1").as[Int].collect().sorted.toSeq === Seq(10, 11))
  }
}
