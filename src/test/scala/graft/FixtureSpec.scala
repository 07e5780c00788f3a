package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture CONTRACT: the driver regenerates /root/testdata between rounds
  * (r5 flipped events.ts from nanos-as-long to TIMESTAMP_NTZ and silently
  * broke seven operators at analysis time). This spec pins the schema
  * invariants the operator surface assumes, against the LIVE fixture dir,
  * so the next encoding drift is ONE named failure here instead of
  * scattered DATATYPE_MISMATCH errors. Assertions cover what operators
  * rely on (post-`Tables.load` types), not the parquet encoding itself —
  * the load layer is exactly where encoding variance must die.
  */
class FixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def typeOf(table: String, column: String): DataType =
    Tables.load(spark, dir, table).schema(column).dataType

  test("every table loads from the live fixture dir") {
    Tables.all.foreach { t =>
      assert(Tables.load(spark, dir, t).schema.nonEmpty, s"$t has no schema")
    }
  }

  test("events: ts normalizes to TimestampType whatever the parquet encoding") {
    // unix_millis (the Events.tsMs projection) analyzes ONLY on TimestampType;
    // Tables.load owns the nanos-long / NTZ / adjusted-to-UTC normalization.
    assert(typeOf("events", "ts") === TimestampType)
    assert(typeOf("events", "event_id") === LongType)
    assert(typeOf("events", "user_id") === LongType)
    assert(typeOf("events", "event_type") === StringType)
    assert(typeOf("events", "value") === DoubleType)
    // jsonProps parses props as a JSON STRING via get_json_object
    assert(typeOf("events", "props") === StringType)
  }

  test("documents: id/text/source shapes the dedup+text families assume") {
    assert(typeOf("documents", "doc_id") === LongType)
    assert(typeOf("documents", "text") === StringType)
    assert(typeOf("documents", "lang") === StringType)
    assert(typeOf("documents", "source") === StringType)
    assert(typeOf("documents", "n_chars") === LongType)
  }

  test("embeddings: float vector + long id the ANN family assumes") {
    assert(typeOf("embeddings", "vec_id") === LongType)
    assert(typeOf("embeddings", "embedding") === ArrayType(FloatType, containsNull = true))
  }

  test("date/timestamp columns are temporal (naive NTZ or instant both fine)") {
    // SOQL date math runs in the UTC session, where NTZ and instant agree
    // with DuckDB's naive timestamps; what would break operators is these
    // arriving as string/long.
    Seq("lineitem" -> "l_shipdate", "orders" -> "o_orderdate").foreach {
      case (t, c) =>
        val dt = typeOf(t, c)
        assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
          s"$t.$c is $dt — not a temporal type")
    }
  }

  test("events.ts actually carries microsecond-era instants (not mis-scaled)") {
    // A wrong unit conversion (e.g. nanos interpreted as micros) throws the
    // epoch into year ~1972 or ~52970; assert the data lands in a sane
    // decade so unit drift fails loudly here.
    import org.apache.spark.sql.functions._
    val r = Tables.load(spark, dir, "events")
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"events.ts year range [${r.getInt(0)}, ${r.getInt(1)}] — unit drift?")
  }
}
