package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table access. Mirrors the reference's "Salesforce object" concept
  * (a named table fetched from a source — ref: `/root/reference/operators/
  * salesforce_to_s3_operator.py:30,121` `sf_obj`/`object_type` params):
  * here each object is a parquet dataset under the scale-factor dir.
  *
  * Scale note: `spark.read.parquet` is a partitioned `FileSourceScanExec` —
  * many executor tasks read row-groups in parallel. This *is* the Spark
  * equivalent of the reference's Bulk API extract (ref:
  * `salesforce_to_s3_operator.py:50`), and it scales linearly with input
  * splits; nothing is ever materialized on the driver.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events `ts` column has shipped under three legal parquet encodings
    // across fixture generations; the scan must be agnostic to all of them:
    //  - TIMESTAMP(NANOS): Spark 4 rejects it unless surfaced as long
    //    (nanosAsLong), then we convert to native microsecond TimestampType.
    //  - TIMESTAMP_MICROS with isAdjustedToUTC=0: read as TIMESTAMP_NTZ;
    //    the session runs UTC, so casting to TimestampType reinterprets the
    //    wall-clock as the same UTC instant (no shift).
    //  - TIMESTAMP_MICROS adjusted to UTC: already TimestampType, no-op.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ->TimestampType cast below is instant-preserving ONLY in a UTC
    // session; pin it here (not just in entry points) so any future caller
    // cannot silently shift event timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType =>
        // integer div — a double division of epoch-nanos (~2^60) loses ulps
        // and can flip the microsecond at the boundary
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view named after the object, so that
    * translated SOQL / SQL strings resolve. Cheap (metadata only). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
