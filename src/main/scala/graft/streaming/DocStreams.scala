package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One document arriving on the ingest stream: the `documents` columns plus
  * the arrival timestamp that drives the dedup watermark. */
case class DocIn(doc_id: Long, ingest_ts: Timestamp, text: String,
                 lang: String, source: String)

/** Streaming corpus ingest — the continuous version of the batch
  * `pipeline_filter_dedup` composite (quality gate ∧ exact dedup), the
  * shape of a training-corpus front door that ingests crawl output as it
  * lands instead of in nightly batches:
  *
  *   1. exact-dedup on the content key within the watermark horizon —
  *      `dropDuplicatesWithinWatermark` keeps the FIRST arrival and drops
  *      re-deliveries (at-least-once sources) and content duplicates until
  *      the watermark passes; state is one compact (key, expiry) entry per
  *      distinct in-horizon content key, executor-partitioned by key —
  *      bounded by horizon cardinality, never by corpus size;
  *   2. quality-score each surviving document with the SAME column
  *      expression as the batch operator ([[graft.ext.TextAnalysis
  *      .qualityScoreExpr]] — one shared definition, so the two paths can
  *      never diverge) and gate on the threshold.
  *
  * Semantics note (spec-asserted): dedup keeps the first ARRIVAL, where the
  * batch operator keeps the min doc_id per key — identical whenever
  * arrival order follows doc_id (the crawl-ingest norm); under inverted
  * arrival the streaming result keeps the earlier-arriving id, which is the
  * right call for a front door (the kept doc is already downstream).
  */
object DocStreams {

  def ingest(docs: DataFrame, watermark: String = "1 hour",
             minQuality: Double = 50.0): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("content_key", expr("md5(substring(text, 1, 80))"))
      .dropDuplicatesWithinWatermark("content_key")
      .select(col("doc_id"), col("lang"), col("source"),
        expr(graft.ext.TextAnalysis.qualityScoreExpr).as("quality_score"))
      .filter(col("quality_score") >= minQuality)

  /** File-based entry point: tail a directory of parquet document drops
    * (the crawl-lands-files shape) and write the kept docs to a parquet
    * sink with checkpointing — the full readStream → transform →
    * writeStream contract. Returns the started query (caller
    * awaits/stops). */
  def runFileIngest(spark: org.apache.spark.sql.SparkSession, srcDir: String,
                    outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.Encoders.product[DocIn].schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    ingest(stream).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
