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

  /** Streaming decontamination — stream-static join: documents arriving on
    * the stream are checked against a STATIC eval-set shingle index (the
    * benchmark suite, loaded once as a batch DataFrame and broadcast).
    * Emits one row per contaminated stream doc with its shared-shingle
    * count — the continuous twin of the batch
    * [[graft.ext.Dedup.decontaminate]], sharing `shingle_hash60` so the
    * flags agree exactly.
    *
    * Scale shape: Spark's stream-static join re-plans the static side per
    * micro-batch; with the eval index broadcast there is no stateful join
    * state at all — each micro-batch resolves its hits map-side. The
    * aggregation is per (doc_id, arrival window) under a watermark, so
    * emission is append-mode and state is bounded by in-horizon docs. */
  def decontaminateStream(docs: DataFrame, evalDocs: DataFrame, n: Int = 5,
                          watermark: String = "1 hour"): DataFrame = {
    graft.functions.GraftFunctions.register(evalDocs.sparkSession)
    val evalSh = evalDocs
      .select(explode(expr(s"shingle_hash60(text, $n)")).as("shingle")).distinct()
    val streamSh = docs
      .withWatermark("ingest_ts", watermark)
      .select(col("doc_id"), col("ingest_ts"),
        explode(expr(s"shingle_hash60(text, $n)")).as("shingle"))
    streamSh.join(broadcast(evalSh), "shingle")
      .groupBy(window(col("ingest_ts"), "10 minutes"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_shared"))
  }

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
