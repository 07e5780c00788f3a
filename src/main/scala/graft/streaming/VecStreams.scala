package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins for the EMBEDDING family — the model-serving side of the
  * similarity operators, extending the streaming surface past docs/events
  * to vectors (an embedding service emits vectors continuously; cluster
  * routing / topic tagging wants each one labeled the moment it lands).
  *
  * Reference scope note: streams are an extension (the reference is
  * batch-only Airflow ETL, `salesforce_to_s3_operator.py:164-230`); the
  * twin discipline matches the rest of the streaming surface — each stream
  * IS the batch operator's shared projection, differentially spec'd equal
  * under random micro-batch splits.
  */
/** One embedding arriving on the vector stream: the `embeddings` columns
  * (no event time — the serving twins here are stateless, nothing to
  * watermark). */
case class VecIn(vec_id: Long, embedding: Array[Float])

/** One QUERY vector arriving on the ANN-serving stream: `query_id`, the
  * arrival timestamp that drives the emission watermark, and the vector. */
case class VecQueryIn(query_id: Long, ts: java.sql.Timestamp,
                      embedding: Array[Float])

object VecStreams {

  /** Streaming cluster assignment against the IVF store's FROZEN quantizer
    * — the vector twin of [[DocStreams.qualityScoreStoreStream]]'s
    * train-once-serve-forever shape: the store's centroids (flat or hier,
    * whichever `hier.txt` records) fold to literals at plan time and every
    * arriving vector is argmax-assigned in one narrow pass. Not a
    * reimplementation: it IS [[graft.ext.Similarity.assignAgainstIvfStore]]
    * applied to the stream (one definition — nothing to drift; spec'd
    * equal to the batch relation under seeded random micro-batch splits).
    *
    * Stateless — no watermark, no join, no state rows, append mode: the
    * quantizer is bounded (nList ≈ √n) by design, so at any corpus scale
    * this stays a pure map over arriving micro-batches. Store APPENDS
    * don't move the assignment (the frozen-quantizer contract: append
    * re-uses the same centroids), so a long-running stream never drifts
    * from the store it probes; a store REBUILD (new quantizer) is a new
    * stream deployment, exactly like the quality/DSIR model twins. */
  def assignStream(vecs: DataFrame, storeDir: String): DataFrame =
    graft.ext.Similarity.assignAgainstIvfStore(vecs, storeDir)

  /** Streaming ANN SERVING against the stored IVF index — the online form
    * of [[graft.ext.Similarity.ivfAgainstStore]]: each arriving query
    * vector probes its nProbe lists (the SHARED `storeProbeCols`
    * list-selection projection — one definition with the batch probe),
    * candidates come from a stream-static equi-join on `list_id` against
    * the store's lists relation, and the top-k emits from ONE windowed
    * aggregation (collect the bounded candidate set, sort by the batch tie
    * rule (cosine DESC, vec_id ASC) as a struct sort, slice k) once the
    * watermark passes — the batch twin's exact columns, differentially
    * spec'd equal under seeded random micro-batch splits.
    *
    * Scale shape: one stateful operator, state bounded by in-horizon
    * queries × their candidate lists (candidates per query ≈
    * nProbe/nList of the corpus — the IVF contract), never the store
    * size. The static side re-plans per micro-batch, so store APPENDS are
    * picked up on the next batch (a mid-run append changes candidate
    * sets exactly as it would for the next batch run — the frozen
    * quantizer keeps list selection fixed). Trade vs batch: the batch
    * probe collects the probed list ids and file-prunes the lists scan;
    * a stream cannot collect per batch, so the join itself does the
    * pruning — one lists-relation scan per micro-batch instead. */
  def annStream(queries: DataFrame, storeDir: String, k: Int = 5,
                nProbe: Int = 4, watermark: String = "1 hour"): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val qv = queries.withWatermark("ts", watermark)
      .select(col("query_id").as("vec_id"), col("ts"),
        expr("vec_quantize(embedding)").as("q"))
      .withColumn("nrm", expr("vec_dotl(q, q)"))
    val probed = graft.ext.Similarity.storeProbeCols(qv, storeDir, nProbe)
      .select(col("vec_id").as("query_id"), col("ts"), col("q").as("qq"),
        col("nrm").as("nq"), col("list_id"))
    val lists = spark.read.parquet(s"$storeDir/lists")
    probed.join(lists, "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", expr(
        "vec_dotl(qq, q) / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE)))"))
      .groupBy(window(col("ts"), "10 minutes"), col("query_id"))
      .agg(collect_list(
        struct(col("cosine"), col("vec_id"), col("list_id"))).as("cands"))
      .select(col("query_id"), posexplode(expr(
        s"""slice(array_sort(transform(cands, c ->
           |  struct(0e0 - c.cosine AS nc, c.vec_id AS vec_id,
           |         c.cosine AS cosine, c.list_id AS list_id))), 1, $k)"""
          .stripMargin)).as(Seq("r", "c")))
      .select(col("query_id"), (col("r") + 1).cast("int").as("rank"),
        col("c.vec_id").as("neighbor_id"),
        expr("round(c.cosine, 6)").as("cosine"), col("c.list_id").as("list_id"))
  }
}
