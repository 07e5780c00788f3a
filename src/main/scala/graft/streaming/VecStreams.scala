package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
