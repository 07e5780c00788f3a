package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the training-batch assembly step of an LLM data
  * pipeline: documents are concatenated in a deterministic order and cut
  * into fixed token-budget training sequences (the "concat-and-chunk"
  * packing that T5/GPT-style pretraining uses, where documents may span
  * sequence boundaries). This operator computes the packing PLAN: for each
  * document, which training sequences it lands in.
  *
  * Design choices, stated because packing variants differ:
  *  - documents are streams-per-`source`, ordered by doc_id inside each
  *    source — packing is embarrassingly parallel across sources, and the
  *    assignment is reproducible run-to-run (no RNG, no partition-order
  *    dependence);
  *  - documents SPLIT across sequence boundaries (token-exact packing, zero
  *    padding waste), as opposed to first-fit bin packing which is
  *    inherently sequential per bin and wastes tail tokens.
  *
  * Scale shape: one shuffle on `source` + an in-partition ordered prefix
  * sum (Spark's running-window aggregate — no driver state, spills fine).
  * Parallelism is bounded by source cardinality; at 100 TB with few huge
  * sources, pre-shard the stream key (e.g. (source, doc_id div 1e6)) — the
  * per-shard plan is identical, only the stream boundaries move.
  */
object Packing {

  /** For each document: total tokens, and the first/last training-sequence
    * index it occupies under `budget`-token packing of its source's stream.
    * All arithmetic is exact-integer (prefix sums + integral division), so
    * the DuckDB oracle matches bit-for-bit. */
  def pack(docs: DataFrame, budget: Int = 256): DataFrame = {
    val t = docs.select(col("source"), col("doc_id"),
      expr("size(split(text, ' '))").as("n_tokens"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("n_tokens").over(w))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("first_seq"),
        expr(s"(cum - 1) div $budget").as("last_seq"),
        expr(s"(cum - 1) div $budget - (cum - n_tokens) div $budget + 1").as("n_seqs"))
      .orderBy("source", "doc_id")
  }
}
