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

  /** Pre-sharded [[pack]] — the scale fix [[pack]]'s doc promises: the
    * prefix-sum stream key becomes (source, shard = doc_id div shardSize),
    * so parallelism is Σ ceil(docs_per_source / shardSize) instead of
    * source cardinality — one huge source no longer serializes onto one
    * task at 100 TB. Sequence indices are LOCAL to the shard (each shard's
    * stream restarts at 0); the per-shard plan is byte-identical to
    * [[pack]]'s, only the stream boundaries move, and a training run
    * consumes shards independently exactly as it consumes sources.
    * With shardSize ≥ the id range, every source is one shard and the
    * result is [[pack]]'s exactly (spec-asserted). */
  def packSharded(docs: DataFrame, budget: Int = 256, shardSize: Long = 100): DataFrame = {
    require(shardSize > 0)
    val t = docs.select(col("source"), col("doc_id"),
      expr(s"doc_id div $shardSize").as("shard"),
      expr("size(split(text, ' '))").as("n_tokens"))
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum", sum("n_tokens").over(w))
      .select(col("source"), col("shard"), col("doc_id"), col("n_tokens"),
        expr(s"(cum - n_tokens) div $budget").as("first_seq"),
        expr(s"(cum - 1) div $budget").as("last_seq"),
        expr(s"(cum - 1) div $budget - (cum - n_tokens) div $budget + 1").as("n_seqs"))
      .orderBy("source", "doc_id")
  }

  /** Source-mixture plan — the data-MIXING step of a corpus build: given a
    * total training-token budget, apportion it across sources in exact
    * proportion to their token counts, with the fractional remainders
    * resolved by the largest-remainder method (ties → source asc). The
    * result is the per-source sampling plan a training run consumes; by the
    * largest-remainder property the quotas sum to the budget EXACTLY (no
    * lost or invented tokens — spec-asserted).
    *
    * All arithmetic is exact-integer (BIGINT products and div/mod; the only
    * double is the reported `share` ratio), so the DuckDB oracle matches
    * bit-for-bit. `budget × n_tokens` must stay within BIGINT — at extreme
    * scale (both ≥ ~3e9) lift the products to DECIMAL(38,0) on both
    * engines, same plan.
    *
    * Scale shape: ONE partial-agg shuffle on source (map-side combine over
    * the corpus); every window after it runs over the S-row per-source
    * aggregate (S = source cardinality, bounded — hundreds at 100 TB), in
    * one intended partition keyed by a constant non-foldable expression
    * (a bare global window would both warn and, on a large S, bottleneck —
    * here S is small by construction). */
  def mixture(docs: DataFrame, budgetTokens: Long = 1000000L): DataFrame = {
    require(budgetTokens > 0)
    val per = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(expr("size(split(text, ' '))")).cast("long").as("n_tokens"))
      // computed ONCE as a column so all three windows below share a single
      // hashpartitioning exchange (three inline copies of the expression
      // are distinct attributes to the planner → three exchanges); the
      // coalesce keeps a NULL source in the SAME partition — length(NULL)
      // is NULL, and a NULL key would fork a second window partition that
      // apportions the full budget again
      .withColumn("__one", expr("coalesce(length(source) % 1, 0)"))
    val one = Window.partitionBy("__one")
    val ranked = per
      .withColumn("total", sum("n_tokens").over(one))
      .withColumn("share", expr("round(n_tokens / total, 6)"))
      .withColumn("base_quota", expr(s"($budgetTokens * n_tokens) div total"))
      .withColumn("rem", expr(s"($budgetTokens * n_tokens) % total"))
      .withColumn("leftover", lit(budgetTokens) - sum("base_quota").over(one))
      // asc_nulls_last: Spark's bare asc sorts NULLs first, DuckDB's last —
      // if the NULL source the __one key defends against ever appears, the
      // tie-break rank (and the final row order below) must agree across
      // engines, not silently diverge
      .withColumn("rk", row_number().over(
        Window.partitionBy("__one").orderBy(col("rem").desc, col("source").asc_nulls_last)))
    ranked
      .withColumn("extra", when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("share"),
        col("base_quota"), col("extra"),
        (col("base_quota") + col("extra")).as("quota_tokens"))
      .orderBy(col("source").asc_nulls_last)
  }

  /** PACKING-efficiency report — the tuning read for [[pack]]'s
    * split-across-boundaries discipline: per source, how many docs got
    * FRAGMENTED across a sequence boundary (the training-quality cost of
    * split packing — attention never sees the cut halves together), the
    * split fraction, the tail padding waste (split packing wastes ONLY
    * the final partial sequence), and the fill rate. The report a corpus
    * build reads before choosing budget size.
    *
    * Scale shape: [[pack]]'s one source-keyed window shuffle, then a
    * per-source partial agg — output bounded by |sources|. Exact integers
    * plus two IEEE divisions. */
  def packStats(docs: DataFrame, budget: Int = 256): DataFrame =
    pack(docs, budget)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").cast("long").as("total_tokens"),
        (max("last_seq") + 1).cast("long").as("n_seqs"),
        sum(when(col("n_seqs") > 1, 1L).otherwise(0L)).cast("long").as("n_split_docs"))
      .withColumn("split_frac", expr("round(n_split_docs / n_docs, 6)"))
      .withColumn("tail_waste", expr(s"n_seqs * ${budget}L - total_tokens"))
      .withColumn("fill_rate", expr(s"round(total_tokens / (n_seqs * $budget), 6)"))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("n_seqs"),
        col("n_split_docs"), col("split_frac"), col("tail_waste"), col("fill_rate"))
      .orderBy("source")

  /** TEMPERATURE-scaled source sampling weights — the α-sampling rule of
    * multilingual/multi-source pretraining: raw source shares p_i are
    * flattened to w_i ∝ p_i^α (α < 1 upsamples the tail, α = 1 is
    * proportional, α = 0 uniform), giving each source its sampling weight,
    * its boost over natural share, and its expected token draw per epoch.
    * Decides the mixture [[mixture]] then materializes with integer
    * quotas.
    *
    * Scale shape: ONE partial-agg shuffle to per-source (docs, tokens) —
    * everything after runs on the |sources|-bounded relation (totals via
    * the shared `__one` single-exchange window, same discipline as
    * [[mixture]]).
    *
    * Determinism: the two double sums that cross rows (Σ tokens is exact
    * BIGINT; Σ p^α is order-sensitive IEEE) — the latter goes through
    * DECIMAL(38,18) so summation order cannot flip a bit; p, p^α, and the
    * final normalization are IEEE expressions written with the same
    * literal shape in the oracle (`power` is libm in both engines;
    * round-6 absorbs the last-ulp divergence). */
  def sourceTemperature(docs: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0)
    val per = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(expr("size(split(text, ' '))")).cast("long").as("n_tokens"))
      .withColumn("__one", expr("coalesce(length(source) % 1, 0)"))
    val one = Window.partitionBy("__one")
    per
      .withColumn("total", sum("n_tokens").over(one))
      .withColumn("p", expr("n_tokens / total"))
      // pow(col, lit(alpha)) — NOT string interpolation: a Double whose
      // toString is scientific notation (e.g. 1.0E-4) would render an
      // unparseable SQL literal like "1.0E-4e0"
      .withColumn("wr", pow(expr("n_tokens / total"), lit(alpha)))
      .withColumn("wsum", expr("CAST(sum(CAST(wr AS DECIMAL(38,18))) OVER (PARTITION BY __one) AS DOUBLE)"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("round(p, 6)").as("share"),
        expr("round(wr / wsum, 6)").as("weight"),
        expr("round((wr / wsum) / p, 6)").as("boost"),
        expr("round(wr / wsum * total, 2)").as("expected_tokens"))
      .orderBy(col("source").asc_nulls_last)
  }

  /** Budget-constrained QUALITY selection — the data-selection step of a
    * corpus build: take the highest-quality documents, best first, until a
    * global token budget is covered (the "rank by quality, keep the top
    * slice that fits" discipline of quality-first pretraining data
    * selection — the global-budget complement of [[mixtureSampled]]'s
    * per-source quotas and [[graft.ext.TextAnalysis.qualityPrune]]'s
    * fixed-quantile cut).
    *
    * The quality key is the integer-exact quantization of
    * [[graft.ext.TextAnalysis.qualityScoreExpr]]:
    * `q_scaled = (1e8 · distinct · least(total, 30)) div (total · 30)`
    * (= ⌊1e6 · quality_score⌋, all-BIGINT), so ordering, selection and the
    * DuckDB oracle are bit-deterministic — no IEEE anywhere.
    *
    * Selection rule (same boundary discipline as [[mixtureSampled]]): a doc
    * is selected iff the tokens strictly before it in (q_scaled DESC,
    * doc_id ASC) order are still under the budget — the last doc may
    * overshoot by part of itself, the budget is always covered.
    *
    * Scale shape — the naive formulation is ONE GLOBAL window (every doc
    * through one partition); this plan never does that. Phase A aggregates
    * per distinct score (one partial-agg shuffle, map-side combined) and
    * prefix-sums the SCORE relation — |distinct scores| rows, bounded by
    * the 1e8 quantization space and in practice tiny next to the corpus.
    * Phase B joins docs only to the surviving candidate score-groups
    * (groups whose tokens-before < budget — the join prunes the corpus to
    * near-budget size) and ranks within each score group, partitioned by
    * q_scaled — many bounded partitions, no global funnel. Global rank and
    * cumulative tokens are reassembled exactly as group-offset + in-group
    * prefix (spec-asserted ≡ the naive global window). */
  def qualityBudget(docs: DataFrame, budgetTokens: Long = 20000L): DataFrame = {
    require(budgetTokens > 0)
    val t = docs.select(col("doc_id"), col("source"),
      expr("size(split(text, ' '))").cast("long").as("n_tokens"),
      expr("""(100000000L * size(array_distinct(split(text, ' ')))
             |  * least(size(split(text, ' ')), 30))
             | div (size(split(text, ' ')) * 30L)""".stripMargin).as("q_scaled"))
    val byScore = t.groupBy("q_scaled")
      .agg(sum("n_tokens").as("g_tokens"), count(lit(1)).as("g_docs"))
      .withColumn("__one", graft.ops.Scale.constKey(col("q_scaled")))
    val wS = Window.partitionBy("__one").orderBy(col("q_scaled").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val candidates = byScore
      .withColumn("tokens_before", sum("g_tokens").over(wS) - col("g_tokens"))
      .withColumn("docs_before", sum("g_docs").over(wS) - col("g_docs"))
      // only groups that still have budget left can contribute a doc; this
      // filter is what keeps phase B's join near-budget-sized, not corpus-sized
      .filter(col("tokens_before") < budgetTokens)
      .select("q_scaled", "tokens_before", "docs_before")
    val wG = Window.partitionBy("q_scaled").orderBy("doc_id")
    t.join(candidates, "q_scaled")
      .withColumn("cum_in_group", sum("n_tokens").over(
        wG.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rank_in_group", row_number().over(wG))
      .filter(col("tokens_before") + col("cum_in_group") - col("n_tokens") < budgetTokens)
      .select(
        (col("docs_before") + col("rank_in_group")).cast("long").as("pick_rank"),
        col("doc_id"), col("source"), col("q_scaled"), col("n_tokens"),
        (col("tokens_before") + col("cum_in_group")).cast("long").as("cum_tokens"))
      .orderBy("pick_rank")
  }

  /** [[mixture]] APPLIED — the selection step after the plan: within each
    * source, documents are taken in deterministic md5(doc_id) order (the
    * [[Sampling.stratifiedSample]] discipline — RNG-free, layout- and
    * partitioning-independent) until the source's token quota is covered.
    * Greedy boundary rule: a doc is selected iff the tokens BEFORE it are
    * still under the quota, so the final doc may overshoot by part of
    * itself (token-exact trimming is [[pack]]'s job downstream) and every
    * quota is covered, never silently under-filled.
    *
    * Scale shape: the S-row quota plan broadcasts back onto the corpus
    * (never a corpus shuffle for the join); selection is one per-source
    * window (rank + running token sum share the single (source) exchange). */
  def mixtureSampled(docs: DataFrame, budgetTokens: Long = 100000L): DataFrame = {
    val quotas = mixture(docs, budgetTokens).select("source", "quota_tokens")
    val t = docs.select(col("source"), col("doc_id"),
      expr("size(split(text, ' '))").as("n_tokens"))
    val w = Window.partitionBy("source")
      .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
    t.join(broadcast(quotas), "source")
      .withColumn("pick_rank", row_number().over(w))
      .withColumn("cum", sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum") - col("n_tokens") < col("quota_tokens"))
      .select(col("source"), col("pick_rank"), col("doc_id"), col("n_tokens"),
        col("cum").cast("long").as("cum_tokens"), col("quota_tokens"))
      .orderBy("source", "pick_rank")
  }
}
