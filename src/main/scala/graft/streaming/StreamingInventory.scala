package graft.streaming

/** The streaming surface as DATA — one row per streaming operator, naming
  * its batch twin, its differential spec, and (when soaked) its
  * `BENCH_streaming.json` operator key. [[graft.DocSync]] renders this
  * into SURVEY.md's guarded streaming-inventory table and marks each row
  * soaked/not from the artifact actually on disk, so a twin that ships
  * without soak evidence is self-evident in the doc instead of buried in
  * prose (the r11 gap: six twins had specs but no state-plateau series).
  * SmokeSpec guards the rendered table the same way it guards the bench
  * row — stale doc ⇒ failing test naming the regenerator. */
object StreamingInventory {

  /** One streaming operator: `op` = method reference, `batchTwin` = the
    * batch operator it is differentially pinned to (or the semantics
    * statement when the stream IS the batch projection), `spec` = the
    * suite asserting the equivalence, `soakKey` = its operator key in
    * `BENCH_streaming.json` when the RocksDB soak drives it. */
  final case class Twin(op: String, batchTwin: String, spec: String,
                        soakKey: Option[String])

  private def t(op: String, batchTwin: String, spec: String,
                soak: String = null): Twin =
    Twin(op, batchTwin, spec, Option(soak))

  /** Every public streaming operator (harness mains excluded). Order is
    * the rendered table order: event streams, then document streams. */
  val twins: Seq[Twin] = Seq(
    t("EventStreams.tumblingHourly", "Events.tumblingHourly (finalized buckets)",
      "EventStreamsSpec", "tumbling"),
    t("EventStreams.sessionize", "Events.sessionize",
      "EventStreamsSpec (random micro-batch splits)", "sessionize"),
    t("EventStreams.asofEnrich", "Events.asofJoin",
      "EventStreamsSpec (random splits + late-right)", "asof_enrich"),
    t("EventStreams.tagIncidents", "Events.rangeJoin (stateless stream-static)",
      "EventStreamsSpec", "tag_incidents"),
    t("EventStreams.funnelConversions", "Events.funnel",
      "EventStreamsSpec (random splits)", "funnel"),
    t("EventStreams.anomalyHourly", "Events.anomalyHourly (finalized buckets)",
      "EventStreamsSpec", "anomaly"),
    t("EventStreams.retentionHits", "Events.retention",
      "EventStreamsSpec (random re-entry)", "retention"),
    t("EventStreams.statusHistory", "Events.statusHistory (SCD2)",
      "EventStreamsSpec (random splits)", "status_history"),
    t("EventStreams.forecastEvalHourly", "Events.forecastEval (finalized buckets)",
      "EventStreamsSpec", "forecast_eval"),
    t("EventStreams.dedupEvents", "exact event dedup (at-least-once delivery)",
      "EventStreamsSpec", "dedup_events"),
    t("DocStreams.ingest", "pipeline_filter_dedup composite",
      "DocStreamsSpec (id-ordered arrival)", "doc_ingest"),
    t("DocStreams.decontaminateStream", "Dedup.decontaminate",
      "DocStreamsSpec", "decon_static"),
    t("DocStreams.dedupAgainstStore", "Dedup.incrementalStored",
      "DocStreamsSpec (adversarial splits)", "store_dedup"),
    t("DocStreams.decontaminateFuzzyStream", "Dedup.decontaminateFuzzyStored",
      "DocStreamsSpec (random splits)", "fuzzy_decon"),
    t("DocStreams.spansAgainstStore", "Dedup.spansAgainstStore",
      "DocStreamsSpec (random splits)", "spans_store"),
    t("DocStreams.piiScrubStream", "IS Clean.piiScrubCols (shared projection)",
      "DocStreamsSpec", "pii_scrub"),
    t("DocStreams.gopherQualityStream", "IS Clean.gopherQualityCols (shared projection)",
      "DocStreamsSpec", "gopher"),
    t("DocStreams.qualityScoreStream", "TextAnalysis.qualityScore (folded weights)",
      "DocStreamsSpec (random splits)", "quality_weights"),
    t("DocStreams.qualityScoreStoreStream", "TextAnalysis quality-model store serve",
      "DocStreamsSpec (random splits)", "quality_score"),
    t("DocStreams.dsirScoreStoreStream", "Sampling.scoreAgainstDsirStore",
      "DocStreamsSpec (2e-6 float bound)", "dsir_score"),
    t("DocStreams.lmScoreStream", "LmFilter.scoreAgainstLmStore (stream-static model joins; langs=… serves a NAMED language shard — the pushed lang isin file-prunes the range-clustered model per micro-batch, r14)",
      "DocStreamsSpec (2e-6 ce bound, buckets exact; shard twin ≡ batch shard serve ≡ whole serve restricted to the shard)", "lm_score"),
    t("DocStreams.bloomGateStream", "IS BloomDedup.probe (folded filter literal)",
      "DocStreamsSpec (random splits)", "bloom_gate"),
    t("DocStreams.triageStream", "Dedup.ingestTriageStored",
      "DocStreamsSpec (random splits)", "triage"),
    t("DocStreams.boilerplateStream", "Clean.boilerplateAgainstStore",
      "DocStreamsSpec (random splits)", "boilerplate"),
    t("DocStreams.packStream", "Packing.pack",
      "DocStreamsSpec (id-ordered splits)", "pack_stream"),
    t("DocStreams.runStoreIngest", "incrementalStored + minhashClusters + appendToBandStore per micro-batch",
      "DocStreamsSpec (two-batch cross-rejection)", "store_ingest_loop"),
    t("DocStreams.runSpanDedupIngest", "spanDedupOnceStored + appendToSpanStore per micro-batch (keep-first: history keeps, batch-first occurrences keep; state in the STORE, r15)",
      "DocStreamsSpec (seeded splits ≡ batch probe→append replay; id-ordered composition ≡ in-line spanDedupOnce in ExtDedupSpec)", "span_dedup_loop"),
    t("EventStreams.runSketchIngest", "SketchStore.appendToSketchStore per micro-batch (durable state in the STORE; at-least-once replay healed by the register max-fold)",
      "EventStreamsSpec (split days ≡ batch build, exact estimate equality)", "sketch_ingest"),
    t("EventStreams.runHistIngest", "HistStore.appendStreamBatch per micro-batch (durable state in the STORE; additive counts made replay-exactly-once by the batchId-keyed atomic slot rename, r15)",
      "EventStreamsSpec (split drops ≡ batch build, exact report equality; replayed slot no-ops; checkpoint stop/restart never double-counts)", "hist_ingest"),
    t("VecStreams.assignStream", "IS Similarity.assignAgainstIvfStore (shared projection)",
      "VecStreamsSpec (random splits, flat + hier)", "vec_assign"),
    t("VecStreams.runAnnServe", "IS Similarity.ivfAgainstStore per micro-batch (probed-ids isin pushdown bounds each trigger's store reads; idempotent replay — each batch OVERWRITES its batchId-deterministic partition dir, r14)",
      "VecStreamsSpec (random splits + plan pushdown + double-write idempotence)", "ann_serve"))
}
