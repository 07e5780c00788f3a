package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators for LLM-data pipelines (SURVEY.md §2.8 E3):
  * PII scrubbing, line-frequency boilerplate removal, and Gopher-style
  * rule filtering — the three cleaning passes every production
  * pre-training pipeline runs before dedup/packing (cf. the C4 and Gopher
  * cleaning recipes in the public literature).
  *
  * Scale discipline:
  *  - [[piiScrub]] and [[gopherQuality]] are pure narrow projections — one
  *    codegen'd regexp/array pass per row, zero shuffles, embarrassingly
  *    parallel at any corpus size.
  *  - [[boilerplate]] shuffles 32-byte line digests (never line text) for
  *    the frequency count, and the surviving boilerplate set (lines with
  *    df >= minDf) is tiny by construction — AQE broadcasts the anti-join
  *    side, so the only full-corpus shuffle is the per-doc reassembly.
  *
  * Determinism discipline (DuckDB oracle): regex patterns use only
  * character classes and counted repetition — the subset on which Java's
  * regex (Spark) and RE2 (DuckDB) agree — and all ratios are divisions of
  * exact integer counts, so results hash-match bit-for-bit.
  */
object Clean {

  /** PII patterns, applied in this order (email first — its local part may
    * contain digit runs that the later patterns would otherwise claim).
    * Character-class-only syntax: identical semantics under Java regex and
    * RE2 (no lookaround, no backreferences, no \d shorthands). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+", "<EMAIL>"),
    ("phone", "[(][0-9]{3}[)] [0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "<IP>"),
    ("id", "[0-9]{6,}", "<ID>"))

  /** PII detection + redaction over a text column: per-class match counts
    * (counted on the progressively-scrubbed text, so classes never
    * double-count each other's spans) and the scrubbed text's md5/length.
    * One narrow codegen'd pass — no shuffle at any scale; at 100 TB this
    * is a pure map over input splits. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame =
    piiScrubCols(df, textCol).orderBy("doc_id")

  /** The scrub projection itself, without the oracle-facing output sort —
    * the SHARED definition of batch [[piiScrub]] and the streaming twin
    * ([[graft.streaming.DocStreams.piiScrubStream]]): a pure stateless
    * narrow map, so the same cascaded selects run unchanged on a
    * streaming DataFrame (sorting is the only batch-ism). PUBLIC because
    * it is the production entry at scale — [[piiScrub]]'s global sort
    * exists for deterministic oracle hashing, and a 100-TB caller that
    * feeds the result into a join or a sink should not pay a total order
    * it never asked for. */
  def piiScrubCols(df: DataFrame, textCol: String = "text"): DataFrame = {
    // each class counts its matches on the PREVIOUS stage's scrubbed text,
    // so no span is attributed to two classes. One select per stage: each
    // intermediate text is referenced more than once downstream, which
    // stops CollapseProject from inlining it — every regexp evaluates
    // exactly once per row (4 replaces + 4 extracts), instead of the
    // O(stages²) re-evaluation a single flat projection would codegen.
    def nMatches(t: Column, pat: String): Column =
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("int")
    val staged = piiPatterns.zipWithIndex.foldLeft(
      df.select(col("doc_id"), col(textCol).as("t0"))) {
      case (d, ((name, pat, repl), i)) =>
        d.withColumn(s"n_$name", nMatches(col(s"t$i"), pat))
          .withColumn(s"t${i + 1}", regexp_replace(col(s"t$i"), pat, repl))
    }
    staged.select(
      col("doc_id"),
      col("n_email"), col("n_phone"), col("n_ip"), col("n_id"),
      length(col("t4")).cast("int").as("n_chars_scrubbed"),
      md5(col("t4")).as("scrub_md5"),
      (col("t4") =!= col("t0")).cast("int").as("changed"))
  }

  /** C4-style line-frequency boilerplate removal: a line occurring in >=
    * minDf distinct documents is boilerplate (nav bars, footers, cookie
    * banners) and is dropped from every document; per-doc output is the
    * kept-line count and the md5 of the reassembled text.
    *
    * Plan shape (the 100 TB story): lines shuffle by 32-char md5 digest —
    * never by line text — for the distinct-doc count; the boilerplate set
    * after `df >= minDf` is small (bounded by corpus-wide repeated lines),
    * so the anti-join broadcasts under AQE; reassembly is one shuffle on
    * doc_id with the line order restored by an in-group array_sort, not a
    * window. Documents whose every line is boilerplate still emit a row
    * (n_kept = 0, md5 of the empty string) via the left join back to the
    * input — dropping them silently would corrupt downstream joins. */
  def boilerplate(df: DataFrame, minDf: Int, textCol: String = "text"): DataFrame =
    boilerplateCols(df, minDf, textCol).orderBy("doc_id")

  /** [[boilerplate]] without the oracle-facing output sort — the
    * production entry at scale (see [[piiScrubCols]]): the relation ends
    * at the doc_id-keyed rebuild join, already co-partitioned for the
    * downstream joins a cleaning pipeline feeds it into. */
  def boilerplateCols(df: DataFrame, minDf: Int,
                      textCol: String = "text"): DataFrame = {
    require(minDf >= 2, "minDf < 2 would drop every line")
    val lines = df
      .select(col("doc_id"), posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("lh", md5(col("line")))
    val boiler = lines.groupBy("lh")
      .agg(countDistinct("doc_id").as("line_df"))
      .filter(col("line_df") >= minDf)
      .select("lh")
    val kept = lines.join(boiler, Seq("lh"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_kept"),
      expr("md5(array_join(transform(array_sort(collect_list(struct(line_no, line))), x -> x.line), '\n'))")
        .as("clean_md5"))
    df.select(col("doc_id"),
        size(split(col(textCol), "\n")).cast("int").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).cast("int").as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0))).cast("int").as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /** The (doc_id, line_no, line, h) relation shared by the line-df store
    * lifecycle: 0-based line position from posexplode, 60-bit md5-prefix
    * content key (the 8-byte store-key discipline of the band/span/chunk
    * stores — `conv(substring(md5, 1, 15), 16, 10)`). */
  private def lineRelation(df: DataFrame, textCol: String): DataFrame =
    df.select(col("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("h", expr(lineHash60Expr))

  /** Line-document-frequency store BUILD — the missing incremental twin
    * of [[boilerplate]] (bands/spans/paragraphs/eval-shingles all had
    * one): persist per distinct line hash the number of distinct
    * historical documents carrying it, range-clustered on the 8-byte key.
    * [[appendToLineDfStore]] is the O(increment) daily write — each
    * append adds the increment's OWN per-line distinct-doc counts as new
    * rows, and probes sum rows per key, so accumulated df is exact
    * whenever batches partition the corpus by document (the same
    * disjoint-batch contract the other stores document). Same
    * single-writer + caller-side atomic-publish discipline. */
  def buildLineDfStore(hist: DataFrame, storeDir: String, numFiles: Int = 8,
                       textCol: String = "text"): Unit =
    graft.ops.StoreLifecycle.publish(storeDir)(tmp =>
      writeLineDfStore(hist, tmp, "overwrite", numFiles, textCol))

  def appendToLineDfStore(increment: DataFrame, storeDir: String,
                          numFiles: Int = 1, textCol: String = "text"): Unit =
    graft.ops.StoreLifecycle.withWriterLock(storeDir)(
      writeLineDfStore(increment, storeDir, "append", numFiles, textCol))

  private def writeLineDfStore(docs: DataFrame, storeDir: String, mode: String,
                               numFiles: Int, textCol: String): Unit =
    graft.ops.Scale.clusteredParquet(
      lineRelation(docs, textCol)
        .groupBy("h").agg(countDistinct("doc_id").as("df")),
      s"$storeDir/linedf", Seq("h"), numFiles, mode)

  /** Line-df store COMPACTION — rewrite the accumulated per-append file
    * sets as ONE freshly range-clustered set, summing the per-batch df
    * rows appends accumulate (probes tolerate them — they sum per key;
    * compaction is when they're paid down). Publication rides
    * [[graft.ops.StoreLifecycle.publish]] — the family's one
    * side-directory + atomic-rename discipline. */
  def compactLineDfStore(spark: org.apache.spark.sql.SparkSession,
                         storeDir: String, numFiles: Int = 8): Unit =
    graft.ops.StoreLifecycle.publish(storeDir)(tmp =>
      graft.ops.Scale.clusteredParquet(
        spark.read.parquet(s"$storeDir/linedf")
          .groupBy("h").agg(sum("df").as("df")),
        s"$tmp/linedf", Seq("h"), numFiles))

  /** [[boilerplate]] against the PRECOMPUTED line-df store — incremental
    * boilerplate removal: an incoming document drops exactly the lines
    * whose HISTORICAL document frequency (summed across the store's
    * append rows) reaches `minDf`; the historical corpus text is never
    * rescanned, so the daily cost is O(increment) — the cleaning
    * family's last non-incremental member closed.
    *
    * Scale shape: the increment pays one narrow line pass; the store is
    * touched by ONE equi-join of its (h, df) rows against the increment's
    * DISTINCT line keys (broadcast of the small increment side under AQE
    * — the store never fully shuffles), the df sum then aggregates only
    * MATCHED rows (bounded by increment keys × append batches), and the
    * surviving boilerplate set is tiny so the anti-join broadcasts, as in
    * the batch operator. Reassembly is the batch operator's in-group
    * array_sort — identical output schema and md5 semantics.
    *
    * Within-increment repetition is the batch operator's job (run
    * [[boilerplate]] over the increment, or append-then-probe the next
    * batch) — the same contract the span/paragraph stores document. */
  def boilerplateAgainstStore(incoming: DataFrame, storeDir: String, minDf: Int,
                              textCol: String = "text"): DataFrame =
    boilerplateAgainstStoreCols(incoming, storeDir, minDf, textCol)
      .orderBy("doc_id")

  /** [[boilerplateAgainstStore]] without the oracle-facing output sort —
    * the production entry at scale (see [[piiScrubCols]]); the streaming
    * twin ([[graft.streaming.DocStreams.boilerplateStream]]) answers the
    * same store with a stream-static join re-planned per micro-batch. */
  def boilerplateAgainstStoreCols(incoming: DataFrame, storeDir: String,
                                  minDf: Int,
                                  textCol: String = "text"): DataFrame = {
    require(minDf >= 2, "minDf < 2 would drop every line")
    val spark = incoming.sparkSession
    val lines = lineRelation(incoming, textCol)
    val boiler = spark.read.parquet(s"$storeDir/linedf")
      .join(lines.select("h").distinct(), Seq("h"))
      .groupBy("h").agg(sum("df").as("df_hist"))
      .filter(col("df_hist") >= minDf)
      .select("h")
    val kept = lines.join(boiler, Seq("h"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_kept"),
      expr("md5(array_join(transform(array_sort(collect_list(struct(line_no, line))), x -> x.line), '\n'))")
        .as("clean_md5"))
    incoming.select(col("doc_id"),
        size(split(col(textCol), "\n")).cast("int").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).cast("int").as("n_kept"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0))).cast("int").as("n_removed"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
  }

  /** Corpus snapshot diff — the dataset-versioning audit between two
    * corpus versions: per-doc status (added / removed / changed /
    * unchanged) from a doc_id-co-partitioned full outer join comparing
    * content digests. Scale shape: each side is reduced to (doc_id,
    * 16-byte digest) before the join — the text itself never shuffles —
    * and the join is a plain equi-join on doc_id, so the whole diff is
    * two narrow scans + one co-partitioned shuffle at any corpus size. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   textCol: String = "text"): DataFrame =
    snapshotDiffCols(oldSnap, newSnap, textCol).orderBy("doc_id")

  /** [[snapshotDiff]] without the oracle-facing output sort — the
    * production entry at scale (see [[piiScrubCols]]): the diff leaves
    * the join already partitioned on doc_id for whatever audit
    * aggregation consumes it. */
  def snapshotDiffCols(oldSnap: DataFrame, newSnap: DataFrame,
                       textCol: String = "text"): DataFrame = {
    val a = oldSnap.select(col("doc_id"), md5(col(textCol)).as("old_md5"))
    val b = newSnap.select(col("doc_id"), md5(col(textCol)).as("new_md5"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("old_md5").isNull, "added")
          .when(col("new_md5").isNull, "removed")
          .when(col("old_md5") =!= col("new_md5"), "changed")
          .otherwise("unchanged").as("status"),
        col("old_md5"), col("new_md5"))
  }

  /** Gopher-style rule filter: per-document lexical signals and the
    * pass/fail verdict of each published rule family the synthetic corpus
    * can express — word count bounds, mean-word-length bounds, stopword
    * presence, and distinct-word ratio (the repetition gate). All signals
    * are exact integer counts with one final IEEE division, so the DuckDB
    * oracle reproduces them bit-for-bit. One narrow projection — zero
    * shuffles at any scale. */
  def gopherQuality(
      docs: DataFrame,
      minWords: Int = 28, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minDistinctRatio: Double = 0.5): DataFrame =
    gopherQualityCols(docs, minWords, maxWords, minMeanLen, maxMeanLen,
      minDistinctRatio).orderBy("doc_id")

  /** The rule projection without the oracle-facing output sort — the
    * SHARED definition of batch [[gopherQuality]] and the streaming twin
    * ([[graft.streaming.DocStreams.gopherQualityStream]]); stateless
    * narrow map, identical semantics on a streaming DataFrame. PUBLIC as
    * the production entry at scale (see [[piiScrubCols]]). */
  def gopherQualityCols(
      docs: DataFrame,
      minWords: Int = 28, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minDistinctRatio: Double = 0.5): DataFrame = {
    val sig = gopherSignalCols(docs)
    val nWords = col("n_words")
    val passWords = (nWords >= minWords && nWords <= maxWords).cast("int")
    val passMean = (col("mean_word_len") >= minMeanLen &&
      col("mean_word_len") <= maxMeanLen).cast("int")
    val passDistinct = (col("distinct_ratio") >= minDistinctRatio).cast("int")
    sig.select(
      col("doc_id"), nWords, col("sum_word_len"), col("max_word_len"),
      col("mean_word_len"),
      col("n_distinct"),
      col("distinct_ratio"),
      col("has_stopword"),
      passWords.as("pass_word_count"),
      passMean.as("pass_mean_len"),
      col("has_stopword").as("pass_stopword"),
      passDistinct.as("pass_distinct"),
      (passWords * passMean * col("has_stopword") * passDistinct).as("pass_all"))
  }

  /** The raw lexical-signal projection under [[gopherQualityCols]],
    * KEEPING the token array `w` — the one definition of the Gopher
    * signals shared by the rule gate, the trained quality model's
    * structural features ([[graft.ext.TextAnalysis.qualityFeatures]]),
    * and the streaming scorer's row-local twin (content tokens explode
    * from the same `w`, so features and signals come from ONE text scan).
    * Stage 1 materializes the token array ONCE (4 downstream references
    * stop CollapseProject from inlining the split per stat); stage 2
    * reduces it to integer signals; stage 3 is cheap integer/double math.
    * A flat single projection re-splits the text per output column — it
    * measured 3x this formulation at 500k docs. Callers that don't select
    * `w` lose nothing: column pruning drops it from the scan. */
  private[graft] def gopherSignalCols(docs: DataFrame,
                                      textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      split(col(textCol), " ").as("w"),
      expr(s"CAST(length(replace($textCol, ' ', '')) AS INT)").as("sum_word_len"))
    val sig = toks.select(
      col("doc_id"), col("w"),
      size(col("w")).cast("int").as("n_words"),
      col("sum_word_len"),
      expr("CAST(array_max(transform(w, x -> length(x))) AS INT)").as("max_word_len"),
      size(array_distinct(col("w"))).cast("int").as("n_distinct"),
      exists(col("w"), t => t === "a" || t === "the").cast("int").as("has_stopword"))
    sig.select(
      col("doc_id"), col("w"), col("n_words"), col("sum_word_len"),
      col("max_word_len"), col("n_distinct"),
      round(col("sum_word_len").cast("double") / col("n_words"), 6).as("mean_word_len"),
      round(col("n_distinct").cast("double") / col("n_words"), 6).as("distinct_ratio"),
      col("has_stopword"))
  }

  /** The 60-bit line content key shared by the line-df store lifecycle
    * and the streaming boilerplate twin — one definition so the two
    * paths can never disagree on a hash. */
  private[graft] val lineHash60Expr =
    "CAST(conv(substring(md5(line), 1, 15), 16, 10) AS BIGINT)"
}
