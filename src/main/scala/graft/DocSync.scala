package graft

import java.nio.file.{Files, Path, Paths}

/** Regenerates the two documentation lines SmokeSpec guards — README's
  * operator-count sentence and BASELINE.md's current-bench row — from
  * their sources of truth: `SparkEntry.{queries,oracleSql}.size` (live,
  * same classpath) and `BENCH_full.json` (on disk).
  *
  * Why a generator instead of hand-edits: the same two guards failed in
  * rounds 7 AND 8 for the same sequencing reason — operators landed (or
  * the driver refreshed the bench artifact) AFTER the last hand-edit of
  * the docs. Each guarded region sits between `docsync` HTML-comment
  * markers and is rewritten by [[sync]].
  *
  * Who writes vs who checks (the r9 advisory fix): SmokeSpec is
  * ASSERT-ONLY — it calls [[check]] and fails with a "run graft.DocSync"
  * message when the committed text drifts from the generated text, so a
  * test run never mutates tracked files and the guard cannot be satisfied
  * by its own side effect. The WRITERS are the generator mains:
  * `graft.DocSync.main` on demand, and `graft.Bench.main` immediately
  * after it refreshes BENCH_full.json — the same process that changes the
  * row's source of truth heals the row, so a driver bench refresh can
  * never re-stale the docs for the next test run.
  */
object DocSync {

  private def marker(tag: String, which: String) =
    s"<!-- docsync:$tag:$which -->"

  /** README "What's implemented" lead sentence. The guard regexes it
    * asserts against: `(\d+) driver-checked` == queries.size and
    * `(\d+)\s*\nhash-match` == oracleSql.size. */
  def readmeBlock: String = {
    val nq = SparkEntry.queries.size
    val no = SparkEntry.oracleSql.size
    s"""$nq driver-checked operators/queries (`graft.SparkEntry.queries`), all $no
       |hash-match a DuckDB oracle at sf0.01 — the two sketch-dependent queries
       |(HLL distinct, zlib compression ratio) verify through checked
       |projections: every deterministic column exact plus a bounds flag on the
       |engine-specific value. Across:""".stripMargin
  }

  /** ANCHOR-NORMALIZED cross-round drift (r15, VERDICT r14 #2) — the
    * mechanical replacement for the median-uniformity argument re-made by
    * hand in r10–r14: compare the CURRENT `BENCH_full.json` against the
    * committed `BENCH_prior.json` snapshot (the prior round's final
    * artifact — roll it forward with `runMain graft.DocSync snapshot` when
    * adopting a new baseline) on their common queries, and divide the raw
    * ratios by the rounds' calibration-anchor ratio so box-rate drift
    * (the adjudicated 1.15–1.4× same-code class) cancels out. Emits the
    * raw AND normalized total/median plus the max mover — the numbers
    * every round's verdict recomputed by hand. Empty when no prior
    * snapshot exists or either side lacks an anchor (pre-r14 artifacts). */
  def driftBlock(root: Path): String = {
    val cur = root.resolve("BENCH_full.json")
    val prior = root.resolve("BENCH_prior.json")
    if (!Files.exists(cur) || !Files.exists(prior)) return ""
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val (mc, mp) = (om.readTree(cur.toFile), om.readTree(prior.toFile))
    def queries(n: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] = {
      val q = n.get("queries")
      if (q == null) Map.empty
      else {
        val it = q.fields(); val b = Map.newBuilder[String, Double]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
        b.result()
      }
    }
    def anchor(n: com.fasterxml.jackson.databind.JsonNode): Option[Double] =
      Option(n.get("calibration")).flatMap(c => Option(c.get("sec"))).map(_.asDouble())
    val (qc, qp) = (queries(mc), queries(mp))
    val common = qc.keySet.intersect(qp.keySet).toSeq.sorted
    val aOpt = for (ac <- anchor(mc); ap <- anchor(mp)) yield (ap, ac)
    if (common.isEmpty || aOpt.isEmpty) return ""
    val (ap, ac) = aOpt.get
    val aRatio = ac / ap
    val rawTotal = common.map(qc).sum / common.map(qp).sum
    val ratios = common.map(k => k -> qc(k) / qp(k)).sortBy(_._2)
    val median = {
      val v = ratios.map(_._2)
      if (v.length % 2 == 1) v(v.length / 2)
      else (v(v.length / 2 - 1) + v(v.length / 2)) / 2
    }
    val (mvName, mvRatio) = ratios.last
    // SECOND WITNESS (r16, VERDICT r15 #3/#5): the CPU-saturating anchor
    // demonstrably anti-correlates with totals across same-code runs
    // (BASELINE.md's 3-run study: anchors 0.666/0.425/0.624 against totals
    // 257/272/286 s), because it over-responds to contention relative to
    // the overhead-bound query class. A pinned set of trivial,
    // long-untouched queries (narrow projections, store probes — code that
    // "cannot regress by code") gives an independent box-rate estimate:
    // their median raw ratio IS the box drift as the bench experiences it.
    // Cross-round claims should cite BOTH normalizers; when they disagree,
    // the witness median is the safer denominator for overhead-bound
    // queries, the anchor for CPU-bound ones.
    val witnessSet = Seq(
      "text_normalize", "text_length_stats", "text_compress_ratio",
      "text_quality", "soql_orderby_limit", "multimodal_frames",
      "multimodal_features", "sample_stratified", "pipeline_pack",
      "pipeline_pack_stats", "pipeline_snapshot_diff", "pipeline_corpus_stats",
      "similarity_topk", "similarity_range_search", "events_ab_lift")
    val witness = witnessSet.filter(k => qc.contains(k) && qp.contains(k))
    val wMedian =
      if (witness.isEmpty) Double.NaN
      else {
        val v = witness.map(k => qc(k) / qp(k)).sorted
        if (v.length % 2 == 1) v(v.length / 2)
        else (v(v.length / 2 - 1) + v(v.length / 2)) / 2
      }
    f"""**Cross-round drift (generated; `BENCH_full.json` vs the `BENCH_prior.json`
       |snapshot): ${common.size} common queries — raw total $rawTotal%.3f×, median
       |$median%.3f×; calibration anchor $ap%.3f s → $ac%.3f s (box ratio $aRatio%.3f×);
       |anchor-normalized total ${rawTotal / aRatio}%.3f×, median ${median / aRatio}%.3f×; max mover
       |`$mvName` $mvRatio%.2f× raw / ${mvRatio / aRatio}%.2f× normalized.
       |Second witness — median raw ratio over ${witness.size} pinned untouched trivial
       |queries: $wMedian%.3f× (witness-normalized total ${rawTotal / wMedian}%.3f×, median
       |${median / wMedian}%.3f×).** Adjudicate movers against BOTH normalized ratios (the
       |anchor anti-correlates with totals under contention — prefer the witness for
       |overhead-bound queries); roll the snapshot with `runMain graft.DocSync snapshot`.""".stripMargin
  }

  /** BASELINE.md current-bench row, from BENCH_full.json (Bench.scala's
    * complete artifact: every rep of every query, config, errors). The
    * config facts in the row — local[n], min-of-k — come from the
    * artifact's own `cpus`/`reps` fields, not hardcoded, so a bench run
    * under a different config can't produce a row asserting wrong facts. */
  def baselineBlock(root: Path): String = {
    val f = root.resolve("BENCH_full.json")
    require(Files.exists(f), "BENCH_full.json missing — run graft.Bench first")
    val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f.toFile)
    val n = m.get("queries").size()
    val total = f"${m.get("value").asDouble()}%.2f"
    val errs = Option(m.get("errors")).map(_.size()).getOrElse(0)
    val sf = Option(m.get("sf")).map(_.asText()).getOrElse("?")
      .split('/').last
    val cpus = Option(m.get("cpus")).map(_.asText()).getOrElse("?")
    val reps = Option(m.get("reps")).map(_.asInt()).getOrElse(1)
    // box-calibration anchor (r14+ artifacts): a fixed CPU-bound query
    // recorded per run, so cross-round ratios normalize out box-rate
    // drift mechanically (divide by the rounds' anchor ratio) instead of
    // the median-uniformity argument re-made in r10-r13
    val cal = Option(m.get("calibration")).flatMap(c => Option(c.get("sec")))
      .map(c => f"; calibration anchor ${c.asDouble()}%.3f s — divide cross-round" +
        " ratios by the anchor ratio to remove box drift")
      .getOrElse("")
    s"""**Current full-set bench (`BENCH_full.json`): $n queries, $total s total
       |(local[$cpus], $sf, min-of-$reps, $errs errors$cal)** — this row is regenerated
       |from the artifact by `graft.DocSync` (graft.Bench re-syncs it whenever it
       |rewrites the artifact; SmokeSpec only checks); the per-round narrative
       |rows below are historical context with their round's committed numbers.""".stripMargin
  }

  /** Replace the text between the begin/end markers for `tag`, keeping
    * the marker lines. Loud failure if the markers are missing — a doc
    * restructure must keep them or update this generator. When
    * `write` is false, no file is touched; the return value still says
    * whether a rewrite WOULD change the file. */
  private def spliceFile(path: Path, tag: String, body: String,
                         write: Boolean): Boolean = {
    val text = new String(Files.readAllBytes(path), "UTF-8")
    val begin = marker(tag, "begin"); val end = marker(tag, "end")
    val bi = text.indexOf(begin); val ei = text.indexOf(end)
    require(bi >= 0 && ei > bi, s"$path lost its $begin/$end markers")
    val next = text.substring(0, bi + begin.length) + "\n" + body + "\n" +
      text.substring(ei)
    if (next == text) false
    else { if (write) Files.write(path, next.getBytes("UTF-8")); true }
  }

  /** SURVEY's streaming-inventory table, generated from
    * [[graft.streaming.StreamingInventory.twins]] (the registry) crossed
    * with `BENCH_streaming.json` (the soak artifact actually on disk):
    * each row names the streaming op, its batch twin, its differential
    * spec, and whether the RocksDB soak covers it — a twin shipped
    * without soak evidence renders as a visible "—/not soaked" cell
    * instead of hiding in prose. */
  def streamingBlock(root: Path): String = {
    val f = root.resolve("BENCH_streaming.json")
    val soaked: Set[String] =
      if (!Files.exists(f)) Set.empty
      else {
        val ops = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(f.toFile).get("operators")
        val it = ops.fieldNames()
        val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next()
        b.result()
      }
    val rows = graft.streaming.StreamingInventory.twins.map { tw =>
      val soak = tw.soakKey match {
        case Some(k) if soaked(k) => s"soaked (`$k`)"
        case Some(k) => s"**NOT in artifact** (`$k` expected)"
        case None => "— (not soaked)"
      }
      s"| `${tw.op}` | ${tw.batchTwin} | ${tw.spec} | $soak |"
    }
    val n = graft.streaming.StreamingInventory.twins.size
    val nSoaked = graft.streaming.StreamingInventory.twins
      .count(_.soakKey.exists(soaked))
    s"""Generated by `graft.DocSync` from `streaming/StreamingInventory.scala`
       |× `BENCH_streaming.json` ($nSoaked of $n ops in the RocksDB soak
       |artifact); SmokeSpec fails if this table drifts from the registry.
       |
       || streaming op | batch twin | differential spec | RocksDB soak |
       ||---|---|---|---|
       |${rows.mkString("\n|")}""".stripMargin
  }

  private def run(root: Path, write: Boolean): Seq[String] = {
    val changed = Seq.newBuilder[String]
    if (spliceFile(root.resolve("README.md"), "counts", readmeBlock, write))
      changed += "README.md"
    if (spliceFile(root.resolve("BASELINE.md"), "bench", baselineBlock(root), write))
      changed += "BASELINE.md"
    if (spliceFile(root.resolve("BASELINE.md"), "drift", driftBlock(root), write)
        && !changed.result().contains("BASELINE.md"))
      changed += "BASELINE.md"
    if (spliceFile(root.resolve("SURVEY.md"), "streaming", streamingBlock(root), write))
      changed += "SURVEY.md"
    changed.result()
  }

  /** Regenerate both guarded regions; returns the files rewritten. */
  def sync(root: Path = Paths.get(".")): Seq[String] = run(root, write = true)

  /** Assert-only twin of [[sync]]: the files whose guarded region is
    * stale (would be rewritten), without touching anything. */
  def check(root: Path = Paths.get(".")): Seq[String] = run(root, write = false)

  def main(args: Array[String]): Unit = {
    val (modes, rest) = args.partition(_ == "snapshot")
    val root = Paths.get(rest.headOption.getOrElse("."))
    if (modes.nonEmpty) {
      // roll the cross-round comparator: adopt the CURRENT full artifact
      // as the committed prior-round snapshot (do this when a round's
      // final artifact becomes the next round's baseline)
      Files.copy(root.resolve("BENCH_full.json"), root.resolve("BENCH_prior.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      println("docsync: rolled BENCH_full.json -> BENCH_prior.json")
    }
    val changed = sync(root)
    println(if (changed.isEmpty) "docsync: up to date"
            else s"docsync: rewrote ${changed.mkString(", ")}")
  }
}
