package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke contract: SparkEntry.entry returns rows on
  * sf0.001, and every registered query name has resolvable wiring. */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry flagship returns rows with the audit column stamped") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("time_fetched_from_salesforce_at"))
    assert(df.limit(1).count() === 1)
  }

  test("every oracle key has a matching query; bench queries exist") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val missingBench = SparkEntry.benchQueries.toSet -- qs
    assert(missingBench.isEmpty, s"bench names without queries: $missingBench")
  }

  test("README operator counts track SparkEntry (no hand-edit drift)") {
    // This guard failed in r7 AND r8 because new operators landed after
    // the last hand-edit; the counts now live between docsync markers.
    // ASSERT-ONLY (r9 advisory fix): DocSync.check compares the COMMITTED
    // marker region to the generated text without writing anything —
    // a test run never mutates tracked files, so the guard can't be
    // satisfied by its own side effect. The writers are the generator
    // mains (graft.DocSync; graft.Bench after an artifact refresh).
    val stale = DocSync.check()
    assert(!stale.contains("README.md"),
      s"README.md docsync region is stale vs SparkEntry " +
        s"(${SparkEntry.queries.size} queries / ${SparkEntry.oracleSql.size} oracles) " +
        "— run `sbt \"runMain graft.DocSync\"`")
    // and the committed text must carry the live counts (guards marker
    // placement, not just splice equality)
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """(\d+) driver-checked""".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README lost its 'N driver-checked' line")
    assert(m.get.group(1).toInt === SparkEntry.queries.size,
      s"README says ${m.get.group(1)} but SparkEntry.queries has ${SparkEntry.queries.size}")
    val h = """(\d+)\s*\nhash-match""".r.findFirstMatchIn(readme)
    assert(h.isDefined && h.get.group(1).toInt === SparkEntry.oracleSql.size,
      s"README hash-match count vs oracleSql.size=${SparkEntry.oracleSql.size}")
  }

  test("BASELINE.md round-context row tracks the latest BENCH artifact (no hand-edit drift)") {
    // r3's verdict caught this row hand-edited twice (r2: stale local[4];
    // r3: 43q/38.0s vs the artifact's 46q/50.57s) — so generate the
    // assertion from the artifact: find the newest BENCH_r*.json, pull the
    // embedded {"metric":...} line out of its "tail", and require
    // BASELINE.md to quote exactly "<n> queries, <total> s total".
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // Bench.scala now writes its own complete artifact (BENCH_full.json —
    // every rep of every query, config, warmup status); when present it is
    // the source of truth and the truncated driver-capture fallback below
    // never runs.
    val fullArtifact = new java.io.File("BENCH_full.json")
    if (fullArtifact.exists()) {
      // ASSERT-ONLY (r9 advisory fix): the committed row must already
      // match the artifact — the WRITER is graft.Bench itself, which
      // re-syncs the row in the same process that refreshes the
      // artifact (the r8 failure mode: a post-session driver bench
      // refresh re-staling a hand-edited row), plus graft.DocSync on
      // demand. The test never writes.
      val stale = DocSync.check()
      val metric = om.readTree(fullArtifact)
      val n = metric.get("queries").size()
      val total = f"${metric.get("value").asDouble()}%.2f"
      assert(!stale.contains("BASELINE.md"),
        s"BASELINE.md bench row is stale vs BENCH_full.json ($n queries, " +
          s"$total s total) — run `sbt \"runMain graft.DocSync\"`")
      val baseline = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("BASELINE.md")), "UTF-8")
      assert(baseline.contains(s"$n queries, $total s total"),
        s"BASELINE.md round-context row is stale: regenerate it from " +
          s"BENCH_full.json ($n queries, $total s total)")
    } else checkDriverCapture(om)
  }

  private def checkDriverCapture(om: com.fasterxml.jackson.databind.ObjectMapper): Unit = {
    val benches = new java.io.File(".").listFiles()
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
      // numeric round sort: lexicographic getName breaks at width changes
      // (BENCH_r10 < BENCH_r04; BENCH_r100 < BENCH_r99)
      .sortBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    assume(benches.nonEmpty, "no driver BENCH artifact yet")
    // A driver artifact's "tail" is the LAST n bytes of sbt output — a long
    // run (r5: 616 s, errors array) can push the {"metric"} line off the
    // front. Fall back to the newest artifact that still carries one, and
    // name what was skipped so the drift is visible, not silent.
    val withMetric = benches.reverse.flatMap { f =>
      val tail = om.readTree(f).get("tail").asText()
      val start = tail.indexOf("{\"metric\"")
      if (start >= 0) Some((f, tail.substring(start).linesIterator.next())) else None
    }
    assert(withMetric.nonEmpty, "no BENCH artifact carries a metric line")
    val (benchUsed, metricLine) = withMetric.head
    if (benchUsed != benches.last)
      info(s"skipped ${benches.drop(benches.indexOf(benchUsed) + 1).map(_.getName).mkString(", ")}: " +
        "truncated tail holds no metric line; using " + benchUsed.getName)
    val metric = om.readTree(metricLine)
    val n = metric.get("queries").size()
    val total = f"${metric.get("value").asDouble()}%.2f"
    val baseline = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md")), "UTF-8")
    assert(baseline.contains(s"$n queries, $total s total"),
      s"BASELINE.md round-context row is stale: regenerate it from " +
        s"${benches.last.getName} ($n queries, $total s total)")
  }
}
