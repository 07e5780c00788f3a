package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.HistStore

class HistStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val events = Tables.load(spark, SparkTestSession.sfDir, "events")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toIndexedSeq).toSeq

  test("stored trailing probe equals the in-line twin exactly (same math, same doubles)") {
    val store = java.nio.file.Files.createTempDirectory("graft_hist").toString + "/s"
    HistStore.buildHistStore(events, store)
    val stored = rows(HistStore.trailingQuantiles(spark, store))
    val inline = rows(HistStore.trailingQuantilesInline(events))
    assert(stored.nonEmpty)
    assert(stored === inline)
  }

  test("hand fixture: interpolated p50/p90/p99 match the worked crossing-bin math") {
    import spark.implicits._
    // one day, values 0..9, binWidth 5 => bin0 cnt 5, bin1 cnt 5, n=10:
    //   p50: t=5  crosses bin0 (prev 0 < 5 <= cum 5)  -> 0 + (5/5)*5   = 5.0
    //   p90: t=9  crosses bin1 (prev 5 < 9 <= cum 10) -> 5 + (4/5)*5   = 9.0
    //   p99: t=9.9 crosses bin1                        -> 5 + (4.9/5)*5 = 9.9
    val ev = (0 until 10).map(i =>
        (java.sql.Timestamp.valueOf("2024-03-01 00:00:01"), i.toDouble))
      .toDF("ts", "value")
    val store = java.nio.file.Files.createTempDirectory("graft_hist_hand").toString + "/s"
    HistStore.buildHistStore(ev, store)
    val r = HistStore.trailingQuantiles(spark, store).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n") === 10L)
    assert(r(0).getAs[Long]("n_days") === 1L)
    assert(r(0).getAs[Double]("est_p50") === 5.0)
    assert(r(0).getAs[Double]("est_p90") === 9.0)
    assert(r(0).getAs[Double]("est_p99") === 9.9)
  }

  test("append ≡ rebuild: day-split half-build + append sums to the one-shot build, compact folds rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_hist_app").toString
    val full = s"$base/full"; val grown = s"$base/grown"
    HistStore.buildHistStore(events, full)
    val cut = to_date(col("ts")) <= lit("2024-01-15").cast("date")
    HistStore.buildHistStore(events.filter(cut), grown)
    HistStore.appendToHistStore(events.filter(!cut), grown)
    // counts are an ADD fold — split order cannot matter, so the reports
    // agree EXACTLY (identical integers feed identical double math)
    assert(rows(HistStore.trailingQuantiles(spark, grown).orderBy("day")) ===
      rows(HistStore.trailingQuantiles(spark, full).orderBy("day")))
    HistStore.compactHistStore(spark, grown)
    assert(rows(HistStore.trailingQuantiles(spark, grown).orderBy("day")) ===
      rows(HistStore.trailingQuantiles(spark, full).orderBy("day")))
    val perBin = spark.read.parquet(s"$grown/days")
      .groupBy("day", "bin").count().agg(max("count")).collect()(0).getLong(0)
    assert(perBin === 1L)
  }

  test("range probe over [d-6, d] equals the trailing row anchored at d") {
    val store = java.nio.file.Files.createTempDirectory("graft_hist_rng").toString + "/s"
    HistStore.buildHistStore(events, store)
    val t = HistStore.trailingQuantiles(spark, store)
      .filter(col("day") === lit("2024-01-21").cast("date")).collect()(0)
    val r = HistStore.rangeQuantiles(spark, store, "2024-01-15", "2024-01-21").collect()(0)
    assert(r.getAs[Long]("n_days") === t.getAs[Long]("n_days"))
    assert(r.getAs[Long]("n") === t.getAs[Long]("n"))
    assert(r.getAs[Double]("est_p50") === t.getAs[Double]("est_p50"))
    assert(r.getAs[Double]("est_p90") === t.getAs[Double]("est_p90"))
    assert(r.getAs[Double]("est_p99") === t.getAs[Double]("est_p99"))
  }

  test("estimates are quantile-monotone and bracket the exact per-window percentile by one bin width") {
    val store = java.nio.file.Files.createTempDirectory("graft_hist_mono").toString + "/s"
    HistStore.buildHistStore(events, store)
    val out = HistStore.trailingQuantiles(spark, store).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("est_p50") <= r.getAs[Double]("est_p90"))
      assert(r.getAs[Double]("est_p90") <= r.getAs[Double]("est_p99"))
    }
    // resolution claim from the object doc: the histogram estimate can
    // miss the exact value-at-rank by at most the bin width
    val exact = events
      .select(to_date(col("ts")).as("day"), col("value"))
      .groupBy("day").agg(expr("percentile(value, 0.5)").as("ex_p50"))
      .collect().map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Double]("ex_p50")).toMap
    val oneDay = HistStore.trailingQuantiles(spark, store, windowDays = 1).collect()
    oneDay.foreach { r =>
      val ex = exact(r.getAs[java.sql.Date]("day"))
      assert(math.abs(r.getAs[Double]("est_p50") - ex) <= 5.0 + 1e-9,
        s"day ${r.get(0)}: est ${r.getAs[Double]("est_p50")} vs exact $ex")
    }
  }

  test("composition: 4 slices appended in shuffled arrival order rebuild the one-shot store exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft_hist_comp").toString
    val full = s"$base/full"; val grown = s"$base/grown"
    HistStore.buildHistStore(events, full)
    // slices cut by event_id (NOT by day — every slice touches most days,
    // the hourly-ingest shape) and applied out of order: ADD-fold
    // commutativity must make arrival order unobservable
    val slice = (i: Int) => events.filter(col("event_id") % 4 === i)
    HistStore.buildHistStore(slice(2), grown)
    Seq(0, 3, 1).foreach(i => HistStore.appendToHistStore(slice(i), grown))
    assert(rows(HistStore.trailingQuantiles(spark, grown).orderBy("day")) ===
      rows(HistStore.trailingQuantiles(spark, full).orderBy("day")))
    // and the mixed form: compact mid-sequence, keep appending
    HistStore.compactHistStore(spark, grown)
    val grown2 = s"$base/grown2"
    HistStore.buildHistStore(slice(1), grown2)
    HistStore.appendToHistStore(slice(0), grown2)
    HistStore.compactHistStore(spark, grown2)
    Seq(3, 2).foreach(i => HistStore.appendToHistStore(slice(i), grown2))
    assert(rows(HistStore.trailingQuantiles(spark, grown2).orderBy("day")) ===
      rows(HistStore.trailingQuantiles(spark, full).orderBy("day")))
  }

  test("stream slots union with flat days; a replayed batchId no-ops; compact sweeps the slots") {
    val base = java.nio.file.Files.createTempDirectory("graft_hist_stream").toString
    val full = s"$base/full"; val grown = s"$base/grown"
    HistStore.buildHistStore(events, full)
    val cut = to_date(col("ts")) <= lit("2024-01-15").cast("date")
    HistStore.buildHistStore(events.filter(cut), grown)
    HistStore.appendStreamBatch(events.filter(!cut), grown, batchId = 7L)
    assert(rows(HistStore.trailingQuantiles(spark, grown)) ===
      rows(HistStore.trailingQuantiles(spark, full)))
    // at-least-once replay: the slot is taken, the re-delivered batch
    // must NOT double-count (the additive-summary failure mode)
    HistStore.appendStreamBatch(events.filter(!cut), grown, batchId = 7L)
    assert(rows(HistStore.trailingQuantiles(spark, grown)) ===
      rows(HistStore.trailingQuantiles(spark, full)))
    // compaction folds the slot into days/ and removes days_stream
    HistStore.compactHistStore(spark, grown)
    assert(!new java.io.File(s"$grown/days_stream").exists())
    assert(rows(HistStore.trailingQuantiles(spark, grown)) ===
      rows(HistStore.trailingQuantiles(spark, full)))
  }

  test("quantileDrift: hand fixture flags the day the distribution jumps") {
    import spark.implicits._
    // day1: all values 10 (bin 2 -> est_p50 12.5 for ANY n); day2: all 20
    // (bin 4 -> 22.5); day3: all 20 again. windowDays=1 isolates each day:
    // day2 shift = 10/12.5 = 0.8 (drifted), day3 shift = 0 (not)
    val ev = Seq(
      ("2024-03-01", 10.0), ("2024-03-01", 10.0),
      ("2024-03-02", 20.0), ("2024-03-02", 20.0), ("2024-03-02", 20.0),
      ("2024-03-03", 20.0))
      .map { case (d, v) => (java.sql.Timestamp.valueOf(s"$d 12:00:00"), v) }
      .toDF("ts", "value")
    val store = java.nio.file.Files.createTempDirectory("graft_hist_drift").toString + "/s"
    HistStore.buildHistStore(ev, store)
    val out = HistStore.quantileDrift(spark, store, windowDays = 1)
      .orderBy("day").collect()
    assert(out.length === 2) // first day has no predecessor
    assert(out(0).getAs[Double]("est_p50") === 22.5)
    assert(out(0).getAs[Double]("prev_p50") === 12.5)
    assert(out(0).getAs[Double]("shift") === 0.8)
    assert(out(0).getAs[Int]("drifted") === 1)
    assert(out(1).getAs[Double]("shift") === 0.0)
    assert(out(1).getAs[Int]("drifted") === 0)
  }

  test("refusals: inverted range and non-positive bin width fail loudly") {
    val store = java.nio.file.Files.createTempDirectory("graft_hist_bad").toString + "/s"
    HistStore.buildHistStore(events, store)
    intercept[IllegalArgumentException] {
      HistStore.rangeQuantiles(spark, store, "2024-01-21", "2024-01-08")
    }
    intercept[IllegalArgumentException] {
      HistStore.buildHistStore(events, store + "_w", binWidth = 0.0)
    }
    intercept[IllegalArgumentException] {
      HistStore.trailingQuantiles(spark, store, qs = Seq(0.0, 0.5))
    }
  }
}
