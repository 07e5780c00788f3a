package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.SketchStore

class SketchStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val events = Tables.load(spark, SparkTestSession.sfDir, "events")

  private def estimates(storeDir: String): Seq[(java.sql.Date, Long, Double)] =
    SketchStore.trailingDistinct(spark, storeDir)
      .orderBy("day")
      .collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("n_days"),
        r.getAs[Double]("approx_users"))).toSeq

  test("checked twin: one row per day, window ramps to 7, every estimate inside the envelope") {
    val store = java.nio.file.Files.createTempDirectory("graft_sk").toString + "/s"
    SketchStore.buildSketchStore(events, store)
    val out = SketchStore.trailingDistinctChecked(events, store).collect()
    val nDays = events.select(to_date(col("ts"))).distinct().count()
    assert(out.length === nDays)
    // n_days ramps 1,2,...,window at the corpus head, then holds at 7
    val ramp = out.sortBy(_.getAs[java.sql.Date]("day").getTime).map(_.getAs[Long]("n_days"))
    assert(ramp.take(7).toSeq === (1L to 7L))
    assert(ramp.drop(7).forall(_ === 7L))
    assert(out.forall(_.getAs[Int]("est_within_5pct") === 1),
      "an HLL estimate left the 5% envelope")
    assert(out.forall(_.getAs[Long]("exact_users") > 0))
  }

  test("append ≡ rebuild: half-build + append + compact estimates equal the one-shot build's") {
    val base = java.nio.file.Files.createTempDirectory("graft_sk_app").toString
    val full = s"$base/full"; val grown = s"$base/grown"
    SketchStore.buildSketchStore(events, full)
    val cut = to_date(col("ts")) <= lit("2024-01-15").cast("date")
    SketchStore.buildSketchStore(events.filter(cut), grown)
    SketchStore.appendToSketchStore(events.filter(!cut), grown)
    SketchStore.compactSketchStore(spark, grown)
    // the register array is a max fold — merge order cannot matter, so
    // the estimates agree EXACTLY, not to a tolerance
    assert(estimates(grown) === estimates(full))
    // compaction folded the appended rows back to one per day
    val perDay = spark.read.parquet(s"$grown/days")
      .groupBy("day").count().agg(max("count")).collect()(0).getLong(0)
    assert(perDay === 1L)
  }

  test("re-delivered day is idempotent: double-append changes no estimate") {
    val base = java.nio.file.Files.createTempDirectory("graft_sk_idem").toString
    val store = s"$base/s"
    SketchStore.buildSketchStore(events, store)
    val before = estimates(store)
    val oneDay = events.filter(to_date(col("ts")) === lit("2024-01-10").cast("date"))
    assert(oneDay.count() > 0)
    SketchStore.appendToSketchStore(oneDay, store)
    SketchStore.appendToSketchStore(oneDay, store)
    assert(estimates(store) === before)
  }

  test("stored probe equals the in-line sketch over raw events (deterministic estimates)") {
    val store = java.nio.file.Files.createTempDirectory("graft_sk_det").toString + "/s"
    SketchStore.buildSketchStore(events, store)
    val stored = estimates(store)
    val anchors = events.select(to_date(col("ts")).as("anchor")).distinct()
    val inline = events.select(to_date(col("ts")).as("day"), col("user_id"))
      .join(broadcast(anchors),
        col("day").between(date_sub(col("anchor"), 6), col("anchor")))
      .groupBy(col("anchor").as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("approx_users"))
      .orderBy("day").collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Double]("approx_users"))).toSeq
    assert(stored.map(t => (t._1, t._3)) === inline)
  }

  test("rangeDistinct guards its range: inverted order refuses at construction, an uncovered range fails loudly at execution") {
    val store = java.nio.file.Files.createTempDirectory("graft_sk_rg").toString + "/s"
    SketchStore.buildSketchStore(events, store)
    val days = spark.read.parquet(s"$store/days")
      .agg(min(col("day")).cast("string"), max(col("day")).cast("string"))
      .collect()(0)
    val (lo, hi) = (days.getString(0), days.getString(1))
    // the happy path still answers one row
    val ok = SketchStore.rangeDistinct(spark, store, lo, hi).collect()
    assert(ok.length === 1 && ok(0).getAs[Long]("n_days") > 0)
    // inverted range: a caller error, refused before any job runs
    val inv = intercept[IllegalArgumentException](
      SketchStore.rangeDistinct(spark, store, hi, lo))
    assert(inv.getMessage.contains("is after"))
    // malformed date: refused at construction too
    intercept[java.time.format.DateTimeParseException](
      SketchStore.rangeDistinct(spark, store, "20-bad-01", hi))
    // a range covering no stored days: (0, NULL) would silently poison the
    // checked twin's envelope — it must fail loudly instead
    val e = intercept[Exception](
      SketchStore.rangeDistinct(spark, store, "1970-01-01", "1970-01-02").collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("covers no stored days")), e.getMessage)
  }

  test("a torn store (no _SUCCESS) is refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sk_torn").toString
    val e = intercept[IllegalArgumentException] {
      SketchStore.trailingDistinct(spark, dir)
    }
    assert(e.getMessage.contains("_SUCCESS"))
  }
}
