package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.SfSchema
import graft.ops.Evolution

/** K4 + S6 — the executed DDL path: reconcile decisions run via spark.sql
  * against the session catalog, destination columns fetched back through
  * spark.catalog in ordinal order, loads column-aligned. */
class EvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sparkAlterTableDdl renders executable Spark DDL per missing column") {
    val cols = SfSchema.fetchSfColumns(Evolution.supplierV2)
    val missing = SfSchema.missingColumns(cols, Seq("s_suppkey", "s_name"))
    val ddl = SfSchema.sparkAlterTableDdl("db", "t", missing)
    assert(ddl === Seq(
      "ALTER TABLE db.t ADD COLUMNS (s_nationkey INT)",
      "ALTER TABLE db.t ADD COLUMNS (s_acctbal DOUBLE)"))
  }

  test("roundtrip: create → load v1 half → alter → load v2 half → read back") {
    val out = Evolution.roundtrip(spark, SparkTestSession.sfDir,
      db = "graft_evo_spec", location = "/tmp/graft_evo_spec_wh")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // catalog ordinal order: v1 columns first, then the ALTER-added ones
    assert(out.columns.toSeq === Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"))
    // pre-evolution (odd-key) rows carry NULL in the added columns;
    // post-evolution (even-key) rows are fully populated
    rows.foreach { r =>
      val odd = r.getInt(0) % 2 == 1
      assert(r.isNullAt(2) === odd, s"s_nationkey null-ness wrong for ${r.getInt(0)}")
      assert(r.isNullAt(3) === odd, s"s_acctbal null-ness wrong for ${r.getInt(0)}")
      assert(!r.isNullAt(1))
    }
    // every source row arrived exactly once
    val src = Tables.load(spark, SparkTestSession.sfDir, "supplier")
    assert(rows.length === src.count())
    assert(rows.map(_.getInt(0)).toSet.size === rows.length)
  }

  test("roundtrip is idempotent across invocations (drop-and-recreate)") {
    val a = Evolution.roundtrip(spark, SparkTestSession.sfDir,
      db = "graft_evo_spec", location = "/tmp/graft_evo_spec_wh").count()
    val b = Evolution.roundtrip(spark, SparkTestSession.sfDir,
      db = "graft_evo_spec", location = "/tmp/graft_evo_spec_wh").count()
    assert(a === b)
  }

  test("destinationColumns returns Nil for absent tables (CREATE branch trigger)") {
    assert(Evolution.destinationColumns(spark, "graft_evo_spec", "nope_not_here") === Nil)
  }
}
