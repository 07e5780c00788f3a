package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.soql.Soql

class SoqlSpec extends AnyFunSuite {

  test("COUNT_DISTINCT becomes count(DISTINCT ...)") {
    assert(Soql.translate("SELECT COUNT_DISTINCT(x) FROM t") ===
      "SELECT count(DISTINCT x) FROM t")
  }

  test("parent-to-child subselect becomes a pre-aggregated left join") {
    val t = Soql.translate(
      "SELECT o_orderkey, (SELECT l_linenumber FROM Lineitems) FROM Orders WHERE o_orderkey < 5")
    assert(t.contains("named_struct('records', __rel0.__records) AS lineitems"), t)
    assert(t.contains("LEFT JOIN (SELECT l_orderkey AS __jk0, collect_list(struct(l_linenumber)) AS __records"), t)
    assert(t.contains("FROM orders LEFT JOIN"), t)
    assert(t.contains("ON o_orderkey = __rel0.__jk0 WHERE o_orderkey < 5"), t)
  }

  test("unknown child relationship is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a, (SELECT b FROM Widgets) FROM Orders")
    }
    assert(e.getMessage.contains("Soql.relationships"))
  }

  test("LAST_90_DAYS literal range") {
    val t = Soql.translate("SELECT a FROM t WHERE d >= LAST_90_DAYS")
    assert(t.contains("d >= date_sub(current_date(), 90)"), t)
  }

  test("FIELDS(ALL) becomes star") {
    assert(Soql.translate("SELECT FIELDS(ALL) FROM Part LIMIT 5") ===
      "SELECT * FROM part LIMIT 5")
  }

  test("date function renames") {
    val t = Soql.translate(
      "SELECT CALENDAR_YEAR(d), CALENDAR_MONTH(d), DAY_ONLY(d), HOUR_IN_DAY(d) FROM t")
    assert(t === "SELECT year(d), month(d), to_date(d), hour(d) FROM t")
  }

  test("TODAY equality becomes a half-open day range") {
    val t = Soql.translate("SELECT a FROM t WHERE d = TODAY")
    assert(t.contains("d >= current_date() AND d < date_add(current_date(), 1)"))
  }

  test("TODAY inequality operators map to range edges") {
    assert(Soql.translate("SELECT a FROM t WHERE d < TODAY").contains("d < current_date()"))
    assert(Soql.translate("SELECT a FROM t WHERE d > TODAY")
      .contains("d >= date_add(current_date(), 1)"))
    assert(Soql.translate("SELECT a FROM t WHERE d >= TODAY").contains("d >= current_date()"))
  }

  test("LAST_N_DAYS:n range") {
    val t = Soql.translate("SELECT a FROM t WHERE d = LAST_N_DAYS:7")
    assert(t.contains("d >= date_sub(current_date(), 7) AND d < current_date()"))
  }

  test("string literals are never rewritten") {
    val t = Soql.translate("SELECT a FROM t WHERE s = 'CALENDAR_YEAR(TODAY) FROM X'")
    assert(t.contains("'CALENDAR_YEAR(TODAY) FROM X'"))
  }

  test("SOQL backslash-escaped quote becomes doubled SQL quote") {
    val t = Soql.translate("SELECT a FROM t WHERE s = 'O\\'Brien'")
    assert(t.contains("'O''Brien'"))
  }

  test("INCLUDES on multipicklist becomes arrays_overlap over split") {
    val t = Soql.translate("SELECT a FROM t WHERE tags INCLUDES ('x', 'y')")
    assert(t.contains("arrays_overlap(split(tags, ';'), array('x', 'y'))"))
  }

  test("EXCLUDES is negated INCLUDES") {
    val t = Soql.translate("SELECT a FROM t WHERE tags EXCLUDES ('x')")
    assert(t.contains("NOT arrays_overlap"))
  }

  test("FROM object name is lowercased (title-cased Bulk dispatch)") {
    assert(Soql.translate("SELECT a FROM Lineitem").endsWith("FROM lineitem"))
  }

  test("TYPEOF is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT TYPEOF Owner WHEN User THEN Id END FROM t")
    }
    assert(e.getMessage.contains("TYPEOF"))
  }

  test("translated SOQL with date literal executes on Spark") {
    val spark = SparkTestSession.spark
    // TODAY (2026) is outside the 2024-era data — result must be empty but
    // the plan must compile and run.
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      "SELECT o_orderkey FROM Orders WHERE o_orderdate = LAST_N_DAYS:30")
    assert(df.count() === 0)
  }

  test("translated GROUP BY / HAVING / LIMIT executes") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      """SELECT o_orderstatus, COUNT_DISTINCT(o_custkey) nc FROM Orders
        |GROUP BY o_orderstatus HAVING COUNT(o_orderkey) > 1
        |ORDER BY o_orderstatus LIMIT 5""".stripMargin)
    assert(df.count() > 0)
  }
}
