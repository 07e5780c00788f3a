package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.soql.Soql

/** Executed algebraic consistency of the named date-literal families.
  * Rather than re-encoding each family's convention (week start,
  * today-inclusion — those are pinned case-by-case in SoqlSpec), this
  * sweep asserts the relations that must hold between families for ANY
  * convention, catching the off-by-one/unit-arithmetic bugs a per-family
  * expected-string test can miss:
  *
  *   - LAST_X / THIS_X / NEXT_X tile time contiguously;
  *   - LAST_N_X:1 ≡ LAST_X, NEXT_N_X:1 ≡ NEXT_X, N_X_AGO:1 ≡ LAST_X;
  *   - LAST_N_X:n ends where LAST_X ends and starts n−1 units earlier;
  *   - fiscal families with a January fiscal-year start ≡ calendar twins;
  *   - TODAY/YESTERDAY/TOMORROW are three consecutive 1-day ranges.
  *
  * Ranges are extracted from the emitted half-open rewrite and EVALUATED
  * through Spark SQL, so trunc/add_months/date_sub arithmetic runs for
  * real (UTC session), not as string comparison. */
class DateLiteralAlgebraSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** (start, end) of the half-open range the literal denotes, evaluated. */
  private def rangeOf(lit: String, fyStart: Int = 1): (java.sql.Date, java.sql.Date) = {
    val t = Soql.translate(s"SELECT a FROM t WHERE d = $lit", fyStart)
    val m = """\(d >= (.*) AND d < (.*)\)""".r.findFirstMatchIn(t)
      .getOrElse(fail(s"no half-open rewrite in: $t"))
    val row = spark.sql(
      s"SELECT CAST(${m.group(1)} AS DATE) AS s, CAST(${m.group(2)} AS DATE) AS e").head()
    (row.getDate(0), row.getDate(1))
  }

  private val units = Seq(
    ("WEEK", 1, "WEEKS"), ("MONTH", 1, "MONTHS"),
    ("QUARTER", 1, "QUARTERS"), ("YEAR", 1, "YEARS"))

  test("LAST/THIS/NEXT tile time contiguously for every calendar unit") {
    for ((u, _, _) <- units) {
      val (ls, le) = rangeOf(s"LAST_$u")
      val (ts, te) = rangeOf(s"THIS_$u")
      val (ns, ne) = rangeOf(s"NEXT_$u")
      assert(le === ts, s"$u: LAST must end where THIS starts")
      assert(te === ns, s"$u: THIS must end where NEXT starts")
      assert(ls.before(le) && ts.before(te) && ns.before(ne), s"$u: empty range")
    }
  }

  test("N:1 forms degenerate to their unit forms; N:3 keeps the end and widens the start") {
    for ((u, _, pl) <- units) {
      assert(rangeOf(s"LAST_N_$pl:1") === rangeOf(s"LAST_$u"), s"LAST_N_$pl:1")
      assert(rangeOf(s"NEXT_N_$pl:1") === rangeOf(s"NEXT_$u"), s"NEXT_N_$pl:1")
      assert(rangeOf(s"N_${pl}_AGO:1") === rangeOf(s"LAST_$u"), s"N_${pl}_AGO:1")
      val (s1, e1) = rangeOf(s"LAST_$u")
      val (s3, e3) = rangeOf(s"LAST_N_$pl:3")
      assert(e3 === e1, s"LAST_N_$pl:3 must end where LAST_$u ends")
      assert(s3.before(s1), s"LAST_N_$pl:3 must start before LAST_$u")
    }
  }

  test("fiscal families with a January fiscal year equal the calendar twins") {
    for (u <- Seq("QUARTER", "YEAR"); pre <- Seq("THIS", "LAST", "NEXT"))
      assert(rangeOf(s"${pre}_FISCAL_$u", fyStart = 1) === rangeOf(s"${pre}_$u"),
        s"${pre}_FISCAL_$u(fy=1)")
    assert(rangeOf("LAST_N_FISCAL_QUARTERS:2", 1) === rangeOf("LAST_N_QUARTERS:2"))
    assert(rangeOf("N_FISCAL_YEARS_AGO:2", 1) === rangeOf("N_YEARS_AGO:2"))
  }

  test("fiscal LAST/THIS/NEXT tile contiguously for a non-January fiscal start") {
    for (u <- Seq("FISCAL_QUARTER", "FISCAL_YEAR")) {
      val (ls, le) = rangeOf(s"LAST_$u", fyStart = 4)
      val (ts, te) = rangeOf(s"THIS_$u", fyStart = 4)
      val (ns, _) = rangeOf(s"NEXT_$u", fyStart = 4)
      assert(le === ts && te === ns, s"$u(fy=4) tiling")
      assert(ls.before(le), s"$u(fy=4) empty")
    }
  }

  test("TODAY / YESTERDAY / TOMORROW are consecutive single days") {
    val (ys, ye) = rangeOf("YESTERDAY")
    val (ts, te) = rangeOf("TODAY")
    val (ms, me) = rangeOf("TOMORROW")
    assert(ye === ts && te === ms)
    for ((s, e) <- Seq((ys, ye), (ts, te), (ms, me)))
      assert(e.toLocalDate === s.toLocalDate.plusDays(1), "must span exactly one day")
  }
}
