package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.soql.Soql

class SoqlSpec extends AnyFunSuite {

  /** Raw-ScalaCheck bridge (the scalatestplus bridge artifact is not in the
    * offline cache): run a Prop and assert it passed. */
  private def checkProp(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("COUNT_DISTINCT becomes count(DISTINCT ...), expr-labeled when unaliased") {
    assert(Soql.translate("SELECT COUNT_DISTINCT(x) FROM t") ===
      "SELECT count(DISTINCT x) AS expr0 FROM t")
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

  test("week/quarter/N-ago date literal families produce half-open ranges") {
    val w = Soql.translate("SELECT a FROM t WHERE d = THIS_WEEK")
    assert(w.contains("d >= trunc(current_date(), 'WEEK') AND d < date_add(trunc(current_date(), 'WEEK'), 7)"), w)
    val q = Soql.translate("SELECT a FROM t WHERE d = LAST_QUARTER")
    assert(q.contains("d >= add_months(trunc(current_date(), 'QUARTER'), -3) AND d < trunc(current_date(), 'QUARTER')"), q)
    val ago = Soql.translate("SELECT a FROM t WHERE d = N_DAYS_AGO:7")
    assert(ago.contains("d >= date_sub(current_date(), 7) AND d < date_sub(current_date(), 6)"), ago)
    val nm = Soql.translate("SELECT a FROM t WHERE d = LAST_N_MONTHS:3")
    assert(nm.contains("d >= add_months(trunc(current_date(), 'MM'), -3) AND d < trunc(current_date(), 'MM')"), nm)
    val nw = Soql.translate("SELECT a FROM t WHERE d = NEXT_N_WEEKS:2")
    assert(nw.contains("d >= date_add(trunc(current_date(), 'WEEK'), 7) AND d < date_add(trunc(current_date(), 'WEEK'), 21)"), nw)
    val ny = Soql.translate("SELECT a FROM t WHERE d != NEXT_YEAR")
    assert(ny.contains("d < add_months(trunc(current_date(), 'YYYY'), 12) OR d >= add_months(trunc(current_date(), 'YYYY'), 24)"), ny)
  }

  test("bare parameterized date literal is rejected, not silently n=0") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a FROM t WHERE d = LAST_N_DAYS")
    }
    assert(e.getMessage.contains("LAST_N_DAYS:n"), e.getMessage)
    // non-parameterized literals still work bare
    assert(Soql.translate("SELECT a FROM t WHERE d = TODAY")
      .contains("d >= current_date()"))
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

  test("TYPEOF flattens to CASE-gated columns per branch field") {
    val t = Soql.translate(
      """SELECT event_id, TYPEOF event_type
        |  WHEN purchase THEN value
        |  WHEN signup THEN user_id
        |  ELSE event_type END
        |FROM Events""".stripMargin)
    assert(t === "SELECT event_id, " +
      "CASE WHEN event_type = 'purchase' THEN value END AS value, " +
      "CASE WHEN event_type = 'signup' THEN user_id END AS user_id, " +
      "CASE WHEN (event_type IS NULL OR event_type NOT IN ('purchase', 'signup')) THEN event_type END AS event_type " +
      "FROM events")
  }

  test("TYPEOF merges a field named in two branches into one multi-arm CASE") {
    val t = Soql.translate(
      "SELECT TYPEOF k WHEN A THEN x WHEN B THEN x END FROM t")
    assert(t === "SELECT CASE WHEN k = 'A' THEN x WHEN k = 'B' THEN x END AS x FROM t")
  }

  test("TYPEOF branch fields may be dot paths (join through the registry)") {
    val t = Soql.translate(
      "SELECT TYPEOF o_orderstatus WHEN O THEN Customer.c_name END FROM Orders")
    assert(t.contains("LEFT JOIN customer __p0 ON o_custkey = __p0.c_custkey"), t)
    assert(t.contains("CASE WHEN o_orderstatus = 'O' THEN __p0.c_name END AS c_name"), t)
  }

  test("TYPEOF outside the SELECT list is rejected") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a FROM t WHERE TYPEOF k WHEN A THEN x END = 1")
    }
    assert(e.getMessage.contains("TYPEOF"))
  }

  test("dot path resolves to a parent join with leaf column names") {
    val t = Soql.translate(
      "SELECT o_orderkey, Customer.c_name FROM Orders ORDER BY o_orderkey")
    assert(t.contains("LEFT JOIN customer __p0 ON o_custkey = __p0.c_custkey"), t)
    assert(t.contains("__p0.c_name"), t)
  }

  test("two-level dot path chains joins, one alias per prefix, deduped") {
    val t = Soql.translate(
      "SELECT Customer.c_name, Customer.Nation.n_name, Customer.c_mktsegment FROM Orders")
    assert(t.contains("LEFT JOIN customer __p0 ON o_custkey = __p0.c_custkey"), t)
    assert(t.contains("LEFT JOIN nation __p1 ON __p0.c_nationkey = __p1.n_nationkey"), t)
    // customer joined once despite three references
    assert(t.sliding("LEFT JOIN customer".length).count(_ == "LEFT JOIN customer") === 1, t)
  }

  test("dot path in WHERE and ORDER BY resolves through the same join") {
    val t = Soql.translate(
      "SELECT o_orderkey FROM Orders WHERE Customer.c_mktsegment = 'BUILDING' ORDER BY Customer.c_name")
    assert(t.contains("WHERE __p0.c_mktsegment = 'BUILDING'"), t)
    assert(t.contains("ORDER BY __p0.c_name"), t)
    assert(t.sliding("LEFT JOIN customer".length).count(_ == "LEFT JOIN customer") === 1, t)
  }

  test("dot path inside a child subselect joins within the child scope") {
    val t = Soql.translate(
      "SELECT o_orderkey, (SELECT l_linenumber, Part.p_name FROM Lineitems) FROM Orders")
    // the Part join must land inside the pre-aggregated child relation,
    // not on the parent query
    assert(t.contains("collect_list(struct(l_linenumber, __p0.p_name))"), t)
    assert(t.contains("FROM lineitem LEFT JOIN part __p0 ON l_partkey = __p0.p_partkey GROUP BY"), t)
  }

  test("unknown parent relationship is rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT Widget.name FROM Orders")
    }
    assert(e.getMessage.contains("parentRelationships"))
  }

  test("adversarial: nested functions inside a child subselect parse (paren nesting)") {
    val t = Soql.translate(
      "SELECT o_orderkey, (SELECT CALENDAR_YEAR(DAY_ONLY(l_shipdate)), l_linenumber FROM Lineitems) FROM Orders")
    assert(t.contains("collect_list(struct(year(to_date(l_shipdate)), l_linenumber))"), t)
  }

  test("adversarial: IN-list is not mistaken for a subselect and vice versa") {
    val a = Soql.translate("SELECT a FROM t WHERE x IN (1, 2, 3)")
    assert(a.contains("x IN (1, 2, 3)"), a)
    val b = Soql.translate(
      "SELECT o_orderkey FROM Orders WHERE o_custkey IN (SELECT c_custkey FROM Customer WHERE c_name LIKE '%IN%')")
    assert(b.contains("o_custkey IN (SELECT c_custkey FROM customer WHERE c_name LIKE '%IN%')"), b)
  }

  test("adversarial: literals containing keywords and parens never confuse the parser") {
    val t = Soql.translate(
      "SELECT a FROM t WHERE s = 'IN (SELECT x FROM y) AND NOT' AND b = 2")
    assert(t.contains("'IN (SELECT x FROM y) AND NOT'"), t)
    assert(t.contains("AND b = 2"), t)
  }

  test("double-parenthesized boolean groups parse (found by the property test)") {
    val t = Soql.translate(
      "SELECT a FROM t WHERE NOT ((NOT (a <= 5) AND c < 630)) ORDER BY a")
    assert(t === "SELECT a FROM t WHERE NOT ((NOT (a <= 5) AND c < 630)) ORDER BY a")
    // and a double-parenthesized VALUE still takes its predicate
    val v = Soql.translate("SELECT a FROM t WHERE ((a)) = 1")
    assert(v === "SELECT a FROM t WHERE ((a)) = 1")
  }

  test("adversarial: deeply nested boolean groups keep their structure") {
    val t = Soql.translate(
      "SELECT a FROM t WHERE ((x = 1 AND y = 2) OR (z = 3 AND NOT (w = 4)))")
    assert(t.contains("((x = 1 AND y = 2) OR (z = 3 AND NOT (w = 4)))"), t)
  }

  test("adversarial: arithmetic in parens is a value, not a boolean group") {
    val t = Soql.translate("SELECT a FROM t WHERE (x + 1) * 2 >= 10")
    assert(t.contains("(x + 1) * 2 >= 10"), t)
  }

  test("property: random WHERE trees translate to SQL Spark's parser accepts") {
    val spark = SparkTestSession.spark
    val parser = spark.sessionState.sqlParser
    val fieldG = Gen.oneOf("a", "b", "c", "d_date")
    // literals deliberately include keywords, parens, quotes, subquery text
    val litG = Gen.oneOf(
      Gen.choose(0, 999).map(_.toString),
      Gen.oneOf("'BUILDING'", "'a AND b OR c'", "'WHERE (x'", "'it\\'s'",
        "'SELECT * FROM t'", "'NOT IN (SELECT'"))
    val leafG: Gen[String] = Gen.oneOf(
      for { f <- fieldG; op <- Gen.oneOf("=", "!=", "<>", "<", "<=", ">", ">="); l <- litG }
        yield s"$f $op $l",
      for { f <- fieldG; n <- Gen.oneOf("", "NOT "); l <- litG } yield s"$f ${n}LIKE $l",
      for { f <- fieldG; n <- Gen.oneOf("", "NOT "); ls <- Gen.listOfN(3, litG) }
        yield s"$f ${n}IN (${ls.mkString(", ")})",
      for { f <- fieldG; op <- Gen.oneOf("=", ">", "<=") }
        yield s"$f $op LAST_N_DAYS:30")
    def condG(depth: Int): Gen[String] =
      if (depth <= 0) leafG
      else Gen.frequency(
        2 -> leafG,
        2 -> (for { l <- condG(depth - 1); r <- condG(depth - 1); op <- Gen.oneOf("AND", "OR") }
          yield s"($l $op $r)"),
        1 -> condG(depth - 1).map(c => s"NOT ($c)"))
    checkProp(Prop.forAll(condG(3)) { w =>
      val sql = Soql.translate(s"SELECT a, b FROM t WHERE $w ORDER BY a DESC NULLS LAST LIMIT 7")
      parser.parsePlan(sql)  // throws ParseException on malformed output
      true
    })
  }

  test("property: random typed SOQL executes end-to-end on a real view") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    Seq(
      (1, 10, "alpha", java.sql.Date.valueOf("2026-01-05")),
      (2, 20, "beta", java.sql.Date.valueOf("2026-05-01")),
      (3, 30, "BUILDING", java.sql.Date.valueOf("2026-08-01")),
      (4, 40, "it's", java.sql.Date.valueOf("2026-08-11")),
      (5, 50, "WHERE (x", java.sql.Date.valueOf("2027-01-01")))
      .toDF("a", "b", "c", "d_date").createOrReplaceTempView("proptbl")
    // type-aware leaves (ANSI mode: cross-type compares throw at runtime)
    val numF = Gen.oneOf("a", "b")
    val strLit = Gen.oneOf("'alpha'", "'BUILDING'", "'it\\'s'", "'WHERE (x'", "'a AND b'")
    val leafG: Gen[String] = Gen.oneOf(
      for { f <- numF; op <- Gen.oneOf("=", "!=", "<", "<=", ">", ">="); n <- Gen.choose(0, 60) }
        yield s"$f $op $n",
      for { op <- Gen.oneOf("=", "!="); l <- strLit } yield s"c $op $l",
      for { n <- Gen.oneOf("", "NOT ") } yield s"c ${n}LIKE 'a%'",
      for { n <- Gen.oneOf("", "NOT "); ls <- Gen.listOfN(2, strLit) }
        yield s"c ${n}IN (${ls.mkString(", ")})",
      for { op <- Gen.oneOf("=", ">", "<=", "<") } yield s"d_date $op LAST_N_DAYS:90",
      Gen.const("d_date >= THIS_YEAR"))
    def condG(depth: Int): Gen[String] =
      if (depth <= 0) leafG
      else Gen.frequency(
        2 -> leafG,
        2 -> (for { l <- condG(depth - 1); r <- condG(depth - 1); op <- Gen.oneOf("AND", "OR") }
          yield s"($l $op $r)"),
        1 -> condG(depth - 1).map(x => s"NOT ($x)"))
    val queryG: Gen[String] = for {
      w <- condG(2)
      q <- Gen.oneOf(
        s"SELECT a, b, c FROM proptbl WHERE $w ORDER BY a LIMIT 50",
        s"SELECT c, COUNT(a) FROM proptbl WHERE $w GROUP BY c ORDER BY c",
        s"SELECT a, b + a FROM proptbl WHERE $w ORDER BY a DESC NULLS LAST OFFSET 1")
    } yield q
    checkProp(Prop.forAll(queryG) { q =>
      spark.sql(Soql.translate(q)).collect()  // throws on bad emission
      true
    })
  }

  test("COUNT() with no argument becomes count(*), expr-labeled when unaliased") {
    assert(Soql.translate("SELECT COUNT() FROM t") === "SELECT count(*) AS expr0 FROM t")
  }

  test("translated dot-path SOQL executes on Spark and matches the hand-written join") {
    val spark = SparkTestSession.spark
    val viaText = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      "SELECT o_orderkey, Customer.c_name, Customer.c_mktsegment, o_totalprice FROM Orders ORDER BY o_orderkey")
    val handWritten = ParityQueries.queries("soql_child_to_parent")(spark, SparkTestSession.sfDir)
    assert(viaText.columns.toSeq === handWritten.columns.toSeq)
    assert(viaText.collect().toSeq === handWritten.collect().toSeq)
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

  // ---- bare ISO date/datetime literals (unquoted — the SOQL dialect) ----

  test("bare ISO date lexes as a date token, never as integer arithmetic") {
    // the regression trap: 1995-01-01 used to emit `1995 - 01 - 01` = 1993
    val t = Soql.translate("SELECT a FROM t WHERE d >= 1995-01-01")
    assert(t === "SELECT a FROM t WHERE d >= DATE '1995-01-01'")
    assert(!t.contains("1995 -"))
  }

  test("bare date comparisons get the half-open day-range rewrite") {
    assert(Soql.translate("SELECT a FROM t WHERE d = 2005-10-08")
      === "SELECT a FROM t WHERE (d >= DATE '2005-10-08' AND d < DATE '2005-10-09')")
    assert(Soql.translate("SELECT a FROM t WHERE d > 2005-10-08")
      .contains("d >= DATE '2005-10-09'"))
    assert(Soql.translate("SELECT a FROM t WHERE d <= 2005-12-31")
      .contains("d < DATE '2006-01-01'")) // day+1 rolls the year
    assert(Soql.translate("SELECT a FROM t WHERE d != 2005-10-08")
      === "SELECT a FROM t WHERE (d < DATE '2005-10-08' OR d >= DATE '2005-10-09')")
  }

  test("bare ISO datetime literals normalize to UTC TIMESTAMP literals") {
    assert(Soql.translate("SELECT a FROM t WHERE d >= 2005-10-08T01:02:03Z")
      === "SELECT a FROM t WHERE d >= TIMESTAMP '2005-10-08 01:02:03'")
    // +01:00 offset → one hour earlier in UTC
    assert(Soql.translate("SELECT a FROM t WHERE d < 2005-10-08T01:02:03+01:00")
      === "SELECT a FROM t WHERE d < TIMESTAMP '2005-10-08 00:02:03'")
    // negative offset crossing midnight forward
    assert(Soql.translate("SELECT a FROM t WHERE d = 2005-10-08T23:30:00-02:30")
      .contains("TIMESTAMP '2005-10-09 02:00:00'"))
    // fractional seconds survive as micros
    assert(Soql.translate("SELECT a FROM t WHERE d = 2005-10-08T01:02:03.5Z")
      .contains("TIMESTAMP '2005-10-08 01:02:03.500000'"))
  }

  test("bare dates in IN lists stay plain typed literals") {
    assert(Soql.translate("SELECT a FROM t WHERE d IN (1995-01-01, 1996-06-15)")
      === "SELECT a FROM t WHERE d IN (DATE '1995-01-01', DATE '1996-06-15')")
  }

  test("explicit arithmetic is still expressible with spaces") {
    assert(Soql.translate("SELECT a FROM t WHERE x = 1995 - 01 - 01")
      === "SELECT a FROM t WHERE x = 1995 - 01 - 01")
  }

  test("bare date WHERE executes end-to-end and filters correctly") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      "SELECT o_orderkey, o_orderdate FROM Orders WHERE o_orderdate >= 1995-01-01 AND o_orderdate < 1995-02-01")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // parquet TIMESTAMP(isAdjustedToUTC=false) reads as TIMESTAMP_NTZ
    assert(rows.forall { r =>
      val ts = r.getAs[java.time.LocalDateTime](1)
      !ts.isBefore(java.time.LocalDateTime.parse("1995-01-01T00:00:00")) &&
        ts.isBefore(java.time.LocalDateTime.parse("1995-02-01T00:00:00"))
    })
  }

  // ---- fiscal-period and N_*_AGO date-literal families ----

  test("fiscal literals default to calendar alignment (start month January)") {
    assert(Soql.translate("SELECT a FROM t WHERE d = THIS_FISCAL_YEAR")
      === Soql.translate("SELECT a FROM t WHERE d = THIS_YEAR"))
    assert(Soql.translate("SELECT a FROM t WHERE d = LAST_FISCAL_QUARTER")
      === Soql.translate("SELECT a FROM t WHERE d = LAST_QUARTER"))
  }

  test("fiscal literals with a non-January start month shift the trunc") {
    // FY starts in April → k=3: shift back 3 months, trunc, shift forward
    val t = Soql.translate("SELECT a FROM t WHERE d = THIS_FISCAL_YEAR", fiscalYearStartMonth = 4)
    assert(t.contains("add_months(trunc(add_months(current_date(), -3), 'YYYY'), 3)"))
    val q = Soql.translate("SELECT a FROM t WHERE d = NEXT_FISCAL_QUARTER", fiscalYearStartMonth = 4)
    assert(q.contains("add_months(trunc(add_months(current_date(), -3), 'QUARTER'), 3)"))
  }

  test("fiscal :n families produce the expected month arithmetic") {
    val t = Soql.translate("SELECT a FROM t WHERE d = LAST_N_FISCAL_YEARS:2")
    assert(t.contains("add_months(trunc(current_date(), 'YYYY'), -24)"))
    val q = Soql.translate("SELECT a FROM t WHERE d = N_FISCAL_QUARTERS_AGO:3")
    assert(q.contains("-9") && q.contains("-6"))
  }

  test("N_*_AGO calendar families cover exactly one period") {
    val w = Soql.translate("SELECT a FROM t WHERE d = N_WEEKS_AGO:2")
    assert(w.contains("date_sub(trunc(current_date(), 'WEEK'), 14)")
      && w.contains("date_sub(trunc(current_date(), 'WEEK'), 7)"))
    val m = Soql.translate("SELECT a FROM t WHERE d = N_MONTHS_AGO:3")
    assert(m.contains("add_months(trunc(current_date(), 'MM'), -3)")
      && m.contains("add_months(trunc(current_date(), 'MM'), -2)"))
    val y = Soql.translate("SELECT a FROM t WHERE d = N_YEARS_AGO:1")
    assert(y.contains("add_months(trunc(current_date(), 'YYYY'), -12)")
      && y.contains("add_months(trunc(current_date(), 'YYYY'), -0)"))
  }

  test("date-lexer fuzz: every ISO date/datetime lexes atomically, spaced arithmetic never does") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val y = 1900 + rnd.nextInt(200); val mo = 1 + rnd.nextInt(12); val d = 1 + rnd.nextInt(28)
      val date = f"$y%04d-$mo%02d-$d%02d"
      val t = Soql.translate(s"SELECT a FROM t WHERE f >= $date")
      assert(t === s"SELECT a FROM t WHERE f >= DATE '$date'", t)
      // datetime with random offset normalizes to a UTC timestamp literal
      val h = rnd.nextInt(24); val mi = rnd.nextInt(60); val sec = rnd.nextInt(60)
      val off = rnd.nextInt(3) match {
        case 0 => "Z"
        case 1 => f"+${rnd.nextInt(13)}%02d:00"
        case 2 => f"-${rnd.nextInt(13)}%02d:30"
      }
      val dt = f"${date}T$h%02d:$mi%02d:$sec%02d$off"
      val tt = Soql.translate(s"SELECT a FROM t WHERE f < $dt")
      assert(tt.matches("""SELECT a FROM t WHERE f < TIMESTAMP '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}'"""), tt)
      // spaced integers remain arithmetic — the lexer only fuses adjacency
      val spaced = Soql.translate(s"SELECT a FROM t WHERE x = $y - $mo - $d")
      assert(spaced === s"SELECT a FROM t WHERE x = $y - $mo - $d")
    }
  }

  // ---- child subselect WHERE / ORDER BY / LIMIT ----

  test("child subselect WHERE filters the pre-aggregated relation") {
    val t = Soql.translate(
      "SELECT o_orderkey, (SELECT l_linenumber FROM Lineitems WHERE l_quantity > 10) FROM Orders")
    assert(t.contains("FROM lineitem WHERE l_quantity > 10 GROUP BY l_orderkey"), t)
  }

  test("child subselect LIMIT becomes a per-parent row_number window") {
    val t = Soql.translate(
      """SELECT o_orderkey,
        |  (SELECT l_linenumber FROM Lineitems ORDER BY l_linenumber DESC LIMIT 2)
        |FROM Orders""".stripMargin)
    assert(t.contains("row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_orderkey)"), t)
    assert(t.contains("__rn0 <= 2"), t)
  }

  test("child subselect with WHERE+LIMIT executes and respects the per-parent cap") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      """SELECT o_orderkey,
        |  (SELECT l_orderkey, l_linenumber, l_quantity FROM Lineitems
        |   WHERE l_quantity >= 30 ORDER BY l_linenumber LIMIT 2)
        |FROM Orders""".stripMargin)
    val flat = ops.Shape.flattenRelationship(df, "lineitems")
    val counts = flat.groupBy("l_orderkey").count().collect()
    assert(counts.nonEmpty)
    assert(counts.forall(_.getAs[Long]("count") <= 2L))
    assert(flat.filter(org.apache.spark.sql.functions.col("l_quantity") < 30).count() === 0L)
  }

  test("table aliases strip the qualifier everywhere, incl. dot paths through the alias") {
    assert(Soql.translate("SELECT o.o_orderkey, o.o_totalprice FROM Orders o WHERE o.o_totalprice > 100")
      === "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100")
    // alias-qualified dot path still resolves the relationship registry
    val t = Soql.translate("SELECT o.Customer.c_name FROM Orders o")
    assert(t.contains("LEFT JOIN customer __p0 ON o_custkey = __p0.c_custkey"), t)
    assert(t.contains("__p0.c_name"), t)
    // alias in GROUP BY / ORDER BY / HAVING
    assert(Soql.translate(
      "SELECT o.o_orderstatus, COUNT(o.o_orderkey) n FROM Orders o GROUP BY o.o_orderstatus HAVING COUNT(o.o_orderkey) > 5 ORDER BY o.o_orderstatus")
      === "SELECT o_orderstatus, COUNT(o_orderkey) AS n FROM orders GROUP BY o_orderstatus HAVING COUNT(o_orderkey) > 5 ORDER BY o_orderstatus")
    // alias position never eats clause keywords
    assert(Soql.translate("SELECT a FROM t WITH USER_MODE") === "SELECT a FROM t")
    assert(Soql.translate("SELECT a FROM t FOR VIEW") === "SELECT a FROM t")
  }

  test("DISTANCE/GEOLOCATION translates to haversine and computes real distances") {
    val spark = SparkTestSession.spark
    val t = Soql.translate(
      "SELECT city FROM places WHERE DISTANCE(loc, GEOLOCATION(37.7749, -122.4194), 'km') < 100 ORDER BY city")
    assert(t.contains("ASIN(SQRT(POWER(SIN(RADIANS(") && t.contains("6371.0087714"), t)
    // execute on a synthetic struct-typed location column: SF-LA ≈ 559 km,
    // SF-Oakland ≈ 13 km — only Oakland is within 100 km
    import spark.implicits._
    Seq(("losangeles", 34.0522, -118.2437), ("oakland", 37.8044, -122.2712))
      .toDF("city", "lat", "lon")
      .selectExpr("city", "named_struct('latitude', lat, 'longitude', lon) AS loc")
      .createOrReplaceTempView("places")
    val rows = spark.sql(t).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("oakland"))
    // distance value sanity: SF-LA in miles ≈ 347
    val d = spark.sql(Soql.translate(
      "SELECT city, DISTANCE(loc, GEOLOCATION(37.7749, -122.4194), 'mi') dist FROM places ORDER BY city"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(d("losangeles") - 347.4) < 1.0, d.toString)
    assert(d("oakland") < 10.0)
  }

  test("customer->orders filtered subselect executes (different relationship than lineitems)") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      """SELECT c_custkey, c_name,
        |  (SELECT o_custkey, o_orderkey, o_totalprice FROM Orders
        |   WHERE o_totalprice > 100000
        |   ORDER BY o_totalprice DESC, o_orderkey LIMIT 1)
        |FROM Customer""".stripMargin)
    val flat = ops.Shape.flattenRelationship(df, "orders")
    val rows = flat.collect()
    assert(rows.nonEmpty)
    // at most one top order per customer, all above the filter bar
    val perCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.values.forall(_.length == 1))
    assert(rows.forall(_.getAs[Double]("o_totalprice") > 100000))
  }

  // ---- result-preserving clause no-ops and loud rejections ----

  test("WITH / FOR / UPDATE clauses are accepted as result-preserving no-ops") {
    assert(Soql.translate(
      "SELECT a FROM t WHERE b = 1 WITH SECURITY_ENFORCED ORDER BY a LIMIT 5 FOR VIEW")
      === "SELECT a FROM t WHERE b = 1 ORDER BY a LIMIT 5")
    assert(Soql.translate("SELECT a FROM t WITH USER_MODE")
      === "SELECT a FROM t")
    assert(Soql.translate("SELECT a FROM t UPDATE TRACKING")
      === "SELECT a FROM t")
    assert(Soql.translate("SELECT a FROM t FOR UPDATE")
      === "SELECT a FROM t")
  }

  test("USING SCOPE is rejected loudly, never silently ignored") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a FROM t USING SCOPE mine")
    }
    assert(e.getMessage.contains("USING SCOPE"))
  }

  test("GROUPING, toLabel, convertCurrency translate") {
    assert(Soql.translate(
      "SELECT s, GROUPING(s) g, COUNT(k) n FROM t GROUP BY ROLLUP(s)")
      === "SELECT s, CAST(grouping(s) AS INT) AS g, COUNT(k) AS n FROM t GROUP BY ROLLUP (s)")
    assert(Soql.translate("SELECT toLabel(s), convertCurrency(amt) FROM t")
      === "SELECT s, amt FROM t")
  }

  test("fiscal literals execute on Spark (empty on 1990s data, plan compiles)") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.soqlQuery(spark, SparkTestSession.sfDir,
      "SELECT o_orderkey FROM Orders WHERE o_orderdate = LAST_N_FISCAL_QUARTERS:2")
    assert(df.count() === 0)
  }

  test("TYPEOF ELSE branch includes NULL discriminators") {
    val t = Soql.translate(
      "SELECT TYPEOF c WHEN A THEN f1 ELSE f2 END FROM t")
    assert(t.contains("(c IS NULL OR c NOT IN ('A'))"))
  }

  test("unaliased aggregates get Salesforce expr0/expr1 labels; aliased and plain items don't") {
    val t = Soql.translate(
      "SELECT o_orderstatus, COUNT(o_orderkey), MAX(o_totalprice) total, AVG(o_totalprice) FROM Orders GROUP BY o_orderstatus")
    assert(t.contains("COUNT(o_orderkey) AS expr0"), t)
    assert(t.contains("AS total"), t)
    assert(t.contains("AVG(o_totalprice) AS expr1"), t) // numbering skips aliased items
    assert(!t.contains("o_orderstatus AS expr"), t)     // plain fields keep their names
    // non-aggregate queries are untouched
    val plain = Soql.translate("SELECT DAY_ONLY(o_orderdate) FROM Orders LIMIT 5")
    assert(!plain.contains("expr0"), plain)
  }

  test("ALL ROWS (query_all) is rejected loudly, like USING SCOPE") {
    // reachable user input: the reference's Bulk path calls query_all on an
    // arbitrary SOQL string (salesforce_to_s3_operator.py:50), so `… ALL
    // ROWS` can arrive verbatim; there is no IsDeleted/recycle-bin data to
    // honor it with, and a silent no-op would claim deleted rows were
    // included
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a FROM t WHERE a > 3 LIMIT 5 ALL ROWS")
    }
    assert(e.getMessage.contains("ALL ROWS"))
    // also at its minimal position (no WHERE/LIMIT), where the first token
    // after the table name could otherwise lex as a table alias
    val e2 = intercept[IllegalArgumentException] {
      Soql.translate("SELECT a FROM t ALL ROWS")
    }
    assert(e2.getMessage.contains("ALL ROWS"))
    // a column or alias legitimately named "all" keeps working elsewhere
    assert(Soql.translate("SELECT all FROM t") === "SELECT all FROM t")
  }

  test("WITH DATA CATEGORY is rejected loudly, like USING SCOPE") {
    val e = intercept[IllegalArgumentException] {
      Soql.translate("SELECT Id FROM Knowledge WITH DATA CATEGORY Geo__c AT usa__c")
    }
    assert(e.getMessage.contains("DATA CATEGORY"))
  }

  test("templated SOQL renders {{ params }}; unresolved placeholders throw") {
    val spark = SparkTestSession.spark
    val df = ops.Extract.templatedSoqlQuery(spark, SparkTestSession.sfDir,
      "SELECT o_orderkey FROM Orders WHERE o_totalprice > {{ floor }} AND o_orderdate >= {{since}}",
      Map("floor" -> "400000", "since" -> "1995-01-01"))
    assert(df.count() > 0)
    val e = intercept[IllegalArgumentException] {
      ops.Extract.templatedSoqlQuery(spark, SparkTestSession.sfDir,
        "SELECT o_orderkey FROM Orders WHERE o_totalprice > {{ floor }}", Map.empty)
    }
    assert(e.getMessage.contains("unresolved template placeholder"))
  }
}
