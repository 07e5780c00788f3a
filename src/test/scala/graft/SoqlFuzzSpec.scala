package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differential fuzz of the SOQL WHERE grammar: random predicate trees are
  * rendered to SOQL text, run through the full translate→spark.sql path,
  * and compared against the SAME predicate built directly with the Column
  * API — so precedence, parenthesization, NOT-distribution, IN-list,
  * LIKE, and bare-date-literal handling are all checked against an
  * independent implementation rather than against expected strings. */
class SoqlFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private final case class Pred(soql: String, col: Column)

  private def leaf(rnd: scala.util.Random): Pred = rnd.nextInt(6) match {
    case 0 =>
      val x = 50000 + rnd.nextInt(400000)
      val op = Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
      Pred(s"o_totalprice $op $x", op match {
        case "<" => col("o_totalprice") < x
        case "<=" => col("o_totalprice") <= x
        case ">" => col("o_totalprice") > x
        case ">=" => col("o_totalprice") >= x
      })
    case 1 =>
      val s = Seq("F", "O", "P")(rnd.nextInt(3))
      if (rnd.nextBoolean()) Pred(s"o_orderstatus = '$s'", col("o_orderstatus") === s)
      else Pred(s"o_orderstatus != '$s'", col("o_orderstatus") =!= s)
    case 2 =>
      // bare unquoted ISO date literal — the r3 lexer path
      val d = f"199${rnd.nextInt(7)}%s-0${1 + rnd.nextInt(9)}%s-1${rnd.nextInt(9)}%s"
      val op = Seq("<", ">=")(rnd.nextInt(2))
      Pred(s"o_orderdate $op $d",
        if (op == "<") col("o_orderdate") < java.sql.Date.valueOf(d)
        else col("o_orderdate") >= java.sql.Date.valueOf(d))
    case 3 =>
      val ks = Seq.fill(2 + rnd.nextInt(3))(1 + rnd.nextInt(1500)).distinct
      Pred(s"o_custkey IN (${ks.mkString(", ")})", col("o_custkey").isin(ks: _*))
    case 4 =>
      val p = Seq("1%", "%urgent%", "2-HIGH", "%l")(rnd.nextInt(4))
      Pred(s"o_orderpriority LIKE '$p'", col("o_orderpriority").like(p))
    case _ =>
      val ks = Seq.fill(2 + rnd.nextInt(2))(1 + rnd.nextInt(1500)).distinct
      Pred(s"o_custkey NOT IN (${ks.mkString(", ")})", !col("o_custkey").isin(ks: _*))
  }

  private def gen(depth: Int, rnd: scala.util.Random): Pred =
    if (depth == 0 || rnd.nextInt(3) == 0) leaf(rnd)
    else rnd.nextInt(4) match {
      // combinator children are parenthesized so the rendered string always
      // re-parses to THIS tree (an unparenthesized (A OR B) AND C would
      // re-parse as A OR (B AND C)); raw precedence is asserted separately
      case 0 =>
        val (a, b) = (gen(depth - 1, rnd), gen(depth - 1, rnd))
        Pred(s"(${a.soql}) AND (${b.soql})", a.col && b.col)
      case 1 =>
        val (a, b) = (gen(depth - 1, rnd), gen(depth - 1, rnd))
        Pred(s"(${a.soql}) OR (${b.soql})", a.col || b.col)
      case 2 =>
        val a = gen(depth - 1, rnd)
        Pred(s"NOT (${a.soql})", !a.col)
      case _ =>
        val a = gen(depth - 1, rnd)
        Pred(s"(${a.soql})", a.col)
    }

  /** Leaf pool for COMPOSITE trees: the plain leaves above plus
    * child-to-parent dot-path predicates (1 and 2 levels), so generated
    * WHERE trees mix dot paths × date literals × IN/LIKE freely. The
    * expected side evaluates on the pre-joined orders×customer×nation
    * relation — the translator's left-join semantics (null parent →
    * predicate false) fall out identically. */
  private def leafC(rnd: scala.util.Random): Pred = rnd.nextInt(9) match {
    case 6 =>
      val seg = Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE")(rnd.nextInt(5))
      if (rnd.nextBoolean())
        Pred(s"Customer.c_mktsegment = '$seg'", col("c_mktsegment") === seg)
      else Pred(s"Customer.c_mktsegment != '$seg'", col("c_mktsegment") =!= seg)
    case 7 =>
      val x = rnd.nextInt(11000) - 1000
      Pred(s"Customer.c_acctbal >= $x", col("c_acctbal") >= x)
    case 8 =>
      val n = Seq("FRANCE", "GERMANY", "CHINA", "KENYA", "PERU")(rnd.nextInt(5))
      Pred(s"Customer.Nation.n_name = '$n'", col("n_name") === n)
    case _ => leaf(rnd)
  }

  private def genC(depth: Int, rnd: scala.util.Random): Pred =
    if (depth == 0 || rnd.nextInt(3) == 0) leafC(rnd)
    else rnd.nextInt(3) match {
      case 0 =>
        val (a, b) = (genC(depth - 1, rnd), genC(depth - 1, rnd))
        Pred(s"(${a.soql}) AND (${b.soql})", a.col && b.col)
      case 1 =>
        val (a, b) = (genC(depth - 1, rnd), genC(depth - 1, rnd))
        Pred(s"(${a.soql}) OR (${b.soql})", a.col || b.col)
      case _ =>
        val a = genC(depth - 1, rnd)
        Pred(s"NOT (${a.soql})", !a.col)
    }

  test("AND binds tighter than OR and NOT tighter than AND, as in SOQL") {
    val orders = Tables.load(spark, dir, "orders")
    val got = ops.Extract.soqlQuery(spark, dir,
      """SELECT o_orderkey FROM Orders
        |WHERE o_orderstatus = 'F' OR o_totalprice > 300000 AND o_custkey < 100
        |ORDER BY o_orderkey""".stripMargin).collect().map(_.getLong(0)).toSeq
    val want = orders
      .filter(col("o_orderstatus") === "F" ||
        (col("o_totalprice") > 300000 && col("o_custkey") < 100))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got === want)
  }

  test("60 random WHERE trees: translated SOQL row set equals the Column-API predicate") {
    val orders = Tables.load(spark, dir, "orders")
    val rnd = new scala.util.Random(4242)
    (1 to 60).foreach { i =>
      val p = gen(2 + rnd.nextInt(2), rnd)
      val soql = s"SELECT o_orderkey FROM Orders WHERE ${p.soql} ORDER BY o_orderkey"
      val got = ops.Extract.soqlQuery(spark, dir, soql)
        .collect().map(_.getLong(0)).toSeq
      val want = orders.filter(p.col).select("o_orderkey").orderBy("o_orderkey")
        .collect().map(_.getLong(0)).toSeq
      assert(got === want, s"case $i diverged for: $soql")
    }
  }

  // ---- composite fuzz: the FEATURE INTERACTIONS (single features are all
  // oracle-green; parser bugs now hide where dot paths, bare date literals,
  // TYPEOF, and child subqueries meet in one query) -----------------------

  private lazy val joined = {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val nation = Tables.load(spark, dir, "nation")
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(nation, customer("c_nationkey") === nation("n_nationkey"), "left")
  }

  test("60 composite SELECT+WHERE trees: dot-path projections x dot-path/date/IN/LIKE predicates") {
    val rnd = new scala.util.Random(777)
    (1 to 60).foreach { i =>
      val p = genC(2 + rnd.nextInt(2), rnd)
      // random projection: key + any subset of two dot paths and a base col
      val pool = Seq(
        "Customer.c_name" -> "c_name",
        "Customer.Nation.n_name" -> "n_name",
        "o_totalprice" -> "o_totalprice")
      val picks = pool.filter(_ => rnd.nextBoolean())
      val selSoql = ("o_orderkey" +: picks.map(_._1)).mkString(", ")
      val soql = s"SELECT $selSoql FROM Orders WHERE ${p.soql} ORDER BY o_orderkey"
      val got = ops.Extract.soqlQuery(spark, dir, soql).collect().map(_.toSeq).toSeq
      val want = joined.filter(p.col)
        .select(col("o_orderkey") +: picks.map(c => col(c._2)): _*)
        .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
      assert(got === want, s"case $i diverged for: $soql")
    }
  }

  test("30 composite TYPEOF queries: branch fields include dot paths, under random WHERE trees") {
    val rnd = new scala.util.Random(90210)
    // (soql path, expected column, leaf name)
    val fieldPool = Seq(
      ("o_totalprice", col("o_totalprice"), "o_totalprice"),
      ("o_custkey", col("o_custkey"), "o_custkey"),
      ("o_orderpriority", col("o_orderpriority"), "o_orderpriority"),
      ("Customer.c_name", col("c_name"), "c_name"),
      ("Customer.Nation.n_name", col("n_name"), "n_name"))
    (1 to 30).foreach { i =>
      val p = genC(1 + rnd.nextInt(2), rnd)
      // three DISTINCT leaf fields (same-leaf merging is covered by the
      // dedicated soql_typeof entry): WHEN F, WHEN O, optionally ELSE
      val Seq(fF, fO, fE) = rnd.shuffle(fieldPool).take(3)
      val withElse = rnd.nextBoolean()
      val elseSoql = if (withElse) s" ELSE ${fE._1}" else ""
      val soql =
        s"""SELECT o_orderkey, TYPEOF o_orderstatus
           |  WHEN F THEN ${fF._1} WHEN O THEN ${fO._1}$elseSoql END
           |FROM Orders WHERE ${p.soql} ORDER BY o_orderkey""".stripMargin
      val got = ops.Extract.soqlQuery(spark, dir, soql).collect().map(_.toSeq).toSeq
      val st = col("o_orderstatus")
      val cols = Seq(col("o_orderkey"),
        when(st === "F", fF._2).as(fF._3),
        when(st === "O", fO._2).as(fO._3)) ++
        (if (withElse) Seq(when(st.isNull || !st.isin("F", "O"), fE._2).as(fE._3)) else Nil)
      val want = joined.filter(p.col).select(cols: _*)
        .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
      assert(got === want, s"case $i diverged for: $soql")
    }
  }

  test("30 composite aggregates: dot-path GROUP BY keys x date functions x HAVING under random trees") {
    val rnd = new scala.util.Random(31337)
    // order-independent exact aggregates only (COUNT/MAX/MIN — a double SUM
    // would vary with partition order and fuzz the comparison itself)
    val keyPool = Seq(
      ("Customer.Nation.n_name", col("n_name"), "n_name"),
      ("Customer.c_mktsegment", col("c_mktsegment"), "c_mktsegment"),
      ("o_orderstatus", col("o_orderstatus"), "o_orderstatus"),
      ("CALENDAR_YEAR(o_orderdate) yr", year(col("o_orderdate")).as("yr"), "yr"))
    (1 to 30).foreach { i =>
      val p = genC(1 + rnd.nextInt(2), rnd)
      val keys = rnd.shuffle(keyPool).take(1 + rnd.nextInt(2))
      val havingT = rnd.nextInt(50)
      val withHaving = rnd.nextBoolean()
      val having = if (withHaving) s" HAVING COUNT(o_orderkey) > $havingT" else ""
      val soql =
        s"""SELECT ${keys.map(_._1).mkString(", ")},
           |  COUNT(o_orderkey) n, MAX(o_totalprice) mx, MIN(o_custkey) mn
           |FROM Orders WHERE ${p.soql}
           |GROUP BY ${keys.map(k => k._1.split(' ').head).mkString(", ")}$having""".stripMargin
      val got = ops.Extract.soqlQuery(spark, dir, soql)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val base = joined.filter(p.col)
        .groupBy(keys.map(_._2): _*)
        .agg(count(col("o_orderkey")).as("n"), max(col("o_totalprice")).as("mx"),
          min(col("o_custkey")).as("mn"))
      val want = (if (withHaving) base.filter(col("n") > havingT) else base)
        .select(keys.map(k => col(k._3)) ++ Seq(col("n"), col("mx"), col("mn")): _*)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got === want, s"case $i diverged for: $soql")
    }
  }

  test("30 composite child subqueries: random inner WHERE/LIMIT under random parent trees") {
    val rnd = new scala.util.Random(616)
    val orders = Tables.load(spark, dir, "orders")
    val lineitem = Tables.load(spark, dir, "lineitem")
    (1 to 30).foreach { i =>
      val p = gen(1 + rnd.nextInt(2), rnd)
      val q = 10 + rnd.nextInt(36) // inner quantity threshold
      val k = 1 + rnd.nextInt(3)   // per-parent LIMIT
      val soql =
        s"""SELECT o_orderkey, o_totalprice,
           |  (SELECT l_orderkey, l_linenumber, l_quantity FROM Lineitems
           |   WHERE l_quantity >= $q
           |   ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC
           |   LIMIT $k)
           |FROM Orders WHERE ${p.soql}""".stripMargin
      val got = ops.Shape.flattenRelationship(
          ops.Extract.soqlQuery(spark, dir, soql), "lineitems")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
        .orderBy(col("l_linenumber").desc, col("l_quantity").desc, col("l_extendedprice").desc)
      val want = lineitem.filter(col("l_quantity") >= q)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
        .join(orders.filter(p.col).select(col("o_orderkey").as("__ok")),
          col("l_orderkey") === col("__ok"), "left_semi")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got === want, s"case $i diverged for: $soql")
    }
  }
}
