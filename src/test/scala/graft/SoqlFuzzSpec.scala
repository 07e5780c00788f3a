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
}
