package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Scale

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("saltedJoin equals the plain inner join and salts both join sides") {
    val orders = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val salted = Scale.saltedJoin(orders, customer, "o_custkey", salt = 4)
    val plain = orders.join(customer, "o_custkey")
    assert(salted.columns.toSet === plain.columns.toSet)
    // identical row multiset
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col).toIndexedSeq: _*)).isEmpty)
    // the physical join condition includes the salt key (skew actually spread)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), p)
  }

  test("clusteredParquet produces near-disjoint per-file key ranges for pruning") {
    val out = java.nio.file.Files.createTempDirectory("clustered").toString
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    Scale.clusteredParquet(li, out, Seq("l_orderkey"), numFiles = 8)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    // per-file min/max ranges must not overlap (range partitioning):
    // sort files by min, every min must be >= the previous file's max
    val ranges = back
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(lo2 >= hi1, ranges.mkString(", "))
      case _ =>
    }
    // and a range filter prunes: scan with a tight filter reads fewer files
    val pruned = spark.read.parquet(out).filter(col("l_orderkey") < ranges.head._2)
    val filesRead = pruned.select(input_file_name()).distinct().count()
    assert(filesRead < ranges.length, s"$filesRead of ${ranges.length} files read")
  }

  test("keySkew ranks heavy keys with exact share and skew factor") {
    val spark0 = spark
    import spark0.implicits._
    // key "hot" = 6 rows, "b" = 2, "a"/"c" = 1 each -> 4 keys, 10 rows,
    // uniform mean 2.5; skew(hot) = 6/2.5 = 2.4
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("b") ++ Seq("a", "c")).toDF("k")
    val out = graft.ops.Scale.keySkew(df, "k", topK = 3).collect()
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[String]("key_value"),
      r.getAs[Long]("n_rows"))).toSeq === Seq((1, "hot", 6L), (2, "b", 2L), (3, "a", 1L)))
    assert(out.head.getAs[Double]("share") === 0.6)
    assert(out.head.getAs[Double]("skew_factor") === 2.4)
    // deterministic under repartitioning
    val again = graft.ops.Scale.keySkew(df.repartition(5), "k", topK = 3).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
