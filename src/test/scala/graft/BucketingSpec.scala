package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing — the 100 TB co-located-join path: both sides pre-bucketed on
  * the join key mean the join plans with NO shuffle exchange at all (the
  * scan itself provides the required hash partitioning). At cluster scale
  * this is how a repeatedly-joined fact table amortizes its shuffle once
  * at write time. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bucketed co-located join plans without a shuffle exchange") {
    val dir = SparkTestSession.sfDir
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // a previously failed run can leave the managed location behind
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      val p = java.nio.file.Paths.get(s"/tmp/graft-warehouse/$t")
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // pin the layout decisions: the auto-bucketed-scan heuristic can drop
    // the bucketed layout, and at this tiny sf the join would otherwise
    // broadcast (which demonstrates nothing about co-location)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // and the result matches the unbucketed join
      val unbucketed = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === unbucketed)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    }
  }
}
