package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout. Runs the headline queries
  * (SparkEntry.benchQueries: the shuffle/join/scan-heavy representatives)
  * against SPARK_GRAFT_SF_DIR.
  *
  * Materialization is via the `noop` sink: `count()` would let Catalyst
  * prune columns and skip the very operators being measured (a count over
  * a projection needs none of the projected expressions); noop runs the
  * full physical plan and discards rows on the executors.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup on the smallest sf so per-query numbers measure
    // the plan, not JIT compilation of Spark itself
    SparkEntry.queries("extract_shape_lineitem")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
