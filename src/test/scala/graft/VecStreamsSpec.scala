package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ext.Similarity
import graft.streaming.{VecIn, VecStreams}

class VecStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureVecs(): Array[VecIn] =
    Tables.load(spark, SparkTestSession.sfDir, "embeddings")
      .collect()
      .map(r => VecIn(r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
      .sortBy(_.vec_id)

  /** Stream the fixture through assignStream in seeded random micro-batch
    * splits and compare to the batch relation over the same rows. */
  private def differential(store: String, seed: Int, sink: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(seed)
    val vecs = fixtureVecs()
    val input = MemoryStream[VecIn]
    val q = VecStreams.assignStream(input.toDF(), store).writeStream
      .format("memory").queryName(sink).outputMode("append").start()
    try {
      var i = 0
      while (i < vecs.length) {
        val n = 1 + rnd.nextInt(200)
        input.addData(vecs.slice(i, i + n).toSeq)
        i += n
      }
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val batch = Similarity.assignAgainstIvfStore(
        Tables.load(spark, SparkTestSession.sfDir, "embeddings"), store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty && streamed.map(_._2).distinct.size > 1)
  }

  test("assignStream equals the batch store assignment under random splits (flat store)") {
    val base = java.nio.file.Files.createTempDirectory("vecstream_flat").toString
    Similarity.buildIvfStore(
      Tables.load(spark, SparkTestSession.sfDir, "embeddings"), s"$base/s")
    differential(s"$base/s", seed = 11, sink = "vec_assign_flat")
  }

  test("assignStream equals the batch store assignment under random splits (hier store)") {
    val base = java.nio.file.Files.createTempDirectory("vecstream_hier").toString
    Similarity.buildIvfStore(
      Tables.load(spark, SparkTestSession.sfDir, "embeddings"), s"$base/s",
      nGroups = 4)
    differential(s"$base/s", seed = 13, sink = "vec_assign_hier")
  }

  test("runAnnServe equals the batch store probe under random splits (hier store), scanning only probed lists per batch") {
    val base = java.nio.file.Files.createTempDirectory("vecstream_ann").toString
    val embs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
    Similarity.buildIvfStore(embs, s"$base/s", nGroups = 4)
    val queries = fixtureVecs().filter(_.vec_id < 10)
      .map(v => graft.streaming.VecQueryIn(v.vec_id,
        new java.sql.Timestamp(1000L + v.vec_id), v.embedding))
    // random micro-batch splits as FILE drops (the runner's source shape):
    // maxFilesPerTrigger=1 makes each slice its own micro-batch
    val rnd = new scala.util.Random(19)
    var rest = queries.toIndexedSeq
    var slice = 0
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/q"))
    while (rest.nonEmpty) {
      val n = 1 + rnd.nextInt(4)
      spark.createDataFrame(rest.take(n)).coalesce(1)
        .write.parquet(s"$base/src/slice_$slice")
      val part = new java.io.File(s"$base/src/slice_$slice").listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(part.length === 1)
      java.nio.file.Files.move(part(0).toPath,
        java.nio.file.Paths.get(s"$base/q/slice_$slice.parquet"))
      rest = rest.drop(n); slice += 1
    }
    assert(slice > 2, "splits must produce multiple micro-batches")
    val q = VecStreams.runAnnServe(spark, s"$base/q", s"$base/s",
      s"$base/out", s"$base/ckpt", maxFilesPerTrigger = Some(1))
    try q.processAllAvailable() finally q.stop()
    val cols = Seq("query_id", "rank", "neighbor_id", "cosine", "list_id")
    val streamed = spark.read.parquet(s"$base/out")
      .select(cols.map(col): _*).collect().map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Int]))
    val batch = Similarity.ivfAgainstStore(
        embs.filter(col("vec_id") < 10), s"$base/s")
      .select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(streamed.toSeq === batch)
    assert(batch.size === 50, "10 queries x top-5 expected on the fixture")
    // idempotent-replay contract: each micro-batch owns a
    // batchId-deterministic partition dir it OVERWRITES, so an
    // at-least-once foreachBatch replay after crash-restart replaces its
    // previous output instead of appending duplicate (query_id, rank) rows
    val batchDirs = new java.io.File(s"$base/out").listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(batchDirs.nonEmpty && batchDirs.forall(_.startsWith("batch_id=")),
      s"output must be batchId-partitioned: ${batchDirs.mkString(",")}")
    // simulate the at-least-once replay: the same batch write lands twice
    // on its deterministic dir — row count must be stable (the sink's
    // delete+write replace), where the old append sink would have doubled
    // it. Mirrors runAnnServe's foreachBatch body exactly.
    def replayOnce(): Unit = {
      val dir = s"$base/out/${batchDirs.min}"
      graft.ops.Scale.deleteRecursively(new java.io.File(dir))
      VecStreams.annServeBatch(spark.read.parquet(s"$base/q"), s"$base/s")
        .write.parquet(dir)
    }
    replayOnce(); val afterOnce = spark.read.parquet(s"$base/out").count()
    replayOnce(); val afterTwice = spark.read.parquet(s"$base/out").count()
    assert(afterOnce === afterTwice,
      "replaying a batch must be idempotent (overwrite, not append)")
    // the per-batch plan is the BATCH probe: its lists scan carries the
    // collected probed-ids isin pushdown (bounded store reads per trigger)
    val plan = VecStreams.annServeBatch(
      spark.read.parquet(s"$base/q"), s"$base/s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("list_id IN") || plan.contains("In(list_id"),
      s"lists scan must carry the probed-ids pushdown:\n$plan")
  }

  test("assignStream is stateless: zero state rows after multiple batches") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("vecstream_state").toString
    Similarity.buildIvfStore(
      Tables.load(spark, SparkTestSession.sfDir, "embeddings"), s"$base/s")
    val vecs = fixtureVecs()
    val input = MemoryStream[VecIn]
    val q = VecStreams.assignStream(input.toDF(), s"$base/s").writeStream
      .format("memory").queryName("vec_assign_state").outputMode("append").start()
    try {
      input.addData(vecs.take(50).toSeq); q.processAllAvailable()
      input.addData(vecs.slice(50, 100).toSeq); q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty ||
        p.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
