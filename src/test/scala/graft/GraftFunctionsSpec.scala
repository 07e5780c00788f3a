package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }
  import spark.implicits._

  test("minhash_sig equals the HOF transform/array_min formulation") {
    val df = Seq(Seq(5L, 99L, 1234567L), Seq(42L)).toDF("hs")
    val out = df.select(
      expr("minhash_sig(hs)").as("native"),
      expr("""transform(sequence(0, 127), i ->
             |  array_min(transform(hs, x ->
             |    (((1103515245 * CAST(i AS BIGINT) + 12345) % 1000000007 + 1) * x
             |     + (69069 * CAST(i AS BIGINT) + 362437) % 1000000007) % 1000000007)))""".stripMargin)
        .as("hof")).collect()
    out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    assert(out.head.getSeq[Long](0).length === 128)
  }

  test("vec_dotq / vec_normq equal the quantize+zip_with formulation on real embeddings") {
    val e = Tables.load(spark, SparkTestSession.sfDir, "embeddings").limit(50)
    val pairs = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") < col("b")).limit(200)
    val out = pairs.select(
      expr("vec_dotq(ea, eb)").as("native"),
      expr("""aggregate(zip_with(
             |  transform(ea, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
             |  transform(eb, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
             |  (x, y) -> x * y), CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("hof"),
      expr("vec_normq(ea)").as("nnative"),
      expr("""aggregate(transform(ea, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)),
             |  CAST(0 AS BIGINT), (acc, x) -> acc + x * x)""".stripMargin).as("nhof")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) === r.getLong(1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("quantization rounds half away from zero (SQL round semantics)") {
    // -3/32 is exactly representable in float; ·10⁴ = -937.5 exactly
    val df = Seq((Array(-0.09375f), Array(0.09375f))).toDF("a", "b")
    val out = df.select(expr("vec_normq(a)"), expr("vec_dotq(a, b)")).head()
    assert(out.getLong(0) === 938L * 938L)
    assert(out.getLong(1) === -938L * 938L)
    // and matches Spark's own round()
    val sqlQ = df.select(expr("CAST(round(CAST(a[0] AS DOUBLE) * 10000) AS BIGINT)")).head().getLong(0)
    assert(sqlQ === -938L)
  }

  test("shingle_hash60 equals the SQL md5-conv formulation on real docs") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(50)
    val out = docs.select(
      expr("shingle_hash60(text, 3)").as("native"),
      expr(s"""transform(array_distinct(${graft.ext.Dedup.shinglesExpr(3)}),
              |  s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT))""".stripMargin)
        .as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getSeq[Long](0).sorted === r.getSeq[Long](1).sorted)
    }
  }

  test("minhash_union equals the exploded per-component min it replaced") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
      .select(col("source"), expr("shingle_hash60(text, 3)").as("h"))
      .filter(expr("size(h) > 0"))
      .select(col("source"), expr("minhash_sig(h)").as("sig"))
    val native = docs.groupBy("source").agg(expr("minhash_union(sig)").as("sig"))
      .select(col("source"), posexplode(col("sig")).as(Seq("i", "v")))
    val exploded = docs.select(col("source"), posexplode(col("sig")).as(Seq("i", "v")))
      .groupBy("source", "i").agg(min("v").as("v"))
    assert(native.exceptAll(exploded).isEmpty && exploded.exceptAll(native).isEmpty)
    // and it aggregates partially: a minhash_union partial before the shuffle
    assert(native.queryExecution.executedPlan.toString.contains("partial_minhash_union"))
  }

  test("vec_sum_agg equals the exploded per-component sum it replaces") {
    val vecs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
      .select((col("vec_id") % 7).as("g"), expr("vec_quantize(embedding)").as("q"))
    val native = vecs.groupBy("g").agg(expr("vec_sum_agg(q)").as("s"))
      .select(col("g"), posexplode(col("s")).as(Seq("i", "v")))
    val exploded = vecs.select(col("g"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("g", "i").agg(sum("v").as("v"))
    assert(native.exceptAll(exploded).isEmpty && exploded.exceptAll(native).isEmpty)
    assert(native.queryExecution.executedPlan.toString.contains("partial_vec_sum_agg"))
  }

  test("vec_min_agg/vec_max_agg equal the exploded per-component extremes") {
    val vecs = Tables.load(spark, SparkTestSession.sfDir, "embeddings")
      .select((col("vec_id") % 7).as("g"), expr("vec_quantize(embedding)").as("q"))
    val native = vecs.groupBy("g")
      .agg(expr("vec_min_agg(q)").as("mn"), expr("vec_max_agg(q)").as("mx"))
      .select(col("g"), posexplode(arrays_zip(col("mn"), col("mx"))).as(Seq("i", "v")))
      .select(col("g"), col("i"), col("v.mn"), col("v.mx"))
    val exploded = vecs.select(col("g"), posexplode(col("q")).as(Seq("i", "v")))
      .groupBy("g", "i").agg(min("v").as("mn"), max("v").as("mx"))
    assert(native.exceptAll(exploded).isEmpty && exploded.exceptAll(native).isEmpty)
    assert(native.queryExecution.executedPlan.toString.contains("partial_vec_min_agg"))
    // mixed dimensions fail loudly, not silently truncate
    val mixed = Seq(Array(1L, 2L), Array(1L, 2L, 3L)).toDF("q")
    val ex = intercept[Exception] {
      mixed.agg(expr("vec_min_agg(q)")).collect()
    }
    assert(ex.getMessage.contains("mixed vector dimensions") ||
      ex.getCause != null && ex.getCause.getMessage.contains("mixed vector dimensions"))
  }

  test("modal_run equals the sorted-run HOF fold on real docs and edge cases") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(200)
      .select(expr("split(text, ' ')").as("w"))
    val out = docs.select(
      expr("modal_run(w)").as("native"),
      expr(graft.ext.TextAnalysis.modalExpr("w")).as("hof")).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
    // ties (lexicographically-first winner), single element, empty array
    val edges = Seq(
      Seq("b", "a", "b", "a"),  // tie 2-2 → "a"
      Seq("z", "y", "z"),       // clear winner "z"
      Seq("only"),
      Seq.empty[String]).toDF("w")
    val eout = edges.select(
      expr("modal_run(w)").as("native"),
      expr(graft.ext.TextAnalysis.modalExpr("w")).as("hof")).collect()
    eout.foreach(r => assert(r.getStruct(0) === r.getStruct(1)))
    assert(eout(0).getStruct(0).getString(0) === "a")
    assert(eout(0).getStruct(0).getLong(1) === 2L)
    assert(eout(3).getStruct(0).isNullAt(0) && eout(3).getStruct(0).getLong(1) === 0L)
  }

  test("pq_codes equals the HOF distance-list argmin on real embeddings, incl. ties") {
    val e = Tables.load(spark, SparkTestSession.sfDir, "embeddings").limit(200)
    // a small 2-subspace, 3-codeword book with a deliberate duplicate
    // codeword (positions 1 and 2 identical) so the first-min tie rule is
    // exercised, plus a variable-width second subspace (2 codewords)
    val cb = "array(array(array(1L,2L), array(1L,2L), array(9L,9L)), " +
      "array(array(0L,0L), array(5L,5L)))"
    val q = e.select(col("vec_id"),
      expr("slice(vec_quantize(embedding), 1, 4)").as("q"))
    val out = q.select(
      expr(s"pq_codes(q, $cb, 2)").as("native"),
      expr(s"""transform(
              |  transform(sequence(0, 1), m ->
              |    transform(element_at($cb, m + 1), cw ->
              |      aggregate(sequence(1, 2), 0L, (acc, d) ->
              |        acc + (element_at(q, m * 2 + d) - element_at(cw, d))
              |            * (element_at(q, m * 2 + d) - element_at(cw, d))))),
              |  ds -> CAST(array_position(ds, array_min(ds)) AS INT))""".stripMargin).as("hof"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getSeq[Int](0) === r.getSeq[Int](1)))
    // every row minimizing on the duplicated codeword must report position
    // 1, never 2 — the tie rule the Lloyd training and oracles rely on
    assert(out.forall(_.getSeq[Int](0).head != 2))
  }

  test("vec_top_centroid equals the HOF argmax-cosine scores, incl. the first-max tie rule") {
    val e = Tables.load(spark, SparkTestSession.sfDir, "embeddings").limit(200)
    // 3 centroids with a deliberate DUPLICATE (positions 1 and 2 equal up
    // to scale — cosine is scale-invariant, so their scores tie exactly on
    // every row and the first index must win, as the HOF twin's
    // array_position(scores, array_max(scores)) guarantees)
    val cq = "array(array(10000L, 0L, 0L, 0L), array(0L, 10000L, 0L, 0L), " +
      "array(0L, 20000L, 0L, 0L))"
    val q = e.select(expr("slice(vec_quantize(embedding), 1, 4)").as("q"))
      .withColumn("nrm", expr("vec_dotl(q, q)"))
    val out = q.select(
      expr(s"vec_top_centroid(q, $cq)").as("native"),
      expr(
        s"""transform(sequence(0, 2), i ->
           |  vec_dotl(q, element_at($cq, i + 1))
           |    / (sqrt(CAST(nrm AS DOUBLE))
           |       * sqrt(CAST(element_at(transform($cq, v ->
           |           aggregate(v, 0L, (a, x) -> a + x * x)), i + 1) AS DOUBLE))))""".stripMargin)
        .as("scores"))
      .withColumn("hof_list", expr("CAST(array_position(scores, array_max(scores)) AS INT) - 1"))
      .withColumn("hof_cos", expr("array_max(scores)"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val native = r.getStruct(0)
      assert(native.getInt(0) === r.getAs[Int]("hof_list"))
      assert(native.getDouble(1) === r.getAs[Double]("hof_cos"))
      // the duplicated-direction tie can never report index 2
      assert(native.getInt(0) != 2)
    }
  }

  test("native expressions stay inside whole-stage codegen") {
    val e = Tables.load(spark, SparkTestSession.sfDir, "embeddings").limit(5)
    val plan = e.select(expr("vec_normq(embedding)").as("n"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [vecnormq"), plan)
  }
}
