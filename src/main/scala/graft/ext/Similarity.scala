package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2.8 E2).
  *
  * Scoring core (shared by both variants, and by
  * [[Dedup.embeddingCosine]]): vectors are quantized to integers
  * (round(x·10⁴)); dot products and norms are exact BIGINT sums; cosine is
  * a single IEEE division of exact integers — bit-identical across Spark
  * and the DuckDB oracle, so top-k ranking is fully deterministic (ties
  * broken by vec_id).
  */
object Similarity {

  /** (vec_id, raw embedding, quantized squared norm) — the dot products are
    * computed pairwise by the native vec_dotq expression. */
  private def quantized(embeddings: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    // small-file scan = one split; spread the corpus across cores (the
    // shuffle moves a few MB; at real scale file splits already parallelize)
    embeddings
      .repartition(embeddings.sparkSession.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding").as("q"))
      .withColumn("nrm", expr("vec_normq(q)"))
  }

  /** Brute-force cosine top-k: the exact baseline. The (small) query set is
    * broadcast against the full corpus — one scan of the big side, no
    * shuffle of it; ranking is a per-query-partition window (top-k heap
    * under AQE). At 1000 executors this is the classic "scan once, rank
    * locally" shape; the LSH variant below is the sub-linear path. */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val vecs = quantized(embeddings)
    val queries = vecs.filter(col("vec_id") < nQueries).toDF("query_id", "qq", "nq")
    val scored = vecs.toDF("vec_id", "qv", "nv")
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr("vec_dotq(qq, qv)"))
      .withColumn("cosine", expr("dot / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nv AS DOUBLE)))"))
    val rk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        expr("round(cosine, 6)").as("cosine"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic pseudo-random hyperplane table: `planes` rows of `dim`
    * integer coefficients in [-2³⁰, 2³⁰), from an LCG on the flat index.
    * Tiny (planes × dim rows) — always broadcast. */
  def hyperplanes(spark: SparkSession, planes: Int, dim: Int): DataFrame =
    spark.range(planes.toLong).toDF("p")
      .crossJoin(spark.range(dim.toLong).toDF("i"))
      .select(col("p"), col("i"),
        expr(s"(1103515245 * (p * $dim + i + 1) + 12345) % 2147483648 - 1073741824").as("v"))

  /** Sign-random-projection (SimHash-for-vectors) bucketed ANN — the scale
    * path. Each vector gets a `planes`-bit bucket id (sign of the exact
    * integer dot with each hyperplane); queries are compared only against
    * their own bucket, then reranked by exact cosine. With b planes the
    * expected bucket occupancy is n/2^b — the per-query work is bounded and
    * the whole pipeline is two hash-shuffles (bucket build, bucket join),
    * never a cross join. Recall is tunable via b and multi-probe; this is
    * the IVF-style tradeoff surface. */
  def lshTopK(embeddings: DataFrame, planes: Int = 4, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val spark = embeddings.sparkSession
    val dim = 64
    val flat = quantized(embeddings)
      .select(col("vec_id"), col("nrm"),
        posexplode(expr("transform(q, x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))"))
          .as(Seq("i", "x")))
    val dots = flat.join(broadcast(hyperplanes(spark, planes, dim)), "i")
      .groupBy("vec_id", "p").agg(sum(expr("x * v")).as("dot_p"))
    val buckets = dots.groupBy("vec_id")
      .agg(sum(expr("CASE WHEN dot_p > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(p AS INT)) ELSE 0 END"))
        .as("bucket"))
    val vecs = quantized(embeddings).join(buckets, "vec_id")
    val queries = vecs.filter(col("vec_id") < nQueries).toDF("query_id", "qq", "nq", "bucket")
    val rk = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
    vecs.toDF("vec_id", "qv", "nv", "bucket")
      .join(queries, "bucket")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("dot", expr("vec_dotq(qq, qv)"))
      .withColumn("cosine", expr("dot / (sqrt(CAST(nq AS DOUBLE)) * sqrt(CAST(nv AS DOUBLE)))"))
      .withColumn("rank", row_number().over(rk))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        expr("round(cosine, 6)").as("cosine"), col("bucket"))
      .orderBy("query_id", "rank")
  }
}
