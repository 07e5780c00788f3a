package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Soak driver for the r10 stored-index additions (kept tooling, not
  * library API): times the production probe paths against the
  * [[SoakGen]]-produced fixtures at sf1/sf10, next to the baseline each
  * one exists to beat. Modes:
  *
  *   bloom — [[graft.ext.BloomDedup]]: filter build over the historical
  *           doc slice, then the stateless literal-folded probe of the
  *           increment vs the join-based exact gate (distinct historical
  *           keys + left join) it replaces on the daily path;
  *   ivf   — [[graft.ext.Similarity]] IVF store: build + append, then the
  *           file-pruned stored probe vs the in-line [[Similarity.ivfTopK]]
  *           that re-assigns the whole corpus per query batch;
  *   winnow — [[graft.ext.TextAnalysis]] print store: build + append, then
  *           the stored probe vs the in-line
  *           [[TextAnalysis.winnowIncremental]] that re-winnows the whole
  *           historical corpus per run.
  *
  * Usage: runMain graft.StoreSoak <fixtureDir> [bloom|ivf|winnow]
  */
object StoreSoak {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[soak] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val mode = if (args.length > 1) args(1) else "bloom"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "bloom" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val hist = docs.filter(col("doc_id") % 7 =!= 0)
        val inc = docs.filter(col("doc_id") % 7 === 0)
        val (nh, ni) = (hist.count(), inc.count())
        println(s"[soak] $dir docs: history=$nh increment=$ni")
        val bytes = time(s"filter build over $nh docs")(
          graft.ext.BloomDedup.buildFilterBytes(hist, expectedItems = nh))
        println(f"[soak] filter bytes=${bytes.length} (${bytes.length * 8.0 / nh}%.1f bits/key)")
        for (rep <- 1 to 2)
          time(s"bloom probe rep$rep (stateless literal, no join)")(
            graft.ext.BloomDedup.probe(inc, bytes)
              .write.format("noop").mode("overwrite").save())
        for (rep <- 1 to 2)
          time(s"exact join gate rep$rep (distinct history keys + left join)")(
            inc.withColumn("k", substring(col("text"), 1, 80))
              .join(hist.select(substring(col("text"), 1, 80).as("k")).distinct()
                .withColumn("seen", lit(true)), Seq("k"), "left")
              .withColumn("exact_dup", coalesce(col("seen"), lit(false)))
              .drop("k", "seen")
              .write.format("noop").mode("overwrite").save())
      case "ivf" =>
        val embs = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = embs.count()
        val nList = math.ceil(math.sqrt(n.toDouble)).toInt
        println(s"[soak] $dir vecs=$n nList=$nList")
        val store = s"/tmp/soak_ivf_store_${n}"
        graft.ops.Scale.deleteRecursively(new java.io.File(store))
        time(s"store build ($n vecs, $nList lists)")(
          graft.ext.Similarity.buildIvfStore(
            embs.filter(col("vec_id") < n / 2), store, nList = nList))
        time(s"store append (${n - n / 2} vecs against frozen quantizer)")(
          graft.ext.Similarity.appendToIvfStore(
            embs.filter(col("vec_id") >= n / 2), store))
        val queries = embs.filter(col("vec_id") < 10)
        for (rep <- 1 to 2)
          time(s"stored probe rep$rep (file-pruned lists scan)")(
            graft.ext.Similarity.ivfAgainstStore(queries, store)
              .write.format("noop").mode("overwrite").save())
        for (rep <- 1 to 2)
          time(s"in-line ivfTopK rep$rep (re-assigns the corpus per batch)")(
            graft.ext.Similarity.ivfTopK(embs, nList = nList)
              .write.format("noop").mode("overwrite").save())
      case "winnow" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        val hist = docs.filter(col("doc_id") % 7 =!= 0)
        val inc = docs.filter(col("doc_id") % 7 === 0)
        println(s"[soak] $dir docs: history=${hist.count()} increment=${inc.count()}")
        val store = s"/tmp/soak_winnow_store_${dir.replace('/', '_')}"
        graft.ops.Scale.deleteRecursively(new java.io.File(store))
        time("store build (historical prints)")(
          graft.ext.TextAnalysis.buildWinnowStore(
            hist.filter(col("doc_id") % 2 === 1), store))
        time("store append (even half against live store)")(
          graft.ext.TextAnalysis.appendToWinnowStore(
            hist.filter(col("doc_id") % 2 === 0), store))
        for (rep <- 1 to 2)
          time(s"stored probe rep$rep (file-pruned print join)")(
            graft.ext.TextAnalysis.winnowAgainstStore(inc, store)
              .write.format("noop").mode("overwrite").save())
        for (rep <- 1 to 2)
          time(s"in-line incremental rep$rep (re-winnows history per run)")(
            graft.ext.TextAnalysis.winnowIncremental(docs)
              .write.format("noop").mode("overwrite").save())
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
