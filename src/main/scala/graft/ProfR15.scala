package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Optimization-round targeted profiler (guide §1): time isolated variants
  * of hot operators via the noop sink, with a result-fingerprint check so a
  * faster variant is only ever adopted when bit-identical. Not part of the
  * driver contract; plain stdout.
  *
  * Usage: runMain graft.ProfR15 <sfDir> <mode> [reps]
  */
object ProfR15 {

  def fingerprint(df: DataFrame): (String, Long) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val h = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(sum("h").as("s"), count(lit(1)).as("n")).head()
    (String.valueOf(h.get(0)), h.getLong(1))
  }

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  // ---- prototype: triangles via in-neighbor array intersection ----------
  def trianglesIntersect(edges: DataFrame, maxOutDeg: Option[Int] = None): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val dir = e
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("ddeg"))
      .localCheckpoint()
    val wedgeSrc = maxOutDeg match {
      case Some(k) =>
        dir.withColumn("rn", row_number().over(
            Window.partitionBy("src").orderBy(col("ddeg").asc, col("dst").asc)))
          .filter(col("rn") <= k).drop("rn")
      case None => dir
    }
    // in-neighbor lists under orientation (+cap): B[v] = {u : u->v kept}
    val inN = wedgeSrc.groupBy("dst").agg(collect_list("src").as("srcs"))
    // every oriented edge (v,w) closes the triangles whose apex u has both
    // v and w in its kept out-list: apexes = B[v] ∩ B[w]
    val closed = dir.select(col("src").as("v"), col("dst").as("w"))
      .join(broadcast(inN).toDF("v", "sv"), Seq("v"))
      .join(broadcast(inN).toDF("w", "sw"), Seq("w"))
      .select(col("v"), col("w"), array_intersect(col("sv"), col("sw")).as("apexes"))
      .filter(size(col("apexes")) > 0)
    val perNode = closed.select(explode(col("apexes")).as("id"), lit(1L).as("c"))
      .unionAll(closed.select(explode(array(col("v"), col("w"))).as("id"),
        size(col("apexes")).cast("long").as("c")))
      .groupBy("id").agg(sum("c").as("n_triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering", expr(
        "CASE WHEN degree >= 2 THEN round(2e0 * n_triangles / (degree * (degree - 1)), 6) ELSE 0e0 END"))
      .orderBy("doc_id")
  }

  // ---- prototype: triangles with materialized edge/dir relations --------
  // localCheckpoint gives the planner TRUE sizes (auto-BHJ when a side
  // fits; SMJ at scale) and collapses the replicated pair-gen subtree to
  // one execution. Wedge enumeration stays the src-keyed self-join.
  def trianglesCkpt(edges: DataFrame, maxOutDeg: Option[Int] = None,
                    adjWedges: Boolean = false): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = e.select(col("a").as("id")).unionAll(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
      .localCheckpoint()
    val dir = e
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("dst"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("ddeg"))
      .localCheckpoint()
    val wedgeSrc = maxOutDeg match {
      case Some(k) =>
        dir.withColumn("rn", row_number().over(
            Window.partitionBy("src").orderBy(col("ddeg").asc, col("dst").asc)))
          .filter(col("rn") <= k).drop("rn")
      case None => dir
    }
    val wedges =
      if (!adjWedges) {
        wedgeSrc.select(col("src"), col("dst").as("v"), col("ddeg").as("dv"))
          .join(wedgeSrc.select(col("src"), col("dst").as("w"), col("ddeg").as("dw")), "src")
          .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
          .select(col("src"), col("v"), col("w"))
      } else {
        // map-side wedge generation from per-apex sorted adjacency arrays:
        // one small shuffle (collect_list per src), wedges exploded in
        // codegen — no self-join exchange of the edge relation at all
        val adj = wedgeSrc
          .groupBy("src")
          .agg(sort_array(collect_list(struct(col("ddeg"), col("dst")))).as("outs"))
        adj.select(col("src"), explode(expr(
          """flatten(transform(outs, (x, i) ->
            |  transform(slice(outs, i + 2, size(outs)), y ->
            |    struct(x.dst AS v, y.dst AS w))))""".stripMargin)).as("p"))
          .select(col("src"), col("p.v").as("v"), col("p.w").as("w"))
      }
    val tri = wedges.join(
      dir.select(col("dst").as("w"), col("src").as("v")), Seq("v", "w"))
      .select(col("src").as("u"), col("v"), col("w"))
    val triPerNode = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.join(triPerNode, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering", expr(
        "CASE WHEN degree >= 2 THEN round(2e0 * n_triangles / (degree * (degree - 1)), 6) ELSE 0e0 END"))
      .orderBy("doc_id")
  }

  // ---- prototype: clusters with k pointer jumps per propagation round ---
  def clustersJump(pairs: DataFrame, jumps: Int): (DataFrame, Int) = {
    val p = pairs.select(col("a"), col("b"))
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val init = p.select(explode(array(
        struct(col("a").as("id"), col("b").as("nbr")),
        struct(col("b").as("id"), col("a").as("nbr")))).as("e"))
      .select(col("e.id").as("id"), least(col("e.id"), col("e.nbr")).as("label"))
      .groupBy("id").agg(min("label").as("label"))
      .localCheckpoint()
    val contracted = p
      .join(init.select(col("id").as("a"), col("label").as("ca")), "a")
      .join(init.select(col("id").as("b"), col("label").as("cb")), "b")
      .filter(col("ca") =!= col("cb"))
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"))
      .distinct()
      .localCheckpoint()
    val cEdges = contracted.select(col("a").as("id"), col("b").as("nbr"))
      .unionAll(contracted.select(col("b").as("id"), col("a").as("nbr")))
    val cInit = cEdges
      .select(col("id"), least(col("id"), col("nbr")).as("label"))
      .groupBy("id").agg(min("label").as("label"))
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("label").cast("decimal(38,0)"))).head().get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    }
    var labels = cInit
    var prevSum = labelSum(labels)
    var rounds = 0
    var converged = labels.isEmpty
    while (!converged) {
      var cur = cEdges.join(labels, "id")
        .select(col("nbr").as("id"), col("label"))
        .unionAll(labels)
        .groupBy("id").agg(min("label").as("label"))
      for (_ <- 1 to jumps) {
        cur = cur.join(
            cur.select(col("id").as("label"), col("label").as("label2")),
            Seq("label"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("label2"), col("label"))).as("label"))
      }
      val next = cur.localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      rounds += 1
    }
    val out = init.join(
        labels.select(col("id").as("label"), col("label").as("l2")),
        Seq("label"), "left")
      .select(col("id"), coalesce(col("l2"), col("label")).as("label"))
    (out.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy("doc_id"), rounds + 1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")

    mode match {
      case "tri" =>
        // warm scan + codegen
        time("warm:pairs")(noop(ext.Dedup.simhashPairs(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r base:triangles(pairs)")(
            noop(ext.Graph.triangles(ext.Dedup.simhashPairs(docs))))
          time(s"rep$r intersect:triangles(pairs)")(
            noop(trianglesIntersect(ext.Dedup.simhashPairs(docs))))
          time(s"rep$r base:triangles_capped")(
            noop(ext.Graph.triangles(
              ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8))))
          time(s"rep$r intersect:triangles_capped")(
            noop(trianglesIntersect(
              ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8))))
        }
        val fpB = fingerprint(ext.Graph.triangles(ext.Dedup.simhashPairs(docs)))
        val fpI = fingerprint(trianglesIntersect(ext.Dedup.simhashPairs(docs)))
        println(s"[prof] fingerprint base=$fpB intersect=$fpI equal=${fpB == fpI}")
        val fpBc = fingerprint(ext.Graph.triangles(
          ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8)))
        val fpIc = fingerprint(trianglesIntersect(
          ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8)))
        println(s"[prof] fingerprint capped base=$fpBc intersect=$fpIc equal=${fpBc == fpIc}")

      case "tri2" =>
        time("warm:pairs")(noop(ext.Dedup.simhashPairs(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r base")(
            noop(ext.Graph.triangles(ext.Dedup.simhashPairs(docs))))
          time(s"rep$r ckpt-smj")(
            noop(trianglesCkpt(ext.Dedup.simhashPairs(docs))))
          time(s"rep$r ckpt-adj")(
            noop(trianglesCkpt(ext.Dedup.simhashPairs(docs), adjWedges = true)))
          time(s"rep$r capped base")(
            noop(ext.Graph.triangles(
              ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8))))
          time(s"rep$r capped ckpt-smj")(
            noop(trianglesCkpt(
              ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8))))
          time(s"rep$r capped ckpt-adj")(
            noop(trianglesCkpt(
              ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8),
              adjWedges = true)))
        }
        val fB = fingerprint(ext.Graph.triangles(ext.Dedup.simhashPairs(docs)))
        val fS = fingerprint(trianglesCkpt(ext.Dedup.simhashPairs(docs)))
        val fA = fingerprint(trianglesCkpt(ext.Dedup.simhashPairs(docs), adjWedges = true))
        println(s"[prof] fp base=$fB smj=$fS adj=$fA eq=${fB == fS && fB == fA}")
        val fBc = fingerprint(ext.Graph.triangles(
          ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8)))
        val fAc = fingerprint(trianglesCkpt(
          ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64)), maxOutDeg = Some(8),
          adjWedges = true))
        println(s"[prof] fp capped base=$fBc adj=$fAc eq=${fBc == fAc}")

      case "tri_parts" =>
        time("warm:pairs")(noop(ext.Dedup.simhashPairs(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r pairs-only")(noop(ext.Dedup.simhashPairs(docs)))
          val p = time(s"rep$r pairs.localCheckpoint") {
            ext.Dedup.simhashPairs(docs).localCheckpoint()
          }
          time(s"rep$r triangles(ckpt-pairs)")(noop(ext.Graph.triangles(p)))
          time(s"rep$r intersect(ckpt-pairs)")(noop(trianglesIntersect(p)))
        }

      case "comp" =>
        val pairs = ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64))
        time("warm:pairs_capped")(noop(pairs))
        for (r <- 1 to reps) {
          time(s"rep$r components(base)")(noop(ext.Graph.components(pairs)))
          val (_, rounds) = time(s"rep$r clustersWithRounds") {
            val (df, n) = ext.Dedup.clustersWithRounds(pairs); noop(df); (df, n)
          }
          println(s"[prof] rounds=$rounds")
        }

      case "comp2" =>
        val pairs = ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64))
        time("warm:pairs_capped")(noop(pairs))
        for (r <- 1 to reps) {
          time(s"rep$r clusters(base)") {
            val (df, n) = ext.Dedup.clustersWithRounds(pairs); noop(df)
            println(s"[prof] base rounds=$n")
          }
          time(s"rep$r clusters(jump2)") {
            val (df, n) = clustersJump(pairs, 2); noop(df)
            println(s"[prof] jump2 rounds=$n")
          }
          time(s"rep$r clusters(jump3)") {
            val (df, n) = clustersJump(pairs, 3); noop(df)
            println(s"[prof] jump3 rounds=$n")
          }
        }
        val fB = fingerprint(ext.Dedup.clustersWithRounds(pairs)._1)
        val f2 = fingerprint(clustersJump(pairs, 2)._1)
        val f3 = fingerprint(clustersJump(pairs, 3)._1)
        println(s"[prof] fp base=$fB j2=$f2 j3=$f3 eq=${fB == f2 && fB == f3}")

      case "comp3" =>
        val pairs = ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64))
        time("warm:pairs_capped")(noop(pairs))
        val p = time("p.ckpt")(pairs.select(col("a"), col("b")).localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
        println(s"[prof] pairs=${p.count()}")
        val init = time("init") {
          p.select(explode(array(
              struct(col("a").as("id"), col("b").as("nbr")),
              struct(col("b").as("id"), col("a").as("nbr")))).as("e"))
            .select(col("e.id").as("id"), least(col("e.id"), col("e.nbr")).as("label"))
            .groupBy("id").agg(min("label").as("label"))
            .localCheckpoint()
        }
        println(s"[prof] nodes=${init.count()}")
        val contracted = time("contract") {
          p.join(init.select(col("id").as("a"), col("label").as("ca")), "a")
            .join(init.select(col("id").as("b"), col("label").as("cb")), "b")
            .filter(col("ca") =!= col("cb"))
            .select(least(col("ca"), col("cb")).as("a"),
              greatest(col("ca"), col("cb")).as("b"))
            .distinct()
            .localCheckpoint()
        }
        println(s"[prof] contracted=${contracted.count()}")
        // second-level contraction: propagate once on the contracted graph,
        // then contract again
        val cEdges = contracted.select(col("a").as("id"), col("b").as("nbr"))
          .unionAll(contracted.select(col("b").as("id"), col("a").as("nbr")))
        val cInit = time("cInit") {
          cEdges.select(col("id"), least(col("id"), col("nbr")).as("label"))
            .groupBy("id").agg(min("label").as("label")).localCheckpoint()
        }
        val c2 = time("contract2") {
          contracted.join(cInit.select(col("id").as("a"), col("label").as("ca")), "a")
            .join(cInit.select(col("id").as("b"), col("label").as("cb")), "b")
            .filter(col("ca") =!= col("cb"))
            .select(least(col("ca"), col("cb")).as("a"),
              greatest(col("ca"), col("cb")).as("b"))
            .distinct().localCheckpoint()
        }
        println(s"[prof] contracted2=${c2.count()}")
        val c2e = c2.select(col("a").as("id"), col("b").as("nbr"))
          .unionAll(c2.select(col("b").as("id"), col("a").as("nbr")))
        val c2i = c2e.select(col("id"), least(col("id"), col("nbr")).as("label"))
          .groupBy("id").agg(min("label").as("label")).localCheckpoint()
        val c3 = time("contract3") {
          c2.join(c2i.select(col("id").as("a"), col("label").as("ca")), "a")
            .join(c2i.select(col("id").as("b"), col("label").as("cb")), "b")
            .filter(col("ca") =!= col("cb"))
            .select(least(col("ca"), col("cb")).as("a"),
              greatest(col("ca"), col("cb")).as("b"))
            .distinct().localCheckpoint()
        }
        println(s"[prof] contracted3=${c3.count()}")

      case "uf" =>
        val pairs = ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64))
          .select(col("a"), col("b")).localCheckpoint()
        val labs = ext.Dedup.clusters(pairs)
        val l2 = labs.select(col("doc_id").as("a"), col("cluster_id").as("ca"))
        val l3 = labs.select(col("doc_id").as("b"), col("cluster_id").as("cb"))
        val bad = pairs.join(l2, "a").join(l3, "b")
          .filter(col("ca") =!= col("cb"))
        println(s"[prof] edges=${pairs.count()} nodes=${labs.count()} mismatched-edges=${bad.count()}")
        val singleton = labs.groupBy("cluster_id").count().filter(col("count") === 1)
        println(s"[prof] singleton-components=${singleton.count()}")
        val missing = pairs.select(col("a").as("doc_id"))
          .unionAll(pairs.select(col("b").as("doc_id"))).distinct()
          .join(labs, Seq("doc_id"), "left_anti")
        println(s"[prof] nodes-missing-from-labs=${missing.count()}")

      case "uf2" =>
        import spark.implicits._
        val pairs = ext.Dedup.simhashPairs(docs, maxBandBucket = Some(64))
          .select(col("a"), col("b")).localCheckpoint()
        val init = pairs.select(explode(array(
            struct(col("a").as("id"), col("b").as("nbr")),
            struct(col("b").as("id"), col("a").as("nbr")))).as("e"))
          .select(col("e.id").as("id"), least(col("e.id"), col("e.nbr")).as("label"))
          .groupBy("id").agg(min("label").as("label"))
          .localCheckpoint()
        val contracted = pairs
          .join(init.select(col("id").as("a"), col("label").as("ca")), "a")
          .join(init.select(col("id").as("b"), col("label").as("cb")), "b")
          .filter(col("ca") =!= col("cb"))
          .select(least(col("ca"), col("cb")).as("a"),
            greatest(col("ca"), col("cb")).as("b"))
          .distinct()
          .localCheckpoint()
        println(s"[prof] contracted=${contracted.count()} parts=${contracted.rdd.getNumPartitions}")
        val uf = contracted.select(col("a"), col("b")).as[(Long, Long)]
          .coalesce(1)
          .mapPartitions { it =>
            val parent = scala.collection.mutable.HashMap.empty[Long, Long]
            def find(x: Long): Long = {
              var r = x
              while (parent.getOrElse(r, r) != r) r = parent(r)
              var c = x
              while (parent.getOrElse(c, c) != r) {
                val n = parent(c); parent(c) = r; c = n
              }
              r
            }
            it.foreach { case (a, b) =>
              val ra = find(a); val rb = find(b)
              if (ra != rb) {
                val lo = math.min(ra, rb); val hi = math.max(ra, rb)
                parent(hi) = lo
                if (!parent.contains(lo)) parent(lo) = lo
              } else if (!parent.contains(ra)) parent(ra) = ra
            }
            parent.keysIterator.map(k => (k, find(k))).toList.iterator
          }.toDF("id", "label").localCheckpoint()
        println(s"[prof] uf-rows=${uf.count()} uf-parts-src=${contracted.rdd.getNumPartitions}")
        val cEdges = contracted.select(col("a").as("id"), col("b").as("nbr"))
          .unionAll(contracted.select(col("b").as("id"), col("a").as("nbr")))
        val cInit = cEdges
          .select(col("id"), least(col("id"), col("nbr")).as("label"))
          .groupBy("id").agg(min("label").as("label"))
          .localCheckpoint()
        println(s"[prof] cinit-rows=${cInit.count()}")
        // reference fixpoint by brute joins (no private access): iterate
        var ref = cInit
        var changed = 1L
        while (changed > 0) {
          val nxt = cEdges.join(ref, "id")
            .select(col("nbr").as("id"), col("label"))
            .unionAll(ref)
            .groupBy("id").agg(min("label").as("label")).localCheckpoint()
          changed = nxt.as("n").join(ref.as("o"), Seq("id"))
            .filter(col("n.label") =!= col("o.label")).count()
          ref = nxt
        }
        println(s"[prof] ref-rows=${ref.count()}")
        val diff = uf.as("u").join(ref.as("r"), Seq("id"))
          .filter(col("u.label") =!= col("r.label"))
        println(s"[prof] diff=${diff.count()}")
        diff.orderBy("id").show(10, false)
        println("[prof] nodes missing from uf:")
        cInit.join(uf, Seq("id"), "left_anti").orderBy("id").show(50, false)
        contracted.write.mode("overwrite").parquet("/tmp/contracted_debug")
        println("[prof] contracted edges written to /tmp/contracted_debug")

      case "ufjvm" =>
        val edges = spark.read.parquet("/tmp/contracted_debug")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        def run(lazyIter: Boolean): Int = {
          val parent = scala.collection.mutable.HashMap.empty[Long, Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != r) {
              val n = parent(c); parent(c) = r; c = n
            }
            r
          }
          edges.foreach { case (a, b) =>
            val ra = find(a); val rb = find(b)
            if (ra != rb) {
              val lo = math.min(ra, rb); val hi = math.max(ra, rb)
              parent(hi) = lo
              if (!parent.contains(lo)) parent(lo) = lo
            } else if (!parent.contains(ra)) parent(ra) = ra
          }
          println(s"[prof] keys-before-emit=${parent.size}")
          if (lazyIter) parent.keysIterator.map(k => (k, find(k))).toList.size
          else {
            val ks = parent.keys.toArray
            ks.iterator.map(k => (k, find(k))).toList.size
          }
        }
        println(s"[prof] lazy=${run(true)} safe=${run(false)}")

      // in-run A/B of the contentious r15 localCheckpoints: each "old"
      // variant is the pre-r15 shape inlined here
      case "ab" =>
        import org.apache.spark.sql.DataFrame
        def langIdOld(docs: DataFrame): DataFrame = {
          val bg = docs
            .select(col("doc_id"), col("lang"), expr("split(text, ' ')").as("w"))
            .select(col("doc_id"), col("lang"),
              explode(expr(
                "transform(sequence(1, size(w) - 1, 1), i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
                .as("bigram"))
          val train = bg.filter(col("doc_id") % 5 =!= 0)
          val test = bg.filter(col("doc_id") % 5 === 0)
          val perLang = train.groupBy("lang", "bigram").agg(count(lit(1)).as("cnt"))
          val langTot = train.groupBy("lang").agg(count(lit(1)).as("n_l"))
          val perBg = train.groupBy("bigram").agg(count(lit(1)).as("cnt_all"))
          val totRow = train.agg(count(lit(1)).as("tot"))
          val weights = perBg.crossJoin(broadcast(langTot))
            .join(perLang, Seq("bigram", "lang"), "left")
            .na.fill(0L, Seq("cnt"))
            .crossJoin(broadcast(totRow))
            .select(col("bigram"), col("lang"),
              expr("""CAST(round(1000 * (1000000.0 * cnt / n_l - 1000000.0 * cnt_all / tot)
                     |  / (1000000.0 * cnt / n_l + 1000000.0 * cnt_all / tot + 1)) AS BIGINT)""".stripMargin)
                .as("w"))
          val testBg = test.select(col("doc_id"), col("lang").as("actual"), col("bigram")).distinct()
          val scores = testBg.join(weights.withColumnRenamed("lang", "cand"), Seq("bigram"))
            .groupBy(col("doc_id"), col("actual"), col("cand"))
            .agg(sum(col("w")).as("score"))
          val rk = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand").asc)
          scores.withColumn("rn", row_number().over(rk))
            .filter(col("rn") === 1)
            .select(col("doc_id"), col("cand").as("pred_lang"), col("actual"),
              when(col("cand") === col("actual"), lit(1)).otherwise(lit(0)).as("correct"))
            .orderBy("doc_id")
        }
        time("warm")(noop(ext.TextAnalysis.langId(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r langid OLD")(noop(langIdOld(docs)))
          time(s"rep$r langid NEW")(noop(ext.TextAnalysis.langId(docs)))
        }
        val embs = Tables.load(spark, sfDir, "embeddings")
        def recallEvalOld(): DataFrame = {
          // pre-r15: no checkpoint on exact — emulate by rebuilding exact
          // per reference, which is what the lazy plan did
          val exact = ext.Similarity.bruteForceTopK(embs, 10, 5)
            .select(col("query_id"), col("neighbor_id"))
          val methods = Seq(
            "ivf" -> ext.Similarity.ivfTopK(embs, 10, 5),
            "lsh" -> ext.Similarity.lshTopK(embs, 10, 5))
          val expected = exact.agg(count(lit(1)).as("n_expected"))
          methods.map { case (name, approx) =>
              exact.join(approx.select(col("query_id"), col("neighbor_id")),
                  Seq("query_id", "neighbor_id"), "left_semi")
                .agg(count(lit(1)).as("hits"))
                .select(lit(name).as("method"), col("hits"))
            }
            .reduce(_ unionAll _)
            .crossJoin(broadcast(expected))
            .withColumn("recall", expr("round(hits / n_expected, 6)"))
            .orderBy("method")
        }
        for (r <- 1 to reps) {
          time(s"rep$r recall_eval OLD")(noop(recallEvalOld()))
          time(s"rep$r recall_eval NEW")(noop(ext.Similarity.recallEval(embs)))
        }
        def ngramJaccardOld(docs: DataFrame): DataFrame = {
          val w = Window.partitionBy("shingle")
          val sh = ext.Dedup.shingleIndex(docs, 3)
            .withColumn("df", count(lit(1)).over(w))
            .filter(col("df") <= 50)
            .select("doc_id", "shingle")
          val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
          val inter = sh.toDF("a", "shingle")
            .join(sh.toDF("b", "shingle"), "shingle")
            .filter(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("c"))
          inter
            .join(sizes.toDF("a", "na"), "a")
            .join(sizes.toDF("b", "nb"), "b")
            .withColumn("jaccard", expr("c / (na + nb - c)"))
            .filter(col("jaccard") >= 0.5)
            .select(col("a"), col("b"), expr("round(jaccard, 6)").as("jaccard"))
            .orderBy("a", "b")
        }
        for (r <- 1 to reps) {
          time(s"rep$r ngram_jaccard OLD")(noop(ngramJaccardOld(docs)))
          time(s"rep$r ngram_jaccard NEW")(noop(ext.Dedup.ngramJaccard(docs)))
        }
        println("[prof] ab done")

      case "ab2" =>
        import org.apache.spark.sql.DataFrame
        def bigramCeOld(docs: DataFrame): DataFrame = {
          val w = docs.repartition(32).select(col("doc_id"), expr("split(text, ' ')").as("w"))
          val toks = w.select(col("doc_id"), explode(col("w")).as("token"))
          val uni = toks.groupBy("token").agg(count(lit(1)).as("uf"))
          val total = uni.agg(sum("uf").cast("long").as("total"))
          val big = w.filter(expr("size(w) >= 2"))
            .select(col("doc_id"), explode(expr(
              """transform(sequence(1, size(w) - 1), i ->
                |  struct(element_at(w, i) AS prev, element_at(w, i + 1) AS cur))""".stripMargin))
              .as("bg"))
            .select(col("doc_id"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
          val bf = big.groupBy("prev", "cur").agg(count(lit(1)).as("bf"))
          big.join(bf, Seq("prev", "cur"))
            .join(uni.select(col("token").as("prev"), col("uf").as("cf")), "prev")
            .join(uni.select(col("token").as("cur"), col("uf").as("uf")), "cur")
            .crossJoin(broadcast(total))
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_bigrams"),
              sum(expr(s"ln(0.75e0 * (bf / cf) + 0.25e0 * (uf / total))")).as("s"))
            .select(col("doc_id"), col("n_bigrams"),
              expr("round(-s / n_bigrams, 6)").as("ce_nats"))
            .orderBy("doc_id")
        }
        time("warm")(noop(ext.TextAnalysis.bigramCE(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r bigram_ce OLD")(noop(bigramCeOld(docs)))
          time(s"rep$r bigram_ce NEW")(noop(ext.TextAnalysis.bigramCE(docs)))
        }
        def calibOld(docs: DataFrame): DataFrame = {
          val lab = ext.TextAnalysis.gopherLabels(docs)
          val weights = ext.TextAnalysis.qualityTrain(docs, lab.filter(col("doc_id") % 5 =!= 0), 256)
          ext.TextAnalysis.qualityScoreWith(docs, weights, 256)
            .filter(col("doc_id") % 5 === 0)
            .join(lab, "doc_id")
            .withColumn("bin", expr(s"CAST(floor(score / 1000.0) AS BIGINT)"))
            .groupBy("bin").agg(
              count(lit(1)).cast("long").as("n_docs"),
              sum("label").cast("long").as("n_pass"))
            .select(col("bin"), (col("bin") * 1000L).as("bin_lo"),
              col("n_docs"), col("n_pass"),
              expr("round(n_pass / CAST(n_docs AS DOUBLE), 6)").as("pass_rate"))
            .orderBy("bin")
        }
        for (r <- 1 to reps) {
          time(s"rep$r quality_calibration OLD")(noop(calibOld(docs)))
          time(s"rep$r quality_calibration NEW")(noop(ext.TextAnalysis.qualityCalibration(docs)))
        }
        println("[prof] ab2 done")

      case "ab3" =>
        import org.apache.spark.sql.DataFrame
        def spansOld(docs: DataFrame, k: Int = 8): DataFrame = {
          graft.functions.GraftFunctions.register(docs.sparkSession)
          val base = docs.repartition(32).select(col("doc_id"), col("text"))
            .withColumn("n_words", expr("size(split(text, ' '))").cast("long"))
          val wins = base.filter(col("n_words") >= k)
            .select(col("doc_id"), posexplode(expr(s"shingle_hash60_pos(text, $k)")))
            .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("h"))
          val dup = wins.groupBy("h")
            .agg(countDistinct(col("doc_id")).as("nd"))
            .filter(col("nd") >= 2).select("h")
          val hits = wins.join(dup, "h").select("doc_id", "pos")
          val wo = Window.partitionBy("doc_id").orderBy("pos")
          val spans = hits
            .withColumn("new_span",
              when(col("pos") - lag(col("pos"), 1).over(wo) <= k, 0).otherwise(1))
            .withColumn("span_id", sum(col("new_span")).over(
              wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy("doc_id", "span_id")
            .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("nw"))
          val per = spans.groupBy("doc_id")
            .agg(count(lit(1)).as("n_spans"), sum("nw").as("n_dup_windows"),
              sum(col("hi") - col("lo") + k).as("n_dup_tokens"))
          base.select("doc_id", "n_words").join(per, Seq("doc_id"), "left")
            .select(col("doc_id"), col("n_words"),
              coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
              coalesce(col("n_spans"), lit(0L)).as("n_spans"),
              coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
            .withColumn("dup_frac", expr("round(n_dup_tokens / n_words, 6)"))
            .orderBy("doc_id")
        }
        time("warm")(noop(ext.Dedup.substringSpans(docs)))
        for (r <- 1 to reps) {
          time(s"rep$r spans OLD")(noop(spansOld(docs)))
          time(s"rep$r spans NEW")(noop(ext.Dedup.substringSpans(docs)))
        }
        println("[prof] ab3 done")

      case "chain" =>
        import spark.implicits._
        val n = 5000
        val chain = spark.range(1, n).select(col("id").as("a"), (col("id") + 1).as("b"))
        for (j <- Seq(1, 2, 3)) {
          val t0 = System.nanoTime()
          val (df, r) = clustersJump(chain, j)
          noop(df)
          println(f"[prof] chain jumps=$j rounds=$r  ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        }
        val (dfB, rB) = ext.Dedup.clustersWithRounds(chain)
        noop(dfB)
        println(s"[prof] chain base rounds=$rB")

      case "pr" =>
        val pairs = ext.Dedup.simhashPairs(docs)
        time("warm:pairs")(noop(pairs))
        for (r <- 1 to reps) {
          time(s"rep$r pagerank(base)")(noop(ext.Graph.pagerank(pairs)))
          val p = time(s"rep$r pairs.ckpt")(pairs.localCheckpoint())
          time(s"rep$r pagerank(ckpt-pairs)")(noop(ext.Graph.pagerank(p)))
        }

      case other =>
        System.err.println(s"unknown mode $other")
    }
    spark.stop()
  }
}
