package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class ExtTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("quality metrics on a known document") {
    val out = TextAnalysis.quality(docsDf(1L -> "the cat sat on the mat")).head()
    assert(out.getAs[Int]("n_chars") === 22)
    assert(out.getAs[Int]("n_words") === 6)
    assert(out.getAs[Int]("n_distinct_words") === 5)   // 'the' twice
    assert(out.getAs[Int]("n_stopwords") === 2)
    assert(math.abs(out.getAs[Double]("stopword_ratio") - 2.0 / 6) < 1e-6)
    // 6 words < 30 → saturating length factor = 6/30
    val expected = 100.0 * 5 / 6 * (6 / 30.0)
    assert(math.abs(out.getAs[Double]("quality_score") - expected) < 1e-4)
  }

  test("token counts: ws vs BPE-ish regex") {
    val out = TextAnalysis.tokenCounts(docsDf(1L -> "abc 123 x-y")).head()
    assert(out.getAs[Int]("ws_tokens") === 3)
    // abc | 123 | x | - | y
    assert(out.getAs[Int]("bpe_tokens") === 5)
    assert(out.getAs[Int]("distinct_tokens") === 3)
  }

  test("repetition: modal token/bigram with lexicographic tie-break, exact ratios") {
    // "b a b a b": tokens {b:3, a:2} → top b; bigrams {b a:2, a b:2} → tie,
    // lexicographically first is "a b"
    val out = TextAnalysis.repetition(docsDf(1L -> "b a b a b")).head()
    assert(out.getAs[Int]("n_tokens") === 5)
    assert(out.getAs[String]("top_token") === "b")
    assert(out.getAs[Long]("top_token_count") === 3L)
    assert(math.abs(out.getAs[Double]("top_token_ratio") - 0.6) < 1e-9)
    assert(out.getAs[String]("top_bigram") === "a b")
    assert(out.getAs[Long]("top_bigram_count") === 2L)
    assert(math.abs(out.getAs[Double]("top_bigram_ratio") - 0.5) < 1e-9)
    // 5 tokens, 2 distinct → dup ratio 0.6
    assert(math.abs(out.getAs[Double]("dup_token_ratio") - 0.6) < 1e-9)
  }

  test("repetition modal fold equals a reference count on 200 random docs") {
    // the sorted-run fold is the subtle part — check it against a plain
    // count-then-argmax reference over seeded random token lists, including
    // many ties (tiny vocab)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val docs = (1L to 200L).map { id =>
      id -> Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val out = TextAnalysis.repetition(docsDf(docs: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").toSeq
      def modal(gs: Seq[String]): (String, Long) = {
        val counts = gs.groupBy(identity).view.mapValues(_.size.toLong)
        counts.toSeq.minBy { case (g, c) => (-c, g) }
      }
      val (tv, tc) = modal(toks)
      val (bv, bc) = modal(toks.sliding(2).map(_.mkString(" ")).toSeq)
      val r = out(id)
      assert(r.getAs[String]("top_token") === tv, s"doc $id: $text")
      assert(r.getAs[Long]("top_token_count") === tc, s"doc $id: $text")
      assert(r.getAs[String]("top_bigram") === bv, s"doc $id: $text")
      assert(r.getAs[Long]("top_bigram_count") === bc, s"doc $id: $text")
    }
  }

  test("repetition flags a degenerate doc and passes a diverse one") {
    val out = TextAnalysis.repetition(docsDf(
      1L -> "spam spam spam spam spam spam",
      2L -> "one two three four five six")).collect()
    val spam = out.find(_.getAs[Long]("doc_id") == 1L).get
    val good = out.find(_.getAs[Long]("doc_id") == 2L).get
    assert(spam.getAs[Double]("top_token_ratio") === 1.0)
    assert(spam.getAs[Double]("top_bigram_ratio") === 1.0)
    assert(good.getAs[Double]("dup_token_ratio") === 0.0)
    assert(math.abs(good.getAs[Double]("top_token_ratio") - 1.0 / 6) < 1e-6) // round(·, 6)
  }

  test("sourceDrift: identical-distribution source scores near 0, disjoint-vocab source high") {
    // s_same mirrors the combined distribution; s_diff uses a disjoint vocab
    val out = TextAnalysis.sourceDrift(docsSrcDf(
      (1L, "a b c a b c", "s_base"),
      (2L, "a b c a b c", "s_same"),
      (3L, "x y z x y z", "s_diff"))).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("l1_drift")).toMap
    // base/same each = 1/3 of corpus mass on {a,b,c} which holds 2/3 overall:
    // drift = |1/3-2/9|*3... just assert the ordering + bounds
    assert(out("s_diff") > out("s_same"))
    assert(out.values.forall(v => v >= 0.0 && v <= 2.0))
    // a source that IS the corpus drifts exactly 0
    val solo = TextAnalysis.sourceDrift(docsSrcDf((1L, "a b a c", "only"))).head()
    assert(solo.getAs[Double]("l1_drift") === 0.0)
  }

  test("sourceDrift counts absent tokens in closed form (hand-checked two-source case)") {
    // corpus: s1 = {a:2}, s2 = {b:2}; T=4, Ts=2 each.
    // drift(s1) = |2*4 - 2*2|/8 (a, present) + (4-2)*2/8 (absent mass) = 0.5 + 0.5 = 1.0
    val out = TextAnalysis.sourceDrift(docsSrcDf((1L, "a a", "s1"), (2L, "b b", "s2")))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("l1_drift")).toMap
    assert(out === Map("s1" -> 1.0, "s2" -> 1.0))
  }

  private def docsSrcDf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("compressRatio orders boilerplate below diverse prose and is deterministic") {
    val spammy = ("lorem ipsum dolor " * 30).trim       // repetitive phrases
    val diverse = (1 to 90).map(i => s"w${i}x$i").mkString(" ")
    val out = TextAnalysis.compressRatio(docsDf(1L -> spammy, 2L -> diverse))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("compress_ratio") < out(2L).getAs[Double]("compress_ratio"))
    assert(out(1L).getAs[Long]("deflate_len") > 0)
    assert(out(2L).getAs[Double]("compress_ratio") <= 1.1) // tiny docs may inflate slightly
    // deterministic across replans/partitionings
    val again = TextAnalysis.compressRatio(
      docsDf(1L -> spammy, 2L -> diverse).repartition(5)).collect()
    assert(again.map(_.toSeq).toSeq ===
      TextAnalysis.compressRatio(docsDf(1L -> spammy, 2L -> diverse)).collect().map(_.toSeq).toSeq)
  }

  test("compressRatioChecked flags every real-corpus doc sane and keeps byte_len exact") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = TextAnalysis.compressRatioChecked(docs)
    assert(out.columns.toSeq === Seq("doc_id", "byte_len", "ratio_sane"))
    assert(out.filter(col("ratio_sane") =!= 1).count() === 0L)
    // byte_len is the deterministic column the oracle hashes — exact match
    val mism = out.join(
      docs.select(col("doc_id"), expr("CAST(octet_length(text) AS BIGINT)").as("bl")), "doc_id")
      .filter(col("byte_len") =!= col("bl")).count()
    assert(mism === 0L)
  }

  test("winnow: identical docs share the full print set; disjoint docs share none") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    val out = TextAnalysis.winnow(docsDf(1L -> a, 2L -> a, 3L -> b)).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("n_prints"), r.getAs[String]("prints_md5"))).toMap
    assert(byId(1L) === byId(2L))                 // identical content → identical prints
    assert(byId(1L)._2 !== byId(3L)._2)           // disjoint content → different set
    // winnowing guarantee: prints kept ≈ 2/(w+1) of the 8 k-gram hashes, so
    // strictly fewer prints than k-grams, at least one
    assert(byId(1L)._1 >= 1 && byId(1L)._1 < 8)
  }

  test("native winnow_prints equals the SQL two-stage formulation on real docs") {
    // the oracle replays the SQL shape, so the native loop must be
    // value-identical on every doc — including short-doc edge cases
    // (< 3 tokens → empty; 3..6 tokens → one window) and empty text
    val spark0 = spark
    graft.functions.GraftFunctions.register(spark0)
    import spark0.implicits._
    val real = Tables.load(spark0, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val edge = Seq((9001L, ""), (9002L, "one"), (9003L, "one two"),
      (9004L, "one two three"), (9005L, "one two three four five six"))
      .toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val both = docs
      .withColumn("native", expr("winnow_prints(text, 3, 4)"))
      .withColumn("w", expr("split(text, ' ')"))
      .withColumn("hs", expr(TextAnalysis.posHashesExpr))
      .withColumn("sql", expr(TextAnalysis.printsExpr))
      .select("doc_id", "native", "sql")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
  }

  test("winnowPairs flags the shared-run pair and not the disjoint one") {
    // docs 1/2 share a 9-token run (≥ w+k-1 = 6 → guaranteed shared print);
    // doc 3 is disjoint. minShared=1 so the guarantee alone must fire.
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota"
    val out = TextAnalysis.winnowPairs(docsDf(
      1L -> s"$shared tail one here now",
      2L -> s"prefix words then $shared",
      3L -> "uno dos tres cuatro cinco seis siete ocho nueve diez"),
      minShared = 1).collect()
    assert(out.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSeq === Seq((1L, 2L)))
  }

  test("normalize canonicalizes case/punct/whitespace; variants share a fingerprint") {
    val out = TextAnalysis.normalize(docsDf(
      1L -> "Hello,  World! 42",
      2L -> "hello world 42",
      3L -> "unchanged text")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // case/punct/double-space variant and canonical form converge
    assert(byId(1L).getAs[String]("norm_md5") === byId(2L).getAs[String]("norm_md5"))
    assert(byId(1L).getAs[Int]("changed") === 1)
    assert(byId(2L).getAs[Int]("changed") === 0)
    assert(byId(3L).getAs[Int]("changed") === 0)
    assert(byId(1L).getAs[Int]("n_chars_norm") === "hello world 42".length)
    assert(byId(2L).getAs[String]("norm_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("hello world 42".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("native normalize_text equals the two-regex SQL formulation on real + edge docs") {
    val spark0 = spark
    graft.functions.GraftFunctions.register(spark0)
    import spark0.implicits._
    val real = Tables.load(spark0, SparkTestSession.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "!!!"),
      (9004L, "  Mixed   CASE &*() punct  42  "),
      (9005L, "tabs\tand\nnewlines stay-out"),
      (9006L, "ümlaut Σigma ﬁligature İstanbul"))
      .toDF("doc_id", "text")
    val both = real.unionByName(edge)
      .withColumn("native", expr("normalize_text(text)"))
      .withColumn("sql", expr(TextAnalysis.normalizeSqlExpr))
      .collect()
    both.foreach { r =>
      assert(r.getString(2) === r.getString(3), s"doc ${r.getLong(0)}: <${r.getString(1)}>")
    }
  }

  test("novelty: clone family scores 0, unique doc scores 1, short docs drop") {
    val clone = "alpha beta gamma delta epsilon zeta"
    val out = TextAnalysis.novelty(docsDf(
      1L -> clone, 2L -> clone,                  // every bigram shared → 0
      3L -> "uno dos tres cuatro cinco",         // all bigrams unique → 1
      4L -> "solo")).collect()                   // <2 tokens → no row
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Double]("novelty_ratio"))).toMap
    assert(byId.keySet === Set(1L, 2L, 3L))
    assert(byId(1L) === (5L, 0.0))
    assert(byId(2L) === (5L, 0.0))
    assert(byId(3L) === (4L, 1.0))
    // deterministic under repartitioning
    val again = TextAnalysis.novelty(docsDf(
      1L -> clone, 2L -> clone, 3L -> "uno dos tres cuatro cinco", 4L -> "solo")
      .repartition(7)).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("vocab ranks tokens by corpus frequency with exact share of total") {
    val out = TextAnalysis.vocab(docsDf(
      1L -> "a a a b b c",
      2L -> "a b z"), topK = 3).collect()
    // freqs: a=4, b=3, c=1, z=1 (total 9); top-3 tie at freq 1 → 'c' < 'z'
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
      r.getAs[Long]("freq"))).toSeq === Seq((1, "a", 4L), (2, "b", 3L), (3, "c", 1L)))
    assert(out.head.getAs[Double]("share") === 0.444444)
    // deterministic under repartitioning
    val again = TextAnalysis.vocab(
      docsDf(1L -> "a a a b b c", 2L -> "a b z").repartition(5), topK = 3).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("bpeMerges counts adjacent pairs with deterministic tie order") {
    val out = TextAnalysis.bpeMerges(docsDf(
      1L -> "a b a b c",
      2L -> "a b",
      3L -> "x"), topK = 3).collect()
    // pairs: (a,b)x3, (b,a)x1, (b,c)x1 — total 5; 1-token doc contributes none;
    // tie at n=1 breaks (b,a) < (b,c)
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[String]("lhs"),
      r.getAs[String]("rhs"), r.getAs[Long]("n"))).toSeq
      === Seq((1, "a", "b", 3L), (2, "b", "a", 1L), (3, "b", "c", 1L)))
    assert(out.head.getAs[Double]("share") === 0.6)
    // layout-independent
    val again = TextAnalysis.bpeMerges(docsDf(
      1L -> "a b a b c", 2L -> "a b", 3L -> "x").repartition(7), topK = 3).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }

  test("unigramCE: common-word docs score lower than rare-word docs, exactly") {
    // corpus: "a a a a b" + "c" -> freqs a=4, b=1, c=1, total=6
    val out = TextAnalysis.unigramCE(docsDf(1L -> "a a a a b", 2L -> "c")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("ce_nats"))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    val ce1 = -(4 * math.log(4.0 / 6) + math.log(1.0 / 6)) / 5
    val ce2 = -math.log(1.0 / 6)
    assert(byId(1L) === ((5L, r6(ce1))))
    assert(byId(2L) === ((1L, r6(ce2))))
    assert(byId(1L)._2 < byId(2L)._2) // common words -> lower CE
    // deterministic under repartitioning
    val again = TextAnalysis.unigramCE(
      docsDf(1L -> "a a a a b", 2L -> "c").repartition(5)).collect()
    assert(again.map(_.toSeq).toSeq === out.sortBy(_.getAs[Long]("doc_id")).map(_.toSeq).toSeq)
  }

  test("bigramCE interpolates bigram and unigram LMs; 1-token docs drop") {
    // corpus: "a b a b" + "c c" + "x" -> uni a=2 b=2 c=2 x=1 total=7
    // doc1 bigrams: (a,b)x2 bf=2, (b,a) bf=1; doc2: (c,c) bf=1; doc3: none
    val out = TextAnalysis.bigramCE(
      docsDf(1L -> "a b a b", 2L -> "c c", 3L -> "x")).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Double]("ce_nats"))).toMap
    def r6(d: Double) = math.rint(d * 1e6) / 1e6
    def p(bf: Long, cf: Long, uf: Long) = 0.75 * (bf.toDouble / cf) + 0.25 * (uf.toDouble / 7)
    val ce1 = -(2 * math.log(p(2, 2, 2)) + math.log(p(1, 2, 2))) / 3
    val ce2 = -math.log(p(1, 2, 2))
    assert(byId(1L) === ((3L, r6(ce1))))
    assert(byId(2L) === ((1L, r6(ce2))))
    assert(!byId.contains(3L)) // no bigram -> no row
    // repetitive text scores lower than a doc whose bigrams are rarer
    assert(byId(1L)._2 < byId(2L)._2 ||
      byId(1L)._2 === byId(2L)._2) // both contexts equally sized here
    // real corpus: every doc present (all >= 2 tokens), CE positive
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val real = TextAnalysis.bigramCE(docs)
    assert(real.count() === docs.count())
    assert(real.filter(col("ce_nats") <= 0).count() === 0)
  }

  test("curriculum buckets per-lang quality ntiles with remainder to early buckets") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    // 5 docs, 2 buckets -> ntile gives bucket1 3 docs, bucket2 2 docs;
    // quality_score is monotone in distinct-word share here
    val texts = Seq(
      1L -> "a a a a a a", // low score (1 distinct / 6)
      2L -> "a a a a a b",
      3L -> "a a a a b c",
      4L -> "a a a b c d",
      5L -> "a a b c d e")
    val df = texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val out = TextAnalysis.curriculum(df, nBuckets = 2).collect()
    assert(out.map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n_docs"))).toSeq
      === Seq((1, 3L), (2, 2L)))
    // bucket 1 holds the 3 worst (docs 1-3), bucket 2 the 2 best
    val b1 = out.head
    assert(b1.getAs[Long]("n_tokens") === 18L)
    assert(b1.getAs[Double]("max_score") < out.last.getAs[Double]("min_score"))
  }

  test("rolling fingerprint matches a reference computation and md5 is content hash") {
    val text = "ab c"
    val expected = text.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val out = TextAnalysis.fingerprint(docsDf(1L -> text)).head()
    assert(out.getAs[Long]("fp_rolling") === expected)
    assert(out.getAs[String]("fp_md5") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("dfIndex ranks per-doc terms by tf with lexicographic tiebreak and corpus df") {
    val df = docsDf(
      1L -> "b b b a a c",   // tf: b=3, a=2, c=1
      2L -> "a c c",         // tf: c=2, a=1
      3L -> "z z a")         // tf: z=2, a=1
    val out = TextAnalysis.dfIndex(df, topK = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1, "b", 3L, 1L),  // b appears in 1 doc
      (1L, 2, "a", 2L, 3L),  // a appears in all 3 docs
      (2L, 1, "c", 2L, 2L),  // c appears in docs 1 and 2
      (2L, 2, "a", 1L, 3L),
      (3L, 1, "z", 2L, 1L),
      (3L, 2, "a", 1L, 3L)))
  }

  test("langId classifies every held-out doc exactly once with a known language") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = TextAnalysis.langId(docs).collect()
    val heldOut = docs.filter(col("doc_id") % 5 === 0).count()
    assert(out.length.toLong === heldOut)
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(out.forall(r => langs.contains(r.getAs[String]("pred_lang"))))
    assert(out.forall(r => Set(0, 1).contains(r.getAs[Int]("correct"))))
  }

  test("langidConfusion partitions the held-out docs and recall is exact") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = TextAnalysis.langidConfusion(docs).collect()
    val heldOut = docs.filter(col("doc_id") % 5 === 0).count()
    // every held-out doc lands in exactly one confusion cell
    assert(out.map(_.getAs[Long]("n")).sum === heldOut)
    // per-actual cells sum to that class's total, and recall = n / n_actual
    out.groupBy(_.getAs[String]("actual")).foreach { case (_, cells) =>
      val tot = cells.head.getAs[Long]("n_actual")
      assert(cells.map(_.getAs[Long]("n")).sum === tot)
      cells.foreach { c =>
        assert(c.getAs[Double]("recall") ===
          math.rint(c.getAs[Long]("n").toDouble / tot * 1e6) / 1e6)
      }
    }
    // agrees with the per-doc prediction operator cell by cell
    val preds = TextAnalysis.langId(docs).collect()
    val expect = preds.groupBy(r => (r.getAs[String]("actual"), r.getAs[String]("pred_lang")))
      .view.mapValues(_.length.toLong).toMap
    assert(out.map(r => (r.getAs[String]("actual"), r.getAs[String]("pred_lang")) ->
      r.getAs[Long]("n")).toMap === expect)
  }

  test("chunk covers every token with size-stride overlap and exact counts") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents").limit(200)
    val out = TextAnalysis.chunk(docs).collect()
    val nTok = docs.selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .as[(Long, Int)].collect().toMap
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, chunks) =>
      val n = nTok(id)
      // one chunk per stride start below n
      assert(chunks.length === (n + 23) / 24, s"doc $id")
      // each chunk k spans tokens [k*24+1, min(k*24+32, n)] — clamped tail
      val sizes = chunks.sortBy(_.getAs[Int]("chunk_no")).map(_.getAs[Int]("n_tokens"))
      sizes.zipWithIndex.foreach { case (sz, k) =>
        assert(sz === math.min(32, n - k * 24), s"doc $id chunk $k")
      }
      // full coverage: the last chunk reaches token n
      assert((sizes.length - 1) * 24 + sizes.last === n, s"doc $id tail")
    }
  }

  test("nextToken emits the argmax head with pinned tie-breaks") {
    // context 'a': successors b(3), c(2), d(1), e(1) → top-3 = b, c, d
    // (d beats e on the token-asc tie); context cut keeps the 2 hottest
    val out = TextAnalysis.nextToken(docsDf(
      1L -> "a b a b a b a c a c a d a e",
      2L -> "x y x y z"), topContexts = 2, k = 3).collect()
    val byCtx = out.groupBy(_.getAs[String]("prev"))
    // hottest contexts by continuation count: 'a' (7), 'b' (3: 'b a' ×3)
    assert(byCtx.keySet === Set("a", "b"))
    val aTop = byCtx("a").sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("next_token"), r.getAs[Long]("n")))
    assert(aTop.toSeq === Seq(("b", 3L), ("c", 2L), ("d", 1L)))
    // p is n / ctx_total with ctx_total = all continuations of the context
    val aRows = byCtx("a")
    assert(aRows.forall(_.getAs[Long]("ctx_total") == 7L))
    assert(math.abs(aRows.head.getAs[Double]("p") - aRows.head.getAs[Long]("n") / 7.0) < 1e-6)
    // determinism under repartitioning, on the real fixture
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val a = TextAnalysis.nextToken(docs).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.nextToken(docs.repartition(17)).collect().map(_.toSeq).toSeq
    assert(a === b)
    // every context has contiguous ranks from 1
    a.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.map(_(1).asInstanceOf[Int]).sorted === (1 to rows.length).toSeq)
    }
  }

  test("tfidfTerms surfaces source-distinctive terms with the integer rarity weight") {
    // 'zebra' appears only in src A (df=1, rarity 1e6); 'the' spans both
    // sources (df=3, rarity 333333) — tf=2 'zebra' outranks tf=3 'the' in A
    val df = Seq(
      (1L, "A", "zebra zebra the the the"),
      (2L, "A", "x y"),
      (3L, "B", "the x"),
      (4L, "B", "the y")
    ).toDF("doc_id", "source", "text")
    val out = TextAnalysis.tfidfTerms(df, topK = 2).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(5)))
    val a = out.filter(_._1 == "A")
    assert(a.head === (("A", 1, "zebra", 2L * 1000000L)))
    assert(a(1)._3 === "the")
    assert(a(1)._4 === 3L * (1000000L / 3))
    // determinism under repartitioning on the real fixture
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val p = TextAnalysis.tfidfTerms(docs).collect().map(_.toSeq).toSeq
    val q = TextAnalysis.tfidfTerms(docs.repartition(17)).collect().map(_.toSeq).toSeq
    assert(p === q)
    // exactly topK contiguous ranks per source
    p.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.map(_(1).asInstanceOf[Int]).sorted === (1 to 10).toSeq)
    }
  }

  test("zipf: regression matches a driver-side least-squares on the fixture") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val row = TextAnalysis.zipf(docs).collect().head
    // driver-side reference: same ranks, plain double least squares
    val counts = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }
    val top = counts.take(1000)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log(i + 1.0), math.log(c.toDouble)) }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getAs[Long]("vocab_size") === counts.length.toLong)  // UNCAPPED vocab
    assert(row.getAs[Long]("n_points") === top.length.toLong)       // min(vocab, topK)
    assert(row.getAs[Long]("ranked_tokens") === top.map(_._2).sum)
    assert(math.abs(row.getAs[Double]("slope") - slope) <= 1e-5,
      s"slope ${row.getAs[Double]("slope")} vs $slope")
    // word-soup corpus still decays: slope strictly negative, r2 in (0, 1]
    assert(row.getAs[Double]("slope") < 0.0)
    val r2 = row.getAs[Double]("r2")
    assert(r2 > 0.0 && r2 <= 1.0)
    // deterministic under repartitioning (decimal-routed sums)
    val again = TextAnalysis.zipf(docs.repartition(13)).collect().head
    assert(again.toSeq === row.toSeq)
  }

  test("zipf: topK caps the ranked tail; a 2-token corpus fits the line exactly") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val fullVocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .select("t").distinct().count()
    val capped = TextAnalysis.zipf(docs, topK = 10).collect().head
    assert(capped.getAs[Long]("n_points") === 10L)           // heap-capped points
    assert(capped.getAs[Long]("vocab_size") === fullVocab)   // vocab stays uncapped
    // two distinct frequencies -> two points -> perfect fit
    val tiny = docsDf((1L, "x x x x y y"))
    val r = TextAnalysis.zipf(tiny).collect().head
    assert(r.getAs[Long]("vocab_size") === 2L && r.getAs[Long]("n_points") === 2L)
    assert(r.getAs[Double]("r2") === 1.0)
    // slope through (ln1, ln4), (ln2, ln2): (ln2-ln4)/(ln2-ln1) = -1
    assert(math.abs(r.getAs[Double]("slope") - (-1.0)) <= 1e-6)
  }

  test("bm25 scores match the closed-form formula and rank deterministically") {
    // doc 0: tf(spark)=2, tf(join)=1, len 4; doc 1: tf(spark)=1, len 8;
    // doc 2: no query term → absent from the result entirely
    val docs = docsDf(
      0L -> "spark spark join x",
      1L -> "spark y y y y y y y",
      2L -> "z z")
    val out = TextAnalysis.bm25(docs, Seq("spark", "window", "join"), k = 10).collect()
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (nDocs, sumLen) = (3L, 14L)
    def contrib(tf: Long, df: Long, len: Long) =
      r9(math.log((nDocs - df + 0.5) / (df + 0.5) + 1) * (tf * 2.2)
        / (tf + 1.2 * (0.25 + 0.75 * ((len * nDocs).toDouble / sumLen))))
    def r6(x: BigDecimal) = x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s0 = r6(BigDecimal(contrib(2, 2, 4)) + BigDecimal(contrib(1, 1, 4)))
    val s1 = r6(BigDecimal(contrib(1, 2, 8)))
    assert(out.map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
      r.getAs[Double]("score"), r.getAs[Long]("n_terms_hit"))).toSeq
      === Seq((1, 0L, s0, 2L), (2, 1L, s1, 1L)))
  }

  test("featureHash emits unit-norm sparse vectors; identical text → identical vector") {
    val docs = docsDf(
      0L -> "alpha beta gamma alpha",
      1L -> "alpha beta gamma alpha", // same multiset → identical rows
      2L -> "solo")
    val out = TextAnalysis.featureHash(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r => (r.getAs[Long]("dim"), r.getAs[Long]("w"),
        r.getAs[Double]("w_norm"))).sortBy(_._1).toSeq).toMap
    assert(out(0L) === out(1L))
    // single token: exactly one bucket, |w| = 1, normalized to ±1
    assert(out(2L).length === 1 && math.abs(out(2L).head._2) === 1L
      && math.abs(out(2L).head._3) === 1.0)
    // L2 norm of every doc's w_norm column is 1 (to rounding)
    out.values.foreach { rows =>
      val n2 = rows.map(r => r._3 * r._3).sum
      assert(math.abs(n2 - 1.0) < 1e-4, s"norm² $n2")
    }
    // weights are exact token-count sums: doc 0 total |w| mass ≤ 4 tokens
    assert(out(0L).map(r => math.abs(r._2)).sum <= 4L)
  }

  test("qualityModel learns the deployed Gopher gate on the held-out fixture split") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val preds = TextAnalysis.qualityModel(docs).collect()
    assert(preds.nonEmpty)
    // every test doc (doc_id % 5 == 0) is scored exactly once
    assert(preds.map(_.getAs[Long]("doc_id")).distinct.length === preds.length)
    assert(preds.forall(_.getAs[Long]("doc_id") % 5 === 0))
    // the model must beat the majority-class baseline on its own labels —
    // a degenerate always-one-class model fails this
    val n = preds.length.toDouble
    val acc = preds.count(_.getAs[Long]("correct") === 1L) / n
    val majority = math.max(preds.count(_.getAs[Long]("label") === 1L),
      preds.count(_.getAs[Long]("label") === 0L)) / n
    assert(acc > majority, s"acc $acc <= majority $majority")
    assert(preds.map(_.getAs[Long]("pred")).distinct.length === 2,
      "degenerate single-class predictions")
    // eval is the exact fold of the prediction rows
    val eval = TextAnalysis.qualityModelEval(docs).collect()
      .map(r => (r.getAs[Long]("label"), r.getAs[Long]("pred")) -> r.getAs[Long]("n")).toMap
    val ref = preds.groupBy(r => (r.getAs[Long]("label"), r.getAs[Long]("pred")))
      .view.mapValues(_.length.toLong).toMap
    assert(eval === ref)
  }

  test("qualityModel: a corpus whose quality is decided by repetition is learned from the labels") {
    // pass docs: 30+ distinct words incl. stopwords; fail docs: heavy
    // repetition (distinct ratio < 0.5). Train ids avoid % 5 == 0.
    val rich = (1 to 35).map(i => s"word$i").mkString(" ") + " the a"
    val spammy = ("dup " * 37).trim + " the a"
    val rows = (1L to 60L).map(id => id -> (if (id % 2 == 0) rich else spammy))
    val preds = TextAnalysis.qualityModel(docsDf(rows: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pred")).toMap
    // held-out docs 5,10,...,60: even ids must predict pass, odd fail
    assert(preds.nonEmpty)
    preds.foreach { case (id, p) =>
      assert(p === (if (id % 2 == 0) 1L else 0L), s"doc $id predicted $p")
    }
  }

  test("qualityScore scores EVERY doc corpus-wide and agrees with the held-out model rows") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val scored = TextAnalysis.qualityScore(docs).collect()
    assert(scored.length.toLong === docs.count(),
      "the deployable filter must emit one row per document")
    scored.foreach(r => assert(r.getAs[Long]("in_train") ===
      (if (r.getAs[Long]("doc_id") % 5 != 0) 1L else 0L)))
    // the held-out slice must carry the exact scores qualityModel reports
    // (same weights, same scoring join)
    val heldOut = scored.filter(_.getAs[Long]("in_train") === 0L)
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("score"), r.getAs[Long]("pred")))
      .toMap
    val model = TextAnalysis.qualityModel(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("score"), r.getAs[Long]("pred")))
      .toMap
    assert(heldOut === model)
  }

  test("qualityTrain learns EXTERNAL labels, not just the Gopher rule") {
    // label = carries the zzmarker token (a rule the Gopher gate cannot
    // express); n_words equal across classes so structural bins are
    // neutral, and each doc carries a held-out-unseen unique token to
    // exercise the left-join's contribute-0 path
    val shared = (1 to 30).map(i => s"word$i").mkString(" ")
    val rows = (1L to 60L).map(id =>
      id -> s"uniq$id $shared ${if (id % 2 == 0) "zzmarker" else "zzfiller"}")
    val docs = docsDf(rows: _*)
    val labels = (1L to 60L).map(id => (id, if (id % 2 == 0) 1L else 0L))
      .toDF("doc_id", "label")
    val w = TextAnalysis.qualityTrain(docs, labels.filter(col("doc_id") % 5 =!= 0))
    val preds = TextAnalysis.qualityScoreWith(docs, w).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pred")).toMap
    assert(preds.size === 60, "every doc must score, trained or not")
    (1L to 60L).filter(_ % 5 == 0).foreach { id =>
      assert(preds(id) === (if (id % 2 == 0) 1L else 0L),
        s"held-out doc $id misclassified under external labels")
    }
  }

  test("scoring with an empty weight relation keeps every doc at score 0 (left-join contract)") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val noWeights = TextAnalysis.qualityTrain(docs, TextAnalysis.gopherLabels(docs).limit(0))
    assert(noWeights.count() === 0L)
    val scored = TextAnalysis.qualityScoreWith(docs, noWeights).collect()
    assert(scored.length.toLong === docs.count(),
      "all-unseen docs must still emit a score row")
    scored.foreach { r =>
      assert(r.getAs[Long]("score") === 0L && r.getAs[Long]("pred") === 0L)
    }
  }

  test("folded-map row-local scorer equals the broadcast-join scorer") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val w = TextAnalysis.qualityTrain(docs,
      TextAnalysis.gopherLabels(docs).filter(col("doc_id") % 5 =!= 0))
    val folded = TextAnalysis.foldQualityWeights(w)
    assert(folded.nonEmpty && folded.size <= 256)
    val a = TextAnalysis.qualityScoreCols(docs, folded, 256)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.qualityScoreWith(docs, w)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("bpeEncode applies learned merges greedily in rank order") {
    // pairs: (a,b) n=3 → rank 1; (b,c) n=2 and (c,a) n=2 tie → lhs order
    // puts (b,c) at rank 2. Encoding with topK=2:
    //   doc 0 "a b c a b" → rule1 → "a_b c a_b" (rule2 finds no bare b·c)
    //   doc 1 "b c a b x" → rule1 → "b c a_b x" → rule2 merges the bare
    //   b·c → "b_c a_b x" (2 merges, 3 symbols)
    val docs = docsDf(0L -> "a b c a b", 1L -> "b c a b x")
    val out = TextAnalysis.bpeEncode(docs, topK = 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_symbols"), r.getAs[Long]("n_merges"),
        r.getAs[String]("encoded_md5")))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq === Seq(
      (0L, 5L, 3L, 2L, md5("a\u001fb c a\u001fb")),
      (1L, 5L, 3L, 2L, md5("b\u001fc a\u001fb x"))), out.mkString(","))
  }

  test("bpeEncode: a chained run merges leftmost non-overlapping, single-word docs pass through") {
    // "a a a a a" with rule (a,a) ranked 1: leftmost greedy → [a_a, a_a, a]
    val docs = docsDf(0L -> "a a a a a", 1L -> "solo")
    val out = TextAnalysis.bpeEncode(docs, topK = 1).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_symbols"),
        r.getAs[String]("encoded_md5")))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq === Seq((0L, 3L, md5("a\u001fa a\u001fa a")), (1L, 1L, md5("solo"))),
      out.mkString(","))
  }

  test("bpeEncode: underscore-bearing vocabulary cannot chain-merge a fused symbol") {
    // Rules learned from this corpus (ties broken n DESC, lhs asc):
    //   (a,b) n=3 → rank 1; (b,c) n=3 → rank 2; (a_b,c) n=2 → rank 3.
    // Encoding doc 0 "a b c a b c a b c" with topK=3:
    //   rule 1 fuses every a·b → [F c F c F c] with F = a<US>b;
    //   rule 2 finds no bare b; rule 3 names the RAW token "a_b" — under
    //   the old '_' joiner F was textually "a_b" and all three F·c pairs
    //   chain-merged (3 symbols); with the chr(31) joiner F never aliases
    //   the raw word, so doc 0 keeps 6 symbols / 3 merges.
    // Doc 1 carries the genuine raw "a_b c" pairs rule 3 exists for.
    val docs = docsDf(0L -> "a b c a b c a b c", 1L -> "a_b c a_b c")
    val out = TextAnalysis.bpeEncode(docs, topK = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_symbols"),
        r.getAs[Long]("n_merges"), r.getAs[String]("encoded_md5")))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out.toSeq === Seq(
      (0L, 6L, 3L, md5("a\u001fb c a\u001fb c a\u001fb c")),
      (1L, 2L, 2L, md5("a_b\u001fc a_b\u001fc"))), out.mkString(","))
    // and the HOF twin agrees on exactly this hazard corpus
    val hof = TextAnalysis.bpeEncodeSql(docs, topK = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_symbols"),
        r.getAs[Long]("n_merges"), r.getAs[String]("encoded_md5")))
    assert(hof.toSeq === out.toSeq)
  }

  test("native bpe_encode_syms equals the nested-HOF twin row-for-row on the corpus") {
    val docs = Tables.load(SparkTestSession.spark, SparkTestSession.sfDir, "documents")
    val native = TextAnalysis.bpeEncode(docs).collect().map(_.toSeq).toSeq
    val hof = TextAnalysis.bpeEncodeSql(docs).collect().map(_.toSeq).toSeq
    assert(native.nonEmpty && native === hof)
  }

  test("vocabCoverage reports exact top-k occurrence shares with saturation past the vocab") {
    // tokens: a×5, b×3, c×1, d×1 → total 10, vocab 4
    val docs = docsDf(0L -> "a a a b b c", 1L -> "a a b d")
    val out = TextAnalysis.vocabCoverage(docs, ks = Seq(1, 2, 100)).collect()
      .map(r => (r.getAs[Int]("k"), r.getAs[Long]("covered_tokens"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("vocab_size"),
        r.getAs[Double]("coverage")))
    assert(out.toSeq === Seq(
      (1, 5L, 10L, 4L, 0.5),
      (2, 8L, 10L, 4L, 0.8),
      (100, 10L, 10L, 4L, 1.0)))
  }

  test("datasetCard reports exact scale, shares, and dedup rates on a known fixture") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    // d0/d1 identical (exact-dup pair AND duplicated paragraph chunk);
    // tokens 3,3,4,2 → avg 3, p50 = 3, max 4; langs 2/2; sources 2
    val docs = Seq(
      (0L, "a b c", "en", "s1"),
      (1L, "a b c", "en", "s1"),
      (2L, "d e f g", "de", "s2"),
      (3L, "h i", "de", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.datasetCard(docs).collect()
      .map(r => (r.getAs[String]("section"), r.getAs[String]("metric"),
        r.getAs[Double]("value")))
    assert(out.toSeq === Seq(
      ("corpus", "avg_doc_tokens", 3.0),
      ("corpus", "n_docs", 4.0),
      ("corpus", "n_tokens", 12.0),
      ("dedup", "exact_dup_docs", 1.0),
      ("dedup", "paragraph_dup_frac", 0.25),
      ("lang", "de", 0.5),
      ("lang", "en", 0.5),
      ("length", "max_tokens", 4.0),
      ("length", "p50_tokens", 3.0),
      ("source", "n_sources", 2.0)), out.mkString(","))
  }

  test("winnow store: stored probe equals the in-line incremental; append == rebuild; compaction pure layout") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val hist = docs.filter(col("doc_id") % 7 =!= 0)
    val inc = docs.filter(col("doc_id") % 7 === 0)
    val base = java.nio.file.Files.createTempDirectory("winnowstore").toString
    TextAnalysis.buildWinnowStore(hist.filter(col("doc_id") % 2 === 1), s"$base/s")
    TextAnalysis.appendToWinnowStore(hist.filter(col("doc_id") % 2 === 0), s"$base/s")
    val stored = TextAnalysis.winnowAgainstStore(inc, s"$base/s").collect().toSeq
    val inline = TextAnalysis.winnowIncremental(docs).collect().toSeq
    assert(stored === inline)
    assert(stored.nonEmpty, "fixture has no cross-slice winnow pairs")
    // append == rebuild: the store relation is the exploded print rows,
    // order-independent and multiplicity-preserving
    TextAnalysis.buildWinnowStore(hist, s"$base/full")
    def rel(d: String) = spark.read.parquet(s"$d/prints")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rel(s"$base/s") === rel(s"$base/full"))
    // compaction preserves the probe relation and leaves no residue
    val rowsBefore = spark.read.parquet(s"$base/s/prints").count()
    TextAnalysis.compactWinnowStore(spark, s"$base/s")
    assert(TextAnalysis.winnowAgainstStore(inc, s"$base/s").collect().toSeq === stored)
    assert(spark.read.parquet(s"$base/s/prints").count() === rowsBefore)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/s.old")))
  }

  test("winnow store probe plan: historical text is never rescanned") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val base = java.nio.file.Files.createTempDirectory("winnowstore").toString
    TextAnalysis.buildWinnowStore(docs.filter(col("doc_id") % 7 =!= 0), s"$base/s")
    // probe from a SEPARATE parquet so any scan of the original corpus
    // file in the probe plan would be unambiguous evidence of a rescan
    docs.filter(col("doc_id") % 7 === 0).write.parquet(s"$base/inc")
    val p = TextAnalysis.winnowAgainstStore(
        spark.read.parquet(s"$base/inc"), s"$base/s")
      .queryExecution.executedPlan.toString
    assert(p.contains("prints"), p.take(2000))
    assert(!p.contains("documents.parquet"), p.take(3000))
  }

  test("model store: stored scorer equals the in-line corpus-wide pass; rebuild replaces atomically") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val base = java.nio.file.Files.createTempDirectory("qmodel").toString
    TextAnalysis.buildQualityModelStore(docs, s"$base/m")
    val stored = TextAnalysis.scoreAgainstModelStore(docs, s"$base/m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val inline = TextAnalysis.qualityScore(docs)
      .select("doc_id", "score", "pred")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored === inline)
    // retrain = rebuild: the publish swap replaces the live weights and
    // leaves no .old residue; scoring is unchanged (training deterministic)
    TextAnalysis.buildQualityModelStore(docs, s"$base/m")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/m.old")))
    val again = TextAnalysis.scoreAgainstModelStore(docs, s"$base/m")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again === stored)
  }

  test("qualityCalibration partitions the held-out fold into fixed-width bins") {
    val docs = Tables.load(spark, SparkTestSession.sfDir, "documents")
    val out = TextAnalysis.qualityCalibration(docs).collect()
    val heldOut = docs.filter(col("doc_id") % 5 === 0).count()
    // every held-out doc lands in exactly one bin
    assert(out.map(_.getAs[Long]("n_docs")).sum === heldOut)
    // bin_lo is the bin's lower edge; pass counts bounded by bin size
    for (r <- out) {
      assert(r.getAs[Long]("bin_lo") === r.getAs[Long]("bin") * 1000L)
      assert(r.getAs[Long]("n_pass") >= 0 &&
        r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
    }
    // the curve must carry signal on the fixture: the top bin passes at a
    // strictly higher rate than the bottom bin (94%-accurate model)
    val sorted = out.sortBy(_.getAs[Long]("bin"))
    assert(sorted.last.getAs[Double]("pass_rate") >
      sorted.head.getAs[Double]("pass_rate"))
  }

  test("topicCards: hand-computed c-TF-IDF, cluster-shared terms score zero") {
    import spark.implicits._
    val docs = docsDf(1L -> "apple apple banana", 2L -> "apple cherry",
      3L -> "banana banana dog")
    val clusters = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("doc_id", "cluster_id")
    val out = TextAnalysis.topicCards(docs, clusters, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getAs[Double]("score")))
    val ln2 = BigDecimal(math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2x3 = BigDecimal(3 * math.log(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // cluster 10: apple tf=3 df=1 -> 3 ln2; cherry tf=1 df=1 -> ln2;
    // banana appears in BOTH clusters -> ln(2/2) = 0 (c-TF-IDF kills
    // corpus-wide terms regardless of tf). cluster 20: dog ln2, banana 0.
    assert(out.toSeq === Seq(
      (10L, 1, "apple", 3L, ln2x3),
      (10L, 2, "cherry", 1L, ln2),
      (10L, 3, "banana", 1L, 0.0),
      (20L, 1, "dog", 1L, ln2),
      (20L, 2, "banana", 2L, 0.0)))
  }
}
