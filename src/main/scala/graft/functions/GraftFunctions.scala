package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the hot loops of the LLM-pipeline
  * operators (SURVEY.md §2.8). The higher-order-function formulations
  * (transform/aggregate lambdas) evaluate one boxed lambda call per array
  * element per row; these expressions run one compiled primitive loop per
  * row instead — same arithmetic to the bit, so the DuckDB oracles are
  * unchanged.
  *
  * Codegen: each doGenCode emits a single static call into the compiled
  * loop below, keeping the enclosing operator inside whole-stage codegen
  * (no CodegenFallback row-by-row interpretation).
  */
object MinHashOps {
  final val P = 1000000007L
  final val NPerms = 128

  // a_i = (1103515245·i + 12345) mod p + 1, b_i = (69069·i + 362437) mod p —
  // identical to the SQL formulation they replace.
  val as: Array[Long] = Array.tabulate(NPerms)(i => (1103515245L * i + 12345L) % P + 1)
  val bs: Array[Long] = Array.tabulate(NPerms)(i => (69069L * i + 362437L) % P)

  /** 128-value MinHash signature of a shingle-hash array. Inputs are
    * reduced mod p first, so 60-bit raw hashes and already-reduced values
    * give identical signatures (x % p is a no-op when x < p). */
  def signature(input: ArrayData): ArrayData = {
    val xs = input.toLongArray()
    val out = new Array[Long](NPerms)
    var i = 0
    while (i < NPerms) {
      val a = as(i); val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < xs.length) {
        val v = (a * (xs(j) % P) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct 60-bit word-n-gram shingle hashes of a document, in one
    * narrow pass — value-identical to the SQL pipeline it replaces
    * (split(' ') → slice/array_join shingles → distinct →
    * conv(substring(md5(s),1,15),16,10)): same tokenization (Java split,
    * limit -1), same md5-prefix integer. Eliminates the explode+distinct
    * and collect_list shuffles of the exploded formulation. */
  def shingleHashes(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](words.length)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits = high 60 bits: 7 full bytes + high nibble of the 8th
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** POSITIONAL (in-order, non-distinct) 60-bit word-n-gram hashes: the
    * hash at array index i covers tokens [i+1, i+n] (1-based window start
    * = index + 1). Per-window value-identical to the SQL pipeline
    * `transform(sequence(1, m), i -> conv(substring(md5(array_join(
    * slice(toks, i, n), ' ')), 1, 15), 16, 10))` (spec-asserted), but one
    * compiled md5 loop per row — no HOF lambda re-evaluation, no boxed
    * slice/join per window. The substring-span dedup's hot path. */
  def shingleHashesPos(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val m = words.length - n + 1
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowed fingerprint prints of a document in ONE pass (Schleimer et
    * al.'s MOSS winnowing, word-`n`-gram hashes, window `w`): positional
    * (non-distinct) 60-bit md5 n-gram hashes, minimum of each w-window of
    * consecutive hashes (short docs: one window of everything), distinct
    * values, sorted ascending. Value-identical to the two-stage HOF
    * pipeline it replaces (TextAnalysis posHashesExpr → printsExpr,
    * spec-asserted): same tokenization (Java split, limit -1), same
    * md5-prefix 60-bit integers, same `greatest(1, m-w+1)` window count —
    * but one compiled loop per row instead of a boxed slice/array_min
    * lambda pair per window. */
  def winnowPrints(text: UTF8String, n: Int, w: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder
    val m = words.length - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = (h << 4) | ((d(7) & 0xf0L) >> 4)
      i += 1
    }
    val nWin = math.max(1, m - w + 1)
    val seen = new java.util.HashSet[Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](nWin)
    var j = 0
    while (j < nWin) {
      var mn = Long.MaxValue
      var k = 0
      while (k < w && j + k < m) {
        val v = hs(j + k)
        if (v < mn) mn = v
        k += 1
      }
      if (seen.add(mn)) out += mn
      j += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  /** Canonicalized text in ONE pass: lowercase (Spark's own UTF8String
    * lowering, so Unicode semantics are exactly `lower()`'s), strip
    * everything outside [a-z0-9 ], collapse space runs, trim. Value-
    * identical to the regex twin it replaces
    * (trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9 ]', ''),
    * ' +', ' ')), spec-asserted): dropped chars vanish without inserting
    * a break (regex 1), spaces collapse to one and never lead or trail
    * (regex 2 + trim) — but one compiled loop instead of two regex
    * engine passes per row. */
  def normalizeText(text: UTF8String): UTF8String = {
    val lower = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && started) sb.append(' ')
        sb.append(c)
        started = true
        pendingSpace = false
      } else if (c == ' ') pendingSpace = true
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** 63-bit SimHash of a document in ONE pass: md5 once per distinct
    * token, ±1 fold into 63 counters, sign → bit. Value-identical to the
    * SQL formulation it replaces (aggregate over sequence(0,62) of
    * per-token hex-digit bit tests): that expression's
    * `(digit(j div 4) div 8/4/2/1) % 2` indexing reads exactly the j-th
    * bit of the digest MSB-first, i.e. `(d[j>>3] >> (7-(j&7))) & 1` —
    * but re-evaluates md5 over every token for EACH of the 63 bits
    * (63×tokens digests/doc vs tokens here). */
  def simhash63(text: UTF8String): Long = {
    val tokens = text.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.HashSet[String]()
    val counts = new Array[Int](63)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (seen.add(t)) {
        md.reset()
        val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 63) {
          counts(j) += (((d(j >>> 3) >> (7 - (j & 7))) & 1) << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 63) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** q(x) = round(x*1e4) per element -- quantize once per row so pair
    * scans don't re-round per pair. */
  def quantize(a: ArrayData): ArrayData = {
    val xs = a.toFloatArray()
    val out = new Array[Long](xs.length)
    var i = 0
    while (i < xs.length) { out(i) = qRound(xs(i).toDouble * 10000); i += 1 }
    new GenericArrayData(out)
  }

  /** Plain long-array dot product (pre-quantized inputs). */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toLongArray(); val ys = b.toLongArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  /** round-half-away-from-zero — SQL round() semantics in both Spark
    * (BigDecimal HALF_UP) and DuckDB. Math.round is floor(x+0.5) which
    * differs on negative exact halves, and float·10⁴ is exact in double so
    * such halves can genuinely occur. */
  @inline private def qRound(d: Double): Long =
    if (d >= 0) math.floor(d + 0.5).toLong else math.ceil(d - 0.5).toLong

  /** Σ q(a_i)·q(b_i) with q(x) = round(x·10⁴) as BIGINT — the quantized
    * dot product, bit-identical to the zip_with/aggregate formulation. */
  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toFloatArray(); val ys = b.toFloatArray()
    val n = math.min(xs.length, ys.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += qRound(xs(i).toDouble * 10000) * qRound(ys(i).toDouble * 10000)
      i += 1
    }
    acc
  }

  /** Sign-random-projection bucket id: bit p of the result is the sign of
    * the exact integer dot of the (pre-quantized) vector with hyperplane p,
    * whose coefficients come from an LCG on the flat index —
    * v(p,i) = (1103515245·(p·dim + i + 1) + 12345) mod 2³¹ − 2³⁰, identical
    * to the oracle's `planes` CTE. |x| ≤ ~2¹⁵ (quantized unit-ish floats)
    * and |v| < 2³⁰, so the 64-term sum stays ≤ 2⁵¹: exact in a long. */
  def srpBucket(a: ArrayData, planes: Int): Long = {
    val xs = a.toLongArray()
    val dim = xs.length
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var acc = 0L
      var i = 0
      val base = p.toLong * dim
      while (i < dim) {
        val v = (1103515245L * (base + i + 1) + 12345L) % 2147483648L - 1073741824L
        acc += xs(i) * v
        i += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Σ q(x_i)² — the quantized squared norm. */
  def normQ(a: ArrayData): Long = {
    val xs = a.toFloatArray()
    var acc = 0L
    var i = 0
    while (i < xs.length) {
      val q = qRound(xs(i).toDouble * 10000)
      acc += q * q
      i += 1
    }
    acc
  }

  /** Modal element of a string array and its count — the run-length fold
    * over the sorted array, compiled. Value-identical to the SQL
    * aggregate-over-array_sort formulation it replaces
    * ([[graft.ext.TextAnalysis.modalExpr]]): ascending sort with nulls
    * last (array_sort's default), null-safe run equality (x <=> prev),
    * strict `>` on the best-run update so the FIRST maximal run wins —
    * in ascending order that is the lexicographically smallest among
    * ties, the same tie-break as the groupBy/argmax oracle. Empty array
    * → (null, 0). */
  def modalRun(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val xs = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      xs(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(xs, (a: UTF8String, b: UTF8String) =>
      if (a eq b) 0 else if (a == null) 1 else if (b == null) -1 else a.compareTo(b))
    var prev: UTF8String = null
    var run = 0L
    var bestC = 0L
    var bestV: UTF8String = null
    i = 0
    while (i < n) {
      val x = xs(i)
      val eq = if (x == null) prev == null else prev != null && x.equals(prev)
      run = if (eq) run + 1 else 1L
      if (run > bestC) { bestC = run; bestV = x }
      prev = x
      i += 1
    }
    // clone: the winning UTF8String may view a buffer the scan reuses
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (bestV == null) null else bestV.clone(), bestC))
  }

  /** DEFLATE-compressed byte length of the text (zlib level 6, raw stream).
    * The compression-ratio quality signal: highly repetitive/boilerplate
    * text compresses far below diverse prose. JVM Deflater is deterministic
    * for a fixed level/input, but the byte stream is zlib-implementation-
    * specific — hence no cross-engine oracle (rows-only check), with specs
    * asserting the signal's ordering properties instead. */
  def deflateLen(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  /** PQ code assignment: for each subspace m (sub-dimension `sd`,
    * codewords `cb(m)` — possibly variable-width after empty-codeword
    * drops), the 1-BASED index of the codeword with minimum exact L2²
    * distance to the row's m-th sub-vector, FIRST index on ties — the
    * compiled twin of the HOF formulation
    * `transform(dists, ds -> CAST(array_position(ds, array_min(ds)) AS INT))`
    * over per-subspace distance lists (same arithmetic to the bit, same
    * tie rule, so the DuckDB oracles are unchanged). One primitive loop
    * per row replaces nSub·nCode·sd interpreted lambda calls — the
    * corpus-side encode cost of the PQ family. */
  def pqCodes(q: ArrayData, cb: Array[Array[Array[Long]]], sd: Int): ArrayData = {
    val x = q.toLongArray()
    val out = new Array[Int](cb.length)
    var m = 0
    while (m < cb.length) {
      val cws = cb(m)
      val off = m * sd
      var best = Long.MaxValue
      var bi = 0
      var c = 0
      while (c < cws.length) {
        val cw = cws(c)
        var d2 = 0L
        var d = 0
        while (d < sd) {
          val t = x(off + d) - cw(d)
          d2 += t * t
          d += 1
        }
        if (d2 < best) { best = d2; bi = c }
        c += 1
      }
      out(m) = bi + 1
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Coarse-quantizer assignment: the 0-based index of the centroid with
    * maximum cosine to the row vector, plus that cosine — the compiled
    * twin of the HOF formulation `array_position(scores, array_max(scores))`
    * over `transform(sequence(...), i -> vec_dotl(q, cq_i) / (sqrt(nrm) *
    * sqrt(cn_i)))`. Same arithmetic to the bit FOR NON-ZERO vectors
    * (exact BIGINT dot, one sqrt each side, one divide; first index wins
    * ties), so results are interchangeable with the HOF form. A zero-norm
    * row vector is guarded explicitly: every cosine is defined as 0, so
    * it assigns to list 0 with cos 0 — the HOF twin instead propagates
    * 0/0 = NaN through least/greatest and also lands on list 0, so the
    * ASSIGNMENT agrees but the reported cosine differs (0 vs NaN); the
    * bit-parity claim is scoped to non-zero vectors. One primitive loop of
    * nList·d multiplies per row replaces nList interpreted lambda frames
    * — the assignment cost of every IVF-style pass at large nList. */
  def topCentroid(q: ArrayData, cents: Array[Array[Long]],
                  cnSqrt: Array[Double]): InternalRow = {
    val x = q.toLongArray()
    var nrm = 0L
    var d = 0
    while (d < x.length) { nrm += x(d) * x(d); d += 1 }
    val xn = math.sqrt(nrm.toDouble)
    var best = Double.NegativeInfinity
    var bi = 0
    var c = 0
    while (c < cents.length) {
      val cw = cents(c)
      var dot = 0L
      var i = 0
      while (i < cw.length) { dot += x(i) * cw(i); i += 1 }
      // zero-norm guard: 0/0 would make every `cos > best` test false and
      // return (list 0, -Infinity); defining cos = 0 keeps the same
      // assignment with a finite, radius-safe reported cosine
      val cos = if (xn == 0) 0.0 else dot.toDouble / (xn * cnSqrt(c))
      if (cos > best) { best = cos; bi = c }
      c += 1
    }
    InternalRow(bi, best)
  }

  /** Greedy word-level BPE encode: apply each (lhs(k), rhs(k)) rule in
    * order as ONE leftmost-non-overlapping pass — an accumulator scan
    * where a pair merges exactly when the running last symbol is lhs and
    * the next is rhs, producing `lhs<US>rhs` with [[FuseSep]] (ASCII 31,
    * unit separator) as the joiner.
    *
    * No-chain-merge invariant: rules name only RAW words, so a fused
    * symbol must never participate in a later merge. A fused symbol can
    * only collide with a raw word if the raw word itself CONTAINS the
    * joiner — with '_' (the r7 choice) that happened on any corpus
    * carrying underscore-joined tokens; with the non-token control byte
    * chr(31) it requires the whitespace-split corpus to carry a literal
    * unit-separator byte inside a token, which no textual corpus does
    * (and [[graft.ext.TextAnalysis.bpeMerges]] can then never learn a
    * rule naming it, because rules come from the same split). Identical
    * semantics to the nested aggregate() HOF twin
    * ([[graft.ext.TextAnalysis.bpeEncodeSql]]) and to the oracle's
    * recursive list_reduce — one compiled loop per rule instead of
    * K·len interpreted lambda frames per document (the encode cost that
    * measured 26.9 s at 50k docs in HOF form). */
  val FuseSep = "\u001f"
  def bpeEncode(text: UTF8String, lhs: Array[String], rhs: Array[String]): ArrayData = {
    var cur: Array[String] = text.toString.split(" ", -1)
    var k = 0
    while (k < lhs.length) {
      val l = lhs(k)
      val r = rhs(k)
      val out = new Array[String](cur.length)
      var n = 0
      var i = 0
      while (i < cur.length) {
        if (n > 0 && out(n - 1) == l && cur(i) == r) out(n - 1) = l + FuseSep + r
        else { out(n) = cur(i); n += 1 }
        i += 1
      }
      cur = java.util.Arrays.copyOf(out, n)
      k += 1
    }
    new GenericArrayData(cur.map(UTF8String.fromString))
  }
}

/** minhash_sig(array<bigint>) → array<bigint>[128] */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.signature(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.signature($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** vec_dotq(array<float>, array<float>) → bigint */
case class VecDotQ(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashOps.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashOps$$.MODULE$$.dotQ($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotQ =
    copy(left = l, right = r)
}

/** vec_normq(array<float>) → bigint */
case class VecNormQ(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.normQ(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.normQ($c)")
  override protected def withNewChildInternal(newChild: Expression): VecNormQ =
    copy(child = newChild)
}

/** shingle_hash60(text, n) -> array<bigint> of distinct 60-bit md5 word
  * n-gram hashes (one narrow pass; see MinHashOps.shingleHashes). */
case class ShingleHash60(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHash60 =
    copy(child = newChild)
}

/** shingle_hash60_pos(text, n) -> array<bigint> of positional in-order
  * 60-bit md5 word n-gram hashes (see MinHashOps.shingleHashesPos). */
case class ShingleHash60Pos(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.shingleHashesPos(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.shingleHashesPos($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHash60Pos =
    copy(child = newChild)
}

/** normalize_text(text) -> canonicalized string (see
  * MinHashOps.normalizeText). */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** winnow_prints(text, n, w) -> sorted distinct window-min 60-bit n-gram
  * hash prints (see MinHashOps.winnowPrints). */
case class WinnowPrints(child: Expression, n: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.winnowPrints(input.asInstanceOf[UTF8String], n, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.winnowPrints($c, $n, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowPrints =
    copy(child = newChild)
}

/** simhash63(text) -> bigint 63-bit SimHash fingerprint (see
  * MinHashOps.simhash63). */
case class SimHash63(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.simhash63(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.simhash63($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)
}

/** vec_quantize(array<float>) -> array<bigint>: round(x*1e4) per element */
case class VecQuantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.quantize(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.quantize($c)")
  override protected def withNewChildInternal(newChild: Expression): VecQuantize =
    copy(child = newChild)
}

/** vec_dotl(array<bigint>, array<bigint>) -> bigint */
case class VecDotL(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    MinHashOps.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashOps$$.MODULE$$.dotL($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotL =
    copy(left = l, right = r)
}

/** srp_bucket(array<bigint>, planes) -> bigint sign-random-projection
  * bucket id (see MinHashOps.srpBucket). */
case class SrpBucket(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.srpBucket(input.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.srpBucket($c, $planes)")
  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

/** pq_codes(array<bigint> q, array<array<array<bigint>>> cb, sd) ->
  * array<int> of 1-based per-subspace argmin-L2² codes (see
  * MinHashOps.pqCodes). `cb` must be FOLDABLE (a codebook literal): it is
  * materialized to a primitive long[][][] once per expression instance —
  * never per row — and shipped to codegen as a reference object, so the
  * per-row work is one compiled loop over nSub·nCode·sd primitives. */
case class PqCodes(left: Expression, right: Expression, sd: Int)
    extends BinaryExpression {
  require(right.foldable, "pq_codes codebook argument must be foldable")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  @transient private lazy val cb: Array[Array[Array[Long]]] = {
    val outer = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { m =>
      val mid = outer.getArray(m)
      Array.tabulate(mid.numElements())(c => mid.getArray(c).toLongArray())
    }
  }
  override protected def nullSafeEval(q: Any, ignored: Any): Any =
    MinHashOps.pqCodes(q.asInstanceOf[ArrayData], cb, sd)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "long[][][]")
    defineCodeGen(ctx, ev, (q, _) =>
      s"graft.functions.MinHashOps$$.MODULE$$.pqCodes($q, $cbRef, $sd)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqCodes =
    copy(left = l, right = r)
}

/** vec_top_centroid(array<bigint> q, array<array<bigint>> cq) ->
  * struct<list: int, cos: double>: 0-based argmax-cosine coarse-quantizer
  * assignment (see MinHashOps.topCentroid). `cq` must be FOLDABLE (the
  * centroid literal): it is materialized to long[][] with per-centroid
  * sqrt-norms once per expression instance and shipped to codegen as
  * reference objects — the PqCodes discipline. */
case class TopCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.foldable, "vec_top_centroid centroid argument must be foldable")
  override def dataType: DataType = StructType(Seq(
    StructField("list", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  @transient private lazy val cents: Array[Array[Long]] = {
    val outer = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements())(c => outer.getArray(c).toLongArray())
  }
  @transient private lazy val cnSqrt: Array[Double] =
    cents.map(v => math.sqrt(v.foldLeft(0L)((a, x) => a + x * x).toDouble))
  override protected def nullSafeEval(q: Any, ignored: Any): Any =
    MinHashOps.topCentroid(q.asInstanceOf[ArrayData], cents, cnSqrt)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("tcCents", cents, "long[][]")
    val nRef = ctx.addReferenceObj("tcNorms", cnSqrt, "double[]")
    defineCodeGen(ctx, ev, (q, _) =>
      s"graft.functions.MinHashOps$$.MODULE$$.topCentroid($q, $cRef, $nRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopCentroid =
    copy(left = l, right = r)
}

/** deflate_len(text) -> bigint: zlib-compressed byte length (see
  * MinHashOps.deflateLen). */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.deflateLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** modal_run(array<string>) → struct<v: string, c: bigint>: the modal
  * element and its count (see MinHashOps.modalRun). */
case class ModalRun(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("v", StringType, nullable = true),
    StructField("c", LongType, nullable = false)))
  override protected def nullSafeEval(input: Any): Any =
    MinHashOps.modalRun(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps$$.MODULE$$.modalRun($c)")
  override protected def withNewChildInternal(newChild: Expression): ModalRun =
    copy(child = newChild)
}

/** minhash_union(array<bigint>) → array<bigint>: elementwise-min aggregate
  * of MinHash signatures. min distributes over set union, so the result IS
  * the signature of the union of the aggregated shingle sets. As a
  * TypedImperativeAggregate it participates in partial aggregation: each
  * task folds its rows into one 128-long buffer and the shuffle carries one
  * sketch per (group, task) — the posexplode formulation it replaces
  * materialized 128 rows per doc BEFORE the map-side combine could run. */
case class MinHashUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(MinHashOps.NPerms)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData].toLongArray()
      val n = math.min(xs.length, buffer.length)
      var i = 0
      while (i < n) { if (xs(i) < buffer(i)) buffer(i) = xs(i); i += 1 }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { if (other(i) < buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnion =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashUnion =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_union"
}

/** vec_sum_agg(array<bigint>) → array<bigint>: elementwise-sum aggregate of
  * quantized vectors — the inner loop of a k-means/centroid update. Same
  * partial-agg discipline as [[MinHashUnion]]: each task folds its rows into
  * ONE dimension-length buffer, so the shuffle carries one partial sum per
  * (group, task) instead of a posexploded row per (vector, dimension).
  * Buffer length adopts the first input's length (all vectors in a corpus
  * share a dimension). */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val xs = v.asInstanceOf[ArrayData].toLongArray()
    if (buffer.isEmpty) return xs.clone()
    // fail fast on mixed dimensions — silent truncation here and an
    // index error in merge would be a data-dependent inconsistency
    require(xs.length == buffer.length,
      s"vec_sum_agg: mixed vector dimensions (${xs.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) += xs(i); i += 1 }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (buffer.isEmpty) return other
    if (other.isEmpty) return buffer
    require(other.length == buffer.length,
      s"vec_sum_agg: mixed vector dimensions (${other.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_agg"
}

/** vec_min_agg / vec_max_agg (array<bigint>) → array<bigint>: elementwise
  * min/max aggregate of quantized vectors — the per-dimension range pass of
  * scalar quantization (SQ8). Same partial-agg discipline as [[VecSumAgg]]:
  * each task folds its rows into ONE dimension-length buffer and the
  * shuffle carries one partial extreme per (group, task), never a
  * posexploded row per (vector, dimension). Buffer length adopts the first
  * input's length; mixed dimensions fail loudly like vec_sum_agg. */
case class VecExtremeAgg(
    child: Expression,
    isMin: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  @inline private def keep(a: Long, b: Long): Long =
    if (isMin) math.min(a, b) else math.max(a, b)

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val xs = v.asInstanceOf[ArrayData].toLongArray()
    if (buffer.isEmpty) return xs.clone()
    require(xs.length == buffer.length,
      s"$prettyName: mixed vector dimensions (${xs.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) = keep(buffer(i), xs(i)); i += 1 }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    if (buffer.isEmpty) return other
    if (other.isEmpty) return buffer
    require(other.length == buffer.length,
      s"$prettyName: mixed vector dimensions (${other.length} vs ${buffer.length})")
    var i = 0
    while (i < buffer.length) { buffer(i) = keep(buffer(i), other(i)); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecExtremeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecExtremeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecExtremeAgg =
    copy(child = newChild)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = if (isMin) "vec_min_agg" else "vec_max_agg"
}

/** bpe_encode_syms(text, rules) → array<string>: greedy rank-ordered BPE
  * encode (see MinHashOps.bpeEncode). `rules` must be a FOLDABLE
  * array<array<string>> of [lhs..., rhs...] parallel arrays — the
  * bounded-collect-to-literal discipline the PQ codebook established, so
  * the rule table folds once per plan, not per row. */
case class BpeEncodeSyms(left: Expression, right: Expression)
    extends BinaryExpression {
  require(right.foldable, "bpe_encode_syms rules argument must be foldable")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  @transient private lazy val rules: (Array[String], Array[String]) = {
    val outer = right.eval().asInstanceOf[ArrayData]
    val l = outer.getArray(0)
    val r = outer.getArray(1)
    require(l.numElements() == r.numElements(), "lhs/rhs rule arrays must align")
    (Array.tabulate(l.numElements())(i => l.getUTF8String(i).toString),
     Array.tabulate(r.numElements())(i => r.getUTF8String(i).toString))
  }
  override protected def nullSafeEval(t: Any, ignored: Any): Any =
    MinHashOps.bpeEncode(t.asInstanceOf[UTF8String], rules._1, rules._2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpelhs", rules._1, "java.lang.String[]")
    val rRef = ctx.addReferenceObj("bperhs", rules._2, "java.lang.String[]")
    defineCodeGen(ctx, ev, (t, _) =>
      s"graft.functions.MinHashOps$$.MODULE$$.bpeEncode($t, $lRef, $rRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BpeEncodeSyms =
    copy(left = l, right = r)
}

/** Registration — on a live session (idempotent) or via
  * `spark.sql.extensions=graft.functions.GraftSparkExtensions`. Both paths
  * are driven by the same `fns` sequence so they can never diverge. */
object GraftFunctions {
  private[functions] val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "minhash_sig" -> { es => MinHashSig(es.head) },
    "vec_dotq"    -> { es => VecDotQ(es.head, es(1)) },
    "vec_normq"   -> { es => VecNormQ(es.head) },
    "vec_quantize" -> { es => VecQuantize(es.head) },
    "simhash63"    -> { es => SimHash63(es.head) },
    "vec_dotl"     -> { es => VecDotL(es.head, es(1)) },
    "shingle_hash60" -> { es =>
      ShingleHash60(es.head, es(1).eval().asInstanceOf[Int]) },
    "shingle_hash60_pos" -> { es =>
      ShingleHash60Pos(es.head, es(1).eval().asInstanceOf[Int]) },
    "srp_bucket" -> { es =>
      SrpBucket(es.head, es(1).eval().asInstanceOf[Int]) },
    "winnow_prints" -> { es =>
      WinnowPrints(es.head, es(1).eval().asInstanceOf[Int],
        es(2).eval().asInstanceOf[Int]) },
    "normalize_text" -> { es => NormalizeText(es.head) },
    // raw AggregateFunction: the analyzer's ResolveFunctions wraps it in an
    // AggregateExpression, so `agg(expr("minhash_union(sig)"))` just works
    "minhash_union" -> { es => MinHashUnion(es.head) },
    "modal_run"     -> { es => ModalRun(es.head) },
    "vec_sum_agg"   -> { es => VecSumAgg(es.head) },
    "vec_min_agg"   -> { es => VecExtremeAgg(es.head, isMin = true) },
    "vec_max_agg"   -> { es => VecExtremeAgg(es.head, isMin = false) },
    "deflate_len"   -> { es => DeflateLen(es.head) },
    "vec_top_centroid" -> { es => TopCentroid(es.head, es(1)) },
    "pq_codes"      -> { es =>
      PqCodes(es.head, es(1), es(2).eval().asInstanceOf[Int]) },
    "bpe_encode_syms" -> { es => BpeEncodeSyms(es.head, es(1)) },
    // Spark's OWN codegen'd Bloom probe (the expression behind runtime
    // row-level filter injection), surfaced as a callable function so
    // BloomDedup can probe a folded filter literal — no custom expression
    // needed, and the filter format stays the engine's
    "bloom_might_contain" -> { es =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        es.head, es(1)) })

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id))
        reg.registerFunction(id, new ExpressionInfo("graft.functions", name), builder)
    }
  }
}

class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.fns.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
}
