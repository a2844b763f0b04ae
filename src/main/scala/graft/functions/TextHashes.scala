package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash kernels (SimHash, MinHash).
  *
  * The composable higher-order-function formulations in
  * `operators.Dedup` are semantically clean but evaluate a ~64×|words|
  * expression tree per row in the interpreter (codegen gives up on trees that
  * size) — at sf0.1 the SimHash HOF version alone ran for minutes. These
  * expressions compute the same signatures in one imperative pass per row and
  * stay inside whole-stage codegen via a static-call `doGenCode`, the
  * preference order the engine follows everywhere: native expression > HOF
  * composition > UDF.
  */
object TextHashImpl {
  final val Seed = 42L // same default seed as Spark's xxhash64 SQL function

  @inline private def hashWord(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(s, StringType, seed)

  /** 64-bit SimHash over whitespace words: bit b is the sign of
    * Σ_words ±1 by bit b of xxhash64(word). One pass, no allocation beyond
    * the 64 counters.
    */
  def simhash64(text: UTF8String): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = text.numBytes()
    var start = 0
    val bytes = text.getBytes
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) {
          val w = UTF8String.fromBytes(bytes, start, i - start)
          val h = hashWord(w, Seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var r = 0L
    var b = 63
    while (b >= 0) {
      r = (r << 1) | (if (counts(b) > 0) 1L else 0L)
      b -= 1
    }
    r
  }

  /** MinHash signature over distinct word k-shingles using the standard
    * 2-hash affine family: sig_j = min_s (h1(s) + j·h2(s)). One pass over
    * shingles, 2 hashes each, `numHashes` running minima.
    */
  def minhash(text: UTF8String, k: Int, numHashes: Int): Array[Long] = {
    val words = split(text)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(words.length - k + 1, 1)
    val seen = new java.util.HashSet[UTF8String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val shingle =
        if (words.length == 0) UTF8String.EMPTY_UTF8
        else if (words.length < k) UTF8String.concatWs(UTF8String.fromString(" "), words: _*)
        else UTF8String.concatWs(UTF8String.fromString(" "), words.slice(i, i + k): _*)
      if (seen.add(shingle)) {
        val h1 = hashWord(shingle, Seed)
        val h2 = hashWord(shingle, Seed + 1)
        var j = 0
        while (j < numHashes) {
          val hj = h1 + j * h2 // intentional wrap (affine hash family)
          if (hj < sig(j)) sig(j) = hj
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  def minhashArrayData(text: UTF8String, k: Int, numHashes: Int): ArrayData =
    new GenericArrayData(minhash(text, k, numHashes))

  /** Sorted distinct xxhash64 values of the word k-shingles — the primitive
    * set representation every pairwise Jaccard consumes. One imperative
    * pass; the equivalent HOF chain (transform∘sequence∘element_at∘
    * array_distinct∘sort_array) is CodegenFallback all the way down and
    * measured ~15× slower per scan.
    */
  def shingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val words = split(text)
    val nShingles = math.max(words.length - k + 1, 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nShingles) {
      val shingle =
        if (words.length == 0) UTF8String.EMPTY_UTF8
        else if (words.length < k) UTF8String.concatWs(UTF8String.fromString(" "), words: _*)
        else UTF8String.concatWs(UTF8String.fromString(" "), words.slice(i, i + k): _*)
      set.add(hashWord(shingle, Seed))
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def shingleHashesArrayData(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(shingleHashes(text, k))

  /** Winnowing fingerprints (MOSS): hash every word k-gram, keep the min
    * hash of each sliding window of `w` grams, distinct, sorted. One pass —
    * the HOF formulation (`TextMetrics.winnowHof`) inlines the whole gram
    * array into every window's lambda, re-splitting the text per element
    * access (quadratic, interpreted), and the optimizer's
    * InferFiltersFromGenerate then doubles it with a `size(...) > 0` filter
    * when the result is exploded — measured 97s vs this kernel's
    * sub-second at sf0.01. Same output bit-for-bit (TextMetricsSpec).
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val words = split(text)
    val grams: Array[Long] =
      if (words.length < k) Array(hashWord(text, Seed))
      else {
        val n = words.length - k + 1
        val out = new Array[Long](n)
        var i = 0
        while (i < n) {
          out(i) = hashWord(
            UTF8String.concatWs(UTF8String.fromString(" "), words.slice(i, i + k): _*), Seed)
          i += 1
        }
        out
      }
    val nWin = math.max(grams.length - w, 0) + 1
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < nWin) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, grams.length)
      while (j < end) { if (grams(j) < m) m = grams(j); j += 1 }
      set.add(m)
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** One-pass repetition statistics: (n_words, n_distinct, max_run,
    * top_bigram_count) over the whitespace word sequence. Word semantics
    * match bare `split(text, ' ')` — EMPTY tokens kept (the quality/
    * repetition family's convention, and the DuckDB twin's string_split),
    * unlike [[split]] which drops them for the shingle kernels. The HOF
    * formulation ([[graft.operators.TextMetrics.repetitionHof]]) folds the
    * same numbers via interpreted ArrayAggregate (plus an array_sort for
    * the bigram count); this kernel is one imperative pass and stays in
    * whole-stage codegen — measured ~6.3s → sub-second for the sf0.1 scan.
    */
  def repetitionStats(text: UTF8String): InternalRow = {
    val words = splitKeepEmpty(text)
    val n = words.length
    val distinct = new java.util.HashSet[UTF8String](n * 2)
    var maxRun = 0L
    var run = 0L
    var i = 0
    while (i < n) {
      distinct.add(words(i))
      if (i > 0 && words(i) == words(i - 1)) run += 1 else run = 1
      if (run > maxRun) maxRun = run
      i += 1
    }
    var topBigram = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[UTF8String, Long]((n - 1) * 2)
      i = 0
      while (i < n - 1) {
        val bg = UTF8String.concatWs(UTF8String.fromString(" "), words(i), words(i + 1))
        val c = counts.merge(bg, 1L, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinct.size().toLong, maxRun, topBigram))
  }

  /** Sorted run lengths = the multiset of per-distinct-value counts of the
    * whitespace word sequence (`byChar = false`; empty tokens KEPT, the
    * quality/repetition family's `split(text, ' ')` convention) or of the
    * character sequence (`byChar = true`; UTF-16 units — identical to
    * codepoints on the BMP text the corpus carries). One imperative
    * sort+walk per row, whole-stage codegen via the static call — the
    * input to entropy and any other frequency-profile statistic, emitted
    * as counts so downstream arithmetic (a ≤|distinct|-sized fold) never
    * re-touches the text. Count order is unspecified (it is a multiset;
    * every consumer aggregates order-independently).
    */
  def sortedRunLengths(text: UTF8String, byChar: Boolean): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (byChar) {
      val cs = text.toString.toCharArray
      java.util.Arrays.sort(cs)
      var i = 0
      var run = 0L
      while (i < cs.length) {
        if (i > 0 && cs(i) != cs(i - 1)) { out += run; run = 0L }
        run += 1L
        i += 1
      }
      if (run > 0L) out += run
    } else {
      val words = splitKeepEmpty(text)
      java.util.Arrays.sort(words, new java.util.Comparator[UTF8String] {
        override def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
      })
      var i = 0
      var run = 0L
      while (i < words.length) {
        if (i > 0 && words(i) != words(i - 1)) { out += run; run = 0L }
        run += 1L
        i += 1
      }
      if (run > 0L) out += run
    }
    new GenericArrayData(out.toArray)
  }

  /** DEFLATE-compressed size of the UTF-8 text (zlib level 6, the
    * java.util.zip default). Compressed-size / raw-size is the
    * model-free redundancy signal production curation stacks filter on
    * (RefinedWeb/MassiveText-style): boilerplate and template spam
    * compress far below prose, random gibberish barely compresses at
    * all — one number that catches both tails. Deterministic for a
    * given zlib version+level, but NOT a cross-engine protocol (DuckDB
    * ships no deflate) — the query key is rows-only by design. One
    * Deflater per call (small docs; the object is cheap relative to the
    * compression itself), whole-stage codegen via the static call.
    */
  def deflateSize(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Signed feature hashing (the hashing trick): token t adds ±1 to
    * bucket pmod(xxhash64('tv:idx', t), dim), sign from an independent
    * salt; result L2-normalized (zero vector for empty docs). Bit-for-bit
    * the HOF formulation in `operators.TextVectors` (same salts — the
    * multi-arg xxhash64 chains the salt hash into the token hash's seed;
    * same float-add order; same double-accumulated norm), which evaluated
    * a tokens×dim interpreted lambda tree per row and rebuilt the
    * accumulator array per token — measured ~2 MINUTES per sf0.1 scan in
    * the driver's bench (q_quality_clf 127s, q_semantic_dedup_docs 125s);
    * this kernel is one pass, one allocation, whole-stage codegen.
    */
  def hashedVec(text: UTF8String, dim: Int): ArrayData = {
    val saltIdx = hashWord(UTF8String.fromString("tv:idx"), Seed)
    val saltSgn = hashWord(UTF8String.fromString("tv:sgn"), Seed)
    val acc = new Array[Float](dim)
    val words = split(text)
    var i = 0
    while (i < words.length) {
      val t = words(i)
      val b = java.lang.Math.floorMod(hashWord(t, saltIdx), dim.toLong).toInt
      val s = if (java.lang.Math.floorMod(hashWord(t, saltSgn), 2L) == 0L) 1.0f else -1.0f
      acc(b) += s
      i += 1
    }
    var sumSq = 0.0d
    var j = 0
    // float multiply THEN widen, exactly like the HOF's (v*v).cast(double)
    while (j < dim) { sumSq += (acc(j) * acc(j)).toDouble; j += 1 }
    val nrm = math.sqrt(sumSq)
    if (nrm > 0.0d) {
      j = 0
      while (j < dim) { acc(j) = (acc(j) / nrm).toFloat; j += 1 }
    }
    val out = new Array[Any](dim)
    j = 0
    while (j < dim) { out(j) = acc(j); j += 1 }
    new GenericArrayData(out)
  }

  /** Bare `split(text, ' ')` semantics: empty tokens KEPT ("" → [""]). */
  private def splitKeepEmpty(text: UTF8String): Array[UTF8String] = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val bytes = text.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }

  private def split(text: UTF8String): Array[UTF8String] = {
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val bytes = text.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' '.toByte) {
        if (i > start) out += UTF8String.fromBytes(bytes, start, i - start)
        start = i + 1
      }
      i += 1
    }
    out.toArray
  }
}

case class HashedVecExpr(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false)
  override def prettyName: String = "graft_hashed_vec"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.hashedVec(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.hashedVec($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): HashedVecExpr =
    copy(child = newChild)
}

case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.minhashArrayData(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.minhashArrayData($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_words", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("max_run", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_bigram", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

case class DeflateSizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.deflateSize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.deflateSize($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}

case class SortedRunLengthsExpr(child: Expression, byChar: Boolean) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_run_lengths"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.sortedRunLengths(input.asInstanceOf[UTF8String], byChar)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.sortedRunLengths($c, $byChar)")
  override protected def withNewChildInternal(newChild: Expression): SortedRunLengthsExpr =
    copy(child = newChild)
}

case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    TextHashImpl.shingleHashesArrayData(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashImpl.shingleHashesArrayData($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Column-API entry points. */
object TextHashes {
  def simhash64(c: Column): Column = GraftBridge.column(SimHash64Expr(GraftBridge.expression(c)))
  def minhashSig(c: Column, k: Int = 3, numHashes: Int = 32): Column =
    GraftBridge.column(MinHashSigExpr(GraftBridge.expression(c), k, numHashes))
  def shingleHashes(c: Column, k: Int = 3): Column =
    GraftBridge.column(ShingleHashesExpr(GraftBridge.expression(c), k))
  def winnowFingerprints(c: Column, k: Int = 3, w: Int = 4): Column =
    GraftBridge.column(WinnowExpr(GraftBridge.expression(c), k, w))
  def repetitionStats(c: Column): Column =
    GraftBridge.column(RepetitionStatsExpr(GraftBridge.expression(c)))
  def sortedRunLengths(c: Column, byChar: Boolean): Column =
    GraftBridge.column(SortedRunLengthsExpr(GraftBridge.expression(c), byChar))
  def deflateSize(c: Column): Column =
    GraftBridge.column(DeflateSizeExpr(GraftBridge.expression(c)))
  def hashedVec(c: Column, dim: Int = 64): Column =
    GraftBridge.column(HashedVecExpr(GraftBridge.expression(c), dim))
}
