package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity / fingerprinting hot paths.
  *
  * These sit inside pairwise joins (O(n²) evaluations), where a Scala UDF's
  * per-row serialization tax dominates — so they are implemented as codegen'd
  * `Expression`s (task-brief preference order: builtin composition > native
  * Expression > UDF). Each generates a straight-line static call over unsafe
  * ArrayData/UTF8String — no boxing, stays inside whole-stage codegen.
  */
object expressions {

  /** Cosine similarity of two float vectors (0.0 when either norm is 0). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"graft.functions.NativeOps.cosine($x, $y)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "cosine_sim"
  }

  /** Dot product of two float vectors. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"graft.functions.NativeOps.dot($x, $y)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "dot_product"
  }

  /** Hamming distance between two 64-bit signatures (SimHash join key). */
  case class HammingDistance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) => s"java.lang.Long.bitCount($x ^ $y)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HammingDistance =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "hamming"
  }

  /** 64-bit polynomial rolling hash of a string's UTF-8 bytes (document
    * fingerprinting — content-defined, shift-stable). */
  case class RollingHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      NativeOps.rollingHash(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.rollingHash($x)")
    override protected def withNewChildInternal(newChild: Expression): RollingHash =
      copy(child = newChild)
    override def prettyName: String = "rolling_hash"
  }

  /** 64-bit SimHash over whitespace tokens of a string. */
  case class SimHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any =
      NativeOps.simHash(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.simHash($x)")
    override protected def withNewChildInternal(newChild: Expression): SimHash =
      copy(child = newChild)
    override def prettyName: String = "simhash"
  }

  /** All `numHashes` SplitMix64 minhashes of a (distinct) token array in
    * one pass — the MinHash signature kernel, q31's hot stage and the
    * measured job of the pipeline scaling ladder. Base hash = FNV-1a over
    * each token's UTF-8 bytes (allocation-free on the token; the Scala-UDF
    * predecessor decoded to java.lang.String first). Any stable base hash
    * satisfies the operator contract — banding recall/precision are
    * re-validated by MlSpec, and exact-Jaccard verification downstream
    * makes the emitted pairs independent of the hash choice. */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes > 0, "numHashes must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      NativeOps.minhashSig(v.asInstanceOf[ArrayData], numHashes)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.minhashSig($x, $numHashes)")
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  /** Distinct word n-gram shingles of a string, first-occurrence order —
    * the CPU kernel under the ngram-Jaccard / decontamination / clustering
    * / curation family (q33/q46/q47/q50/q52) and the pipeline scaling
    * ladder. Native codegen'd successor of the round-1 Scala UDF (same
    * upgrade minhash_sig got in round 3): tokenization runs over the raw
    * UTF-8 bytes (' ' is ASCII-safe in UTF-8, so no String decode), each
    * shingle is a zero-copy slice of one shared byte array (tokens split
    * on single spaces are CONTIGUOUS with their separators, so
    * "t0 … t(n-1)" is a byte range of the input), and the whole thing
    * stays inside whole-stage codegen. Split semantics are exactly Java's
    * `String.split(' ')`: consecutive spaces yield empty tokens, trailing
    * empty tokens drop. n is a plan-time constant (like MinHashSig's
    * numHashes): 3 for the near-dup family, 8+ for benchmark
    * decontamination (the industry norm — long n-grams make contamination
    * matches precise). */
  case class ShinglesN(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      NativeOps.shinglesN(v.asInstanceOf[UTF8String], n)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.shinglesN($x, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShinglesN =
      copy(child = newChild)
    override def prettyName: String = "shingles_n"
  }

  /** ALL word n-grams in token order — the positional sibling of
    * [[ShinglesN]] (which dedups to first occurrence): element i IS the
    * n-gram starting at token position i, so `posexplode` over it yields
    * (token_pos, gram) directly. Needed by occurrence-grain consumers
    * (exact-substring dedup, q119) where both multiplicity and position
    * carry meaning that the distinct set erases. Same split(' ')
    * semantics and zero-copy byte-range construction. */
  case class ShinglesAllN(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      NativeOps.shinglesAllN(v.asInstanceOf[UTF8String], n)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.shinglesAllN($x, $n)")
    override protected def withNewChildInternal(newChild: Expression): ShinglesAllN =
      copy(child = newChild)
    override def prettyName: String = "shingles_all_n"
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
    * the MOSS local algorithm) as ONE codegen'd kernel: word-k-grams of the
    * input, minimum gram of every sliding w-window (byte-lexicographic —
    * the guarantee holds for any total order, and binary string order keeps
    * the op oracle-expressible), distinct in first-occurrence order. The
    * native upgrade of the q94 `transform(sequence…)` HOF pipeline (the
    * round-2 finding: lambda HOFs run interpreted, one closure per
    * element); this is a zero-copy byte scan + O(g) monotonic-deque
    * sliding minimum with UTF8String views over the input bytes —
    * round-4 VERDICT item 8. split-on-' ' semantics here are SPARK's
    * `split(text, ' ')` (trailing empty tokens KEPT — unlike shingles_n's
    * Java-split grain) so the relation is bit-identical to the HOF
    * predecessor the q94 oracle pins. */
  case class WinnowFps(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, "k and w must be positive")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      NativeOps.winnowN(v.asInstanceOf[UTF8String], k, w)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.winnowN($x, $k, $w)")
    override protected def withNewChildInternal(newChild: Expression): WinnowFps =
      copy(child = newChild)
    override def prettyName: String = "winnow_fps"
  }

  /** Count of whitespace tokens of a string that belong to a FIXED plan-time
    * word set — the lexicon-scan kernel under sentiment (q61/q62), language
    * ID (q37) and the stopword ratio (q38). Replaces the
    * `size(filter(split(text,' '), _.isin(words)))` HOF formulation, whose
    * lambda evaluates INTERPRETED per token (the round-2 finding:
    * higher-order functions are CodegenFallback); this is a codegen'd
    * straight-line byte scan — token boundaries on ' ' (split(' ') grain:
    * empty tokens can never match a non-empty lexicon word, so the count is
    * identical), each token compared against the lexicon's UTF-8 bytes
    * without decoding. The lexicon is a plan-time constant (like
    * MinHashSig.numHashes) and small (3–5 words), so linear membership is
    * the right structure — no hash set, no allocation per row. */
  case class TokensInCount(child: Expression, words: Seq[String])
      extends UnaryExpression {
    require(words.nonEmpty && words.forall(_.nonEmpty),
      "lexicon must be non-empty words")
    @transient private lazy val wordBytes: Array[Array[Byte]] =
      words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      NativeOps.countTokensIn(v.asInstanceOf[UTF8String], wordBytes)
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("lexicon", wordBytes, "byte[][]")
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.countTokensIn($x, $ref)")
    }
    override protected def withNewChildInternal(newChild: Expression): TokensInCount =
      copy(child = newChild)
    override def prettyName: String = "tokens_in_count"
  }

  /** Guarded percent-decoding for URL canonicalization: decode a %XX escape
    * ONLY when the decoded octet is an RFC 3986 unreserved character
    * (ALPHA / DIGIT / '-' / '.' / '_' / '~'); every other escape — and any
    * malformed '%' — passes through verbatim. This is what production
    * canonicalizers do (gratuitously-escaped URLs must dedup against their
    * plain spelling) while preserving idempotence P1: a decoded char is
    * never '%', and surviving escapes decode to non-unreserved octets, so a
    * second pass is the identity. Notably '+' is NOT touched (URLDecoder's
    * '+'→' ' is the non-idempotent trap this guards against). */
  case class PctDecodeUnreserved(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      NativeOps.pctDecodeUnreserved(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.pctDecodeUnreserved($x)")
    override protected def withNewChildInternal(newChild: Expression): PctDecodeUnreserved =
      copy(child = newChild)
    override def prettyName: String = "pct_decode_unreserved"
  }

  /** Unicode NFC normalization (canonical composition) — the web-text fold
    * that makes "e" + U+0301 dedup/search-equal to the precomposed "é".
    * ASCII fast path returns the input object untouched (the overwhelmingly
    * common case for crawled English text — zero-copy, no decode). */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      NativeOps.nfcNormalize(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.nfcNormalize($x)")
    override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
      copy(child = newChild)
    override def prettyName: String = "nfc_normalize"
  }

  /** Accent/diacritic folding: NFD decomposition with all non-spacing
    * combining marks (Unicode category Mn) dropped, then recomposed NFC —
    * "é"/"ü"/"ñ" → "e"/"u"/"n" (matches DuckDB/utf8proc strip_accents on
    * the Latin range). Same ASCII zero-copy fast path as [[NfcNormalize]]. */
  case class StripAccents(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      NativeOps.stripAccents(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.stripAccents($x)")
    override protected def withNewChildInternal(newChild: Expression): StripAccents =
      copy(child = newChild)
    override def prettyName: String = "strip_accents"
  }

  /** DEFLATE-compressed byte length of a string's UTF-8 bytes (raw
    * deflate, level 6, no zlib/gzip header) — the numerator of the
    * compression-ratio quality signal: boilerplate/template spam
    * compresses far better than natural prose. Deterministic for a given
    * input (single-shot deflate of the whole buffer). */
  case class DeflateLen(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(v: Any): Any =
      NativeOps.deflateLen(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, x => s"graft.functions.NativeOps.deflateLen($x)")
    override protected def withNewChildInternal(newChild: Expression): DeflateLen =
      copy(child = newChild)
    override def prettyName: String = "deflate_len"
  }

  // ---- Column-facing API --------------------------------------------------

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def dot_product(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def hamming(a: Column, b: Column): Column =
    Bridge.column(HammingDistance(Bridge.expression(a), Bridge.expression(b)))
  def rolling_hash(c: Column): Column = Bridge.column(RollingHash(Bridge.expression(c)))
  def simhash(c: Column): Column = Bridge.column(SimHash(Bridge.expression(c)))
  def minhash_sig(c: Column, numHashes: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(c), numHashes))
  def shingles3(c: Column): Column = shingles_n(c, 3)
  def shingles_n(c: Column, n: Int): Column =
    Bridge.column(ShinglesN(Bridge.expression(c), n))
  def shingles_all_n(c: Column, n: Int): Column =
    Bridge.column(ShinglesAllN(Bridge.expression(c), n))
  def winnow_fps(c: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFps(Bridge.expression(c), k, w))
  def pct_decode_unreserved(c: Column): Column =
    Bridge.column(PctDecodeUnreserved(Bridge.expression(c)))
  def tokens_in_count(c: Column, words: Seq[String]): Column =
    Bridge.column(TokensInCount(Bridge.expression(c), words))
  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
  def strip_accents(c: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(c)))
  def deflate_len(c: Column): Column =
    Bridge.column(DeflateLen(Bridge.expression(c)))

  /** Register all native functions for SQL use in this session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "cosine_sim", es => CosineSimilarity(es(0), es(1)))
    Bridge.registerFunction(spark, "dot_product", es => DotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "hamming", es => HammingDistance(es(0), es(1)))
    Bridge.registerFunction(spark, "rolling_hash", es => RollingHash(es.head))
    Bridge.registerFunction(spark, "simhash", es => SimHash(es.head))
    Bridge.registerFunction(spark, "minhash_sig", es =>
      MinHashSig(es(0), es(1).eval().asInstanceOf[Number].intValue()))
    Bridge.registerFunction(spark, "shingles3", es => ShinglesN(es.head, 3))
    Bridge.registerFunction(spark, "shingles_n", es =>
      ShinglesN(es(0), es(1).eval().asInstanceOf[Number].intValue()))
    Bridge.registerFunction(spark, "shingles_all_n", es =>
      ShinglesAllN(es(0), es(1).eval().asInstanceOf[Number].intValue()))
    Bridge.registerFunction(spark, "winnow_fps", es =>
      WinnowFps(es(0), es(1).eval().asInstanceOf[Number].intValue(),
        es(2).eval().asInstanceOf[Number].intValue()))
    Bridge.registerFunction(spark, "pct_decode_unreserved", es => PctDecodeUnreserved(es.head))
    Bridge.registerFunction(spark, "tokens_in_count", es =>
      TokensInCount(es.head, es.tail.map(_.eval().asInstanceOf[UTF8String].toString)))
    Bridge.registerFunction(spark, "nfc_normalize", es => NfcNormalize(es.head))
    Bridge.registerFunction(spark, "strip_accents", es => StripAccents(es.head))
    Bridge.registerFunction(spark, "deflate_len", es => DeflateLen(es.head))
  }
}

/** Static kernels invoked from generated code — must stay JVM-static and
  * allocation-free on the hot path. */
object NativeOps {

  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    while (i < n) {
      val a = x.getFloat(i).toDouble
      val b = y.getFloat(i).toDouble
      dot += a * b; nx += a * a; ny += b * b; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    h
  }

  /** SimHash-64: per whitespace token, hash the token (FNV-1a 64) and
    * accumulate ±1 per bit; sign of each accumulator is the signature bit. */
  def simHash(s: UTF8String): Long = {
    val counts = new Array[Int](64)
    val bytes = s.getBytes
    var i = 0
    var tokenHash = FnvOffset
    var inToken = false
    while (i <= bytes.length) {
      val isSep = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t'
      if (isSep) {
        if (inToken) {
          var b = 0
          while (b < 64) {
            if (((tokenHash >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
          tokenHash = FnvOffset
          inToken = false
        }
      } else {
        tokenHash = (tokenHash ^ (bytes(i) & 0xffL)) * FnvPrime
        inToken = true
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** One-pass MinHash signature over a token array: FNV-1a base hash per
    * token (over raw UTF-8 bytes — no String decode), then a SplitMix64
    * stream of `numHashes` independent 64-bit hashes per token
    * (h_i = splitmix64(base + i·φ)); elementwise min across tokens. */
  def minhashSig(ts: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = ts.numElements()
    var i = 0
    while (i < n) {
      if (!ts.isNullAt(i)) {
        val bytes = ts.getUTF8String(i).getBytes
        var m = FnvOffset
        var j = 0
        while (j < bytes.length) { m = (m ^ (bytes(j) & 0xffL)) * FnvPrime; j += 1 }
        var k = 0
        while (k < numHashes) {
          m += 0x9e3779b97f4a7c15L
          var z = m
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^= z >>> 31
          if (z < mins(k)) mins(k) = z
          k += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Distinct word n-gram shingles, first-occurrence order (see
    * [[expressions.ShinglesN]]). One byte-array copy of the input; every
    * shingle is a zero-copy UTF8String view over it: with split-on-' '
    * semantics adjacent tokens are separated by exactly one space, so the
    * n-gram "t(i) … t(i+n-1)" IS the byte range
    * [start(i), end(i+n-1)) of the input. Dedup via LinkedHashSet keeps
    * the UDF predecessor's first-occurrence order (consumed as a set
    * downstream, but order-stable outputs keep every artifact
    * deterministic). */
  def shinglesN(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    // Token boundaries, Java String.split(' ') semantics: a token per
    // separator gap (empty tokens between consecutive spaces included),
    // trailing empty tokens removed.
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokStart = 0
    while (i <= nb) {
      if (i == nb || b(i) == ' ') {
        starts.add(tokStart); ends.add(i)
        tokStart = i + 1
      }
      i += 1
    }
    var m = starts.size()
    while (m > 0 && ends.get(m - 1) - starts.get(m - 1) == 0) m -= 1 // drop trailing empties
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var k = 0
    while (k + n - 1 < m) {
      seen.add(UTF8String.fromBytes(b, starts.get(k), ends.get(k + n - 1) - starts.get(k)))
      k += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ALL word n-grams in token order (see [[expressions.ShinglesAllN]]):
    * the non-dedup positional sibling of [[shinglesN]] — same split(' ')
    * boundary scan, one zero-copy UTF8String view per window, element i =
    * the n-gram at token position i. */
  def shinglesAllN(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var tokStart = 0
    while (i <= nb) {
      if (i == nb || b(i) == ' ') {
        starts.add(tokStart); ends.add(i)
        tokStart = i + 1
      }
      i += 1
    }
    var m = starts.size()
    while (m > 0 && ends.get(m - 1) - starts.get(m - 1) == 0) m -= 1 // drop trailing empties
    if (m < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - n + 1)
    var k = 0
    while (k + n - 1 < m) {
      out(k) = UTF8String.fromBytes(b, starts.get(k), ends.get(k + n - 1) - starts.get(k))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Winnowing kernel (see [[expressions.WinnowFps]]): token boundaries on
    * ' ' with trailing empties KEPT (Spark `split(text, ' ')` grain — the
    * q94 contract), gram i = byte range [start(i), end(i+k-1)) of the input
    * (adjacent tokens are separated by exactly one space, so no join/copy),
    * sliding w-window minimum via a monotonic index deque (amortized O(1)
    * per gram), dedup into first-occurrence order. Gram comparison is
    * unsigned byte-lexicographic then length — exactly UTF8String binary
    * order, the StringType sort Spark's array_min used before. */
  def winnowN(s: UTF8String, k: Int, w: Int): ArrayData = {
    val b = s.getBytes
    val nb = b.length
    // Spark-split token count: one token per separator gap, trailing kept.
    var m = 1
    var i = 0
    while (i < nb) { if (b(i) == ' ') m += 1; i += 1 }
    if (m < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    var tokStart = 0
    i = 0
    while (i <= nb) {
      if (i == nb || b(i) == ' ') {
        starts(t) = tokStart; ends(t) = i; t += 1
        tokStart = i + 1
      }
      i += 1
    }
    val g = m - k + 1 // gram count; gram x spans bytes [starts(x), ends(x+k-1))
    // unsigned byte-lexicographic compare of grams x and y (then length)
    def cmp(x: Int, y: Int): Int = {
      var a = starts(x); val ae = ends(x + k - 1)
      var c = starts(y); val ce = ends(y + k - 1)
      while (a < ae && c < ce) {
        val d = (b(a) & 0xff) - (b(c) & 0xff)
        if (d != 0) return d
        a += 1; c += 1
      }
      (ae - starts(x)) - (ce - starts(y))
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    def add(x: Int): Unit =
      seen.add(UTF8String.fromBytes(b, starts(x), ends(x + k - 1) - starts(x)))
    if (g <= w) {
      // fewer grams than the window: one window over what exists
      var best = 0
      var j = 1
      while (j < g) { if (cmp(j, best) < 0) best = j; j += 1 }
      add(best)
    } else {
      val deque = new Array[Int](g)
      var head = 0
      var tail = 0 // deque holds indices with strictly increasing gram values
      var j = 0
      while (j < g) {
        while (tail > head && cmp(deque(tail - 1), j) >= 0) tail -= 1
        deque(tail) = j; tail += 1
        if (deque(head) <= j - w) head += 1
        if (j >= w - 1) add(deque(head))
        j += 1
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Lexicon token counter (see [[expressions.TokensInCount]]): one pass
    * over the UTF-8 bytes, token boundaries at ' ' (split(' ') grain —
    * empty tokens have length 0 and never match), each token compared
    * byte-for-byte against the precompiled lexicon. Allocation-free. */
  def countTokensIn(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val b = s.getBytes
    val nb = b.length
    var count = 0
    var i = 0
    var tokStart = 0
    while (i <= nb) {
      if (i == nb || b(i) == ' ') {
        val len = i - tokStart
        if (len > 0) {
          var w = 0
          var matched = false
          while (w < words.length && !matched) {
            val wb = words(w)
            if (wb.length == len) {
              var j = 0
              while (j < len && wb(j) == b(tokStart + j)) j += 1
              matched = j == len
            }
            w += 1
          }
          if (matched) count += 1
        }
        tokStart = i + 1
      }
      i += 1
    }
    count
  }

  private def hexVal(b: Byte): Int = {
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else -1
  }

  private def isUnreserved(v: Int): Boolean =
    (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') || (v >= '0' && v <= '9') ||
      v == '-' || v == '.' || v == '_' || v == '~'

  /** Guarded %XX decode (see [[expressions.PctDecodeUnreserved]]). Byte-level
    * scan: unreserved octets are all ASCII, multi-byte UTF-8 sequences never
    * contain '%' (0x25), so the transform is UTF-8-safe. Returns the input
    * object itself when nothing decodes (the overwhelmingly common case —
    * no copy on the hot path). */
  def pctDecodeUnreserved(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    var i = 0
    var changed = false
    while (i < n && !changed) {
      if (b(i) == '%' && i + 2 < n) {
        val hi = hexVal(b(i + 1)); val lo = hexVal(b(i + 2))
        if (hi >= 0 && lo >= 0 && isUnreserved((hi << 4) | lo)) changed = true
      }
      i += 1
    }
    if (!changed) return s
    val out = new Array[Byte](n)
    var w = 0
    i = 0
    while (i < n) {
      var decoded = false
      if (b(i) == '%' && i + 2 < n) {
        val hi = hexVal(b(i + 1)); val lo = hexVal(b(i + 2))
        if (hi >= 0 && lo >= 0 && isUnreserved((hi << 4) | lo)) {
          out(w) = ((hi << 4) | lo).toByte; w += 1; i += 3; decoded = true
        }
      }
      if (!decoded) { out(w) = b(i); w += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, w)
  }

  /** String twin of [[pctDecodeUnreserved]] for the pure-Scala
    * canonicalization flavor (sequential oracle, fixture generator) —
    * CoreSpec pins byte-agreement between the two. */
  def pctDecodeUnreservedScala(s: String): String =
    pctDecodeUnreserved(UTF8String.fromString(s)).toString

  /** True iff every byte is ASCII — the fast-path guard for the unicode
    * folds (an all-ASCII string is NFC-normal and accent-free by
    * construction, so the input object is returned untouched). */
  private def isAscii(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) { if (b(i) < 0) return false; i += 1 }
    true
  }

  def nfcNormalize(s: UTF8String): UTF8String = {
    val b = s.getBytes
    if (isAscii(b)) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val b = s.getBytes
    if (isAscii(b)) return s
    val nfd = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    // Recompose what remains (e.g. Hangul syllables decomposed by NFD).
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC))
  }

  def deflateLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true) // raw deflate, no zlib header
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
}
