package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text/dedup block.
  *
  * Both stay inside whole-stage codegen (RollingHash64 via
  * doGenCode; SimHash64 via a static-method call), so the hot path
  * is a single generated loop per row — no UDF boxing, no Encoder
  * round-trips.
  */
object HashAlgos {
  /** 64-bit polynomial rolling hash over UTF-8 bytes (base 31, odd
    * multiplier; overflow wraps, which is the point). Public-domain
    * construction (Rabin-Karp style).
    */
  def rollingHash(bytes: Array[Byte], offset: Int, len: Int): Long = {
    var h = 1125899906842597L // large prime seed
    var i = offset
    val end = offset + len
    while (i < end) { h = h * 31L + bytes(i); i += 1 }
    h
  }

  /** FNV-1a 64-bit. */
  def fnv1a(bytes: Array[Byte], offset: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = offset
    val end = offset + len
    while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  /** Hash of token i of an ArrayData of strings (used by codegen). */
  def fnv1aOfString(s: UTF8String): Long = {
    val b = s.getBytes
    fnv1a(b, 0, b.length)
  }

  /** SimHash-64 over a token array: per-bit majority vote of token
    * FNV hashes (Charikar 2002).
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1aOfString(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def rollingHashOfString(s: UTF8String): Long = {
    val b = s.getBytes
    rollingHash(b, 0, b.length)
  }

  /** Morton (Z-order) interleave of the LOW 21 BITS of two
    * non-negative longs: a's bit i lands at position 2i, b's at
    * 2i+1 — a 42-bit z-value whose ordering interleaves both
    * dimensions (the multi-dimensional clustering key). Callers
    * normalize inputs into [0, 2^21) first (e.g. minutes since the
    * table's epoch); higher bits are ignored.
    */
  def zInterleave21(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 21) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Sequential left-to-right double-accumulated dot product; the
    * accumulation order is part of the contract (bit reproducibility
    * vs the DuckDB oracle and across partitionings).
    */
  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def dotFloatDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }

  def dotDoubleFloat(a: ArrayData, b: ArrayData): Double = dotFloatDouble(b, a)

  /** 64 affine MinHash permutations over 31-bit space (products stay
    * below 2^62: exact long math, ANSI-safe). Constants derived from
    * FNV so every executor/engine agrees with no RNG state.
    */
  val MinhashMask: Long = 0x7fffffffL
  val minhashPerms: Array[(Long, Long)] = Array.tabulate(64) { j =>
    def f(x: Int): Long = { val bs = BigInt(x).toByteArray; fnv1a(bs, 0, bs.length) }
    ((f(j) & MinhashMask) | 1L, f(j + 1000) & MinhashMask)
  }

  /** One-pass MinHash signature: 64 mins over the hashed-shingle set
    * in a single tight loop — replaces an explode + 64 min() aggs
    * (and the shuffle they imply) with a per-row projection.
    *
    * The 64->31-bit fold XORs the high half in (not a bare mask):
    * property testing caught that masking alone collides any two
    * inputs agreeing in their low 31 bits (-1 vs 2^31-1), which
    * would merge unrelated shingles for non-uniform inputs.
    */
  /** Distinct xxhash64'd k-shingles of a token array in ONE pass.
    *
    * Replaces the transform(sequence)+concat_ws+array_distinct+
    * xxhash64 HOF chain: those lambda functions are interpreted
    * (CodegenFallback), measured ~20x slower than this loop on the
    * dedup hot path — the same lesson as MinHashSig/DotProduct.
    * Hash values equal Spark's `xxhash64(shingle_string)` (seed 42),
    * so signatures are unchanged. Fewer than k tokens => empty set
    * (never fabricates partial shingles).
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      seen.add(org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, StringType, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** C17 hot path: per-document k-shingle repetition stats in ONE
    * pass — returns [max_count, total_count] of the document's
    * k-shingle multiset. Repetition is an intra-document statistic,
    * so there is nothing to shuffle: this replaces an
    * explode + (doc,gram) groupBy + doc groupBy pipeline (two
    * aggregation exchanges over every trigram occurrence in the
    * corpus) with a pure projection. Counting is done on the same
    * xxhash64 values as [[shingleHashes]] in an open-addressing
    * table (no per-gram allocation); a 64-bit in-document collision
    * (~1e-13 for a 1e4-gram doc) is the accepted trade.
    */
  def repetitionStats(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val m = n - k + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(0L, 0L))
    // power-of-two capacity >= 2m keeps load factor <= 0.5
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val keys = new Array[Long](cap)
    val cnts = new Array[Int](cap)
    val mask = cap - 1
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](k)
    var maxC = 0
    var i = 0
    while (i <= n - k) {
      var j = 0
      while (j < k) {
        parts(j) = if (tokens.isNullAt(i + j)) UTF8String.EMPTY_UTF8
                   else tokens.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(s, StringType, 42L)
      var slot = ((h ^ (h >>> 33)).toInt) & mask
      var done = false
      while (!done) {
        if (cnts(slot) == 0) { // empty slot (occupancy tracked by count, not key)
          keys(slot) = h; cnts(slot) = 1
          if (maxC < 1) maxC = 1
          done = true
        } else if (keys(slot) == h) {
          cnts(slot) += 1
          if (cnts(slot) > maxC) maxC = cnts(slot)
          done = true
        } else slot = (slot + 1) & mask
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(maxC.toLong, m.toLong))
  }

  def minhashSig(shingleHashes: ArrayData): ArrayData = {
    val sig = Array.fill(64)(Long.MaxValue)
    val n = shingleHashes.numElements()
    var i = 0
    while (i < n) {
      val h0 = shingleHashes.getLong(i)
      val h = (h0 ^ (h0 >>> 33)) & MinhashMask
      var j = 0
      while (j < 64) {
        val p = minhashPerms(j)
        val v = (h * p._1 + p._2) & MinhashMask
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}

/** C11: document fingerprint — 64-bit rolling hash of the full text.
  * Codegen emits a direct static call; no boxing.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 needs STRING, got ${child.dataType.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    HashAlgos.rollingHashOfString(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashAlgos.rollingHashOfString($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(c)
}

/** C5/C6 hot path: dot product of two float/double array columns with
  * double accumulation. The built-in `aggregate`/`zip_with` HOFs fall
  * back to interpreted eval — at ~10M candidate pairs that's the
  * bottleneck; this stays a tight generated loop.
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def elemType(e: Expression) = e.dataType match {
    case ArrayType(t, _) => t
    case other           => other
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Set[DataType](org.apache.spark.sql.types.FloatType,
      org.apache.spark.sql.types.DoubleType)
    if (ok(elemType(left)) && ok(elemType(right)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product needs ARRAY<FLOAT|DOUBLE> args, got " +
          s"(${elemType(left).sql}, ${elemType(right).sql})")
  }
  private def fnName: String = {
    val lf = elemType(left) == org.apache.spark.sql.types.FloatType
    val rf = elemType(right) == org.apache.spark.sql.types.FloatType
    (lf, rf) match {
      case (true, true)   => "dotFloat"
      case (false, false) => "dotDouble"
      case (true, false)  => "dotFloatDouble"
      case (false, true)  => "dotDoubleFloat"
    }
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    fnName match {
      case "dotFloat"       => HashAlgos.dotFloat(x, y)
      case "dotDouble"      => HashAlgos.dotDouble(x, y)
      case "dotFloatDouble" => HashAlgos.dotFloatDouble(x, y)
      case "dotDoubleFloat" => HashAlgos.dotDoubleFloat(x, y)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashAlgos.$fnName($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(l, r)
}

/** D5: Morton/Z-order interleave of two LONG columns (low 21 bits
  * each -> 42-bit z-value) — the multi-dimensional clustering key
  * for layout that prunes on BOTH dimensions (see
  * store.ZOrderLayout). Codegen'd; deterministic, so the SQL oracle
  * replays it with shift/mask arithmetic.
  */
case class ZInterleave(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_interleave needs (BIGINT, BIGINT), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashAlgos.zInterleave21(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashAlgos.zInterleave21($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZInterleave =
    copy(l, r)
}

/** C2: one-pass MinHash signature (array<long> shingle hashes ->
  * array<long>[64]) — see HashAlgos.minhashSig.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs ARRAY<BIGINT>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    HashAlgos.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.minhashSig($c)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(c)
}

/** C2/C4/C16 hot path: distinct hashed k-shingles of a token array —
  * see HashAlgos.shingleHashes.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes needs ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    HashAlgos.shingleHashes(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.shingleHashes($c, $k)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** C55 hot path: apply an ORDERED LIST of BPE merges to a token
  * array in one imperative pass per merge. Exists because composing
  * per-merge `transform`/`filter` higher-order expressions lets the
  * optimizer collapse the five projections into one and re-inline
  * each layer's input everywhere it is referenced — ~6^5 copies of
  * the base expression, observed as a runaway interpreted-eval tree.
  * The imperative loop is O(tokens x merges) per row, handles the
  * repeated-token case (a a a -> (a_a) a) by skipping the merged
  * position, and matches the C50 fold semantics exactly.
  */
object BpeAlgos {
  def applyMerges(arr: ArrayData, merges: Array[Array[String]]): ArrayData = {
    var cur = new Array[String](arr.numElements())
    var i = 0
    while (i < cur.length) {
      val u = arr.getUTF8String(i)
      cur(i) = if (u == null) null else u.toString
      i += 1
    }
    var m = 0
    while (m < merges.length) {
      val l = merges(m)(0); val r = merges(m)(1); val lr = l + "_" + r
      val out = new Array[String](cur.length)
      var o = 0
      var j = 0
      while (j < cur.length) {
        if (j < cur.length - 1 && l == cur(j) && r == cur(j + 1)) {
          out(o) = lr; o += 1; j += 2
        } else { out(o) = cur(j); o += 1; j += 1 }
      }
      cur = java.util.Arrays.copyOf(out, o)
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cur.map(s => if (s == null) null else UTF8String.fromString(s)))
  }
}

case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  private lazy val mergeArr: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_apply needs ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    BpeAlgos.applyMerges(v.asInstanceOf[ArrayData], mergeArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeAlgos.applyMerges($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeApply =
    copy(child = c)
}

/** C17: per-document repetition stats ([max_count, total_count] of
  * the k-shingle multiset) — see HashAlgos.repetitionStats.
  */
case class RepetitionStats(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size k must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repetition_stats needs ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    HashAlgos.repetitionStats(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.repetitionStats($c, $k)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

/** C8 kernel: one-pass marker-lexicon scoring for language ID. The
  * lexicon maps token -> bitmask of language indexes claiming it
  * (UTF8String keys, so no per-token String allocation); one loop
  * over the token array increments every claiming language's count.
  * The previous form ran one interpreted higher-order `filter` per
  * language (4 corpus passes, HOFs never enter whole-stage codegen);
  * this is a single static-call loop inside codegen.
  */
object LangAlgos {
  def buildLexicon(markers: Seq[(String, Seq[String])])
      : java.util.HashMap[UTF8String, java.lang.Integer] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Integer]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, java.lang.Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  def scores(tokens: ArrayData,
      lexicon: java.util.HashMap[UTF8String, java.lang.Integer],
      nLangs: Int): ArrayData = {
    val counts = new Array[Long](nLangs)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val mask = lexicon.get(t)
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(m)
            counts(b) += 1L
            m &= m - 1
          }
        }
      }
      i += 1
    }
    ArrayData.toArrayData(counts)
  }
}

/** C8: per-language marker counts in one token pass — see
  * [[LangAlgos.scores]].
  */
case class LangScores(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  require(markers.nonEmpty && markers.size <= 32,
    "lang_scores supports 1..32 languages")
  @transient private lazy val lexicon = LangAlgos.buildLexicon(markers)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lang_scores needs ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    LangAlgos.scores(v.asInstanceOf[ArrayData], lexicon, markers.size)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langLexicon", lexicon, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LangAlgos.scores($c, $ref, ${markers.size})")
  }
  override protected def withNewChildInternal(c: Expression): LangScores =
    copy(child = c)
}

/** C24 kernel: one-pass PII scrub. Replaces the three sequential
  * `regexp_replace`/`regexp_extract_all` passes (each a full regex
  * scan of the document) with hand-rolled byte scanners that
  * reproduce the two patterns' Java-regex semantics exactly:
  *
  *   email: `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *   phone: `(\+1-)?555-[0-9]{4}`
  *
  * Both patterns are pure-ASCII character classes, so scanning raw
  * UTF-8 bytes is exact (multi-byte sequences have the high bit set
  * and never match an ASCII class). Match enumeration mirrors
  * leftmost non-overlapping scan with greedy backtracking:
  * an email match anchors at each '@' whose maximal local-class run
  * before it is nonempty (clamped to the previous match's end) and
  * whose domain run splits at the RIGHTMOST '.' followed by >=2
  * letters — exactly where the greedy `+` backtracks to.
  */
object PiiAlgos {
  private def isLocal(b: Byte): Boolean = {
    val c = b.toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  }
  private def isDomain(b: Byte): Boolean = {
    val c = b.toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '-'
  }
  private def isAlpha(b: Byte): Boolean = {
    val c = b.toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
  }
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Appends [start,end) email-match spans to `spans`; returns count. */
  private def emailSpans(s: Array[Byte], spans: java.util.ArrayList[Int]): Int = {
    var n = 0
    var prevEnd = 0
    var i = 0
    while (i < s.length) {
      if (s(i) == '@') {
        // maximal local-class run ending at i-1, clamped to prevEnd
        var lo = i
        while (lo > prevEnd && isLocal(s(lo - 1))) lo -= 1
        if (lo < i) {
          // maximal domain-class run after '@'
          var hi = i + 1
          while (hi < s.length && isDomain(s(hi))) hi += 1
          // rightmost '.' in (i+1, hi) with >=2 letters after it and a
          // nonempty prefix — where the greedy `+` backtracks to
          var dot = hi - 1
          var end = -1
          while (end < 0 && dot > i + 1) {
            if (s(dot) == '.') {
              var le = dot + 1
              while (le < hi && isAlpha(s(le))) le += 1
              if (le - dot - 1 >= 2) end = le
            }
            if (end < 0) dot -= 1
          }
          if (end >= 0) {
            spans.add(lo); spans.add(end)
            n += 1
            prevEnd = end
            i = end - 1 // loop increment lands on `end`
          }
        }
      }
      i += 1
    }
    n
  }

  /** Appends [start,end) phone-match spans to `spans`; returns count. */
  private def phoneSpans(s: Array[Byte], spans: java.util.ArrayList[Int]): Int = {
    var n = 0
    var i = 0
    def core(p: Int): Boolean =
      p + 8 <= s.length && s(p) == '5' && s(p + 1) == '5' && s(p + 2) == '5' &&
        s(p + 3) == '-' && isDigit(s(p + 4)) && isDigit(s(p + 5)) &&
        isDigit(s(p + 6)) && isDigit(s(p + 7))
    while (i < s.length) {
      if (i + 3 <= s.length && s(i) == '+' && s(i + 1) == '1' &&
          s(i + 2) == '-' && core(i + 3)) {
        spans.add(i); spans.add(i + 11); n += 1; i += 11
      } else if (core(i)) {
        spans.add(i); spans.add(i + 8); n += 1; i += 8
      } else i += 1
    }
    n
  }

  private def replaceSpans(s: Array[Byte], spans: java.util.ArrayList[Int],
                           token: Array[Byte]): Array[Byte] = {
    val nSpans = spans.size() / 2
    if (nSpans == 0) return s
    var kept = 0
    var j = 0
    while (j < nSpans) { kept += spans.get(2 * j + 1) - spans.get(2 * j); j += 1 }
    val out = new Array[Byte](s.length - kept + nSpans * token.length)
    var src = 0
    var dst = 0
    j = 0
    while (j < nSpans) {
      val a = spans.get(2 * j); val b = spans.get(2 * j + 1)
      System.arraycopy(s, src, out, dst, a - src); dst += a - src
      System.arraycopy(token, 0, out, dst, token.length); dst += token.length
      src = b
      j += 1
    }
    System.arraycopy(s, src, out, dst, s.length - src)
    out
  }

  private val EmailToken = "<EMAIL>".getBytes("UTF-8")
  private val PhoneToken = "<PHONE>".getBytes("UTF-8")

  /** red_text = phoneReplace(emailReplace(t)); counts are over the
    * ORIGINAL text — byte-identical to the sequential
    * regexp_replace/regexp_extract_all composition it replaces.
    */
  def scrub(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val spans = new java.util.ArrayList[Int](8)
    val nEmails = emailSpans(bytes, spans)
    val red1 = replaceSpans(bytes, spans, EmailToken)
    spans.clear()
    val nPhones = phoneSpans(bytes, spans)
    val phoneOnRed = if (red1 eq bytes) spans else {
      val s2 = new java.util.ArrayList[Int](8)
      phoneSpans(red1, s2)
      s2
    }
    val red2 = replaceSpans(red1, phoneOnRed, PhoneToken)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromBytes(red2), nEmails.toLong, nPhones.toLong))
  }
}

/** C24: fused single-pass PII scrub — see [[PiiAlgos.scrub]]. */
case class PiiScrub(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("red_text", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("n_emails", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_phones", LongType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pii_scrub needs STRING, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    PiiAlgos.scrub(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiAlgos.scrub($c)")
  override protected def withNewChildInternal(c: Expression): PiiScrub = copy(c)
}

/** C3: SimHash-64 over a token array. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs ARRAY<STRING>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    HashAlgos.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashAlgos.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}
