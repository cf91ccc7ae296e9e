package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ApproxQuantile, DotProduct, HllDistinct, HllMergeEstimate, HllSketchAgg, HllUnionSketch, MinHashSig, RollingHash64, ShingleHashes, SimHash64}

/** SparkSessionExtensions entry point: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) get the engine's
  * custom expressions as SQL functions — the idiomatic way a Spark
  * library ships language surface to a cluster.
  *
  * The function table lives in the companion so
  * [[graft.functions.registerAll]] (the already-running-session path
  * `getOrCreate()` silently ignores extensions for) registers the
  * IDENTICAL surface — the two entry points can't drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}

object GraftExtensions {

  /** Evaluate a constant integer argument of a SQL function call.
    * SQL integer literals surface as java.lang.Integer, but a BIGINT
    * literal is a Long and a CAST'd constant may be Decimal — accept
    * all exact forms; reject non-foldable (column) arguments with a
    * clean analysis-time error instead of a ClassCastException or a
    * bogus eval of an unbound attribute.
    */
  private def intArg(fn: String, e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument must be a constant integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long =>
        if (l < Int.MinValue || l > Int.MaxValue)
          throw new IllegalArgumentException(s"$fn: constant $l out of Int range")
        l.intValue()
      case s: java.lang.Short => s.intValue()
      case b: java.lang.Byte => b.intValue()
      case d: org.apache.spark.sql.types.Decimal if d.scale == 0 => d.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument must be a constant integer, got $other")
    }
  }

  private def doubleArg(e: Expression): Double = {
    // same guards as intArg: a column arg would eval an unbound
    // attribute (internal error), a NULL would NPE on toString —
    // both deserve clean analysis-time messages
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"argument must be a constant number, got non-foldable ${e.sql}")
    e.eval() match {
      // SQL numeric literals surface as Decimal, not Double
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case d: java.lang.Double => d
      case null =>
        throw new IllegalArgumentException("argument must be a constant number, got NULL")
      case other => other.toString.toDouble
    }
  }

  /** Evaluate a constant array(q, ...) of numbers — same foldability
    * discipline as intArg/mergesArg.
    */
  private def doubleSeqArg(fn: String, e: Expression): Seq[Double] = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: argument must be a constant numeric array, got non-foldable ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        val et = e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType
        (0 until a.numElements()).map { i =>
          a.get(i, et) match {
            case d: org.apache.spark.sql.types.Decimal => d.toDouble
            case d: java.lang.Double => d.doubleValue()
            case f: java.lang.Float => f.doubleValue()
            case n: java.lang.Number => n.doubleValue()
            case null => throw new IllegalArgumentException(
              s"$fn: array elements must be non-NULL numbers")
          }
        }
      case _ => throw new IllegalArgumentException(
        s"$fn: argument must be a constant numeric array")
    }
  }

  /** (name, usage, builder) for every SQL-exposed kernel — consumed
    * by both the extensions injector and registerAll.
    */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("rolling_hash64", "rolling_hash64(str) - 64-bit rolling-hash fingerprint",
      (exprs: Seq[Expression]) => RollingHash64(exprs.head)),
    ("simhash64", "simhash64(array<string>) - 64-bit SimHash signature",
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    ("pii_scrub", "pii_scrub(str) - one-pass email/phone redaction: struct(red_text, n_emails, n_phones)",
      (exprs: Seq[Expression]) => graft.functions.PiiScrub(exprs.head)),
    ("minhash_sig", "minhash_sig(array<bigint>) - 64-long MinHash signature",
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)),
    ("dot_product", "dot_product(arr, arr) - double-accumulated dot product",
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))),
    ("z_interleave", "z_interleave(bigint, bigint) - Morton Z-order key (low 21 bits each)",
      (exprs: Seq[Expression]) => graft.functions.ZInterleave(exprs.head, exprs(1))),
    ("shingle_hashes", "shingle_hashes(array<string>, k) - distinct xxhash64'd k-shingles",
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        intArg("shingle_hashes", exprs(1)))),
    ("hll_distinct", "hll_distinct(col[, p]) - HyperLogLog approximate count distinct",
      (exprs: Seq[Expression]) => HllDistinct(exprs.head,
        if (exprs.size > 1) intArg("hll_distinct", exprs(1)) else 12)
        .toAggregateExpression()),
    ("approx_quantile_sketch", "approx_quantile_sketch(col, q) - mergeable compactor quantile sketch",
      (exprs: Seq[Expression]) => ApproxQuantile(exprs.head, doubleArg(exprs(1)))
        .toAggregateExpression()),
    ("repetition_stats", "repetition_stats(array<string>, k) - [max_count, total_count] of the k-shingle multiset",
      (exprs: Seq[Expression]) => graft.functions.RepetitionStats(exprs.head,
        intArg("repetition_stats", exprs(1)))),
    ("tdigest_quantile", "tdigest_quantile(col, q) - mergeable t-digest quantile (tail-accurate)",
      (exprs: Seq[Expression]) => org.apache.spark.sql.catalyst.expressions.GetArrayItem(
        graft.functions.TDigestQuantile(exprs.head,
          Seq(doubleArg(exprs(1)))).toAggregateExpression(),
        org.apache.spark.sql.catalyst.expressions.Literal(0))),
    ("tdigest_quantiles", "tdigest_quantiles(col, array(q, ...)) - N quantile points from ONE t-digest build",
      (exprs: Seq[Expression]) => graft.functions.TDigestQuantile(exprs.head,
        doubleSeqArg("tdigest_quantiles", exprs(1))).toAggregateExpression()),
    ("bloom_agg", "bloom_agg(col[, numBits[, k]]) - mergeable Bloom filter blob over BIGINT keys",
      (exprs: Seq[Expression]) => graft.functions.BloomFilterAgg(exprs.head,
        if (exprs.size > 1) intArg("bloom_agg", exprs(1)) else 1 << 20,
        if (exprs.size > 2) intArg("bloom_agg", exprs(2)) else 5)
        .toAggregateExpression()),
    ("bloom_might_contain", "bloom_might_contain(blob, key) - codegen'd Bloom membership probe",
      (exprs: Seq[Expression]) =>
        graft.functions.BloomMightContain(exprs.head, exprs(1))),
    ("topk_freq", "topk_freq(col, k[, capacity]) - SpaceSaving heavy-hitters sketch (item, cnt, err)",
      (exprs: Seq[Expression]) => graft.functions.SpaceSavingTopK(exprs.head,
        intArg("topk_freq", exprs(1)),
        if (exprs.size > 2) intArg("topk_freq", exprs(2)) else 4096)
        .toAggregateExpression()),
    ("bottomk_sample", "bottomk_sample(id, k, seed) - deterministic bottom-k (KMV) uniform sample",
      (exprs: Seq[Expression]) => graft.functions.BottomKSample(exprs.head,
        intArg("bottomk_sample", exprs(1)),
        exprs(2).eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => other.toString
        }).toAggregateExpression()),
    ("hll_sketch", "hll_sketch(col[, p]) - HLL register file as a storable binary",
      (exprs: Seq[Expression]) => HllSketchAgg(exprs.head,
        if (exprs.size > 1) intArg("hll_sketch", exprs(1)) else 12)
        .toAggregateExpression()),
    ("hll_merge", "hll_merge(sketch[, p]) - merge stored HLL sketches into a distinct estimate",
      (exprs: Seq[Expression]) => HllMergeEstimate(exprs.head,
        if (exprs.size > 1) intArg("hll_merge", exprs(1)) else 12)
        .toAggregateExpression()),
    ("hll_union", "hll_union(sketch[, p]) - union stored HLL sketches into one merged sketch",
      (exprs: Seq[Expression]) => HllUnionSketch(exprs.head,
        if (exprs.size > 1) intArg("hll_union", exprs(1)) else 12)
        .toAggregateExpression()),
    ("topk_sketch", "topk_sketch(col[, capacity]) - SpaceSaving state as a storable binary",
      (exprs: Seq[Expression]) => graft.functions.SpaceSavingSketchAgg(exprs.head,
        if (exprs.size > 1) intArg("topk_sketch", exprs(1)) else 4096)
        .toAggregateExpression()),
    ("topk_merge", "topk_merge(sketch, k[, capacity]) - merge stored SpaceSaving sketches, emit top-k",
      (exprs: Seq[Expression]) => graft.functions.SpaceSavingMergeTopK(exprs.head,
        intArg("topk_merge", exprs(1)),
        if (exprs.size > 2) intArg("topk_merge", exprs(2)) else 4096)
        .toAggregateExpression()),
    ("cms_sketch", "cms_sketch(col[, depth[, widthLog2]]) - Count-Min grid as a storable binary",
      (exprs: Seq[Expression]) => graft.functions.CmsSketchAgg(exprs.head,
        if (exprs.size > 1) intArg("cms_sketch", exprs(1)) else 4,
        if (exprs.size > 2) intArg("cms_sketch", exprs(2)) else 11)
        .toAggregateExpression()),
    ("cms_union", "cms_union(sketch[, depth[, widthLog2]]) - fold stored CMS grids (element-wise add)",
      (exprs: Seq[Expression]) => graft.functions.CmsUnionSketch(exprs.head,
        if (exprs.size > 1) intArg("cms_union", exprs(1)) else 4,
        if (exprs.size > 2) intArg("cms_union", exprs(2)) else 11)
        .toAggregateExpression()),
    ("cms_query", "cms_query(sketch, key) - point-frequency probe into a stored CMS binary",
      (exprs: Seq[Expression]) => graft.functions.CmsQuery(exprs.head, exprs(1))),
    ("cms_inner", "cms_inner(sketchA, sketchB) - join-cardinality estimate (counter dot product, >= exact)",
      (exprs: Seq[Expression]) => graft.functions.CmsInnerProduct(exprs.head, exprs(1))),
    ("bpe_apply", "bpe_apply(array<string>, array(array(l,r),...)) - apply an ordered constant BPE merge list in one pass",
      (exprs: Seq[Expression]) => graft.functions.BpeApply(exprs.head,
        mergesArg("bpe_apply", exprs(1)))),
  )

  /** Evaluate a constant merge-list argument: array(array('l','r'),
    * ...) — same foldability discipline as intArg (clean analysis-time
    * error, never an unbound-attribute eval).
    */
  private def mergesArg(fn: String, e: Expression): Seq[(String, String)] = {
    if (!e.foldable)
      throw new IllegalArgumentException(
        s"$fn: merge list must be a constant array of 2-element arrays, " +
          s"got non-foldable ${e.sql}")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          a.get(i, e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
            .elementType) match {
            case p: org.apache.spark.sql.catalyst.util.ArrayData
                if p.numElements() == 2 =>
              (p.getUTF8String(0).toString, p.getUTF8String(1).toString)
            case other => throw new IllegalArgumentException(
              s"$fn: each merge must be a 2-element array, got $other")
          }
        }
      case other => throw new IllegalArgumentException(
        s"$fn: merge list must be a constant array, got $other")
    }
  }
}
