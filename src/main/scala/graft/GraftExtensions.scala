package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ApproxQuantile, DotProduct, HllDistinct, MinHashSig, RollingHash64, ShingleHashes, SimHash64}

/** SparkSessionExtensions entry point: sessions built with
  * `.withExtensions(new GraftExtensions)` (or
  * `spark.sql.extensions=graft.GraftExtensions`) get the engine's
  * custom expressions as SQL functions — the idiomatic way a Spark
  * library ships language surface to a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("rolling_hash64"),
      info("rolling_hash64", "rolling_hash64(str) - 64-bit rolling-hash fingerprint"),
      (exprs: Seq[Expression]) => RollingHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash signature"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(array<bigint>) - 64-long MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(arr, arr) - double-accumulated dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(array<string>, k) - distinct xxhash64'd k-shingles"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs.head,
        exprs(1).eval().asInstanceOf[Int])))
    ext.injectFunction((FunctionIdentifier("hll_distinct"),
      info("hll_distinct",
        "hll_distinct(col[, p]) - HyperLogLog approximate count distinct"),
      (exprs: Seq[Expression]) => HllDistinct(exprs.head,
        if (exprs.size > 1) exprs(1).eval().asInstanceOf[Int] else 12)
        .toAggregateExpression()))
    ext.injectFunction((FunctionIdentifier("approx_quantile_sketch"),
      info("approx_quantile_sketch",
        "approx_quantile_sketch(col, q) - mergeable compactor quantile sketch"),
      (exprs: Seq[Expression]) => ApproxQuantile(exprs.head,
        exprs(1).eval() match {
          // SQL numeric literals surface as Decimal, not Double
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case d: java.lang.Double => d
          case other => other.toString.toDouble
        }).toAggregateExpression()))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}
