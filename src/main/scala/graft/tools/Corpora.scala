package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic corpora for skew/stress experiments (dev
  * tooling, not part of the driver contract).
  */
object Corpora {

  /** Heavy-tailed corpus with the documents-table schema (doc_id,
    * text, lang, source, n_chars), modeling the case where prefix
    * filtering pays: every doc opens with one of `nTemplates`
    * boilerplate phrases (shared headers/footers — trigram df ~
    * nDocs/nTemplates, the Zipfian head), followed by a log-uniform
    * Zipf(1) word tail (the unique mass). The hot template trigrams
    * blow up the plain inverted-index join quadratically while
    * contributing no Jaccard>=0.5 pairs; the planted exact dups
    * (every 7th doc copies its predecessor) are the true pair set.
    * Fully hash-deterministic — no RNG state.
    */
  def zipf(spark: SparkSession, nDocs: Long, vocab: Int = 30000,
           docLen: Int = 60, nTemplates: Int = 10, templateLen: Int = 16): DataFrame = {
    val seed = when(pmod(col("id"), lit(7L)) === 0L && col("id") > 0L,
      col("id") - 1L).otherwise(col("id"))
    val templateId = pmod(xxhash64(col("seed") * lit(31L) + lit(5L)), lit(nTemplates.toLong))
    val words = transform(sequence(lit(1), lit(docLen)), j => {
      // u in [0, 1) from the top 53 bits of a per-(doc, position) hash
      val h = xxhash64(col("seed") * lit(1000003L) + j)
      val u = shiftrightunsigned(h, 11).cast("double") / lit(9007199254740992.0)
      when(j <= templateLen,
        concat(lit("t"), col("tid").cast("string"), lit("_"), j.cast("string")))
        .otherwise(
          concat(lit("w"), least(floor(pow(lit(vocab.toDouble), u)), lit(vocab.toLong))
            .cast("long").cast("string")))
    })
    spark.range(nDocs)
      .withColumn("seed", seed)
      .withColumn("tid", templateId)
      .select(col("id").as("doc_id"), concat_ws(" ", words).as("text"))
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("zipf"))
      .withColumn("n_chars", length(col("text")).cast("int"))
  }
}
