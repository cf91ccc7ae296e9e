package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.operators.CurationQueries
import graft.sources.Tables
import graft.text.TextAnalysis

/** End-to-end corpus-curation pipeline over `documents`: the chain a
  * training-data team actually runs, composed from the library's
  * stages. Prints the funnel; exits nonzero if any stage produces an
  * inconsistent count.
  *
  * Usage: runMain graft.PipelineDemo [sfDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(cores = 8, appName = "graft-pipeline-demo")
    val docs = Tables(spark, sfDir).documents
    val raw = docs.count()

    // 0. PII scrub (map-only; counts verify the pass ran)
    val redacted = operators.CorpusQueries.qPiiRedact(spark, sfDir)
    val redactions = redacted.agg(sum(col("n_emails") + col("n_phones")))
      .head.getLong(0)

    // 1. quality filter (Gopher-style bounds)
    val quality = TextAnalysis.qualityFeatures(docs)
      .filter(col("n_words").between(20, 100000) &&
        col("mean_word_len").between(2.0, 10.0) && col("n_stopwords") >= 1)
      .select("doc_id")
    val kept = quality.count()

    // 2. near-dup clusters (trigram Jaccard >= 0.5) -> keep canonical
    val pairs = Dedup.ngramJaccardPairs(docs, minJaccard = 0.5).select("id_a", "id_b")
    val clusters = Dedup.connectedComponents(pairs, docs.select(col("doc_id").as("id")))
    val canonical = clusters.filter(col("id") === col("cluster_id")).select("id")
    val deduped = quality.join(canonical, quality("doc_id") === canonical("id"), "left_semi")
    val afterDedup = deduped.count()

    // 2b. benchmark decontamination via the Bloom prefilter: drop
    // training docs sharing a 5-gram with the held-out src0 set
    val contaminated = operators.CorpusQueries.qBloomContamination(spark, sfDir)
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val afterDecontam = clean.count()

    // 3. deterministic split of the surviving corpus
    val surviving = docs.join(clean, "doc_id")
      .withColumn("h", ((col("doc_id") % 100003L) * 31L + 7L) % 100L)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
    val split = surviving.groupBy("split").count().orderBy("split")
    val splits = split.collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    val splitTotal = split.agg(sum("count")).head.getLong(0)

    // 4. pack the train split into 2048-token context bins (8 shards)
    val packed = surviving.filter(col("split") === "train")
      .withColumn("n_tok",
        size(org.apache.spark.sql.functions.split(col("text"), " ")))
      .withColumn("shard", ((col("doc_id") % 97L) * 13L + 5L) % 8L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val bins = packed.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(2048.0)).cast("long"))
      .groupBy(col("shard"), col("bin")).agg(count(lit(1)).as("n"))
    val nBins = bins.count()
    val trainDocs = packed.count()

    println(s"[ PipelineDemo ] raw=$raw (redactions=$redactions) -> quality=$kept " +
      s"-> deduped=$afterDedup -> decontaminated=$afterDecontam " +
      s"-> splits: $splits -> packed train: $trainDocs docs into $nBins bins")
    spark.stop()
    if (kept > raw || afterDedup > kept || afterDecontam > afterDedup ||
      splitTotal != afterDecontam || redactions < raw ||
      (trainDocs > 0 && nBins == 0)) sys.exit(1)
  }
}
