package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis

/** C-block extensions: corpus-curation operators (SURVEY.md §2
  * C13-C16) — the steps between "deduped text" and "training set".
  */
object CurationQueries {

  /** C13: deterministic train/val/test split. The split key is an
    * affine hash of the doc id in small-int space (exact in any
    * engine, no RNG, stable across reruns/backfills — the property
    * that matters when a 100 TB corpus is re-materialized).
    */
  def qSampleSplit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("h", ((col("doc_id") % 100003L) * 31L + 7L) % 100L)
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .orderBy(col("split"))

  /** C14: dedup keep-best — among exact duplicates keep the highest
    * quality doc (longest, then smallest id), not blindly the first.
    */
  def qDedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("text"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables(spark, dir).documents
      .withColumn("rk", row_number().over(w))
      .select(col("doc_id"), (col("rk") === 1).cast("int").as("keep"))
      .orderBy(col("doc_id"))
  }

  /** C15: corpus composition stats per (lang, source) — the numbers a
    * data-mixture design reads off.
    */
  def qCorpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("lang"), col("source"))

  /** C16: benchmark contamination — which "training" docs share a
    * 5-gram with the held-out set (source src0 stands in for the
    * benchmark)? Inverted-index join on hashed 5-grams: linear in
    * corpus size, the shape that survives 100 TB.
    */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    // source rides along the posting rows (no docs join); shingle
    // hashing is a cheap codegen'd pass now, so computing the posting
    // list once per branch beats paying a cache materialization
    val grams = docs.select(col("doc_id"), col("source"),
        explode(graft.functions.shingle_hashes(split(col("text"), " "), 5)).as("gh"))
    val eval = grams.filter(col("source") === "src0")
      .select(col("gh"), col("doc_id").as("eval_id"))
    val train = grams.filter(col("source") =!= "src0")
      .select(col("gh"), col("doc_id").as("train_id"))
    train.join(eval, Seq("gh"))
      .groupBy(col("train_id"))
      .agg(countDistinct(col("eval_id")).as("n_eval_docs"),
        count(lit(1)).as("n_shared_grams"))
      .orderBy(col("train_id"))
  }

  /** C17: intra-document repetition (Gopher-style quality rule) — the
    * most frequent word trigram's share of all trigram positions.
    * High values flag boilerplate/spam.
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    // Repetition is an intra-document statistic, so the whole
    // count/max/total runs inside ONE codegen'd projection
    // (RepetitionStats expression) — no shuffle at all. The previous
    // shape (explode every trigram occurrence, (doc,gram) groupBy,
    // doc groupBy) paid two aggregation exchanges over the corpus'
    // full trigram stream and string group keys; at 100 TB that is
    // the difference between a map-only pass and the biggest shuffle
    // in the pipeline. Docs with < 3 tokens have no trigrams and are
    // excluded (same as the unnest-based oracle).
    Tables(spark, dir).documents
      .select(col("doc_id"),
        graft.functions.repetition_stats(split(col("text"), " "), 3).as("rs"))
      .select(col("doc_id"),
        col("rs").getItem(0).as("max_tri"), col("rs").getItem(1).as("n_tri"))
      .filter(col("n_tri") > 0)
      .withColumn("rep_ratio", col("max_tri").cast("double") / col("n_tri"))
      .orderBy(col("doc_id"))
  }

  /** C18: composite quality filter (Gopher-rule shape): word count,
    * mean word length, and stopword-presence bounds -> keep flag.
    */
  def qQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityFeatures(Tables(spark, dir).documents)
    q.select(col("doc_id"),
        (col("n_words").between(20, 100000) &&
         col("mean_word_len").between(2.0, 10.0) &&
         col("n_stopwords") >= 1).cast("int").as("keep"),
        col("n_words"), col("n_stopwords"))
      .orderBy(col("doc_id"))
  }

  /** C21: per-stratum deterministic sampling at DIFFERENT rates — the
    * mixture-rebalancing primitive (upweight rare languages, downsample
    * dominant sources). The keep decision is an affine hash of doc_id
    * in percent space, so any engine reproduces it and re-materializing
    * a 100 TB corpus keeps the identical sample.
    */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val pct = ((col("doc_id") % 100003L) * 31L + 7L) % 100L
    val rate = when(col("lang") === "en", 25)
      .when(col("lang") === "de", 50)
      .otherwise(100)
    Tables(spark, dir).documents
      .withColumn("keep", (pct < rate).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_kept"),
        sum(when(col("keep") === 1, col("n_chars")).otherwise(0L)).cast("long")
          .as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** C22: token-budget mixture plan — given per-(lang, source) target
    * weights and a global token budget, the per-group sampling rate
    * that hits the budget: rate_g = min(1, budget * w_g / tokens_g).
    * This is the table a data-mixture design feeds back into C21;
    * computing it is one aggregation over the corpus (the 100 TB
    * version reads precomputed corpus stats instead).
    */
  def qMixturePlan(spark: SparkSession, dir: String): DataFrame = {
    val budget = 200000L
    val d = Tables(spark, dir).documents
      .withColumn("n_tok", size(split(col("text"), " ")))
    val stats = d.groupBy(col("lang"))
      .agg(sum(col("n_tok")).cast("long").as("tokens"))
    // equal weight per language (the design input; any weights work)
    val nLangs = lit(4)
    stats
      .withColumn("target_tokens", lit(budget) / nLangs)
      .withColumn("rate",
        least(lit(1.0), col("target_tokens").cast("double") / col("tokens")))
      .withColumn("planned_tokens",
        least(col("target_tokens"), col("tokens")).cast("long"))
      .select(col("lang"), col("tokens"), col("rate"), col("planned_tokens"))
      .orderBy(col("lang"))
  }

  /** C20: sequence packing — greedily pack documents into fixed-size
    * training context windows (2048 tokens), sharded so the packing
    * window never becomes a global sort: shard = affine hash of
    * doc_id (8 shards), docs packed in doc_id order WITHIN a shard.
    * At 100 TB each shard's running sum is an independent partition
    * of the window shuffle — no single-partition bottleneck — and
    * shard count scales with the cluster.
    */
  def qPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val ctx = 2048
    val d = Tables(spark, dir).documents
      .withColumn("n_tok", size(split(col("text"), " ")))
      .withColumn("shard", ((col("doc_id") % 97L) * 13L + 5L) % 8L)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / lit(ctx.toDouble)).cast("long"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("bin"))
  }

  /** C22b: APPLY the mixture plan — join each doc to its language's
    * computed sampling rate (broadcast: the plan is nLangs rows) and
    * keep by the same deterministic percent-hash as C21; reports the
    * achieved per-language mixture. Budget 20000 so the dominant
    * language actually downsamples at test scale. The full loop a
    * mixture designer runs: stats -> rates -> materialized sample,
    * all engine-reproducible.
    */
  def qMixtureApply(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
      .withColumn("n_tok", size(split(col("text"), " ")))
    val plan = d.groupBy(col("lang"))
      .agg(sum(col("n_tok")).cast("long").as("tokens"))
      .withColumn("rate",
        least(lit(1.0), lit(20000.0 / 4) / col("tokens").cast("double")))
      .select(col("lang"), col("rate"))
    val pct = ((col("doc_id") % 100003L) * 31L + 7L) % 100L
    d.join(broadcast(plan), "lang")
      .withColumn("keep", (pct.cast("double") < col("rate") * 100.0).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep")).cast("long").as("n_kept"),
        sum(col("keep") * col("n_tok")).cast("long").as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /** C30: curriculum ordering — global training order by quality tier
    * (word-count bucket, easy-to-hard) with a deterministic shuffle
    * WITHIN each tier (md5 priority, like C27). Position assignment
    * is range-sort + zipWithIndex, never a single-partition window.
    */
  def qCurriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables(spark, dir).documents
      .withColumn("tier",
        least(lit(3L), floor(size(split(col("text"), " ")) / lit(50.0)).cast("long")))
    val key = md5(concat(lit("graft-curr-1:"), col("doc_id").cast("string")))
    d.select(col("doc_id"), col("tier"), key.as("k"))
      .orderBy(col("tier"), col("k"), col("doc_id"))
      .select(col("doc_id"), col("tier")).as[(Long, Long)].rdd
      .zipWithIndex()
      .map { case ((id, t), i) => (id, t, i + 1L) }
      .toDF("doc_id", "tier", "pos")
      .orderBy(col("doc_id"))
  }

  /** C31: corpus-informed rarity score — each word's global frequency
    * RANK (dense corpus statistic), per-doc mean rank as the quality
    * signal (high = rare-word-heavy). All integer math (counts,
    * ranks, scaled mean), so the score is bit-reproducible anywhere —
    * the trap this sidesteps is summing per-word log-probs in
    * doubles, whose aggregation order drifts across partitionings.
    * Vocab ranking is sort + zipWithIndex (no single-partition
    * window); the doc-side join shuffles on the word key.
    */
  def qRarityScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Tables(spark, dir).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val freq = w.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val rk = freq.orderBy(col("cnt").desc, col("word"))
      .select(col("word"), col("cnt")).as[(String, Long)].rdd
      .zipWithIndex()
      .map { case ((word, _), i) => (word, i + 1L) }
      .toDF("word", "rank")
    w.join(rk, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("rank")).cast("long").as("rank_sum"),
        floor(sum(col("rank")) * lit(1000.0) / count(lit(1))).cast("long")
          .as("rarity_score"))
      .orderBy(col("doc_id"))
  }

  /** C45: weighted systematic (PPS — probability proportional to
    * size) sampling: a fixed grid of k points over the cumulative
    * weight axis; a doc is picked once per grid point falling in its
    * weight interval (long docs can be picked twice — by design, PPS
    * with replacement). Everything is integer: grid step = total div
    * k, pick count = floor-division difference — bit-identical in
    * any engine, unlike u^(1/w) priority sampling whose pow/log
    * floats drift.
    *
    * The global cumulative weight uses the distributed two-pass
    * prefix sum — range-partition by doc_id, per-partition totals
    * (ONE long per partition to the driver), offset-seeded
    * in-partition scan — NOT a single-partition window; the scan
    * stays parallel at any corpus size. The RDD hop is deliberate:
    * an order-sensitive running scan is genuine per-partition
    * imperative logic.
    */
  def qPpsSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = 50L
    val base = Tables(spark, dir).documents
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("w"))
    val parts = base.repartitionByRange(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)].rdd
    val partTotals = parts.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val total = offsets.last
    require(total >= k, s"total weight $total < k=$k: step would be 0")
    val bcOff = spark.sparkContext.broadcast(offsets)
    val cum = parts.mapPartitionsWithIndex { (i, it) =>
      var acc = bcOff.value(i)
      it.map { case (id, wt) => acc += wt; (id, wt, acc) }
    }.toDF("doc_id", "w", "cw")
    val step = total / k
    val o = step / 2
    // picks in (cw-w, cw]: count of grid points o + j*step inside —
    // the +step shift keeps numerators positive so div == floor in
    // both engines
    val nPicks = expr(
      s"((cw - 1 - $o + $step) div $step) - ((cw - w - 1 - $o + $step) div $step)")
    cum.withColumn("n_picks", nPicks)
      .filter(col("n_picks") >= 1L)
      .select(col("doc_id"), col("n_picks"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_rarity_score"    -> (qRarityScore _),
    "q_mixture_apply"   -> (qMixtureApply _),
    "q_curriculum_order" -> (qCurriculumOrder _),
    "q_pack_sequences"  -> (qPackSequences _),
    "q_sample_split"    -> (qSampleSplit _),
    "q_dedup_keepbest"  -> (qDedupKeepBest _),
    "q_corpus_stats"    -> (qCorpusStats _),
    "q_contamination"   -> (qContamination _),
    "q_repetition"      -> (qRepetition _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_mixture_plan"    -> (qMixturePlan _),
    "q_quality_filter"  -> (qQualityFilter _),
    "q_pps_sample"      -> (qPpsSample _),
  )

  val oracles: Map[String, String] = Map(
    "q_rarity_score" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word FROM documents),
        |freq AS (SELECT word, count(*) AS cnt FROM w GROUP BY word),
        |rk AS (SELECT word, CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank
        |       FROM freq)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        | CAST(sum(rank) AS BIGINT) AS rank_sum,
        | CAST(floor(sum(rank)*1000.0/count(*)) AS BIGINT) AS rarity_score
        |FROM w JOIN rk USING (word) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_mixture_apply" ->
      """WITH d AS (SELECT lang, doc_id, len(string_split(text,' ')) AS n_tok FROM documents),
        |p AS (SELECT lang, least(1.0, (20000/4)/CAST(sum(n_tok) AS BIGINT)) AS rate
        |      FROM d GROUP BY lang)
        |SELECT d.lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN ((d.doc_id % 100003)*31 + 7) % 100 < p.rate*100
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN ((d.doc_id % 100003)*31 + 7) % 100 < p.rate*100
        |   THEN d.n_tok ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM d JOIN p USING (lang) GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    "q_curriculum_order" ->
      """WITH d AS (SELECT doc_id,
        |  least(3, CAST(floor(len(string_split(text,' '))/50) AS BIGINT)) AS tier
        | FROM documents)
        |SELECT doc_id, tier, CAST(row_number() OVER (
        |  ORDER BY tier, md5('graft-curr-1:' || CAST(doc_id AS VARCHAR)), doc_id)
        |  AS BIGINT) AS pos
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH d AS (
        | SELECT doc_id, len(string_split(text,' ')) AS n_tok,
        |  ((doc_id % 97) * 13 + 5) % 8 AS shard
        | FROM documents),
        |c AS (
        | SELECT doc_id, n_tok, shard,
        |  CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        | FROM d)
        |SELECT shard, CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS bin,
        | count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
        | min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_sample_split" ->
      """SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars_total
        |FROM (SELECT ((doc_id % 100003) * 31 + 7) % 100 AS h, n_chars FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_keepbest" ->
      """SELECT doc_id, CAST(rk = 1 AS int) AS keep FROM (
        | SELECT doc_id, row_number() OVER (PARTITION BY text
        |   ORDER BY n_chars DESC, doc_id) AS rk FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        | CAST(sum(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
        | CAST(sum(n_chars) AS BIGINT) AS total_chars,
        | max(len(string_split(text,' '))) AS max_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "q_repetition" ->
      """WITH tri AS (
        | SELECT doc_id, unnest([w[i]||' '||w[i+1]||' '||w[i+2]
        |   for i in generate_series(1, len(w)-2)]) AS g
        | FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)),
        |cnts AS (SELECT doc_id, g, count(*) AS cnt FROM tri GROUP BY 1, 2)
        |SELECT doc_id, max(cnt) AS max_tri, CAST(sum(cnt) AS BIGINT) AS n_tri,
        | CAST(max(cnt) AS double) / sum(cnt) AS rep_ratio
        |FROM cnts GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(keep) AS BIGINT) AS n_kept,
        | CAST(sum(CASE WHEN keep = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM (
        | SELECT lang, n_chars,
        |  CAST(((doc_id % 100003) * 31 + 7) % 100 <
        |    CASE WHEN lang = 'en' THEN 25 WHEN lang = 'de' THEN 50 ELSE 100 END
        |    AS int) AS keep
        | FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // replay of the integer PPS grid: step/offset from the total,
    // pick counts by floor-division difference (// == div on the
    // positive-shifted numerators)
    "q_pps_sample" ->
      """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
        |c AS (SELECT doc_id, w,
        |  sum(w) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw FROM d),
        |t AS (SELECT sum(w) AS tw FROM d),
        |p AS (SELECT doc_id, w, cw, tw // 50 AS step, (tw // 50) // 2 AS o
        |      FROM c, t)
        |SELECT doc_id,
        | CAST(((cw - 1 - o + step) // step)
        |   - ((cw - w - 1 - o + step) // step) AS BIGINT) AS n_picks
        |FROM p
        |WHERE ((cw - 1 - o + step) // step)
        |   - ((cw - w - 1 - o + step) // step) >= 1
        |ORDER BY doc_id""".stripMargin,

    "q_mixture_plan" ->
      """SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tokens,
        | least(1.0, (200000 / 4) / CAST(sum(n_tok) AS BIGINT)) AS rate,
        | CAST(least(200000 / 4, CAST(sum(n_tok) AS BIGINT)) AS BIGINT) AS planned_tokens
        |FROM (SELECT lang, len(string_split(text, ' ')) AS n_tok FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q_quality_filter" ->
      """SELECT doc_id,
        | CAST(n_words BETWEEN 20 AND 100000
        |   AND mean_word_len BETWEEN 2.0 AND 10.0
        |   AND n_stopwords >= 1 AS int) AS keep,
        | n_words, n_stopwords
        |FROM (SELECT doc_id, len(string_split(text,' ')) AS n_words,
        |  len(list_filter(string_split(text,' '),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
        |  list_sum(list_transform(string_split(text,' '), t -> length(t))) * 1.0
        |    / len(string_split(text,' ')) AS mean_word_len
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
        |grams AS (SELECT doc_id, source,
        |  unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]
        |                        for i in generate_series(1, len(w)-4)])) AS g FROM toks)
        |SELECT t.doc_id AS train_id,
        | count(DISTINCT e.doc_id) AS n_eval_docs, count(*) AS n_shared_grams
        |FROM grams t JOIN grams e USING (g)
        |WHERE t.source != 'src0' AND e.source = 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
