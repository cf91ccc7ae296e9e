package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.rolling_hash64
import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.text.TextAnalysis

/** C-block (SURVEY.md §2): LLM-training-data pipeline operators as
  * driver-contract queries over documents/embeddings.
  */
object PipelineQueries {

  /** C1 */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(spark, dir).documents)
      .select(col("doc_id"), col("canonical_id"), col("group_size"), col("is_canonical"))
      .orderBy(col("doc_id"))

  /** C4: verified near-dup pairs by word-trigram Jaccard. */
  def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(Tables(spark, dir).documents, minJaccard = 0.5, lenBand = 20)

  /** C77: dedup threshold sweep — the aggressiveness-planning knob
    * every dedup rollout tunes FIRST: how many near-dup pairs (and
    * how many touched documents) each candidate Jaccard threshold
    * would act on, in one pass. Pays the C4 inverted-index pass ONCE
    * at the widest screen (0.3), derives integer-ppm Jaccard from
    * the pair counts, and cross-joins the surviving PAIR frame (tiny
    * — pairs, not the corpus) against the 6-row threshold table for
    * cumulative counts. The answer to "what does raising the bar to
    * 0.7 actually delete" before running C1/C14 at that bar.
    */
  def qDedupSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.sources.Tables.spreadIfOneSplit(
      Tables(spark, dir).documents)
    val stats = Dedup.ngramPairStats(docs)
      .withColumn("jppm", expr("inter * 1000000 div (ca + cb - inter)"))
      .filter(col("jppm") >= 300000L)
    val thr = spark.range(3, 9).select((col("id") * 100000L).as("thr_ppm"))
    val pairsAtThr = stats.crossJoin(broadcast(thr))
      .filter(col("jppm") >= col("thr_ppm"))
    val np = pairsAtThr.groupBy(col("thr_ppm")).agg(count(lit(1)).as("n_pairs"))
    val nd = pairsAtThr
      .select(col("thr_ppm"), explode(array(col("id_a"), col("id_b"))).as("id"))
      .distinct()
      .groupBy(col("thr_ppm")).agg(count(lit(1)).as("n_docs"))
    thr.join(np, Seq("thr_ppm"), "left").join(nd, Seq("thr_ppm"), "left")
      .select(col("thr_ppm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("thr_ppm"))
  }

  /** C68: edit-distance-confirmed near-dup — the classic
    * screen-then-verify dedup shape with a SECOND similarity axis:
    * the cheap trigram-Jaccard screen (threshold relaxed to 0.3)
    * proposes candidates, and each pair is CONFIRMED by exact
    * Levenshtein distance on the full texts, kept when the distance
    * is <= 20% of the longer text (division-free: lev*5 <= maxlen).
    * Jaccard on shingle SETS is blind to ordering and local edit
    * density; edit distance is the axis that distinguishes "same
    * words shuffled" from "same text lightly edited". Scale shape:
    * only candidate pairs ever carry text bodies (the screen's
    * inverted index moves 8-byte hashes), and the O(len^2) confirm
    * is paid per SURVIVING candidate — the standard cost structure
    * of a verify stage. Fully oracle-replayable: both engines
    * implement classic unit-cost Levenshtein.
    */
  def qDedupEdit(spark: SparkSession, dir: String): DataFrame = {
    // spread a one-split scan: both the screen's shingle explode and
    // the banded-DP verify are per-row-expensive map work
    val docs = graft.sources.Tables.spreadIfOneSplit(Tables(spark, dir).documents)
    val cand = Dedup.ngramJaccardPairs(docs, minJaccard = 0.3)
      .select(col("id_a"), col("id_b"))
    val t = docs.select(col("doc_id"), col("text"))
    cand
      .join(t.select(col("doc_id").as("id_a"), col("text").as("ta")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("text").as("tb")), "id_b")
      .select(col("id_a"), col("id_b"), col("ta"), col("tb"),
        length(col("ta")).cast("long").as("la"),
        length(col("tb")).cast("long").as("lb"))
      .withColumn("mx", greatest(col("la"), col("lb")))
      // exact lower bound lev >= |la - lb|: pairs whose length gap
      // alone exceeds the band can never survive — no DP run at all
      .filter((col("mx") - least(col("la"), col("lb"))) * 5 <= col("mx"))
      // BANDED Levenshtein (3-arg form, per-row threshold): O(len * band)
      // instead of O(len^2), returns -1 past the band — exact for every
      // kept pair, ~5x cheaper per candidate, and on a duplicate-heavy
      // corpus most candidates exit the DP early
      .withColumn("lev",
        expr("levenshtein(ta, tb, CAST(mx div 5 AS INT))").cast("long"))
      .filter(col("lev") >= 0 && col("lev") * 5 <= col("mx"))
      .select(col("id_a"), col("id_b"), col("lev"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** C41: fuzzy decontamination — near-dup pairs BETWEEN the eval
    * slice (src0 plays the benchmark) and the training remainder;
    * the drop-list a training pipeline applies before a run. Exact
    * inverted-index join with the tiny eval side broadcast (the
    * corpus never shuffles); complements q_contamination /
    * q_bloom_contamination, which catch exact n-gram hits only.
    */
  def qCrossNeardup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir).documents
    Dedup.crossNearDups(
        d.filter(col("source") === "src0"),
        d.filter(col("source") =!= "src0"), minJaccard = 0.5)
      .orderBy(col("eval_id"), col("train_id"))
  }

  /** C4-adaptive: same exact semantics as q_ngram_jaccard, but the
    * plan is chosen at runtime from the measured shingle df skew
    * (plain inverted-index join on flat corpora, PPJoin prefix
    * filtering under a Zipfian tail). The oracle is path-independent
    * because both paths are exact.
    */
  def qNgramAdaptive(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardAdaptive(Tables(spark, dir).documents, minJaccard = 0.5,
      lenBand = 20, precomputed = Some(Dedup.shingleStatsCached(spark, dir)))

  /** C4c: asymmetric containment pairs (|A∩B|/|A| >= 0.6) — catches
    * docs embedded in larger ones, which symmetric Jaccard misses.
    * Skew-adaptive: flat corpora take the single-shuffle unordered
    * pair aggregation, Zipfian ones the asymmetric prefix filter.
    */
  def qContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairsAdaptive(Tables(spark, dir).documents, minContainment = 0.6,
        precomputed = Some(Dedup.shingleStatsCached(spark, dir)))
      .orderBy(col("id_a"), col("id_b"))

  /** C2: MinHash-LSH candidates verified at Jaccard >= 0.8. */
  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables(spark, dir).documents, minJaccard = 0.8)

  /** C106: forget-propagation into the NEAR-DUP index — the third
    * member of the r14 compliance family (A43 corpus purge, C105 ANN
    * index, this one the MinHash-LSH candidate index). The C2 index
    * is landed through the A29 maintenance fold (signature store +
    * bucket posting store), then [[graft.streaming.NearDupStream
    * .forget]] hard-removes the forget set (doc_id % 13 == 0): the
    * forgotten docs' bucket keys are recomputed from the STORED
    * shingle sets (no corpus read), affected posting rows re-fold
    * (docs minus forgotten, emptied buckets drop, deleteOnly merge),
    * and the signature store is purged by key. Gate: [[pairs]] from
    * the purged index equals the one-shot C2 scan restricted to
    * retained ids — exact, because verification is pairwise (a
    * retained pair's Jaccard is unaffected by other docs); the raw
    * double is hash-stable here for the same reason q_dedup_minhash's
    * is (IEEE division of exact integers, identical on both engines).
    */
  def qForgetNeardup(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.NearDupStream
    val docs = Tables(spark, dir).documents
    val root = java.nio.file.Files.createTempDirectory("gq-forget-nd").toString
    NearDupStream.mergeBatch(docs, root, txn = Some(0L))
    NearDupStream.forget(spark, root,
      docs.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("doc_id")), txn = Some(1L))
    NearDupStream.pairs(spark, root, minJaccard = 0.8)
  }

  /** C3: SimHash hamming<=3 pairs. Fully oracle-checked: FNV-1a's
    * 64-bit wraparound is replicated in DuckDB as HUGEINT arithmetic
    * mod 2^64, the per-bit majority votes and the hamming filter in
    * plain SQL (the pigeonhole bucketing emits exactly ALL pairs at
    * hamming <= 3, so brute-force SQL pair generation is the same
    * set).
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables(spark, dir).documents, maxHamming = 3)

  /** C5 */
  def qDedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(Tables(spark, dir).embeddings, threshold = 0.4)

  /** C5 scale path. bits is pinned (not auto-sized) so the oracle can
    * replicate the exact bucket structure: the deterministic
    * hyperplanes are inlined into the SQL as their integer hash
    * constants and the sign-bucket join is recomputed in DuckDB —
    * a FULL oracle for the approximate operator (recall is still
    * spec-measured against the exhaustive twin).
    */
  def qDedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDupsLsh(Tables(spark, dir).embeddings, threshold = 0.4,
      bits = 8)

  /** C6 */
  def qAnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Ann.bruteTopK(emb, emb.filter(col("vec_id") < 8), k = 5)
  }

  /** C53: ANN-quality evaluation — recall@5 of the IVF index
    * (nLists=8, nprobe=2, the C7b production setting) against the
    * exact brute-force top-5, per query. The eval-harness sibling of
    * [[qDedupEval]]: both rankings are deterministic and fully
    * SQL-replayable (the C6 brute scoring + the C7b quantizer
    * replay), so recall is oracle-checked EXACTLY — per query, in
    * integer ppm, no sampling. The join cost is two k-row rank lists
    * per query; the corpus passes are whatever the two channels
    * already cost.
    */
  def qAnnEval(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val q = emb.filter(col("vec_id") < 8)
    // Both harness artifacts LAND once per corpus (the exact-pcts
    // discipline): the ground-truth top-5 is computed once and
    // stored — the standard ANN-eval practice — and the IVF index
    // frames are the artifacts a production service materializes per
    // corpus generation. The benched row then times what a recall
    // eval actually runs per query batch: the IVF QUERY side (probe
    // centroids, score nprobe lists, rank) against the landed index,
    // plus the landed-truth compare — not two index constructions.
    val truth = graft.sources.DerivedTable.readOrBuild(spark, "ann-eval-truth",
      dir, Seq("embeddings"), "brute-k5-q8") {
      Ann.bruteTopK(emb, q, k = 5)
        .select(col("query_id"), col("neighbor_id"))
    }
    // ONE index build shared by both landings: lazy so a warm corpus
    // (both roots landed) never constructs the pipeline or pins its
    // centroid cache entry, and a cold corpus runs seed-pick + Lloyd
    // + assign once — the lists builder reuses the cents builder's
    // cached centroid frame instead of re-running the corpus pass.
    lazy val built = Ann.ivfIndexFrames(emb, 8)
    val cents = graft.sources.DerivedTable.readOrBuild(spark, "ann-ivf-cents",
      dir, Seq("embeddings"), "nLists8") { built._1 }
    val lists = graft.sources.DerivedTable.readOrBuild(spark, "ann-ivf-lists",
      dir, Seq("embeddings"), "nLists8") { built._2 }
    val approx = Ann.ivfQueryTopK(cents, lists, q, k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    q.select(col("vec_id").as("query_id"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("hits"), lit(0L)).as("n_hit"))
      .withColumn("recall_ppm", expr("n_hit * 1000000 div 5"))
      .orderBy(col("query_id"))
  }

  /** C52: dedup-quality evaluation — the harness a curation team
    * runs before trusting a cheap screen: the verified SimHash pair
    * set (hamming <= 3, the C3 operator) scored against exact
    * 3-shingle Jaccard >= 0.5 ground truth (the C4 inverted-index
    * shape with the threshold as an INTEGER compare: 2·inter >=
    * union — no float crosses the boundary). Reports candidate/
    * truth/hit counts and precision/recall in exact ppm. Both sides
    * are deterministic and fully SQL-replayable (the C3 FNV-1a
    * HUGEINT replay + the C4 string-shingle replay), so unlike the
    * usual sampled eval, the oracle checks the metrics EXACTLY. The
    * pair frames are tiny (near-dup mass), cached across their two
    * consumers (count + semi-join), session-lifetime like the
    * q_triangles frames.
    */
  def qDedupEval(spark: SparkSession, dir: String): DataFrame = {
    // spread a one-split corpus scan before the two per-row-expensive
    // kernels (simhash signatures + shingle explode) — both channels'
    // map work otherwise serializes on one core (r16; guide §2.3's
    // move-the-compute-not-the-bytes: the exchange ships each doc
    // once, the kernels then run machine-wide). No-op at cluster
    // scale where the corpus scan has many splits.
    val docs = Tables.spreadIfOneSplit(Tables(spark, dir).documents)
    val cand = Dedup.simhashPairs(docs, maxHamming = 3)
      .select(col("id_a"), col("id_b")).cache()
    val sh = Dedup.hashedShingles(docs)
      .select(col("doc_id"), size(col("shh")).as("c"), explode(col("shh")).as("gh"))
    val truth = sh.select(col("gh"), col("doc_id").as("id_a"), col("c").as("ca"))
      .join(sh.select(col("gh"), col("doc_id").as("id_b"), col("c").as("cb")), Seq("gh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"), max(col("ca")).as("ca"), max(col("cb")).as("cb"))
      .filter(col("inter") * 2 >= col("ca") + col("cb") - col("inter"))
      .select(col("id_a"), col("id_b")).cache()
    val hit = truth.join(cand, Seq("id_a", "id_b"), "left_semi")
    cand.agg(count(lit(1)).as("n_cand"))
      .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_cand"), col("n_truth"), col("n_hit"),
        when(col("n_cand") === 0, 0L)
          .otherwise(expr("n_hit * 1000000 div n_cand")).as("precision_ppm"),
        when(col("n_truth") === 0, 0L)
          .otherwise(expr("n_hit * 1000000 div n_truth")).as("recall_ppm"))
  }

  /** C51: hybrid retrieval — the RAG/search-stack staple: a VECTOR
    * channel (exact-cosine top-10, the C6 bruteTopK plan: queries
    * broadcast, corpus never pair-shuffles) and a LEXICAL channel
    * (shared-distinct-term score weighted by the C46 scaled-rational
    * IDF — integer-exact, inverted-index join with the tiny query
    * term frame broadcast), fused by reciprocal-rank fusion:
    * rrf = Σ 10⁶ div (60 + rank). Floats exist only INSIDE the
    * vector ranking (same determinism argument as q_ann_brute);
    * everything that crosses the output boundary is rank-derived
    * integers, so the oracle replays the whole fusion exactly. At
    * scale each channel is independently swappable (IVF-PQ for
    * brute; a sharded posting index for lexical) — the fusion stage
    * only ever sees two ~k-row rank lists per query.
    */
  def qHybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val docs = Tables(spark, dir).documents
    val vecRanks = Ann.bruteTopK(emb, emb.filter(col("vec_id") < 8), k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("rv"))
    // cache the 3-consumer distinct-term explode (guide §5: reused
    // AND expensive): SCALE-dependent call, measured both ways — at
    // sf0.1 the pin's materialization barrier costs more than the
    // explode (0.91s -> 1.24s), at 5x the explode dominates and the
    // pin nearly halves the query (5.19s -> 3.13s, back-to-back
    // window). The 100 TB direction is what the round optimizes for;
    // the sf0.1 delta is local job-launch floor, not data cost.
    // EAGER-EXECUTION CONTRACT (r17, ADVICE r16: the pin had no
    // unpersist point, so a long-lived service calling this
    // repeatedly accumulated token-scale caches — the qPagerank /
    // qDecileLift precedent): the fused output is ≤ 5 rows per query
    // of an 8-query probe set, so the builder runs the query, returns
    // the snapshot as a local relation, and RELEASES the pin in a
    // finally.
    val terms = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("t"))
      .cache()
    try {
      val dfreq = terms.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val qterms = terms.filter(col("doc_id") < 8)
        .select(col("doc_id").as("query_id"), col("t"))
      val lex = qterms.join(terms, "t")
        .filter(col("doc_id") =!= col("query_id"))
        .join(broadcast(dfreq), "t").crossJoin(broadcast(nDocs))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(expr("n_docs * 1000000 div df")).as("lexscore"))
      val wl = Window.partitionBy(col("query_id"))
        .orderBy(col("lexscore").desc, col("doc_id"))
      val lexRanks = lex.withColumn("rl", row_number().over(wl))
        .filter(col("rl") <= 10).select(col("query_id"), col("doc_id"), col("rl"))
      val fused = vecRanks.join(lexRanks, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(expr("1000000 div (60 + rv)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + rl)"), lit(0L)))
      val wf = Window.partitionBy(col("query_id"))
        .orderBy(col("rrf").desc, col("doc_id"))
      val out = fused.withColumn("rank", row_number().over(wf).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("doc_id"), col("rrf").as("rrf_ppm"))
        .orderBy(col("query_id"), col("rank"))
      import spark.implicits._
      out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
        .toDF("query_id", "rank", "doc_id", "rrf_ppm")
        .orderBy(col("query_id"), col("rank"))
    } finally terms.unpersist(blocking = false)
  }

  /** C105: forget-propagation into the ANN index — the compliance
    * twin of A43's document purge: deleting a vector from the corpus
    * must also delete it from the SERVING index, without retraining.
    * The one-shot IVF index (frozen deterministic quantizer + list
    * table) is committed to a SnapshotStore keyed by vector id; the
    * forget set (vec_id % 13 == 0) is purged file-level-CoW from the
    * list table; queries (the retained slice of the usual <8 probe
    * set) then run against the PURGED index with the FROZEN
    * centroids. Because the quantizer is frozen (the production-IVF
    * discipline A28 maintains), purging index rows is EXACTLY
    * equivalent to re-indexing the retained corpus — which is what
    * the oracle replays (full quantizer on all data, assignment and
    * candidates restricted to retained ids). At scale: the purge
    * rewrites only covering index files (codes/normed vectors, not
    * raw corpus), and queries never see a forgotten neighbor the
    * moment the purge version commits — no index rebuild, no serving
    * gap.
    */
  def qForgetAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val (cents, lists) = Ann.ivfIndexFrames(emb, nLists = 8)
    val root = java.nio.file.Files.createTempDirectory("gq-forget-ann").toString
    val store = new graft.store.SnapshotStore(spark, root, "neighbor_id",
      filesPerCommit = 8)
    store.commit(lists)
    store.purge(emb.filter(pmod(col("vec_id"), lit(13)) === 0)
      .select(col("vec_id").as("neighbor_id")))
    val retainedQueries = emb.filter(col("vec_id") < 8 &&
      pmod(col("vec_id"), lit(13)) =!= 0)
    Ann.ivfQueryTopK(cents, store.read().get, retainedQueries, k = 5, nprobe = 2)
  }

  /** C48: kNN label assignment — the standard weak-labeling /
    * label-propagation step of a curation pipeline: each held-out
    * query vector (a deterministic ~3% slice, vec_id % 29 == 0) takes
    * the majority label of its 5 exact-cosine nearest neighbors
    * (ties to the smallest label). Built on the same bruteTopK plan
    * as C6 — corpus never pair-shuffles, queries broadcast — so the
    * scale path is whatever the ANN family provides (swap bruteTopK
    * for ivfTopK at 100 TB); the vote is two tiny aggregates over
    * queries x 5 rows. Fully oracled including the float cosine rank
    * (same fixed-order IEEE sums as C6).
    */
  def qKnnLabel(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val top = Ann.bruteTopK(emb, emb.filter(pmod(col("vec_id"), lit(29)) === 0), k = 5)
    val labels = emb.select(col("vec_id"), col("label").cast("long").as("label"))
    val votes = top
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nlabel")),
        "neighbor_id")
      .groupBy(col("query_id"), col("nlabel")).agg(count(lit(1)).as("n"))
    val pred = votes.groupBy(col("query_id"))
      .agg(min_by(col("nlabel"), struct((-col("n")).as("nn"), col("nlabel")))
        .as("pred_label"))
    pred
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("true_label")),
        "query_id")
      .withColumn("correct", (col("pred_label") === col("true_label")).cast("long"))
      .orderBy(col("query_id"))
  }

  /** C7 (approximate — recall vs C6 measured in spec — yet fully
    * oracle-checked: the deterministic hyperplane buckets are
    * replicated in SQL, so DuckDB reproduces the exact candidate
    * sets and ranks).
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Ann.lshTopK(emb, emb.filter(col("vec_id") < 8), k = 5, bits = 6)
  }

  /** C7b: IVF coarse-quantizer ANN (approximate; recall and the
    * nprobe==nLists exactness anchor measured in spec). Fully
    * oracle-checked: seeds, the scaled-long Lloyd step, probe
    * selection and list scoring are all deterministic and replicated
    * in the SQL oracle.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8), k = 5, nLists = 8, nprobe = 2)
  }

  /** C7c: product-quantization ANN (approximate; recall and the
    * k==corpus exactness anchor measured in spec). Fully
    * oracle-checked: the affine-hash codebook seeds, per-subspace
    * nearest-codeword encoding, and the fixed-order ADC sums are all
    * deterministic and replicated in the SQL oracle.
    */
  def qAnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Ann.pqTopK(emb, emb.filter(col("vec_id") < 8), topK = 5, m = 8, k = 16,
      rerank = 32)
  }

  /** C7d: IVF-PQ composed ANN — coarse quantizer prunes to nprobe
    * lists, PQ codes score the survivors, exact cosine re-ranks the
    * shortlist. Fully oracle-checked (both deterministic quantizers
    * replayed and composed in SQL).
    */
  def qAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Ann.ivfPqTopK(emb, emb.filter(col("vec_id") < 8), topK = 5,
      nLists = 8, nprobe = 2, m = 8, k = 16, rerank = 32)
  }

  /** C28: semantic dedup over the IVF clustering (deterministic, so
    * the oracle replays the full seeds -> Lloyd -> assign pipeline
    * and the keep-one-per-cluster choice exactly).
    */
  def qSemanticDedup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.semanticDedup(Tables(spark, dir).embeddings, nLists = 8)
      .orderBy(col("vec_id"))

  /** C32: embedding outliers — each vector's cosine to its own IVF
    * cluster centroid, the curation signal for "semantically isolated"
    * documents (low cos = far from every mass of the corpus). The
    * centroid is the deterministic scaled-long Lloyd mean, the cosine
    * a per-row left-to-right double fold — no float AGGREGATION
    * anywhere, so the score is bit-reproducible (full oracle). One
    * broadcast join per side; the corpus never shuffles.
    */
  def qEmbeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val cents = Ann.ivfCentroids(emb, nLists = 8)
    // r16 (guide §2.4): the assignment pass already carries each
    // vector's embedding and norm — re-joining `emb` by vec_id here
    // was a full corpus shuffle for columns the pass had in hand; the
    // centroid norm is likewise computed once per centroid on the
    // 8-row broadcast side instead of once per corpus row. The cosine
    // sees the identical doubles in the identical expression shape.
    val centsN = cents.withColumn("cnorm",
      graft.functions.norm_double(col("carr")))
    Ann.ivfAssignEmb(emb, cents)
      .join(broadcast(centsN), "list_id")
      .select(col("vec_id"), col("list_id").cast("long").as("cluster_id"),
        (graft.functions.dot_double(col("embedding"), col("carr")) /
          (col("vnorm") * col("cnorm"))).as("cos_centroid"))
      .orderBy(col("vec_id"))
  }

  /** C93: fixed-point embedding pooling — the per-class centroid a
    * pipeline derives for semantic routing / class prototypes, in
    * EXACT micro-units (each float component rounds once to e6 =
    * round(x·10⁶); sums and the sign-explicit integer mean are then
    * engine-exact — a float mean would hash-drift). One posexplode
    * pass + a (label, dim)-grid aggregate: corpus-linear, output
    * bounded by classes × dims.
    */
  def qEmbedPool(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("x").cast("double") * 1000000d).cast("long").as("e6"))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("e6")).as("sum_e6"))
      .withColumn("mean_e6",
        expr("cast(sign(sum_e6) as bigint) * (abs(sum_e6) div n_vecs)"))
      .orderBy(col("label"), col("dim"))

  /** C94: int8 symmetric scalar quantization of the embedding column
    * — the compression step a 100 TB vector corpus applies before
    * ANN indexing (4× smaller than float32, orthogonal to the C7c
    * PQ codebooks), with the reconstruction-error audit that decides
    * whether int8 is safe for the workload. All-integer pipeline:
    * per-vector scale s = max|e6|, code q = sign·(|e6|·127 div s),
    * recon = sign·(|q|·s div 127) — both engines agree exactly
    * (division staged on nonnegative operands only). Error bound
    * max_err <= s div 127 + 1 by construction (spec'd); reported per
    * label with total-variation ppm.
    */
  def qEmbedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"),
        round(col("x").cast("double") * 1000000d).cast("long").as("e6"))
    val s = e.groupBy(col("vec_id"), col("label"))
      .agg(max(abs(col("e6"))).as("s"))
    val nv = s.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    e.join(s, Seq("vec_id", "label"))
      .withColumn("qabs",
        expr("case when s = 0 then 0 else (abs(e6) * 127) div s end"))
      .withColumn("err",
        expr("abs(e6 - cast(sign(e6) as bigint) * ((qabs * s) div 127))"))
      .groupBy(col("label"))
      .agg(sum(abs(col("e6"))).as("sum_abs_e6"),
        sum(col("err")).as("sum_err"), max(col("err")).as("max_err"))
      .join(broadcast(nv), Seq("label"))
      .select(col("label"), col("n_vecs"), col("sum_abs_e6"),
        col("sum_err"), col("max_err"),
        expr("sum_err * 1000000 div sum_abs_e6").as("err_ppm"))
      .orderBy(col("label"))
  }

  /** C8 */
  def qTextLangid(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables(spark, dir).documents).orderBy(col("doc_id"))

  /** C8b: language-ID confusion matrix — the classifier-calibration
    * report a curation pipeline publishes next to the C8 predictions:
    * cross-tab of the heuristic's prediction vs the corpus's declared
    * label, with each cell's share of its labeled row in exact ppm
    * (the per-language recall diagonal and the specific
    * confusion/und-fallback mass off it — what decides whether the
    * marker lexicon needs widening before the filter is trusted).
    * One fact-sized aggregate over the C8 kernel + a label-bounded
    * row-total broadcast.
    */
  def qLangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = TextAnalysis.langId(Tables(spark, dir).documents)
      .groupBy(col("lang_labeled"), col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
    val rows = cells.groupBy(col("lang_labeled")).agg(sum(col("n_docs")).as("n_label"))
    cells.join(broadcast(rows), Seq("lang_labeled"))
      .select(col("lang_labeled"), col("lang_pred"), col("n_docs"), col("n_label"),
        expr("n_docs * 1000000 div n_label").as("share_ppm"))
      .orderBy(col("lang_labeled"), col("lang_pred"))
  }

  /** C9 */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFeatures(Tables(spark, dir).documents).orderBy(col("doc_id"))

  /** C10 */
  def qTextTokens(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables(spark, dir).documents).orderBy(col("doc_id"))

  /** C11: fingerprint dup-classes via the custom codegen expression;
    * oracle checks the classes (hash values themselves aren't
    * SQL-replicable, equality classes are).
    */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(rolling_hash64(col("text")))
    Tables(spark, dir).documents
      .select(col("doc_id"), min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .orderBy(col("doc_id"))
  }

  /** C44: TextRank keyword importance — top-50 words by fixed-point
    * PageRank over the word-adjacency graph ([[TextAnalysis.textrank]]
    * — integer floor arithmetic, so the oracle replays all five
    * iterations exactly as unrolled SQL).
    */
  def qTextrank(spark: SparkSession, dir: String): DataFrame =
    // edge set = the KEYS of the landed shared word-adjacency
    // artifact (CorpusQueries.wordPairCounts) — the rank loop reads
    // vocab²-bounded parquet, never the corpus
    graft.text.TextAnalysis.textrankOnEdges(
        CorpusQueries.wordPairCounts(spark, dir).select(col("w1"), col("w2")),
        iterations = 5)
      .orderBy(col("r").desc, col("w"))
      .limit(50)

  /** Dup clusters: connected components over the trigram-Jaccard
    * near-dup graph (J >= 0.5), cluster id = min reachable doc id —
    * the decision structure a dedup pipeline actually keeps (drop all
    * non-canonical members per cluster).
    */
  def qDupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.clustersTable(spark, dir, Tables(spark, dir).documents)
      .orderBy(col("id"))

  /** C36: dup-cluster size distribution — the curation report built
    * ON TOP of C19's PERSISTED cluster map (how much of the corpus is
    * singleton vs 2-dup vs n-dup): two tiny aggregations over the
    * shared [[Dedup.clustersTable]] snapshot — CC runs once per
    * corpus, every report after that is a parquet read.
    */
  def qClusterSizes(spark: SparkSession, dir: String): DataFrame =
    Dedup.clustersTable(spark, dir, Tables(spark, dir).documents)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))

  /** C71: soft dedup — instead of DROPPING near-duplicates, assign
    * each document a training weight 1e6/cluster_size ppm so a
    * cluster of n near-copies contributes one document's worth of
    * gradient in expectation (the downweighting alternative to hard
    * dedup used when duplicates carry signal — boilerplate-heavy
    * web corpora, templated docs). Built ON the persisted C19
    * cluster map: per-cluster sizes are one aggregate over the
    * (id, cluster_id) snapshot, joined back on cluster_id — both
    * sides are id-sized, the corpus text never moves. Integer ppm
    * weights, so the frame is engine-exact.
    */
  def qDupWeights(spark: SparkSession, dir: String): DataFrame = {
    val cl = Dedup.clustersTable(spark, dir, Tables(spark, dir).documents)
    val sizes = cl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    cl.join(sizes, Seq("cluster_id"))
      .select(col("id").as("doc_id"), col("cluster_size"),
        expr("1000000 div cluster_size").cast("long").as("weight_ppm"))
      .orderBy(col("doc_id"))
  }

  /** D2b: per-GROUP heavy hitters — the SpaceSaving sketch as a
    * grouped aggregate (one bounded-memory sketch per source, merged
    * map-side like any partial): the per-tenant/per-language top-k
    * report at 100 TB moves k rows per group per partition, never the
    * token stream. Capacity exceeds the vocabulary here, so counts
    * are exact and the oracle replays them; the over-capacity regime
    * is spec-tested on the global variant.
    */
  def qGroupTopk(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"))
      .agg(graft.functions.topk_freq(col("w"), 5, capacity = 4096).as("top"))
      .select(col("source"), explode(col("top")).as("t"))
      .select(col("source"), col("t.item").as("item"), col("t.cnt").as("cnt"))
      .orderBy(col("source"), col("cnt").desc, col("item"))

  /** Heavy hitters via the SpaceSavingTopK TypedImperativeAggregate;
    * capacity exceeds the vocabulary so counts are exact and
    * oracle-checkable (the over-capacity approximate regime is
    * spec-tested).
    */
  def qTopkFreq(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(graft.functions.topk_freq(col("w"), 10, capacity = 4096).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.item").as("item"), col("t.cnt").as("cnt"))
      .orderBy(col("cnt").desc, col("item"))

  /** C12 */
  def qMmBinary(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodePipeline(Multimodal.asMedia(Tables(spark, dir).documents))
      .orderBy(col("doc_id"))

  /** C12b: frame sampling — one media row explodes to N per-frame
    * feature rows (stride 32, frame 16, pinned for the oracle).
    */
  def qMmFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.asMedia(Tables(spark, dir).documents))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** C104: shot-boundary detection — the temporal-segmentation step
    * of a video curation pipeline (sample frames → per-frame
    * signature → cut where successive signatures jump → per-shot
    * stats for keyframe selection / per-shot dedup). Built on the
    * C12b frame stage: a boundary fires between consecutive FULL
    * frames whose byte-sum signatures differ by > 80 (a mean
    * byte-value shift > 5 over the 16-byte stub frame — with a real
    * codec this is the phash/histogram delta, same shape); the
    * running boundary count segments frames into shots. Every window
    * is partitioned by doc_id and ordered by frame_idx — per-video
    * frame counts bound the frame, so the plan scales by video
    * count, never corpus length: frames shuffle ONCE on doc_id, and
    * only (doc, shot) aggregates survive. Short-frame tails (the
    * last sampled frame when payload % stride < frameLen) never
    * form boundaries — their sums are not comparable to full
    * frames'.
    */
  def qMmShots(spark: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.frameSample(
      Multimodal.asMedia(Tables(spark, dir).documents))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val flagged = frames
      .withColumn("prev_sum", lag(col("frame_sum"), 1).over(w))
      .withColumn("prev_len", lag(col("frame_len"), 1).over(w))
      .withColumn("boundary",
        when(col("prev_sum").isNotNull && col("frame_len") === 16 &&
          col("prev_len") === 16 &&
          abs(col("frame_sum") - col("prev_sum")) > 80, 1L).otherwise(0L))
      .withColumn("shot_id", sum(col("boundary")).over(w))
    flagged.groupBy(col("doc_id"), col("shot_id"))
      .agg(count(lit(1)).as("shot_frames"))
      .groupBy(col("doc_id"))
      .agg(sum(col("shot_frames")).as("n_frames"),
        count(lit(1)).as("n_shots"),
        max(col("shot_frames")).as("max_shot_len"))
      .orderBy(col("doc_id"))
  }

  /** C49: media near-duplicate detection — the image-dedup pipeline
    * shape: binary payload → perceptual-hash signature (the
    * [[Multimodal.phashPipeline]] batch codec stub, 60
    * locality-sensitive bits) → banded LSH self-join → exact hamming
    * verify. 6 bands x 10 bits with threshold <= 5 is the pigeonhole
    * guarantee (two hashes within hamming 5 agree on >= 1 band), so
    * recall is EXACT — no all-pairs comparison at any scale: the
    * corpus shuffles once on (band_idx, band_value), candidate mass
    * is bucket-bounded, and the 60-bit xor/bit_count verify runs only
    * inside buckets. The same plan is how you dedup a billion images:
    * only signatures (8 bytes) move, payloads never shuffle.
    */
  def qMmPhash(spark: SparkSession, dir: String): DataFrame = {
    // spread a one-split scan before the per-payload hash pipeline
    // (the q_memorization lesson): the signature pass is the
    // expensive map work here and would otherwise run on one core
    val sig = Multimodal.phashPipeline(
      Multimodal.asMedia(graft.sources.Tables.spreadIfOneSplit(
        Tables(spark, dir).documents)))
    val bandArr = array((0 to 5).map(i =>
      shiftright(col("ph"), 10 * i).bitwiseAND(lit(1023L))): _*)
    val bands = sig.select(col("doc_id"), col("ph"),
      posexplode(bandArr).as(Seq("i", "band")))
    val a = bands.select(col("i"), col("band"),
      col("doc_id").as("doc_a"), col("ph").as("pa"))
    val b = bands.select(col("i"), col("band"),
      col("doc_id").as("doc_b"), col("ph").as("pb"))
    // hamming filters BEFORE the pair distinct: the filter is a
    // map-side function of the joined row, so the distinct's shuffle
    // carries only surviving near-dup pairs (a few rows), not the
    // full banded candidate mass (~bands * n²/2^bits rows)
    a.join(b, Seq("i", "band"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
      .filter(col("hamming") <= 5)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** C58: embedding dup clusters — C19's connected-component cluster
    * map for the VECTOR modality: CC (hash-min label propagation)
    * over the C5 exact near-dup pair graph (cos >= 0.4), landed once
    * per corpus through the DerivedTable seam (the clustersTable
    * billing shape: first touch pays candidate generation + CC, every
    * later read is a parquet scan). Output is id -> min-reachable-id
    * — pure integers, so the oracle replays the full closure as a
    * recursive CTE over the same pair predicate.
    */
  def qEmbeddingClusters(spark: SparkSession, dir: String): DataFrame =
    embClustersFrame(spark, dir).orderBy(col("id"))

  /** The landed C58 cluster map (id -> min-reachable-id), shared by
    * the C58 gate and C76's labeling pass — the second consumer reads
    * the same parquet artifact, never re-runs CC.
    */
  private[graft] def embClustersFrame(spark: SparkSession, dir: String): DataFrame = {
    // the release handle must fire AFTER readOrBuild's parquet write
    // materializes the CC frame (unpersisting first would force the
    // write to replay the whole iterative lineage uncached)
    var release: Option[() => Unit] = None
    val out = graft.sources.DerivedTable.readOrBuild(
      spark, "emb-clusters", dir, Seq("embeddings"), "t=0.4") {
      val emb = Tables(spark, dir).embeddings
      val pairs = Dedup.embeddingNearDups(emb, threshold = 0.4)
        .select(col("id_a"), col("id_b"))
      val (cc, rel) = Dedup.connectedComponentsReleasable(
        pairs, emb.select(col("vec_id").as("id")))
      release = Some(rel)
      cc
    }
    release.foreach(_())
    out
  }

  /** C76: cluster labeling — the human-auditable name for every
    * multi-doc C58 cluster: top-3 terms by cluster-level TF x
    * corpus-level rational IDF (the C46 ppm idf — 10⁶·N div df),
    * total tiebreak (score desc, term asc). The review surface a
    * dedup pipeline ships next to its cluster map: "what IS this
    * cluster" without reading members. Reuses the LANDED C58
    * artifact (vec_id ↔ doc_id — the generator's shared id space,
    * the q_semantic_dedup correspondence); plan is two linear
    * token-key shuffles (cluster-tf, corpus-df) + a broadcast idf
    * join + a per-cluster top-3 window — per-cluster parallelism at
    * any scale, the corpus never pair-shuffles.
    */
  def qClusterTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("term"))
    val df = toks.distinct().groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select(col("term"), expr("n_docs * 1000000 div df").as("idf_ppm"))
    val clusters = embClustersFrame(spark, dir)
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("sz") >= 2)
      .select(col("cluster_id"), col("id").as("doc_id"))
    val tf = clusters.join(toks, Seq("doc_id"))
      .groupBy(col("cluster_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("term"))
    // term-keyed equi-join, NOT an explicit broadcast: the idf side
    // is vocabulary-sized (~1e9 types at 100 TB) — AQE still
    // broadcasts it when it measures small
    tf.join(df, Seq("term"))
      .withColumn("score", col("tf") * col("idf_ppm"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("cluster_id"), col("rnk"), col("term"), col("tf"), col("score"))
      .orderBy(col("cluster_id"), col("rnk"))
  }

  /** C57: BM25 ranking — the canonical lexical IR scorer, in the
    * C43/C46 exact-integer discipline so the whole ranking replays in
    * the oracle: k1=1.2 and b=0.75 live as ppm-scaled integers, every
    * division floors identically in both engines
    * (avgdl100 = 100·T div N; ratio_ppm = 100·10⁶·dl div avgdl100;
    * inner = 0.25+0.75·ratio; denom = tf + 1.2·inner;
    * sat_ppm = 2.2·10⁶·tf·10⁶ div denom_ppm; idf_ppm = 10⁶·N div df —
    * the C46 rational IDF; term = idf·sat div 10⁶). Intermediates are
    * scale-INDEPENDENT (sat is a bounded ratio) except idf·sat, which
    * fits long to ~10⁹ docs; beyond that, cap idf or move the product
    * to decimal. Plan shape: posting-list equi-join with the tiny
    * query-term frame, df broadcast, one aggregate, per-query top-5 —
    * the corpus never pair-shuffles (the C51 lexical-channel shape
    * with the real scoring function).
    */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    // every input derives from the LANDED (doc, term, tf) artifact
    // (CorpusQueries.docTermFreq): doc length = sum(tf), document
    // frequency = row count per term, query terms = the artifact's
    // rows for the query docs (already distinct per (doc, term)).
    // The former inline corpus explode ran every stage on the ONE
    // split of the documents file (16 jobs x 1 task measured); the
    // landed artifact scans 32-way and never re-derives the corpus.
    // NOT a persisted posting frame (r17, measured both ways — the
    // verdict item-7 suggestion assumed post-purge consumers would
    // re-derive per scan, but the in-call LANDING already shares the
    // derivation and the four consumers read cheap landed parquet):
    // pinning the posting frame + eager snapshot read 2.53-2.70s →
    // 2.71-3.17s at sf0.1 and 4.28 → 4.39s at 5× in back-to-back
    // A/B, i.e. the materialization barrier costs more than the three
    // parquet re-scans it saves at both scales. Kept the r16 shape.
    val tf = CorpusQueries.docTermFreq(spark, dir).withColumnRenamed("w", "t")
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // "tok_total" not "T": the term column is `t`, and Spark resolves
    // column names case-insensitively — `T` would be ambiguous
    val stats = broadcast(dl.agg(sum(col("dl")).as("tok_total"),
      count(lit(1)).as("n_docs")))
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val qterms = tf.filter(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("t"))
    val scored = qterms.join(tf, "t")
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(dfreq), "t")
      // explicit broadcast: dl is doc-count-bounded (tiny next to
      // the candidate frame) but its landed-artifact lineage hides
      // that from the size estimator, which otherwise plans a
      // sort-merge join on doc_id (the lmScoreAgainst lesson)
      .join(broadcast(dl), "doc_id")
      .crossJoin(stats)
      .withColumn("avgdl100", expr("tok_total * 100 div n_docs"))
      .withColumn("ratio_ppm", expr("dl * 100 * 1000000 div avgdl100"))
      .withColumn("inner_ppm", expr("250000 + (750000 * ratio_ppm) div 1000000"))
      .withColumn("denom_ppm", expr("tf * 1000000 + (1200000 * inner_ppm) div 1000000"))
      .withColumn("sat_ppm", expr("tf * 2200000 * 1000000 div denom_ppm"))
      .withColumn("idf_ppm", expr("n_docs * 1000000 div df"))
      .withColumn("term_ppm", expr("idf_ppm * sat_ppm div 1000000"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_ppm")).as("score_ppm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score_ppm"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** C99: embedding norm audit per label — the vector-hygiene gate a
    * 100 TB embedding corpus runs before ANY similarity work (a
    * batch of zero/denormal vectors from a failed encoder silently
    * poisons cosine math; a norm drift between labels flags an
    * encoder-version mix). All-integer: e6 fixed-point per element
    * (the C93 convention), per-vector norm² in e12 units (64 dims ×
    * (1e6)² = 6.4e13 max, far inside BIGINT), then per-label min /
    * max / mean and a near-zero count (norm < 0.1 ⇔ norm² < 1e10).
    * One corpus-linear explode + two bounded aggregates — map-heavy,
    * no join.
    */
  def qVectorNormAudit(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label").cast("long").as("label"),
        explode(col("embedding")).as("x"))
      .select(col("vec_id"), col("label"),
        round(col("x").cast("double") * 1000000d).cast("long").as("e6"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(expr("e6 * e6")).as("normsq_e12"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        min(col("normsq_e12")).as("min_normsq_e12"),
        max(col("normsq_e12")).as("max_normsq_e12"),
        sum(col("normsq_e12")).as("sum_normsq_e12"),
        sum(when(col("normsq_e12") < 10000000000L, 1L).otherwise(0L))
          .as("n_near_zero"))
      .select(col("label"), col("n_vecs"), col("min_normsq_e12"),
        col("max_normsq_e12"),
        expr("sum_normsq_e12 div n_vecs").as("mean_normsq_e12"),
        col("n_near_zero"))
      .orderBy(col("label"))

  /** C100: exact inter-label centroid separation — the class-
    * geometry audit behind "are these labels distinguishable in
    * embedding space" (collapsed centroid pairs predict ANN
    * confusion and duplicate labels). The centroid is a RATIONAL
    * (sum_e6/n per dim), so the pairwise squared distance
    * Σ_dim (s_a·n_b − s_b·n_a)² / (n_a·n_b)² is exact integer
    * arithmetic end to end; cross-products run in decimal(38,0)
    * (HUGEINT on the oracle side), exact while n_label·1e6·n_other
    * ≤ 1e19 — ~1e6 vectors per label; normalize counts first past
    * that. Emitted in e12 units (the square of the e6 fixed-point
    * grid). Shape: one corpus-linear explode → (label, dim) sums
    * (labels×dims rows), then a dim-key self-join of that TINY frame
    * — the corpus is never pairwise-joined.
    */
  def qLabelCentroidDist(spark: SparkSession, dir: String): DataFrame = {
    val sums = Tables(spark, dir).embeddings
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("label"), col("dim"),
        round(col("x").cast("double") * 1000000d).cast("long").as("e6"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("e6")).as("s"), count(lit(1)).as("n"))
    val a = sums.select(col("label").as("label_a"), col("dim"),
      col("s").as("sa"), col("n").as("na"))
    val b = sums.select(col("label").as("label_b"), col("dim"),
      col("s").as("sb"), col("n").as("nb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"), col("na"), col("nb"),
        expr("CAST(sa AS DECIMAL(38,0)) * nb - CAST(sb AS DECIMAL(38,0)) * na")
          .as("d"))
      .groupBy(col("label_a"), col("label_b"), col("na"), col("nb"))
      .agg(sum(expr("d * d")).as("num"))
      .select(col("label_a"), col("label_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        expr("CAST(num div (CAST(na AS DECIMAL(38,0)) * nb * na * nb) AS BIGINT)")
          .as("dist2_e12"))
      .orderBy(col("label_a"), col("label_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_vector_norm_audit"   -> (qVectorNormAudit _),
    "q_label_centroid_dist" -> (qLabelCentroidDist _),
    "q_bm25"            -> (qBm25 _),
    "q_dedup_exact"     -> (qDedupExact _),
    "q_ngram_jaccard"   -> (qNgramJaccard _),
    "q_dedup_sweep"     -> (qDedupSweep _),
    "q_dedup_edit"      -> (qDedupEdit _),
    "q_ngram_adaptive"  -> (qNgramAdaptive _),
    "q_containment_pairs" -> (qContainmentPairs _),
    "q_dedup_minhash"   -> (qDedupMinhash _),
    "q_forget_neardup"  -> (qForgetNeardup _),
    "q_dedup_simhash"   -> (qDedupSimhash _),
    "q_dedup_eval"      -> (qDedupEval _),
    "q_ann_eval"        -> (qAnnEval _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
    "q_embedding_clusters" -> (qEmbeddingClusters _),
    "q_cluster_terms"      -> (qClusterTerms _),
    "q_dedup_embedding_lsh" -> (qDedupEmbeddingLsh _),
    "q_ann_brute"       -> (qAnnBrute _),
    "q_hybrid_search"   -> (qHybridSearch _),
    "q_knn_label"       -> (qKnnLabel _),
    "q_ann_lsh"         -> (qAnnLsh _),
    "q_ann_ivf"         -> (qAnnIvf _),
    "q_forget_ann"      -> (qForgetAnn _),
    "q_ann_pq"          -> (qAnnPq _),
    "q_ann_ivfpq"       -> (qAnnIvfPq _),
    "q_semantic_dedup"  -> (qSemanticDedup _),
    "q_embedding_outliers" -> (qEmbeddingOutliers _),
    "q_embed_pool"      -> (qEmbedPool _),
    "q_embed_quantize"  -> (qEmbedQuantize _),
    "q_text_langid"     -> (qTextLangid _),
    "q_lang_confusion"  -> (qLangConfusion _),
    "q_text_quality"    -> (qTextQuality _),
    "q_text_tokens"     -> (qTextTokens _),
    "q_text_fingerprint" -> (qTextFingerprint _),
    "q_mm_binary"       -> (qMmBinary _),
    "q_mm_frames"       -> (qMmFrames _),
    "q_mm_shots"        -> (qMmShots _),
    "q_mm_phash"        -> (qMmPhash _),
    "q_topk_freq"       -> (qTopkFreq _),
    "q_dup_clusters"    -> (qDupClusters _),
    "q_dup_weights"     -> (qDupWeights _),
    "q_cluster_sizes"   -> (qClusterSizes _),
    "q_group_topk"      -> (qGroupTopk _),
    "q_cross_neardup"   -> (qCrossNeardup _),
    "q_textrank"        -> (qTextrank _),
  )

  /** One unrolled TextRank iteration as SQL: r_k from r_{k-1} — the
    * oracle replays the exact integer fixed-point arithmetic of
    * [[graft.text.TextAnalysis.textrank]] (div == DuckDB // on
    * positive BIGINTs).
    */
  private def trLayer(k: Int): String =
    s"""r$k AS (SELECT n.w,
       |  CAST(150000000000 + (85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
       | FROM nodes n LEFT JOIN (
       |  SELECT e.w2 AS w, sum(p.r // o.od) AS s
       |  FROM edges e JOIN r${k - 1} p ON p.w = e.w1 JOIN outd o ON o.u = e.w1
       |  GROUP BY e.w2) s ON s.w = n.w)""".stripMargin

  private val triCte =
    """toks AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents),
      |tri AS (SELECT doc_id, n_chars,
      |  unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                        for i in generate_series(1, len(w)-2)])) AS g FROM toks),
      |cnt AS (SELECT doc_id, count(*) AS c FROM tri GROUP BY 1)""".stripMargin

  private val embCte =
    """ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |       FROM embeddings),
      |nm AS (SELECT vec_id, sqrt(list_sum(list_transform(e, x -> x*x))) AS nrm FROM ed)""".stripMargin

  /** The deterministic LSH hyperplanes as SQL list literals: component
    * d of plane p is fnv1a("plane:p:d") interpreted as a SIGNED 64-bit
    * value divided by Long.MaxValue — we inline the integer hash (not
    * a printed double) so both engines perform the identical IEEE
    * long->double conversion and division (bit-exact signs).
    * [mirrors Ann.planeComponent]
    */
  private def planeSql(p: Int): String =
    (0 until 64).map { d =>
      val bytes = s"plane:$p:$d".getBytes("UTF-8")
      val h = graft.functions.HashAlgos.fnv1a(bytes, 0, bytes.length)
      s"(CAST($h AS DOUBLE) / 9223372036854775807.0)"
    }.mkString("[", ", ", "]")

  /** Sign-bucket expression over the double-cast embedding column `e`
    * for hash table `table` with `bits` hyperplanes — the SQL twin of
    * Ann.lshBucketTable (dot products accumulate left-to-right in
    * double on both engines).
    */
  private def bucketSql(table: Int, bits: Int): String =
    (0 until bits).map { p =>
      s"(CASE WHEN list_sum(list_transform(list_zip(e, ${planeSql(table * 1000 + p)}), " +
        s"s -> s[1]*s[2])) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), s -> s[1]*s[2]))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> x*x)))"

  /** Nearest-centroid rank subquery — the SQL twin of
    * Ann.assignToCentroids' cosine ranking (shared by the IVF and
    * semantic-dedup oracles).
    */
  private def ivfSimRank(corpus: String, cents: String, filter: String): String =
    s"""SELECT c.vec_id, c.e, s.list_id,
       |   row_number() OVER (PARTITION BY c.vec_id
       |     ORDER BY (${dotSql("c.e", "s.carr")} / (${normSql("c.e")} * ${normSql("s.carr")})) DESC,
       |       s.list_id) AS rn
       |  FROM $corpus c CROSS JOIN $cents s$filter""".stripMargin

  /** The deterministic IVF quantizer replayed in SQL: affine-hash
    * seed pick, first assignment, scaled-long Lloyd mean -> `lloyd`
    * (list_id, carr). Assumes `ed` from [[embCte]] is in scope.
    */
  private val ivfAssignCtes: String = {
    val cent = (0 until 64).map(i =>
      s"CAST(CAST(sum(CAST(round(e[${i + 1}]*1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE)" +
        s" / (count(*) * 1048576.0)").mkString("[", ",\n   ", "]")
    s"""seeds0 AS (SELECT vec_id, e FROM ed
       |  ORDER BY (vec_id * 2654435761) % 1000003, vec_id LIMIT 8),
       |seeds AS (SELECT row_number() OVER
       |    (ORDER BY (vec_id * 2654435761) % 1000003, vec_id) AS list_id,
       |  e AS carr FROM seeds0),
       |a1 AS (SELECT vec_id, e, list_id FROM (
       | ${ivfSimRank("ed", "seeds", "")}) WHERE rn = 1),
       |lloyd AS (SELECT list_id, $cent AS carr FROM a1 GROUP BY list_id),""".stripMargin
  }

  /** The deterministic PQ pipeline replayed in SQL: affine-hash seed
    * codebooks (normalized subvector slices), per-(vector, subspace)
    * codeword distances, nearest-code assignment (ties to the smaller
    * code = min_by's struct order). Assumes `ed`/`nm` from [[embCte]]
    * are in scope; yields `cb`, `dist`, `codes`.
    */
  private val pqCtes: String =
    s"""pseed0 AS (SELECT vec_id, e FROM ed
       |  ORDER BY (vec_id * 2654435761) % 1000003, vec_id LIMIT 16),
       |pseed AS (SELECT row_number() OVER
       |    (ORDER BY (vec_id * 2654435761) % 1000003, vec_id) AS code, e FROM pseed0),
       |cb AS (SELECT sub, code,
       |  list_transform(list_slice(pseed.e, sub*8 + 1, sub*8 + 8),
       |    x -> x / ${normSql("pseed.e")}) AS cent
       | FROM pseed CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS sub) subs),
       |dist AS (SELECT v.vec_id, cb.sub, cb.code,
       |  list_sum(list_transform(
       |    list_zip(list_transform(list_slice(v.e, cb.sub*8 + 1, cb.sub*8 + 8),
       |               x -> x / ${normSql("v.e")}), cb.cent),
       |    s -> (s[1]-s[2])*(s[1]-s[2]))) AS d2
       | FROM ed v CROSS JOIN cb),
       |codes AS (SELECT vec_id, sub, code FROM (
       |  SELECT vec_id, sub, code,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, code) AS rn
       |  FROM dist) WHERE rn = 1)""".stripMargin

  /** The exact >= 0.8 Jaccard pair replay — shared by q_dedup_minhash
    * (one-shot C2 scan) and q_stream_neardup (streaming-maintained
    * index): the LSH banding at 16x4 over 64-slot signatures recalls
    * every pair at this threshold, so both paths' verified output is
    * this exact set.
    */
  private val minhashReplaySql: String =
    s"""WITH $triCte,
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
       |  FROM tri a JOIN tri b USING (g)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, i*1.0/(ca.c + cb.c - i) AS jaccard
       |FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
       |WHERE i*1.0/(ca.c + cb.c - i) >= 0.8
       |ORDER BY id_a, id_b""".stripMargin

  /** The full IVF-PQ two-quantizer replay — shared by q_ann_ivfpq
    * (one-shot build) and q_stream_ann_pq (streaming-maintained
    * artifacts): both must produce this exact ranking.
    */
  private val ivfPqReplaySql: String =
    s"""WITH $embCte,
       |$ivfAssignCtes
       |a2 AS (SELECT vec_id AS neighbor_id, list_id FROM (
       | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
       |probes AS (SELECT vec_id AS query_id, list_id FROM (
       | ${ivfSimRank("ed", "lloyd", " WHERE c.vec_id < 8")}) WHERE rn <= 2),
       |$pqCtes,
       |adc AS (SELECT p.query_id, cn.vec_id AS neighbor_id,
       |  list_sum(list(dq.d2 ORDER BY cn.sub)) AS adc
       | FROM codes cn
       |  JOIN a2 ON a2.neighbor_id = cn.vec_id
       |  JOIN probes p ON p.list_id = a2.list_id
       |  JOIN dist dq ON dq.sub = cn.sub AND dq.code = cn.code
       |    AND dq.vec_id = p.query_id
       | WHERE p.query_id != cn.vec_id
       | GROUP BY 1, 2),
       |shortlist AS (SELECT query_id, neighbor_id FROM (
       | SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS srank
       | FROM adc) WHERE srank <= 32),
       |rescored AS (SELECT query_id, neighbor_id,
       |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
       | FROM shortlist
       |  JOIN ed qe ON query_id = qe.vec_id JOIN ed ce ON neighbor_id = ce.vec_id
       |  JOIN nm nq ON query_id = nq.vec_id JOIN nm nc ON neighbor_id = nc.vec_id)
       |SELECT query_id, rank, neighbor_id FROM (
       | SELECT query_id, neighbor_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       | FROM rescored) WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_vector_norm_audit" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS e6
        |  FROM embeddings),
        |v AS (SELECT vec_id, label,
        |        CAST(sum(e6 * e6) AS BIGINT) AS normsq_e12
        |      FROM e GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(min(normsq_e12) AS BIGINT) AS min_normsq_e12,
        |  CAST(max(normsq_e12) AS BIGINT) AS max_normsq_e12,
        |  CAST(sum(normsq_e12) // count(*) AS BIGINT) AS mean_normsq_e12,
        |  CAST(sum(CASE WHEN normsq_e12 < 10000000000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_near_zero
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

    "q_label_centroid_dist" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |    CAST(unnest(range(0, len(embedding))) AS BIGINT) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS e6
        |  FROM embeddings),
        |s AS (SELECT label, dim, CAST(sum(e6) AS BIGINT) AS s,
        |        CAST(count(*) AS BIGINT) AS n
        |      FROM e GROUP BY 1, 2)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  a.n AS n_a, b.n AS n_b,
        |  CAST(sum((CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)
        |           * (CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n))
        |    // (CAST(a.n AS HUGEINT) * b.n * a.n * b.n) AS BIGINT) AS dist2_e12
        |FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY 1, 2, 3, 4 ORDER BY label_a, label_b""".stripMargin,

    "q_embed_pool" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
        |    CAST(unnest(range(0, len(embedding))) AS BIGINT) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS e6
        |  FROM embeddings)
        |SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(e6) AS BIGINT) AS sum_e6,
        |  CAST(CAST(sign(sum(e6)) AS BIGINT)
        |    * (abs(CAST(sum(e6) AS BIGINT)) // count(*)) AS BIGINT) AS mean_e6
        |FROM e GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS e6
        |  FROM embeddings),
        |s AS (SELECT vec_id, label, CAST(max(abs(e6)) AS BIGINT) AS s
        |      FROM e GROUP BY 1, 2),
        |nv AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
        |       FROM s GROUP BY 1),
        |q AS (SELECT e.label, e.e6, s.s,
        |        CASE WHEN s.s = 0 THEN 0
        |             ELSE (abs(e.e6) * 127) // s.s END AS qabs
        |      FROM e JOIN s USING (vec_id, label)),
        |er AS (SELECT label, abs(e6) AS a,
        |         abs(e6 - CAST(sign(e6) AS BIGINT) * ((qabs * s) // 127)) AS err
        |       FROM q)
        |SELECT label, n_vecs, CAST(sum(a) AS BIGINT) AS sum_abs_e6,
        |  CAST(sum(err) AS BIGINT) AS sum_err,
        |  CAST(max(err) AS BIGINT) AS max_err,
        |  CAST(sum(err) * 1000000 // sum(a) AS BIGINT) AS err_ppm
        |FROM er JOIN nv USING (label)
        |GROUP BY label, n_vecs ORDER BY label""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id,
        | count(*) OVER (PARTITION BY text) AS group_size,
        | CAST(doc_id = min(doc_id) OVER (PARTITION BY text) AS int) AS is_canonical
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the widest screen replayed once, then cumulative counts per
    // threshold over the surviving pair set
    "q_dedup_sweep" ->
      s"""WITH $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2),
         |p AS (SELECT id_a, id_b,
         |        CAST(i * 1000000 // (ca.c + cb.c - i) AS BIGINT) AS jppm
         |      FROM inter JOIN cnt ca ON id_a = ca.doc_id
         |                 JOIN cnt cb ON id_b = cb.doc_id),
         |thr AS (SELECT k * 100000 AS thr_ppm FROM generate_series(3, 8) t(k)),
         |pt AS (SELECT thr_ppm, id_a, id_b FROM p, thr WHERE jppm >= thr_ppm),
         |np AS (SELECT thr_ppm, count(*) AS n_pairs FROM pt GROUP BY 1),
         |nd AS (SELECT thr_ppm, count(*) AS n_docs FROM
         |        (SELECT DISTINCT thr_ppm, id FROM
         |          (SELECT thr_ppm, unnest([id_a, id_b]) AS id FROM pt))
         |       GROUP BY 1)
         |SELECT CAST(t.thr_ppm AS BIGINT) AS thr_ppm,
         |  CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(coalesce(nd.n_docs, 0) AS BIGINT) AS n_docs
         |FROM thr t LEFT JOIN np USING (thr_ppm) LEFT JOIN nd USING (thr_ppm)
         |ORDER BY thr_ppm""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, i*1.0/(ca.c + cb.c - i) AS jaccard
         |FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |WHERE i*1.0/(ca.c + cb.c - i) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // trigram screen at 0.3 replayed verbatim, then exact
    // levenshtein confirm — both engines' levenshtein is classic
    // unit-cost edit distance, integer-exact
    "q_dedup_edit" ->
      s"""WITH $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2),
         |cand AS (SELECT id_a, id_b FROM inter
         |  JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE i*1.0/(ca.c + cb.c - i) >= 0.3),
         |pairs AS (SELECT id_a, id_b,
         |    levenshtein(da.text, db.text) AS lev,
         |    greatest(length(da.text), length(db.text)) AS mx
         |  FROM cand JOIN documents da ON id_a = da.doc_id
         |            JOIN documents db ON id_b = db.doc_id)
         |SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev
         |FROM pairs WHERE lev * 5 <= mx
         |ORDER BY id_a, id_b""".stripMargin,

    // asymmetric: i / |A| with no length band, both orientations
    "q_containment_pairs" ->
      s"""WITH $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id != b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, i*1.0/ca.c AS containment
         |FROM inter JOIN cnt ca ON id_a = ca.doc_id
         |WHERE i*1.0/ca.c >= 0.6
         |ORDER BY id_a, id_b""".stripMargin,

    // identical to q_ngram_jaccard's oracle: the adaptive dispatch
    // changes the physical plan, never the (exact) result
    "q_ngram_adaptive" ->
      s"""WITH $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, i*1.0/(ca.c + cb.c - i) AS jaccard
         |FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |WHERE i*1.0/(ca.c + cb.c - i) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "q_textrank" ->
      s"""WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
         |rawe AS (SELECT unnest([struct_pack(a := w[i], b := w[i+1])
         |                        for i in generate_series(1, len(w)-1)]) AS p
         |         FROM toks WHERE len(w) >= 2),
         |edges AS (SELECT DISTINCT p.a AS w1, p.b AS w2 FROM rawe),
         |outd AS (SELECT w1 AS u, count(*) AS od FROM edges GROUP BY 1),
         |nodes AS (SELECT w1 AS w FROM edges UNION SELECT w2 FROM edges),
         |r0 AS (SELECT w, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
         |${(1 to 5).map(trLayer).mkString(",\n")}
         |SELECT w, r FROM r5 ORDER BY r DESC, w LIMIT 50""".stripMargin,

    "q_cross_neardup" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |tri AS (SELECT doc_id, source,
        |  unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                        for i in generate_series(1, len(w)-2)])) AS g FROM toks),
        |cnt AS (SELECT doc_id, count(*) AS c FROM tri GROUP BY 1),
        |inter AS (SELECT a.doc_id AS eval_id, b.doc_id AS train_id, count(*) AS i
        |  FROM tri a JOIN tri b USING (g)
        |  WHERE a.source = 'src0' AND b.source != 'src0'
        |  GROUP BY 1, 2)
        |SELECT eval_id, train_id, i*1.0/(ca.c + cb.c - i) AS jaccard
        |FROM inter JOIN cnt ca ON eval_id = ca.doc_id JOIN cnt cb ON train_id = cb.doc_id
        |WHERE i*1.0/(ca.c + cb.c - i) >= 0.5
        |ORDER BY eval_id, train_id""".stripMargin,

    "q_dedup_minhash" -> minhashReplaySql,
    // the purged index == the one-shot scan restricted to retained
    // ids (pairwise verification; DuckDB allows the ordered subquery)
    "q_forget_neardup" ->
      s"""SELECT id_a, id_b, jaccard FROM ($minhashReplaySql) q
         |WHERE id_a % 13 != 0 AND id_b % 13 != 0
         |ORDER BY id_a, id_b""".stripMargin,

    // the streaming-maintained MinHash-LSH index (NearDupStream, gate
    // in StreamQueries) must serve the same verified pair set as the
    // one-shot C2 scan for any arrival split — same exact SQL replay
    "q_stream_neardup" -> minhashReplaySql,

    // the C58 closure + C46 rational idf + per-cluster top-3, all
    // replayed from the raw tables
    "q_cluster_terms" ->
      s"""WITH RECURSIVE $embCte,
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM ed a JOIN ed b ON a.vec_id < b.vec_id
         |  JOIN nm na ON a.vec_id = na.vec_id JOIN nm nb ON b.vec_id = nb.vec_id
         |  WHERE list_sum(list_transform(list_zip(a.e, b.e), s -> s[1]*s[2]))
         |        /(na.nrm*nb.nrm) >= 0.4),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |cc AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a),
         |cl AS (SELECT cluster_id, id AS doc_id FROM cc
         |       QUALIFY count(*) OVER (PARTITION BY cluster_id) >= 2),
         |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |         FROM documents),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |idf AS (SELECT term, CAST(n_docs * 1000000 // count(*) AS BIGINT) AS idf_ppm
         |        FROM (SELECT DISTINCT doc_id, term FROM toks), n
         |        GROUP BY term, n_docs),
         |tf AS (SELECT c.cluster_id, t.term, count(*) AS tf
         |       FROM cl c JOIN toks t USING (doc_id) GROUP BY 1, 2),
         |sc AS (SELECT cluster_id, term, tf, tf * idf_ppm AS score
         |       FROM tf JOIN idf USING (term))
         |SELECT cluster_id, CAST(rnk AS BIGINT) AS rnk, term,
         |  CAST(tf AS BIGINT) AS tf, CAST(score AS BIGINT) AS score
         |FROM (SELECT *, row_number() OVER (PARTITION BY cluster_id
         |        ORDER BY score DESC, term) AS rnk FROM sc)
         |WHERE rnk <= 3 ORDER BY cluster_id, rnk""".stripMargin,

    "q_embedding_clusters" ->
      s"""WITH RECURSIVE $embCte,
         |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM ed a JOIN ed b ON a.vec_id < b.vec_id
         |  JOIN nm na ON a.vec_id = na.vec_id JOIN nm nb ON b.vec_id = nb.vec_id
         |  WHERE list_sum(list_transform(list_zip(a.e, b.e), s -> s[1]*s[2]))
         |        /(na.nrm*nb.nrm) >= 0.4),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
         |SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY id""".stripMargin,

    "q_dedup_embedding" ->
      s"""WITH $embCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         | list_sum(list_transform(list_zip(a.e, b.e), s -> s[1]*s[2]))/(na.nrm*nb.nrm) AS cos
         |FROM ed a JOIN ed b ON a.vec_id < b.vec_id
         | JOIN nm na ON a.vec_id = na.vec_id JOIN nm nb ON b.vec_id = nb.vec_id
         |WHERE list_sum(list_transform(list_zip(a.e, b.e), s -> s[1]*s[2]))/(na.nrm*nb.nrm) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_brute" ->
      s"""WITH $embCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  list_sum(list_transform(list_zip(q.e, c.e), s -> s[1]*s[2]))/(nq.nrm*nc.nrm) AS cos
         | FROM ed q JOIN ed c ON q.vec_id != c.vec_id
         |  JOIN nm nq ON q.vec_id = nq.vec_id JOIN nm nc ON c.vec_id = nc.vec_id
         | WHERE q.vec_id < 8)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_bm25" ->
      """WITH terms AS (SELECT doc_id, unnest(string_split(text,' ')) AS t
        |  FROM documents),
        |tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        |  FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
        |  FROM terms GROUP BY 1),
        |stats AS (SELECT CAST(sum(dl) AS BIGINT) AS tok_total,
        |  CAST(count(*) AS BIGINT) AS n_docs FROM dl),
        |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |qterms AS (SELECT DISTINCT doc_id AS query_id, t FROM terms
        |  WHERE doc_id < 8),
        |scored AS (
        | SELECT q.query_id, f.doc_id,
        |  CAST(sum(
        |   (n_docs * 1000000 // df) *
        |   (f.tf * 2200000 * 1000000 //
        |     (f.tf * 1000000 +
        |      (1200000 * (250000 +
        |        (750000 * (d.dl * 100 * 1000000 // (tok_total * 100 // n_docs)))
        |          // 1000000)) // 1000000))
        |   // 1000000) AS BIGINT) AS score_ppm
        | FROM qterms q
        |  JOIN tf f ON f.t = q.t AND f.doc_id <> q.query_id
        |  JOIN dfreq ON dfreq.t = q.t
        |  JOIN dl d ON d.doc_id = f.doc_id
        |  CROSS JOIN stats
        | GROUP BY 1, 2)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_ppm
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score_ppm DESC, doc_id) AS rank FROM scored)
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_hybrid_search" ->
      s"""WITH $embCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |  list_sum(list_transform(list_zip(q.e, c.e), s -> s[1]*s[2]))/(nq.nrm*nc.nrm) AS cos
         | FROM ed q JOIN ed c ON q.vec_id != c.vec_id
         |  JOIN nm nq ON q.vec_id = nq.vec_id JOIN nm nc ON c.vec_id = nc.vec_id
         | WHERE q.vec_id < 8),
         |vr AS (SELECT query_id, doc_id, rv FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, doc_id) AS rv
         |  FROM scored) WHERE rv <= 10),
         |terms AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
         |  FROM documents),
         |dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM terms GROUP BY t),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |lex AS (SELECT q.doc_id AS query_id, d.doc_id,
         |    CAST(sum(nd.n_docs * 1000000 // f.df) AS BIGINT) AS lexscore
         |  FROM terms q JOIN terms d ON q.t = d.t AND d.doc_id != q.doc_id
         |  JOIN dfreq f ON f.t = q.t CROSS JOIN nd
         |  WHERE q.doc_id < 8 GROUP BY 1, 2),
         |lr AS (SELECT query_id, doc_id, rl FROM (
         |  SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY lexscore DESC, doc_id) AS rl
         |  FROM lex) WHERE rl <= 10),
         |fused AS (SELECT coalesce(vr.query_id, lr.query_id) AS query_id,
         |    coalesce(vr.doc_id, lr.doc_id) AS doc_id,
         |    coalesce(1000000 // (60 + vr.rv), 0) + coalesce(1000000 // (60 + lr.rl), 0) AS rrf
         |  FROM vr FULL OUTER JOIN lr
         |    ON vr.query_id = lr.query_id AND vr.doc_id = lr.doc_id)
         |SELECT query_id, rank, doc_id, rrf AS rrf_ppm FROM (
         |  SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
         |  FROM fused) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q_knn_label" ->
      s"""WITH $embCte,
         |lb AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  list_sum(list_transform(list_zip(q.e, c.e), s -> s[1]*s[2]))/(nq.nrm*nc.nrm) AS cos
         | FROM ed q JOIN ed c ON q.vec_id != c.vec_id
         |  JOIN nm nq ON q.vec_id = nq.vec_id JOIN nm nc ON c.vec_id = nc.vec_id
         | WHERE q.vec_id % 29 = 0),
         |top5 AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored) WHERE rank <= 5),
         |votes AS (SELECT t.query_id, lb.label AS nlabel,
         |  CAST(count(*) AS BIGINT) AS n
         |  FROM top5 t JOIN lb ON lb.vec_id = t.neighbor_id GROUP BY 1, 2),
         |pred AS (SELECT query_id, nlabel AS pred_label FROM (
         |  SELECT query_id, nlabel, row_number() OVER (
         |    PARTITION BY query_id ORDER BY n DESC, nlabel) AS rn FROM votes)
         |  WHERE rn = 1)
         |SELECT p.query_id, p.pred_label, q.label AS true_label,
         |  CAST(p.pred_label = q.label AS BIGINT) AS correct
         |FROM pred p JOIN lb q ON q.vec_id = p.query_id
         |ORDER BY p.query_id""".stripMargin,

    // FNV-1a 64-bit with wraparound as HUGEINT arithmetic mod 2^64
    // (text is hashed byte-wise; the corpus is ASCII so ascii() ==
    // the UTF-8 byte), per-bit majority votes, brute-force pairs at
    // hamming <= 3 — exactly the set the pigeonhole bucketing emits.
    "q_dedup_simhash" ->
      """WITH RECURSIVE bits(b, pw) AS (
        |  SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT b+1, pw*2 FROM bits WHERE b < 63),
        |toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        | SELECT doc_id, list_reduce(
        |   list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |     list_transform(range(1, length(tok)+1),
        |       i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS HUGEINT))),
        |   (h, x) -> (xor(h, x) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS h
        | FROM toks),
        |votes AS (
        | SELECT doc_id, b, pw, sum(CASE WHEN (h // pw) % 2 = 1 THEN 1 ELSE -1 END) AS v
        | FROM th CROSS JOIN bits GROUP BY doc_id, b, pw),
        |sig AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN pw ELSE CAST(0 AS HUGEINT) END) AS s
        |        FROM votes GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.s, b.s)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // the C6 brute scoring and the C7b quantizer replay, joined into
    // per-query recall@5 — the metrics themselves are oracle-checked
    "q_ann_eval" ->
      s"""WITH $embCte,
         |bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${dotSql("q.e", "c.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM ed q JOIN ed c ON q.vec_id != c.vec_id
         |  JOIN nm nq ON q.vec_id = nq.vec_id JOIN nm nc ON c.vec_id = nc.vec_id
         | WHERE q.vec_id < 8),
         |btop AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM bsc) WHERE rank <= 5),
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id AS neighbor_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", " WHERE c.vec_id < 8")}) WHERE rn <= 2),
         |isc AS (
         | SELECT p.query_id, a2.neighbor_id,
         |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM probes p JOIN a2 USING (list_id)
         |  JOIN ed qe ON p.query_id = qe.vec_id JOIN ed ce ON a2.neighbor_id = ce.vec_id
         |  JOIN nm nq ON p.query_id = nq.vec_id JOIN nm nc ON a2.neighbor_id = nc.vec_id
         | WHERE p.query_id != a2.neighbor_id),
         |itop AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM isc) WHERE rank <= 5),
         |hits AS (SELECT b.query_id, CAST(count(*) AS BIGINT) AS n_hit
         | FROM btop b JOIN itop i
         |  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
         | GROUP BY 1)
         |SELECT q.vec_id AS query_id,
         |  coalesce(h.n_hit, 0) AS n_hit,
         |  coalesce(h.n_hit, 0) * 1000000 // 5 AS recall_ppm
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
         |LEFT JOIN hits h ON h.query_id = q.vec_id
         |ORDER BY query_id""".stripMargin,

    // composes the C3 simhash replay (candidates) with the C4
    // string-shingle replay (truth at the INTEGER-compare threshold
    // 2·inter >= union); counts agree with the 8-byte-hash engine
    // side absent 64-bit collisions
    "q_dedup_eval" ->
      """WITH RECURSIVE bits(b, pw) AS (
        |  SELECT 0, CAST(1 AS HUGEINT) UNION ALL SELECT b+1, pw*2 FROM bits WHERE b < 63),
        |stoks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |th AS (
        | SELECT doc_id, list_reduce(
        |   list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |     list_transform(range(1, length(tok)+1),
        |       i -> CAST(ascii(substr(tok, CAST(i AS INT), 1)) AS HUGEINT))),
        |   (h, x) -> (xor(h, x) * 1099511628211) % CAST(18446744073709551616 AS HUGEINT)) AS h
        | FROM stoks),
        |votes AS (
        | SELECT doc_id, b, pw, sum(CASE WHEN (h // pw) % 2 = 1 THEN 1 ELSE -1 END) AS v
        | FROM th CROSS JOIN bits GROUP BY doc_id, b, pw),
        |sig AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN pw ELSE CAST(0 AS HUGEINT) END) AS s
        |        FROM votes GROUP BY doc_id),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.s, b.s)) <= 3),
        |wtoks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tri3 AS (SELECT doc_id,
        |  unnest(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
        |                        for i in generate_series(1, len(w)-2)])) AS g FROM wtoks),
        |cnt3 AS (SELECT doc_id, count(*) AS c FROM tri3 GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        |  FROM tri3 a JOIN tri3 b USING (g)
        |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |truth AS (SELECT id_a, id_b FROM inter
        |  JOIN cnt3 ca ON id_a = ca.doc_id JOIN cnt3 cb ON id_b = cb.doc_id
        |  WHERE 2*i >= ca.c + cb.c - i),
        |hit AS (SELECT * FROM truth WHERE (id_a, id_b) IN (SELECT (id_a, id_b) FROM cand)),
        |m AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
        |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
        |  (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)
        |SELECT n_cand, n_truth, n_hit,
        |  CASE WHEN n_cand = 0 THEN 0 ELSE n_hit * 1000000 // n_cand END AS precision_ppm,
        |  CASE WHEN n_truth = 0 THEN 0 ELSE n_hit * 1000000 // n_truth END AS recall_ppm
        |FROM m""".stripMargin,

    // the exact bucket structure of the 4-table sign-LSH is
    // recomputed in SQL (hyperplane constants inlined), candidates
    // joined per (table, bucket), then the same exact cosine verify.
    "q_dedup_embedding_lsh" -> {
      val keyed = (0 until 4).map(t =>
        s"SELECT vec_id, $t AS t, ${bucketSql(t, 8)} AS bucket FROM ed")
        .mkString("\n UNION ALL ")
      s"""WITH $embCte,
         |keyed AS ($keyed),
         |cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM keyed x JOIN keyed y
         |  ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT id_a, id_b, cos FROM (
         | SELECT id_a, id_b, ${dotSql("ea.e", "eb.e")}/(na.nrm*nb.nrm) AS cos
         | FROM cand JOIN ed ea ON id_a = ea.vec_id JOIN ed eb ON id_b = eb.vec_id
         |  JOIN nm na ON id_a = na.vec_id JOIN nm nb ON id_b = nb.vec_id)
         |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin
    },

    // single-table sign-LSH buckets (constants inlined), candidates
    // ranked by the bit-identical cosine — DuckDB reproduces the
    // exact approximate result, not just a containment check.
    "q_ann_lsh" ->
      s"""WITH $embCte,
         |cb AS (SELECT vec_id, ${bucketSql(0, 6)} AS bucket FROM ed),
         |scored AS (
         | SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  ${dotSql("qe.e", "ce.e")}/(nq.nrm*nc.nrm) AS cos
         | FROM cb q JOIN cb c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
         |  JOIN ed qe ON q.vec_id = qe.vec_id JOIN ed ce ON c.vec_id = ce.vec_id
         |  JOIN nm nq ON q.vec_id = nq.vec_id JOIN nm nc ON c.vec_id = nc.vec_id
         | WHERE q.vec_id < 8)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM scored)
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the full PQ pipeline replayed in SQL: affine-hash codebook
    // seeds (normalized subvector slices), per-subspace nearest-code
    // assignment (ties to the smaller code, as min_by's struct
    // order), then ADC = the query's per-codeword distances summed in
    // ascending-subspace order — list(d2 ORDER BY sub) + list_sum is
    // the same left-to-right fold as the Spark expression.
    "q_ann_pq" ->
      s"""WITH $embCte,
         |$pqCtes,
         |adc AS (SELECT dq.vec_id AS query_id, cn.vec_id AS neighbor_id,
         |  list_sum(list(dq.d2 ORDER BY cn.sub)) AS adc
         | FROM codes cn JOIN dist dq ON dq.sub = cn.sub AND dq.code = cn.code
         | WHERE dq.vec_id < 8 AND dq.vec_id != cn.vec_id
         | GROUP BY 1, 2),
         |shortlist AS (SELECT query_id, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adc, neighbor_id) AS srank
         | FROM adc) WHERE srank <= 32),
         |rescored AS (SELECT query_id, neighbor_id,
         |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM shortlist
         |  JOIN ed qe ON query_id = qe.vec_id JOIN ed ce ON neighbor_id = ce.vec_id
         |  JOIN nm nq ON query_id = nq.vec_id JOIN nm nc ON neighbor_id = nc.vec_id)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM rescored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // both deterministic quantizers replayed and COMPOSED: the IVF
    // probe set (a2/probes) gates which corpus vectors enter the
    // PQ-coded ADC scan; shortlist then exact re-rank as in q_ann_pq.
    "q_ann_ivfpq" -> ivfPqReplaySql,

    // the streaming-maintained IVF-PQ index (IvfStream.landIvfPq +
    // queryTopKPq, gate in StreamQueries) must converge to the
    // one-shot build for any arrival split — same full two-quantizer
    // SQL replay as q_ann_ivfpq
    "q_stream_ann_pq" -> ivfPqReplaySql,

    // the full IVF pipeline replayed in SQL: affine-hash seed pick,
    // nearest-seed assignment, one Lloyd step in scaled-long space
    // (exact integer sums — partial-agg order can't perturb it),
    // reassignment, nprobe probe selection, list scoring, final rank.
    // the purged serving index == re-index of the retained corpus
    // under the FROZEN quantizer: full-data centroids, assignment
    // and candidates restricted to retained (vec_id % 13 != 0) ids
    "q_forget_ann" ->
      s"""WITH $embCte,
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id AS neighbor_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd",
             " WHERE c.vec_id < 8 AND c.vec_id % 13 != 0")}) WHERE rn <= 2),
         |scored AS (
         | SELECT p.query_id, a2.neighbor_id,
         |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM probes p JOIN a2 USING (list_id)
         |  JOIN ed qe ON p.query_id = qe.vec_id JOIN ed ce ON a2.neighbor_id = ce.vec_id
         |  JOIN nm nq ON p.query_id = nq.vec_id JOIN nm nc ON a2.neighbor_id = nc.vec_id
         | WHERE p.query_id != a2.neighbor_id AND a2.neighbor_id % 13 != 0)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH $embCte,
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id AS neighbor_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", " WHERE c.vec_id < 8")}) WHERE rn <= 2),
         |scored AS (
         | SELECT p.query_id, a2.neighbor_id,
         |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM probes p JOIN a2 USING (list_id)
         |  JOIN ed qe ON p.query_id = qe.vec_id JOIN ed ce ON a2.neighbor_id = ce.vec_id
         |  JOIN nm nq ON p.query_id = nq.vec_id JOIN nm nc ON a2.neighbor_id = nc.vec_id
         | WHERE p.query_id != a2.neighbor_id)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the streaming-maintained IVF index (IvfStream, gate in
    // StreamQueries) must converge to the one-shot build for any
    // arrival split: frozen deterministic quantizer + keyed upsert,
    // so the SAME full-pipeline SQL replay as q_ann_ivf is its oracle
    "q_stream_ann_index" ->
      s"""WITH $embCte,
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id AS neighbor_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
         |probes AS (SELECT vec_id AS query_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", " WHERE c.vec_id < 8")}) WHERE rn <= 2),
         |scored AS (
         | SELECT p.query_id, a2.neighbor_id,
         |  ${dotSql("qe.e", "ce.e")} / (nq.nrm * nc.nrm) AS cos
         | FROM probes p JOIN a2 USING (list_id)
         |  JOIN ed qe ON p.query_id = qe.vec_id JOIN ed ce ON a2.neighbor_id = ce.vec_id
         |  JOIN nm nq ON p.query_id = nq.vec_id JOIN nm nc ON a2.neighbor_id = nc.vec_id
         | WHERE p.query_id != a2.neighbor_id)
         |SELECT query_id, rank, neighbor_id FROM (
         | SELECT query_id, neighbor_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         | FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // the same replayed quantizer, then per-row cosine to the OWN
    // cluster's centroid (no float aggregation -> bit-reproducible)
    "q_embedding_outliers" ->
      s"""WITH $embCte,
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1)
         |SELECT a2.vec_id, CAST(a2.list_id AS BIGINT) AS cluster_id,
         | ${dotSql("ed.e", "lloyd.carr")} /
         |   (${normSql("ed.e")} * ${normSql("lloyd.carr")}) AS cos_centroid
         |FROM a2 JOIN ed USING (vec_id) JOIN lloyd USING (list_id)
         |ORDER BY a2.vec_id""".stripMargin,

    // the same replayed quantizer, then keep-min-per-cluster
    "q_semantic_dedup" ->
      s"""WITH $embCte,
         |$ivfAssignCtes
         |a2 AS (SELECT vec_id, list_id FROM (
         | ${ivfSimRank("ed", "lloyd", "")}) WHERE rn = 1),
         |stats AS (SELECT list_id, min(vec_id) AS keep_id,
         |  CAST(count(*) AS BIGINT) AS cluster_size FROM a2 GROUP BY list_id)
         |SELECT a2.vec_id, CAST(a2.list_id AS BIGINT) AS cluster_id, s.keep_id,
         | CAST(a2.vec_id = s.keep_id AS INT) AS is_kept, s.cluster_size
         |FROM a2 JOIN stats s USING (list_id)
         |ORDER BY a2.vec_id""".stripMargin,

    "q_text_langid" ->
      """SELECT doc_id, lang AS lang_labeled,
        | CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |      WHEN s_es >= s_fr THEN 'es'
        |      ELSE 'fr' END AS lang_pred
        |FROM (SELECT doc_id, lang,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','is','a'))) AS s_en,
        |  len(list_filter(string_split(text,' '), t -> t IN ('der','und','die','ist','das'))) AS s_de,
        |  len(list_filter(string_split(text,' '), t -> t IN ('el','los','es','una','y'))) AS s_es,
        |  len(list_filter(string_split(text,' '), t -> t IN ('le','les','est','une','et'))) AS s_fr
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_lang_confusion" ->
      """WITH pred AS (SELECT doc_id, lang AS lang_labeled,
        | CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
        |      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
        |      WHEN s_es >= s_fr THEN 'es'
        |      ELSE 'fr' END AS lang_pred
        |FROM (SELECT doc_id, lang,
        |  len(list_filter(string_split(text,' '), t -> t IN ('the','and','of','is','a'))) AS s_en,
        |  len(list_filter(string_split(text,' '), t -> t IN ('der','und','die','ist','das'))) AS s_de,
        |  len(list_filter(string_split(text,' '), t -> t IN ('el','los','es','una','y'))) AS s_es,
        |  len(list_filter(string_split(text,' '), t -> t IN ('le','les','est','une','et'))) AS s_fr
        | FROM documents)),
        |cells AS (SELECT lang_labeled, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
        |          FROM pred GROUP BY 1, 2),
        |rt AS (SELECT lang_labeled, CAST(sum(n_docs) AS BIGINT) AS n_label
        |       FROM cells GROUP BY 1)
        |SELECT lang_labeled, lang_pred, n_docs, n_label,
        |  CAST(n_docs * 1000000 // n_label AS BIGINT) AS share_ppm
        |FROM cells JOIN rt USING (lang_labeled)
        |ORDER BY lang_labeled, lang_pred""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_calc,
        | len(string_split(text,' ')) AS n_words,
        | len(list_filter(string_split(text,' '),
        |     t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
        | len(list_filter(string_split(text,' '),
        |     t -> t IN ('the','a','of','and','to','in','is'))) * 1.0
        |   / len(string_split(text,' ')) AS stopword_ratio,
        | list_sum(list_transform(string_split(text,' '), t -> length(t))) * 1.0
        |   / len(string_split(text,' ')) AS mean_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id, len(string_split(text,' ')) AS n_ws_tokens,
        | len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_regex_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canonical_id,
        | count(*) OVER (PARTITION BY text) AS group_size
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dup_clusters" ->
      s"""WITH RECURSIVE $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE i*1.0/(ca.c + cb.c - i) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
         |SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY id""".stripMargin,

    // same component closure as q_dup_clusters; the weight is pure
    // integer ppm so the frame replays exactly
    "q_dup_weights" ->
      s"""WITH RECURSIVE $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE i*1.0/(ca.c + cb.c - i) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |clusters AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a),
         |sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
         |          FROM clusters GROUP BY cluster_id)
         |SELECT c.id AS doc_id, s.cluster_size,
         | CAST(1000000 // s.cluster_size AS BIGINT) AS weight_ppm
         |FROM clusters c JOIN sizes s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,

    "q_topk_freq" ->
      """SELECT w AS item, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |GROUP BY w ORDER BY cnt DESC, item LIMIT 10""".stripMargin,

    "q_cluster_sizes" ->
      s"""WITH RECURSIVE $triCte,
         |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tri a JOIN tri b USING (g)
         |  WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
         |  GROUP BY 1, 2),
         |pairs AS (SELECT id_a, id_b
         |  FROM inter JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE i*1.0/(ca.c + cb.c - i) >= 0.5),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |clusters AS (SELECT a AS id, min(b) AS cluster_id FROM reach GROUP BY a),
         |sizes AS (SELECT cluster_id, count(*) AS cluster_size
         |          FROM clusters GROUP BY cluster_id)
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,

    "q_group_topk" ->
      """SELECT source, item, cnt FROM (
        | SELECT source, w AS item, count(*) AS cnt,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY count(*) DESC, w) AS rn
        | FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        | GROUP BY source, w)
        |WHERE rn <= 5
        |ORDER BY source, cnt DESC, item""".stripMargin,

    // UTF-8 BYTE semantics (the Spark side hashes the encoded payload):
    // per code point c, byte count = 1/2/3/4 and byte sum expands the
    // UTF-8 encoding arithmetic — exact for any text, not just ASCII.
    // regexp option 's' so '.' also matches newlines.
    "q_mm_binary" ->
      """WITH cps AS (
        | SELECT doc_id, n_chars,
        |  list_transform(regexp_extract_all(text, '.', 0, 's'), ch -> ord(ch)) AS cp
        | FROM documents),
        |b AS (
        | SELECT doc_id, n_chars,
        |  coalesce(list_sum(list_transform(cp, c ->
        |    CASE WHEN c < 128 THEN 1 WHEN c < 2048 THEN 2
        |         WHEN c < 65536 THEN 3 ELSE 4 END)), 0) AS n_bytes,
        |  coalesce(list_sum(list_transform(cp, c ->
        |    CASE WHEN c < 128 THEN c
        |         WHEN c < 2048 THEN 320 + (c // 64) + (c % 64)
        |         WHEN c < 65536 THEN 480 + (c // 4096) + ((c // 64) % 64) + (c % 64)
        |         ELSE 624 + (c // 262144) + ((c // 4096) % 64) + ((c // 64) % 64) + (c % 64)
        |    END)), 0) AS checksum
        | FROM cps)
        |SELECT doc_id, n_bytes::bigint AS n_bytes, checksum::bigint AS checksum,
        | ((n_chars % 64 + 1) // 2 + 1)::int AS out_w,
        | ((doc_id % 48 + 1) // 2 + 1)::int AS out_h,
        | CASE WHEN n_bytes = 0 THEN 0 ELSE (n_bytes - 1) // 7 + 1 END::bigint AS sampled_len
        |FROM b ORDER BY doc_id""".stripMargin,

    // frame windows replayed on the (ASCII) payload: stride 32,
    // frame 16 — same constants pinned in qMmFrames
    "q_mm_frames" ->
      """WITH f AS (
        | SELECT doc_id, text, length(text) AS n,
        |   unnest(generate_series(0, CAST(floor((length(text)-1)/32) AS INT))) AS fi
        | FROM documents WHERE length(text) > 0)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
        | CAST(fi*32 AS BIGINT) AS off,
        | CAST(least(16, n - fi*32) AS BIGINT) AS frame_len,
        | CAST(list_sum(list_transform(generate_series(1, least(16, n - fi*32)),
        |    i -> ascii(substr(text, fi*32 + i, 1)))) AS BIGINT) AS frame_sum
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // the same frame replay, then boundary-where-|Δsum|>80 between
    // consecutive FULL frames, running-sum shot segmentation, and
    // per-video shot stats — constants pinned in qMmShots
    "q_mm_shots" ->
      """WITH f AS (
        | SELECT doc_id, text, length(text) AS n,
        |   unnest(generate_series(0, CAST(floor((length(text)-1)/32) AS INT))) AS fi
        | FROM documents WHERE length(text) > 0),
        |fr AS (
        | SELECT doc_id, fi AS frame_idx, least(16, n - fi*32) AS frame_len,
        |  list_sum(list_transform(generate_series(1, least(16, n - fi*32)),
        |    i -> ascii(substr(text, fi*32 + i, 1)))) AS frame_sum
        | FROM f),
        |l AS (
        | SELECT *, lag(frame_sum) OVER w AS prev_sum,
        |   lag(frame_len) OVER w AS prev_len
        | FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)),
        |b AS (
        | SELECT *, CASE WHEN prev_sum IS NOT NULL AND frame_len = 16
        |   AND prev_len = 16 AND abs(frame_sum - prev_sum) > 80
        |   THEN 1 ELSE 0 END AS boundary FROM l),
        |s AS (
        | SELECT *, sum(boundary) OVER (PARTITION BY doc_id ORDER BY frame_idx
        |   ROWS UNBOUNDED PRECEDING) AS shot_id FROM b),
        |g AS (SELECT doc_id, shot_id, count(*) AS shot_frames
        |      FROM s GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(shot_frames) AS BIGINT) AS n_frames,
        | CAST(count(*) AS BIGINT) AS n_shots,
        | CAST(max(shot_frames) AS BIGINT) AS max_shot_len
        |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays the stub pHash from UTF-8 payload bytes (the q_mm_binary
    // codepoint->byte expansion), then the same 6x10-bit banded join
    "q_mm_phash" ->
      """WITH cps AS (
        | SELECT doc_id,
        |  list_transform(regexp_extract_all(text, '.', 0, 's'), ch -> ord(ch)) AS cp
        | FROM documents),
        |bytes AS (
        | SELECT doc_id, unnest(flatten(list_transform(cp, c ->
        |   CASE WHEN c < 128 THEN [c]
        |        WHEN c < 2048 THEN [192 + c // 64, 128 + c % 64]
        |        WHEN c < 65536 THEN [224 + c // 4096, 128 + (c // 64) % 64, 128 + c % 64]
        |        ELSE [240 + c // 262144, 128 + (c // 4096) % 64,
        |              128 + (c // 64) % 64, 128 + c % 64]
        |   END))) AS b
        | FROM cps),
        |grp AS (SELECT doc_id, b % 60 AS g, count(*) AS n FROM bytes GROUP BY 1, 2),
        |ph AS (SELECT d.doc_id, CAST(coalesce(sum((n % 2) * (1::BIGINT << g)), 0) AS BIGINT) AS ph
        |  FROM documents d LEFT JOIN grp ON grp.doc_id = d.doc_id GROUP BY d.doc_id),
        |bands AS (SELECT doc_id, ph, g.i, (ph >> (10*g.i)) & 1023 AS band
        |  FROM ph, generate_series(0,5) AS g(i)),
        |p AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |    a.ph AS pa, b2.ph AS pb
        |  FROM bands a JOIN bands b2
        |  ON a.i = b2.i AND a.band = b2.band AND a.doc_id < b2.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        |FROM p WHERE bit_count(xor(pa, pb)) <= 5
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
