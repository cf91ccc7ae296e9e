package graft.ann

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.dot_double

/** C6/C7: similarity search over an embedding column.
  *
  * Brute force broadcasts the (small) query set and scans the corpus
  * once — the corpus never shuffles; only #queries x k rows move. The
  * LSH path buckets by random-hyperplane signs so each query probes
  * ~corpus/2^bits vectors: the 100 TB path (bucket join instead of
  * full scan).
  */
object Ann {

  /** C6: exact cosine top-k for each query vector (query_id < corpus
    * ids; self excluded). Output (query_id, rank, neighbor_id).
    */
  private def normed(emb: DataFrame, idAs: String, eAs: String, nAs: String): DataFrame =
    emb.select(col("vec_id").as(idAs), col("embedding").as(eAs),
      graft.functions.norm_double(col("embedding")).as(nAs))

  private def cosPre(qe: String, ce: String, nq: String, nc: String) =
    graft.functions.dot_double(col(qe), col(ce)) / (col(nq) * col(nc))

  def bruteTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = normed(queries, "query_id", "qe", "nq")
    val c = normed(emb, "neighbor_id", "ce", "nc")
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosPre("qe", "ce", "nq", "nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes: component d of plane p
    * is a hash-derived value in [-1, 1) — reproducible everywhere
    * with no RNG state.
    */
  private def planeComponent(p: Int, d: Int): Double = {
    val h = graft.functions.HashAlgos.fnv1a(s"plane:$p:$d".getBytes("UTF-8"), 0,
      s"plane:$p:$d".getBytes("UTF-8").length)
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Sign-bucket id from `bits` hyperplanes (table 0). */
  def lshBucket(emb: DataFrame, bits: Int): DataFrame =
    lshBucketTable(emb, bits, table = 0)

  /** Sign-bucket id for one of L independent hash tables: each table
    * draws its own hyperplanes (seeded by table index), the standard
    * multi-table LSH construction — candidate recall for collision
    * probability p becomes 1-(1-p)^L.
    */
  def lshBucketTable(emb: DataFrame, bits: Int, table: Int): DataFrame = {
    val bucket = (0 until bits).map { p =>
      val plane = array((0 until 64).map(d =>
        lit(planeComponent(table * 1000 + p, d))): _*)
      when(dot_double(col("embedding"), plane) >= 0, lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)
    emb.withColumn("bucket", bucket)
  }

  /** C7b: IVF (inverted-file) ANN — the coarse-quantizer scale path:
    * `nLists` centroids partition the corpus into lists; a query
    * scores only its `nprobe` nearest lists (~nprobe/nLists of the
    * corpus). Centroids are fully deterministic: seeds are the
    * hash-least corpus vectors, one Lloyd refinement accumulates in
    * SCALED-LONG space (sum of round(x*2^20)) so partial-aggregation
    * order can never perturb a centroid bit. The corpus is scanned by
    * broadcast-join passes (assign, refine-assign, score) and never
    * pair-shuffled. nprobe == nLists degenerates to the exact scan
    * (recall 1.0), the spec's sanity anchor.
    */
  /** The IVF coarse quantizer on its own: `nLists` deterministic
    * centroids (hash-least seeds + one scaled-long Lloyd step — see
    * [[ivfTopK]] for why that is bit-reproducible anywhere).
    * Returns (list_id, carr).
    */
  def ivfCentroids(emb: DataFrame, nLists: Int = 8): DataFrame = {
    val Scale = 1L << 20
    val dims = 64
    // deterministic seed pick: the nLists corpus vectors with the
    // smallest affine hash of vec_id (exact integer math, replicable
    // in any engine — the SQL oracle recomputes it; products stay
    // below 2^62, ANSI-safe). orderBy+limit plans as a distributed
    // TakeOrdered (per-partition top-N + merge); the single-partition
    // row_number window then runs over only nLists rows
    val seedOrd = pmod(col("vec_id") * lit(2654435761L), lit(1000003L))
    val seedRows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(seedOrd, col("vec_id")).limit(nLists)
    val seeds = seedRows
      .withColumn("list_id",
        row_number().over(Window.orderBy(seedOrd, col("vec_id"))))
      .select(col("list_id"), col("embedding").as("carr"))
    // one Lloyd step in scaled-long space (deterministic mean)
    val sumCols = (0 until dims).map(i =>
      sum(round(col("embedding").getItem(i) * Scale).cast("long")).as(s"s$i"))
    assignToCentroids(emb, seeds)
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n"), sumCols: _*)
      .select(col("list_id"), array((0 until dims).map(i =>
        col(s"s$i").cast("double") / (col("n") * Scale.toDouble)): _*).as("carr"))
      // cache: nLists rows whose LINEAGE is a full corpus pass (seed
      // pick + assign + Lloyd aggregate); every composition consumes
      // the centroids at least twice (corpus assignment + query
      // probing, or assignment + join-back) and without the pin each
      // consumer re-runs the corpus pass. Pinned cost: nLists rows —
      // but LIFETIME is the session (each call pins a new frame; no
      // lazy-safe unpersist point exists in a composable query);
      // long-lived services should clearCache() between generations,
      // as Bench does between iterations.
      .cache()
  }

  /** Nearest-centroid assignment: one broadcast-join pass over the
    * corpus (the corpus never shuffles). Returns
    * (vec_id, embedding, list_id).
    */
  private def assignToCentroids(emb: DataFrame, cents: DataFrame): DataFrame =
    // ONE argmax kernel (ADVICE r16): same body as assignWithNorm with
    // the norm carry off — the sim expression and the (sim, -list_id)
    // tie-break exist exactly once (assignArgmax), so the two
    // consumers can never silently diverge. carryNorm=false keeps the
    // max_by payload struct as narrow as r16's (an extra carried
    // double across the Lloyd + assignment passes measured +0.1-0.2s
    // per index build at sf0.1).
    assignArgmax(emb, cents, carryNorm = false)

  /** [[assignToCentroids]] plus the vector's L2 norm (`vnorm`) carried
    * through the argmax — consumers that score against the assignment
    * (list entries, outlier cosines) read the norm here instead of
    * re-joining the corpus by key (r16: that join was a full corpus
    * shuffle whose only payload was a value this pass already had).
    */
  private def assignWithNorm(emb: DataFrame, cents: DataFrame): DataFrame =
    assignArgmax(emb, cents, carryNorm = true)

  private def assignArgmax(emb: DataFrame, cents: DataFrame,
                           carryNorm: Boolean): DataFrame = {
    // both norms are hoisted OUT of the (vector × centroid) loop: the
    // corpus norm is computed once per vector below the join (not
    // nLists times per vector), the centroid norm once per centroid on
    // the broadcast side. sim sees the identical doubles in the
    // identical expression shape (dot / (vn * cn)), so assignment and
    // tie-breaks are bit-unchanged.
    val embN = emb.withColumn("vnorm",
      graft.functions.norm_double(col("embedding")))
    val centsN = cents.withColumn("cnorm",
      graft.functions.norm_double(col("carr")))
    val scored = embN.crossJoin(broadcast(centsN))
      .withColumn("sim", dot_double(col("embedding"), col("carr")) /
        (col("vnorm") * col("cnorm")))
    // argmax as max_by, NOT a row_number window: the window would
    // shuffle AND sort the nLists-times-exploded corpus; max_by gets
    // map-side partial aggregation, so the exploded rows collapse to
    // one per vector before the exchange. Tie-break identical to the
    // oracle's rank (sim DESC, then list_id ASC via the negated
    // second struct field). The carried payload is only as wide as
    // the consumer needs (carryNorm); the winner is unaffected.
    val payload =
      if (carryNorm) struct(col("list_id"), col("embedding"), col("vnorm"))
      else struct(col("list_id"), col("embedding"))
    val out = scored.groupBy(col("vec_id"))
      .agg(max_by(payload,
        struct(col("sim"), (-col("list_id")).as("nl"))).as("b"))
    if (carryNorm)
      out.select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.vnorm").as("vnorm"), col("b.list_id").as("list_id"))
    else
      out.select(col("vec_id"), col("b.embedding").as("embedding"),
        col("b.list_id").as("list_id"))
  }

  /** Every corpus vector's refined-centroid list id — the clustering
    * surface semantic dedup builds on. Returns (vec_id, list_id).
    */
  def ivfAssign(emb: DataFrame, nLists: Int = 8): DataFrame =
    ivfAssignTo(emb, ivfCentroids(emb, nLists))

  /** Assignment against ALREADY-BUILT centroids — callers that also
    * join the centroids back (outlier scoring) pass the same frame
    * here so the centroid lineage isn't computed twice.
    */
  def ivfAssignTo(emb: DataFrame, cents: DataFrame): DataFrame =
    assignToCentroids(emb, cents)
      .select(col("vec_id"), col("list_id"))

  /** Assignment that KEEPS each vector's embedding and L2 norm
    * (`vnorm`) — for consumers that score against the assignment
    * (outlier cosines): reading them here replaces a corpus-wide
    * key re-join (r16).
    */
  def ivfAssignEmb(emb: DataFrame, cents: DataFrame): DataFrame =
    assignWithNorm(emb, cents)

  /** The two artifact frames of a plain-IVF index, the landable
    * form: centroids `(list_id, carr)` and the assigned+normed
    * corpus `(neighbor_id, list_id, ce, nc)`. A production service
    * materializes these once per corpus generation and serves every
    * query batch from them ([[ivfQueryTopK]]); q_ann_eval lands
    * them through the DerivedTable seam.
    */
  def ivfIndexFrames(emb: DataFrame, nLists: Int = 8): (DataFrame, DataFrame) = {
    val refined = ivfCentroids(emb, nLists)
    (refined, ivfListEntries(emb, refined))
  }

  /** The list-table rows for `emb` against a FROZEN coarse quantizer:
    * nearest-centroid assignment plus the normed vector the scoring
    * side reads — (neighbor_id, list_id, ce, nc). This is the
    * maintenance kernel of the streaming index
    * ([[graft.streaming.IvfStream]]): new arrivals are assigned to
    * the EXISTING centroids (one broadcast pass, batch-sized), never
    * re-clustered — the frozen-quantizer discipline of every
    * production IVF service.
    */
  def ivfListEntries(emb: DataFrame, cents: DataFrame): DataFrame =
    // the embedding and its norm ride through the assignment argmax —
    // re-joining `emb` by key here cost a full corpus shuffle whose
    // only payload was columns the assign pass already carried (r16,
    // guide §2.4: remove shuffles outright). Values bit-identical:
    // same vector, same norm fold.
    assignWithNorm(emb, cents)
      .select(col("vec_id").as("neighbor_id"), col("list_id"),
        col("embedding").as("ce"), col("vnorm").as("nc"))

  /** The IVF-PQ row set for `emb` against FROZEN quantizers (landed
    * centroids + codebooks): the [[ivfListEntries]] row plus the
    * packed PQ codes — (neighbor_id, list_id, ce, nc, codes). The
    * maintenance kernel of the streaming IVF-PQ index: both encode
    * passes are broadcast-only, batch-sized.
    */
  def ivfPqEntries(emb: DataFrame, cents: DataFrame, codebooks: DataFrame,
                   m: Int = 8): DataFrame =
    ivfListEntries(emb, cents)
      .join(pqPackCodes(emb, codebooks, m), "neighbor_id")

  /** The query side of plain IVF against built (or loaded) index
    * frames: probe the centroids, exact-score the vectors of the
    * nprobe nearest lists, rank. The corpus is touched only through
    * `lists` — no assign pass, no centroid rebuild.
    */
  def ivfQueryTopK(cents: DataFrame, lists: DataFrame, queries: DataFrame,
                   k: Int, nprobe: Int = 2): DataFrame = {
    val refined = cents
    // probe: each query's nprobe nearest centroids
    val qScored = queries.crossJoin(broadcast(refined))
      .withColumn("sim", dot_double(col("embedding"), col("carr")) /
        (graft.functions.norm_double(col("embedding")) *
          graft.functions.norm_double(col("carr"))))
    val qw = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("list_id"))
    val probes = qScored.withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("list_id"))
      .join(normed(queries, "query_id", "qe", "nq"), "query_id")

    val scored = lists.join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosPre("qe", "ce", "nq", "nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 8, nprobe: Int = 2): DataFrame = {
    val (refined, lists) = ivfIndexFrames(emb, nLists)
    ivfQueryTopK(refined, lists, queries, k, nprobe)
  }

  /** C7c: Product-quantization (PQ) ANN — the memory-compressed scale
    * tier: each (normalized) vector is encoded as `m` small codes
    * (one per subspace of `subDim = 64/m` dims), and queries score
    * candidates entirely in the compressed domain via ADC (asymmetric
    * distance computation): the query precomputes its distance to
    * every codeword once (an m x k table, broadcast), then a
    * candidate's distance is just m table lookups summed — the corpus
    * scan reads CODES (m small ints per vector), never the float
    * vectors. At 100 TB of raw embeddings the code table is ~32x
    * smaller, which is the difference between an in-memory scan and a
    * disk-bound one. Everything is deterministic (affine-hash seed
    * codebooks — same rule as [[ivfCentroids]] — and fixed-order
    * float folds), so the full pipeline replays in the SQL oracle.
    *
    * Vectors are L2-normalized before encoding, so ascending ADC
    * distance is descending cosine (|a-b|^2 = 2 - 2cos on the unit
    * sphere) and results are comparable with the other ANN tiers.
    */
  def pqCodebooks(emb: DataFrame, m: Int = 8, k: Int = 16): DataFrame = {
    val subDim = 64 / m
    val seedOrd = pmod(col("vec_id") * lit(2654435761L), lit(1000003L))
    val seedRows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(seedOrd, col("vec_id")).limit(k)
      .withColumn("nrm", graft.functions.norm_double(col("embedding")))
    // row_number over only k rows (post-limit), same pattern as IVF
    val coded = seedRows.withColumn("code",
      row_number().over(Window.orderBy(seedOrd, col("vec_id"))))
    coded.select(col("code"),
        explode(array((0 until m).map { mm =>
          struct(lit(mm).as("sub"),
            array((0 until subDim).map(d =>
              col("embedding").getItem(mm * subDim + d).cast("double") / col("nrm")): _*)
              .as("cent"))
        }: _*)).as("s"))
      .select(col("s.sub").as("sub"), col("code"), col("s.cent").as("cent"))
      // cache: m*k rows over a corpus TakeOrdered lineage, consumed by
      // both the encode pass and the query ADC tables (see
      // ivfCentroids for the rationale; pinned cost: m*k rows)
      .cache()
  }

  /** Squared L2 distance between the row's `sub`-th normalized
    * subvector (of the full array in `eCol`, norm in `nCol`) and the
    * codebook row's `cent` — a fixed left-to-right fold so the float
    * result is bit-identical to the oracle's `list_sum` replay.
    */
  private def pqSubDist(eCol: String, nCol: String, subDim: Int) =
    (0 until subDim).map { d =>
      val x = element_at(col(eCol), col("sub") * subDim + lit(d + 1)).cast("double") / col(nCol)
      val c = col("cent").getItem(d)
      (x - c) * (x - c)
    }.reduce(_ + _)

  /** Nearest-codeword assignment per (vector, subspace): the corpus
    * crosses only the broadcast m x k codebook and `min_by` collapses
    * the k candidates map-side before any exchange. Ties break to the
    * smaller code, mirrored in the oracle. Returns (vec_id, sub, code).
    */
  def pqEncode(emb: DataFrame, codebooks: DataFrame, m: Int = 8): DataFrame = {
    val subDim = 64 / m
    emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", graft.functions.norm_double(col("embedding")))
      .crossJoin(broadcast(codebooks))
      .withColumn("d2", pqSubDist("embedding", "nrm", subDim))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))
  }

  /** PQ top-k. With `rerank = 0` the ranking is pure compressed-domain
    * ADC — cheapest, but vectors inside one quantization cell tie (on
    * a clustered corpus the within-cell order is id, not similarity).
    * With `rerank = R > 0` the ADC scan only SHORTLISTS R candidates
    * per query and the exact cosine re-ranks that shortlist — the
    * float vectors are fetched for queries x R rows instead of the
    * whole corpus, which is the production IVF-PQ shape: compressed
    * scan for candidates, exact math on a sliver.
    */
  /** Corpus side of PQ: m codes per vector, packed to one array row —
    * shared by pqTopK and the persistent index so the packing order
    * can't diverge between the two paths.
    */
  private def pqPackCodes(emb: DataFrame, cb: DataFrame, m: Int): DataFrame =
    pqEncode(emb, cb, m)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("vec_id").as("neighbor_id"), col("sc").getField("code").as("codes"))

  /** Query side of PQ: the per-query ADC lookup table as a map keyed
    * sub*k + (code-1) — the ONE place that key encoding lives.
    */
  private def pqAdcTable(queries: DataFrame, cb: DataFrame, m: Int, k: Int): DataFrame = {
    val subDim = 64 / m
    queries.select(col("vec_id").as("query_id"), col("embedding"))
      .withColumn("nrm", graft.functions.norm_double(col("embedding")))
      .crossJoin(broadcast(cb))
      .withColumn("d2", pqSubDist("embedding", "nrm", subDim))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(
        struct((col("sub") * k + col("code") - 1).as("key"), col("d2").as("value")))).as("dmap"))
  }

  /** One-shot PQ ADC top-k. Internally builds (and CACHES, session
    * lifetime) the codebook frame each call — repeated callers over
    * the same corpus should [[buildIvfPqIndex]] once and
    * [[queryIvfPq]] per batch, releasing via [[IvfPqIndex.release]];
    * clearCache() is the coarse alternative. */
  def pqTopK(emb: DataFrame, queries: DataFrame, topK: Int,
             m: Int = 8, k: Int = 16, rerank: Int = 0): DataFrame = {
    val cb = pqCodebooks(emb, m, k)
    val codes = pqPackCodes(emb, cb, m)
    val dtab = pqAdcTable(queries, cb, m, k)
    // ADC: m map lookups summed in fixed subspace order (deterministic
    // float fold; no aggregation over doubles anywhere)
    val scored = codes.crossJoin(broadcast(dtab))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", (0 until m).map(mm =>
        element_at(col("dmap"), lit(mm * k) + col("codes").getItem(mm) - 1)).reduce(_ + _))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(adcW))
        .filter(col("rank") <= topK)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    } else {
      val shortlist = scored.withColumn("srank", row_number().over(adcW))
        .filter(col("srank") <= rerank)
        .select(col("query_id"), col("neighbor_id"))
      val rescored = shortlist
        .join(normed(emb, "neighbor_id", "ce", "nc"), "neighbor_id")
        .join(broadcast(normed(queries, "query_id", "qe", "nq")), "query_id")
        .withColumn("cos", cosPre("qe", "ce", "nq", "nc"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      rescored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= topK)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"), col("rank"))
    }
  }

  /** C7d: IVF-PQ — the two tiers composed the way a production ANN
    * index is built (coarse quantizer to prune the corpus, product
    * codes to score what's left, exact math only on the shortlist):
    * a query reads ~nprobe/nLists of the corpus and, within that,
    * only the m-byte codes; float vectors are touched for
    * queries x rerank rows. At a billion vectors this is the
    * difference between scanning 256 GB of floats and ~8 GB of codes
    * from 1/4 of the lists. Fully deterministic (both quantizers are
    * the affine-hash constructions above), so the SQL oracle replays
    * the entire composition.
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, topK: Int,
                nLists: Int = 8, nprobe: Int = 2,
                m: Int = 8, k: Int = 16, rerank: Int = 32): DataFrame =
    // excludeSelf: the queries here ARE corpus vectors, so a vector
    // must not return itself as its own neighbor
    queryIvfPq(buildIvfPqIndex(emb, nLists, m, k), queries, topK, nprobe, rerank,
      excludeSelf = true)

  /** A built IVF-PQ index: the four artifact frames a production ANN
    * service materializes ONCE and queries many times — centroids
    * (nLists rows), codebooks (m*k rows), per-vector codes+list
    * assignment (the compressed corpus, ~32x smaller than floats),
    * and the normed float vectors (re-rank side only). `save`/`load`
    * round-trip them as parquet, so index construction amortizes
    * across query batches and engine restarts.
    */
  final case class IvfPqIndex(cents: DataFrame, codebooks: DataFrame,
                              codes: DataFrame, vectors: DataFrame,
                              m: Int, k: Int) {
    /** Unpersist the session-lifetime frames this index pins
      * (centroids + codebooks are cached because their lineage is a
      * full corpus pass). Call when the index is retired; a loaded
      * (parquet-backed) index holds no cache, so this is a no-op
      * there. After release, further queries against the index
      * re-run the build lineage on next action. */
    def release(): Unit = {
      cents.unpersist(); codebooks.unpersist(); ()
    }
  }

  /** Builds the IVF-PQ index artifacts. NOTE: the returned index PINS
    * two small cached frames (centroids, codebooks) whose lineage is
    * a full corpus pass — cache lifetime is the session. A service
    * building many indexes must call [[IvfPqIndex.release]] (or
    * `spark.catalog.clearCache()`) per retired generation, or pinned
    * frames accumulate until LRU eviction. */
  def buildIvfPqIndex(emb: DataFrame, nLists: Int = 8,
                      m: Int = 8, k: Int = 16): IvfPqIndex = {
    // coarse tier: refined centroids + per-vector list assignment
    val cents = ivfCentroids(emb, nLists)
    val lists = ivfAssignTo(emb, cents)
      .select(col("vec_id").as("neighbor_id"), col("list_id"))
    // fine tier: PQ codes per corpus vector (global codebooks — the
    // residual-free "flat PQ within lists" variant)
    val cb = pqCodebooks(emb, m, k)
    val codes = pqPackCodes(emb, cb, m).join(lists, "neighbor_id")
    IvfPqIndex(cents, cb, codes, normed(emb, "neighbor_id", "ce", "nc"), m, k)
  }

  def saveIvfPqIndex(idx: IvfPqIndex, path: String): Unit = {
    idx.cents.write.mode("overwrite").parquet(s"$path/cents")
    idx.codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
    idx.codes.write.mode("overwrite").parquet(s"$path/codes")
    idx.vectors.write.mode("overwrite").parquet(s"$path/vectors")
    // meta goes through the SAME filesystem as the frames (Hadoop FS
    // resolves hdfs:// s3a:// file: alike) — a java.nio local write
    // would leave a remote index without its meta
    val spark = idx.cents.sparkSession
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    try out.write(s"""{"m": ${idx.m}, "k": ${idx.k}}""".getBytes("UTF-8"))
    finally out.close()
  }

  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): IvfPqIndex = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(metaPath)
    val meta = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    def intOf(key: String): Int =
      s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(meta)
        .getOrElse(throw new IllegalStateException(
          s"index meta $metaPath is missing key '$key': $meta"))
        .group(1).toInt
    IvfPqIndex(
      spark.read.parquet(s"$path/cents"),
      spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"),
      spark.read.parquet(s"$path/vectors"),
      intOf("m"), intOf("k"))
  }

  /** The query side of IVF-PQ against a built (or loaded) index: the
    * corpus is touched only through the index artifacts — probe the
    * centroids, ADC-scan the codes of nprobe lists, exact-rerank the
    * shortlist against the stored normed vectors.
    */
  def queryIvfPq(idx: IvfPqIndex, queries: DataFrame, topK: Int,
                 nprobe: Int = 2, rerank: Int = 32,
                 excludeSelf: Boolean = false): DataFrame = {
    val (m, k) = (idx.m, idx.k)
    // probe selection: each query's nprobe nearest centroids
    val qScored = queries.crossJoin(broadcast(idx.cents))
      .withColumn("sim", dot_double(col("embedding"), col("carr")) /
        (graft.functions.norm_double(col("embedding")) *
          graft.functions.norm_double(col("carr"))))
    val qw = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("list_id"))
    val probes = qScored.withColumn("rn", row_number().over(qw))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("query_id"), col("list_id"))
    // ADC tables per query, joined with its probe set
    val dtab = pqAdcTable(queries, idx.codebooks, m, k)
      .join(probes, "query_id")
    // compressed-domain scan of ONLY the probed lists. Self-exclusion
    // only applies when the query batch IS drawn from the corpus
    // (ivfPqTopK) — an external batch's ids are unrelated to corpus
    // ids, and filtering on accidental equality would silently drop
    // valid neighbors
    val scoredAll = idx.codes.join(broadcast(dtab), Seq("list_id"))
    val scored = (if (excludeSelf)
        scoredAll.filter(col("query_id") =!= col("neighbor_id"))
      else scoredAll)
      .withColumn("adc", (0 until m).map(mm =>
        element_at(col("dmap"), lit(mm * k) + col("codes").getItem(mm) - 1)).reduce(_ + _))
    val adcW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id"))
    val shortlist = scored.withColumn("srank", row_number().over(adcW))
      .filter(col("srank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val rescored = shortlist
      .join(idx.vectors, "neighbor_id")
      .join(broadcast(normed(queries, "query_id", "qe", "nq")), "query_id")
      .withColumn("cos", cosPre("qe", "ce", "nq", "nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** C7: LSH-bucketed approximate top-k: only vectors in buckets the
    * query probes are scored. `multiProbe = true` additionally probes
    * every bucket at hamming distance 1 from the query's (flip each
    * hyperplane sign once) — (bits+1)x the candidate sets for a large
    * recall gain; still ~corpus/2^bits per probe, never a full scan.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
              multiProbe: Boolean = false): DataFrame = {
    val qb0 = lshBucket(queries, bits).select(col("vec_id").as("query_id"), col("bucket"))
    val qbProbed =
      if (!multiProbe) qb0
      else qb0.select(col("query_id"),
        explode(array(col("bucket") +:
          (0 until bits).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val qb = qbProbed
      .join(normed(queries, "query_id", "qe", "nq"), "query_id")
    val cb = lshBucket(emb, bits).select(col("vec_id").as("neighbor_id"), col("bucket"))
      .join(normed(emb, "neighbor_id", "ce", "nc"), "neighbor_id")
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosPre("qe", "ce", "nq", "nc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .orderBy(col("query_id"), col("rank"))
  }
}
