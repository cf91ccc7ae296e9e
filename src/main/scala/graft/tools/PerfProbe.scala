package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the pair-heavy dedup queries: times
  * each sub-pipeline in isolation so optimization targets the real
  * cost, not a guess. Not part of the driver contract.
  */
object PerfProbe {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "perf-probe")
    spark.sparkContext.setLogLevel("WARN")

    // args mode: probe the named contract queries (min-of-2, cold
    // cache — the Bench methodology) and exit
    if (args.nonEmpty) {
      // warm on the MEASURED dir (JIT + codegen + file listing for
      // the actual tables; a fixed sf0.001 path would crash on a
      // custom dir and warm the wrong data anyway)
      args.foreach(n => graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      spark.catalog.clearCache()
      for (n <- args) {
        val ts = (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[probe] $n%-28s ${ts.min}%6.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
      spark.stop()
      return
    }
    val docs = graft.sources.Tables(spark, sfDir).documents
    docs.count()

    locally {
      val events = graft.sources.Tables(spark, sfDir).events
      events.count()
      val lines = graft.cdc.ChangeModel.changeLines(events)
      time("cdc changeLines (to_json)")(
        lines.agg(sum(length(col("line")))).count())
      time("cdc parse (from_json)")(
        graft.cdc.CdcOps.parse(lines).agg(sum(col("id"))).count())
      time("cdc snapshot full")(
        graft.cdc.CdcOps.snapshot(graft.cdc.CdcOps.parse(lines), col("user_id")).count())
    }

    for (round <- 1 to 2) {
      println(s"== round $round")
      time("shingles k=3")(graft.dedup.Dedup.shingles(docs).count())
      time("hashedShingles k=3")(graft.dedup.Dedup.hashedShingles(docs).count())
      time("hashedShingles k=5")(graft.dedup.Dedup.hashedShingles(docs, 5).count())
      val tri = graft.dedup.Dedup.hashedShingles(docs)
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .select(col("doc_id"), col("n_chars"), explode(col("shh")).as("gh"))
      time("tri exploded")(tri.count())
      val a = tri.select(col("doc_id").as("id_a"), col("n_chars").as("nc_a"), col("gh"))
      val b = tri.select(col("doc_id").as("id_b"), col("n_chars").as("nc_b"), col("gh"))
      time("pair join raw")(a.join(b, Seq("gh"))
        .filter(col("id_a") < col("id_b") && abs(col("nc_a") - col("nc_b")) <= 20).count())
      time("pair join grouped")(a.join(b, Seq("gh"))
        .filter(col("id_a") < col("id_b") && abs(col("nc_a") - col("nc_b")) <= 20)
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter")).count())
      locally {
        import graft.dedup.Dedup
        val withSig = Dedup.hashedShingles(docs).select(col("doc_id"), col("shh"),
          graft.functions.minhash_sig(col("shh")).as("sig"))
        time("mh withSig")(withSig.count())
        time("mh sig forced")(withSig.select(sum(size(col("sig")))).count())
        val bands = (0 until 16).map { k =>
          struct(lit(k).as("band"),
            xxhash64((0 until 4).map(r => col("sig").getItem(4 * k + r)) :+ lit(k): _*).as("bh"))
        }
        val cand = withSig.select(col("doc_id"), explode(array(bands: _*)).as("b"))
          .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
        time("mh cand")(cand.count())
        val pairs = cand.alias("x").join(cand.alias("y"), Seq("band", "bh"))
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
          .distinct()
        time("mh pairs")(pairs.count())
        time("full minhashLsh")(Dedup.minhashLsh(docs).count())
      }
      time("full ngramJaccard")(graft.dedup.Dedup.ngramJaccard(docs, 0.5).count())
      locally {
        import graft.dedup.Dedup
        time("skew job sampled (1/16)") { Dedup.shingleDfSkew(docs); 1L }
        time("skew job full") { Dedup.shingleDfSkew(docs, sampleBits = 0); 1L }
        println(f"[probe] shingleDfSkew = ${Dedup.shingleDfSkew(docs)}%.2f")
        time("containment plain")(Dedup.containmentPairs(docs, 0.6).count())
        time("containment prefix")(Dedup.containmentPairsPrefix(docs, 0.6).count())
      }
      time("full contamination")(
        graft.operators.CurationQueries.qContamination(spark, sfDir).count())
      time("full dup_clusters")(
        graft.operators.PipelineQueries.queries("q_dup_clusters")(spark, sfDir).count())
      locally {
        val emb = graft.sources.Tables(spark, sfDir).embeddings
        val autoBits = math.min(12, math.max(4,
          (math.log(math.max(1.0, emb.count() / 16.0)) / math.log(2.0)).ceil.toInt))
        val keyed = (0 until 4).map { t =>
          graft.ann.Ann.lshBucketTable(emb, autoBits, t)
            .select(col("vec_id"), struct(lit(t).as("t"), col("bucket").as("b")).as("tb"))
        }.reduce(_ unionAll _)
        time("elsh keyed")(keyed.count())
        val pairs = keyed.alias("x").join(keyed.alias("y"), Seq("tb"))
          .filter(col("x.vec_id") < col("y.vec_id"))
          .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
        time("elsh raw pairs")(pairs.count())
        time("elsh distinct pairs")(pairs.distinct().count())
        time("full embeddingNearDupsLsh")(
          graft.dedup.Dedup.embeddingNearDupsLsh(emb, 0.4).count())
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
