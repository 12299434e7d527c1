package graft

import org.apache.spark.sql.functions._

/** Multi-process validation of the STREAMING deployment sinks (the
  * round-12 extension of ClusterProbe beyond batch): the e2e
  * stream-≡-batch guarantees so far were spec-verified in one local[4]
  * JVM. Under `SPARK_GRAFT_MASTER=local-cluster[2,8,4096]` this probe
  * re-drives both production sinks with FILE-based streaming sources
  * (no MemoryStream — the input arrives the way a deployment's does)
  * against two separate worker JVMs and asserts the exact equalities
  * the specs pin:
  *
  *   1. `IndexMaintain.maintainPublishedSink`: a single AvailableNow
  *      batch carrying exactly the published index's delta rows must
  *      re-emit q122's batch audit VERBATIM (same cells, counts, drift
  *      ratios, retrain flags);
  *   2. `Ingest.qualityGateSink`: the streamed kept-set and audit
  *      waterfall must equal the static filter chain over the same
  *      docs.
  *
  * Run: `sbt package`, then
  * `SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]'
  *  sbt "runMain graft.StreamClusterProbe /root/testdata/sf0.01"`.
  * Numbers + outcome in PLANS.md r12. */
object StreamClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.builderFromEnv(16, 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_streamcluster").toString

    // ---- leg 1: published-index maintenance, stream ≡ batch ----
    import graft.operators.Similarity
    val batchAudit = Similarity.queries("q122_index_maintain_table")(spark, dir)
      .collect().map(r => r.getAs[Long]("cell") -> r).toMap
    val mbase = spark.table(Similarity.indexTableName(dir, "mbase"))
    val cut = mbase.agg(max(col("vec_id"))).head.getLong(0) + 1L
    // the delta staged as parquet files — the file-stream input shape
    val staging = s"$root/delta_in"
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") >= cut)
      .select(col("vec_id"), col("embedding"))
      .write.parquet(staging)
    val deltaStream = spark.readStream
      .schema(spark.read.parquet(staging).schema).parquet(staging)
    val q1 = graft.streaming.IndexMaintain.maintainPublishedSink(
      deltaStream, dir, s"$root/out", s"$root/ckpt", s"$root/delta")
    try require(q1.awaitTermination(300000L),
      "maintenance stream timed out — NOT a stream-vs-batch divergence")
    finally q1.stop()
    val streamed = spark.read.parquet(s"$root/out")
      .collect().map(r => r.getAs[Long]("cell") -> r).toMap
    require(streamed.keySet == batchAudit.keySet,
      s"cell spines differ: ${streamed.keySet} vs ${batchAudit.keySet}")
    for ((cell, b) <- batchAudit; s = streamed(cell)) {
      for (c <- Seq("n_base", "n_delta"))
        require(s.getAs[Long](c) == b.getAs[Long](c), s"$c differs at cell $cell")
      require(s.getAs[Double]("drift_ratio") == b.getAs[Double]("drift_ratio"),
        s"drift_ratio differs at cell $cell")
      require(s.getAs[Int]("retrain") == b.getAs[Int]("retrain"),
        s"retrain differs at cell $cell")
    }
    println(s"STREAMCLUSTER maintain_stream_eq_batch=true cells=${streamed.size}")

    // ---- leg 2: quality gate, stream ≡ batch ----
    val docsIn = s"$root/docs_in"
    graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "source", "text").write.parquet(docsIn)
    val docStream = spark.readStream
      .schema(spark.read.parquet(docsIn).schema).parquet(docsIn)
    val q2 = graft.streaming.Ingest.qualityGateSink(
      docStream, s"$root/qout", s"$root/qckpt", s"$root/qaudit")
    try require(q2.awaitTermination(300000L),
      "quality-gate stream timed out — NOT a stream-vs-batch divergence")
    finally q2.stop()
    val staticJudged = graft.functions.Text.withFilterVerdict(
      graft.sources.Tables.documents(spark, dir).select("doc_id", "source", "text"))
    val expectKept = staticJudged.filter(col("verdict") === "kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gotKept = spark.read.parquet(s"$root/qout").select("doc_id")
      .collect().map(_.getLong(0))
    require(gotKept.length == gotKept.toSet.size, "each doc judged once")
    require(gotKept.toSet == expectKept, "stream-kept set must equal batch-kept set")
    val audit = spark.read.parquet(s"$root/qaudit")
      .groupBy("source", "verdict").agg(sum("n_docs").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expectAudit = staticJudged.groupBy("source", "verdict")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    require(audit == expectAudit, s"audit mismatch: $audit vs $expectAudit")
    println(s"STREAMCLUSTER quality_gate_stream_eq_batch=true kept=${gotKept.length}")
    println("STREAMCLUSTER ALL OK")
    spark.stop()
  }
}
