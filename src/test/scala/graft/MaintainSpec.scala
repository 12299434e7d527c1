package graft

import org.apache.spark.sql.functions._

/** q114 incremental index maintenance: the drift detector proven on
  * planted inputs (a detector only demonstrated on data that happens
  * not to drift is untested), plus the end-to-end operator's
  * conservation invariants on the real corpus. */
class MaintainSpec extends SparkSpec {
  import spark.implicits._

  private def assigned(rows: Seq[(Long, Long)]) =
    rows.toDF("vec_id", "cell")

  test("q114 drift flag fires on a planted skewed delta and stays quiet on a uniform one") {
    // base: 4 cells × 25 vectors each; uniform delta: 5 per cell
    val base = assigned((0L until 100L).map(i => (i, i % 4)))
    val uniform = assigned((100L until 120L).map(i => (i, i % 4)))
    val quiet = graft.operators.Similarity
      .maintainStats(base, uniform, Seq(0L, 1L, 2L, 3L)).collect()
    assert(quiet.length == 4)
    assert(quiet.forall(_.getAs[Int]("retrain") == 0),
      s"uniform delta must not flag: ${quiet.mkString(", ")}")
    assert(quiet.forall(r => math.abs(r.getAs[Double]("drift_ratio") - 1.0) < 1e-6))

    // skewed delta: 17 of 20 new vectors land in cell 0 (its base share
    // is 1/4 — share ratio 17/5 = 3.4 > the 2x bar)
    val skewed = assigned(
      (100L until 117L).map(i => (i, 0L)) ++ (117L until 120L).map(i => (i, 1L)))
    val hot = graft.operators.Similarity
      .maintainStats(base, skewed, Seq(0L, 1L, 2L, 3L))
      .collect().map(r => r.getAs[Long]("cell") -> r).toMap
    assert(hot(0L).getAs[Int]("retrain") == 1, s"cell 0 took 85% of the delta: ${hot(0L)}")
    assert(hot(2L).getAs[Int]("retrain") == 0 && hot(3L).getAs[Int]("retrain") == 0)
    assert(hot(0L).getAs[Double]("drift_ratio") == 3.4)
    // an empty spine cell reports, with zero counts and no flag
    val spineOnly = graft.operators.Similarity
      .maintainStats(base, skewed, Seq(0L, 1L, 2L, 3L, 9L)).collect()
    val ghost = spineOnly.find(_.getAs[Long]("cell") == 9L).get
    assert(ghost.getAs[Long]("n_base") == 0L && ghost.getAs[Long]("n_delta") == 0L
      && ghost.getAs[Int]("retrain") == 0)
    // a cell absent from the base that attracts delta → always flagged
    val born = assigned(Seq((200L, 9L)))
    val flagged = graft.operators.Similarity
      .maintainStats(base, born, Seq(0L, 1L, 2L, 3L, 9L))
      .collect().find(_.getAs[Long]("cell") == 9L).get
    assert(flagged.getAs[Int]("retrain") == 1, s"unseeded hot cell must flag: $flagged")
  }

  test("streaming maintenance sink: per-batch drift, durable cumulative metadata, replay rewrites") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IndexMaintain
    implicit val sqlCtx = spark.sqlContext
    // two frozen cells on orthogonal axes; base occupancy 80/20 — the
    // drift bar is RELATIVE to base share, so the spec's batches are
    // written against these shares
    val cents = Array((0L, Seq(1000L, 0L, 0L, 0L)), (1L, Seq(0L, 1000L, 0L, 0L)))
    val baseOcc = Seq((0L, 80L), (1L, 20L)).toDF("cell", "n_base")
    val root = java.nio.file.Files.createTempDirectory("graft_maintain").toString
    val (out, ckpt, delta) = (s"$root/out", s"$root/ckpt", s"$root/delta")
    def vec(id: Long, cell: Long) = IndexMaintain.NewVector(id,
      if (cell == 0L) Seq(1.0, 0.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0, 0.0))
    val input = MemoryStream[IndexMaintain.NewVector]
    val q = IndexMaintain.maintainSink(input.toDF(), cents, baseOcc,
      out, ckpt, delta,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    def batchRows(b: Long) = spark.read.parquet(out)
      .filter(col("batch") === b).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    try {
      // batch 0 tracks the base shares (6:2 vs 80:20) — no flags; the
      // duplicate row for id 105 must collapse, not double-count
      input.addData((100L to 105L).map(vec(_, 0L)) ++
        Seq(vec(106L, 1L), vec(107L, 1L), vec(105L, 0L)))
      q.processAllAvailable()
      val b0 = batchRows(0L)
      assert(b0(0L).getAs[Long]("n_delta") == 6L && b0(1L).getAs[Long]("n_delta") == 2L)
      assert(b0.values.forall(_.getAs[Int]("retrain") == 0),
        s"share-tracking batch must not flag: $b0")
      // batch 1: 12 vectors into the 20%-share cell → cumulative 14 of
      // 20 (3.5× its base share) — the flag must fire, on CUMULATIVE
      // occupancy, not the batch alone
      input.addData((200L until 212L).map(vec(_, 1L)))
      q.processAllAvailable()
      val b1 = batchRows(1L)
      assert(b1(1L).getAs[Long]("n_delta") == 14L)
      assert(b1(1L).getAs[Int]("retrain") == 1, s"skewed cell must flag: ${b1(1L)}")
      assert(b1(0L).getAs[Int]("retrain") == 0)
    } finally q.stop()
    // replay batch 0 through a FRESH sink (new checkpoint, new driver
    // state, same metadata dirs): the rewrite must land on partition
    // batch=0 idempotently, and the fresh driver must see batch 1's
    // durable delta it never processed — cumulative counts unchanged
    val input2 = MemoryStream[IndexMaintain.NewVector]
    input2.addData((100L to 105L).map(vec(_, 0L)) ++
      Seq(vec(106L, 1L), vec(107L, 1L), vec(105L, 0L)))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_maintain_ckpt2").toString
    val q2 = IndexMaintain.maintainSink(input2.toDF(), cents, baseOcc,
      out, ckpt2, delta)
    try q2.awaitTermination(120000L) finally q2.stop()
    val replayed = batchRows(0L)
    assert(replayed(0L).getAs[Long]("n_delta") == 6L,
      s"replayed delta must overwrite, not append: ${replayed(0L)}")
    val cum = spark.read.parquet(delta).groupBy(col("cell"))
      .agg(org.apache.spark.sql.functions.sum(col("n")).as("n")).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n")).toMap
    assert(cum == Map(0L -> 6L, 1L -> 14L),
      s"cumulative metadata must survive the restart un-doubled: $cum")
    // and the replay-recomputed audit sees the full cumulative picture
    assert(replayed(1L).getAs[Long]("n_delta") == 14L,
      "fresh driver must read batch 1's durable delta it never processed")
    assert(replayed(1L).getAs[Int]("retrain") == 1)
  }

  test("published-index streaming maintenance re-emits q122's audit verbatim (stream ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.IndexMaintain
    implicit val sqlCtx = spark.sqlContext
    // the batch leg's audit over the published index ...
    val batch = graft.operators.Similarity
      .queries("q122_index_maintain_table")(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    // ... and the SAME delta rows delivered as one streaming batch into
    // the deployment sink, against the SAME published tables
    val mbase = spark.table(graft.operators.Similarity.indexTableName(sf, "mbase"))
    val cut = mbase.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val deltaVecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") >= cut).collect()
      .map(r => IndexMaintain.NewVector(r.getAs[Long]("vec_id"),
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)))
    val root = java.nio.file.Files.createTempDirectory("graft_pubmaint").toString
    val input = MemoryStream[IndexMaintain.NewVector]
    input.addData(deltaVecs.toSeq)
    val q = IndexMaintain.maintainPublishedSink(input.toDF(), sf,
      s"$root/out", s"$root/ckpt", s"$root/delta")
    try q.awaitTermination(120000L) finally q.stop()
    val streamed = spark.read.parquet(s"$root/out")
      .filter(col("batch") === 0L).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    assert(streamed.keySet == batch.keySet,
      s"cell spines differ: ${streamed.keySet} vs ${batch.keySet}")
    for ((cell, b) <- batch) {
      val s = streamed(cell)
      for (c <- Seq("n_base", "n_delta"))
        assert(s.getAs[Long](c) == b.getAs[Long](c), s"$c differs at cell $cell")
      assert(s.getAs[Double]("drift_ratio") == b.getAs[Double]("drift_ratio"),
        s"drift_ratio differs at cell $cell")
      assert(s.getAs[Int]("retrain") == b.getAs[Int]("retrain"),
        s"retrain differs at cell $cell")
    }
  }

  test("q114 end-to-end conserves the corpus split and spans every centroid") {
    val out = graft.operators.Similarity.queries("q114_index_maintain")(spark, sf)
      .collect()
    assert(out.length == 16, s"one row per trained centroid, got ${out.length}")
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val cut = (spark.read.parquet(s"$sf/embeddings.parquet")
      .agg(max(col("vec_id"))).head.getLong(0) + 1L) * 4L / 5L
    assert(out.map(_.getAs[Long]("n_base")).sum == cut,
      "every base vector lands in exactly one cell")
    assert(out.map(_.getAs[Long]("n_delta")).sum == total - cut,
      "every delta vector lands in exactly one cell")
  }
}
