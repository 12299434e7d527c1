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
