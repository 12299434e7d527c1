package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** q61 embedding quantization invariants: code range, reconstruction
  * error bound, and determinism. */
class QuantizeSpec extends SparkSpec {

  test("q61 codes are 0..255 and mse is within the quantization-step bound") {
    val rows = Similarity.queries("q61_quantize_embeddings")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getAs[String]("qvec").split(",").map(_.toInt)
      assert(codes.forall(c => c >= 0 && c <= 255))
      val (mn, mx) = (r.getAs[Double]("q_min"), r.getAs[Double]("q_max"))
      assert(mn <= mx)
      // worst-case per-element error is half a quantization step; the
      // mean of squares can't exceed the square of that (+ rounding slack)
      val step = (mx - mn) / 255.0
      assert(r.getAs[Double]("mse") <= step * step / 4.0 + 1e-9)
    }
  }

  test("q61 min/max elements quantize to the endpoints 0 and 255") {
    val rows = Similarity.queries("q61_quantize_embeddings")(spark, sf)
      .filter(col("q_min") < col("q_max")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getAs[String]("qvec").split(",").map(_.toInt)
      assert(codes.min == 0, "the minimum element must map to code 0")
      assert(codes.max == 255, "the maximum element must map to code 255")
    }
  }

  test("q108: centroid count scales with N and trained cell sizes stay in band as the corpus grows") {
    import Similarity.{scaledK, ivfTargetCellSize, ivfMinCentroids}
    // the function: floor at ivfMinCentroids, then linear in N
    assert(scaledK(500) == ivfMinCentroids)
    assert(scaledK(2000) == 40 && scaledK(20000) == 400)
    assert(scaledK(40000) == 2 * scaledK(20000), "k must scale linearly above the floor")
    // the broadcast ceiling: a 1e9-vector corpus caps at 4096 centroids
    // instead of crashing the seed collect (the oracle mirrors via least())
    assert(scaledK(1000000000L) == Similarity.ivfMaxCentroids)
    // the trained quantizer: occupied-cell populations at two real corpus
    // sizes (sf0.001: N=500 -> k=16; sf0.1: N=2000 -> k=40)
    val small = Similarity.scaledCellSizes(spark, sf).collect()
    val big = Similarity.scaledCellSizes(spark, "/root/testdata/sf0.1").collect()
    def mean(cells: Array[org.apache.spark.sql.Row]): Double =
      cells.map(_.getAs[Long]("n")).sum.toDouble / cells.length
    // training must not collapse the index: most cells stay occupied
    assert(small.length >= ivfMinCentroids / 2, s"${small.length} occupied cells")
    assert(big.length >= scaledK(2000) / 2, s"${big.length} occupied cells")
    // THE scale property q108 enforces: 4x the corpus, mean cell size
    // stays within the target band instead of growing 4x (which is what
    // q99's fixed k=16 does — its measured adversarial curve)
    assert(mean(big) <= 2.0 * ivfTargetCellSize,
      s"mean cell size ${mean(big)} left the band (target $ivfTargetCellSize)")
    assert(mean(big) <= 2.0 * math.max(mean(small), ivfTargetCellSize / 2.0),
      s"mean cell size grew ${mean(big) / mean(small)}x on a 4x corpus")
  }

  test("q112: two-level split multiplies effective cells past the coarse k and final cell sizes stay in the sub band") {
    import Similarity.{scaledK, hierCoarseK, hierSubCellSize}
    // the balanced coarse budget: √(N/10) clamped to the same rails
    assert(hierCoarseK(500) == Similarity.ivfMinCentroids)
    assert(hierCoarseK(1000000L) == 317 && hierCoarseK(256000L) == 160)
    assert(hierCoarseK(1000000000L) == Similarity.ivfMaxCentroids)
    // two corpus sizes (N=500 and N=2000, a 4x step): the guarantee the
    // two-level quantizer adds over q108 is that FINAL cell size tracks
    // hierSubCellSize — independent of both N and the coarse cap,
    // because sub-centroid budgets grow per cell as cells fatten
    val small = Similarity.hierCellSizes(spark, sf).collect()
    val big = Similarity.hierCellSizes(spark, "/root/testdata/sf0.1").collect()
    def mean(cells: Array[org.apache.spark.sql.Row]): Double =
      cells.map(_.getAs[Long]("n")).sum.toDouble / cells.length
    // the sub-level must actually split: strictly more final cells than
    // the coarse level has centroids — and at N=2000 more than even the
    // SINGLE-level k ∝ N form would carry (subK ~3-13 per coarse cell)
    assert(small.length > hierCoarseK(500), s"${small.length} final cells at N=500")
    assert(big.length > math.max(hierCoarseK(2000), scaledK(2000)),
      s"${big.length} final cells at N=2000")
    // the band: mean final cell size near the sub target at BOTH sizes —
    // 4x the corpus must not fatten final cells (coarse cells it would)
    assert(mean(small) <= 2.0 * hierSubCellSize,
      s"mean final cell ${mean(small)} left the band at N=500")
    assert(mean(big) <= 2.0 * hierSubCellSize,
      s"mean final cell ${mean(big)} left the band at N=2000")
  }

  test("argmin kernel switch: mapPartitions kernel and literal projection assign identical cells") {
    // the two kernels must be the SAME function — integer distances,
    // lowest-cid tie-break — or the k > switchK path silently diverges
    // from the oracle-gated literal path. Forced both ways on the real
    // sf0.1 corpus (2000 vectors) with the trained scaled quantizer.
    import org.apache.spark.sql.functions.{col => c}
    val dir = "/root/testdata/sf0.1"
    val eq = Similarity.specCodedVectors(spark, dir)
    val k = Similarity.scaledK(eq.count())
    val cents = Similarity.specTrainCentroids(eq, Similarity.scaledSeeds(eq, k))
    def cells(kernel: Boolean): Map[Long, Long] =
      Similarity.withCellAssigned(eq, cents, useKernel = Some(kernel))
        .select(c("vec_id"), c("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lit = cells(kernel = false)
    val ker = cells(kernel = true)
    assert(lit.size == ker.size && lit == ker,
      s"kernel/literal cell divergence on ${lit.count { case (k2, v) => ker.get(k2) != Some(v) }} vectors")
  }

  test("q74: cells partition the corpus; c_new stays inside the cell's code hull") {
    val out = graft.operators.Similarity.q74KmeansRound(spark, sf).collect()
    assert(out.length == out.map(r => (r.getLong(0), r.getInt(1))).distinct.length)
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    val dims = out.map(_.getInt(1)).distinct.sorted
    assert(dims.head == 1 && dims.last == 64)
    // every vector lands in exactly one cell: per-dim member counts sum to N
    dims.foreach { d =>
      assert(out.filter(_.getInt(1) == d).map(_.getAs[Long]("n")).sum == total)
    }
    // a mean of codes/1000 can't leave the hull of the actual data:
    // bound derived from the embeddings themselves, so dropping the
    // /1000 rescale in c_new (or any scaling regression) fails here
    val hull = graft.sources.Tables.embeddings(spark, sf)
      .select(explode(col("embedding")).as("x"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()(0)
    val (lo, hi) = (hull.getFloat(0).toDouble, hull.getFloat(1).toDouble)
    out.foreach { r =>
      val v = r.getAs[Double]("c_new")
      assert(v >= lo - 1e-3 && v <= hi + 1e-3,
        s"c_new $v outside data hull [$lo, $hi]")
    }
  }

}
