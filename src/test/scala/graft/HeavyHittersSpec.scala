package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters
import graft.functions.HeavyHitters.{MGAgg, MGBuf}

/** The Misra–Gries guarantee, checked directly: no false negatives above
  * N/(k+1), underestimates bounded by N/(k+1), ≤ k candidates — on a
  * skewed synthetic stream forced through many partitions (distributed
  * merge tree), on adversarial driver-side merge splits (pure unit), and
  * on the real corpus via q104's audit row. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def bounds(exact: Map[String, Long], sketch: Map[String, Long]): Unit = {
    val n = exact.values.sum
    val thr = n / (HeavyHitters.k + 1)
    assert(sketch.size <= HeavyHitters.k, s"${sketch.size} counters")
    sketch.foreach { case (t, est) =>
      val ex = exact.getOrElse(t, 0L)
      assert(est <= ex, s"$t overestimated: $est > $ex")
      assert(ex - est <= thr, s"$t error ${ex - est} > $thr")
    }
    exact.foreach { case (t, ex) =>
      if (ex > thr) assert(sketch.contains(t), s"frequent '$t' ($ex > $thr) missing")
    }
  }

  test("MG sketch holds its bounds on a skewed stream across 7 partitions") {
    val stream: Seq[String] =
      Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++ Seq.fill(90)("tepid") ++
        (0 until 30).flatMap(i => Seq.fill(15)(s"cold$i"))
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val mg = udaf(MGAgg)
    // deterministic spread over partitions is irrelevant to the bounds —
    // they must hold for ANY partitioning; 7 forces a real merge tree
    val sketch = stream.toDF("term").repartition(7)
      .agg(mg(col("term")).as("s")).collect()(0).getMap[String, Long](0).toMap
    bounds(exact, sketch)
    assert(sketch.contains("hot") && sketch.contains("warm"))
  }

  test("MG merge bounds survive adversarial driver-side split points") {
    val stream: Seq[String] =
      (0 until 500).map(i => s"t${i % 40}") ++ Seq.fill(200)("dominant")
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    // split the stream at several points, sketch each chunk by reduce,
    // then merge in a skewed (left-deep) tree — worst case for bounds
    Seq(1, 7, 64, 333).foreach { chunk =>
      val parts = stream.grouped(chunk).map(_.foldLeft(MGAgg.zero)(MGAgg.reduce))
      val merged = parts.reduce(MGAgg.merge)
      assert(merged.processed == stream.length.toLong)
      bounds(exact, MGAgg.finish(merged))
    }
  }

  test("q104 audit: exact fields match a recompute and every invariant flag is 1") {
    val row = HeavyHitters.q104HeavyHitters(spark, sf).collect()(0)
    val nTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t")).count()
    assert(row.getLong(0) == nTokens)
    assert(row.getInt(1) == HeavyHitters.k)
    assert(row.getLong(2) == nTokens / (HeavyHitters.k + 1))
    (3 to 6).foreach(i => assert(row.getInt(i) == 1, s"invariant flag $i flipped"))
  }
}
