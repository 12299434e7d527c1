package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx distinct within its 2% rsd envelope of the exact count") {
    Sketches.q40RawEstimates(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_customers").toDouble
      val approx = r.getAs[Long]("approx_customers").toDouble
      assert(math.abs(approx - exact) <= math.max(3.0, exact * 0.06),
        s"HLL too far off: exact=$exact approx=$approx")
    }
    // the faced (oracle-gated) form: every invariant flag is 1
    Sketches.q40ApproxDistinct(spark, sf).collect().foreach { r =>
      assert(r.getAs[Int]("approx_in_bounds") == 1, s"flag flipped: $r")
    }
  }

  test("q91: merged slice sketches and whole-corpus sketch both inside the error bound") {
    val r = Sketches.q91RawEstimates(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val exact = row.getAs[Long]("exact_customers").toDouble
    val merged = row.getAs[Long]("merged_estimate").toDouble
    val whole = row.getAs[Long]("whole_estimate").toDouble
    assert(exact > 0)
    // the mergeability invariant: union-of-slice-sketches estimates as
    // well as the one-pass sketch — both within the default-lgK HLL
    // envelope (~1.6% rsd; 5% ≈ 3σ) of the exact count, so base ∪
    // delta never needs a rescan of base
    assert(math.abs(merged - exact) <= math.max(3.0, exact * 0.05),
      s"merged=$merged exact=$exact")
    assert(math.abs(whole - exact) <= math.max(3.0, exact * 0.05),
      s"whole=$whole exact=$exact")
    // and merge-vs-whole drift (the HIP-estimator fallback) stays far
    // below the sketch's own error envelope
    assert(math.abs(merged - whole) <= math.max(3.0, exact * 0.02),
      s"merged=$merged whole=$whole")
    // the faced (oracle-gated) form: every invariant flag is 1
    val face = Sketches.q91SketchMerge(spark, sf).head()
    Seq("merged_in_bounds", "whole_in_bounds", "merged_tracks_whole").foreach(f =>
      assert(face.getAs[Int](f) == 1, s"$f flipped: $face"))
  }

  test("q98: sketch-estimated join-key overlap lands within the HLL envelope of exact") {
    val r = Sketches.q98RawEstimates(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val exact = row.getAs[Long]("exact_overlap").toDouble
    val est = row.getAs[Long]("est_overlap").toDouble
    assert(exact > 0)
    // inclusion-exclusion compounds three sketch errors — allow 3× the
    // single-sketch envelope used for q91
    assert(math.abs(est - exact) <= math.max(9.0, exact * 0.15),
      s"estimated overlap $est too far from exact $exact")
    // the estimate can never exceed either side's estimate by more than
    // union noise (overlap ⊆ each side)
    assert(est <= math.min(row.getAs[Long]("est_orders"),
      row.getAs[Long]("est_customer")) + math.max(9.0, exact * 0.15))
    // the faced (oracle-gated) form: every invariant flag is 1
    val face = Sketches.q98JoinCardEstimate(spark, sf).head()
    Seq("sides_in_bounds", "overlap_in_bounds").foreach(f =>
      assert(face.getAs[Int](f) == 1, s"$f flipped: $face"))
  }

  test("percentiles are ordered and bracket the group's range") {
    Sketches.q39Percentiles(spark, sf).collect().foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25", "p50", "p75", "p95").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }

  /** O3 demux analogue: malformed payloads route to null, clean rows pass —
    * the typed replacement for the reference's message demux
    * (regionSpout.go:127-130; its catch-all logger was dead code). */
  test("corrupt JSON payloads demux to null instead of failing the stream") {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    val df = Seq("""{"k": 1}""", """not json at all""", """{"k": 2}""")
      .toDF("props")
      .select(from_json(col("props"), schema).as("parsed"))
    val parsed = df.select(col("parsed.k")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(parsed.count(_.isDefined) == 2)
    assert(parsed.count(_.isEmpty) == 1)
  }
}
