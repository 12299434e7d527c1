package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx distinct within its 2% rsd envelope of the exact count") {
    Sketches.q40ApproxDistinct(spark, sf).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_customers").toDouble
      val approx = r.getAs[Long]("approx_customers").toDouble
      assert(math.abs(approx - exact) <= math.max(3.0, exact * 0.06),
        s"HLL too far off: exact=$exact approx=$approx")
    }
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
