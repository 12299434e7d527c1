package graft

import org.apache.spark.sql.functions._

/** Measurement probe behind the q40/q91/q98 deterministic faces (r11
  * verdict ask #4): prints the RAW sketch estimates and relative errors
  * at a given corpus dir, so the invariant-flag envelopes baked into
  * `operators/Sketches` are chosen from measured margins (numbers in
  * PLANS.md r12), not guessed. Reads the SAME `q*RawEstimates`
  * pipelines the shipped queries face — a probe that re-typed the
  * aggregations would silently desynchronize when a pipeline changes
  * (rsd, slice cutoff) and record envelopes for code that no longer
  * ships. Not part of the driver contract; run via
  * `sbt "runMain graft.SketchProbe /root/testdata/sf0.01"`. */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Sketches

    println(s"== q40 @ $dir")
    Sketches.q40RawEstimates(spark, dir)
      .select(col("o_orderpriority"), col("exact_customers"), col("approx_customers"),
        (abs(col("approx_customers") - col("exact_customers"))
          / col("exact_customers")).as("rel_err"))
      .orderBy(col("o_orderpriority"))
      .collect().foreach(r => println(s"SKPROBE q40 $r"))

    val r91 = Sketches.q91RawEstimates(spark, dir)
      .select(col("merged_estimate"), col("whole_estimate"), col("exact_customers"))
      .head()
    val (m, w, ex) = (r91.getLong(0), r91.getLong(1), r91.getLong(2))
    println(f"SKPROBE q91 merged=$m whole=$w exact=$ex merged_err=${math.abs(m - ex).toDouble / ex}%.5f whole_err=${math.abs(w - ex).toDouble / ex}%.5f merged_vs_whole=${math.abs(m - w).toDouble / w}%.5f")

    val r98 = Sketches.q98RawEstimates(spark, dir)
      .select(col("est_orders"), col("exact_orders_keys"), col("est_customer"),
        col("exact_customer_keys"), col("est_union"), col("est_overlap"),
        col("exact_overlap"))
      .head()
    val (eo, xo, ec, xc, eu, estOver, xover) = (r98.getLong(0), r98.getLong(1),
      r98.getLong(2), r98.getLong(3), r98.getLong(4), r98.getLong(5), r98.getLong(6))
    println(f"SKPROBE q98 est_orders=$eo exact_orders=$xo est_cust=$ec exact_cust=$xc est_union=$eu est_overlap=$estOver exact_overlap=$xover side_err_o=${math.abs(eo - xo).toDouble / xo}%.5f side_err_c=${math.abs(ec - xc).toDouble / xc}%.5f overlap_err=${math.abs(estOver - xover).toDouble / xover}%.5f")
    spark.stop()
  }
}
