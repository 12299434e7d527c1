package graft

import org.apache.spark.sql.functions._

/** One-off measurement probe behind the q40/q91/q98 deterministic
  * recast (r11 verdict ask #4): prints the RAW sketch estimates and
  * relative errors at a given corpus dir, so the invariant-flag bounds
  * baked into `operators/Sketches` are chosen from measured envelopes
  * (numbers recorded in PLANS.md), not guessed. Not part of the
  * driver contract; run via
  * `sbt "runMain graft.SketchProbe /root/testdata/sf0.01"`. */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Session.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables

    // q40: HLL++ per priority (rsd 0.02)
    val q40 = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx"))
      .select(col("o_orderpriority"), col("exact"), col("approx"),
        (abs(col("approx") - col("exact")) / col("exact")).as("rel_err"))
      .orderBy(col("o_orderpriority"))
    println(s"== q40 @ $dir")
    q40.collect().foreach(r => println(s"SKPROBE q40 $r"))

    // q91: merged vs whole vs exact (Datasketches HLL)
    val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderdate"))
    val perSlice = o
      .withColumn("slice", when(col("o_orderdate") < cutoff, "base").otherwise("delta"))
      .groupBy(col("slice")).agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perSlice.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged"))
    val whole = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("whole"),
      countDistinct(col("o_custkey")).as("exact"))
    val r91 = merged.crossJoin(whole).head()
    val (m, w, ex) = (r91.getLong(0), r91.getLong(1), r91.getLong(2))
    println(f"SKPROBE q91 merged=$m whole=$w exact=$ex merged_err=${math.abs(m - ex).toDouble / ex}%.5f whole_err=${math.abs(w - ex).toDouble / ex}%.5f merged_vs_whole=${math.abs(m - w).toDouble / w}%.5f")

    // q98: inclusion-exclusion overlap
    val oKeys = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val cKeys = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val sk = oKeys.agg(hll_sketch_agg(col("k")).as("sk"))
      .unionAll(cKeys.agg(hll_sketch_agg(col("k")).as("sk")))
    val ests = oKeys.agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("eo"),
        countDistinct(col("k")).as("xo"))
      .crossJoin(cKeys.agg(hll_sketch_estimate(hll_sketch_agg(col("k"))).as("ec"),
        countDistinct(col("k")).as("xc")))
      .crossJoin(sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("eu")))
    val exact = cKeys.join(oKeys, cKeys("k") === oKeys("k"), "left_semi")
      .agg(countDistinct(col("k")).as("xover"))
    val r98 = ests.crossJoin(exact).head()
    val (eo, xo, ec, xc, eu, xover) = (r98.getLong(0), r98.getLong(1),
      r98.getLong(2), r98.getLong(3), r98.getLong(4), r98.getLong(5))
    val estOver = eo + ec - eu
    println(f"SKPROBE q98 est_orders=$eo exact_orders=$xo est_cust=$ec exact_cust=$xc est_union=$eu est_overlap=$estOver exact_overlap=$xover side_err_o=${math.abs(eo - xo).toDouble / xo}%.5f side_err_c=${math.abs(ec - xc).toDouble / xc}%.5f overlap_err=${math.abs(estOver - xover).toDouble / xover}%.5f")
    spark.stop()
  }
}
