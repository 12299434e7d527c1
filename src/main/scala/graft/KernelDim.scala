package graft

import org.apache.spark.sql.functions._

/** Literal-vs-kernel argmin crossover measurement across DIMENSIONS —
  * the evidence behind `Similarity.argminKernelBudgetKDim` being a
  * k·dim budget rather than a flat k (r7 verdict #6: the r7 constant
  * was measured only at dim 64). Synthesizes N deterministic integer
  * code vectors of the given dimension (hash-generated, no RNG state),
  * then times both assignment paths at a k-sweep whose k·dim values
  * straddle the budget. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.KernelDim 256 20000"
  */
object KernelDim {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(256)
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = Session.get()
    spark.sparkContext.setLogLevel("WARN")
    val eq = spark.range(n.toLong).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => pmod(xxhash64(col("id"), i), lit(2001)) - 1000).as("q"))
      .localCheckpoint(true)
    // k sweep: k·dim from well under to well over the budget
    val ks = Seq(2, 4, 6, 12, 24, 48).filter(_ * dim <= 4096 * 64)
    ks.foreach { k =>
      val cents = eq.orderBy(col("vec_id")).limit(k).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      def time(kernel: Boolean): Double = {
        val t0 = System.nanoTime()
        operators.Similarity.withCellAssigned(eq, cents, Some(kernel))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      time(kernel = false); time(kernel = true) // warm-up
      val lit2 = math.min(time(kernel = false), time(kernel = false))
      val ker2 = math.min(time(kernel = true), time(kernel = true))
      println(f"KERNELDIM dim=$dim%-5d k=$k%-4d kdim=${k * dim}%-7d " +
        f"literal=$lit2%7.2f s  kernel=$ker2%7.2f s  ratio=${lit2 / ker2}%6.2f")
    }
    spark.stop()
  }
}
