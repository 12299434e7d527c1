package graft

/** Reproduces the driver's t1 smoke check: SparkEntry.entry(spark) must
  * return >0 rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
