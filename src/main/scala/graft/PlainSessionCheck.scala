// scratch check: a PLAIN SparkSession (no graft extensions) must still run
// every SparkEntry query via the self-healing registration
package graft
import org.apache.spark.sql.SparkSession
object PlainSessionCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    var failed = 0
    SparkEntry.queries.foreach { case (name, fn) =>
      try { fn(spark, sf).count() }
      catch { case e: Throwable => failed += 1; println(s"PLAIN-FAIL $name: ${e.getMessage.take(100)}") }
    }
    println(s"PLAIN-CHECK failed=$failed of ${SparkEntry.queries.size}")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
