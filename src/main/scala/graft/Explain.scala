package graft

/** Plan inspector: prints the formatted physical plan for the named
  * queries (all of them with no args). Usage:
  *   sbt "runMain graft.Explain q06_star_join q26_minhash_lsh"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Session.get()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
