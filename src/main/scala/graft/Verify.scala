package graft

import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local iteration only): comma-separated name
    // prefixes — run just those queries. The driver always passes 2 args.
    val only: Option[Seq[String]] = args.lift(2).map(_.split(",").toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // one shared session recipe (Session.builder) — only parallelism
    // varies; SPARK_GRAFT_MASTER=local-cluster[...] re-runs the whole
    // dump with separate worker JVMs (multi-process validation)
    val spark = Session.builderFromEnv(cpus.toInt, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // full stack to stderr: a probe run's only artifact is its log,
        // and a one-line message has no frame to debug a scheme- or
        // committer-level failure from
        e.printStackTrace()
      }
    }
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${Jsons.str(k)}: ${Jsons.str(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // fault-campaign accounting (r15): the fault probe asserts its run
    // was non-vacuous — a green pass at "5%" that injected nothing
    // proves nothing — and a FAILING campaign run needs the count in
    // its only artifact, the log
    val injected = graft.sources.StoreFaults.faultsInjected.get()
    if (injected > 0)
      System.err.println(s"[verify] store faults injected: $injected")
    spark.stop()
  }
}
