package graft

import org.apache.spark.sql.Row

/** Executor-loss fault injection under `local-cluster` (r12): kill -9 a
  * REAL worker executor process mid-query and report whether the query
  * survives and whether the result is identical to the pre-kill
  * baseline. The expected matrix is part of the design, not an
  * aspiration:
  *
  *   - table-backed serve legs (q120/q121…): SURVIVE — lost tasks
  *     retry against the published tables on any live executor;
  *   - iterative loops in the default localCheckpoint mode (q109):
  *     FAIL — superstep blocks died with the executor and their
  *     lineage was truncated at checkpoint time (exactly the caveat
  *     `Checkpoints.materialize` documents);
  *   - the same loops with `spark.graft.reliableCheckpoints=true`:
  *     SURVIVE — supersteps re-read checkpoint FILES on shared
  *     storage, the production mode for loops that must outlive
  *     executors.
  *
  * Usage (after `sbt package`):
  * `SPARK_SCALA_VERSION=2.13 SPARK_GRAFT_MASTER='local-cluster[2,8,4096]'
  *  sbt "runMain graft.FaultProbe <query> <dir> [reliable] [killAt=MS]"`
  * Results in PLANS.md r12. */
object FaultProbe {

  import ProbeKit.{canon, executorPids}

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("q109_pagerank_stable")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reliable = args.contains("reliable")
    val killAt = args.collectFirst {
      case a if a.startsWith("killAt=") => a.stripPrefix("killAt=").toLong
    }.getOrElse(800L)
    val spark = Session.builderFromEnv(16, 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (reliable) spark.conf.set(graft.operators.Checkpoints.reliableKey, "true")
    def run(): Seq[String] = canon(SparkEntry.queries(query)(spark, dir).collect())

    val baseline = run() // warms JIT + the static loop caches
    val before = executorPids()
    require(before.size >= 2, s"need 2 separate executor processes, saw $before")

    val killer = ProbeKit.killExecutorAfter(killAt, "FAULTPROBE")
    val verdict =
      try {
        val r = run()
        s"survived=true identical=${r == baseline}"
      } catch {
        case e: Throwable =>
          "survived=false error=" + Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator.take(1)
            .mkString.take(160)
      }
    killer.join(30000)
    // recoveries distinguishes TRUE in-flight survival (0 — the loop's
    // stages re-read reliable checkpoint files) from the default mode's
    // self-heal (1 — lost-block caught, caches dropped, query retried)
    println(s"FAULTPROBE query=$query reliable=$reliable during_kill: $verdict " +
      s"recoveries=${graft.operators.Graph.recoveryCount}")
    // post-kill steady state: the replacement executor registered (the
    // standalone Worker relaunches it); the engine must serve again
    // regardless of how the mid-kill run ended
    val after =
      try { val r = run(); s"survived=true identical=${r == baseline}" }
      catch { case e: Throwable =>
        "survived=false error=" + Option(e.getMessage)
          .getOrElse(e.getClass.getName).linesIterator.take(1).mkString.take(160)
      }
    println(s"FAULTPROBE query=$query reliable=$reliable post_kill: $after")
    spark.stop()
  }
}
