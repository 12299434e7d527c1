package graft

/** Two-PROCESS lease-contention demo (the cross-JVM half of
  * PublishedSpec's thread-level tests): holds the single-writer lease
  * of a corpus's compacted-assignments table (`mbasec` — q124's) for N
  * seconds, so a concurrently launched second JVM running q124 against
  * the same warehouse demonstrably fails with
  * [[graft.sources.Published.LeaseHeld]] instead of double-appending —
  * the CREATE_NEW primitive is filesystem-level, so the thread specs'
  * guarantee carries across processes; this probe is the evidence
  * (PLANS.md r12). No SparkSession: the lease is a file next to the
  * table, and the warehouse path is the same env-or-default the engine
  * sessions use. Usage:
  * `sbt "runMain graft.LeaseHold /root/testdata/sf0.01 40"` */
object LeaseHold {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val secs = args.lift(1).map(_.toInt).getOrElse(30)
    // arg 3: which index half to pin — "mbasec" (q124's compactor, the
    // fail-loudly demo) or "mbase" (q122's pair, the wait-and-attach demo)
    val tbl = graft.operators.Similarity.indexTableName(dir,
      args.lift(2).getOrElse("mbasec"))
    val loc = new org.apache.hadoop.fs.Path(
      sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"), tbl)
    graft.sources.Published.withLease(loc,
      s"leasehold-demo:${java.lang.ProcessHandle.current().pid()}") {
      println(s"LEASEHOLD acquired $loc for ${secs}s")
      Thread.sleep(secs * 1000L)
    }
    println("LEASEHOLD released")
  }
}
