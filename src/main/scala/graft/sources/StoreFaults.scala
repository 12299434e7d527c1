package graft.sources

import org.apache.hadoop.fs.Path

/** TRANSIENT per-operation fault injection, shared by every sim store
  * (r15 verdict ask #2 — the fault class is not object-store-specific:
  * an HDFS deployment's DataNode/RPC blips surface to the client as the
  * same post-retry IOException an S3 connector throws after its 500s/
  * reset/throttle retries are exhausted). Injection sits at the
  * FileSystem API boundary — the same surface the engine calls — so a
  * fired fault is indistinguishable from a connector giving up.
  * [[S3SimFileSystem]] taps put/putif/get/list/delete plus the
  * per-object copy/deletefile inside its emulated rename;
  * [[HdfsSimFileSystem]] taps the same five plus "rename" (one
  * metadata RPC — HDFS renames are atomic namenode ops, so the fault
  * lands on the CALL, never on a torn half-rename).
  *
  * Probabilistic + seeded via env for the subprocess probe legs
  * (tools/fault_probes.sh); a deterministic per-op hook for specs that
  * need a fault to land on an exact file (e.g. every PUT to a lease
  * path for a bounded window).
  *
  * THREAD/SUITE SCOPE (r15 advice #2): these are JVM-global mutable
  * fields shared by every sim FileSystem instance. The test suites rely
  * on sbt's sequential suite execution (testForkedParallel=false) for
  * isolation — a parallel-suite build would bleed injection into
  * unrelated suites. Fault specs therefore also SCOPE their injection
  * by [[faultPathPrefix]] to their own temp bases, so even a stray
  * concurrent session in the same JVM (a probe helper thread, a
  * lingering streaming query) never draws a fault on a foreign path. */
private[graft] object StoreFaults {
  /** Deterministic spec hook: return true to fault this (op, path).
    * Ops: "put" (overwrite create), "putif" (create-new / conditional
    * put), "copy"/"deletefile" (the s3 sim's rename phases, per
    * object), "rename" (the hdfs sim's metadata rename), "delete"
    * (delete call), "list", "get" (open). */
  @volatile var faultHook: (String, Path) => Boolean = (_, _) => false

  /** Probabilistic fault rate in PERCENT (env
    * SPARK_GRAFT_STORE_FAULT_PCT, legacy alias SPARK_GRAFT_S3_FAULT_PCT;
    * spec-settable). 0 = off. */
  @volatile var faultPct: Double =
    envAlias("SPARK_GRAFT_STORE_FAULT_PCT", "SPARK_GRAFT_S3_FAULT_PCT")
      .flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(0.0)

  /** Which ops the probabilistic rate applies to
    * (env SPARK_GRAFT_STORE_FAULT_OPS / SPARK_GRAFT_S3_FAULT_OPS,
    * comma-separated; default all). */
  @volatile var faultOps: Set[String] =
    envAlias("SPARK_GRAFT_STORE_FAULT_OPS", "SPARK_GRAFT_S3_FAULT_OPS")
      .map(_.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
      .getOrElse(defaultOps)

  private[graft] def defaultOps: Set[String] =
    Set("put", "putif", "copy", "delete", "deletefile", "list", "get",
      "rename")

  /** Only paths containing this substring are fault-eligible (spec
    * scoping — each fault spec sets it to its own temp base so
    * injection can never leak onto a foreign suite's files). None =
    * all paths. Env SPARK_GRAFT_STORE_FAULT_PREFIX for probe legs that
    * want to fault only the warehouse, not the checkpoint. */
  @volatile var faultPathPrefix: Option[String] =
    sys.env.get("SPARK_GRAFT_STORE_FAULT_PREFIX").filter(_.nonEmpty)

  /** Seed for the fault schedule (env SPARK_GRAFT_STORE_FAULT_SEED /
    * SPARK_GRAFT_S3_FAULT_SEED): the k-th fault-eligible op in a JVM
    * fires deterministically given the seed — reruns of a
    * single-threaded probe see the same schedule; concurrent schedules
    * vary in interleaving but hold the rate. */
  val faultSeed: Long =
    envAlias("SPARK_GRAFT_STORE_FAULT_SEED", "SPARK_GRAFT_S3_FAULT_SEED")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(42L)

  private def envAlias(name: String, legacy: String): Option[String] =
    sys.env.get(name).orElse(sys.env.get(legacy))

  private val faultOpSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Count of faults actually thrown — probes assert the campaign was
    * non-vacuous (a green run at "5%" that injected nothing proves
    * nothing). */
  val faultsInjected = new java.util.concurrent.atomic.AtomicLong(0L)

  /** splitmix64 — the standard 64-bit finalizer (public domain,
    * Steele et al., JDK SplittableRandom). */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[sources] def maybeFault(op: String, p: Path): Unit = {
    if (!faultPathPrefix.forall(pre => p.toString.contains(pre))) return
    var fire = faultHook(op, p)
    if (!fire && faultPct > 0 && faultOps.contains(op)) {
      val k = faultOpSeq.incrementAndGet()
      val u = (mix64(faultSeed ^ k) >>> 11).toDouble / (1L << 53).toDouble
      fire = u < faultPct / 100.0
    }
    if (fire) {
      val n = faultsInjected.incrementAndGet()
      throw new java.io.IOException(
        s"storefault: injected transient fault #$n ($op $p)")
    }
  }
}
