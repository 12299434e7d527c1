package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the local[32] test harness but every knob is the
  * one you would set on a real cluster: AQE on (runtime re-plan + skew-join
  * handling at 100 TB), shuffle partitions sized to the parallelism rather
  * than the 200 default, UTC so results are oracle-comparable.
  */
object Session {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet stores ts as TIMESTAMP(NANOS) which the vectorized
      // reader rejects; read as long nanos and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the staged testdata's parquet timestamps are annotated
      // isAdjustedToUTC=0, which Spark 4's default NTZ inference reads
      // as TIMESTAMP_NTZ (rows surface java.time.LocalDateTime) — a
      // staging quirk that silently flips timestamp semantics across
      // the whole engine (r9: three specs crashed on
      // Row.getAs[java.sql.Timestamp]). Pin inference OFF so parquet
      // timestamps always load as TimestampType (session-UTC instants,
      // the semantics every query and the DuckDB oracle assume);
      // SessionContractSpec asserts the resulting column type so a
      // re-staging can't flip this silently again.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // ContextCleaner frees shuffle files only when a GC collects their
      // weak references — on a large heap organic GC is minutes apart, so
      // a long-running driver accumulates dead shuffle state (measured:
      // the iterative checkpointed queries' ~2x slow mode at 10-20x data,
      // PLANS.md r8 — live RDDs bounded, shuffle files from prior work
      // not). Default interval is 30min; 5min bounds dead shuffle state
      // without the mid-query pause tax an aggressive interval costs
      // (measured at 45s: 20x q109 runs tighten to ±0.5-3s but pay ~+10s
      // level — forced GC landing INSIDE runs; boundary-time GC, which
      // the bench quiesce provides, is the cheap form of the same fix).
      .config("spark.cleaner.periodicGC.interval", "5min")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SPARK_GRAFT_WAREHOUSE", "/tmp/graft-warehouse"))
      .config("spark.ui.enabled", "false")
    // SPARK_GRAFT_HDFS_SIM=true intercepts the `hdfs` scheme with
    // graft.sources.HdfsSimFileSystem (namenode-strict create-new and
    // rename over local disk) so the whole engine — publish machinery,
    // Spark committers, bucketed-table DDL — can run with an
    // hdfs://-schemed warehouse in an image that cannot boot a real
    // MiniDFS. Strictly opt-in: a deployment pointing its warehouse at
    // REAL HDFS must never have the scheme hijacked. spark.hadoop.*
    // lands in hadoopConfiguration on driver AND executors, so the sim
    // resolves identically under local-cluster's separate worker JVMs.
    val b1 = if (sys.env.get("SPARK_GRAFT_HDFS_SIM").contains("true"))
      b.config("spark.hadoop.fs.hdfs.impl",
          classOf[graft.sources.HdfsSimFileSystem].getName)
        // the FileContext face of the same sim (streaming checkpoints
        // resolve through AbstractFileSystem, not FileSystem)
        .config("spark.hadoop.fs.AbstractFileSystem.hdfs.impl",
          classOf[graft.sources.HdfsSimAbstractFileSystem].getName)
    else b
    // SPARK_GRAFT_S3_SIM=true likewise intercepts the `s3a` scheme with
    // graft.sources.S3SimFileSystem — OBJECT-STORE semantics (copy+delete
    // rename, silent-no-op setTimes, conditional-put create) over local
    // disk, so the engine can run with an s3a://-schemed warehouse in an
    // image that ships no real S3A connector. Same opt-in rule: a
    // deployment with a real connector on the classpath must never have
    // its scheme hijacked.
    if (sys.env.get("SPARK_GRAFT_S3_SIM").contains("true"))
      b1.config("spark.hadoop.fs.s3a.impl",
          classOf[graft.sources.S3SimFileSystem].getName)
        .config("spark.hadoop.fs.AbstractFileSystem.s3a.impl",
          classOf[graft.sources.S3SimAbstractFileSystem].getName)
    else b1
  }

  /** [[builder]] with the master read from `SPARK_GRAFT_MASTER` (default
    * `local[cpus]`) — the knob the multi-process validation runs use:
    * `SPARK_GRAFT_MASTER=local-cluster[2,8,4096]` re-runs Verify or
    * Bench with two REAL worker JVMs (ClusterProbe's arrangement, r11
    * verdict ask #1). A local-cluster master additionally needs the
    * graft classes shipped to the worker processes (`spark.jars` — the
    * sbt classpath exists only in the driver; run `sbt package` first,
    * override the path via `SPARK_GRAFT_JAR`) and an executor memory
    * that fits the worker spec (`SPARK_GRAFT_EXEC_MEM`, default 3g).
    * The binary-distro executor launcher also wants
    * `SPARK_SCALA_VERSION=2.13` in the environment. */
  def builderFromEnv(cpus: Int, shufflePartitions: Int): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b0 = builder(master, shufflePartitions)
    // SPARK_GRAFT_RELIABLE=true: run the whole surface with the loops'
    // reliable-checkpoint mode on (mode-equivalence validation — the
    // oracle gate must be mode-blind)
    val b = if (sys.env.get("SPARK_GRAFT_RELIABLE").contains("true"))
      b0.config(graft.operators.Checkpoints.reliableKey, "true") else b0
    if (master.startsWith("local-cluster")) {
      val jar = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_JAR",
        "target/scala-2.13/connorfunstreamproducerspark_2.13-0.1.0.jar"))
      require(jar.exists(), s"run `sbt package` first: $jar missing")
      b.config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "3g"))
        .config("spark.jars", jar.getAbsolutePath)
    } else b
  }

  /** The 100 TB streaming-state backend: per-partition embedded RocksDB
    * instead of the default in-heap HDFS-backed map. At scale, stateful
    * streaming state (dedup gate index, funnel per-user state, session
    * windows) outgrows executor heap — RocksDB spills to local SSD,
    * bounds GC pressure, and with changelog checkpointing uploads only
    * per-batch deltas to the checkpoint location instead of full
    * snapshots. Applied per session; the provider is read per query
    * from session conf, so a deployment can run heap-state and
    * rocksdb-state queries side by side. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** The exact conf pairs [[withRocksDBStateStore]] applies — exposed so
    * the spec runs its query under the SAME pairs (a builder-only helper
    * would otherwise be dead code whose keys nothing ever validates). */
  val rocksDBConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDBProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  def withRocksDBStateStore(b: SparkSession.Builder): SparkSession.Builder =
    rocksDBConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
