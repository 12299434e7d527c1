package graft

import org.apache.spark.sql.streaming.Trigger

/** Multi-disk validation of the RocksDB store-sizing rule (r10 verdict
  * ask #3). `Tws.stateParallelism` sizes state-store count to the KEY
  * universe because the per-store fixed commit draw (open/fsync/
  * snapshot) dominates until stores hold ~hundreds of keys — but every
  * supporting measurement ran with ONE `spark.local.dir` on one disk,
  * and the engine's claim that a real cluster spreads that fixed draw
  * across executors' disks was argued, not measured. This probe runs
  * the s02 funnel (AvailableNow, 8 micro-batches, fresh checkpoint per
  * run) at the 5× corpus (7,500 user keys — the point where the
  * 32-store ceiling re-enters) under one of four local-dir layouts:
  *
  *   disk1    one /tmp dir         — the baseline every prior number used
  *   disk4    four /tmp dirs       — more DIRS, same device: isolates
  *                                   directory count from device count
  *   shm1     one /dev/shm dir     — tmpfs: the zero-disk-latency bound
  *   disk+shm one of each          — two DEVICES: RocksDB working dirs
  *                                   split ~half/half (Utils.getLocalDir
  *                                   picks per provider), the closest
  *                                   sandbox analogue of stores spread
  *                                   across executors' disks
  *
  * × store counts {32, 8} (the ceiling vs the key-sized rule). Each run
  * reports wall, Σcommit from the progress events, and the number of
  * RocksDB `StateStore*` working dirs found under each local-dir root —
  * the evidence the knob actually reached the store.
  *
  * ONE LAYOUT PER JVM (the first sweep's hard lesson): Spark caches its
  * resolved local root dirs in `Utils.localRootDirs` once per JVM, so
  * the first SparkContext's `spark.local.dir` wins for the process
  * lifetime — a multi-layout loop in one JVM silently runs every layout
  * on the FIRST one's dirs (observed: all StateStore dirs under
  * java.io.tmpdir, zero under the configured roots, identical timings
  * across "layouts"). The layout is therefore an ARG, and every session
  * in the JVM — including the source-staging bootstrap — is built with
  * the layout's dirs. Drive it once per layout:
  *
  *   for L in disk1 disk4 shm1 disk+shm; do
  *     SPARK_GRAFT_SF_DIR=/tmp/graft_sf05 SPARK_GRAFT_CPUS=32 \
  *       sbt -batch "runMain graft.StoreDirs $L"; done
  */
object StoreDirs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf05")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val layoutTag = args.headOption.getOrElse("disk1")
    import java.nio.file.{Files, Paths}

    def mk(p: String): String = { Files.createDirectories(Paths.get(p)); p }
    val dirs: Seq[String] = layoutTag match {
      case "disk1"    => Seq(mk("/tmp/graft_ldir_a"))
      case "disk4"    => (1 to 4).map(i => mk(s"/tmp/graft_ldir_$i"))
      case "shm1"     => Seq(mk("/dev/shm/graft_ldir_a"))
      case "disk+shm" => Seq(mk("/tmp/graft_ldir_a"), mk("/dev/shm/graft_ldir_b"))
      case other => sys.error(s"unknown layout '$other' (disk1|disk4|shm1|disk+shm)")
    }

    // RocksDB working dirs nest inside the per-context spark-* dir
    // (created at context init, so a top-level diff misses them) —
    // count StateStore* dirs anywhere under a root as the applied-knob
    // evidence. `exclude`: the fallback root (java.io.tmpdir) is an
    // ANCESTOR of the /tmp layouts, so its count must skip paths inside
    // the configured dirs or a correctly-applied knob prints the same
    // tmpdir signature as the knob-failure case the probe exists to
    // catch. A walk that races Spark's own temp-file deletion returns
    // -1, which the caller prints as `?` instead of a nonsense delta.
    def stateStoreDirs(root: String, exclude: Seq[String]): Int = {
      val ex = exclude.filterNot(_ == root).map(Paths.get(_))
      val s = Files.walk(Paths.get(root), 4)
      try {
        val it = s.iterator(); var n = 0
        while (it.hasNext) {
          val f = it.next()
          if (f.getFileName != null &&
              f.getFileName.toString.startsWith("StateStore") &&
              !ex.exists(f.startsWith(_))) n += 1
        }
        n
      } catch { case _: java.io.UncheckedIOException => -1 } finally s.close()
    }

    // ONE session for the whole JVM, local dirs pinned to the layout
    // before anything can populate the root-dir cache
    val spark = Session.builder(s"local[$cpus]", cpus)
      .config("spark.local.dir", dirs.mkString(","))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")

    // stage the source (8 files = 8 micro-batches)
    val srcDir = Files.createTempDirectory("storedirs_src").toString
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartition(8).write.mode("overwrite").parquet(srcDir)
    val keys = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    println(s"[storedirs] layout=$layoutTag sf=$sfDir keys=$keys dirs=${dirs.mkString(",")}")

    val tmpRoot = System.getProperty("java.io.tmpdir")
    val watched = (dirs :+ tmpRoot).distinct
    for (stores <- Seq(32, 8); rep <- 1 to 2) {
      val before = watched.map(d => d -> stateStoreDirs(d, dirs)).toMap
      val ckpt = Files.createTempDirectory("storedirs_ckpt").toString
      Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.conf.set("spark.sql.shuffle.partitions", stores.toString)
      import spark.implicits._
      val t0 = System.nanoTime()
      val ev = graft.streaming.Ingest.eventsFileStream(spark, srcDir,
          maxFilesPerTrigger = 1)
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type"),
          org.apache.spark.sql.functions.col("ts"))
        .as[graft.streaming.Funnel.FunnelEvent]
      val q = graft.streaming.Funnel.funnelProgress(ev)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      val finished = q.awaitTermination(600000L)
      if (!finished) q.stop() // a wedged run must not overlap the next cell
      val wall = (System.nanoTime() - t0) / 1e9
      val sos = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val commitS = sos.map(_.commitTimeMs).sum / 1e3
      val spread = watched.map { d =>
        val (b, a) = (before(d), stateStoreDirs(d, dirs))
        val delta = if (b < 0 || a < 0) "?" else s"+${a - b}"
        s"${d.takeRight(12)}:ss$delta"
      }.mkString(" ")
      Session.rocksDBConfs.keys.foreach(spark.conf.unset)
      println(f"[storedirs] layout=$layoutTag%-8s stores=$stores%2d run=$rep " +
        f"wall=$wall%6.2f commitSum=$commitS%7.2f dirs[$spread]" +
        (if (finished) "" else " TIMEOUT — not a valid measurement"))
    }
    spark.stop()
  }
}
