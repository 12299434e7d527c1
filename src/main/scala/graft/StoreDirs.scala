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
  * 32-store ceiling re-enters) under four local-dir layouts:
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
  * RocksDB working dirs materialized under each local dir — the
  * evidence the knob actually spreads stores. `spark.local.dir` is a
  * STATIC conf (read at SparkContext init), so every layout gets a
  * fresh context: stop → rebuild, one JVM.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/graft_sf05 sbt -batch "runMain graft.StoreDirs"
  */
object StoreDirs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf05")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    import java.nio.file.{Files, Paths, Path}

    def mk(p: String): String = { Files.createDirectories(Paths.get(p)); p }
    def entries(p: String): Set[String] = {
      val s = Files.list(Paths.get(p)); try {
        val it = s.iterator(); val b = Set.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result()
      } finally s.close()
    }

    // stage the source once (8 files = 8 micro-batches), bootstrap session
    val boot = Session.builder(s"local[$cpus]", cpus).getOrCreate()
    boot.sparkContext.setLogLevel("WARN")
    val srcDir = Files.createTempDirectory("storedirs_src").toString
    boot.read.parquet(s"$sfDir/events.parquet")
      .repartition(8).write.mode("overwrite").parquet(srcDir)
    val keys = boot.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    boot.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    val layouts: Seq[(String, Seq[String])] = Seq(
      "disk1" -> Seq(mk("/tmp/graft_ldir_a")),
      "disk4" -> (1 to 4).map(i => mk(s"/tmp/graft_ldir_$i")),
      "shm1" -> Seq(mk("/dev/shm/graft_ldir_a")),
      "disk+shm" -> Seq(mk("/tmp/graft_ldir_a"), mk("/dev/shm/graft_ldir_b")))

    println(s"[storedirs] sf=$sfDir keys=$keys")
    for ((tag, dirs) <- layouts) {
      val spark = Session.builder(s"local[$cpus]", cpus)
        .config("spark.local.dir", dirs.mkString(","))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
      for (stores <- Seq(32, 8); rep <- 1 to 2) {
        val before = dirs.map(d => d -> entries(d)).toMap
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
        q.awaitTermination(600000L)
        val wall = (System.nanoTime() - t0) / 1e9
        val sos = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
        val commitS = sos.map(_.commitTimeMs).sum / 1e3
        val spread = dirs.map { d =>
          val fresh = (entries(d) -- before(d)).count(_.startsWith("spark"))
          s"${d.takeRight(12)}:+$fresh"
        }.mkString(" ")
        Session.rocksDBConfs.keys.foreach(spark.conf.unset)
        println(f"[storedirs] layout=$tag%-8s stores=$stores%2d run=$rep " +
          f"wall=$wall%6.2f commitSum=$commitS%7.2f dirs[$spread]")
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
