package graft

import org.apache.spark.sql.SparkSession

/** Shared machinery of the driver-death stream probes
  * ([[StreamRestartProbe]], [[MaintainRestartProbe]]): reading a
  * stream's checkpoint COMMIT LOG and halting the driver the instant a
  * target batch commits.
  *
  * Hadoop-FS resolution throughout, not java.nio: probe roots may
  * carry a foreign scheme (the hdfs/s3 sims), and the commit log lives
  * wherever the checkpoint does. */
private[graft] object RestartKit {

  /** The ids present in the stream's commit log — one file per
    * committed batch, named by batch id, written atomically after the
    * batch's sink writes land and before the next trigger plans. */
  def committedBatches(spark: SparkSession, ckpt: String): Seq[Long] = {
    val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
    val fs = commits.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).map(_.getPath.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).toSeq.sorted
  }

  /** In-process crash-window tap for specs: [[crashWindow]] calls this
    * with the window's name at each instrumented point; a spec swaps in
    * a thrower to execute a crash window without killing the suite's
    * JVM (the cross-process halt is the env var's job). Default no-op. */
  @volatile private[graft] var windowHook: String => Unit = _ => ()

  /** Named crash-window instrumentation for multi-step commit
    * protocols (first user: [[graft.streaming.KllPublish
    * .compactSegments]]'s three windows — before the generation flag,
    * after the flag before the sweep, after the sweep before the table
    * rebuild). In production both taps are no-ops: the env var is
    * unset and [[windowHook]] does nothing. A probe JVM launched with
    * `env=<window>` halts kill -9-grade (no shutdown hooks, no cleanup)
    * the moment execution reaches that window — the probe's resume
    * phase then proves the protocol heals from exactly that state. */
  def crashWindow(name: String,
                  env: String = "SPARK_GRAFT_KLL_COMPACT_HALT"): Unit = {
    if (sys.env.get(env).contains(name)) {
      println(s"RESTARTPROBE halting in crash window $name")
      System.out.flush()
      Runtime.getRuntime.halt(137)
    }
    windowHook(name)
  }

  /** Kill-switch gated on the COMMIT LOG, not the listener bus (r13
    * advice #4: a progress listener fires asynchronously, so extra
    * batches could commit — or the stream drain entirely — between the
    * event being posted and the halt executing): a daemon thread polls
    * `<ckpt>/commits/<haltAfterBatches-1>` — written atomically
    * (temp + rename) by HDFSMetadataLog immediately after that batch
    * commits, BEFORE the next trigger's work starts — every 5 ms and
    * `Runtime.halt`s (a kill -9-grade death: no shutdown hooks, no
    * stream.stop) the moment it lands. The next batch's full
    * read/transform/write cycle is orders of magnitude longer than the
    * poll period; the resuming phase re-verifies the actual death
    * point from the log itself, so any residual overrun is LOUD. */
  def haltOnCommit(spark: SparkSession, ckpt: String,
                   haltAfterBatches: Int): Unit = {
    val watcher = new Thread(() => {
      val target = new org.apache.hadoop.fs.Path(
        s"$ckpt/commits/${haltAfterBatches - 1}")
      val tfs = target.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // wait for a COMPLETE commit file, not mere existence: on a
      // copy-rename store (the s3 sim — and real S3A checkpoints have
      // the same hazard) HDFSMetadataLog's temp+rename lands as
      // create-dst + write + delete-src, so the name is visible while
      // the bytes are still landing; halting on a torn commit would
      // crash run2's log replay, not prove the resume. Stable non-zero
      // length across two polls = the copy closed.
      def len(): Long =
        try { val st = tfs.getFileStatus(target); st.getLen }
        catch { case _: java.io.IOException => -1L }
      var prev = -1L
      var cur = len()
      while (cur <= 0 || cur != prev) {
        Thread.sleep(5); prev = cur; cur = len()
      }
      println(s"RESTARTPROBE halting driver after committed " +
        s"batch ${haltAfterBatches - 1}")
      System.out.flush()
      Runtime.getRuntime.halt(137)
    })
    watcher.setDaemon(true)
    watcher.start()
  }
}
