package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row

/** Shared plumbing for the multi-process probes (ClusterProbe,
  * FaultProbe, StreamFaultProbe) — ONE implementation of the executor
  * process discovery, the delayed kill, and row canonicalization, so a
  * change to the kill protocol or the comparison rule cannot silently
  * miss a copy. */
private[graft] object ProbeKit {

  /** Order-insensitive row comparison key set. */
  def canon(rows: Array[Row]): Seq[String] = rows.map(_.toString).sorted.toSeq

  /** PIDs of the separate-process executors a local-cluster master
    * spawned (absent under plain local[N] — the probes require ≥2).
    * Scanned from THIS driver JVM's descendant tree, never the whole
    * machine's process table: local-cluster workers launch executors as
    * children of the driver's process tree, and a machine-wide match on
    * the executor main class could select — and kill -9 — an executor
    * belonging to someone else's cluster on a shared host. */
  def executorPids(): Seq[Long] =
    ProcessHandle.current().descendants().iterator().asScala
      .filter(_.info().commandLine().orElse("")
        .contains("CoarseGrainedExecutorBackend"))
      .map(_.pid()).toSeq.sorted

  /** Start a thread that kill -9s the first executor process after
    * `delayMs`; returns it for joining. `tag` prefixes the log line. */
  def killExecutorAfter(delayMs: Long, tag: String): Thread = {
    val t = new Thread(() => {
      Thread.sleep(delayMs)
      val pid = executorPids().headOption
      pid.foreach(p => ProcessHandle.of(p).ifPresent(h => { h.destroyForcibly(); () }))
      println(s"$tag killed executor pid=${pid.getOrElse(-1L)} at ${delayMs}ms")
    })
    t.start()
    t
  }
}
