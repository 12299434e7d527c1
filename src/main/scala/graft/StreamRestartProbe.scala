package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DRIVER-crash fault injection for the streaming restart story (r12
  * verdict ask #3): StreamFaultProbe kills an executor; this probe
  * kills the DRIVER JVM mid-stream and restarts the query from its
  * checkpoint in a brand-new driver process — the remaining leg of the
  * streaming fault matrix (a production stream outlives its driver via
  * checkpoint + idempotent batch-keyed sinks, `Ingest.dedupGateSink`'s
  * documented contract, here finally proven across real process
  * boundaries instead of spec-approximated with fresh sink instances
  * in one JVM).
  *
  * Four phases, orchestrated by `tools/crash_probes.sh` (each phase is
  * its own JVM — that's the point):
  *  - `base`:  stage the source files once, then run the dedup-gate
  *             stream to completion uninterrupted — the ground truth.
  *  - `run1`:  same stream, fresh checkpoint lineage — but a
  *             StreamingQueryListener calls `Runtime.halt` as soon as
  *             TWO batches have committed: a kill -9-grade driver
  *             death (no shutdown hooks, no stream.stop) with the
  *             stream mid-flight.
  *  - `run2`:  a NEW driver JVM starts the same sink over the same
  *             checkpoint/output/index dirs; AvailableNow drains the
  *             remaining files.
  *  - `check`: the restarted lineage's decisions must EQUAL base's —
  *             every input doc decided exactly once, no batch lost, no
  *             batch doubled, same verdicts.
  *
  * Identical micro-batch boundaries by construction: one staged file
  * per trigger (`maxFilesPerTrigger=1`), same listing order in every
  * phase, so base and the crashed+resumed lineage see the same batch
  * composition and the decision stream is deterministic. The halt is
  * gated on the checkpoint COMMIT LOG, not the listener bus (r13
  * advice #4: a progress listener fires asynchronously, so extra
  * batches could commit — or the stream drain entirely — between the
  * event being posted and `Runtime.halt` executing): a watcher thread
  * polls `<ckpt>/commits/<id>` — written atomically (temp + rename) by
  * HDFSMetadataLog immediately after a batch commits, BEFORE the next
  * trigger's work starts — every 5 ms and halts the moment commit
  * `haltAfterBatches-1` lands; the next batch's full
  * read+dedup-join+two-partition-overwrite cycle is orders of
  * magnitude longer than the poll period. And because any residual
  * race must be LOUD, not silently weakening (the other half of the
  * advice): `run2` reads the commit log BEFORE restarting and requires
  * it to hold exactly commits `0..haltAfterBatches-1` — direct
  * synchronous evidence of where run1 died, independent of any
  * listener timing. A halt landing between sink write and checkpoint
  * commit (the other torn state) would merely re-deliver one batch,
  * which the sink's dynamic partition overwrite rewrites idempotently
  * — either way `check` must see base's exact rows. */
object StreamRestartProbe {

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("base")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val root = args.lift(2).getOrElse("/tmp/graft_restart_probe")
    val spark = Session.builderFromEnv(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = s"$root/src"
    // corpus = the low-id half of the documents table (already-ingested
    // history, as a banded signature index); the stream delivers the
    // high-id half, which contains that corpus's near-dups AND its own
    // cross-file duplicates — both decision paths exercised
    val cut = 100L
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def corpusIndex = graft.operators.Dedup.bandedIndex(
      docs.filter(col("doc_id") < cut).select("doc_id", "text"))

    def committedBatches(ckpt: String): Seq[Long] =
      RestartKit.committedBatches(spark, ckpt)

    def runSink(tag: String, haltAfterBatches: Int): Unit = {
      val ckpt = s"$root/ckpt_$tag"
      // kill-switch gated on the COMMIT LOG, not the listener bus:
      // commit file N-1 appears the instant batch N-1 is durable,
      // strictly before batch N's (hundreds-of-ms) work could
      // commit — so the driver dies with exactly `haltAfterBatches`
      // batches on disk. run2 re-verifies that from the log itself.
      if (haltAfterBatches > 0)
        RestartKit.haltOnCommit(spark, ckpt, haltAfterBatches)
      val in = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val q = graft.streaming.Ingest.dedupGateSink(in, corpusIndex,
        s"$root/out_$tag", ckpt, s"$root/idx_$tag",
        Trigger.AvailableNow())
      try require(q.awaitTermination(300000L), s"$tag stream timed out")
      finally q.stop()
    }

    def decisions(tag: String): Seq[(Long, String, Option[Long])] =
      spark.read.parquet(s"$root/out_$tag")
        .select(col("doc_id"), col("decision"), col("matched_doc"))
        .collect().map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq

    phase match {
      case "base" =>
        docs.filter(col("doc_id") >= cut).select("doc_id", "text")
          .repartition(8).write.mode("overwrite").parquet(src)
        runSink("base", haltAfterBatches = 0)
        val d = decisions("base")
        println(s"RESTARTPROBE base decisions=${d.size} " +
          s"ingest=${d.count(_._2 == "ingest")} skip=${d.count(_._2 == "skip")}")
      case "run1" =>
        runSink("restart", haltAfterBatches = 2)
        // unreachable when the halt fires (it must); loud if it didn't
        println("RESTARTPROBE run1 FAILED to halt — stream drained first")
        sys.exit(1)
      case "run2" =>
        // the mid-stream guarantee, read off the commit log BEFORE
        // resuming: run1 died with EXACTLY its target batches durable —
        // any extra id here means the halt overran its gate (and any
        // fewer means it fired early); either way this run fails loudly
        // instead of silently weakening the probe's claim
        val committed = committedBatches(s"$root/ckpt_restart")
        require(committed == Seq(0L, 1L),
          s"RESTARTPROBE FAIL: run1 was meant to die after committed " +
            s"batches [0, 1], but the commit log holds $committed")
        println(s"RESTARTPROBE run1 verified dead after commits $committed")
        runSink("restart", haltAfterBatches = 0)
        println(s"RESTARTPROBE run2 drained remaining batches; " +
          s"decisions=${decisions("restart").size}")
      case "check" =>
        val base = decisions("base")
        val rst = decisions("restart")
        val dupIds = rst.groupBy(_._1).filter(_._2.size > 1).keys.toSeq.sorted
        require(dupIds.isEmpty,
          s"RESTARTPROBE FAIL: doc ids decided twice after restart: ${dupIds.take(5)}")
        val missing = base.map(_._1).toSet -- rst.map(_._1).toSet
        require(missing.isEmpty,
          s"RESTARTPROBE FAIL: decisions lost across restart: ${missing.take(5)}")
        require(base.sorted == rst.sorted,
          "RESTARTPROBE FAIL: restarted decisions diverge from the uninterrupted run")
        println(s"RESTARTPROBE ALL OK decisions=${rst.size} " +
          s"ingest=${rst.count(_._2 == "ingest")} skip=${rst.count(_._2 == "skip")} " +
          "(crashed+resumed lineage identical to uninterrupted run)")
    }
    spark.stop()
  }
}
