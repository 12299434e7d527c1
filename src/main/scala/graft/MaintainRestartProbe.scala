package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** DRIVER-crash fault injection for the streaming INDEX-MAINTENANCE
  * story — [[StreamRestartProbe]]'s twin over the published-index
  * lifecycle. The dedup-gate probe proved the checkpoint/resume
  * contract for a sink with one durable side table; this probe proves
  * it for `IndexMaintain.maintainPublishedSink`, whose every batch
  * writes TWO durable stores (the `batch=<id>` occupancy delta AND the
  * drift audit) against tables served from the PUBLISHED warehouse —
  * the claimed replay idempotence ("a re-delivered batch rewrites its
  * OWN partition through dynamic partition overwrite, so cumulative
  * counts never double") executed across a real driver death instead
  * of spec-approximated with fresh sink instances in one JVM.
  *
  * Four phases, one JVM each, orchestrated by
  * `tools/crash_probes.sh` leg D (all three storage modes — the
  * warehouse, source, checkpoint, deltas, and audits all resolve
  * through the active scheme):
  *  - `base`:  publish the index cold (q122's pair), stage the delta
  *             vectors as 8 files, run the maintenance stream to
  *             completion uninterrupted — the ground truth.
  *  - `run1`:  same stream, fresh checkpoint lineage, halted by
  *             [[RestartKit.haltOnCommit]] after exactly 2 committed
  *             batches (attaches the published index, never rebuilds).
  *  - `run2`:  a NEW driver JVM verifies the death point from the
  *             commit log, then resumes over the same
  *             checkpoint/delta/audit dirs; AvailableNow drains the
  *             remaining files.
  *  - `check`: the crashed+resumed delta table AND the per-batch drift
  *             audits must EQUAL base's row-for-row — no batch lost,
  *             no partition doubled, same cumulative counts at every
  *             batch id.
  *
  * Identical micro-batch boundaries by construction: the source files
  * are staged ONCE (base), `maxFilesPerTrigger=1`, same listing order
  * every phase. */
object MaintainRestartProbe {

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("base")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val root = args.lift(2).getOrElse("/tmp/graft_maintain_probe")
    val spark = Session.builderFromEnv(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = s"$root/src"

    def runSink(tag: String, haltAfterBatches: Int): Unit = {
      val ckpt = s"$root/ckpt_$tag"
      if (haltAfterBatches > 0)
        RestartKit.haltOnCommit(spark, ckpt, haltAfterBatches)
      val in = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val q = graft.streaming.IndexMaintain.maintainPublishedSink(
        in, sfDir, s"$root/out_$tag", ckpt, s"$root/delta_$tag",
        Trigger.AvailableNow())
      try require(q.awaitTermination(300000L), s"$tag stream timed out")
      finally q.stop()
    }

    // partition-column `batch` is type-INFERRED on a plain read (int
    // for small ids) — cast to long explicitly
    def deltaRows(tag: String): Seq[(Long, Long, Long)] =
      spark.read.parquet(s"$root/delta_$tag")
        .select(col("cell"), col("n"), col("batch").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    def auditRows(tag: String): Seq[(Long, Long, Long, Long, Double, Int)] =
      spark.read.parquet(s"$root/out_$tag")
        .select(col("batch").cast("long"), col("cell"), col("n_base"),
          col("n_delta"), col("drift_ratio"), col("retrain")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getInt(5))).toSeq.sorted

    phase match {
      case "base" =>
        // cold-publish the index, then stage the SAME delta traffic the
        // batch maintenance leg (q122) folds — the high-vec_id fifth
        // the published base excludes — as 8 one-batch files
        val (mbase, _) =
          graft.operators.Similarity.publishedMaintFor(spark, sfDir)
        val cut = mbase.agg(max(col("vec_id"))).head.getLong(0) + 1L
        graft.sources.Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") >= cut)
          .select(col("vec_id"),
            transform(col("embedding"), _.cast("double")).as("embedding"))
          .repartition(8).write.mode("overwrite").parquet(src)
        runSink("base", haltAfterBatches = 0)
        val d = deltaRows("base")
        println(s"MAINTAINPROBE base deltaRows=${d.size} " +
          s"batches=${d.map(_._3).distinct.size} " +
          s"vectors=${d.map(_._2).sum}")
      case "run1" =>
        runSink("restart", haltAfterBatches = 2)
        // unreachable when the halt fires (it must); loud if it didn't
        println("MAINTAINPROBE run1 FAILED to halt — stream drained first")
        sys.exit(1)
      case "run2" =>
        val committed =
          RestartKit.committedBatches(spark, s"$root/ckpt_restart")
        require(committed == Seq(0L, 1L),
          s"MAINTAINPROBE FAIL: run1 was meant to die after committed " +
            s"batches [0, 1], but the commit log holds $committed")
        println(s"MAINTAINPROBE run1 verified dead after commits $committed")
        runSink("restart", haltAfterBatches = 0)
        println(s"MAINTAINPROBE run2 drained remaining batches; " +
          s"deltaRows=${deltaRows("restart").size}")
      case "check" =>
        val (db, dr) = (deltaRows("base"), deltaRows("restart"))
        require(db == dr,
          s"MAINTAINPROBE FAIL: delta tables diverge after restart " +
            s"(base ${db.size} rows over ${db.map(_._3).distinct.size} " +
            s"batches, restart ${dr.size} over " +
            s"${dr.map(_._3).distinct.size})")
        val (ab, ar) = (auditRows("base"), auditRows("restart"))
        require(ab == ar,
          s"MAINTAINPROBE FAIL: drift audits diverge after restart " +
            s"(base ${ab.size} rows, restart ${ar.size})")
        require(db.nonEmpty && ab.nonEmpty,
          "MAINTAINPROBE FAIL: empty probe tables prove nothing")
        println(s"MAINTAINPROBE ALL OK deltaRows=${dr.size} " +
          s"batches=${dr.map(_._3).distinct.size} " +
          s"auditRows=${ar.size} (crashed+resumed index maintenance " +
          "identical to uninterrupted run)")
    }
    spark.stop()
  }
}
