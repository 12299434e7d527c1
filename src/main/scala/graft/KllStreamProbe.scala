package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables
import graft.streaming.KllPublish

/** DRIVER-crash and store-fault probe for the streaming KLL dashboard
  * ([[graft.streaming.KllPublish]]) — q127's continuous twin run across
  * real process boundaries, [[MaintainRestartProbe]]'s shape:
  *
  *  - `base`:   bootstrap the base window into the segment store, stage
  *              the delta rows as 4 one-batch files, run the sink to
  *              completion, and VALIDATE the served dashboard
  *              (count-exact vs the corpus, estimates inside the exact
  *              envelope). Under an env-driven fault rate this phase is
  *              the fault campaign's streaming leg: it either completes
  *              with the validation green or dies loudly naming the
  *              injected fault — never serves a wrong dashboard.
  *  - `resume`: re-run the sink over the SAME checkpoint/segment store
  *              (re-staging the source only if its job never committed)
  *              and validate — the fault-free recovery pass after a
  *              faulted `base`, and a cross-JVM restart-attach (this
  *              JVM attaches the published table via the marker gate).
  *  - `run1`:   fresh lineage, halted by [[RestartKit.haltOnCommit]]
  *              after exactly 2 committed batches (driver death
  *              mid-stream).
  *  - `run2`:   a NEW JVM verifies the death point from the commit log,
  *              resumes, drains the remaining files.
  *  - `check`:  the crashed+resumed dashboard must match the
  *              uninterrupted `base` run's: equal total and per-slice
  *              EXACT counts (KLL tracks n exactly — a lost or doubled
  *              batch shifts them), estimates of BOTH inside the exact
  *              envelope (blob bytes legitimately differ: KLL
  *              compaction draws random bits per run).
  *
  * Identical micro-batch boundaries by construction: the source files
  * are staged once, `maxFilesPerTrigger=1`, same listing order. */
object KllStreamProbe {

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("base")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val root = args.lift(2).getOrElse("/tmp/graft_kllstream_probe")
    val spark = Session.builderFromEnv(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = s"$root/src"
    def segDir(tag: String) = s"$root/seg_$tag"

    def stageDelta(cut: Long): Unit =
      KllPublish.stageDelta(spark, sfDir, src, cut, files = 4)

    def runSink(tag: String, haltAfterBatches: Int): Unit = {
      val ckpt = s"$root/ckpt_$tag"
      if (haltAfterBatches > 0)
        RestartKit.haltOnCommit(spark, ckpt, haltAfterBatches)
      val in = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val q = KllPublish.kllPublishedSink(in, segDir(tag), ckpt)
      try require(q.awaitTermination(300000L), s"$tag stream timed out")
      finally q.stop()
    }

    def validate(tag: String): String = {
      val r = KllPublish.attachServe(spark, segDir(tag)).head
      val nRows = r.getAs[Long]("n_rows")
      val sketchN = r.getAs[Long]("sketch_n")
      val corpus = Tables.lineitem(spark, sfDir).count()
      require(nRows == corpus && sketchN == corpus,
        s"KLLPROBE FAIL [$tag]: dashboard counts (n_rows=$nRows, " +
          s"sketch_n=$sketchN) != corpus $corpus — a batch was lost or doubled")
      val (_, ex) = Sketches.exactQuantilesDistributed(
        Tables.lineitem(spark, sfDir), "l_extendedprice",
        Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
      val p50 = r.getAs[Double]("est_p50")
      val p95 = r.getAs[Double]("est_p95")
      require(p50 >= ex(0) && p50 <= ex(2) && p95 >= ex(3) && p95 <= ex(5),
        s"KLLPROBE FAIL [$tag]: estimates (p50=$p50, p95=$p95) outside the " +
          "exact envelope — the served sketch is wrong, not just noisy")
      s"n_rows=$nRows slices=${r.getAs[Long]("slices")} sketch_n=$sketchN"
    }

    def perSliceN(tag: String): Map[String, Long] =
      spark.table(KllPublish.tableName(segDir(tag)))
        .groupBy(col("slice")).agg(sum(col("n")).as("n")).collect()
        .map(x => x.getString(0) -> x.getLong(1)).toMap

    phase match {
      case "base" =>
        val cut = KllPublish.bootstrapBase(spark, sfDir, segDir("base"))
        stageDelta(cut)
        runSink("base", haltAfterBatches = 0)
        println(s"KLLPROBE base OK ${validate("base")}")
      case "resume" =>
        // fault-free recovery after a (possibly faulted) base: re-stage
        // ONLY if the staging job never committed (no _SUCCESS — then
        // the stream can never have started either), re-run the sink
        // over the same checkpoint + segment store, validate
        val fs = new org.apache.hadoop.fs.Path(src)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cut = KllPublish.bootstrapBase(spark, sfDir, segDir("base"))
        if (!fs.exists(new org.apache.hadoop.fs.Path(src, "_SUCCESS")))
          stageDelta(cut)
        runSink("base", haltAfterBatches = 0)
        println(s"KLLPROBE resume OK ${validate("base")}")
      case "run1" =>
        KllPublish.bootstrapBase(spark, sfDir, segDir("restart"))
        runSink("restart", haltAfterBatches = 2)
        println("KLLPROBE run1 FAILED to halt — stream drained first")
        sys.exit(1)
      case "run2" =>
        val committed =
          RestartKit.committedBatches(spark, s"$root/ckpt_restart")
        require(committed == Seq(0L, 1L),
          s"KLLPROBE FAIL: run1 was meant to die after committed " +
            s"batches [0, 1], but the commit log holds $committed")
        println(s"KLLPROBE run1 verified dead after commits $committed")
        runSink("restart", haltAfterBatches = 0)
        println(s"KLLPROBE run2 drained; ${validate("restart")}")
      case "check" =>
        val vb = validate("base")
        val vr = validate("restart")
        require(perSliceN("base") == perSliceN("restart"),
          "KLLPROBE FAIL: per-slice exact counts diverge between the " +
            "uninterrupted and the crashed+resumed dashboard")
        println(s"KLLPROBE ALL OK base[$vb] restart[$vr] " +
          "(crashed+resumed published dashboard count-exact and in-envelope)")
    }
    // fault-campaign accounting (Verify's discipline): the probe's only
    // artifact is its log, and the campaign asserts non-vacuity from it
    val injected = graft.sources.StoreFaults.faultsInjected.get()
    if (injected > 0)
      System.err.println(s"[kllprobe] store faults injected: $injected")
    spark.stop()
  }
}
