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
  * COMPACTION crash legs (r16 verdict ask #2 — probe leg F): minor
  * compaction is a four-step commit protocol (build gen → flag → sweep
  * → table rebuild), and each inter-step window is a real crash state
  * a deployment will eventually land in. These phases execute each
  * window across real process boundaries — the `fcompact` JVM halts
  * kill -9-grade at the window named by SPARK_GRAFT_KLL_COMPACT_HALT
  * (RestartKit.crashWindow), and a NEW JVM must then verify the exact
  * torn state and heal it with nothing but the next compaction call:
  *
  *  - `fbase`:    bootstrap + three direct batches (orderkey residue
  *                mod 3 — the stream's shape without a stream; the
  *                cross-JVM STREAM resume is legs B/E's job), validate
  *                count-exact.
  *  - `fgrow b`:  append the whole delta window as batch `b` (content
  *                duplication is fine — the dashboard counts INGESTED
  *                rows) so the next fcompact has something to fold.
  *  - `fcompact`: run compactSegments; under the halt env this JVM
  *                dies AT the named window (preflag | presweep |
  *                prerebuild), exit 137.
  *  - `fheal w`:  in a fresh JVM, first ASSERT the torn state `w`
  *                should have left (unflagged gen / unswept old gen /
  *                compacted store with a fat table — the vacuity
  *                guards that prove the kill landed inside the
  *                window), then heal via one compactSegments call and
  *                validate: store folded to one segment per slice,
  *                published table O(slices) rows, counts exact
  *                (corpus + grown batches × delta).
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

    // one corpus scan per JVM, shared by every validation below
    lazy val corpusN: Long = Tables.lineitem(spark, sfDir).count()

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
      // cadence ON (r16 verdict ask #1): with 4 one-batch files the
      // sink self-compacts at batch 3 — so the crash legs (B/E halt +
      // resume) and the fault campaign exercise MID-STREAM compaction,
      // not just per-batch appends. Compaction preserves totals and
      // per-slice exact counts, so every cross-run comparison below is
      // invariant to where (or whether) a fold landed.
      val q = KllPublish.kllPublishedSink(in, segDir(tag), ckpt,
        compactEvery = 3)
      try require(q.awaitTermination(300000L), s"$tag stream timed out")
      finally q.stop()
    }

    def validate(tag: String): String = {
      val r = KllPublish.attachServe(spark, segDir(tag)).head
      val nRows = r.getAs[Long]("n_rows")
      val sketchN = r.getAs[Long]("sketch_n")
      val corpus = corpusN
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

    // ---- leg F bookkeeping: fbase ingests the corpus exactly once
    // (base window + 3 delta batches by orderkey residue); every fgrow
    // re-appends the whole delta window as one batch (ids 3, 4, …), so
    // the exact expected count is derivable from the store's own batch
    // high-water: corpus + (maxBatch - 2) × delta. KLL tracks n
    // exactly — any batch lost to a torn compaction (or doubled by a
    // replayed one) shifts the served counts off this value. The cut
    // is read from the committed base flag (LOUD if absent — a
    // validation helper must never silently re-bootstrap). Both
    // corpus-scale constants are lazy vals: one scan each per JVM,
    // first demanded after the store is bootstrapped.
    lazy val fDeltaN: Long = KllPublish.deltaFrame(spark, sfDir,
      KllPublish.bootstrappedCut(spark, segDir("compact"))).count()
    def fExpected(sd: String): Long = {
      val maxBatch = KllPublish.readSegments(spark, sd)
        .agg(max(col("batch"))).head.getLong(0)
      corpusN + math.max(0L, maxBatch - 2L) * fDeltaN
    }

    // the folded-store shape shared by every post-compaction check
    // (leg F's heals and the fault campaign's resume): one merged
    // segment per slice, one batch id, an O(slices) published table
    def requireFolded(tag: String, sd: String): Unit = {
      val store = KllPublish.readSegments(spark, sd)
      val slices = store.select(col("slice")).distinct().count()
      require(store.count() == slices,
        s"KLLPROBE FAIL [$tag]: store holds ${store.count()} segments " +
          s"for $slices slices — not folded")
      require(store.select(col("batch")).distinct().count() == 1,
        s"KLLPROBE FAIL [$tag]: folded store spans multiple batch ids")
      require(spark.table(KllPublish.tableName(sd)).count() == slices,
        s"KLLPROBE FAIL [$tag]: published table still serves " +
          "per-batch rows after the fold")
    }

    def fValidate(tag: String, compacted: Boolean): Unit = {
      val sd = segDir("compact")
      val served = KllPublish.attachServe(spark, sd).head
      val expected = fExpected(sd)
      val nRows = served.getAs[Long]("n_rows")
      val sketchN = served.getAs[Long]("sketch_n")
      require(nRows == expected && sketchN == expected,
        s"KLLPROBE FAIL [$tag]: dashboard counts (n_rows=$nRows, " +
          s"sketch_n=$sketchN) != expected $expected — a batch was lost " +
          "or doubled across the compaction crash")
      if (compacted) requireFolded(tag, sd)
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
        // the out-of-band compaction call (a no-op here when the
        // cadence's batch-3 fold already collapsed the store): under
        // the fault campaign this draws store faults on the gen
        // build/flag/sweep op classes too — loud-or-green like the
        // sink itself
        KllPublish.compactSegments(spark, segDir("base"))
        println(s"KLLPROBE base OK ${validate("base")}")
      case "resume" =>
        // fault-free recovery after a (possibly faulted) base: re-stage
        // ONLY if the staging job never committed (no _SUCCESS — then
        // the stream can never have started either), re-run the sink
        // over the same checkpoint + segment store, validate — and
        // prove the COMPACTED shape heals too: after the fold the
        // store must hold one merged segment per slice and the
        // published table must serve O(slices) rows, whatever torn
        // compaction state the faulted base left behind
        val fs = new org.apache.hadoop.fs.Path(src)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val cut = KllPublish.bootstrapBase(spark, sfDir, segDir("base"))
        if (!fs.exists(new org.apache.hadoop.fs.Path(src, "_SUCCESS")))
          stageDelta(cut)
        runSink("base", haltAfterBatches = 0)
        KllPublish.compactSegments(spark, segDir("base"))
        val v = validate("base")
        requireFolded("resume", segDir("base"))
        println(s"KLLPROBE resume OK $v")
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

      // ---- leg F: compaction crash windows (see the scaladoc above)
      case "fbase" =>
        val sd = segDir("compact")
        val cut = KllPublish.bootstrapBase(spark, sfDir, sd)
        val delta = KllPublish.deltaFrame(spark, sfDir, cut)
        (0L to 2L).foreach(i => KllPublish.processBatch(spark, sd,
          delta.filter(pmod(col("l_orderkey"), lit(3)) === i), i))
        require(fExpected(sd) == corpusN,
          "KLLPROBE FAIL [fbase]: expected-count bookkeeping is wrong")
        fValidate("fbase", compacted = false)
        println("KLLPROBE fbase OK store seeded (base + 3 batches)")
      case "fgrow" =>
        val sd = segDir("compact")
        val b = args.lift(3).getOrElse(sys.error(
          "fgrow needs a batch id argument")).toLong
        KllPublish.processBatch(spark, sd, KllPublish.deltaFrame(
          spark, sfDir, KllPublish.bootstrappedCut(spark, sd)), b)
        fValidate("fgrow", compacted = false)
        println(s"KLLPROBE fgrow OK batch=$b appended past the compaction")
      case "fcompact" =>
        // under SPARK_GRAFT_KLL_COMPACT_HALT this JVM halts (exit 137)
        // at the named window inside compactSegments — the "OK" line
        // below is only reachable on a no-halt run
        KllPublish.compactSegments(spark, segDir("compact"))
        println("KLLPROBE fcompact OK (no halt requested)")
      case "fheal" =>
        val sd = segDir("compact")
        val window = args.lift(3).getOrElse(sys.error(
          "fheal needs the crash window name"))
        val fs = new org.apache.hadoop.fs.Path(sd)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val gens = KllPublish.genDirs(fs, sd)
        val flagged = gens.filter(g => fs.exists(KllPublish.genDone(g._2)))
        val tbl = KllPublish.tableName(sd)
        require(graft.sources.Published.ensure(spark, tbl, "slice",
          graft.operators.Sketches.kllTableBuckets,
          KllPublish.fp(sd)),
          s"KLLPROBE FAIL [fheal:$window]: published table refused before heal")
        val tableRows = spark.table(tbl).count()
        val store = KllPublish.readSegments(spark, sd)
        val storeBatches = store.select(col("batch")).distinct().count()
        // vacuity guards: the kill must have landed INSIDE the window,
        // leaving exactly that window's torn state
        window match {
          case "preflag" =>
            require(gens.size > flagged.size,
              s"KLLPROBE FAIL [fheal:preflag]: no unflagged generation " +
                s"(gens=${gens.map(_._1)}, flagged=${flagged.map(_._1)}) — " +
                "the kill landed outside the window")
            require(storeBatches > 1,
              "KLLPROBE FAIL [fheal:preflag]: store already compacted — " +
                "the uncommitted generation leaked into the read path")
          case "presweep" =>
            require(flagged.size > 1,
              s"KLLPROBE FAIL [fheal:presweep]: old generation already " +
                s"swept (flagged=${flagged.map(_._1)})")
            require(storeBatches == 1,
              "KLLPROBE FAIL [fheal:presweep]: the committed generation " +
                "is not serving")
          case "prerebuild" =>
            require(gens.size == 1 && flagged.size == 1,
              s"KLLPROBE FAIL [fheal:prerebuild]: expected one swept-clean " +
                s"generation, got gens=${gens.map(_._1)}")
            require(storeBatches == 1 && tableRows > store.count(),
              s"KLLPROBE FAIL [fheal:prerebuild]: table ($tableRows rows) " +
                s"vs store (${store.count()}) is not the stale-table trap " +
                "this window exists for")
          case other => sys.error(s"unknown crash window '$other'")
        }
        // the heal: ONE compaction call on the (possibly idle) store —
        // sweeps debris, folds if multi-batch, rebuilds the stale table
        KllPublish.compactSegments(spark, sd)
        fValidate(s"fheal:$window", compacted = true)
        println(s"KLLPROBE fheal OK window=$window healed " +
          s"(entry: gens=${gens.size} flagged=${flagged.size} " +
          s"storeBatches=$storeBatches tableRows=$tableRows)")
    }
    // fault-campaign accounting (Verify's discipline): the probe's only
    // artifact is its log, and the campaign asserts non-vacuity from it
    val injected = graft.sources.StoreFaults.faultsInjected.get()
    if (injected > 0)
      System.err.println(s"[kllprobe] store faults injected: $injected")
    spark.stop()
  }
}
