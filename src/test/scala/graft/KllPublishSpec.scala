package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.{Published, Tables}
import graft.streaming.KllPublish

/** The streaming KLL dashboard twin (r15 verdict ask #3): q127's
  * published quantile table maintained CONTINUOUSLY by a foreachBatch
  * sink under the same lease/marker/manifest discipline. Pinned here:
  * stream ≡ batch (the streamed table's merged quantiles match q127's
  * over the same prefix — exact counts equal, estimates inside the
  * exact envelope), replay idempotence (same-JVM re-delivery; the
  * cross-JVM driver-death flow is KllStreamProbe's), and the
  * derived-table self-heal: a refused manifest (the crashed-appender
  * window) rebuilds from the durable segment store — kilobytes, no
  * corpus rescan. */
class KllPublishSpec extends SparkSpec {

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"kllstream_$tag").toString

  private def stageDelta(src: String, cut: Long, files: Int): Unit =
    KllPublish.stageDelta(spark, sf, src, cut, files)

  private def runSink(src: String, segDir: String, ckpt: String,
                      compactEvery: Int = 0): Unit = {
    val in = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = KllPublish.kllPublishedSink(in, segDir, ckpt,
      compactEvery = compactEvery)
    try assert(q.awaitTermination(180000L), "stream timed out")
    finally q.stop()
  }

  private def perSliceN(segDir: String): Map[String, Long] =
    spark.table(KllPublish.tableName(segDir))
      .groupBy(col("slice")).agg(sum(col("n")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("stream ≡ batch: the streamed dashboard matches q127 over the " +
      "same prefix — exact counts equal, estimates inside the exact envelope") {
    val root = freshRoot("eq")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    stageDelta(s"$root/src", cut, files = 2)
    runSink(s"$root/src", segDir, s"$root/ckpt")
    val served = KllPublish.attachServe(spark, segDir).head
    val nAll = Tables.lineitem(spark, sf).count()
    // count-exactness pins the whole pipeline deterministically (KLL
    // tracks n exactly): no batch lost, none doubled, base included
    assert(served.getAs[Long]("n_rows") == nAll,
      s"streamed n_rows ${served.getAs[Long]("n_rows")} != corpus $nAll")
    assert(served.getAs[Long]("sketch_n") == nAll, "merged sketch lost rows")
    // per-slice exact counts equal the corpus's
    val corpusSlices = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSliceN(segDir) == corpusSlices, "per-slice counts diverge")
    // the batch twin agrees on the same prefix (same corpus)
    val batchRow = Sketches.q127PublishedQuantiles(spark, sf).head
    assert(batchRow.getAs[Long]("n_rows") == served.getAs[Long]("n_rows"),
      "batch q127 and the streamed dashboard disagree on n_rows")
    // estimates inside the exact envelope (q125/q127's audit
    // discipline — KLL estimates are randomized within rank error, so
    // equality is pinned on counts, bounds on quantiles)
    val (_, ex) = Sketches.exactQuantilesDistributed(
      Tables.lineitem(spark, sf), "l_extendedprice",
      Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
    val p50 = served.getAs[Double]("est_p50")
    val p95 = served.getAs[Double]("est_p95")
    assert(p50 >= ex(0) && p50 <= ex(2), s"est_p50 $p50 outside [${ex(0)}, ${ex(2)}]")
    assert(p95 >= ex(3) && p95 <= ex(5), s"est_p95 $p95 outside [${ex(3)}, ${ex(5)}]")
  }

  test("replay idempotence: a FAITHFULLY re-delivered batch (same rows, " +
      "same id) rewrites its own segment partition, appends nothing, and " +
      "a store-rebuild afterwards stays count-exact") {
    val root = freshRoot("replay")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    // deterministic batch split (orderkey parity) so the replay can
    // re-deliver EXACTLY batch 1's rows — replaying different content
    // under the same id is not what foreachBatch redelivery does, and
    // would itself corrupt the store (r16 review finding #3)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    val b0 = delta.filter(col("l_orderkey") % 2 === 0)
    val b1 = delta.filter(col("l_orderkey") % 2 === 1)
    KllPublish.processBatch(spark, segDir, b0, 0L)
    KllPublish.processBatch(spark, segDir, b1, 1L)
    val tbl = KllPublish.tableName(segDir)
    val rowsBefore = spark.table(tbl).count()
    val nBefore = KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
    assert(nBefore == Tables.lineitem(spark, sf).count())
    // the crash-replay shape: batch 1 re-delivered verbatim
    KllPublish.processBatch(spark, segDir, b1, 1L)
    assert(spark.table(tbl).count() == rowsBefore,
      "replay appended duplicate segment rows to the published table")
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nBefore,
      "replay changed the dashboard's count")
    // the store itself must be un-doubled, not just the table's
    // high-water skip: force a rebuild FROM the store (contaminate →
    // refused → heal) and require the rebuilt dashboard count-exact
    val loc = Published.tableLoc(spark, tbl)
    val fs = Published.fsOf(loc)
    scala.util.Using.resource(fs.create(
      new org.apache.hadoop.fs.Path(loc, "part-replay-stray.parquet"), true))(
      _.write("x".getBytes("UTF-8")))
    KllPublish.processBatch(spark, segDir, delta.filter(lit(false)), 2L)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nBefore,
      "the store-rebuilt dashboard is not count-exact — the replay " +
        "corrupted the segment store")
  }

  test("the pending-append read PRUNES segment-store partitions: the " +
      "batch predicate is a PartitionFilter, not a post-scan filter") {
    // the scale shape behind publishUpTo: `batch` is the store's
    // partition column, so catching up from hw to batchId must list
    // only the NEW batch=<id> directories — at a year of batches the
    // append reads the delta, never re-scans the store
    val root = freshRoot("prune")
    val segDir = s"$root/seg"
    KllPublish.bootstrapBase(spark, sf, segDir)
    val plan = KllPublish.readSegments(spark, segDir)
      .filter(col("batch") > -1L && col("batch") <= 0L)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse(
      fail(s"no PartitionFilters in the pending read's plan:\n$plan"))
    assert(pf.contains("batch"),
      s"the batch predicate did not reach the partition filters: $pf")
    // and nothing re-filters batch AFTER the scan (the pruning is the
    // whole read, not a cosmetic duplicate)
    assert(!plan.contains("PushedFilters: [IsNotNull(batch)"),
      "batch landed in data filters — it must be a partition column")
  }

  test("a FRESH checkpoint over an existing segment store is REFUSED: " +
      "batch-id remapping across lineages must fail loudly, not corrupt") {
    val root = freshRoot("lineage")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    stageDelta(s"$root/src", cut, files = 2)
    runSink(s"$root/src", segDir, s"$root/ckpt1")
    val nBefore = KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
    // same checkpoint: resume is a no-op and stays green
    runSink(s"$root/src", segDir, s"$root/ckpt1")
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nBefore)
    // fresh checkpoint: FileStreamSource may remap files to batch ids,
    // so the sink must refuse the store before any batch runs
    val refused = intercept[IllegalArgumentException] {
      runSink(s"$root/src", segDir, s"$root/ckpt2")
    }
    assert(refused.getMessage.contains("checkpoint lineage"),
      s"unexpected refusal shape: ${refused.getMessage}")
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nBefore,
      "the refused start still changed the dashboard")
  }

  test("minor compaction: the store collapses to one merged segment per " +
      "slice, counts stay exact, merged-batch replays are no-ops, and " +
      "appends continue past the compaction") {
    val root = freshRoot("compact")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    val b0 = delta.filter(col("l_orderkey") % 2 === 0)
    val b1 = delta.filter(col("l_orderkey") % 2 === 1)
    KllPublish.processBatch(spark, segDir, b0, 0L)
    KllPublish.processBatch(spark, segDir, b1, 1L)
    val nBefore = KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
    assert(nBefore == Tables.lineitem(spark, sf).count())
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(KllPublish.readSegments(spark, segDir).count() > slices,
      "pre-compaction store should hold per-batch segments (vacuity guard)")
    KllPublish.compactSegments(spark, segDir)
    // ONE merged segment per slice, one batch value (the high-water)
    assert(KllPublish.readSegments(spark, segDir).count() == slices,
      "compaction did not collapse to one segment per slice")
    assert(KllPublish.readSegments(spark, segDir)
      .select(col("batch")).distinct().count() == 1)
    assert(KllPublish.compactedHw(spark, segDir) == 1L)
    // the dashboard is unchanged — counts exact across the merge
    val served = KllPublish.attachServe(spark, segDir).head
    assert(served.getAs[Long]("n_rows") == nBefore &&
      served.getAs[Long]("sketch_n") == nBefore,
      "compaction changed the dashboard's exact counts")
    // the published table itself now serves O(slices) rows
    assert(spark.table(KllPublish.tableName(segDir)).count() == slices)
    // a replay of a MERGED batch is a no-op (its rows live in the
    // compacted segment; a fresh partition would double-count on the
    // next store-derived rebuild)
    KllPublish.processBatch(spark, segDir, b1, 1L)
    assert(KllPublish.readSegments(spark, segDir).count() == slices,
      "a merged-batch replay re-created its partition")
    // appends continue past the compaction (content duplication is
    // fine — the dashboard counts INGESTED rows, q122's occupancy
    // semantics), and a second compaction folds them again
    KllPublish.processBatch(spark, segDir, b0, 2L)
    val afterAppend = KllPublish.attachServe(spark, segDir).head
    assert(afterAppend.getAs[Long]("n_rows") == nBefore + b0.count(),
      "post-compaction append lost rows")
    KllPublish.compactSegments(spark, segDir)
    assert(KllPublish.readSegments(spark, segDir).count() == slices)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == nBefore + b0.count())
    // idempotence: compacting a compacted store no-ops
    KllPublish.compactSegments(spark, segDir)
    assert(KllPublish.compactedHw(spark, segDir) == 2L)
  }

  test("a crashed compaction build (unflagged generation) is invisible " +
      "to readers and swept by the next compaction") {
    val root = freshRoot("gencrash")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    KllPublish.processBatch(spark, segDir, delta, 0L)
    val storeRows = KllPublish.readSegments(spark, segDir).count()
    // the crash: gen-1 built partway, no _GRAFT_GEN_DONE
    val junk = java.nio.file.Paths.get(s"$segDir/gen-1/batch=0")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.write(junk.resolve("part-junk.parquet"),
      "not-a-segment".getBytes("UTF-8"))
    assert(KllPublish.readSegments(spark, segDir).count() == storeRows,
      "an UNCOMMITTED generation leaked into the read path")
    // the next compaction sweeps the debris and commits a real gen-1
    KllPublish.compactSegments(spark, segDir)
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(KllPublish.readSegments(spark, segDir).count() == slices)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == Tables.lineitem(spark, sf).count(),
      "post-sweep compaction lost rows")
  }

  test("compaction cadence: a compactEvery sink self-compacts mid-stream, " +
      "stays count-exact, and ends with an O(slices) store AND table") {
    val root = freshRoot("cadence")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    // 5 one-batch files with compactEvery=2: folds fire mid-stream at
    // batches 2 and 4, batch 3 appends PAST a fold, and the final
    // batch folds everything — the terminal store is one merged
    // segment per slice with no out-of-band compactor ever called
    stageDelta(s"$root/src", cut, files = 5)
    runSink(s"$root/src", segDir, s"$root/ckpt", compactEvery = 2)
    val nAll = Tables.lineitem(spark, sf).count()
    val served = KllPublish.attachServe(spark, segDir).head
    assert(served.getAs[Long]("n_rows") == nAll &&
      served.getAs[Long]("sketch_n") == nAll,
      "the self-compacting stream lost or doubled rows")
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(KllPublish.readSegments(spark, segDir).count() == slices,
      "the cadence never folded the store")
    assert(KllPublish.readSegments(spark, segDir)
      .select(col("batch")).distinct().count() == 1)
    assert(KllPublish.compactedHw(spark, segDir) == 4L,
      "the final fold should carry the last batch's high-water")
    assert(spark.table(KllPublish.tableName(segDir)).count() == slices,
      "the published table still serves per-batch rows")
    // per-slice exact counts survive both folds
    val corpusSlices = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSliceN(segDir) == corpusSlices, "per-slice counts diverge")
  }

  test("a compaction crashing between its generation commit and the " +
      "table rebuild heals on the NEXT compaction call — even on an " +
      "idle store with no new batch (r16 verdict Wrong #1)") {
    val root = freshRoot("prerebuild")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    KllPublish.processBatch(spark, segDir, delta.filter(col("l_orderkey") % 2 === 0), 0L)
    KllPublish.processBatch(spark, segDir, delta.filter(col("l_orderkey") % 2 === 1), 1L)
    val tbl = KllPublish.tableName(segDir)
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    // the crash: die in compactSegments AFTER the generation commit
    // and sweep, BEFORE the table rebuild (leg F's third window,
    // executed in-process here; cross-process in KllStreamProbe)
    RestartKit.windowHook =
      w => if (w == "prerebuild") throw new RuntimeException("crash: prerebuild")
    try {
      val boom = intercept[RuntimeException] {
        KllPublish.compactSegments(spark, segDir)
      }
      assert(boom.getMessage == "crash: prerebuild")
    } finally RestartKit.windowHook = _ => ()
    // the wedged state this fix exists for: store compacted, table fat
    assert(KllPublish.readSegments(spark, segDir).count() == slices,
      "vacuity: the crash should have landed AFTER the store compacted")
    assert(spark.table(tbl).count() > slices,
      "vacuity: the crash should have landed BEFORE the table rebuild")
    // heal on an IDLE store: no new batch, just the next compaction
    // call — pre-fix this no-opped forever on the batches>1 guard
    KllPublish.compactSegments(spark, segDir)
    assert(spark.table(tbl).count() == slices,
      "the stale per-batch table survived the healing compaction")
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == Tables.lineitem(spark, sf).count(),
      "the healed table is not count-exact")
  }

  test("a bootstrap that crashed before its flag is retried safely — " +
      "including when an intervening compaction already MERGED the " +
      "unflagged base rows (re-stamp only, no batch=-1 rewrite)") {
    val root = freshRoot("bootretry")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    KllPublish.processBatch(spark, segDir, delta, 0L)
    val nAll = Tables.lineitem(spark, sf).count()
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nAll)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val flag = new org.apache.hadoop.fs.Path(segDir, "_GRAFT_BASE_DONE")
    // crash artifact #1: rows landed, flag never did, NO compaction in
    // between — the retry rewrites its own batch=-1 partition
    // (idempotent overwrite) and the counts hold
    assert(fs.delete(flag, false))
    assert(KllPublish.bootstrapBase(spark, sf, segDir) == cut)
    assert(fs.exists(flag), "the retry did not re-stamp the flag")
    KllPublish.processBatch(spark, segDir, delta.filter(lit(false)), 1L)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nAll,
      "the plain bootstrap retry changed the dashboard")
    // crash artifact #2: the base was legitimately MERGED by a fold
    // (flag present, so the fold knows it is complete), and the flag
    // is lost AFTERWARDS. A retry that rewrote batch=-1 now would
    // double-count the base on the next store-derived rebuild (r16
    // advice #1); the fold output's lo==0 && batch != -1 signature
    // makes the retry re-stamp only
    KllPublish.compactSegments(spark, segDir)
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(KllPublish.readSegments(spark, segDir).count() == slices)
    assert(fs.delete(flag, false))
    assert(KllPublish.bootstrapBase(spark, sf, segDir) == cut)
    assert(fs.exists(flag), "the post-merge retry did not re-stamp the flag")
    assert(KllPublish.readSegments(spark, segDir).count() == slices,
      "the post-merge retry re-created batch=-1 — base rows now count twice")
    // force a store-derived rebuild and require count-exactness (the
    // double-count this fix prevents would surface exactly here)
    val loc = Published.tableLoc(spark, KllPublish.tableName(segDir))
    val lfs = Published.fsOf(loc)
    scala.util.Using.resource(lfs.create(
      new org.apache.hadoop.fs.Path(loc, "part-bootretry-stray.parquet"), true))(
      _.write("x".getBytes("UTF-8")))
    KllPublish.processBatch(spark, segDir, delta.filter(lit(false)), 2L)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows") == nAll,
      "the store-rebuilt dashboard double-counts the merged base window")
  }

  test("a PARTIAL unflagged base write is never frozen into a fold: " +
      "compaction drops the orphan batch=-1 and the bootstrap retry " +
      "rewrites the base whole") {
    // the half-committed bootstrap (a copy-rename store's job commit
    // is per-file): base rows landed for ONE slice only, no flag. A
    // fold that merged them would freeze the partial base into the
    // merged blob forever — unhealable, silently undercounting
    val root = freshRoot("partialbase")
    val segDir = s"$root/seg"
    val cut = graft.operators.Sketches.kllBaseCut(spark, sf)
    val oneSlice = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().head.getString(0)
    graft.sources.Layout.overwritePartitions(
      graft.operators.Sketches.kllSegment(spark, sf, 0L, cut)
        .filter(col("slice") === oneSlice)
        .withColumn("batch", lit(-1L)),
      KllPublish.currentGenDir(spark, segDir).toString, Seq("batch"))
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    KllPublish.processBatch(spark, segDir, delta, 0L)
    // the fold must DROP the unflagged orphan, not merge it
    KllPublish.compactSegments(spark, segDir)
    assert(KllPublish.readSegments(spark, segDir)
      .filter(col("lo") === 0L).isEmpty,
      "the fold merged (or kept) the partial unflagged base window")
    // the retry rewrites the base WHOLE (no merged lo==0 row exists,
    // so the re-stamp-only shortcut must not fire) and REFRESHES the
    // published table itself: batch=-1 sits below every table
    // high-water, so no later append could ever deliver it — the
    // dashboard must be count-exact immediately, no fold required
    assert(KllPublish.bootstrapBase(spark, sf, segDir) == cut)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == Tables.lineitem(spark, sf).count(),
      "the retry left the published table without the rewritten base")
    // and the fold stays count-exact over the healed store
    KllPublish.compactSegments(spark, segDir)
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == Tables.lineitem(spark, sf).count(),
      "the healed store is not count-exact — the partial base survived")
  }

  test("a store emptied by the orphan drop also empties the derived " +
      "table: readers never serve rows the store no longer holds") {
    // the degenerate corner of the partial-base heal: the store held
    // ONLY the broken unflagged base when a compaction dropped it —
    // zero batches remain, yet a table cold-built from the broken
    // store would keep serving the dropped rows forever if the
    // stale-table rebuild were gated on batches == 1 exactly
    val root = freshRoot("orphanonly")
    val segDir = s"$root/seg"
    val cut = graft.operators.Sketches.kllBaseCut(spark, sf)
    val oneSlice = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().head.getString(0)
    graft.sources.Layout.overwritePartitions(
      graft.operators.Sketches.kllSegment(spark, sf, 0L, cut)
        .filter(col("slice") === oneSlice)
        .withColumn("batch", lit(-1L)),
      KllPublish.currentGenDir(spark, segDir).toString, Seq("batch"))
    // an empty-batch sync cold-builds the table from the broken store
    KllPublish.processBatch(spark, segDir,
      KllPublish.deltaFrame(spark, sf, cut).filter(lit(false)), 0L)
    val tbl = KllPublish.tableName(segDir)
    assert(spark.table(tbl).count() == 1, "vacuity: the cold build " +
      "should be serving the partial base row")
    KllPublish.compactSegments(spark, segDir)
    assert(KllPublish.readSegments(spark, segDir).count() == 0,
      "the orphan survived the drop")
    assert(spark.table(tbl).count() == 0,
      "the table still serves rows the store no longer holds")
    // the full heal: the bootstrap retry rewrites the base whole and
    // refreshes the table — the dashboard serves exactly the base
    assert(KllPublish.bootstrapBase(spark, sf, segDir) == cut)
    val baseN = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") < cut).count()
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == baseN, "the healed dashboard does not serve the base window")
  }

  test("an out-of-band fold past the table's high-water REBUILDS on the " +
      "next sync instead of appending the overlapping merged segment " +
      "(no double-count window)") {
    val root = freshRoot("overlap")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    val b0 = delta.filter(col("l_orderkey") % 2 === 0)
    val b1 = delta.filter(col("l_orderkey") % 2 === 1)
    KllPublish.processBatch(spark, segDir, b0, 0L)
    // batch 1 dies AFTER its store write, BEFORE the table sync —
    // table high-water stays at 0 while the store holds batch 1
    RestartKit.windowHook =
      w => if (w == "prepublish") throw new RuntimeException("crash: prepublish")
    try intercept[RuntimeException] {
      KllPublish.processBatch(spark, segDir, b1, 1L)
    } finally RestartKit.windowHook = _ => ()
    // an out-of-band fold then compacts the store PAST the table's
    // high-water (merged segment batch=1) and dies before its rebuild
    RestartKit.windowHook =
      w => if (w == "prerebuild") throw new RuntimeException("crash: prerebuild")
    try intercept[RuntimeException] {
      KllPublish.compactSegments(spark, segDir)
    } finally RestartKit.windowHook = _ => ()
    val tbl = KllPublish.tableName(segDir)
    val slices = Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).distinct().count()
    assert(KllPublish.compactedHw(spark, segDir) == 1L &&
      spark.table(tbl).count() > slices,
      "vacuity: the fold should have outrun the table's high-water")
    // the stream's replay of batch 1: the pending window (0, 1] now
    // exists only inside a merged segment that ALSO covers the
    // table's batches -1..0 — appending it would double-count them;
    // the sync must rebuild instead
    KllPublish.processBatch(spark, segDir, b1, 1L)
    assert(spark.table(tbl).count() == slices,
      "the sync appended the overlapping merged segment onto the " +
        "per-batch table")
    assert(KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
      == Tables.lineitem(spark, sf).count(),
      "the resumed dashboard double-counts the folded batches")
  }

  test("a refused manifest self-heals from the durable segment store: " +
      "the crashed-appender window costs a kilobyte rebuild, not data loss") {
    val root = freshRoot("heal")
    val segDir = s"$root/seg"
    val cut = KllPublish.bootstrapBase(spark, sf, segDir)
    val delta = KllPublish.deltaFrame(spark, sf, cut)
    KllPublish.processBatch(spark, segDir, delta, 0L)
    val nGood = KllPublish.attachServe(spark, segDir).head.getAs[Long]("n_rows")
    assert(nGood == Tables.lineitem(spark, sf).count())
    // the crashed-appender window: files land, the re-stamp never runs
    // — simulate with an unaccounted data file in the serve location
    val loc = Published.tableLoc(spark, KllPublish.tableName(segDir))
    val fs = Published.fsOf(loc)
    scala.util.Using.resource(fs.create(
      new org.apache.hadoop.fs.Path(loc, "part-stray-orphan.parquet"), true))(
      _.write("not-accounted".getBytes("UTF-8")))
    intercept[IllegalArgumentException] {
      KllPublish.attachServe(spark, segDir)
    }
    // the next sync (an empty batch — the stream's next tick) heals it
    // from the segment store; the corpus is never rescanned
    KllPublish.processBatch(spark, segDir,
      delta.filter(lit(false)), 1L)
    val healed = KllPublish.attachServe(spark, segDir).head
    assert(healed.getAs[Long]("n_rows") == nGood,
      "rebuild from the segment store lost rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(loc, "part-stray-orphan.parquet")),
      "the contaminated generation survived the rebuild")
  }
}
