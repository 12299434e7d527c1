package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}

import graft.operators.Sketches
import graft.sources.{Layout, Published}

/** Streaming twin of q127 (`Sketches.q127PublishedQuantiles`) — the
  * published KLL quantile dashboard run CONTINUOUSLY: every micro-batch
  * of new fact rows is sketched into per-slice KLL blobs (one pass over
  * the batch, kilobytes out) and APPENDED to the published blob table
  * under the same lease/marker/manifest discipline as the batch path
  * (r15 verdict ask #3). The corpus is petabytes; what this sink writes
  * per batch is O(slices) kilobyte rows — the dashboard updates in
  * O(sketch) without ever rescanning the base window.
  *
  * DURABILITY LAYOUT ([[Ingest.dedupGateSink]] / [[IndexMaintain]]'s
  * discipline, adapted to a PUBLISHED destination): the source of truth
  * is a batch-keyed parquet SEGMENT STORE (`segDir/batch=<id>` — one
  * row per (slice × batch): blob, exact count, orderkey window).
  * Dynamic partition overwrite makes a re-delivered batch rewrite its
  * OWN partition — replay-idempotent without read-modify-write. The
  * published bucketed table is DERIVED from that store: per batch the
  * sink appends only the not-yet-published batches' rows under the
  * table lease and re-stamps the marker's manifest (q124's append
  * commit); a replayed batch finds its rows already published (the
  * table's batch high-water) and appends nothing.
  *
  * CRASH/FAULT RECOVERY is where the derived-table design earns its
  * keep: an appender dying (or drawing a store fault) between its
  * append job and the manifest re-stamp leaves unaccounted files that
  * [[Published.ensure]] refuses to serve — and unlike the batch q127
  * (whose segments are re-derivable from the corpus), the stream twin
  * CANNOT re-derive past batches from a corpus scan. The refused state
  * self-heals from the segment store instead: the next batch (or
  * attach) rebuilds the whole published table from `segDir` — still
  * kilobytes, still no corpus rescan. KllStreamProbe executes the
  * resume across a real driver death; the fault-probe campaign runs
  * the sink under seeded store faults (loud-or-green).
  *
  * The BASE window [0, cut) is bootstrapped once from the corpus into
  * the segment store (`batch=-1`, flag-gated so a crashed bootstrap
  * rewrites rather than half-serves) — the one corpus scan this sink
  * ever pays, same price as q127's bootstrap. */
object KllPublish {

  /** Published table name, keyed by the segment store's path — the
    * sink's durable identity (two sinks with different stores must
    * never fight over one table; q127's corpus-keyed batch table stays
    * separate). */
  def tableName(segDir: String): String =
    s"graft_kllqs_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(segDir.getBytes("UTF-8")))}"

  /** Stable logical fingerprint: the published table serves ONE segment
    * store forever; content evolution across appends is the manifest's
    * job, not the fingerprint's (a file-level fingerprint would refuse
    * the table after every batch). private[graft]: KllStreamProbe's
    * heal phases gate on ensure() with the same fingerprint — a
    * re-derived copy there could silently drift. */
  private[graft] def fp(segDir: String): String =
    s"kllstream:${tableName(segDir)}"

  private val segSchema = new StructType()
    .add("slice", StringType).add("blob", BinaryType).add("n", LongType)
    .add("lo", LongType).add("hi", LongType).add("batch", LongType)

  // ------------------------------------------------------ generations
  // The store is laid out as segDir/gen-<g>/batch=<id>/… — GENERATIONS
  // are what makes minor compaction ([[compactSegments]]) crash-safe
  // without ever mutating live data: a compaction builds gen-<g+1>
  // completely (merged rows + its `_GRAFT_HW` high-water), COMMITS it
  // by writing the generation's `_GRAFT_GEN_DONE` flag, and only then
  // drops the old one. The current generation is the HIGHEST flagged
  // one — a crash mid-build leaves an unflagged gen the next
  // compaction sweeps; a crash after the flag leaves the old gen as
  // swept debris. No rename/pointer races: flags are create-once
  // files, and every store WRITER holds the table lease — including
  // the per-batch segment write ([[processBatch]] takes the lease
  // around generation resolution + write + publish; r16 review
  // finding: a write outside it could land in a generation a
  // concurrent compaction was sweeping, silently losing the batch).
  // private[graft]: KllStreamProbe's leg-F heal phase asserts the torn
  // generation states (unflagged build, unswept old gen) through these
  private[graft] def genDone(d: HPath) = new HPath(d, "_GRAFT_GEN_DONE")
  private def genHwFile(d: HPath) = new HPath(d, "_GRAFT_HW")

  private def storeFs(spark: SparkSession, segDir: String) =
    new HPath(segDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read a small flag file WHOLE, loud on store faults — a swallowed
    * blip here is not safe in either caller ([[compactedHw]] defaulting
    * to "never compacted" on a blip would let a merged batch's replay
    * re-create its partition and double-count; a lineage check that
    * can't read must not guess). One copy (r16 review finding #6). */
  private def readFlag(fs: org.apache.hadoop.fs.FileSystem,
                       p: HPath): String = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    scala.util.Using.resource(fs.open(p))(_.readFully(0, buf))
    new String(buf, "UTF-8")
  }

  private[graft] def genDirs(fs: org.apache.hadoop.fs.FileSystem,
                             segDir: String): Seq[(Int, HPath)] = {
    val root = new HPath(segDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("gen-") =>
        scala.util.Try(st.getPath.getName.stripPrefix("gen-").toInt)
          .toOption.map(g => (g, st.getPath))
    }.flatten.sortBy(_._1)
  }

  /** The current (highest COMMITTED) generation's dir; creates and
    * commits gen-0 if the store has none yet — MIGRATING any root-level
    * `batch=` partitions a pre-generation store left there (the flat
    * layout this module briefly shipped; r16 review finding #3: without
    * the migration those rows turned silently invisible, and the first
    * store-derived rebuild would hollow out the dashboard).
    * moveResumable finishes a crashed half-migration forward; the gen-0
    * flag is written only after every partition moved. */
  private[graft] def currentGenDir(spark: SparkSession, segDir: String): HPath = {
    val fs = storeFs(spark, segDir)
    genDirs(fs, segDir).reverse.find(g => fs.exists(genDone(g._2)))
      .map(_._2).getOrElse {
        val g0 = new HPath(segDir, "gen-0")
        fs.mkdirs(g0)
        val root = new HPath(segDir)
        fs.listStatus(root).foreach { st =>
          if (st.isDirectory && st.getPath.getName.startsWith("batch="))
            Published.moveResumable(fs, st.getPath,
              new HPath(g0, st.getPath.getName))
        }
        if (!fs.exists(genDone(g0)))
          scala.util.Using.resource(fs.create(genDone(g0), true))(
            _.write("0".getBytes("UTF-8")))
        g0
      }
  }

  /** Batches at or below this id are already MERGED into the current
    * generation's compacted segment — a replay of one must not write a
    * fresh partition (its rows would then count twice on the next
    * store-derived rebuild). Long.MinValue when never compacted. */
  private[graft] def compactedHw(spark: SparkSession, segDir: String): Long = {
    val fs = storeFs(spark, segDir)
    val f = genHwFile(currentGenDir(spark, segDir))
    if (!fs.exists(f)) Long.MinValue
    else readFlag(fs, f).trim.toLong
  }

  /** The durable segment store (current generation), explicit schema
    * (an all-empty-batch store has data-file-less partition dirs that
    * inference throws on — the dedupGateSink lesson). */
  private[graft] def readSegments(spark: SparkSession, segDir: String): DataFrame = {
    val fs = storeFs(spark, segDir)
    val gd = currentGenDir(spark, segDir)
    if (fs.exists(gd) && fs.listStatus(gd).exists(_.getPath.getName.startsWith("batch=")))
      spark.read.schema(segSchema).parquet(gd.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], segSchema)
  }

  private def baseDoneFlag(segDir: String): HPath =
    new HPath(segDir, "_GRAFT_BASE_DONE")

  /** The committed bootstrap's cut, read LOUDLY from the base flag —
    * for callers (the probes' validation phases) that need the split
    * point without [[bootstrapBase]]'s heal-on-absence semantics: a
    * missing flag here is a broken store, not a bootstrap request. */
  private[graft] def bootstrappedCut(spark: SparkSession,
                                     segDir: String): Long = {
    val fs = storeFs(spark, segDir)
    val flag = baseDoneFlag(segDir)
    require(fs.exists(flag),
      s"segment store $segDir has no committed base bootstrap")
    readFlag(fs, flag).trim.toLong
  }

  /** Bootstrap the base window's segment rows ([0, cut) —
    * `Sketches.kllBaseCut`, q127's split) into the segment store, once:
    * the flag file commits the bootstrap, so a crashed half-write is
    * rewritten on the next call, never half-served. Returns `cut`.
    * This is the sink's ONE corpus scan.
    *
    * The store write runs under the same lock + table lease as every
    * other store writer (r16 advice #1: an unleased bootstrap racing a
    * concurrent [[compactSegments]] could land its base rows in a
    * generation the compaction then sweeps — base window silently lost
    * with the done-flag still stamped). And a bootstrap that crashed
    * AFTER its write but BEFORE its flag may find its unflagged base
    * rows already MERGED by an intervening compaction — rewriting
    * `batch=-1` then double-counts the base on the next store-derived
    * rebuild. The merged segment carries the base's signature (`lo ==
    * 0`; every delta row's orderkey is ≥ cut > 0), so the retry detects
    * the merge and only re-stamps the flag. */
  def bootstrapBase(spark: SparkSession, dir: String, segDir: String): Long = {
    val cut = Sketches.kllBaseCut(spark, dir)
    val flag = baseDoneFlag(segDir)
    val fs = storeFs(spark, segDir)
    if (!fs.exists(flag)) {
      val tbl = tableName(segDir)
      val loc = Published.tableLoc(spark, tbl)
      Sketches.kllPublishLock(tbl).synchronized {
        Published.withLeaseAwaiting(loc, s"kllbase:$tbl") {
          // re-check under the lease: a rival bootstrap may have
          // committed while this one waited for the lease
          if (!fs.exists(flag)) {
            // "already merged" must mean a FOLD OUTPUT (batch != -1):
            // compactSegments only ever merges a FLAGGED — i.e.
            // complete — base window (it drops unflagged batch=-1
            // orphans), so a merged lo==0 row proves the base rows are
            // whole and only the flag was lost. A bare batch=-1
            // partition (lo==0, batch == -1) proves nothing — the
            // crashed write may have committed only some slices on a
            // copy-rename store — and must be REWRITTEN whole, the
            // original heal.
            val baseAlreadyMerged =
              compactedHw(spark, segDir) != Long.MinValue &&
                !readSegments(spark, segDir)
                  .filter(col("lo") === 0L && col("batch") =!= -1L).isEmpty
            if (!baseAlreadyMerged) {
              Layout.overwritePartitions(
                Sketches.kllSegment(spark, dir, 0L, cut)
                  .withColumn("batch", lit(-1L)),
                currentGenDir(spark, segDir).toString, Seq("batch"))
              // if a published table ALREADY exists (the retry-after-
              // partial-write path: batches may have published while
              // the base was broken), refresh it here under the same
              // held lease — batch=-1 sits below every table
              // high-water, so publishUpTo's pending append can never
              // deliver a late-rewritten base, and without a fold
              // (compactEvery=0 deployments) nothing else would
              if (Published.ensure(spark, tbl, "slice",
                  Sketches.kllTableBuckets, fp(segDir)))
                Published.write(spark, tbl, "slice",
                  Sketches.kllTableBuckets, fp(segDir),
                  readSegments(spark, segDir))
            }
            scala.util.Using.resource(fs.create(flag, true))(
              _.write(cut.toString.getBytes("UTF-8")))
          }
        }
      }
    }
    cut
  }

  /** MINOR COMPACTION — q124's story for the quantile dashboard: the
    * store (and the published table derived from it) otherwise grows
    * one kilobyte segment per slice per batch FOREVER, so at a year of
    * triggers the "kilobyte store" is an O(batches) listing and the
    * serve merges O(batches) blobs. Merging is what KLL sketches are
    * FOR: all segments collapse to ONE row per slice (blob union, n
    * summed, window hull), carrying the batch high-water so replay
    * skipping and append sequencing are unchanged. The merge lands in
    * a NEW generation committed by its done-flag (crash-safe — see the
    * generation note above), the published table is rebuilt from it
    * under the same lease (kilobytes, no corpus rescan), and old
    * generations are swept. Idempotent: a store already at one merged
    * segment per slice no-ops. */
  def compactSegments(spark: SparkSession, segDir: String): Unit = {
    val tbl = tableName(segDir)
    val loc = Published.tableLoc(spark, tbl)
    Sketches.kllPublishLock(tbl).synchronized {
      Published.withLeaseAwaiting(loc, s"kllcompact:$tbl") {
        val fs = storeFs(spark, segDir)
        val cur = currentGenDir(spark, segDir)
        val curGen = cur.getName.stripPrefix("gen-").toInt
        // sweep debris: unflagged gens (crashed builds) and committed
        // gens below the current one (crashed post-flag deletes) —
        // safe under the lease, nobody else writes this store
        genDirs(fs, segDir).foreach { case (g, d) =>
          if ((d.toString != cur.toString) &&
              (g < curGen || !fs.exists(genDone(d))))
            { fs.delete(d, true); () }
        }
        // an UNFLAGGED batch=-1 partition is a bootstrap that died
        // before its commit flag — its rows may be a PARTIAL base
        // window (a copy-rename store's job commit is per-file), and
        // folding them would freeze the partial base into the merged
        // blob forever, unhealable. Drop the orphan (safe under the
        // lease: a live bootstrap holds it, so only a dead one can
        // have left this) and let the flag-gated retry rewrite the
        // base whole. This is also what makes bootstrapBase's
        // merged-base detection sound: merged ⇒ was flagged ⇒ complete.
        if (!fs.exists(baseDoneFlag(segDir))) {
          val orphan = new HPath(cur, "batch=-1")
          if (fs.exists(orphan)) { fs.delete(orphan, true); () }
        }
        val segs = readSegments(spark, segDir)
        val batches = segs.select(col("batch")).distinct().count()
        if (batches > 1) {
          val hwRow = segs.agg(max(col("batch"))).head
          val hwC = hwRow.getLong(0)
          val kllMerge = udaf(Sketches.KllMergeAgg)
          val merged = segs.groupBy(col("slice")).agg(
              kllMerge(col("blob")).as("blob"),
              sum(col("n")).as("n"),
              min(col("lo")).as("lo"),
              max(col("hi")).as("hi"))
            .withColumn("batch", lit(hwC))
          val next = new HPath(segDir, s"gen-${curGen + 1}")
          Layout.overwritePartitions(merged, next.toString, Seq("batch"))
          scala.util.Using.resource(fs.create(genHwFile(next), true))(
            _.write(hwC.toString.getBytes("UTF-8")))
          // crash window 1 (probe leg F): the new generation is fully
          // built but UNCOMMITTED — it must stay invisible to readers
          // and be swept by the next compaction
          graft.RestartKit.crashWindow("preflag")
          // the COMMIT: from here the new generation is current
          scala.util.Using.resource(fs.create(genDone(next), true))(
            _.write(hwC.toString.getBytes("UTF-8")))
          // crash window 2: committed but the old generation not yet
          // swept — debris the next compaction's sweep removes
          graft.RestartKit.crashWindow("presweep")
          try { fs.delete(cur, true); () }
          catch { case _: java.io.IOException => () } // debris; swept later
          // crash window 3: store compacted but the published table
          // still holds its per-batch rows — the stale-table branch
          // below heals it on the NEXT compaction call even if no new
          // batch ever arrives
          graft.RestartKit.crashWindow("prerebuild")
          // the published table still holds per-batch rows — rebuild it
          // from the compacted store so the serve merges O(slices)
          // blobs, not O(batches); same lease, and the publish's
          // staged swap is its own commit (a crash before it leaves
          // the old per-batch table serving — same totals, just
          // uncompacted until the next pass)
          Published.write(spark, tbl, "slice", Sketches.kllTableBuckets,
            fp(segDir), readSegments(spark, segDir))
        } else {
          // nothing to fold, but the DERIVED table may still be stale:
          // a prior compaction died (or drew a persistent fault) AFTER
          // committing its generation but BEFORE the table rebuild
          // (r16 verdict Wrong #1) — gating the rebuild on
          // `batches > 1` alone would no-op here forever on an idle
          // store. With one batch in the store, rebuild whenever the
          // attached table holds more rows than the store (their rows
          // correspond 1:1 when in sync; FEWER table rows just means
          // pending batches the next publishUpTo appends — and the
          // overlap-guard there rebuilds, never appends, when the fold
          // outran the table), or refuses its manifest outright. With
          // ZERO batches — the orphan drop above can empty a store
          // that held only a broken base — an attached NON-empty table
          // is serving rows the store no longer holds: empty it.
          val tableStale =
            if (batches == 1)
              !Published.ensure(spark, tbl, "slice", Sketches.kllTableBuckets,
                fp(segDir)) ||
                spark.table(tbl).count() > segs.count()
            else
              Published.ensure(spark, tbl, "slice", Sketches.kllTableBuckets,
                fp(segDir)) && spark.table(tbl).count() > 0
          if (tableStale)
            Published.write(spark, tbl, "slice", Sketches.kllTableBuckets,
              fp(segDir), segs)
        }
      }
    }
  }

  /** Sync the published table to the segment store's state up to
    * `batchId`, under the table lease: attach-or-rebuild (a refused
    * manifest — crashed/faulted appender — rebuilds from the store),
    * then append only the not-yet-published batches and re-stamp the
    * manifest. Idempotent: a replayed batch finds the high-water at or
    * past itself and appends nothing. */
  private[graft] def publishUpTo(spark: SparkSession, segDir: String,
                                 batchId: Long): Unit = {
    val tbl = tableName(segDir)
    val loc = Published.tableLoc(spark, tbl)
    Sketches.kllPublishLock(tbl).synchronized {
      Published.withLeaseAwaiting(loc, s"kllstream:$tbl") {
        if (!Published.ensure(spark, tbl, "slice", Sketches.kllTableBuckets,
            fp(segDir))) {
          // cold start, OR a prior append died between its job and its
          // re-stamp (unaccounted files; ensure refused): rebuild the
          // DERIVED table from the durable store — kilobytes, no corpus
          Published.write(spark, tbl, "slice", Sketches.kllTableBuckets,
            fp(segDir), readSegments(spark, segDir))
        } else {
          // ONE job answers both per-batch questions (r20 optimization —
          // these are fixed per-trigger control-plane costs): the
          // published table's high-water AND whether the store holds
          // any segment past it worth appending. The old shape paid a
          // table-hw job plus a separate pending-emptiness probe job.
          val probe = spark.table(tbl)
            .agg(max(col("batch")).as("b")).withColumn("src", lit("tbl"))
            .unionByName(readSegments(spark, segDir)
              .filter(col("batch") <= batchId)
              .agg(max(col("batch")).as("b")).withColumn("src", lit("seg")))
            .collect().map(r =>
              r.getString(1) -> (if (r.isNullAt(0)) Long.MinValue
                                 else r.getLong(0))).toMap
          val hw = probe("tbl")
          val segHw = probe("seg")
          if (hw < batchId && compactedHw(spark, segDir) > hw) {
            // the store was FOLDED past the table's high-water (a
            // compaction ran — and died before its rebuild — while
            // this table still lacked some of the folded batches):
            // the missing batches' rows now live only inside a merged
            // segment that ALSO covers batches the table already
            // holds, so appending it would double-count every row up
            // to hw. Rebuild from the store instead — kilobytes, and
            // the same heal the compactor itself would have run.
            Published.write(spark, tbl, "slice", Sketches.kllTableBuckets,
              fp(segDir), readSegments(spark, segDir))
          } else if (hw < batchId) {
            val pending = readSegments(spark, segDir)
              .filter(col("batch") > hw && col("batch") <= batchId)
            // EMPTY batches keep hw pinned at the last non-empty id, so
            // without this guard every empty trigger would pay an
            // empty append job + a manifest re-stamp (r16 review
            // finding #7) — the emptiness answer now rides the probe
            // job above (a segment past hw and at or under batchId
            // exists iff segHw > hw)
            if (segHw > hw) {
              // commit gates bracket the append exactly like q124/q127:
              // abort BEFORE appending over a rival's writes; a lost
              // lease after the job aborts BEFORE the re-stamp, so the
              // unaccounted segment is never served (and the next call
              // rebuilds from the store)
              Published.assertLeaseOwned(loc)
              pending.write.mode(org.apache.spark.sql.SaveMode.Append)
                .bucketBy(Sketches.kllTableBuckets, "slice").sortBy("slice")
                .format("parquet").saveAsTable(tbl)
              Published.assertLeaseOwned(loc)
              Published.restampManifest(spark, tbl)
            }
          }
        }
      }
    }
  }

  /** One micro-batch: sketch the batch rows into per-slice blobs, land
    * them in the batch-keyed segment store (replay rewrites its own
    * partition), then sync the published table. Exposed for the spec's
    * direct replay calls.
    *
    * `compactEvery > 0` is the sink's COMPACTION CADENCE (r16 verdict
    * ask #1 — the compactor existed but nothing in the production
    * stream ever called it, so a year of triggers still ended in an
    * O(batches) store): every compactEvery-th batch runs
    * [[compactSegments]] under the SAME already-held lock + lease
    * (both re-entrant), folding the store back to one segment per
    * slice. A batch REPLAYED after a crash re-triggers its compaction
    * — idempotent: a single-batch store no-ops and a stale table is
    * rebuilt, never doubled. */
  private[graft] def processBatch(spark: SparkSession, segDir: String,
                                  batch: DataFrame, batchId: Long,
                                  compactEvery: Int = 0): Unit = {
    import spark.implicits._
    val tbl = tableName(segDir)
    val loc = Published.tableLoc(spark, tbl)
    // the STORE WRITE itself runs under the table lease (r16 review
    // finding #1): generation resolution and the partition write must
    // never interleave with a concurrent compaction's generation sweep
    // — a write landing in a just-swept generation would be silently
    // invisible and the batch's rows lost. Lock + lease are both
    // re-entrant per thread, so publishUpTo nests cleanly.
    Sketches.kllPublishLock(tbl).synchronized {
      Published.withLeaseAwaiting(loc, s"kllbatch:$tbl") {
        // a batch at or below the compacted high-water was already
        // MERGED into the current generation ([[compactSegments]]) — a
        // replay of it must not write a fresh partition (double-count
        // on the next store-derived rebuild); the guard reads two flag
        // files, no scan
        if (batchId > compactedHw(spark, segDir)) {
          // persist across the two actions (bounds probe + sketch
          // build) — without it each foreachBatch invocation re-reads
          // the batch's source files twice (r16 review finding #6)
          batch.persist()
          try {
            val bounds = batch.agg(
              min(col("l_orderkey")), max(col("l_orderkey"))).head
            if (!bounds.isNullAt(0)) {
              val kllMerge = udaf(Sketches.KllMergeAgg)
              val seg = Sketches.sliceBlobs(batch
                  .select(col("l_returnflag").as("slice"),
                    col("l_extendedprice").cast("double").as("v"))
                  .as[(String, Double)])
                .groupBy(col("slice"))
                .agg(kllMerge(col("blob")).as("blob"))
                .select(col("slice"), col("blob"),
                  Sketches.kllNUdf(col("blob")).as("n"),
                  lit(bounds.getLong(0)).as("lo"),
                  lit(bounds.getLong(1) + 1L).as("hi"),
                  lit(batchId).as("batch"))
              Layout.overwritePartitions(seg,
                currentGenDir(spark, segDir).toString, Seq("batch"))
            }
          } finally { batch.unpersist(); () }
        }
        // crash window: segment landed in the store, published table
        // not yet synced — the state that makes an out-of-band fold's
        // merged segment OVERLAP the table's missing batches
        // (publishUpTo's compactedHw guard is what heals it)
        graft.RestartKit.crashWindow("prepublish")
        // an EMPTY (or replay-skipped) batch still syncs: a prior
        // batch's append may have been refused (fault) and this is the
        // retry that heals it
        publishUpTo(spark, segDir, batchId)
        // cadence: fold the store while the lock + lease are already
        // held — one lease acquisition per trigger, compaction
        // amortized across compactEvery batches of O(slices) appends
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          compactSegments(spark, segDir)
      }
    }
  }

  /** The segment store's batch ids are meaningful ONLY under the
    * checkpoint lineage that assigned them: a FRESH checkpoint over an
    * existing store re-delivers the source files with a potentially
    * different file→batch mapping (FileStreamSource breaks mtime ties
    * nondeterministically), and a crash mid-re-delivery would leave a
    * store with rows doubled in one partition and missing from another
    * — which the manifest self-heal would then SERVE (r16 review
    * finding #2). The sink therefore stamps its checkpoint identity
    * into the store on first start and REFUSES a mismatched resume:
    * wipe the store or reuse the original checkpoint. */
  private def assertCheckpointLineage(spark: SparkSession, segDir: String,
                                      checkpointDir: String): Unit = {
    val idFile = new HPath(segDir, "_GRAFT_CKPT")
    val fs = idFile.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckptId = fs.makeQualified(new HPath(checkpointDir)).toString
    // an EMPTY stamp is the crashed-create artifact (the file landed,
    // the id bytes never did — r16 review finding #4): no lineage was
    // recorded, so re-stamp instead of refusing the legitimate resume
    // forever
    val existing =
      if (fs.exists(idFile)) readFlag(fs, idFile) else ""
    if (existing.nonEmpty) {
      require(existing == ckptId,
        s"segment store $segDir was written under checkpoint lineage " +
          s"'$existing'; resuming it with '$ckptId' would remap batch ids " +
          "nondeterministically and can corrupt the store — wipe the " +
          "store or reuse the original checkpoint")
    } else {
      fs.mkdirs(idFile.getParent)
      scala.util.Using.resource(fs.create(idFile, true))(
        _.write(ckptId.getBytes("UTF-8")))
    }
  }

  /** Start the continuous dashboard sink over streaming lineitem-shaped
    * rows (l_orderkey, l_returnflag, l_extendedprice). Call
    * [[bootstrapBase]] first if the dashboard should include the base
    * window. `compactEvery > 0` makes the sink SELF-COMPACTING: every
    * compactEvery-th batch folds the segment store (and the published
    * table) back to one merged segment per slice inside the trigger's
    * already-held lease — the store stays O(slices + compactEvery)
    * rows forever instead of O(batches). 0 (the default) never
    * compacts: the operator's choice for stores compacted out-of-band. */
  def kllPublishedSink(rows: DataFrame, segDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Int = 0): StreamingQuery = {
    val spark = rows.sparkSession
    assertCheckpointLineage(spark, segDir, checkpointDir)
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, segDir, batch, batchId, compactEvery)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** The delta window's rows (l_orderkey ≥ cut), the sink's input
    * shape — ONE copy of the filter + column selection (r16 review:
    * the stager, q128, and the specs each re-derived it). */
  def deltaFrame(spark: SparkSession, dir: String, cut: Long): DataFrame =
    graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= cut)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))

  /** Stage the delta window as `files` parquet files — the shared
    * source stager for the bench/spec/probe streams. */
  def stageDelta(spark: SparkSession, dir: String, out: String,
                 cut: Long, files: Int): Unit =
    deltaFrame(spark, dir, cut)
      .repartition(files).write.mode("overwrite").parquet(out)

  /** Attach-and-serve for a FRESH JVM (the restart-attach face): the
    * published table must pass the marker/manifest gate; the read is
    * STORED BLOBS ONLY — q127's serve kernel over the streamed table. */
  def attachServe(spark: SparkSession, segDir: String): DataFrame = {
    val tbl = tableName(segDir)
    require(Published.ensure(spark, tbl, "slice", Sketches.kllTableBuckets,
      fp(segDir)),
      s"no complete published stream dashboard for $segDir (marker/manifest refused)")
    Sketches.kllServeFromSegments(spark.table(tbl))
  }
}
