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
    * the table after every batch). */
  private def fp(segDir: String): String =
    s"kllstream:${tableName(segDir)}"

  private val segSchema = new StructType()
    .add("slice", StringType).add("blob", BinaryType).add("n", LongType)
    .add("lo", LongType).add("hi", LongType).add("batch", LongType)

  /** The durable segment store, explicit schema (an all-empty-batch
    * store has data-file-less partition dirs that inference throws on
    * — the dedupGateSink lesson). */
  private[graft] def readSegments(spark: SparkSession, segDir: String): DataFrame = {
    val p = new HPath(segDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch=")))
      spark.read.schema(segSchema).parquet(segDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], segSchema)
  }

  private def baseDoneFlag(spark: SparkSession, segDir: String): HPath =
    new HPath(segDir, "_GRAFT_BASE_DONE")

  /** Bootstrap the base window's segment rows ([0, cut) —
    * `Sketches.kllBaseCut`, q127's split) into the segment store, once:
    * the flag file commits the bootstrap, so a crashed half-write is
    * rewritten on the next call, never half-served. Returns `cut`.
    * This is the sink's ONE corpus scan. */
  def bootstrapBase(spark: SparkSession, dir: String, segDir: String): Long = {
    val cut = Sketches.kllBaseCut(spark, dir)
    val flag = baseDoneFlag(spark, segDir)
    val fs = flag.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(flag)) {
      Layout.overwritePartitions(
        Sketches.kllSegment(spark, dir, 0L, cut)
          .withColumn("batch", lit(-1L)),
        segDir, Seq("batch"))
      scala.util.Using.resource(fs.create(flag, true))(
        _.write(cut.toString.getBytes("UTF-8")))
    }
    cut
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
          val hwRow = spark.table(tbl).agg(max(col("batch"))).head
          val hw = if (hwRow.isNullAt(0)) Long.MinValue else hwRow.getLong(0)
          if (hw < batchId) {
            val pending = readSegments(spark, segDir)
              .filter(col("batch") > hw && col("batch") <= batchId)
            // EMPTY batches keep hw pinned at the last non-empty id, so
            // without this guard every empty trigger would pay an
            // empty append job + a manifest re-stamp (r16 review
            // finding #7) — the emptiness probe is one job over the
            // kilobyte store
            if (!pending.isEmpty) {
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
    * direct replay calls. */
  private[graft] def processBatch(spark: SparkSession, segDir: String,
                                  batch: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    // persist across the two actions (bounds probe + sketch build) —
    // without it each foreachBatch invocation re-reads the batch's
    // source files twice (r16 review finding #6)
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
        Layout.overwritePartitions(seg, segDir, Seq("batch"))
      }
    } finally { batch.unpersist(); () }
    // an EMPTY batch still syncs: a prior batch's append may have been
    // refused (fault) and this is the retry that heals it
    publishUpTo(spark, segDir, batchId)
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
    if (fs.exists(idFile)) {
      val len = fs.getFileStatus(idFile).getLen.toInt
      val buf = new Array[Byte](len)
      scala.util.Using.resource(fs.open(idFile))(_.readFully(0, buf))
      val existing = new String(buf, "UTF-8")
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
    * window. */
  def kllPublishedSink(rows: DataFrame, segDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = rows.sparkSession
    assertCheckpointLineage(spark, segDir, checkpointDir)
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, segDir, batch, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Stage the delta window (l_orderkey ≥ cut) as `files` parquet files
    * — the shared source stager for the bench/spec/probe streams (one
    * copy of the column selection; r16 review finding #5). */
  def stageDelta(spark: SparkSession, dir: String, out: String,
                 cut: Long, files: Int): Unit =
    graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") >= cut)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
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
