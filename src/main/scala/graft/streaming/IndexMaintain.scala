package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.LongType

/** Streaming twin of q114 (`Similarity.q114IndexMaintain`) — the index
  * maintenance loop run CONTINUOUSLY: every micro-batch of new vectors
  * is assigned map-side to the FROZEN trained centroids, the per-cell
  * occupancy delta is folded into durable index metadata, and the
  * drift audit (occupancy + ratio + retrain flag) is re-emitted per
  * batch. Same discipline as [[Ingest.dedupGateSink]]'s durable delta
  * index: cumulative state lives as parquet `batch=<id>` partitions —
  * NOT in driver memory (which silently resets on every restart,
  * including each AvailableNow invocation) and NOT in stream state
  * (index metadata belongs to the index, where the batch path and
  * compaction jobs can read it).
  *
  * Scale shape: per batch, assignment is one map-side argmin over the
  * broadcast centroids (O(batch rows), zero shuffles before the
  * ≤k-row occupancy aggregate); the delta write is O(k) rows; the
  * audit reads O(k · batches) delta rows — counters, not vectors —
  * which production compacts periodically exactly like any metadata
  * table. The base corpus is never touched.
  *
  * Replay: a re-delivered batch rewrites its OWN `batch=<id>` delta
  * partition through dynamic partition overwrite, so cumulative
  * counts never double — idempotent without read-modify-write.
  * Row-level re-delivery inside a batch collapses via dropDuplicates
  * on vec_id (re-delivered rows are byte-identical). A vec_id
  * re-arriving in a LATER batch double-counts by design — occupancy
  * tracks ingested volume; content-level dedup is the upstream gate's
  * job ([[Ingest.dedupGateSink]]). */
object IndexMaintain {

  /** One row of new-vector traffic. */
  case class NewVector(vec_id: Long, embedding: Seq[Double])

  /** Start the maintenance sink: `newVecs` (streaming (vec_id,
    * embedding)) against frozen `cents` and stored `baseOcc`
    * ((cell, n_base) index metadata). Per batch writes the occupancy
    * delta under `deltaDir/batch=<id>` and the full drift audit under
    * `outDir/batch=<id>`. */
  def maintainSink(newVecs: DataFrame, cents: Array[(Long, Seq[Long])],
      baseOcc: DataFrame, outDir: String, checkpointDir: String,
      deltaDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(cents.nonEmpty && cents.length <= 4096,
      s"frozen centroid set must stay broadcastable, got ${cents.length}")
    val base = baseOcc.select(col("cell"), col("n_base")).localCheckpoint(true)
    val spark = base.sparkSession
    val spine = cents.map(_._1).toSeq
    def deltas(): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(deltaDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // explicit schema, never inference — an all-skip batch leaves a
      // data-file-less directory that inference throws on (the
      // dedupGateSink lesson, Ingest.scala)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        spark.read
          .schema(new org.apache.spark.sql.types.StructType()
            .add("cell", LongType).add("n", LongType).add("batch", LongType))
          .parquet(deltaDir)
          .select(col("cell"), col("n"))
      else spark.range(0).select(col("id").as("cell"), col("id").as("n"))
    }
    newVecs.writeStream
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        val batch = rawBatch.dropDuplicates("vec_id")
        val inc = graft.operators.Similarity.codeAndAssign(batch, cents)
          .groupBy(col("cell")).agg(count(lit(1)).as("n"))
        graft.sources.Layout.overwritePartitions(
          inc.withColumn("batch", lit(batchId)), deltaDir, Seq("batch"))
        val cum = deltas().groupBy(col("cell")).agg(sum(col("n")).as("n_delta"))
        val drift = graft.operators.Similarity
          .maintainStatsFromOcc(base, cum, spine)
        graft.sources.Layout.overwritePartitions(
          drift.withColumn("batch", lit(batchId)), outDir, Seq("batch"))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** [[maintainSink]] wired to the PUBLISHED base index (q122's
    * bucketed tables) — the deployment entry point, where the stream
    * maintains the same stored index the batch maintenance leg reads:
    * frozen centroids off the k-row `mcents` table, base occupancy as
    * the `mbase` assignments table's group-count (zero-exchange on the
    * bucket column; k rows thereafter). First call publishes the index
    * if the warehouse lacks it — after that the stream never touches
    * the base corpus, only its own deltas. Stream ≡ batch: a single
    * batch carrying exactly q122's delta rows re-emits q122's audit
    * verbatim (MaintainSpec pins it on the real corpus). */
  def maintainPublishedSink(newVecs: DataFrame, dir: String,
      outDir: String, checkpointDir: String, deltaDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = newVecs.sparkSession
    val (mbase, cents) =
      graft.operators.Similarity.publishedMaintFor(spark, dir)
    maintainSink(newVecs, cents,
      mbase.groupBy(col("cell")).agg(count(lit(1)).as("n_base")),
      outDir, checkpointDir, deltaDir, trigger)
  }
}
