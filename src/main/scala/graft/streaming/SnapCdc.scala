package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Snap

/** Continuous CDC apply into a [[graft.sources.Snap]] table — the
  * streaming twin of the batch merge, closing the same loop the KLL
  * dashboard closed in r16/r17: the reference's pipeline is a
  * continuous producer (`regionSpout.go:126-163`), so the engine's
  * mutation story needs a continuous form too.
  *
  * Delivery contract, each clause executed by spec/probe:
  *   - **exactly-once effect**: each micro-batch merges through
  *     [[Snap.mergeStreaming]], whose applied-high-water rides in the
  *     SAME atomic manifest commit as the rows — a driver death
  *     between the sink's commit and the checkpoint's commit replays
  *     the batch into a no-op, never a double-apply (leg H executes
  *     that window with a real kill);
  *   - **lineage-guarded**: batch ids only mean anything within one
  *     checkpoint lineage; the sink stamps `_GRAFT_CKPT` on the table
  *     and refuses a foreign checkpoint (KllPublish's r16 discipline);
  *   - **self-folding**: `autoOptimize` passes through, so a year of
  *     one-file-per-trigger appends folds inside the sink's own lease
  *     holds — no external compactor schedule.
  *
  * At 100 TB: each trigger's work is O(delta) (the COW merge's
  * contract); the table serves readers throughout (immutable files +
  * atomic manifest flips); backpressure via maxFilesPerTrigger /
  * maxOffsetsPerTrigger on the source side. */
object SnapCdc {

  /** Start the apply loop: every micro-batch of `deltas` (table
    * columns + the boolean `deletedCol`) merges into the snap table at
    * `loc`. The base snapshot must exist ([[Snap.create]]) — a CDC
    * stream updates a table, it does not define one.
    *
    * `autoVacuum=k` bounds the RETENTION the same way `autoOptimize`
    * bounds the file count: every `vacuumEvery`-th batch keeps the
    * newest k versions inside the sink's own lease hold — a
    * year-running CDC apply stays O(k) manifests without an external
    * vacuum schedule (the r16 "compactor nothing calls" lesson, now on
    * versions). k is the deployment's time-travel / changelog-replay
    * budget: a downstream follower may lag at most k versions.
    *
    * `mor = true` (r19) applies each micro-batch through
    * [[Snap.mergeMorStreaming]] instead of the copy-on-write merge —
    * the TRICKLE-CDC form this sink's own load shape wants: a
    * continuous stream of small batches commits O(batch) BYTES per
    * trigger (one small delta file per touched bucket, base files
    * untouched) instead of rewriting every intersecting bucket file
    * per trigger. Pair it with `autoOptimize` so the accumulating
    * delta files fold back into the base on the sink's own cadence;
    * every other clause (exactly-once high-water, lineage stamp,
    * autoVacuum) is shared — the MOR and COW paths use the same
    * manifest commit point. */
  def cdcSink(deltas: DataFrame, loc: String, checkpointDir: String,
              deletedCol: String = "_deleted", autoOptimize: Int = 0,
              trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
              autoVacuum: Int = 0, vacuumEvery: Int = 1,
              mor: Boolean = false)
      : StreamingQuery = {
    require(vacuumEvery >= 1, "vacuumEvery must be >= 1")
    val table = new HPath(loc)
    // lineage-checked on the FIRST micro-batch, not at construction:
    // the checkpoint's QUERY ID (the identity that survives a
    // wiped-and-recreated checkpoint at the same path — r17 review
    // finding) exists only once the query is running. Once per query.
    val lineageChecked = new java.util.concurrent.atomic.AtomicBoolean(false)
    val w = deltas.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!lineageChecked.get()) {
          Snap.assertStreamLineage(table, checkpointDir)
          lineageChecked.set(true)
        }
        // cadence amortizes the vacuum's data/ listing; replay-safe
        // (vacuum after a no-op'd replayed batch just re-audits)
        val vac =
          if (autoVacuum > 0 && batchId % vacuumEvery == 0) autoVacuum
          else 0
        if (mor)
          Snap.mergeMorStreaming(batch.sparkSession, table, batch, batchId,
            deletedCol, autoOptimize, autoVacuum = vac)
        else
          Snap.mergeStreaming(batch.sparkSession, table, batch, batchId,
            deletedCol, autoOptimize, autoVacuum = vac)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    trigger.fold(w)(w.trigger).start()
  }
}
