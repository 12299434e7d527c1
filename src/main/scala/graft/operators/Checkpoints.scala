package graft.operators

import org.apache.spark.sql.DataFrame

/** Deterministic release of `localCheckpoint` blocks.
  *
  * Iterative operators (PageRank supersteps, BFS frontiers, label
  * propagation) checkpoint every round to keep lineage flat, which
  * leaves one block set per round for the ContextCleaner to reclaim —
  * but the cleaner only fires after the backing RDD is GC'd, and under
  * back-to-back runs (the bench's min-of-N) run N's superstep blocks
  * routinely survive into run N+1, doubling its memory pressure and
  * producing a bimodal ~2× slow mode (measured on q109/q75 at 10–20×
  * corpora, PLANS.md round 7). Releasing superstep N−1 as soon as
  * superstep N is materialized caps live checkpoint state at O(1)
  * rounds regardless of iteration count — the same discipline GraphX's
  * Pregel applies with its own per-round unpersist.
  *
  * CONTRACT: a released local checkpoint cannot be recomputed (its
  * lineage was truncated at checkpoint time), so callers must only
  * release a frame once every consumer has either executed or been
  * checkpointed itself. A violated contract fails loudly with a
  * missing-checkpoint-block error — never a silent wrong answer.
  *
  * CONTRACT (multi-leaf): `release(df)` unpersists EVERY `LogicalRDD`
  * leaf reachable from `df`'s analyzed plan, not just one. A frame built
  * by joining two checkpointed inputs releases BOTH on one call — which
  * is the desired behavior for superstep frames (each round's frame is
  * derived from the previous round's checkpoint plus static checkpointed
  * sides), but means a caller must not pass a frame that still shares a
  * checkpointed leaf with live downstream work. In practice this makes
  * release-safety an ORDERING property at the call site: q114 eagerly
  * materializes its two k-row occupancy aggregates (themselves
  * checkpoints with no upstream leaf) before releasing the N-row codes
  * checkpoint, and q109 releases its static `nodes`/`edges` checkpoints
  * only after the final superstep frame has been checkpointed — reorder
  * either and the release fires while a consumer can still trigger a
  * recompute, which fails loudly per the contract above.
  */
private[graft] object Checkpoints {

  /** Session conf key: `true` switches every loop-state materialization
    * routed through [[materialize]] from `localCheckpoint` (executor-
    * local blocks — the fast default, lost with the executor) to a
    * RELIABLE `checkpoint()` (files under [[checkpointDirKey]] or
    * `<warehouse>/_graft_checkpoints`), which is the production form
    * for iterative jobs that must survive executor loss: a superstep
    * chain whose blocks die with a killed executor cannot recompute
    * (lineage was truncated at checkpoint time), while reliable
    * checkpoint files on shared storage let the lost stages re-read
    * and the loop complete (demonstrated under kill -9 of a worker
    * executor — FaultProbe, PLANS.md r12). Runtime-settable per
    * session; read at every materialize call. */
  val reliableKey = "spark.graft.reliableCheckpoints"
  val checkpointDirKey = "spark.graft.checkpointDir"

  /** Materialize loop state per the session's fault-tolerance mode —
    * the single switch point for every iterative operator's superstep
    * and static-frame checkpoints. Both modes produce the same
    * `LogicalRDD` plan leaf, so plan pins, [[release]], and the
    * eager-release discipline are mode-blind. */
  /** The dir LAST APPLIED per context — `sc.getCheckpointDir` can't be
    * compared against the conf (setCheckpointDir stores a UUID subdir
    * of what it was given), and a first-set-wins rule would silently
    * ignore an operator re-pointing `spark.graft.checkpointDir` at
    * durable storage mid-session — voiding the exact survival the
    * reliable mode promises. */
  private val appliedCkptDir =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()

  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(reliableKey).contains("true")) {
      val sc = spark.sparkContext
      val want = spark.conf.getOption(checkpointDirKey).getOrElse(
        spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
          + "/_graft_checkpoints")
      if (appliedCkptDir.put(sc, want) != want) sc.setCheckpointDir(want)
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** Chaining form: `frame.materialized` reads like the
    * `.localCheckpoint(true)` it replaces at every loop site. */
  implicit final class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Checkpoints.materialize(df)
  }

  /** Unpersist the checkpoint blocks under `df` now (non-blocking).
    *
    * `Dataset.unpersist` can't do this: localCheckpoint persists at the
    * RDD layer, not through the CacheManager, so the Dataset-level call
    * is a no-op on it. The block holder is the `LogicalRDD` leaf the
    * checkpoint rewrote the plan to — projections/filters over the
    * checkpointed frame resolve to the same leaf, so releasing a
    * derived frame releases its checkpoint. Frames whose leaves are not
    * checkpoint scans (file relations, local tables) are untouched.
    * RELIABLE checkpoints additionally delete their files (the
    * ContextCleaner leaves them by default — `cleanCheckpoints` is
    * false — so a 14-superstep loop would otherwise leave 14 file sets
    * per run); same release-ordering contract as the blocks. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach { leaf =>
      // LogicalRDD is private[sql]; Scala package-private compiles to
      // public bytecode, so a reflective `rdd` call is safe at runtime
      // (probed on 4.1.2) without shimming into Spark's namespace
      if (leaf.getClass.getSimpleName == "LogicalRDD")
        leaf.getClass.getMethod("rdd").invoke(leaf) match {
          case r: org.apache.spark.rdd.RDD[_] =>
            r.unpersist(blocking = false)
            r.getCheckpointFile.foreach { p =>
              try {
                val path = new org.apache.hadoop.fs.Path(p)
                path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
                  .delete(path, true)
              } catch { case scala.util.control.NonFatal(_) => () }
            }
          case _ => ()
        }
    }
}
