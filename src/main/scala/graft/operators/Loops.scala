package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared child-session machinery for iterative superstep loops.
  *
  * Round 8 measured (PartProbe, PLANS.md) that a checkpointed loop under
  * AQE re-plans every superstep from a partitioning-less `LogicalRDD`
  * leaf and shuffles BOTH join sides every round — 4 exchanges per
  * superstep where 1 is needed, a 2.7× tax at 10× data on PageRank.
  * The fix shipped for q73/q109 (`Graph.loopSession`) is generalized
  * here for every iterative operator (connected components, BFS): run
  * the LOOP in a child session with
  *  - AQE OFF, so `localCheckpoint`/`persist` preserve hash
  *    partitioning into the next superstep's plan (static frames
  *    pre-partitioned on their join key are never re-exchanged), and
  *  - shuffled-hash join preferred, so the co-partitioned joins skip
  *    the per-superstep sort as well.
  * The trade, documented where it is made: no AQE in-loop means no
  * runtime skew-join splitting — acceptable when a map-side partial
  * aggregate absorbs hub skew (PageRank's dst-sum, CC's min-label),
  * the GraphSpec heavy-hub fixture pins this; a loop whose per-key
  * reduce is NOT partial-aggregable would salt instead.
  *
  * The producer PIPELINES that feed a loop (LSH+verify for q56, the
  * edge derivation for the graph queries) still run under the parent
  * session — AQE coalescing/skew handling is exactly right for one-shot
  * dataflow; it is only the re-planned-per-round loop body that pays
  * the tax. [[rehost]] is the bridge: materialize the (loop-sized)
  * input once under the parent, then re-host its checkpointed RDD into
  * the child for the rounds.
  */
private[graft] object Loops {

  private val children =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Int), SparkSession]()

  /** Rows per loop shuffle partition. Turning AQE off in-loop also gave
    * up AQE's partition COALESCING, and LoopParts (checked in) measured
    * the cost at bench scale: the 14-superstep q109 lazy loop over the
    * 1.17M-row sf0.1 edge frame runs 5.9–6.7 s with 32-partition stages
    * but 2.5–3.3 s at 8 (~147k rows/partition) — per-stage fixed
    * overhead, not data movement, is the superstep floor when tasks
    * hold too few rows. So the loop session applies AQE's rule at loop
    * ENTRY, where the input cardinality is already known: partitions =
    * rows/128k (the probe's sweet spot), floored at 4 (keep some
    * parallelism for tiny collision subgraphs), ceilinged by executor
    * parallelism — at 100 TB the ceiling always binds and this knob
    * vanishes; it only exists because a loop's stage sizing cannot be
    * re-planned per-superstep without AQE. */
  val loopRowsPerPartition = 131072L

  def dataSizedParts(rows: Long, ceiling: Int): Int =
    math.max(4L, math.min(ceiling.toLong, rows / loopRowsPerPartition + 1L)).toInt

  /** The AQE-off, hash-join-preferring child of `spark` — one per
    * (root session, partition count), cached: frame caches key by
    * session, so a fresh child per call would re-materialize static
    * loop inputs on every run. `parts = 0` inherits the parent's
    * shuffle parallelism; a positive value pins the child's shuffle
    * partitions so every loop stage (joins, aggregates, repartitions)
    * agrees on one data-sized layout. Evicts stopped sessions; returns
    * `spark` itself if already stopped (the caller's problem, don't
    * cache). */
  /** The session plus its cached loop children — the blast radius of a
    * session-scoped cache recovery (`Graph.withCacheRecovery`): exactly
    * the sessions whose cached frames a query entered through `spark`
    * can reference. */
  def familyOf(spark: SparkSession): Set[SparkSession] = {
    import scala.jdk.CollectionConverters._
    children.entrySet().asScala.collect {
      case e if e.getKey._1 eq spark => e.getValue
    }.toSet + spark
  }

  def session(spark: SparkSession, parts: Int = 0): SparkSession = {
    val it = children.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    if (spark.sparkContext.isStopped) spark
    else {
      val child = children.computeIfAbsent((spark, parts), { case (p, np) =>
        val ns = p.newSession()
        ns.conf.set("spark.sql.adaptive.enabled", "false")
        ns.conf.set("spark.sql.join.preferSortMergeJoin", "false")
        if (np > 0) ns.conf.set("spark.sql.shuffle.partitions", np.toString)
        ns
      })
      // propagate the checkpoint fault-tolerance mode on EVERY call:
      // it is runtime-settable on the parent, the child's conf is a
      // snapshot from creation, and the in-loop materializations read
      // the CHILD session — without this sync a parent that switched
      // to reliable checkpoints would silently loop on local ones
      Seq(Checkpoints.reliableKey, Checkpoints.checkpointDirKey).foreach { k =>
        spark.conf.getOption(k) match {
          case Some(v) => child.conf.set(k, v)
          case None    => child.conf.unset(k)
        }
      }
      child
    }
  }

  /** Re-host a MATERIALIZED (checkpointed/persisted) frame into another
    * session of the same SparkContext. RDDs are context-scoped, not
    * session-scoped, so the data moves by reference — the cost is one
    * InternalRow→Row→InternalRow conversion pass when the child first
    * scans it, which callers pay once by checkpointing the re-hosted
    * frame (usually fused with the repartition that bakes in the loop's
    * join-key layout). Intended for loop-sized inputs (collision
    * subgraphs, frontier seeds), not corpus-sized frames. */
  def rehost(df: DataFrame, to: SparkSession): DataFrame =
    to.createDataFrame(df.rdd, df.schema)
}
