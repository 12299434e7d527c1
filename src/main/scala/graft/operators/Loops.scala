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
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** The AQE-off, hash-join-preferring child of `spark` — one per root
    * session, cached: frame caches key by session, so a fresh child per
    * call would re-materialize static loop inputs on every run. Evicts
    * stopped sessions; returns `spark` itself if already stopped (the
    * caller's problem, don't cache). */
  def session(spark: SparkSession): SparkSession = {
    val it = children.keySet.iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    if (spark.sparkContext.isStopped) spark
    else children.computeIfAbsent(spark, p => {
      val ns = p.newSession()
      ns.conf.set("spark.sql.adaptive.enabled", "false")
      ns.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      ns
    })
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
