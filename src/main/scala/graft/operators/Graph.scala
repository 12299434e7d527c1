package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

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
    * WeakHashMap keyed on the session INSTANCE: entries die with their
    * session (no unbounded retention of dead sessions' checkpointed
    * RDDs, and no identity-hash collision handing a new session a frame
    * bound to a stopped context); the isStopped guard rebuilds if a
    * caller holds a stopped-but-referenced session. localCheckpoint
    * blocks are executor-local and non-fault-tolerant — fine in this
    * single-JVM deployment; a multi-executor cluster with dynamic
    * allocation swaps this for a reliable `checkpoint()` (or a
    * materialized edge TABLE), which is the production form of the same
    * decision. */
  private val edgeCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()

  private def edgesMaterialized(spark: SparkSession, dir: String): DataFrame = {
    val perSession = edgeCache.synchronized {
      val m = edgeCache.get(spark)
      if (m != null) m
      else {
        val fresh = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
        edgeCache.put(spark, fresh)
        fresh
      }
    }
    if (spark.sparkContext.isStopped) edges(spark, dir) // caller's problem, don't cache
    else perSession.getOrElseUpdate(dir, edges(spark, dir).localCheckpoint(true))
  }

  // ---------------------------------------------------------------- q73
  /** Fixed-point PageRank, 3 iterations, damping 0.85: top-20 nodes of
    * the shipping network. r₀ = 10⁶ per node;
    * r_{t+1}(v) = 0.15·10⁶ + (85·Σ_{u→v} (r_t(u) div outdeg(u))) div 100.
    *
    * Scale shape: the edge list (with out-degree folded in) and the
    * node list are the STATIC inputs of every iteration — materialized
    * once ([[DataFrame.localCheckpoint]], the caching any iterative job
    * does) so three supersteps don't re-run the lineitem⋈orders
    * distinct three times. Each iteration is then one shuffle join
    * edge⋈rank on src plus one aggregation keyed by dst — both hash-
    * partitioned on node id, the layout a 1000-executor cluster wants;
    * rank state is O(nodes), never collected to the driver. Dangling
    * nodes (none in a symmetrized graph) would leak rank mass — the
    * standard simplification, noted not patched. */
  /** One PageRank superstep: edge⋈rank on src, Σ integer contributions
    * keyed by dst, damped fixed-point update. Factored so the spec can
    * drive it over a hand-built graph. */
  private[graft] def pagerankStep(edgesD: DataFrame, nodes: DataFrame,
                                  ranks: DataFrame): DataFrame = {
    val contrib = edgesD
      .join(ranks, edgesD("src") === ranks("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("r div od")).as("m"))
    nodes.join(contrib, nodes("node") === contrib("dst"), "left")
      .select(col("node"),
        (lit(scale * 15 / 100) + expr("85 * coalesce(m, 0L) div 100")).as("r"))
  }

  def q73Pagerank(spark: SparkSession, dir: String): DataFrame = {
    val e = edgesMaterialized(spark, dir)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val edgesD = e.join(deg, "src").localCheckpoint(true)
    val nodes = edgesD.select(col("src").as("node")).distinct().localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(scale).as("r"))
    for (_ <- 1 to 3) ranks = pagerankStep(edgesD, nodes, ranks)
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
       |${iter("r0", "r1")},
       |${iter("r1", "r2")},
       |${iter("r2", "r3")}
       |SELECT node, CASE WHEN node % 2 = 0 THEN 'S' ELSE 'C' END AS kind,
       |  node // 2 AS entity_id, r AS rank
       |FROM r3 ORDER BY rank DESC, node LIMIT 20""".stripMargin
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
  def q75TriangleCount(spark: SparkSession, dir: String): DataFrame = {
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
    closeTriangles(pairs)
  }

  /** a<b<c closure over an a<b-oriented edge list. Factored so the spec
    * can assert closure semantics on a known graph. */
  private[graft] def closeTriangles(pairs: DataFrame): DataFrame = {
    val e1 = pairs
    val e2 = broadcast(pairs.select(col("pa").as("pb2"), col("pb").as("pc")))
    val e3 = broadcast(pairs.select(col("pa").as("pa3"), col("pb").as("pc3")))
    e1.join(e2, col("pb") === col("pb2"))
      .join(e3, col("pa") === col("pa3") && col("pc") === col("pc3"))
      .select(col("pa").as("a"), col("pb").as("b"), col("pc").as("c"))
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
        .localCheckpoint(true)
      levels = levels :+ fresh.withColumn("depth", lit(depth))
      visited = visited.union(fresh).localCheckpoint(true)
      frontier = fresh
    }
    levels.reduce(_ union _)
  }

  def q81BfsReach(spark: SparkSession, dir: String): DataFrame = {
    val e = edgesMaterialized(spark, dir)
    // suppliers 1, 2, 3 in packed node ids
    bfsLevels(spark, e, Seq(2L, 4L, 6L), 3)
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
  )

  val oracle: Map[String, String] = Map(
    "q73_pagerank"       -> q73Sql,
    "q75_triangle_count" -> q75Sql,
    "q81_bfs_reach"      -> q81Sql,
  )
}
