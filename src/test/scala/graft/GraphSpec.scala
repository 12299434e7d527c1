package graft

import org.apache.spark.sql.functions._

/** Graph operators (q73/q75/q81) verified on hand-built graphs where
  * the expected answer is computable by inspection, plus first-
  * principles invariants of the table-driven forms at sf0.001. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerankStep: hand-computed fixed-point values on a 3-node cycle") {
    // directed cycle 1→2→3→1, out-degree 1 everywhere: after one step
    // every rank must be 150000 + 85 * (1000000 div 1) div 100 = 1000000
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .withColumn("od", lit(1L))
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val r0 = nodes.select(col("node"), lit(1000000L).as("r"))
    val r1 = graft.operators.Graph.pagerankStep(edges, r0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L),
      s"cycle is the fixed point of the damped update, got $r1")
    // star 1→{2,3}: od(1)=2; node 1 gets no inflow → base 150000;
    // nodes 2,3 get 150000 + 85*(1000000 div 2) div 100 = 575000
    val star = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst").withColumn("od", lit(2L))
    val r1s = graft.operators.Graph.pagerankStep(star, r0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1s == Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L), s"got $r1s")
  }

  test("heavy-hub skew is absorbed map-side in the AQE-off loop session") {
    // The loopSession trade documented in Loops.scala: no AQE in-loop
    // means no runtime skew-join splitting, which is safe ONLY because
    // every loop's per-key reduce (PageRank's dst-sum, CC's min-label)
    // is partial-aggregable — a hub key collapses to ≤ one row per
    // partition BEFORE the shuffle. This pins that claim with metrics:
    // a 20k-edge star (every edge into node 0 — the worst skew a graph
    // can have) must move O(partitions + spokes) rows through the
    // superstep's exchanges, never O(edges).
    val s = graft.operators.Loops.session(spark)
    import s.implicits._
    val n = 20000
    val hubEdges = (1 to n).map(i => (i.toLong, 0L)) // all inflow → hub 0
    val edges = hubEdges.toDF("src", "dst").withColumn("od", lit(1L))
      .repartition(col("src")).sortWithinPartitions("src").localCheckpoint(true)
    val r0 = (0L +: (1 to n).map(_.toLong)).toDF("node")
      .select(col("node"), lit(1000000L).as("r"))
      .repartition(col("node")).localCheckpoint(true)
    val r1 = graft.operators.Graph.pagerankStep(edges, r0)
    val rows = r1.collect()
    // correctness under skew: hub holds all inflow, spokes only the base
    val byNode = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byNode(0L) == 150000L + 85L * (n.toLong * (1000000L / 1L)) / 100L,
      "hub rank = base + damped sum of all contributions")
    assert((1 to n).forall(i => byNode(i.toLong) == 150000L),
      "spokes get no inflow in a pure-in star")
    // the skew proof: every shuffle exchange in the superstep moved
    // far fewer records than the edge count — the partial aggregate
    // collapsed the hub's 20k contributions before the wire
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      PlanWalk.allNodes(p)
    val shuffled = allNodes(r1.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e.metrics.get("numOutputRows").orElse(e.metrics.get("shuffleRecordsWritten"))
          .map(_.value).getOrElse(-1L)
    }
    assert(shuffled.nonEmpty, "superstep must contain a measurable exchange")
    shuffled.foreach { recs =>
      assert(recs >= 0 && recs < n / 2,
        s"an exchange moved $recs records — hub contributions were NOT " +
          s"collapsed map-side (edge count $n); the no-AQE-skew-split " +
          "trade in Loops.session is unsafe for this plan")
    }
    graft.operators.Checkpoints.release(edges)
    graft.operators.Checkpoints.release(r0)
  }

  test("pagerankConverge: fixpoint stop fires on a d-regular graph after one superstep") {
    // 3-cycle is 1-regular directed: the damped update maps r=10⁶ to
    // itself, so the exact-integer delta check must stop the loop at
    // iteration 1 of the 8 allowed, with ranks unchanged
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .withColumn("od", lit(1L))
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val r0 = nodes.select(col("node"), lit(1000000L).as("r"))
    val (ranks, iters) =
      graft.operators.Graph.pagerankConverge(edges, r0, 8)
    assert(iters == 1, s"regular graph must converge in one superstep, ran $iters")
    val rs = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rs == Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L), s"got $rs")
    // star graph is NOT at its fixpoint after one step: the loop must
    // keep iterating (and hit the cap here — integer convergence of a
    // non-regular graph takes ~1/(1-d) steps)
    val star = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst").withColumn("od", lit(2L))
    val (_, starIters) =
      graft.operators.Graph.pagerankConverge(star, r0, 3)
    assert(starIters == 3, s"non-fixpoint graph must run to the cap, ran $starIters")
  }

  test("pagerankConvergeOrderStable: order probe fires long before the exact fixpoint") {
    // star 1→{2,3}: rank VALUES keep shrinking toward the fixpoint for
    // ~85 supersteps, but the RANKING is [2,3,1] from superstep 1 on —
    // the order probe must exit at iteration 2 (first repeat), where the
    // exact-integer probe (pagerankConverge) provably runs to any cap
    val star = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst").withColumn("od", lit(2L))
    val r0 = Seq(1L, 2L, 3L).toDF("node").select(col("node"), lit(1000000L).as("r"))
    val (ranks, iters, starStable) =
      graft.operators.Graph.pagerankConvergeOrderStable(star, r0, topK = 3, maxIters = 8)
    assert(starStable && iters == 2, s"order [2,3,1] repeats at superstep 2, ran $iters")
    val order = ranks.orderBy(col("r").desc, col("node"))
      .collect().map(_.getLong(0)).toSeq
    assert(order == Seq(2L, 3L, 1L), s"got $order")
    // secondary exit: a graph AT its fixpoint still stops immediately
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      .withColumn("od", lit(1L))
    val (_, cycIters, cycStable) =
      graft.operators.Graph.pagerankConvergeOrderStable(cyc, r0, topK = 3, maxIters = 8)
    assert(cycStable && cycIters == 1, s"fixpoint graph must stop at 1, ran $cycIters")
  }

  test("pagerank order stability on the REAL corpus: unstable at q73's budget; the lazy chain converges") {
    // Round-6 ADVICE asked this exact question at scale, and the answer
    // overturned the round-6 claim: the tiny sf0.001 graph stabilizes at
    // 2 supersteps, but at sf0.01 — the bipartite structure biting — the
    // STANDARD chain's top-20 order is still churning well past q73's
    // 3-superstep budget (full stability needs ~26 supersteps; ~31 at
    // sf0.1). This spec pins both halves of the corrected contract:
    // q73's budget buys fixed-superstep VALUES, not a stable order, and
    // the lazy chain is the affordable order-stable form (~14).
    val gateSf = "/root/testdata/sf0.01"
    val e = graft.operators.Graph.shipEdgesForSpec(spark, gateSf)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val edgesD = e.join(deg, "src").localCheckpoint(true)
    val nodes = edgesD.select(col("src").as("node")).distinct()
    val nr0 = nodes.select(col("node"), lit(1000000L).as("r"))
    val budget = 3 // = pagerankMaxIters; literal so a budget bump re-asks the question
    val (_, stdIters, stdStable) = graft.operators.Graph
      .pagerankConvergeOrderStable(edgesD, nr0, topK = 20, maxIters = budget + 2)
    // !stdStable already implies the loop ran to its cap — asserting the
    // exact iteration count again was a redundant, brittle pin (r7 ADVICE)
    assert(!stdStable,
      s"sf0.01 top-20 order must NOT stabilize near the $budget-superstep budget " +
        s"(the round-6 claim this spec disproves), stable=$stdStable at $stdIters")
    val (_, lazyIters, lazyStable) = graft.operators.Graph
      .pagerankConvergeOrderStable(edgesD, nr0, topK = 20, maxIters = 20, lazyChain = true)
    assert(lazyStable && lazyIters <= 18,
      s"lazy chain must reach a stable top-20 within ~14 supersteps, stable=$lazyStable at $lazyIters")
  }

  test("closeTriangles: exactly the a<b<c closures, no duplicates") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles (1,2,3), (1,2,4) only
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("pa", "pb")
    val tri = graft.operators.Graph.closeTriangles(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.toSeq == Seq((1L, 2L, 3L), (1L, 2L, 4L)), s"got ${tri.toSeq}")
  }

  test("bfsLevels: min-depth assignment, already-visited nodes never reappear") {
    // path 1→2→3→4 plus shortcut 1→3: node 3 must land at depth 1, not 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val lv = graft.operators.Graph.bfsLevels(spark, e, Seq(1L), 3)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(lv == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2), s"got $lv")
  }

  test("q73: every rank carries the damping base; top node out-ranks the median") {
    val ranks = graft.operators.Graph.q73Pagerank(spark, sf).collect()
    assert(ranks.length == 20)
    assert(ranks.forall(_.getAs[Long]("rank") >= 150000L),
      "the 0.15 base is a hard floor of the damped update")
    // ordering contract: descending rank
    val rs = ranks.map(_.getAs[Long]("rank"))
    assert(rs.zip(rs.tail).forall { case (a, b) => a >= b })
  }

  test("q81: depth-0 rows are exactly the seeds, one per seed") {
    val rows = graft.operators.Graph.q81BfsReach(spark, sf).collect()
    val d0 = rows.filter(_.getAs[Int]("depth") == 0)
    assert(d0.map(_.getAs[Long]("seed_supplier")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(d0.forall(_.getAs[Long]("n_nodes") == 1L))
  }

  test("reliable-checkpoint mode: identical loop results, superstep files released") {
    import graft.operators.Checkpoints
    val base = graft.operators.Graph.q109PagerankStable(spark, sf)
      .collect().map(_.toString).toSeq
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_relckpt")
    spark.conf.set(Checkpoints.checkpointDirKey, ckptDir.toString)
    spark.conf.set(Checkpoints.reliableKey, "true")
    try {
      val rel = graft.operators.Graph.q109PagerankStable(spark, sf)
        .collect().map(_.toString).toSeq
      // same fixed-point trajectory, just durable supersteps
      assert(rel == base, "reliable mode must not change the loop's results")
      // the eager-release discipline deletes each superstep's FILES too
      // (ContextCleaner leaves reliable checkpoints by default): after a
      // 14-superstep run only O(1) frames may remain on disk — the
      // final ranks, the guard's prev, and the session-cached statics
      import scala.jdk.CollectionConverters._
      def rddDirs = java.nio.file.Files.walk(ckptDir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("rdd-")).toSeq
      val remaining = rddDirs.size
      assert(remaining <= 6,
        s"superstep checkpoint files must be released, $remaining remain")
    } finally {
      spark.conf.unset(Checkpoints.reliableKey)
      spark.conf.unset(Checkpoints.checkpointDirKey)
    }
  }
}
