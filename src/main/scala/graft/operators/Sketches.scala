package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sketch / approximate aggregates — the operators that keep 100 TB
  * aggregations single-pass and bounded-memory (SURVEY §2.1: HLL distinct,
  * quantiles). The reference has nothing comparable; these are mandated by
  * the extension surface.
  *
  * All five entries are oracle-gated (r11 verdict ask #4). The three
  * approximate ones (q40/q91/q98) follow q104's deterministic-face
  * pattern (`functions/HeavyHitters`): an approximate answer can't
  * hash-match an exact engine, so the QUERY OUTPUT is the audit a
  * deployment actually gates on — the exact values recomputed beside the
  * sketch plus 0/1 invariant flags proving the estimates landed inside
  * their error envelopes ON THIS RUN. HLL register-max merging is
  * order-independent, so the estimates (and hence the flags) are
  * deterministic per dataset; each envelope is ≥5 standard deviations of
  * its estimator's configured error (q40: rsd 0.02 → 10%; q91/q98:
  * lgK-12 Datasketches rse ≈1.6% → 8%), so a FRESH corpus — a new draw
  * per estimate — flips a flag with probability ≈ P(|Z|>5) ≈ 6e-7, not
  * the ~1% a 2.5σ bound would carry, while the worst error actually
  * measured (0.85–1.0% across sf0.001/0.01/0.1, SketchProbe PLANS.md
  * r12) sits 8–12× inside every envelope. An implementation bug (wrong
  * rsd wiring, a broken merge, inclusion–exclusion over mismatched
  * sketches) lands orders of magnitude outside and fails the gate;
  * SketchesSpec keeps the TIGHT bounds on the raw estimates.
  */
object Sketches {

  // ---------------------------------------------------------------- q39
  /** Exact interpolated percentiles of order value per priority (single
    * shuffle; at scale swap `percentile` for `approx_percentile` — same
    * plan shape, sketch-sized state). One `percentile(..., array(...))`
    * aggregate, not four: the quantile buffer is built and sorted once
    * per group (measured 1.27 → 0.99 s at sf0.1; the remainder is the
    * scan + group shuffle, not quantile math). */
  def q39Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))").as("ps"))
      .select(col("o_orderpriority"),
        round(element_at(col("ps"), 1), 2).as("p25"),
        round(element_at(col("ps"), 2), 2).as("p50"),
        round(element_at(col("ps"), 3), 2).as("p75"),
        round(element_at(col("ps"), 4), 2).as("p95"))
      .orderBy(col("o_orderpriority"))

  val q39Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
      |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75,
      |  round(quantile_cont(o_totalprice, 0.95), 2) AS p95
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q40
  /** HLL++ distinct counts beside the exact answer — the constant-memory
    * form of q10 at scale — reduced to the deterministic audit face:
    * exact count per priority + a flag that the HLL++ estimate (rsd
    * 0.02) landed within 10% = 5σ of it (false-flip ≈6e-7 per estimate
    * on a fresh corpus; measured worst error 0.85%, SketchProbe). The
    * estimate itself is deterministic (register maxes commute) but not
    * oracle-computable; SketchesSpec bounds it tightly. */
  /** The raw estimates (spec surface: SketchesSpec bounds these). */
  private[graft] def q40RawEstimates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("exact_customers"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("approx_customers"))

  def q40ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    q40RawEstimates(spark, dir)
      .select(col("o_orderpriority"), col("exact_customers"),
        when(abs(col("approx_customers") - col("exact_customers"))
          <= col("exact_customers") * 0.10, 1).otherwise(0)
          .cast("int").as("approx_in_bounds"))
      .orderBy(col("o_orderpriority"))

  val q40Sql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_customers,
      |  1 AS approx_in_bounds
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Data-profiling audit — the table-health scan a pipeline runs before
    * trusting an input: per column, row/null/distinct counts and value
    * range, computed in ONE pass over the fact table (a single aggregate
    * produces every measure; `stack` unpivots the wide row to one row
    * per column). At 100 TB this is one scan + a 1-row-per-column
    * result — swap countDistinct for approx_count_distinct to keep the
    * aggregate sketch-sized. */
  /** Columns profiled by q59 — single source of truth for the Spark
    * query and its oracle SQL (diverging copies would silently compare
    * different profiles). */
  private val profileCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  def q59Profile(spark: SparkSession, dir: String): DataFrame = {
    val cols = profileCols
    val li = Tables.lineitem(spark, dir)
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_nn"),
        countDistinct(col(c)).as(s"${c}_nd"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"))): _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}_nn, ${c}_nd, ${c}_min, ${c}_max").mkString(", ")
    wide.select(col("n_rows"), expr(
        s"stack(${cols.length}, $stackArgs) AS (column_name, n_non_null, n_distinct, vmin, vmax)"))
      .select(col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("n_distinct"), col("vmin"), col("vmax"))
      .orderBy(col("column_name"))
  }

  val q59Sql: String = {
    val selects = profileCols.map { c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |  min($c) AS vmin, max($c) AS vmax FROM lineitem""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$selects
       |) ORDER BY column_name""".stripMargin
  }

  // ---------------------------------------------------------------- q91
  /** Sketch MERGEABILITY audit — q85's incremental-view story extended
    * to approximate state, which is how 100 TB dashboards actually stay
    * fresh: per-slice Datasketches-HLL sketches (the persisted partial
    * state, one binary blob per slice) are union-merged and compared
    * against the sketch built in one pass over the whole corpus, plus
    * the exact distinct count. base ∪ delta never rescans base — a new
    * slice's sketch merges into the stored state in O(sketch) time.
    *
    * Emits one audit row: merged estimate, whole-corpus estimate, the
    * exact count, whether merge reproduced the one-pass estimate
    * EXACTLY, and the relative error vs exact. The boolean is usually
    * false by design of the sketch library, and that is the point of
    * auditing it: Datasketches HLL carries a HIP accumulator that
    * one-pass aggregation uses but union-merging must discard (it
    * falls back to the raw harmonic estimator), so merged and whole
    * estimates legitimately differ by a little while BOTH stay inside
    * the configured error bounds — the invariant a 100 TB dashboard
    * actually relies on, emitted here as the deterministic audit face
    * (q104's pattern): the exact count plus flags that merged and
    * whole each landed within 8% = 5σ of exact (lgK-12 rse ≈1.6%) and
    * within 4% of each other (the HIP-fallback gap, measured ≤0.40%)
    * (measured: merged ≤1.0%, whole ≤0.81%, gap ≤0.40% across three
    * SFs — SketchProbe; at sf0.01: merged 1488, whole 1494, exact
    * 1500). SketchesSpec bounds the raw estimates directly. */
  private def inBounds(est: Column, ref: Column, tol: Double): Column =
    when(abs(est - ref) <= ref * tol, 1).otherwise(0).cast("int")

  /** The raw estimates (spec surface). */
  private[graft] def q91RawEstimates(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderdate"))
    val perSlice = o
      .withColumn("slice",
        when(col("o_orderdate") < cutoff, "base").otherwise("delta"))
      .groupBy(col("slice"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = perSlice
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_estimate"))
    val whole = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("whole_estimate"),
      countDistinct(col("o_custkey")).as("exact_customers"))
    merged.crossJoin(whole)
  }

  def q91SketchMerge(spark: SparkSession, dir: String): DataFrame =
    q91RawEstimates(spark, dir)
      .select(col("exact_customers"),
        inBounds(col("merged_estimate"), col("exact_customers"), 0.08)
          .as("merged_in_bounds"),
        inBounds(col("whole_estimate"), col("exact_customers"), 0.08)
          .as("whole_in_bounds"),
        inBounds(col("merged_estimate"), col("whole_estimate"), 0.04)
          .as("merged_tracks_whole"))

  val q91Sql: String =
    """SELECT count(DISTINCT o_custkey) AS exact_customers,
      |  1 AS merged_in_bounds, 1 AS whole_in_bounds, 1 AS merged_tracks_whole
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q98
  /** Sketch-based JOIN-KEY overlap estimation — the optimizer statistic
    * behind join planning at 100 TB: how many distinct customer keys do
    * `orders` and `customer` share? Exact inclusion–exclusion over HLL
    * sketches (|A∩B| ≈ est(A) + est(B) − est(A∪B)) needs one scan per
    * side and constant memory, vs the exact semi-join's full shuffle.
    * One audit row, deterministic face (q104's pattern): the exact
    * per-side distinct counts and exact overlap, plus flags that each
    * side estimate landed within 8% = 5σ of its exact count and the
    * derived overlap within 12% of the exact overlap (inclusion–
    * exclusion compounds ~3 sketch errors) (measured worst: sides
    * 0.81%, overlap 0.61% across three SFs — SketchProbe).
    * SketchesSpec bounds the raw estimates. */
  /** The raw estimates incl. the derived `est_overlap` (spec surface). */
  private[graft] def q98RawEstimates(spark: SparkSession, dir: String): DataFrame = {
    val oKeys = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val cKeys = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val sk = oKeys.agg(hll_sketch_agg(col("k")).as("sk"))
      .unionAll(cKeys.agg(hll_sketch_agg(col("k")).as("sk")))
    val ests = oKeys.agg(
        hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est_orders"),
        countDistinct(col("k")).as("exact_orders_keys"))
      .crossJoin(cKeys.agg(
        hll_sketch_estimate(hll_sketch_agg(col("k"))).as("est_customer"),
        countDistinct(col("k")).as("exact_customer_keys")))
      .crossJoin(sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_union")))
    val exact = cKeys.join(oKeys, cKeys("k") === oKeys("k"), "left_semi")
      .agg(countDistinct(col("k")).as("exact_overlap"))
    ests.crossJoin(exact)
      .withColumn("est_overlap",
        col("est_orders") + col("est_customer") - col("est_union"))
  }

  def q98JoinCardEstimate(spark: SparkSession, dir: String): DataFrame =
    q98RawEstimates(spark, dir)
      .select(col("exact_orders_keys"), col("exact_customer_keys"),
        col("exact_overlap"),
        when(inBounds(col("est_orders"), col("exact_orders_keys"), 0.08) === 1
          && inBounds(col("est_customer"), col("exact_customer_keys"), 0.08) === 1,
          1).otherwise(0).cast("int").as("sides_in_bounds"),
        inBounds(col("est_overlap"), col("exact_overlap"), 0.12).as("overlap_in_bounds"))

  val q98Sql: String =
    """SELECT
      |  (SELECT count(DISTINCT o_custkey) FROM orders) AS exact_orders_keys,
      |  (SELECT count(DISTINCT c_custkey) FROM customer) AS exact_customer_keys,
      |  (SELECT count(DISTINCT c_custkey) FROM customer
      |     WHERE c_custkey IN (SELECT o_custkey FROM orders)) AS exact_overlap,
      |  1 AS sides_in_bounds, 1 AS overlap_in_bounds""".stripMargin

  // --------------------------------------------------------------- q125
  /** Mergeable QUANTILE sketch (Datasketches KLL) — the percentile
    * dashboard at 100 TB, completing the mergeable-state family (q91
    * counts distinct, q104 finds frequent items, q39 is the exact
    * one-shot; THIS holds the whole distribution as persistable
    * state): per-slice KLL sketches of lineitem price are built in ONE
    * pass (one sketch per slice per partition via mapPartitions —
    * constant memory, values never leave their partition), the
    * kilobyte BLOBS are what shuffles (never prices), slice sketches
    * merge without rescanning any slice, and the global merge answers
    * p50/p95 next to the exact interpolated percentiles. base ∪ delta
    * dashboards update in O(sketch), exactly q91's story extended from
    * cardinality to distribution shape.
    *
    * Determinism note (why the face is shaped this way): unlike HLL's
    * hash registers, KLL compaction draws random bits, so the raw
    * estimate varies run to run inside its rank error (k=200 →
    * normalized rank error ≈1.65% at 99% conf, σ≈0.64% — Cormode et
    * al., "Relative Error Streaming Quantiles" lineage; the
    * Datasketches KLL docs publish the table). The audit face is
    * gate-deterministic anyway: the in-bounds flags use a ±8%-of-rank
    * envelope (≈12σ — a flip is astronomically rarer than q40's 5σ
    * faces), and the sketch's total COUNT — which KLL tracks exactly —
    * must equal the scanned row count EXACTLY, pinning the per-slice
    * build + both merge layers deterministically (a lost partition, a
    * double-merged blob, or a dropped slice shifts the count and fails
    * the gate outright). SketchesSpec bounds the raw estimates tightly
    * and proves blob-merge associativity under forced repartitions. */
  private[graft] val kllK = 200

  private[graft] def kllHeapify(b: Array[Byte]) =
    org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(b))

  private[graft] def kllMergeBlobs(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val m = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(kllK)
      m.merge(kllHeapify(a))
      m.merge(kllHeapify(b))
      m.toByteArray
    }

  /** Blob-level KLL union: input rows are already serialized sketches
    * (one per slice-per-partition), so the per-row heapify cost is
    * O(#blobs), not O(#values) — the UDAF never sees a raw price. */
  object KllMergeAgg extends org.apache.spark.sql.expressions.Aggregator[
      Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] =
      kllMergeBlobs(b, a)
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      kllMergeBlobs(x, y)
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** One KLL sketch per slice per partition over (slice, value) rows —
    * the per-partition build kernel (one pass, constant memory, values
    * never leave their partition; the returned blobs are what
    * shuffles). Shared by q125 and the spec's forced-repartition
    * mergeability leg so both exercise the SAME builder. */
  private[graft] def sliceBlobs(
      rows: org.apache.spark.sql.Dataset[(String, Double)]): DataFrame = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      val sks = scala.collection.mutable.HashMap
        .empty[String, org.apache.datasketches.kll.KllDoublesSketch]
      it.foreach { case (s, v) =>
        sks.getOrElseUpdate(s, org.apache.datasketches.kll
          .KllDoublesSketch.newHeapInstance(kllK)).update(v)
      }
      sks.iterator.map { case (s, sk) => (s, sk.toByteArray) }
    }.toDF("slice", "blob")
  }

  /** The per-slice sketch blobs — the persisted dashboard state (spec
    * surface; q125 merges these). One row per (slice × partition). */
  private[graft] def q125SliceBlobs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sliceBlobs(Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("slice"),
        col("l_extendedprice").cast("double").as("v"))
      .as[(String, Double)])
  }

  /** DISTRIBUTED exact interpolated quantiles — the audit's reference
    * values computed the way 100 TB allows: Spark's built-in
    * `percentile` is exact but its final merge materializes the whole
    * value-count map on ONE reducer (measured 2.5 s of q125's 2.9 s at
    * sf0.1 — and an outage, not a query, at 100 TB). Here the column
    * is range-SORTED (parallel shuffle), ranks are assigned with
    * `zipWithIndex` (one partition-size pass), and only the ≤2·|ps|
    * boundary values at ranks ⌊(n−1)p⌋/⌈(n−1)p⌉ are collected —
    * driver traffic is a dozen doubles regardless of corpus size.
    * Interpolation matches `percentile`/`quantile_cont`'s (n−1)p
    * convention. Returns (row count, quantile per p). */
  private[graft] def exactQuantilesDistributed(df: DataFrame,
      valueCol: String, ps: Seq[Double]): (Long, Seq[Double]) = {
    val sorted = df.select(col(valueCol).cast("double")).rdd
      .map(_.getDouble(0)).sortBy(identity).zipWithIndex().map(_.swap)
    // MEMORY_AND_DISK, not cache(): the ranked column is the whole
    // corpus — at the sizes this kernel exists for it must spill, not
    // recompute the range-sort on the second pass (or OOM an executor).
    sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = sorted.count()
      require(n > 0, s"exact quantiles over an empty $valueCol")
      val hs = ps.map(p => (p, (n - 1) * p))
      val needed = hs.flatMap { case (_, h) =>
        Seq(math.floor(h).toLong, math.ceil(h).toLong) }.toSet
      val picked = sorted.filter(kv => needed.contains(kv._1))
        .collect().toMap // ≤ 2·|ps| entries by construction
      (n, hs.map { case (_, h) =>
        val (lo, hi) = (math.floor(h).toLong, math.ceil(h).toLong)
        picked(lo) + (h - lo) * (picked(hi) - picked(lo))
      })
    } finally { sorted.unpersist(); () }
  }

  /** Raw merged estimates + exact references (spec surface). The exact
    * quantiles are computed eagerly (bounded: a dozen doubles reach the
    * driver) and enter the frame as literals — no join, so the audit
    * face is the sketch aggregation's own 1-row plan. */
  private[graft] def q125RawEstimates(spark: SparkSession, dir: String): DataFrame = {
    val kllMerge = udaf(KllMergeAgg)
    val (nRows, ex) = exactQuantilesDistributed(
      Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
    val perSlice = q125SliceBlobs(spark, dir)
      .groupBy(col("slice")).agg(kllMerge(col("blob")).as("sk"))
    perSlice.agg(
        kllMerge(col("sk")).as("sk"),
        count(lit(1)).as("slices"))
      .select(col("slices"),
        kllNUdf(col("sk")).as("sketch_n"),
        kllQuantilesUdf(col("sk"),
          typedLit(Seq(0.5, 0.95))).as("est"))
      .select(col("slices"), col("sketch_n"),
        element_at(col("est"), 1).as("est_p50"),
        element_at(col("est"), 2).as("est_p95"),
        lit(nRows).as("n_rows"),
        typedLit(ex).as("ex"))
  }

  def q125QuantileSketchMerge(spark: SparkSession, dir: String): DataFrame =
    q125RawEstimates(spark, dir)
      .select(col("n_rows"), col("slices"),
        // +1e-9 like q126: nudges values off exact .005 boundaries where
        // Spark's HALF_UP and DuckDB's rounding could disagree.
        round(element_at(col("ex"), 2) + 1e-9, 2).as("exact_p50"),
        round(element_at(col("ex"), 5) + 1e-9, 2).as("exact_p95"),
        when(col("sketch_n") === col("n_rows"), 1).otherwise(0)
          .cast("int").as("merged_count_exact"),
        when(col("est_p50").between(
          element_at(col("ex"), 1), element_at(col("ex"), 3)), 1)
          .otherwise(0).cast("int").as("p50_in_bounds"),
        when(col("est_p95").between(
          element_at(col("ex"), 4), element_at(col("ex"), 6)), 1)
          .otherwise(0).cast("int").as("p95_in_bounds"))

  val q125Sql: String =
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_returnflag) AS slices,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) + 1e-9, 2) AS exact_p50,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) + 1e-9, 2) AS exact_p95,
      |  1 AS merged_count_exact, 1 AS p50_in_bounds, 1 AS p95_in_bounds
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q126
  /** EXACT global quantiles, distributed — [[exactQuantilesDistributed]]
    * as a first-class query rather than q125's audit reference. q39's
    * built-in `percentile` is the right tool for bounded per-group
    * buffers; for a GLOBAL exact quantile over one huge column its
    * final merge concentrates the whole value-count map on one reducer.
    * This form pays a parallel range-sort + one rank-lookup pass
    * instead and ships a dozen doubles to the driver at any corpus
    * size (measured 10× data → ~2.1× wall in q125's kernel point).
    * Unlike the sketch faces, the oracle here is STRICT value
    * equality: the same (n−1)p interpolation DuckDB's quantile_cont
    * computes, hash-matched to 2dp. */
  def q126ExactQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val (nRows, ex) = exactQuantilesDistributed(
      Tables.lineitem(spark, dir), "l_extendedprice", ps)
    import spark.implicits._
    Seq((nRows, ex(0), ex(1), ex(2), ex(3))).toDF(
        "n_rows", "raw25", "raw50", "raw75", "raw95")
      .select(col("n_rows"),
        round(col("raw25") + 1e-9, 2).as("p25"),
        round(col("raw50") + 1e-9, 2).as("p50"),
        round(col("raw75") + 1e-9, 2).as("p75"),
        round(col("raw95") + 1e-9, 2).as("p95"))
  }

  val q126Sql: String =
    """SELECT count(*) AS n_rows,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) + 1e-9, 2) AS p25,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) + 1e-9, 2) AS p50,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) + 1e-9, 2) AS p75,
      |  round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) + 1e-9, 2) AS p95
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q127
  /** q125's dashboard state made DURABLE (r14 verdict ask #3): the
    * per-slice KLL blobs published as a bucketed warehouse table under
    * [[graft.sources.Published]]'s marker/manifest/lease discipline —
    * the same lifecycle the ANN index got (q120 serve / q124 compact),
    * applied to the mergeable-quantile family. The table holds one row
    * per (slice × segment): the slice's KLL blob over the half-open
    * l_orderkey window [lo, hi), its EXACT row count (KLL tracks n
    * exactly), and the window bounds. Bootstrap publishes the base
    * window [0, cut), cut = ⌊(max+1)·4/5⌋; every later call appends
    * ONLY the window past the table's own high-water mark — O(delta)
    * build (the range predicate reaches the parquet scan; at scale
    * row-group stats skip the base), kilobytes stored — then re-stamps
    * the marker's manifest exactly like q124's compaction commit. An
    * up-to-date table appends nothing and the call is a pure
    * blob-table read.
    *
    * The SERVE path ([[kllServeFromSegments]]) reads ONLY stored blobs
    * — base ∪ delta quantiles without rescanning base (the 100 TB
    * story: the corpus is petabytes, the blob table is kilobytes);
    * Q127 spec pins the executed serve plan's scan set to the
    * published table's files. The FACE then recomputes the exact
    * envelope from the corpus once — that scan is the correctness
    * gate's reference (same discipline as q125), not the dashboard
    * read path. Restart-attach is probed cross-JVM by
    * tools/fault_probes.sh's final fault-free pass (a fresh JVM
    * attaches the published segments and serves). */
  private[graft] val kllTableBuckets = 4

  private[graft] def kllTableName(dir: String): String =
    s"graft_kllq_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"

  private def kllFingerprint(dir: String): String =
    graft.sources.Published.fingerprint(dir,
      Seq(new org.apache.hadoop.fs.Path(dir, "lineitem.parquet")))

  /** The base/delta split point, cut = ⌊(max+1)·4/5⌋ over l_orderkey —
    * ONE copy (r16 review finding #5: q127's bootstrap, the streaming
    * twin's, and the bench stager each derived it; a diverging copy
    * silently double-counts the overlap window in a streamed
    * dashboard). One full-column max — the bootstrap's price. */
  private[graft] def kllBaseCut(spark: SparkSession, dir: String): Long = {
    val maxKey = Tables.lineitem(spark, dir)
      .agg(max(col("l_orderkey"))).head.getLong(0)
    (maxKey + 1L) * 4L / 5L
  }

  // intra-JVM publish serialization per table (Similarity.publishLock's
  // pattern): same-JVM racers queue on the monitor, cross-JVM exclusion
  // is the file lease's job
  private val kllPublishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[graft] def kllPublishLock(tbl: String): Object =
    kllPublishLocks.computeIfAbsent(tbl, _ => new Object)

  private[graft] lazy val kllNUdf =
    udf((b: Array[Byte]) => kllHeapify(b).getN)

  /** ONE deserialize-and-query kernel for every KLL face (q125's audit,
    * q127's published serve) — review finding r15: per-site copies of
    * this UDF risked the serve path silently diverging from the audit
    * path it documents itself as mirroring. */
  private[graft] lazy val kllQuantilesUdf =
    udf((b: Array[Byte], ps: Seq[Double]) => {
      val sk = kllHeapify(b)
      ps.map(p => sk.getQuantile(p,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
    })

  /** One published SEGMENT: per-slice KLL blob + exact count over the
    * l_orderkey window [lo, hi) — one corpus pass over the window, one
    * kilobyte-row per slice out. */
  private[graft] def kllSegment(spark: SparkSession, dir: String,
                                lo: Long, hi: Long): DataFrame = {
    import spark.implicits._
    val kllMerge = udaf(KllMergeAgg)
    sliceBlobs(Tables.lineitem(spark, dir)
        .filter(col("l_orderkey") >= lo && col("l_orderkey") < hi)
        .select(col("l_returnflag").as("slice"),
          col("l_extendedprice").cast("double").as("v"))
        .as[(String, Double)])
      .groupBy(col("slice"))
      .agg(kllMerge(col("blob")).as("blob"))
      .select(col("slice"), col("blob"), kllNUdf(col("blob")).as("n"),
        lit(lo).as("lo"), lit(hi).as("hi"))
  }

  /** Attach-or-build + catch-up append of the blob table; returns the
    * catalog frame. Single writer per table cross-JVM (lease), waiting
    * out rivals with the serve paths' budget; the append's commit is
    * the manifest re-stamp — an appender dying (or losing its lease)
    * between the append job and the stamp leaves an unaccounted
    * segment that [[graft.sources.Published.ensure]] refuses to serve,
    * and the next call rebuilds (the table is derived state). */
  private[graft] def publishedKllSegments(spark: SparkSession,
                                          dir: String): DataFrame = {
    val tbl = kllTableName(dir)
    val fp = kllFingerprint(dir)
    val loc = graft.sources.Published.tableLoc(spark, tbl)
    kllPublishLock(tbl).synchronized {
      graft.sources.Published.withLeaseAwaiting(loc, s"kllq:$tbl") {
        if (!graft.sources.Published.ensure(
            spark, tbl, "slice", kllTableBuckets, fp)) {
          graft.sources.Published.write(spark, tbl, "slice", kllTableBuckets,
            fp, kllSegment(spark, dir, 0L, kllBaseCut(spark, dir)))
        }
        val hwRow = spark.table(tbl).agg(max(col("hi"))).head
        val hw = if (hwRow.isNullAt(0)) 0L else hwRow.getLong(0)
        // catch-up detection is O(delta), q124's shape: max over the
        // hw-bounded scan (the predicate reaches parquet, so row-group
        // stats skip the base) — NOT a full-column max per call, which
        // would make "an up-to-date table is a pure blob read" false
        val deltaMaxRow = Tables.lineitem(spark, dir)
          .filter(col("l_orderkey") >= hw)
          .agg(max(col("l_orderkey"))).head
        if (!deltaMaxRow.isNullAt(0)) {
          val top = deltaMaxRow.getLong(0) + 1L
          // commit gates bracket the append exactly like q124: abort
          // BEFORE appending over a rival's writes, and if the append
          // job itself overran the lease, fail BEFORE the re-stamp so
          // the unaccounted segment can never be served
          graft.sources.Published.assertLeaseOwned(loc)
          kllSegment(spark, dir, hw, top)
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .bucketBy(kllTableBuckets, "slice").sortBy("slice")
            .format("parquet").saveAsTable(tbl)
          try graft.sources.Published.assertLeaseOwned(loc)
          catch { case e: graft.sources.Published.LeaseLost =>
            throw new graft.sources.Published.LeaseLost(e.getMessage +
              s"; the append itself overran the lease — `$tbl`'s marker was " +
              "NOT re-stamped, so the unaccounted segment is never served " +
              "and the next call rebuilds clean")
          }
          graft.sources.Published.restampManifest(spark, tbl)
        }
      }
    }
    spark.table(tbl)
  }

  /** The dashboard read path — STORED BLOBS ONLY (no corpus column in
    * this plan; Q127 spec pins the executed scan set): per-slice blob
    * union, then the global union, O(#segments) kilobyte merges. */
  private[graft] def kllServeFromSegments(segments: DataFrame): DataFrame = {
    val kllMerge = udaf(KllMergeAgg)
    segments.groupBy(col("slice"))
      .agg(kllMerge(col("blob")).as("sk"), sum(col("n")).as("n_slice"))
      .agg(kllMerge(col("sk")).as("sk"),
        sum(col("n_slice")).as("n_rows"),
        count(lit(1)).as("slices"))
      .select(col("n_rows"), col("slices"),
        kllNUdf(col("sk")).as("sketch_n"),
        kllQuantilesUdf(col("sk"), typedLit(Seq(0.5, 0.95))).as("est"))
      .select(col("n_rows"), col("slices"), col("sketch_n"),
        element_at(col("est"), 1).as("est_p50"),
        element_at(col("est"), 2).as("est_p95"))
  }

  def q127PublishedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val segs = publishedKllSegments(spark, dir)
    // base/delta split from stored segment METADATA (k rows, eager —
    // literals keep the face join-free, q125's discipline)
    val meta = segs.agg(
      sum(when(col("lo") === 0L, col("n")).otherwise(0L)).as("n_base"),
      sum(when(col("lo") > 0L, col("n")).otherwise(0L)).as("n_delta")).head
    val nBase = if (meta.isNullAt(0)) 0L else meta.getLong(0)
    val nDelta = if (meta.isNullAt(1)) 0L else meta.getLong(1)
    // the gate's reference: exact envelope + fresh count, recomputed
    // from the corpus (the one place the face touches lineitem)
    val (nFresh, ex) = exactQuantilesDistributed(
      Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
    kllServeFromSegments(segs).select(
      col("n_rows"),
      lit(nBase).as("n_base"),
      lit(nDelta).as("n_delta"),
      col("slices"),
      when(col("n_rows") === lit(nFresh) &&
          col("sketch_n") === lit(nFresh), 1)
        .otherwise(0).cast("int").as("count_exact"),
      when(col("est_p50").between(
        lit(ex(0)), lit(ex(2))), 1).otherwise(0).cast("int").as("p50_in_bounds"),
      when(col("est_p95").between(
        lit(ex(3)), lit(ex(5))), 1).otherwise(0).cast("int").as("p95_in_bounds"))
  }

  val q127Sql: String =
    """SELECT count(*) AS n_rows,
      |  count(*) FILTER (WHERE l_orderkey <
      |    (SELECT (max(l_orderkey)+1)*4//5 FROM lineitem)) AS n_base,
      |  count(*) FILTER (WHERE l_orderkey >=
      |    (SELECT (max(l_orderkey)+1)*4//5 FROM lineitem)) AS n_delta,
      |  count(DISTINCT l_returnflag) AS slices,
      |  1 AS count_exact, 1 AS p50_in_bounds, 1 AS p95_in_bounds
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q128
  /** The streaming dashboard's MINOR COMPACTION as an oracle-gated face
    * — q124's story for the quantile family, over
    * [[graft.streaming.KllPublish]]'s generation-committed segment
    * store. Without compaction the store (and the table derived from
    * it) grows one kilobyte segment per slice per batch forever: at a
    * year of triggers the "kilobyte store" is an O(batches) listing and
    * every serve merges O(batches) blobs. Merging is what KLL sketches
    * are FOR — this query builds the store deterministically (base
    * window + three delta batches split by orderkey residue: the
    * stream's shape without a stream), compacts, and serves. After
    * compaction the store holds ONE merged segment per slice
    * (`segments` == `slices`), the serve merges O(slices) blobs, and
    * the counts stay EXACT across the merge (KLL tracks n exactly — a
    * dropped or doubled batch shifts them and fails the gate). Every
    * re-call is the no-op lifecycle: bootstrap is flag-gated, the
    * batches sit at or below the compacted high-water (replay-skipped),
    * and a single-batch store no-ops the compactor. */
  def q128CompactedDashboard(spark: SparkSession, dir: String): DataFrame = {
    val segDir = graft.sources.Published.tableLoc(spark,
      s"graft_kllqs_store_${java.lang.Long.toHexString(
        graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}").toString
    val cut = graft.streaming.KllPublish.bootstrapBase(spark, dir, segDir)
    val delta = graft.streaming.KllPublish.deltaFrame(spark, dir, cut)
    (0L to 2L).foreach(i => graft.streaming.KllPublish.processBatch(
      spark, segDir, delta.filter(pmod(col("l_orderkey"), lit(3)) === i), i))
    graft.streaming.KllPublish.compactSegments(spark, segDir)
    val segRows = graft.streaming.KllPublish.readSegments(spark, segDir).count()
    val (nFresh, ex) = exactQuantilesDistributed(
      Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
    graft.streaming.KllPublish.attachServe(spark, segDir).select(
      col("n_rows"),
      col("slices"),
      lit(segRows).as("segments"),
      when(col("n_rows") === lit(nFresh) &&
          col("sketch_n") === lit(nFresh), 1)
        .otherwise(0).cast("int").as("count_exact"),
      when(col("est_p50").between(lit(ex(0)), lit(ex(2))), 1)
        .otherwise(0).cast("int").as("p50_in_bounds"),
      when(col("est_p95").between(lit(ex(3)), lit(ex(5))), 1)
        .otherwise(0).cast("int").as("p95_in_bounds"))
  }

  val q128Sql: String =
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_returnflag) AS slices,
      |  count(DISTINCT l_returnflag) AS segments,
      |  1 AS count_exact, 1 AS p50_in_bounds, 1 AS p95_in_bounds
      |FROM lineitem""".stripMargin

  // --------------------------------------------------------------- q129
  /** The SELF-COMPACTING streaming dashboard (r16 verdict ask #1 made
    * oracle-gated): [[graft.streaming.KllPublish.kllPublishedSink]]
    * with its compaction CADENCE on — the sink itself folds the
    * segment store every compactEvery batches, inside the trigger's
    * already-held lease, so the production story ("a year of
    * triggers") ends in an O(slices) store without any out-of-band
    * compactor. The delta window streams as 5 one-batch files with
    * compactEvery=2: compactions fire mid-stream at batches 2 and 4,
    * batch 3 appends PAST a compaction, and batch 4 — the last — folds
    * everything, so the terminal store holds exactly one merged
    * segment per slice under a single batch id and the published
    * table serves O(slices) rows. Counts stay EXACT across both folds
    * (KLL tracks n exactly — a batch lost to a compaction racing its
    * append shifts them and fails the gate). The whole lifecycle is
    * replay-idempotent: the store, checkpoint, and staged source are
    * warehouse-keyed, the source stages once (fresh part-file names
    * would read as NEW files to the same checkpoint and double-ingest
    * the delta), and a re-call's AvailableNow drain processes nothing. */
  def q129SelfCompactingStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.KllPublish
    val h = java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))
    def loc(kind: String): String = graft.sources.Published.tableLoc(
      spark, s"graft_kllqs_cad_${kind}_$h").toString
    val segDir = loc("store")
    val cut = KllPublish.bootstrapBase(spark, dir, segDir)
    val src = loc("src")
    val srcSuccess = new org.apache.hadoop.fs.Path(src, "_SUCCESS")
    val fs = srcSuccess.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(srcSuccess))
      KllPublish.stageDelta(spark, dir, src, cut, files = 5)
    val in = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = KllPublish.kllPublishedSink(in, segDir, loc("ckpt"),
      compactEvery = 2)
    try require(q.awaitTermination(180000L), "q129 stream timed out")
    finally q.stop()
    val segs = KllPublish.readSegments(spark, segDir)
    val segRows = segs.count()
    val storeBatches = segs.select(col("batch")).distinct().count()
    // attach BEFORE the table-row lookup: on the replay path (store
    // already built, zero new batches — e.g. a fresh JVM over a
    // persisted warehouse) only attachServe's ensure registers the
    // published table in this session's catalog
    val served = KllPublish.attachServe(spark, segDir)
    val tableRows = spark.table(KllPublish.tableName(segDir)).count()
    val (nFresh, ex) = exactQuantilesDistributed(
      Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(0.42, 0.5, 0.58, 0.87, 0.95, 1.0))
    served.select(
      col("n_rows"),
      col("slices"),
      lit(segRows).as("segments"),
      lit(storeBatches).as("store_batches"),
      lit(tableRows).as("table_rows"),
      when(col("n_rows") === lit(nFresh) &&
          col("sketch_n") === lit(nFresh), 1)
        .otherwise(0).cast("int").as("count_exact"),
      when(col("est_p50").between(lit(ex(0)), lit(ex(2))), 1)
        .otherwise(0).cast("int").as("p50_in_bounds"),
      when(col("est_p95").between(lit(ex(3)), lit(ex(5))), 1)
        .otherwise(0).cast("int").as("p95_in_bounds"))
  }

  val q129Sql: String =
    """SELECT count(*) AS n_rows,
      |  count(DISTINCT l_returnflag) AS slices,
      |  count(DISTINCT l_returnflag) AS segments,
      |  CAST(1 AS BIGINT) AS store_batches,
      |  count(DISTINCT l_returnflag) AS table_rows,
      |  1 AS count_exact, 1 AS p50_in_bounds, 1 AS p95_in_bounds
      |FROM lineitem""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_percentiles"     -> q39Percentiles _,
    "q40_approx_distinct" -> q40ApproxDistinct _,
    "q59_profile"         -> q59Profile _,
    "q91_sketch_merge"    -> q91SketchMerge _,
    "q98_join_card_estimate" -> q98JoinCardEstimate _,
    "q125_quantile_sketch_merge" -> q125QuantileSketchMerge _,
    "q126_exact_quantiles" -> q126ExactQuantiles _,
    "q127_published_quantiles" -> q127PublishedQuantiles _,
    "q128_compacted_dashboard" -> q128CompactedDashboard _,
    "q129_selfcompacting_stream" -> q129SelfCompactingStream _,
  )

  val oracle: Map[String, String] = Map(
    "q39_percentiles"     -> q39Sql,
    "q40_approx_distinct" -> q40Sql,
    "q59_profile"         -> q59Sql,
    "q91_sketch_merge"    -> q91Sql,
    "q98_join_card_estimate" -> q98Sql,
    "q125_quantile_sketch_merge" -> q125Sql,
    "q126_exact_quantiles" -> q126Sql,
    "q127_published_quantiles" -> q127Sql,
    "q128_compacted_dashboard" -> q128Sql,
    "q129_selfcompacting_stream" -> q129Sql,
  )
}
