package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators — the write-side half of the 100 TB design
  * (SURVEY §7.2 step 7).
  *
  * Two layouts, matching the reference's physical intent:
  *  - **Partitioned**: the reference's per-region Kafka topics
  *    (`regionSpout.go:156-160`) are partition-by-region; at rest that is
  *    `partitionBy(region, date)` so every regional/temporal query prunes
  *    to the partitions it touches instead of scanning the lake.
  *  - **Bucketed**: fact⋈fact joins (orders⋈lineitem) shuffle both sides
  *    on the key unless the tables are pre-bucketed on it; bucketed +
  *    sorted tables make the join a zero-exchange sort-merge join — at
  *    100 TB this converts the single most expensive shuffle into a local
  *    merge.
  */
object Layout {

  /** Partition events by (region, date): the at-rest twin of per-region
    * topic routing. Queries filtering on region/date prune partitions —
    * verified by LayoutSpec via the scan's partitionFilters. */
  def writePartitionedEvents(spark: SparkSession, dir: String, outPath: String): Unit = {
    import graft.operators.Geo
    Geo.assignRegion(spark, Tables.events(spark, dir))
      .withColumn("date", to_date(col("ts")))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("region", "date")
      .parquet(outPath)
  }

  /** Bucket both fact tables by the join key (+ sort within buckets):
    * orders⋈lineitem then needs no exchange on either side. */
  def bucketizeFacts(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    // attach-or-build (round 11, the Published machinery the ANN index
    // tables share): re-clustering the fact tables is the 100 TB-scale
    // cost here — a per-JVM rewrite was acceptable only at test scale.
    // A new JVM re-declares the already-bucketed files when the marker
    // matches (same source snapshot, same bucket layout) and rewrites
    // only when the facts or the requested layout changed. The
    // fingerprint folds in the source dir and bucket count, so
    // switching corpora or re-bucketizing at a different count rebuilds
    // — ensure() drops a same-named catalog entry serving any OTHER
    // request rather than serving it.
    def publishFact(tbl: String, key: String, src: String,
                    build: => org.apache.spark.sql.DataFrame): Unit =
      Published.attachOrBuild(spark, tbl, key, buckets,
        Published.fingerprint(s"$dir#$buckets",
          Seq(new org.apache.hadoop.fs.Path(dir, src))))(build)
    publishFact("orders_bucketed", "o_orderkey", "orders.parquet",
      Tables.orders(spark, dir))
    publishFact("lineitem_bucketed", "l_orderkey", "lineitem.parquet",
      Tables.lineitem(spark, dir))
  }

  /** CSV round-trip with explicit schema (headers on, ISO timestamps):
    * the interchange format for anything that isn't columnar yet. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", true)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** JSON-lines round-trip — the reference's native wire format
    * (`regionSpout.go:152` ships JSON bytes). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Dynamic partition overwrite — the idempotent backfill write: only
    * the partitions PRESENT in `df` are replaced; sibling partitions are
    * untouched. This is how a daily re-run repairs one (region, date)
    * slice of a 100 TB lake without rewriting (or even listing) the
    * rest. Static overwrite (the default) would truncate the whole
    * table root. */
  def overwritePartitions(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*)
      .parquet(path)

  /** Small-file compaction: rewrite a dataset at `targetFiles` files.
    * Deliberately an out-of-place copy (`inPath` → `outPath`): Spark
    * reads lazily, so overwriting the path being read drops the data —
    * the swap to the live path is the caller's atomic rename/pointer
    * flip, exactly how table formats sequence commits. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFiles: Int): Unit =
    spark.read.parquet(inPath)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)

  /** ORC round-trip — the other columnar lake format; same pushdown /
    * pruning contract as parquet (LayoutSpec asserts PushedFilters reach
    * the ORC scan too). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** The co-located join: revenue per order across the two bucketed facts.
    * With matching bucket counts on the join keys, the physical plan has
    * no ShuffleExchange before the join. */
  def colocatedOrderRevenue(spark: SparkSession): DataFrame =
    spark.table("lineitem_bucketed")
      .join(spark.table("orders_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      // +1e-9 before round: per-ORDER sums of 4-decimal products land on
      // .xx5 half-cent boundaries where the two engines' last-bit float
      // error rounds opposite ways; the nudge (≫ the ~1e-10 sum error,
      // applied in the oracle too) pushes both sides off the boundary.
      // Nation-level sums (q06) never hit this — order-level sums do.
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) + 1e-9, 2)
        .as("revenue"))

  /** Per-SERVE attach-or-build — NOT a per-session memo. The table
    * WRITE still happens at most once per warehouse generation
    * (attachOrBuild attaches on marker match; repeat calls pay only
    * the fingerprint + ensure metadata LISTs, the same RPC class as
    * Spark's own file-index refresh), but the per-serve ensure() is
    * load-bearing: it is what re-checks the manifest and refreshes a
    * relation whose files a FOREIGN JVM's republish swapped since this
    * session last planned it. The r11-era once-per-session memo here
    * bypassed exactly that — ServeLoop's final serve, landing after
    * its memoized first bucketize while the republish hammer was still
    * swapping, replayed a retired generation's cached listing through
    * all 60 of its retries (r15 s3 leg-3 rerun) because nothing on the
    * memoized path ever re-listed. Every other published-table serve
    * (q120-q124, q127) already runs ensure() per call for this reason;
    * q50 now does too. */
  def ensureBucketized(spark: SparkSession, dir: String): Unit =
    bucketizeFacts(spark, dir)

  /** q50: the bucketed co-located fact⋈fact join, driver-gated. The
    * oracle is the plain lineitem⋈orders SQL — bucketing must change the
    * PLAN (no exchange before the join; LayoutSpec asserts it), never the
    * answer. */
  def q50BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    ensureBucketized(spark, dir)
    colocatedOrderRevenue(spark).orderBy(col("o_orderkey"))
  }

  val q50Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderkey, o_orderpriority
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Zone-map (min/max data-skipping) audit: the SAME rows chunked two
    * ways — by insertion order (orderkey ranges, a write-path accident)
    * and by ship month (the clustered layout a lakehouse compaction
    * would choose) — and for each layout, how many chunks and rows the
    * per-chunk min/max shipdate statistics let a
    * `shipdate ∈ [1996-01-01, 1996-04-01)` scan SKIP without reading.
    * This is the maintenance decision behind every parquet row-group /
    * Delta file-stats prune: zone maps are only as good as the
    * physical clustering, and the two summary rows quantify exactly
    * that — insertion-order chunks straddle the whole date range (skip
    * ≈ 0) while month-clustered chunks skip everything outside the
    * predicate. One scan per layout, two tiny aggregations; the chunk
    * stats ARE what the engine would persist as file-footer metadata. */
  /** Shared zone-map audit scaffolding (q77, q88): from per-chunk rows
    * carrying (layout, n_rows, skippable), the 4-column skip summary. */
  private def zoneSummary(perChunk: DataFrame): DataFrame =
    perChunk.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("skippable"), 1L).otherwise(0L)).as("n_skippable"),
        sum(col("n_rows")).as("rows_total"),
        sum(when(col("skippable"), col("n_rows")).otherwise(0L)).as("rows_skippable"))

  /** SQL twin of [[zoneSummary]]: wraps a per-chunk subselect producing
    * (n_rows, sk) into the same 4-column summary. */
  private def zoneSummarySql(label: String, chunkStats: String): String =
    s"""SELECT '$label' AS layout, count(*) AS n_chunks,
       |  sum(CASE WHEN sk THEN 1 ELSE 0 END)::BIGINT AS n_skippable,
       |  sum(n_rows)::BIGINT AS rows_total,
       |  sum(CASE WHEN sk THEN n_rows ELSE 0 END)::BIGINT AS rows_skippable
       |FROM ($chunkStats)""".stripMargin

  def q77ZonemapSkip(spark: SparkSession, dir: String): DataFrame = {
    // to_timestamp under the session timezone (pinned UTC) — NOT
    // java.sql.Timestamp.valueOf, which parses in the JVM default zone
    // and would shift the bounds against DuckDB's naive TIMESTAMP
    // literal on any non-UTC machine
    val lo = to_timestamp(lit("1996-01-01 00:00:00"))
    val hi = to_timestamp(lit("1996-04-01 00:00:00"))
    def audit(chunk: org.apache.spark.sql.Column, label: String) =
      zoneSummary(Tables.lineitem(spark, dir)
        .groupBy(chunk.as("chunk"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_shipdate")).as("mn"), max(col("l_shipdate")).as("mx"))
        .select(lit(label).as("layout"), col("n_rows"),
          (col("mx") < lo || col("mn") >= hi).as("skippable")))
    audit(expr("l_orderkey div 4096"), "by_orderkey")
      .union(audit(expr("year(l_shipdate) * 100 + month(l_shipdate)"), "by_shipmonth"))
      .orderBy(col("layout"))
  }

  val q77Sql: String = {
    def chunkStats(chunk: String) =
      s"""SELECT $chunk AS chunk, count(*) AS n_rows,
         |    (max(l_shipdate) < TIMESTAMP '1996-01-01'
         |      OR min(l_shipdate) >= TIMESTAMP '1996-04-01') AS sk
         |  FROM lineitem GROUP BY 1""".stripMargin
    s"""${zoneSummarySql("by_orderkey", chunkStats("l_orderkey // 4096"))}
       |UNION ALL ${zoneSummarySql("by_shipmonth",
           chunkStats("year(l_shipdate) * 100 + month(l_shipdate)"))}
       |ORDER BY layout""".stripMargin
  }

  // ---------------------------------------------------------------- q85
  /** Incremental aggregate maintenance (the materialized-view refresh
    * contract): per order status, the aggregate produced by MERGING a
    * precomputed base partial (orders before 1997) with a delta partial
    * (the rest) — alongside an in-query proof that the merged state
    * equals the full recompute. This is how a 100 TB rollup actually
    * stays fresh: yesterday's partials are stored state, only the new
    * partition is aggregated, and merge = sum of partials — valid
    * precisely because count/sum are commutative monoids (min/max too;
    * avg must ship as (sum, count), never as a merged average).
    *
    * Money sums accumulate in decimal(18,2): decimal addition is EXACT
    * and therefore order-independent, so base+delta equals the full
    * recompute BIT-FOR-BIT — with double sums the matches_full check
    * would be flaky under partition reordering, which is exactly why
    * production IVM keeps partials in decimal. */
  def q85IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_timestamp(lit("1997-01-01 00:00:00"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("st"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
    def partial(df: DataFrame): DataFrame =
      df.groupBy(col("st"))
        .agg(count(lit(1)).as("n"), sum(col("price")).as("s"))
    val merged = partial(o.filter(col("o_orderdate") < cutoff))
      .union(partial(o.filter(col("o_orderdate") >= cutoff)))
      .groupBy(col("st"))
      .agg(sum(col("n")).as("n_orders"), sum(col("s")).as("total"))
    val full = partial(o)
      .select(col("st").as("f_st"), col("n").as("f_n"), col("s").as("f_s"))
    merged.join(full, col("st") === col("f_st"))
      .select(col("st"), col("n_orders"),
        col("total").cast("double").as("total"),
        (col("n_orders") === col("f_n") && col("total") === col("f_s"))
          .as("matches_full"))
      .orderBy(col("st"))
  }

  val q85Sql: String =
    """WITH base AS (SELECT o_orderstatus AS st, count(*) AS n,
      |    sum(o_totalprice::DECIMAL(18,2)) AS s
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01' GROUP BY 1),
      |delta AS (SELECT o_orderstatus AS st, count(*) AS n,
      |    sum(o_totalprice::DECIMAL(18,2)) AS s
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1),
      |merged AS (SELECT st, sum(n)::BIGINT AS n_orders, sum(s) AS total
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM delta) GROUP BY st),
      |f AS (SELECT o_orderstatus AS st, count(*) AS n,
      |    sum(o_totalprice::DECIMAL(18,2)) AS s
      |  FROM orders GROUP BY 1)
      |SELECT m.st, m.n_orders, m.total::DOUBLE AS total,
      |  (m.n_orders = f.n AND m.total = f.s) AS matches_full
      |FROM merged m JOIN f ON m.st = f.st
      |ORDER BY m.st""".stripMargin

  // ---------------------------------------------------------------- q88
  /** Z-order (Morton) clustering audit — q77's single-dimension lesson
    * extended to TWO predicate dimensions. The same lineitem rows are
    * chunked three ways: insertion order, price-sorted, and Z-ORDER
    * (native `graft_zorder` interleaves the quantity and price-bucket
    * bits, so ONE linear sort key preserves locality in BOTH
    * dimensions — the technique behind lakehouse Z-ORDER BY
    * compaction). For a conjunctive predicate
    * `qty ∈ [10,20] AND price_bucket ∈ [20,30]`, per-chunk min/max
    * stats on BOTH columns decide skippability: insertion order skips
    * nothing, price-sorting skips only on price and is blind to the
    * quantity bound, and the Morton layout skips chunks outside EITHER
    * range. The three summary rows are the measured justification for
    * multi-dimensional clustering at 100 TB. Price buckets come from
    * decimal cents (exact), so chunk assignment can't flap on double
    * rounding. */
  def q88ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    // floor() before the integral cast (Spark cast truncates, DuckDB
    // ::BIGINT rounds — floor in both engines removes the dependence on
    // quantities being integral-valued)
    val rows = Tables.lineitem(spark, dir).select(
      col("l_orderkey"),
      floor(col("l_quantity")).cast("long").as("qb"),
      expr("cast(cast(l_extendedprice AS decimal(18,2)) * 100 AS bigint) div 100000")
        .as("pb"))
    val withZ = rows.withColumn("z",
      call_function("graft_zorder", col("qb"), col("pb")))
    val hit = // chunk can contain matches only if both ranges intersect
      !(col("mx_q") < 10 || col("mn_q") > 20 || col("mx_p") < 20 || col("mn_p") > 30)
    def audit(chunk: org.apache.spark.sql.Column, label: String) =
      zoneSummary(withZ.groupBy(chunk.as("chunk"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("qb")).as("mn_q"), max(col("qb")).as("mx_q"),
          min(col("pb")).as("mn_p"), max(col("pb")).as("mx_p"))
        .select(lit(label).as("layout"), col("n_rows"), (!hit).as("skippable")))
    audit(expr("l_orderkey div 4096"), "a_by_orderkey")
      .union(audit(col("pb"), "b_by_price"))
      .union(audit(expr("z div 64"), "c_by_zorder"))
      .orderBy(col("layout"))
  }

  val q88Sql: String = {
    val morton = "list_sum(list_transform(range(0, 16), " +
      "b -> (((qb >> b) & 1) << (2*b)) + (((pb >> b) & 1) << (2*b+1))))::BIGINT"
    def auditSql(chunk: String, label: String) =
      zoneSummarySql(label,
        s"""SELECT $chunk AS chunk, count(*) AS n_rows,
           |    (max(qb) < 10 OR min(qb) > 20 OR max(pb) < 20 OR min(pb) > 30) AS sk
           |  FROM z GROUP BY 1""".stripMargin)
    s"""WITH base AS (SELECT l_orderkey, floor(l_quantity)::BIGINT AS qb,
       |    ((l_extendedprice::DECIMAL(18,2) * 100)::BIGINT) // 100000 AS pb
       |  FROM lineitem),
       |z AS (SELECT l_orderkey, qb, pb, $morton AS z FROM base)
       |${auditSql("l_orderkey // 4096", "a_by_orderkey")}
       |UNION ALL ${auditSql("pb", "b_by_price")}
       |UNION ALL ${auditSql("z // 64", "c_by_zorder")}
       |ORDER BY layout""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_bucketed_join" -> q50BucketedJoin _,
    "q77_zonemap_skip"  -> q77ZonemapSkip _,
    "q85_incremental_agg" -> q85IncrementalAgg _,
    "q88_zorder_layout" -> q88ZorderLayout _,
  )

  val oracle: Map[String, String] = Map(
    "q50_bucketed_join" -> q50Sql,
    "q77_zonemap_skip"  -> q77Sql,
    "q85_incremental_agg" -> q85Sql,
    "q88_zorder_layout" -> q88Sql,
  )
}
