package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated faces of the [[Snap]] snapshot format: a copy-on-write
  * CDC merge (q130), time travel across commits (q131), and a
  * stats-pruned range scan (q132).
  *
  * The demo lifecycle is DETERMINISTIC and warehouse-persistent, the
  * q127 discipline: the table name is keyed by the sf dir, the
  * manifest's `tag` carries the source fingerprint, and a re-run that
  * finds the finished lifecycle (head version + matching tag) attaches
  * without rebuilding — so Verify replays, bench runs, and fresh JVMs
  * all see the same three committed snapshots.
  *
  * The CDC shape is the realistic one — bucket-SPARSE deltas (a hot
  * key range updated, a range retired, new keys appended past the max)
  * against a range-layout table — because that is where copy-on-write
  * earns its keep: each merge rewrites only the 2-3 files whose key
  * range the delta touches and carries the rest of the table by
  * reference. The faces surface that as indicator columns (verified
  * against manifest metadata Spark-side, `1` literals in the oracle,
  * q127's count_exact pattern); SnapSpec pins the exact file sets. */
object SnapOps {

  /** Bag (multiset) equality in ONE Spark job (r20 optimization): the
    * `a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty` idiom the
    * lifecycle audits used costs FOUR actions, each shuffling both
    * inputs; per-row-count equality over a null-safe full-outer join
    * answers the same question in one. Column order follows `a`. */
  private[graft] def bagEqual(a: DataFrame, b: DataFrame): Boolean = {
    val cols = a.columns.toSeq
    val ac = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__graft_na"))
    val bc = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__graft_nb"))
    // null-safe join keys: exceptAll matches null cells as equal, the
    // plain equi-join would not
    val cond = cols.map(c => ac(c) <=> bc(c)).reduce(_ && _)
    ac.join(bc, cond, "full_outer")
      .filter(!(col("__graft_na") <=> col("__graft_nb")))
      .limit(1).count() == 0
  }

  private[graft] val custBuckets = 8
  private[graft] val ordBuckets = 16

  private[graft] def custTable(dir: String): String =
    s"graft_snapc_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private[graft] def ordTable(dir: String): String =
    s"graft_snapo_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"

  private def custFp(dir: String): String =
    // "snapc2": the tag versions the LIFECYCLE SHAPE too — a warehouse
    // built with the r17 pre-review absolute-bound deltas must rebuild,
    // not attach-and-mismatch the sf-relative oracle
    Published.fingerprint("snapc2",
      Seq(new HPath(dir, "customer.parquet")))
  private def ordFp(dir: String): String =
    Published.fingerprint("snapo",
      Seq(new HPath(dir, "orders.parquet")))

  private val custCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  /** Key-space size M = max(c_custkey)+1 — every delta bound is
    * M-relative so the COW file-set shape (and q130's pinned
    * indicators) holds at EVERY scale factor, not just sf0.01 (review
    * finding, r17: absolute bounds degenerated to a full rewrite at
    * sf0.001 and a single-bucket delta at sf0.1). One full-column max,
    * paid only inside the lifecycle build. */
  private def keySpace(spark: SparkSession, dir: String): Long =
    Tables.customer(spark, dir).agg(max(col("c_custkey"))).head.getLong(0) + 1L

  /** Delta 1 — the hot-range CDC batch: update keys [0, M/10) (+1000
    * balance, bucket 0 of the 8-range layout), retire keys
    * [M/2, M/2+M/20) (bucket 4), insert `k+M` for k≡1 (mod 100)
    * (clamped to bucket 7, whose ORIGINAL file's [7M/8, M-1] range
    * does not intersect the ≥M insert keys — carried by stats).
    * Shape at any sf: rewrite {b0, b4}, new files {b0, b4, b7-ins},
    * six of eight v1 files carried. */
  private[sources] def delta1(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val m = keySpace(spark, dir)
    val upd = c.filter(col("c_custkey") < m / 10)
      .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
      .withColumn("_deleted", lit(false))
    val del = c.filter(col("c_custkey") >= m / 2 &&
        col("c_custkey") < m / 2 + m / 20)
      .withColumn("_deleted", lit(true))
    val ins = c.filter(col("c_custkey") % 100 === 1)
      .select((col("c_custkey") + m).as("c_custkey"),
        lit("snap_new").as("c_name"), col("c_nationkey"),
        lit(111.11).as("c_acctbal"), lit("NEWSEG").as("c_mktsegment"))
      .withColumn("_deleted", lit(false))
    upd.unionByName(del).unionByName(ins)
  }

  /** Delta 2 — update keys [M/5, M/4) (−500 balance, bucket 1), retire
    * half of delta 1's inserts (k≡1 mod 200, i.e. keys k+M). Rewrites
    * {v1's b1 file, v2's b7 insert file}; the original b7 file stays
    * carried — the file-level intersection test at work. */
  private[sources] def delta2(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val m = keySpace(spark, dir)
    val upd = c.filter(col("c_custkey") >= m / 5 && col("c_custkey") < m / 4)
      .withColumn("c_acctbal", col("c_acctbal") - lit(500.0))
      .withColumn("_deleted", lit(false))
    val del = c.filter(col("c_custkey") % 200 === 1)
      .select((col("c_custkey") + m).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"))
      .withColumn("_deleted", lit(true))
    upd.unionByName(del)
  }

  /** Attach-or-build the three-commit customer lifecycle; returns the
    * table location. Single writer cross-JVM (the Snap ops' lease,
    * re-entrant under this outer hold); a mismatched tag (regenerated
    * testdata) or a partial lifecycle (a crashed prior build) drops
    * and rebuilds — the table is derived state. */
  private[graft] def ensureCust(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, custTable(dir))
    val fp = custFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 3)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", custBuckets, layout = "range", tag = fp)
        Snap.merge(spark, loc, delta1(spark, dir))
        Snap.merge(spark, loc, delta2(spark, dir))
      }
    }
    loc
  }

  private[sources] def ensureOrd(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, ordTable(dir))
    val fp = ordFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 1)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.orders(spark, dir),
          Seq("o_orderkey"), "o_orderkey", ordBuckets, layout = "range", tag = fp)
      }
    }
    loc
  }

  // --------------------------------------------------------------- q130
  /** Post-merge state (pinned to version 2 — the read must not drift
    * when q131's lifecycle advances the head) aggregated per nation,
    * plus the copy-on-write audit: v2 must have carried six of v1's
    * eight files BY REFERENCE (identical paths) and written three new
    * ones. The carried/rewritten indicators come from manifest
    * METADATA — kilobytes to the driver, never row data. */
  def q130SnapMerge(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    val v1 = Snap.atVersion(spark, loc, 1)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v1Paths = v1.files.map(_.path).toSet
    val carried = v2.files.count(f => v1Paths.contains(f.path))
    val rewrote = v2.files.size - carried
    // sf-invariant by the M-relative delta design above
    val carriedOk = carried == 6 && v1.files.size == 8
    val rewroteOk = rewrote == 3 && v2.files.size == 9
    Snap.read(spark, loc, asOf = Some(2))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment") === "NEWSEG", 1)).as("n_new"))
      .withColumn("cow_carried_ok", lit(if (carriedOk) 1 else 0))
      .withColumn("cow_rewrote_ok", lit(if (rewroteOk) 1 else 0))
  }

  private val d1Sql =
    """ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |d1_upd AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 1000 AS c_acctbal,
      |         c_mktsegment
      |  FROM customer WHERE c_custkey < (SELECT m // 10 FROM ks)),
      |d1_ins AS (
      |  SELECT c_custkey + (SELECT m FROM ks) AS c_custkey,
      |         'snap_new' AS c_name,
      |         c_nationkey, 111.11 AS c_acctbal, 'NEWSEG' AS c_mktsegment
      |  FROM customer WHERE c_custkey % 100 = 1),
      |d1_keys AS (
      |  SELECT c_custkey FROM d1_upd
      |  UNION ALL SELECT c_custkey FROM d1_ins
      |  UNION ALL SELECT c_custkey FROM customer
      |    WHERE c_custkey >= (SELECT m // 2 FROM ks)
      |      AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)),
      |v2 AS (
      |  SELECT * FROM customer
      |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d1_keys)
      |  UNION ALL SELECT * FROM d1_upd
      |  UNION ALL SELECT * FROM d1_ins)""".stripMargin

  val q130Sql: String =
    s"""WITH $d1Sql
       |SELECT c_nationkey, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(*) FILTER (WHERE c_mktsegment = 'NEWSEG') AS n_new,
       |  1 AS cow_carried_ok, 1 AS cow_rewrote_ok
       |FROM v2 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q131
  /** Time travel: the same aggregate at versions 1, 2, 3 — three
    * explicit-file plans over immutable data, no reconstruction.
    * Version 3's row also audits snapshot isolation's precondition
    * (every v1 file still on disk after two later commits). */
  def q131SnapTimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    val fs = Published.fsOf(loc)
    val v1Intact = Snap.atVersion(spark, loc, 1).files.forall(f =>
      Published.exists(fs, new HPath(loc, f.path)))
    def face(v: Int): DataFrame =
      Snap.read(spark, loc, asOf = Some(v))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
        .select(lit(v).as("version"), col("n_rows"), col("tot_bal"),
          lit(if (v1Intact) 1 else 0).as("v1_files_intact"))
    face(1).unionByName(face(2)).unionByName(face(3)).orderBy("version")
  }

  val q131Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 500 AS c_acctbal,
       |         c_mktsegment
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_keys AS (
       |  SELECT c_custkey FROM d2_upd
       |  UNION ALL SELECT c_custkey + (SELECT m FROM ks) AS c_custkey
       |  FROM customer WHERE c_custkey % 200 = 1),
       |v3 AS (
       |  SELECT * FROM v2
       |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_keys)
       |  UNION ALL SELECT * FROM d2_upd)
       |SELECT 1 AS version, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal, 1 AS v1_files_intact
       |FROM customer
       |UNION ALL
       |SELECT 2, count(*), round(sum(c_acctbal) + 1e-9, 2), 1 FROM v2
       |UNION ALL
       |SELECT 3, count(*), round(sum(c_acctbal) + 1e-9, 2), 1 FROM v3
       |ORDER BY version""".stripMargin

  // --------------------------------------------------------------- q132
  /** Stats-pruned range scan: the manifest's per-file [min,max] plans
    * only the orders files intersecting [max/4, max/2] — on the
    * 16-bucket range layout that is ~5 of 16 files; the indicator
    * verifies real skipping happened (0 < planned < total). At 100 TB
    * this is the difference between reading 25 TB and reading the
    * manifest + 5 files' worth. */
  def q132SnapPrune(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureOrd(spark, dir)
    // scan bounds from manifest METADATA (rangeMax == max(o_orderkey)
    // at create): no source rescan on the serve path — the module's
    // own scale ledger, kept on its demo face (review finding, r17)
    val maxKey = Snap.head(spark, loc).get.rangeMax
    val (lo, hi) = (maxKey / 4, maxKey / 2)
    val (df, planned, total) = Snap.prunedScan(spark, loc, lo, hi)
    df.agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice")) + lit(1e-9), 2).as("tot_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .withColumn("files_skipped_ok",
        lit(if (planned > 0 && planned < total) 1 else 0))
  }

  val q132Sql: String =
    """SELECT count(*) AS n_rows,
      |  round(sum(o_totalprice) + 1e-9, 2) AS tot_price,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  1 AS files_skipped_ok
      |FROM orders
      |WHERE o_orderkey >= (SELECT max(o_orderkey) // 4 FROM orders)
      |  AND o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)""".stripMargin

  // --------------------------------------------------------------- q133
  private[graft] def optTable(dir: String): String =
    s"graft_snapz_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def optFp(dir: String): String =
    Published.fingerprint("snapz",
      Seq(new HPath(dir, "customer.parquet")))

  /** Append batch k: keys `c + k·M` for c < M/50, tagged INSk. Each
    * batch clamps to the top range bucket with a key range DISJOINT
    * from every earlier batch's file — so nothing intersects, nothing
    * rewrites, and the bucket accumulates one file per merge: the
    * append-mostly CDC shape that makes small-file folding matter. */
  private[sources] def appendBatch(spark: SparkSession, dir: String,
                                   k: Int): DataFrame = {
    val c = Tables.customer(spark, dir)
    val m = keySpace(spark, dir)
    // max(1, ·): a sub-50-key corpus must still append SOMETHING or the
    // lifecycle's require(v == 5) loops drop+rebuild forever (review
    // finding) — the oracle SQL floors identically
    c.filter(col("c_custkey") < math.max(1L, m / 50))
      .select((col("c_custkey") + lit(k) * m).as("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"),
        lit(s"INS$k").as("c_mktsegment"))
      .withColumn("_deleted", lit(false))
  }

  /** The small-file lifecycle: create (4 range buckets) + three
    * append-only merges — bucket 3 grows to ORIGINAL + 3 insert files
    * — with `autoOptimize = 4` armed on the third, which folds the fat
    * bucket back to one file inside the same lease hold (version 5). */
  private[sources] def ensureOpt(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, optTable(dir))
    val fp = optFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 5)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", 4, layout = "range", tag = fp)
        Snap.merge(spark, loc, appendBatch(spark, dir, 1))
        Snap.merge(spark, loc, appendBatch(spark, dir, 2))
        val v = Snap.merge(spark, loc, appendBatch(spark, dir, 3),
          autoOptimize = 4)
        require(v == 5, s"expected the armed auto-optimize to commit v5, got $v")
      }
    }
    loc
  }

  /** Content face of the folded table plus the compaction audit from
    * manifest metadata: pre-fold v4 holds four top-bucket files (the
    * original + three appended), post-fold v5 holds ONE, every other
    * file carries by reference, and the fold is row-neutral (manifest
    * row sums equal across v4/v5). */
  def q133SnapOptimize(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureOpt(spark, dir)
    val v4 = Snap.atVersion(spark, loc, 4)
    val v5 = Snap.atVersion(spark, loc, 5)
    val top = v4.files.map(_.bucket).max
    val preFat = v4.files.count(_.bucket == top)
    val postFat = v5.files.count(_.bucket == top)
    val v4Other = v4.files.filter(_.bucket != top).map(_.path).toSet
    val carriedOk = v5.files.filter(_.bucket != top).map(_.path).toSet == v4Other
    val foldedOk = preFat == 4 && postFat == 1 &&
      v4.files.map(_.rows).sum == v5.files.map(_.rows).sum
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment").startsWith("INS"), 1)).as("n_ins"))
      .withColumn("folded_ok", lit(if (foldedOk) 1 else 0))
      .withColumn("carried_ok", lit(if (carriedOk) 1 else 0))
  }

  val q133Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |ins AS (
      |  SELECT c_custkey + k * (SELECT m FROM ks) AS c_custkey, c_name,
      |         c_nationkey, c_acctbal, 'INS' || k AS c_mktsegment
      |  FROM customer CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
      |  WHERE c_custkey < (SELECT greatest(1, m // 50) FROM ks)),
      |v5 AS (SELECT * FROM customer UNION ALL SELECT * FROM ins)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  count(*) FILTER (WHERE c_mktsegment LIKE 'INS%') AS n_ins,
      |  1 AS folded_ok, 1 AS carried_ok
      |FROM v5 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q134
  private[graft] def evoTable(dir: String): String =
    s"graft_snape_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def evoFp(dir: String): String =
    Published.fingerprint("snape",
      Seq(new HPath(dir, "customer.parquet")))

  /** The evolution lifecycle: create (v1) → addColumns `c_tier STRING,
    * c_score DOUBLE` (v2 — METADATA-ONLY: same files under a widened
    * schema) → merge a backfill for keys [0, M/10) setting both (v3 —
    * rewrites bucket 0; every other file stays NARROW and null-fills
    * under the v3 schema). */
  private[sources] def ensureEvo(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, evoTable(dir))
    val fp = evoFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 3)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", 4, layout = "range", tag = fp)
        Snap.addColumns(spark, loc, "c_tier STRING, c_score DOUBLE")
        val m = keySpace(spark, dir)
        // max(1,·): q133's tiny-corpus floor, applied here too (review
        // finding) — an EMPTY backfill would commit v3 unchanged and
        // flip the narrow-carried audit against its oracle literal
        val backfill = Tables.customer(spark, dir)
          .filter(col("c_custkey") < math.max(1L, m / 10))
          .withColumn("c_tier", lit("gold"))
          .withColumn("c_score", col("c_acctbal") * lit(0.01))
          .withColumn("_deleted", lit(false))
        Snap.merge(spark, loc, backfill)
      }
    }
    loc
  }

  /** Content face over the evolved head plus the evolution audit:
    * the evolve commit must have been metadata-only (v2 references
    * EXACTLY v1's files) and the backfill must have rewritten only
    * bucket 0 (three of four files still narrow, null-filling). */
  def q134SnapEvolve(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureEvo(spark, dir)
    val v1 = Snap.atVersion(spark, loc, 1)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val metadataOnly = v2.files.map(_.path) == v1.files.map(_.path) &&
      v2.schema.fieldNames.length == v1.schema.fieldNames.length + 2
    val narrowCarried =
      v3.files.map(_.path).toSet.intersect(v1.files.map(_.path).toSet).size == 3
    // the PRE-evolve snapshot must still read in its narrow shape —
    // from the already-fetched manifest's metadata (the read-path form
    // of this pin lives in SnapSpec; no file-index I/O per face call)
    val v1Narrow = !v1.schema.fieldNames.contains("c_tier")
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("c_tier")).as("n_backfilled"),
        round(sum(coalesce(col("c_score"), lit(0.0))) + lit(1e-9), 2)
          .as("tot_score"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
      .withColumn("evolve_metadata_only", lit(if (metadataOnly) 1 else 0))
      .withColumn("narrow_files_carried", lit(if (narrowCarried) 1 else 0))
      .withColumn("time_travel_narrow", lit(if (v1Narrow) 1 else 0))
  }

  val q134Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |v3 AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal,
      |    CASE WHEN c_custkey < (SELECT greatest(1, m // 10) FROM ks)
      |         THEN 'gold' END AS c_tier,
      |    CASE WHEN c_custkey < (SELECT greatest(1, m // 10) FROM ks)
      |         THEN c_acctbal * 0.01 END AS c_score
      |  FROM customer)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  count(c_tier) AS n_backfilled,
      |  round(sum(coalesce(c_score, 0)) + 1e-9, 2) AS tot_score,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  1 AS evolve_metadata_only, 1 AS narrow_files_carried,
      |  1 AS time_travel_narrow
      |FROM v3 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q135
  private[graft] def scdTable(dir: String): String =
    s"graft_snaph_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def scdFp(dir: String): String =
    Published.fingerprint("snaph",
      Seq(new HPath(dir, "customer.parquet")))

  /** SCD type-2 as a Snap COMPOSITION — the dimension-history pattern:
    * the table is keyed (h_custkey, h_from) with h_custkey as the
    * bucket column (a key's versions colocate), and one change batch
    * becomes ONE merge delta holding, per changed key, the CLOSE row
    * (the prior current version re-written with h_current=0 and h_to
    * stamped — same composite key, latest-wins replace) and the OPEN
    * row (the new version, h_from=t, current). No new operator: the
    * COW merge's composite-key match does the whole dance, and the
    * bucket-sparse change batch keeps it O(delta). */
  private def scdBase(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("h_custkey"), lit(0L).as("h_from"),
      col("c_acctbal").as("h_bal"), lit(1).as("h_current"),
      lit(null).cast("long").as("h_to"))

  /** Change batch `t` re-prices keys [0, M/10·2^{1-t}) by +1000·t:
    * batch 1 touches [0, M/10), batch 2 the narrower [0, M/20) — so
    * keys under M/20 end with three versions and a two-hop close
    * chain. */
  private def scdDelta(spark: SparkSession, dir: String, t: Int): DataFrame = {
    val c = Tables.customer(spark, dir)
    val m = keySpace(spark, dir)
    val hi = if (t == 1) m / 10 else m / 20
    val changed = c.filter(col("c_custkey") < hi)
    // prior version (h_from = t-1) had bal + 1000·(t-1) by induction
    val priorShift = lit(1000.0) * (t - 1)
    val close = changed.select(
      col("c_custkey").as("h_custkey"), lit((t - 1).toLong).as("h_from"),
      (col("c_acctbal") + priorShift).as("h_bal"), lit(0).as("h_current"),
      lit(t.toLong).as("h_to"))
    val open = changed.select(
      col("c_custkey").as("h_custkey"), lit(t.toLong).as("h_from"),
      (col("c_acctbal") + lit(1000.0) * t).as("h_bal"),
      lit(1).as("h_current"), lit(null).cast("long").as("h_to"))
    close.unionByName(open).withColumn("_deleted", lit(false))
  }

  private[graft] def ensureScd(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, scdTable(dir))
    val fp = scdFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 3)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, scdBase(spark, dir),
          Seq("h_custkey", "h_from"), "h_custkey", 4,
          layout = "range", tag = fp)
        Snap.merge(spark, loc, scdDelta(spark, dir, 1))
        Snap.merge(spark, loc, scdDelta(spark, dir, 2))
      }
    }
    loc
  }

  /** History face: per validity epoch (h_from), row count, how many are
    * still current, and the closed rows' h_to sum — the shape that
    * breaks if a close row fails to replace its prior version (double
    * current) or an open row is lost. */
  def q135SnapScd2(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureScd(spark, dir)
    Snap.read(spark, loc)
      .groupBy(col("h_from"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h_current")).cast("bigint").as("n_current"),
        round(sum(col("h_bal")) + lit(1e-9), 2).as("tot_bal"),
        sum(coalesce(col("h_to"), lit(0L))).cast("bigint").as("sum_to"))
  }

  val q135Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |h AS (
      |  SELECT c_custkey AS h_custkey, 0 AS h_from, c_acctbal AS h_bal,
      |    CASE WHEN c_custkey < (SELECT m // 10 FROM ks) THEN 0 ELSE 1 END
      |      AS h_current,
      |    CASE WHEN c_custkey < (SELECT m // 10 FROM ks) THEN 1 END AS h_to
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 1, c_acctbal + 1000,
      |    CASE WHEN c_custkey < (SELECT m // 20 FROM ks) THEN 0 ELSE 1 END,
      |    CASE WHEN c_custkey < (SELECT m // 20 FROM ks) THEN 2 END
      |  FROM customer WHERE c_custkey < (SELECT m // 10 FROM ks)
      |  UNION ALL
      |  SELECT c_custkey, 2, c_acctbal + 2000, 1, NULL
      |  FROM customer WHERE c_custkey < (SELECT m // 20 FROM ks))
      |SELECT h_from, count(*) AS n_rows,
      |  sum(h_current)::BIGINT AS n_current,
      |  round(sum(h_bal) + 1e-9, 2) AS tot_bal,
      |  sum(coalesce(h_to, 0))::BIGINT AS sum_to
      |FROM h GROUP BY h_from""".stripMargin

  // --------------------------------------------------------------- q136
  /** Changelog (CDF) face over the q130/q131 lifecycle: every change
    * row across v1→v3, classified and stamped, aggregated per
    * (version, kind). The relational oracle replays the delta chain —
    * insert/update rows must carry post-images, delete rows
    * pre-images (the v3 deletes' 111.11 balances are the v2 INSERTS'
    * values: proof the pre-image is read from the parent version, not
    * the source). `delta_scan_ok` audits the O(delta) contract from
    * plan metadata: the changelog plan's inputFiles are a subset of
    * the commits' removed∪added files — carried files never read. */
  def q136SnapChangelog(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    val fs = Published.fsOf(loc)
    val ms = (1 to 3).map(v => Snap.atVersion(spark, loc, v))
    // compare scheme-normalized paths: Spark's inputFiles and Hadoop's
    // makeQualified render the same file URI differently (file:/// vs
    // file:/)
    val deltaFiles = (1 until 3).flatMap { i =>
      val p = ms(i - 1).files.map(_.path).toSet
      val c = ms(i).files.map(_.path).toSet
      (p diff c) ++ (c diff p)
    }.map(p => fs.makeQualified(new HPath(loc, p)).toUri.getPath).toSet
    val ch = Snap.changes(spark, loc, 1, 3)
    val scanned = ch.inputFiles.map(new HPath(_).toUri.getPath)
    val scanOk = scanned.nonEmpty && scanned.forall(deltaFiles)
    ch.groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        countDistinct(col("c_nationkey")).as("n_nation"))
      .withColumn("delta_scan_ok", lit(if (scanOk) 1 else 0))
  }

  val q136Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_nationkey, c_acctbal - 500 AS c_acctbal
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |ch AS (
       |  SELECT 2 AS _commit_version, 'insert' AS _change_type,
       |         c_nationkey, c_acctbal FROM d1_ins
       |  UNION ALL SELECT 2, 'update', c_nationkey, c_acctbal FROM d1_upd
       |  UNION ALL SELECT 2, 'delete', c_nationkey, c_acctbal FROM customer
       |    WHERE c_custkey >= (SELECT m // 2 FROM ks)
       |      AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)
       |  UNION ALL SELECT 3, 'update', c_nationkey, c_acctbal FROM d2_upd
       |  UNION ALL SELECT 3, 'delete', c_nationkey, 111.11 FROM customer
       |    WHERE c_custkey % 200 = 1)
       |SELECT _commit_version, _change_type, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(DISTINCT c_nationkey) AS n_nation, 1 AS delta_scan_ok
       |FROM ch GROUP BY _commit_version, _change_type""".stripMargin

  // --------------------------------------------------------------- q137
  private[graft] def renTable(dir: String): String =
    s"graft_snapr_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def renFp(dir: String): String =
    Published.fingerprint("snapr",
      Seq(new HPath(dir, "customer.parquet")))

  /** The rename/drop lifecycle: create (v1) → rename c_mktsegment →
    * c_segment (v2, METADATA-ONLY: the logical name moves, the
    * physical stays) → drop c_name (v3, metadata-only: the slot
    * retires) → merge a backfill speaking the NEW names (v4 — its
    * files land bytes under the stable physical). */
  private[sources] def ensureRen(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, renTable(dir))
    val fp = renFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 4)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", 4, layout = "range", tag = fp)
        Snap.renameColumn(spark, loc, "c_mktsegment", "c_segment")
        Snap.dropColumn(spark, loc, "c_name")
        val m = keySpace(spark, dir)
        val backfill = Tables.customer(spark, dir)
          .filter(col("c_custkey") < math.max(1L, m / 10))
          .select(col("c_custkey"), col("c_nationkey"),
            (col("c_acctbal") + lit(77.0)).as("c_acctbal"),
            lit("RENAMED").as("c_segment"))
          .withColumn("_deleted", lit(false))
        Snap.merge(spark, loc, backfill)
      }
    }
    loc
  }

  /** Content face over the renamed+dropped head plus the evolution
    * audits, all from manifest METADATA: both evolve commits reference
    * exactly v1's files (zero data movement), the column mapping holds
    * (c_segment rides c_mktsegment's physical slot; c_name's slot is
    * retired against reuse), and the pre-evolution snapshot still
    * carries its old shape for time travel. */
  def q137SnapRenameDrop(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureRen(spark, dir)
    val v1 = Snap.atVersion(spark, loc, 1)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val v4 = Snap.head(spark, loc).get
    val renameOk = v2.files.map(_.path) == v1.files.map(_.path) &&
      v2.op == "evolve" &&
      v2.schema.fieldNames.contains("c_segment") &&
      !v2.schema.fieldNames.contains("c_mktsegment")
    val dropOk = v3.files.map(_.path) == v1.files.map(_.path) &&
      !v3.schema.fieldNames.contains("c_name")
    val mappingOk = v4.physicalOf("c_segment") == "c_mktsegment" &&
      v4.retired == Seq("c_name")
    val oldShape = v1.schema.fieldNames.contains("c_mktsegment") &&
      v1.schema.fieldNames.contains("c_name")
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_segment") === "RENAMED", 1)).as("n_renamed"))
      .withColumn("rename_metadata_only", lit(if (renameOk) 1 else 0))
      .withColumn("drop_metadata_only", lit(if (dropOk) 1 else 0))
      .withColumn("mapping_ok", lit(if (mappingOk) 1 else 0))
      .withColumn("time_travel_old_shape", lit(if (oldShape) 1 else 0))
  }

  val q137Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |v4 AS (
      |  SELECT c_custkey, c_nationkey,
      |    CASE WHEN c_custkey < (SELECT greatest(1, m // 10) FROM ks)
      |         THEN c_acctbal + 77 ELSE c_acctbal END AS c_acctbal,
      |    CASE WHEN c_custkey < (SELECT greatest(1, m // 10) FROM ks)
      |         THEN 'RENAMED' ELSE c_mktsegment END AS c_segment
      |  FROM customer)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  count(*) FILTER (WHERE c_segment = 'RENAMED') AS n_renamed,
      |  1 AS rename_metadata_only, 1 AS drop_metadata_only,
      |  1 AS mapping_ok, 1 AS time_travel_old_shape
      |FROM v4 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q138
  private[graft] def zTable(dir: String): String =
    s"graft_snapzz_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def zFp(dir: String): String =
    Published.fingerprint("snapzz",
      Seq(new HPath(dir, "orders.parquet")))

  private[sources] def ensureZ(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, zTable(dir))
    val fp = zFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 1)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.orders(spark, dir),
          Seq("o_orderkey", "o_custkey"), "o_orderkey", 16,
          layout = "zorder", tag = fp, zorderBy = "o_custkey")
      }
    }
    loc
  }

  /** Z-order layout face: the same orders table pruned on EACH key
    * dimension — a z-tile bucket covers ~1/√buckets of either axis, so
    * both range scans plan strict file subsets (q88's measured zone-map
    * lesson promoted into the format's layout). One output row per
    * dimension; `files_skipped_ok` audits real skipping from manifest
    * metadata. Scan bounds come from the manifest's own dimension
    * ranges — no source rescan on the serve path. */
  def q138SnapZorder(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureZ(spark, dir)
    val m = Snap.head(spark, loc).get
    def face(dim: String, lo: Long, hi: Long): DataFrame = {
      val (df, planned, total) = Snap.prunedScanBy(spark, loc, dim, lo, hi)
      df.agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")) + lit(1e-9), 2).as("tot_price"),
          countDistinct(col("o_custkey")).as("n_cust"))
        .select(lit(dim).as("dim"), col("n_rows"), col("tot_price"),
          col("n_cust"),
          lit(if (planned > 0 && planned < total) 1 else 0)
            .as("files_skipped_ok"))
    }
    face("o_orderkey", m.rangeMax / 4, m.rangeMax / 2)
      .unionByName(face("o_custkey", m.z2Max / 4, m.z2Max / 2))
  }

  val q138Sql: String =
    """SELECT 'o_orderkey' AS dim, count(*) AS n_rows,
      |  round(sum(o_totalprice) + 1e-9, 2) AS tot_price,
      |  count(DISTINCT o_custkey) AS n_cust, 1 AS files_skipped_ok
      |FROM orders
      |WHERE o_orderkey >= (SELECT max(o_orderkey) // 4 FROM orders)
      |  AND o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
      |UNION ALL
      |SELECT 'o_custkey', count(*),
      |  round(sum(o_totalprice) + 1e-9, 2),
      |  count(DISTINCT o_custkey), 1
      |FROM orders
      |WHERE o_custkey >= (SELECT max(o_custkey) // 4 FROM orders)
      |  AND o_custkey <= (SELECT max(o_custkey) // 2 FROM orders)""".stripMargin

  // --------------------------------------------------------------- q139
  /** Retention audit face over the q130/q131 lifecycle: what
    * vacuum(keep=2) would keep and reclaim, from manifest metadata +
    * one data/ listing — the horizon made visible BEFORE it bites.
    * The counts are sf-invariant by the lifecycle's M-relative delta
    * design: 3 versions total, the v1 manifest reclaimable, and
    * exactly 2 data files reclaimable — v1's b0 and b4 originals,
    * which delta 1 rewrote and nothing kept references (disk holds 13
    * files, the kept v2∪v3 pair references 11; v1's b1 original stays
    * live because v2 carries it). `bytes_reclaimable_pos` is the
    * nonzero-bytes indicator. */
  def q139SnapRetention(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    Snap.retention(spark, loc, keepVersions = 2)
      .select(col("versions_total").cast("int").as("versions_total"),
        col("versions_kept").cast("int").as("versions_kept"),
        col("oldest_readable_version").cast("int")
          .as("oldest_readable_version"),
        col("manifests_reclaimable").cast("int").as("manifests_reclaimable"),
        col("files_reclaimable").cast("int").as("files_reclaimable"),
        when(col("bytes_reclaimable") > 0, 1).otherwise(0)
          .as("bytes_reclaimable_pos"))
  }

  val q139Sql: String =
    """SELECT 3 AS versions_total, 2 AS versions_kept,
      |  2 AS oldest_readable_version, 1 AS manifests_reclaimable,
      |  2 AS files_reclaimable, 1 AS bytes_reclaimable_pos""".stripMargin

  // --------------------------------------------------------------- q140
  private[graft] def occTable(dir: String): String =
    s"graft_snapq_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def occFp(dir: String): String =
    Published.fingerprint("snapq",
      Seq(new HPath(dir, "customer.parquet")))

  /** The q130 lifecycle rebuilt THROUGH the optimistic commit path:
    * create + two `mergeOcc` commits (the full resolve → leaseless
    * stage → conflict-checked commit protocol, uncontended here — the
    * contended faces are SnapSpec's matrix and race leg 5). The gate
    * proves the OCC path is behavior-identical to the serialized
    * merge on the same deltas. */
  private[graft] def ensureOcc(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, occTable(dir))
    val fp = occFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 3)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", custBuckets, layout = "range", tag = fp)
        Snap.mergeOcc(spark, loc, delta1(spark, dir))
        Snap.mergeOcc(spark, loc, delta2(spark, dir))
      }
    }
    loc
  }

  /** Content face over the OCC-built head (same relational answer as
    * the serialized lifecycle's v3) plus the protocol audit from
    * manifest metadata: both commits are `merge` ops whose `base`
    * equals their parent (resolved-head commits — an uncontended OCC
    * writer must never spuriously rebase or retry), and the COW shape
    * matches the serialized path file-for-file in COUNT. */
  def q140SnapOcc(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureOcc(spark, dir)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val protoOk = v2.op == "merge" && v2.resolvedBase == 1 && v2.parent == 1 &&
      v3.op == "merge" && v3.resolvedBase == 2 && v3.parent == 2
    val cowOk = v2.files.size == 9 && v3.files.size == 9
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment") === "NEWSEG", 1)).as("n_new"))
      .withColumn("occ_protocol_ok", lit(if (protoOk) 1 else 0))
      .withColumn("occ_cow_ok", lit(if (cowOk) 1 else 0))
  }

  val q140Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 500 AS c_acctbal,
       |         c_mktsegment
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_keys AS (
       |  SELECT c_custkey FROM d2_upd
       |  UNION ALL SELECT c_custkey + (SELECT m FROM ks) AS c_custkey
       |  FROM customer WHERE c_custkey % 200 = 1),
       |v3 AS (
       |  SELECT * FROM v2
       |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_keys)
       |  UNION ALL SELECT * FROM d2_upd)
       |SELECT c_nationkey, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(*) FILTER (WHERE c_mktsegment = 'NEWSEG') AS n_new,
       |  1 AS occ_protocol_ok, 1 AS occ_cow_ok
       |FROM v3 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q141
  private[graft] def morTable(dir: String): String =
    s"graft_snapmm_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def morFp(dir: String): String =
    Published.fingerprint("snapmm",
      Seq(new HPath(dir, "customer.parquet")))

  /** The q130 lifecycle rebuilt through MERGE-ON-READ: the same two
    * deltas land as per-bucket delta FILES (every base file carries by
    * reference — O(delta) commit BYTES, the trickle-CDC shape), then
    * `optimize` folds the deltas back into the base. v4 is the fold. */
  private[graft] def ensureMor(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, morTable(dir))
    val fp = morFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 4)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", custBuckets, layout = "range", tag = fp)
        Snap.mergeMor(spark, loc, delta1(spark, dir))
        Snap.mergeMor(spark, loc, delta2(spark, dir))
        val v = Snap.optimize(spark, loc, minFilesPerBucket = 2)
        require(v == 4, s"expected the delta fold to commit v4, got $v")
      }
    }
    loc
  }

  /** Content face over the MOR lifecycle's folded head — by contract
    * the same relational answer as the COW lifecycle's v3 (MOR ≡ COW
    * row-for-row on the same deltas) — plus the write-amplification
    * audit from manifest metadata: both mor commits carried EVERY base
    * file by reference (zero rewrites — under COW the same deltas
    * rewrote 2-3 files each), the delta files match the deltas' bucket
    * spread (3 then +2), and the fold retired every delta into
    * one-file buckets. */
  def q141SnapMor(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureMor(spark, dir)
    val v1 = Snap.atVersion(spark, loc, 1)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val v4 = Snap.head(spark, loc).get
    val carriedOk = v2.files.map(_.path) == v1.files.map(_.path) &&
      v3.files.map(_.path) == v1.files.map(_.path) &&
      v2.op == "mor" && v3.op == "mor"
    val deltasOk = v2.deltas.size == 3 && v3.deltas.size == 5
    val foldOk = v4.op == "optimize" && v4.deltas.isEmpty &&
      v4.files.groupBy(_.bucket).valuesIterator.forall(_.size == 1)
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment") === "NEWSEG", 1)).as("n_new"))
      .withColumn("mor_carried_ok", lit(if (carriedOk) 1 else 0))
      .withColumn("mor_deltas_ok", lit(if (deltasOk) 1 else 0))
      .withColumn("mor_fold_ok", lit(if (foldOk) 1 else 0))
  }

  val q141Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 500 AS c_acctbal,
       |         c_mktsegment
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_keys AS (
       |  SELECT c_custkey FROM d2_upd
       |  UNION ALL SELECT c_custkey + (SELECT m FROM ks) AS c_custkey
       |  FROM customer WHERE c_custkey % 200 = 1),
       |v3 AS (
       |  SELECT * FROM v2
       |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_keys)
       |  UNION ALL SELECT * FROM d2_upd)
       |SELECT c_nationkey, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(*) FILTER (WHERE c_mktsegment = 'NEWSEG') AS n_new,
       |  1 AS mor_carried_ok, 1 AS mor_deltas_ok, 1 AS mor_fold_ok
       |FROM v3 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q142
  /** The snapshot format behind the engine's SQL front door: the
    * q130 lifecycle's head registered as a view ([[SnapSql]]) and
    * joined to orders in ONE `spark.sql` statement — a q45-style
    * multi-table query whose WHERE prunes the snap table's files at
    * plan time from the manifest stats (`sql_pruned_ok` audits the
    * index's decision after a probe execution: a strict file subset).
    * The balance sum proves the view serves the MERGED v3 content,
    * not the source parquet. */
  def q142SnapSql(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    val m = Snap.head(spark, loc).get
    // M from manifest metadata (rangeMax == max(c_custkey) at create —
    // no source rescan on the serve path, q132's discipline)
    val hi = (m.rangeMax + 1) / 8
    val idx = SnapSql.registerView(spark, "graft_snap_cust_sql", loc)
    Tables.orders(spark, dir).createOrReplaceTempView("graft_orders_sql")
    // probe execution pins the pruning decision (listFiles runs at
    // scan planning; the index records what it chose)
    spark.sql(
      s"SELECT count(*) FROM graft_snap_cust_sql WHERE c_custkey < $hi")
      .collect()
    val prunedOk = idx.lastPlanned > 0 && idx.lastPlanned < idx.total
    spark.sql(
      s"""SELECT c.c_nationkey, count(*) AS n_orders,
         |  round(sum(o.o_totalprice) + 1e-9, 2) AS tot_price,
         |  round(sum(c.c_acctbal) + 1e-9, 2) AS tot_bal,
         |  count(DISTINCT c.c_custkey) AS n_cust
         |FROM graft_snap_cust_sql c
         |JOIN graft_orders_sql o ON o.o_custkey = c.c_custkey
         |WHERE c.c_custkey < $hi
         |GROUP BY c.c_nationkey""".stripMargin)
      .withColumn("sql_pruned_ok", lit(if (prunedOk) 1 else 0))
  }

  val q142Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 500 AS c_acctbal,
       |         c_mktsegment
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_keys AS (
       |  SELECT c_custkey FROM d2_upd
       |  UNION ALL SELECT c_custkey + (SELECT m FROM ks) AS c_custkey
       |  FROM customer WHERE c_custkey % 200 = 1),
       |v3 AS (
       |  SELECT * FROM v2
       |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_keys)
       |  UNION ALL SELECT * FROM d2_upd)
       |SELECT c.c_nationkey, count(*) AS n_orders,
       |  round(sum(o.o_totalprice) + 1e-9, 2) AS tot_price,
       |  round(sum(c.c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(DISTINCT c.c_custkey) AS n_cust, 1 AS sql_pruned_ok
       |FROM v3 c JOIN orders o ON o.o_custkey = c.c_custkey
       |WHERE c.c_custkey < (SELECT m // 8 FROM ks)
       |GROUP BY c.c_nationkey""".stripMargin

  // --------------------------------------------------------------- q143
  private[graft] def rebTable(dir: String): String =
    s"graft_snapb_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def rebFp(dir: String): String =
    Published.fingerprint("snapb",
      Seq(new HPath(dir, "customer.parquet")))

  /** The grown-table lifecycle rebucket exists for: create at 4 range
    * buckets (v1) → append keys past the range — they CLAMP into the
    * top bucket (v2) → optimize folds that bucket fat (v3) → rebucket
    * to 8 with re-derived bounds (v4) → re-price the appended keys
    * (v5) — the merge whose rewrite set the rebucket shrank. */
  private[graft] def ensureReb(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, rebTable(dir))
    val fp = rebFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 5)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", 4, layout = "range", tag = fp)
        Snap.merge(spark, loc, appendBatch(spark, dir, 1))
        require(Snap.optimize(spark, loc, minFilesPerBucket = 2) == 3)
        require(Snap.rebucket(spark, loc, newBuckets = 8) == 4)
        val reprice = appendBatch(spark, dir, 1)
          .withColumn("c_acctbal", col("c_acctbal") + lit(100.0))
        require(Snap.merge(spark, loc, reprice) == 5,
          "reprice merge did not land as v5")
      }
    }
    loc
  }

  /** Content face over the rebucketed head plus the topology audit
    * from manifest metadata: the rebucket is row-conserving under the
    * new bucket count with bounds re-derived over the appended keys
    * (`rebucket_ok`), it re-spread the clamped key space across all 8
    * buckets (`respread_ok`), pre-rebucket versions still time-travel
    * (`time_travel_ok`), and — the point of the operator — the
    * post-rebucket re-price of the appended keys rewrote strictly
    * fewer rows than the pre-rebucket fat bucket file it would have
    * had to rewrite (`cheaper_merge_ok`). */
  def q143SnapRebucket(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureReb(spark, dir)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val v4 = Snap.atVersion(spark, loc, 4)
    val v5 = Snap.head(spark, loc).get
    val rebucketOk = v4.op == "rebucket" && v4.buckets == 8 &&
      v4.files.map(_.rows).sum == v3.files.map(_.rows).sum &&
      v4.rangeMax > v3.rangeMax // bounds re-derived over the appended keys
    val respreadOk = v4.files.size == 8 &&
      v4.files.map(_.bucket).distinct.size == 8
    // pre-rebucket, the appended keys lived in v3's folded top-bucket
    // fat file; post-rebucket the same re-price rewrote only the new
    // top slice — strictly fewer rows
    val fatRows = v3.files.filter(_.bucket == v3.files.map(_.bucket).max)
      .map(_.rows).sum
    val v5Paths = v5.files.map(_.path).toSet
    val rewroteRows = v4.files.filterNot(f => v5Paths.contains(f.path))
      .map(_.rows).sum
    val cheaperOk = rewroteRows > 0 && rewroteRows < fatRows
    val ttOk = v2.files.nonEmpty && v3.buckets == 4
    Snap.read(spark, loc)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment") === "INS1", 1)).as("n_ins"))
      .withColumn("rebucket_ok", lit(if (rebucketOk) 1 else 0))
      .withColumn("respread_ok", lit(if (respreadOk) 1 else 0))
      .withColumn("cheaper_merge_ok", lit(if (cheaperOk) 1 else 0))
      .withColumn("time_travel_ok", lit(if (ttOk) 1 else 0))
  }

  val q143Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |ins AS (
      |  SELECT c_custkey + (SELECT m FROM ks) AS c_custkey, c_name,
      |         c_nationkey, c_acctbal + 100 AS c_acctbal,
      |         'INS1' AS c_mktsegment
      |  FROM customer WHERE c_custkey < (SELECT greatest(1, m // 50) FROM ks)),
      |v5 AS (SELECT * FROM customer UNION ALL SELECT * FROM ins)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  count(*) FILTER (WHERE c_mktsegment = 'INS1') AS n_ins,
      |  1 AS rebucket_ok, 1 AS respread_ok, 1 AS cheaper_merge_ok,
      |  1 AS time_travel_ok
      |FROM v5 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q144
  /** The changelog's IVM face: q136's range read in the
    * `updatePreimages` CDF shape — updates emit BOTH images
    * (`update_preimage` carrying the parent's values, the row a
    * downstream aggregate must SUBTRACT; `update_postimage` the new
    * ones) — aggregated per (version, kind). The oracle replays both
    * sides of every update from the delta chain; this is the shape
    * [[graft.streaming.SnapFollow.pollOnceAgg]] consumes to maintain
    * derived aggregates without recomputing. */
  def q144SnapCdfPre(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureCust(spark, dir)
    Snap.changes(spark, loc, 1, 3, updatePreimages = true)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        countDistinct(col("c_nationkey")).as("n_nation"))
  }

  val q144Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_nationkey, c_acctbal - 500 AS c_acctbal
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |ch AS (
       |  SELECT 2 AS _commit_version, 'insert' AS _change_type,
       |         c_nationkey, c_acctbal FROM d1_ins
       |  UNION ALL SELECT 2, 'update_postimage', c_nationkey, c_acctbal
       |    FROM d1_upd
       |  UNION ALL SELECT 2, 'update_preimage', c_nationkey, c_acctbal
       |    FROM customer WHERE c_custkey < (SELECT m // 10 FROM ks)
       |  UNION ALL SELECT 2, 'delete', c_nationkey, c_acctbal FROM customer
       |    WHERE c_custkey >= (SELECT m // 2 FROM ks)
       |      AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)
       |  UNION ALL SELECT 3, 'update_postimage', c_nationkey, c_acctbal
       |    FROM d2_upd
       |  UNION ALL SELECT 3, 'update_preimage', c_nationkey, c_acctbal
       |    FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |      AND c_custkey < (SELECT m // 4 FROM ks)
       |  UNION ALL SELECT 3, 'delete', c_nationkey, 111.11 FROM customer
       |    WHERE c_custkey % 200 = 1)
       |SELECT _commit_version, _change_type, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(DISTINCT c_nationkey) AS n_nation
       |FROM ch GROUP BY _commit_version, _change_type""".stripMargin

  // --------------------------------------------------------------- q145
  /** The deep-range audit read through the CHUNKED changelog path:
    * q133's append lifecycle read as changes(1→5) with `chunkSteps=1`,
    * forcing every per-version frame group through the localCheckpoint
    * chunk union (the r18-advice plan bound — O(chunk) analysis at any
    * range depth). Same classification contract as q136 — the fold
    * commit contributes nothing — so the oracle replays the three
    * insert batches; passing here proves the CHUNKED plan serves the
    * identical rows cross-engine, not just equal-to-naive in-spec. */
  def q145SnapChangelogChunked(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureOpt(spark, dir)
    Snap.changes(spark, loc, 1, 5, chunkSteps = 1)
      .groupBy(col("_commit_version"), col("_change_type"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
  }

  val q145Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |ins AS (
      |  SELECT k, c_acctbal
      |  FROM customer CROSS JOIN (SELECT unnest([1, 2, 3]) AS k)
      |  WHERE c_custkey < (SELECT greatest(1, m // 50) FROM ks))
      |SELECT k + 1 AS _commit_version, 'insert' AS _change_type,
      |  count(*) AS n_rows, round(sum(c_acctbal) + 1e-9, 2) AS tot_bal
      |FROM ins GROUP BY k""".stripMargin

  // --------------------------------------------------------------- q146
  /** The commit-chain audit (DESCRIBE HISTORY) over the q141 MOR
    * lifecycle — the table whose history exercises every column:
    * create, two `mor` commits (base files FLAT at 8 while delta
    * files/rows accumulate — the write-amplification story readable
    * straight off the history), and the fold (deltas retired, base
    * back to one file per bucket). Row counts replay relationally in
    * the oracle; the mor commits' base-row counts stay the CREATE's
    * (deltas mask at read time, they do not add), and v4's folded
    * count equals the resolved v3 state's. */
  def q146SnapHistory(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureMor(spark, dir)
    Snap.history(spark, loc)
      .select(col("version"), col("op"), col("parent"),
        when(col("rebased"), 1).otherwise(0).as("rebased"),
        col("n_files"), col("n_rows"), col("n_deltas"),
        col("n_delta_rows"), col("buckets"))
  }

  val q146Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey FROM customer
       |  WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_del AS (
       |  SELECT c_custkey + (SELECT m FROM ks) AS c_custkey FROM customer
       |  WHERE c_custkey % 200 = 1),
       |v3 AS (
       |  SELECT c_custkey FROM v2
       |  WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_del))
       |SELECT 1 AS version, 'create' AS op, 0 AS parent, 0 AS rebased,
       |  8 AS n_files, (SELECT count(*) FROM customer) AS n_rows,
       |  0 AS n_deltas, 0 AS n_delta_rows, 8 AS buckets
       |UNION ALL
       |SELECT 2, 'mor', 1, 0, 8, (SELECT count(*) FROM customer), 3,
       |  (SELECT count(*) FROM d1_upd) + (SELECT count(*) FROM d1_ins) +
       |  (SELECT count(*) FROM customer
       |     WHERE c_custkey >= (SELECT m // 2 FROM ks)
       |       AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)), 8
       |UNION ALL
       |SELECT 3, 'mor', 2, 0, 8, (SELECT count(*) FROM customer), 5,
       |  (SELECT count(*) FROM d1_upd) + (SELECT count(*) FROM d1_ins) +
       |  (SELECT count(*) FROM customer
       |     WHERE c_custkey >= (SELECT m // 2 FROM ks)
       |       AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)) +
       |  (SELECT count(*) FROM d2_upd) + (SELECT count(*) FROM d2_del), 8
       |UNION ALL
       |SELECT 4, 'optimize', 3, 0, 8, (SELECT count(*) FROM v3), 0, 0, 8""".stripMargin

  // --------------------------------------------------------------- q147
  /** Register the DSv2 catalog ([[SnapCatalog]]) for this sf dir's
    * warehouse — one catalog name per dir so a re-registration can
    * never serve a stale root through Spark's catalog cache. */
  private def sqlCat(spark: SparkSession, dir: String): (String, HPath) = {
    val h = java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))
    val cat = s"graft_snapcat_$h"
    val root = new HPath(spark.conf.get("spark.sql.warehouse.dir"),
      s"graft_snapcat_$h")
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[SnapCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  /** Attach-or-build the q130 lifecycle executed PURELY through
    * `spark.sql` — CTAS, one MERGE INTO (delta 1's upserts + deletes +
    * inserts), UPDATE + DELETE (delta 2's two legs as their native SQL
    * verbs), and an INSERT INTO appending a new segment. Five
    * committed versions, all landed by the DSv2 write path routing
    * through the SAME commit machinery the Scala API uses. The table
    * name is keyed by the source fingerprint, so regenerated testdata
    * rebuilds instead of attaching to a stale lifecycle. */
  private def ensureSqlLife(spark: SparkSession,
                            dir: String): (String, String, HPath) = {
    val (cat, root) = sqlCat(spark, dir)
    val fpH = java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(custFp(dir).getBytes("UTF-8")))
    val tbl = s"t_$fpH"
    val loc = new HPath(root, tbl)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(_.version == 5)
      if (!ok) {
        if (Published.exists(Published.fsOf(loc), loc)) Snap.drop(spark, loc)
        Tables.customer(spark, dir)
          .createOrReplaceTempView("graft_q147_customer")
        val m = keySpace(spark, dir)
        spark.sql(s"CREATE TABLE $cat.$tbl TBLPROPERTIES (" +
          "'key'='c_custkey','buckets'='8','layout'='range') " +
          "AS SELECT * FROM graft_q147_customer")
        // delta 1 in ONE statement: the CDC MERGE shape
        spark.sql(
          s"""MERGE INTO $cat.$tbl t
             |USING (
             |  SELECT c_custkey, c_name, c_nationkey,
             |         c_acctbal + 1000 AS c_acctbal, c_mktsegment,
             |         false AS _is_del
             |  FROM graft_q147_customer WHERE c_custkey < ${m / 10}
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             |         c_mktsegment, true AS _is_del
             |  FROM graft_q147_customer
             |  WHERE c_custkey >= ${m / 2} AND c_custkey < ${m / 2 + m / 20}
             |  UNION ALL
             |  SELECT c_custkey + $m, 'snap_new', c_nationkey, 111.11,
             |         'NEWSEG', false
             |  FROM graft_q147_customer WHERE c_custkey % 100 = 1
             |) s ON t.c_custkey = s.c_custkey
             |WHEN MATCHED AND s._is_del THEN DELETE
             |WHEN MATCHED THEN UPDATE SET
             |  c_name = s.c_name, c_nationkey = s.c_nationkey,
             |  c_acctbal = s.c_acctbal, c_mktsegment = s.c_mktsegment
             |WHEN NOT MATCHED AND NOT s._is_del THEN INSERT
             |  (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
             |  VALUES (s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal,
             |          s.c_mktsegment)""".stripMargin)
        // delta 2 as its native verbs
        spark.sql(s"UPDATE $cat.$tbl SET c_acctbal = c_acctbal - 500.0 " +
          s"WHERE c_custkey >= ${m / 5} AND c_custkey < ${m / 4}")
        spark.sql(s"DELETE FROM $cat.$tbl " +
          s"WHERE c_custkey >= $m AND (c_custkey - $m) % 200 = 1")
        // a keyed table's append
        spark.sql(s"INSERT INTO $cat.$tbl " +
          s"SELECT c_custkey + ${3 * m}, 'sqlins', c_nationkey, 77.77, " +
          "'SQLSEG' FROM graft_q147_customer WHERE c_custkey % 50 = 7")
      }
    }
    (cat, tbl, loc)
  }

  /** Content face over the SQL-driven lifecycle, plus two audits:
    * `sql_matches_api` pins the SQL table at version 4 (post
    * MERGE/UPDATE/DELETE) row-for-row equal to [[ensureCust]]'s head —
    * the same deltas landed by [[Snap.merge]] — and `sql_pruned_ok`
    * pins that a `WHERE` through the catalog front door still plans a
    * strict file subset from manifest stats ([[SnapScan]]'s decision,
    * read back from the executed plan). */
  def q147SnapSqlDml(spark: SparkSession, dir: String): DataFrame = {
    val (cat, tbl, loc) = ensureSqlLife(spark, dir)
    // SQL v4 ≡ Scala-API head: identical deltas through either door
    val api = Snap.read(spark, ensureCust(spark, dir))
    val sqlV4 = Snap.read(spark, loc, asOf = Some(4))
    val matches = bagEqual(sqlV4, api)
    // pruning probe through the catalog (plan-time stats skipping)
    val hi = (Snap.atVersion(spark, loc, 1).rangeMax + 1) / 8
    val probe = spark.sql(
      s"SELECT c_custkey, c_acctbal FROM $cat.$tbl WHERE c_custkey < $hi")
    probe.collect()
    val plan = probe.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.collectFirst { case s: SnapScan => s }
    val prunedOk = scan.exists(s =>
      s.plannedFiles > 0 && s.plannedFiles < s.totalFiles)
    spark.sql(
      s"""SELECT c_nationkey, count(*) AS n_rows,
         |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
         |  count(CASE WHEN c_mktsegment = 'NEWSEG' THEN 1 END) AS n_new,
         |  count(CASE WHEN c_mktsegment = 'SQLSEG' THEN 1 END) AS n_sqlins
         |FROM $cat.$tbl GROUP BY c_nationkey""".stripMargin)
      .withColumn("sql_matches_api", lit(if (matches) 1 else 0))
      .withColumn("sql_pruned_ok", lit(if (prunedOk) 1 else 0))
  }

  val q147Sql: String =
    s"""WITH $d1Sql,
       |d2_upd AS (
       |  SELECT c_custkey, c_name, c_nationkey, c_acctbal - 500 AS c_acctbal,
       |         c_mktsegment
       |  FROM customer WHERE c_custkey >= (SELECT m // 5 FROM ks)
       |    AND c_custkey < (SELECT m // 4 FROM ks)),
       |d2_keys AS (
       |  SELECT c_custkey FROM d2_upd
       |  UNION ALL SELECT c_custkey + (SELECT m FROM ks) AS c_custkey
       |  FROM customer WHERE c_custkey % 200 = 1),
       |v4 AS (
       |  SELECT * FROM v2
       |    WHERE c_custkey NOT IN (SELECT c_custkey FROM d2_keys)
       |  UNION ALL SELECT * FROM d2_upd),
       |v5 AS (
       |  SELECT * FROM v4
       |  UNION ALL
       |  SELECT c_custkey + 3 * (SELECT m FROM ks) AS c_custkey,
       |         'sqlins' AS c_name, c_nationkey, 77.77 AS c_acctbal,
       |         'SQLSEG' AS c_mktsegment
       |  FROM customer WHERE c_custkey % 50 = 7)
       |SELECT c_nationkey, count(*) AS n_rows,
       |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
       |  count(*) FILTER (WHERE c_mktsegment = 'NEWSEG') AS n_new,
       |  count(*) FILTER (WHERE c_mktsegment = 'SQLSEG') AS n_sqlins,
       |  1 AS sql_matches_api, 1 AS sql_pruned_ok
       |FROM v5 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q148
  private def dvTable(dir: String): String =
    s"graft_snapdv_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def dvFp(dir: String): String =
    Published.fingerprint("snapdv",
      Seq(new HPath(dir, "customer.parquet")))

  /** Attach-or-build the deletion-vector lifecycle: create →
    * mergeMor upsert (keys < M/10, so bucket 0 holds an outstanding
    * delta) → [[Snap.deleteVector]] of keys (k%10==3 ∪ k<M/20) — some
    * delta-resident (the residual path), most base-resident (the
    * positional path) → optimize (the fold). Four committed versions;
    * the face reads v3 THROUGH the outstanding DVs every run. */
  private def ensureDv(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, dvTable(dir))
    val fp = dvFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h => h.tag == fp && h.version == 4)
      if (!ok) {
        Snap.drop(spark, loc)
        Snap.create(spark, loc, Tables.customer(spark, dir),
          Seq("c_custkey"), "c_custkey", custBuckets, layout = "range",
          tag = fp)
        val m = keySpace(spark, dir)
        Snap.mergeMor(spark, loc,
          Tables.customer(spark, dir).filter(col("c_custkey") < m / 10)
            .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
            .withColumn("_deleted", lit(false)))
        Snap.deleteVector(spark, loc,
          Tables.customer(spark, dir)
            .filter(col("c_custkey") % 10 === 3 || col("c_custkey") < m / 20)
            .select(col("c_custkey")))
        val v = Snap.optimize(spark, loc, minFilesPerBucket = 2)
        require(v == 4, s"expected the DV fold to commit v4, got $v")
      }
    }
    loc
  }

  /** Content face over the deletion-vector lifecycle, read AT v3 —
    * through the outstanding DVs — with four manifest-metadata audits:
    * the DV commit carried every base file by reference
    * (`dv_carried_ok`), its vectors are slim positional files
    * targeting live base files (`dv_positional_ok`), the
    * delta-resident keys landed as ONE slim residual delta
    * (`dv_residual_ok`), and the fold's row set equals the DV-applied
    * read bit-for-bit (`dv_fold_ok` — v4 ≡ v3). */
  def q148SnapDv(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureDv(spark, dir)
    val v2 = Snap.atVersion(spark, loc, 2)
    val v3 = Snap.atVersion(spark, loc, 3)
    val carriedOk = v3.op == "dv" &&
      v3.files.map(_.path) == v2.files.map(_.path)
    val baseNames = v3.files.map(f => Snap.fileNameOf(f.path)).toSet
    val positionalOk = v3.dvs.nonEmpty &&
      v3.dvs.forall(v => baseNames.contains(Snap.dvTargetOf(v)))
    val residualOk = v3.deltas.size == v2.deltas.size + 1
    // the through-DV read feeds both the content face and the fold
    // audit — one materialization instead of two DV-masked reads (r20)
    val atV3 = Snap.read(spark, loc, asOf = Some(3)).localCheckpoint(true)
    val folded = Snap.read(spark, loc, asOf = Some(4))
    val foldOk = Snap.atVersion(spark, loc, 4).dvs.isEmpty &&
      bagEqual(atV3, folded)
    atV3.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
      .withColumn("dv_carried_ok", lit(if (carriedOk) 1 else 0))
      .withColumn("dv_positional_ok", lit(if (positionalOk) 1 else 0))
      .withColumn("dv_residual_ok", lit(if (residualOk) 1 else 0))
      .withColumn("dv_fold_ok", lit(if (foldOk) 1 else 0))
  }

  val q148Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |v2 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey < (SELECT m // 10 FROM ks)
      |         THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer),
      |v3 AS (
      |  SELECT * FROM v2
      |  WHERE NOT (c_custkey % 10 = 3
      |             OR c_custkey < (SELECT m // 20 FROM ks)))
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  1 AS dv_carried_ok, 1 AS dv_positional_ok,
      |  1 AS dv_residual_ok, 1 AS dv_fold_ok
      |FROM v3 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q149
  private def wapTable(dir: String): String =
    s"graft_snapwap_${java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(dir.getBytes("UTF-8")))}"
  private def wapFp(dir: String): String =
    Published.fingerprint("snapwap",
      Seq(new HPath(dir, "customer.parquet")))

  /** Attach-or-build the write-audit-publish lifecycle
    * ([[SnapBranch]]): create → fork a BAD branch (a poisoned batch),
    * audit it RED, drop it (main never sees a row) → fork the real
    * branch, stage the CDC delta on it, audit it GREEN against exactly
    * what publish will make live, publish (one fast-forward commit,
    * `op=publish`). Two main versions total — the bad batch left no
    * version behind. */
  private def ensureWap(spark: SparkSession, dir: String): HPath = {
    val loc = Published.tableLoc(spark, wapTable(dir))
    val fp = wapFp(dir)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h =>
        h.tag == fp && h.version == 2 && h.op == "publish")
      if (!ok) {
        Snap.drop(spark, loc)
        val c = Tables.customer(spark, dir)
        Snap.create(spark, loc, c, Seq("c_custkey"), "c_custkey",
          custBuckets, layout = "range", tag = fp)
        val m = keySpace(spark, dir)
        // the blocked round: stage rot, audit, drop
        SnapBranch.create(spark, loc, "bad")
        SnapBranch.merge(spark, loc, "bad",
          c.filter(col("c_custkey") < m / 30)
            .withColumn("c_acctbal", lit(-999999.0))
            .withColumn("_deleted", lit(false)))
        val rot = SnapBranch.read(spark, loc, "bad")
          .filter(col("c_acctbal") < -900000.0).limit(1).count()
        require(rot > 0, "wap lifecycle: the audit must SEE the rot")
        SnapBranch.drop(spark, loc, "bad")
        // the published round
        SnapBranch.create(spark, loc, "stage")
        SnapBranch.merge(spark, loc, "stage",
          c.filter(col("c_custkey") < m / 10)
            .withColumn("c_acctbal", col("c_acctbal") + lit(1000.0))
            .withColumn("_deleted", lit(false))
            .unionByName(c.filter(col("c_custkey") >= m / 2 &&
                col("c_custkey") < m / 2 + m / 20)
              .withColumn("_deleted", lit(true))))
        val audit = SnapBranch.read(spark, loc, "stage")
          .filter(col("c_acctbal") < -900000.0).limit(1).count()
        require(audit == 0, "wap lifecycle: the audit gate must be green")
        val v = SnapBranch.publish(spark, loc, "stage")
        require(v == 2, s"wap lifecycle: expected publish at v2, got $v")
      }
    }
    loc
  }

  /** Content face over the published head plus the WAP audits, all
    * recomputable from metadata on every attach: the head IS a
    * `publish` commit fast-forwarded from the fork (`wap_publish_ok`),
    * no branch chain remains (`wap_clean_ok`), the blocked batch left
    * no main version behind (version 2 total — `wap_blocked_ok`), and
    * the audit rule holds over the LIVE rows (`wap_audit_ok`). */
  def q149SnapWap(spark: SparkSession, dir: String): DataFrame = {
    val loc = ensureWap(spark, dir)
    val h = Snap.head(spark, loc).get
    val publishOk = h.op == "publish" && h.version == 2 && h.base == 1
    val cleanOk = SnapBranch.list(spark, loc).isEmpty
    val blockedOk = h.version == 2 // the dropped branch never landed
    val live = Snap.read(spark, loc)
    val auditOk = live.filter(col("c_acctbal") < -900000.0)
      .limit(1).count() == 0
    live.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
      .withColumn("wap_publish_ok", lit(if (publishOk) 1 else 0))
      .withColumn("wap_clean_ok", lit(if (cleanOk) 1 else 0))
      .withColumn("wap_blocked_ok", lit(if (blockedOk) 1 else 0))
      .withColumn("wap_audit_ok", lit(if (auditOk) 1 else 0))
  }

  val q149Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |v2 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey < (SELECT m // 10 FROM ks)
      |         THEN c_acctbal + 1000 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer
      |  WHERE NOT (c_custkey >= (SELECT m // 2 FROM ks)
      |             AND c_custkey < (SELECT m // 2 + m // 20 FROM ks)))
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  1 AS wap_publish_ok, 1 AS wap_clean_ok,
      |  1 AS wap_blocked_ok, 1 AS wap_audit_ok
      |FROM v2 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q150
  /** SQL time travel through the catalog front door, over the q147
    * lifecycle table: `VERSION AS OF 1` must serve the CTAS snapshot
    * bit-for-bit (the oracle recomputes it from raw customer);
    * `TIMESTAMP AS OF` must resolve each manifest's own commit instant
    * back to exactly that version (`ts_ok`); a BRANCH name under
    * `VERSION AS OF` must serve the branch head that the Scala audit
    * read serves (`branch_ok`); and a pinned table must drop
    * BATCH_WRITE from its capabilities (`pin_ok`). */
  def q150SnapSqlAsOf(spark: SparkSession, dir: String): DataFrame = {
    val (cat, tbl, loc) = ensureSqlLife(spark, dir)
    val fs = Published.fsOf(loc)
    val head = Snap.head(spark, loc).get
    val t1 = fs.getFileStatus(Snap.manifestPath(loc, 1)).getModificationTime
    val tH = fs.getFileStatus(
      Snap.manifestPath(loc, head.version)).getModificationTime
    val tsOk = Snap.versionAsOfTimestamp(spark, loc, t1).version == 1 &&
      Snap.versionAsOfTimestamp(spark, loc, tH).version == head.version
    // fork → SQL-read ≡ Scala audit read → drop (idempotent per run)
    val bName = "q150audit"
    if (SnapBranch.head(spark, loc, bName).isEmpty)
      SnapBranch.create(spark, loc, bName)
    val bSql = spark.sql(s"SELECT * FROM $cat.$tbl VERSION AS OF '$bName'")
    val bApi = SnapBranch.read(spark, loc, bName)
    val branchOk = bagEqual(bSql, bApi)
    SnapBranch.drop(spark, loc, bName)
    val pinned = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], tbl), "1")
    val pinOk = !pinned.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability.BATCH_WRITE)
    spark.sql(s"SELECT * FROM $cat.$tbl VERSION AS OF 1")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"))
      .withColumn("ts_ok", lit(if (tsOk) 1 else 0))
      .withColumn("branch_ok", lit(if (branchOk) 1 else 0))
      .withColumn("pin_ok", lit(if (pinOk) 1 else 0))
  }

  val q150Sql: String =
    """SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  1 AS ts_ok, 1 AS branch_ok, 1 AS pin_ok
      |FROM customer GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q151
  /** Attach-or-build a lifecycle driven by SQL DML plus `CALL`
    * procedures end to end: CTAS (v1) → `UPDATE` +100 on keys ≡ 0
    * (mod 7) (v2) → `CALL create_branch` + branch-staged segment
    * rewrite of keys < M/10 + `CALL publish_branch` (v3, one
    * fast-forward commit) → `CALL rebucket(16)` (v4, content-neutral)
    * → `CALL optimize` (no-op fold) → `CALL vacuum(keep 2)` (v1/v2
    * manifests beyond the horizon swept). */
  private def ensureProcLife(spark: SparkSession,
                             dir: String): (String, String, HPath) = {
    val (cat, root) = sqlCat(spark, dir)
    val fpH = java.lang.Long.toHexString(
      graft.expressions.GraftHash.h60(custFp(dir).getBytes("UTF-8")))
    val tbl = s"p_$fpH"
    val loc = new HPath(root, tbl)
    Published.withLeaseAwaiting(loc, s"snapops:${loc.getName}") {
      val ok = Snap.head(spark, loc).exists(h =>
        h.version == 4 && h.buckets == 16 && h.op == "rebucket")
      if (!ok) {
        if (Published.exists(Published.fsOf(loc), loc)) Snap.drop(spark, loc)
        Tables.customer(spark, dir)
          .createOrReplaceTempView("graft_q151_customer")
        val m = keySpace(spark, dir)
        spark.sql(s"CREATE TABLE $cat.$tbl TBLPROPERTIES (" +
          "'key'='c_custkey','buckets'='8','layout'='range') " +
          "AS SELECT * FROM graft_q151_customer")
        spark.sql(s"UPDATE $cat.$tbl SET c_acctbal = c_acctbal + 100.0 " +
          "WHERE c_custkey % 7 = 0")
        spark.sql(s"CALL $cat.system.create_branch('$tbl', 'wap')")
        SnapBranch.merge(spark, loc, "wap",
          Snap.read(spark, loc).filter(col("c_custkey") < m / 10)
            .withColumn("c_mktsegment", lit("WAPSEG"))
            .withColumn("_deleted", lit(false)))
        spark.sql(s"CALL $cat.system.publish_branch('$tbl', 'wap')")
        spark.sql(s"CALL $cat.system.rebucket('$tbl', 16)")
        spark.sql(s"CALL $cat.system.optimize('$tbl')")
        spark.sql(s"CALL $cat.system.vacuum('$tbl', keep_versions => 2)")
      }
    }
    (cat, tbl, loc)
  }

  /** Content face over the procedure-driven lifecycle, plus audits
    * recomputable on every attach: `CALL history` returns exactly the
    * engine's history frame (`history_sql_ok`), the head is the
    * 16-bucket rebucket commit (`rebucket_ok`), v3 is the branch
    * publish (`publish_ok`), and the vacuumed v1 now refuses loudly —
    * the horizon moved (`horizon_ok`). */
  def q151SnapProcedures(spark: SparkSession, dir: String): DataFrame = {
    val (cat, tbl, loc) = ensureProcLife(spark, dir)
    val histSql = spark.sql(s"CALL $cat.system.history('$tbl')")
    val histApi = Snap.history(spark, loc)
    val historyOk = bagEqual(histSql, histApi)
    val h = Snap.head(spark, loc).get
    val rebucketOk = h.op == "rebucket" && h.buckets == 16 && h.version == 4
    val publishOk = Snap.atVersion(spark, loc, 3).op == "publish"
    val horizonOk = scala.util.Try(Snap.atVersion(spark, loc, 1)).isFailure
    spark.sql(s"SELECT * FROM $cat.$tbl")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("tot_bal"),
        count(when(col("c_mktsegment") === "WAPSEG", 1)).as("n_wap"))
      .withColumn("history_sql_ok", lit(if (historyOk) 1 else 0))
      .withColumn("rebucket_ok", lit(if (rebucketOk) 1 else 0))
      .withColumn("publish_ok", lit(if (publishOk) 1 else 0))
      .withColumn("horizon_ok", lit(if (horizonOk) 1 else 0))
  }

  val q151Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer),
      |v2 AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 7 = 0
      |         THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer),
      |v3 AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |    CASE WHEN c_custkey < (SELECT m // 10 FROM ks)
      |         THEN 'WAPSEG' ELSE c_mktsegment END AS c_mktsegment
      |  FROM v2)
      |SELECT c_nationkey, count(*) AS n_rows,
      |  round(sum(c_acctbal) + 1e-9, 2) AS tot_bal,
      |  count(*) FILTER (WHERE c_mktsegment = 'WAPSEG') AS n_wap,
      |  1 AS history_sql_ok, 1 AS rebucket_ok,
      |  1 AS publish_ok, 1 AS horizon_ok
      |FROM v3 GROUP BY c_nationkey""".stripMargin

  // --------------------------------------------------------------- q152
  /** The catalog's `t$changes` METADATA TABLE (batch CDF) over the
    * q147 SQL lifecycle: per-(version, change-type) row counts of the
    * full replay — the create seeds every row as an upsert, each COW
    * step emits exactly its value-changed upserts and leftover deletes
    * (rewrite survivors suppressed), all recomputed by the oracle from
    * the raw table and the lifecycle's M-relative delta definitions. */
  def q152SnapChangesSql(spark: SparkSession, dir: String): DataFrame = {
    val (cat, tbl, _) = ensureSqlLife(spark, dir)
    spark.sql(
      s"""SELECT _commit_version AS version, _change_type AS change,
         |  count(*) AS n
         |FROM $cat.`$tbl$$changes` GROUP BY 1, 2""".stripMargin)
  }

  val q152Sql: String =
    """WITH ks AS (SELECT max(c_custkey) + 1 AS m FROM customer)
      |SELECT 1 AS version, 'upsert' AS change, count(*) AS n FROM customer
      |UNION ALL SELECT 2, 'upsert',
      |  (SELECT count(*) FROM customer
      |     WHERE c_custkey < (SELECT m // 10 FROM ks)) +
      |  (SELECT count(*) FROM customer WHERE c_custkey % 100 = 1)
      |UNION ALL SELECT 2, 'delete',
      |  (SELECT count(*) FROM customer
      |     WHERE c_custkey >= (SELECT m // 2 FROM ks)
      |       AND c_custkey < (SELECT m // 2 + m // 20 FROM ks))
      |UNION ALL SELECT 3, 'upsert',
      |  (SELECT count(*) FROM customer
      |     WHERE c_custkey >= (SELECT m // 5 FROM ks)
      |       AND c_custkey < (SELECT m // 4 FROM ks))
      |UNION ALL SELECT 4, 'delete',
      |  (SELECT count(*) FROM customer WHERE c_custkey % 200 = 1)
      |UNION ALL SELECT 5, 'upsert',
      |  (SELECT count(*) FROM customer WHERE c_custkey % 50 = 7)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_snap_merge" -> q130SnapMerge _,
    "q131_snap_time_travel" -> q131SnapTimeTravel _,
    "q132_snap_prune" -> q132SnapPrune _,
    "q133_snap_optimize" -> q133SnapOptimize _,
    "q134_snap_evolve" -> q134SnapEvolve _,
    "q135_snap_scd2" -> q135SnapScd2 _,
    "q136_snap_changelog" -> q136SnapChangelog _,
    "q137_snap_rename_drop" -> q137SnapRenameDrop _,
    "q138_snap_zorder" -> q138SnapZorder _,
    "q139_snap_retention" -> q139SnapRetention _,
    "q140_snap_occ" -> q140SnapOcc _,
    "q141_snap_mor" -> q141SnapMor _,
    "q142_snap_sql" -> q142SnapSql _,
    "q143_snap_rebucket" -> q143SnapRebucket _,
    "q144_snap_cdf_pre" -> q144SnapCdfPre _,
    "q145_snap_changelog_chunked" -> q145SnapChangelogChunked _,
    "q146_snap_history" -> q146SnapHistory _,
    "q147_snap_sql_dml" -> q147SnapSqlDml _,
    "q148_snap_dv" -> q148SnapDv _,
    "q149_snap_wap" -> q149SnapWap _,
    "q150_snap_sql_asof" -> q150SnapSqlAsOf _,
    "q151_snap_procedures" -> q151SnapProcedures _,
    "q152_snap_changes_sql" -> q152SnapChangesSql _,
  )

  val oracle: Map[String, String] = Map(
    "q130_snap_merge" -> q130Sql,
    "q131_snap_time_travel" -> q131Sql,
    "q132_snap_prune" -> q132Sql,
    "q133_snap_optimize" -> q133Sql,
    "q134_snap_evolve" -> q134Sql,
    "q135_snap_scd2" -> q135Sql,
    "q136_snap_changelog" -> q136Sql,
    "q137_snap_rename_drop" -> q137Sql,
    "q138_snap_zorder" -> q138Sql,
    "q139_snap_retention" -> q139Sql,
    "q140_snap_occ" -> q140Sql,
    "q141_snap_mor" -> q141Sql,
    "q142_snap_sql" -> q142Sql,
    "q143_snap_rebucket" -> q143Sql,
    "q144_snap_cdf_pre" -> q144Sql,
    "q145_snap_changelog_chunked" -> q145Sql,
    "q146_snap_history" -> q146Sql,
    "q147_snap_sql_dml" -> q147Sql,
    "q148_snap_dv" -> q148Sql,
    "q149_snap_wap" -> q149Sql,
    "q150_snap_sql_asof" -> q150Sql,
    "q151_snap_procedures" -> q151Sql,
    "q152_snap_changes_sql" -> q152Sql,
  )
}
