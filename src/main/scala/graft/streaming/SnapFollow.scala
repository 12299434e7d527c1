package graft.streaming

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.{Published, Snap}

/** Follow a [[graft.sources.Snap]] table's commits as a stream — the
  * READ-side twin of [[SnapCdc]], closing the table-to-table loop: a
  * writer lands commits on a source table; the follower turns each new
  * version into one changelog micro-batch ([[Snap.changes]], O(delta))
  * and applies it to a destination table. Together they give the
  * engine end-to-end incremental pipelines: ingest → snap table →
  * follower → derived snap table, every hop mutation-capable and
  * exactly-once, the shape the reference's N-region continuous
  * producer (`regionSpout.go:82-94`) feeds at the front.
  *
  * **The offset ledger is the destination table itself.** Classic
  * streaming sources track offsets in the CHECKPOINT, leaving the
  * dreaded sink/checkpoint dual-commit window. Here the source's
  * version chain IS the offset sequence, and the follower's cursor
  * (highest source version applied) rides in the destination's
  * `applied` manifest field — committed ATOMICALLY with the rows it
  * accounts for, via the same [[Snap.mergeStreaming]] high-water that
  * makes the CDC sink exactly-once. A driver death anywhere leaves no
  * window: the restarted follower reads the cursor out of the
  * destination's head manifest and resumes; a replayed poll is a no-op
  * by construction. The streaming checkpoint carries nothing but the
  * tick source's bookkeeping — wiping it is harmless, which is why the
  * follower stamps SOURCE identity (not checkpoint id) as the
  * destination's lineage ([[Snap.assertFollowLineage]]).
  *
  * Catch-up semantics: a follower that wakes up N versions behind
  * applies the whole backlog as ONE merge — the changelog rows are
  * collapsed latest-wins per key first (window by key on
  * `_commit_version`), so a key updated five times and deleted lands
  * as a single delete. Optional `transform` reshapes each batch
  * (project/filter — must keep the destination's key columns).
  *
  * At 100 TB: each poll moves the BACKLOG'S delta bytes, never a
  * snapshot; the latest-wins window shuffles only changelog rows; a
  * lagging follower that falls past the source's vacuum horizon fails
  * loudly in [[Snap.changes]] (retention is the replayability budget —
  * the same contract the public formats document). */
object SnapFollow {

  /** Default catch-up bound per poll (r18 advice): an UNBOUNDED poll
    * over a deep backlog — the year-running deployment waking up
    * thousands of versions behind — would hand [[Snap.changes]] an
    * O(backlog) range in one tick; the chunked changelog bounds the
    * PLAN, but one merge over a whole year of deltas is still the
    * wrong unit of work (memory, retry granularity, lease hold). 64
    * versions per tick catches up a deep backlog in bounded strides;
    * callers with tighter latency/memory budgets pass their own. */
  val defaultMaxVersionsPerPoll: Int = 64

  /** The identity a follower stamps on its destination: qualified
    * source location PLUS the source's creation tag — the path alone
    * would let a dropped-and-recreated source at the same path pass
    * the lineage check while its restarted version counter aliases the
    * destination's cursor (the same shape as a wiped checkpoint; r18
    * review finding). The tag is the create-time lineage stamp, so a
    * recreation changes the identity and refuses loudly. */
  def srcIdentity(spark: SparkSession, src: HPath): String =
    identityOf(src, Snap.head(spark, src).map(_.tag).getOrElse(
      sys.error(s"snap follow: source $src never committed")))

  /** The ONE place the identity format lives (r19 review finding: the
    * stamp and the per-poll verification must never drift apart —
    * every stamping and checking site goes through here). */
  private def identityOf(src: HPath, tag: String): String =
    s"${Published.fsOf(src).makeQualified(src)}#$tag"

  /** Create the destination as a snapshot copy of the source's HEAD,
    * cursor pre-seeded (`applied` = the copied version) so the first
    * poll starts from the changelog AFTER the copy — attach-idempotent
    * like every snap create (same tag → no-op). Mirrors the source's
    * keys, bucketing, and layout: co-located merges downstream. */
  def ensureDst(spark: SparkSession, src: HPath, dst: HPath): Unit = {
    val m = Snap.head(spark, src).getOrElse(
      sys.error(s"snap follow: source $src never committed"))
    // mirror the source's whole LAYOUT config — a zorder source without
    // its second dimension (or declared stats columns) would refuse at
    // create / silently lose its pruning surface (r18 review finding).
    // The source's column MAPPING is deliberately not copied: the
    // destination is a fresh table whose physical names start at its
    // current logical names.
    Snap.create(spark, dst, Snap.read(spark, src, asOf = Some(m.version)),
      m.keyCols, m.bucketCol, m.buckets, m.layout,
      tag = s"follow:${srcIdentity(spark, src)}", applied = m.version.toLong,
      statsCols = m.statsCols, zorderBy = m.z2)
  }

  /** Bind-or-verify `dst`'s follow lineage against `src` — the manual
    * (non-stream) entry point; [[follow]] does this on its first tick. */
  def assertOrStamp(spark: SparkSession, src: HPath, dst: HPath): Unit =
    Snap.assertFollowLineage(dst, srcIdentity(spark, src))

  /** One follower step: read the source head, and if it is past the
    * destination's cursor, apply the collapsed changelog
    * `(cursor, head]` as one exactly-once merge. Returns the source
    * version now reflected in the destination (the cursor after the
    * step). Safe to call concurrently with source writers (the
    * changelog reads immutable committed versions) and safe to REPLAY
    * (the cursor high-water makes a duplicate poll a no-op).
    *
    * Lineage is verified on EVERY step, not just [[follow]]'s first
    * tick (r18 advice): a direct caller pointing an existing
    * destination at a DIFFERENT source whose version numbers happen to
    * align would pass the cursor checks and silently apply a foreign
    * changelog. The landed-stamp fast path is one retried read — no
    * lease taken; a never-stamped destination is stamped here. */
  def pollOnce(spark: SparkSession, src: HPath, dst: HPath,
               transform: DataFrame => DataFrame = identity,
               autoOptimize: Int = 0,
               maxVersionsPerPoll: Int = defaultMaxVersionsPerPoll,
               autoVacuum: Int = 0): Long = {
    require(maxVersionsPerPoll >= 1, "maxVersionsPerPoll must be >= 1")
    val srcHead = Snap.head(spark, src).getOrElse(
      sys.error(s"snap follow: source $src never committed"))
    Snap.assertFollowLineage(dst, identityOf(src, srcHead.tag))
    val dstHead = Snap.head(spark, dst).getOrElse(
      sys.error(s"snap follow: destination $dst never committed — " +
        "ensureDst first"))
    val cursor = dstHead.applied
    require(cursor >= 1,
      s"snap follow: destination $dst carries no source cursor " +
        s"(applied=$cursor) — it was not created by ensureDst")
    // a cursor PAST the source head can only mean the source chain
    // regressed under the follower (dropped + recreated at the same
    // path) — continuing would eventually apply a foreign changelog;
    // loud, like every lineage break (r18 review finding)
    require(srcHead.version >= cursor,
      s"snap follow: destination cursor $cursor is PAST the source head " +
        s"${srcHead.version} — the source was recreated; drop the " +
        "destination or point the follower elsewhere")
    if (srcHead.version <= cursor) return cursor
    // bound one poll's catch-up (memory/latency control on a deep
    // backlog — and the crash probe's lever for multi-step resume)
    val upTo = math.min(srcHead.version.toLong,
      cursor + maxVersionsPerPoll).toInt
    val keys = srcHead.keyCols
    val ch = Snap.changes(spark, src, cursor.toInt, upTo)
    // collapse the backlog latest-wins per key: one row per key, the
    // newest version's image; its change type decides upsert vs delete
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_commit_version").desc)
    val collapsed = ch.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .withColumn("_deleted", col("_change_type") === "delete")
      .drop("__graft_rn", "_change_type", "_commit_version")
    Snap.mergeStreaming(spark, dst, transform(collapsed),
      batchId = upTo.toLong, autoOptimize = autoOptimize,
      autoVacuum = autoVacuum)
    upTo.toLong
  }

  // ------------------------------------------- derived AGGREGATE tables
  // The follower's second shape (r18 verdict ask #5): instead of
  // mirroring rows, MAINTAIN a grouped aggregate of the source — q85's
  // incremental-view-maintenance lesson run continuously. Each poll
  // applies the changelog's GROUP DELTAS to the destination: inserts
  // add, deletes subtract pre-images, updates subtract the pre-image
  // and add the post-image (the `updatePreimages` CDF form — the old
  // value is exactly what an incremental aggregate needs). Exact by
  // construction: counts are longs, sums are DECIMAL (addition exact,
  // associative, commutative), so the maintained table equals a full
  // recompute bit-for-bit after every poll — the q85 discipline. At
  // 100 TB the poll moves the delta's rows plus O(affected groups):
  // the grouped contribution frame is tiny, the destination merge is
  // O(touched buckets).

  /** The maintained table's sum type: wide enough that adding a poll's
    * contribution never changes precision (the result is cast back). */
  private val SumType = "decimal(30,2)"

  // "agg2": the maintained shape gained the `nval` column in r20 (see
  // [[aggOf]]) — versioning the lineage tag makes an old-shaped
  // destination REFUSE a new-shaped poll loudly instead of failing
  // mid-merge on a missing column.
  private def aggIdentityOf(groupCol: String, valueCol: String,
                            base: String): String =
    s"agg2($groupCol,$valueCol):$base"

  private def aggIdentity(spark: SparkSession, src: HPath,
                          groupCol: String, valueCol: String): String =
    aggIdentityOf(groupCol, valueCol, srcIdentity(spark, src))

  /** The maintained table's exact shape: row count, NON-NULL value
    * count, and the sum over non-null values — `val_sum` is NULL when
    * `nval` is 0, exactly what SQL `sum` over an all-null group
    * returns. `nval` is what lets the incremental path reproduce that
    * NULL: without it, a group born with only null-valued rows (or
    * whose last non-null row was deleted) would read 0 via coalesce
    * where the recompute reads NULL (r19 advice). */
  private[graft] def aggOf(df: DataFrame, groupCol: String,
                           valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("cnt"),
        count(col(valueCol)).as("nval"),
        sum(col(valueCol).cast(SumType)).as("val_sum"))
      .select(col(groupCol), col("cnt"), col("nval"),
        col("val_sum").cast(SumType).as("val_sum"))

  /** Create the aggregate destination from the source's HEAD (one full
    * recompute — the LAST one it ever needs), cursor pre-seeded.
    * Hash-bucketed by the group column; attach-idempotent per the
    * (source identity, group, value) lineage tag. Null group values
    * are refused by the snap key contract — filter them upstream. */
  def ensureAggDst(spark: SparkSession, src: HPath, dst: HPath,
                   groupCol: String, valueCol: String,
                   buckets: Int = 8): Unit = {
    val m = Snap.head(spark, src).getOrElse(
      sys.error(s"snap follow: source $src never committed"))
    Snap.create(spark, dst,
      aggOf(Snap.read(spark, src, asOf = Some(m.version)), groupCol, valueCol),
      Seq(groupCol), groupCol, buckets, layout = "hash",
      tag = s"follow:${aggIdentity(spark, src, groupCol, valueCol)}",
      applied = m.version.toLong)
  }

  /** One maintenance step: apply the changelog `(cursor, head]`'s
    * group deltas to the aggregate destination, exactly-once through
    * the same destination-manifest cursor as [[pollOnce]]. A group
    * whose count reaches zero is DELETED (matching the recompute,
    * which would not emit it). Returns the new cursor. */
  def pollOnceAgg(spark: SparkSession, src: HPath, dst: HPath,
                  groupCol: String, valueCol: String,
                  maxVersionsPerPoll: Int = defaultMaxVersionsPerPoll,
                  autoOptimize: Int = 0, autoVacuum: Int = 0): Long = {
    require(maxVersionsPerPoll >= 1, "maxVersionsPerPoll must be >= 1")
    val srcHead = Snap.head(spark, src).getOrElse(
      sys.error(s"snap follow: source $src never committed"))
    // the stamped identity carries the aggregate SHAPE too: pointing a
    // (group, value)-maintained table at a differently-shaped poll
    // would silently corrupt it exactly like a foreign source
    Snap.assertFollowLineage(dst,
      aggIdentityOf(groupCol, valueCol, identityOf(src, srcHead.tag)))
    val dstHead = Snap.head(spark, dst).getOrElse(
      sys.error(s"snap follow: destination $dst never committed — " +
        "ensureAggDst first"))
    val cursor = dstHead.applied
    require(cursor >= 1,
      s"snap follow: destination $dst carries no source cursor")
    require(srcHead.version >= cursor,
      s"snap follow: destination cursor $cursor is PAST the source head " +
        s"${srcHead.version} — the source was recreated")
    if (srcHead.version <= cursor) return cursor
    val upTo = math.min(srcHead.version.toLong,
      cursor + maxVersionsPerPoll).toInt
    val ch = Snap.changes(spark, src, cursor.toInt, upTo,
      updatePreimages = true)
    val signed = ch.withColumn("__graft_sign",
      when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L))
    // null-valued rows contribute to dcnt but not dnval/dval (`sum`
    // skips null inputs, so the when-chain needs no null arm)
    val contrib = signed.groupBy(col(groupCol))
      .agg(sum(col("__graft_sign")).as("dcnt"),
        sum(when(col(valueCol).isNotNull, col("__graft_sign"))).as("dnval"),
        sum(when(col("__graft_sign") > 0, col(valueCol).cast(SumType))
          .otherwise(-col(valueCol).cast(SumType))).as("dval"))
    // current values for ONLY the affected groups (contrib is tiny —
    // AQE broadcasts it; the destination never fully rewrites)
    val cur = Snap.read(spark, dst)
      .join(contrib.select(col(groupCol)), Seq(groupCol), "left_semi")
    val next = cur.join(contrib, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L)))
          .as("cnt"),
        (coalesce(col("nval"), lit(0L)) + coalesce(col("dnval"), lit(0L)))
          .as("nval"),
        (coalesce(col("val_sum"), lit(0).cast(SumType)) +
          coalesce(col("dval"), lit(0).cast(SumType)))
          .cast(SumType).as("val_sum"))
      // a group whose live rows are all null-valued reads NULL, not the
      // running 0 — bit-for-bit the recompute's `sum` (r19 advice)
      .withColumn("val_sum",
        when(col("nval") === 0L, lit(null).cast(SumType))
          .otherwise(col("val_sum")))
      .withColumn("_deleted", col("cnt") === 0L)
    Snap.mergeStreaming(spark, dst, next, batchId = upTo.toLong,
      autoOptimize = autoOptimize, autoVacuum = autoVacuum)
    upTo.toLong
  }

  /** Continuous form of [[pollOnceAgg]] — the maintained-aggregate
    * pipeline: rate ticks schedule maintenance, the destination is
    * created (one full recompute, the last ever) if absent, all
    * progress state in the destination's manifests. */
  def followAgg(spark: SparkSession, src: String, dst: String,
                checkpointDir: String, groupCol: String, valueCol: String,
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000L),
                maxVersionsPerPoll: Int = defaultMaxVersionsPerPoll,
                autoOptimize: Int = 0,
                autoVacuum: Int = 0): StreamingQuery = {
    val srcP = new HPath(src)
    val dstP = new HPath(dst)
    ensureAggDst(spark, srcP, dstP, groupCol, valueCol)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
    ticks.writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        pollOnceAgg(spark, srcP, dstP, groupCol, valueCol,
          maxVersionsPerPoll, autoOptimize, autoVacuum)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Start the continuous follower: a rate tick schedules [[pollOnce]]
    * every trigger; the destination is created from the source head if
    * absent, and bound to the source's identity on the first tick.
    * The checkpoint only paces the ticks — all progress state lives in
    * the destination's manifests (see the object doc). */
  def follow(spark: SparkSession, src: String, dst: String,
             checkpointDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.ProcessingTime(1000L),
             transform: DataFrame => DataFrame = identity,
             autoOptimize: Int = 0,
             maxVersionsPerPoll: Int = defaultMaxVersionsPerPoll,
             autoVacuum: Int = 0): StreamingQuery = {
    val srcP = new HPath(src)
    val dstP = new HPath(dst)
    ensureDst(spark, srcP, dstP)
    val ticks = spark.readStream.format("rate")
      .option("rowsPerSecond", 1).load()
    ticks.writeStream
      .foreachBatch { (_: DataFrame, _: Long) =>
        // lineage rides inside pollOnce now — every tick, not first-only
        pollOnce(spark, srcP, dstP, transform, autoOptimize,
          maxVersionsPerPoll, autoVacuum)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
