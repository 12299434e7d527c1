package graft

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{Published, Snap, Tables}

/** Cross-JVM crash probe for the [[graft.sources.Snap]] commit protocol
  * (crash_probes.sh leg G) — the repo's standard: every crash-safety
  * claim is executed across a REAL process boundary, in all three
  * storage modes.
  *
  * The protocol has one commit point (the manifest create), so the
  * windows are:
  *   - `snapstage`  — die after the data files moved into `data/` but
  *     before the manifest create: the head must not advance, the
  *     orphans must stay invisible, vacuum must sweep exactly them,
  *     and a retried merge must land.
  *   - `snaptorn`   — die MID-create: the manifest bytes land WITHOUT
  *     the checksum footer (what a killed PUT leaves on a store
  *     without create atomicity for content). Readers must fall back
  *     to the parent version; the retried merge must sweep the torn
  *     file and retake the version.
  *   - `snapcommit` — die right AFTER the create: the commit must be
  *     durable — a fresh JVM serves the new version with no healing.
  *
  * Each window's healer also exercises the dead writer's lease
  * stale-break (the crashed JVM died holding it; the probe shrinks
  * SPARK_GRAFT_LEASE_STALE_MS).
  *
  * Phases: `gbase <sf> <loc>` seeds create+merge (v2); `gcrash <sf>
  * <loc> <window> <round>` runs the round's merge with the window env
  * armed (exits 137); `gheal <sf> <loc> <window> <round>` asserts the
  * exact torn state, heals, and validates FULL row-set equality
  * against the relationally-applied delta chain. */
object SnapCrashProbe {

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse("gbase")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val loc = new HPath(args.lift(2).getOrElse("/tmp/graft_snap_probe/tbl"))
    val spark = Session.builderFromEnv(8, 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cust = Tables.customer(spark, sfDir)
    lazy val M: Long = cust.agg(max(col("c_custkey"))).head.getLong(0) + 1L

    // the delta chain: round 1 applied by gbase, rounds 2-4 by the
    // crash/heal pairs. Update ranges are pairwise disjoint and avoid
    // the deleted range, so the expected state composes by cases.
    def upd(loN: Long, hiN: Long, shift: Double): DataFrame =
      cust.filter(col("c_custkey") >= loN && col("c_custkey") < hiN)
        .withColumn("c_acctbal", col("c_acctbal") + lit(shift))
        .withColumn("_deleted", lit(false))
    def inserts: DataFrame =
      cust.filter(col("c_custkey") < M / 30)
        .select((col("c_custkey") + M).as("c_custkey"), col("c_name"),
          col("c_nationkey"), lit(9.99).as("c_acctbal"),
          lit("INS").as("c_mktsegment"))
    def delta(round: Int): DataFrame = round match {
      case 1 => // update [0, M/10) +1000; delete [M/2, M/2+M/20); insert
        upd(0, M / 10, 1000.0)
          .unionByName(cust.filter(col("c_custkey") >= M / 2 &&
              col("c_custkey") < M / 2 + M / 20)
            .withColumn("_deleted", lit(true)))
          .unionByName(inserts.withColumn("_deleted", lit(false)))
      case 2 => // update [M/5, M/4) -250; delete the even-keyed inserts
        upd(M / 5, M / 4, -250.0)
          .unionByName(inserts.withColumn("_deleted", lit(true))
            .filter(col("c_custkey") % 2 === 0))
      case 3 => upd(M / 4, M / 3, 7.0)
      case 4 => upd(M / 3, M / 2, -1.0)
      case n => sys.error(s"no delta for round $n")
    }

    /** Leg H's micro-batch delta k: re-price keys [10k, 10k+10) by
      * +(k+1). Disjoint ranges — order-free composition. */
    def cdcDelta(k: Int): DataFrame =
      cust.filter(col("c_custkey") >= k * 10 && col("c_custkey") < k * 10 + 10)
        .withColumn("c_acctbal", col("c_acctbal") + (k + 1).toDouble)
        .withColumn("_deleted", lit(false))

    /** The delta chain applied relationally — the probe's oracle. */
    def expected(rounds: Int): DataFrame = {
      var cur = cust
      if (rounds >= 1) {
        cur = cur.filter(!(col("c_custkey") >= M / 2 &&
            col("c_custkey") < M / 2 + M / 20))
          .withColumn("c_acctbal",
            when(col("c_custkey") < M / 10, col("c_acctbal") + 1000.0)
              .otherwise(col("c_acctbal")))
          .unionByName(inserts)
      }
      if (rounds >= 2) {
        cur = cur.filter(!(col("c_custkey") >= M && col("c_custkey") % 2 === 0))
          .withColumn("c_acctbal",
            when(col("c_custkey") >= M / 5 && col("c_custkey") < M / 4,
              col("c_acctbal") - 250.0).otherwise(col("c_acctbal")))
      }
      if (rounds >= 3)
        cur = cur.withColumn("c_acctbal",
          when(col("c_custkey") >= M / 4 && col("c_custkey") < M / 3,
            col("c_acctbal") + 7.0).otherwise(col("c_acctbal")))
      if (rounds >= 4)
        cur = cur.withColumn("c_acctbal",
          when(col("c_custkey") >= M / 3 && col("c_custkey") < M / 2,
            col("c_acctbal") - 1.0).otherwise(col("c_acctbal")))
      cur
    }

    def assertSame(actual: DataFrame, exp: DataFrame, what: String): Unit = {
      val extra = actual.exceptAll(exp).count()
      val missing = exp.exceptAll(actual).count()
      require(extra == 0 && missing == 0,
        s"$what diverged: $extra extra, $missing missing rows")
    }

    phase match {
      case "gbase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "probe")
        val v = Snap.merge(spark, loc, delta(1))
        require(v == 2, s"gbase expected v2, got $v")
        assertSame(Snap.read(spark, loc), expected(1), "gbase state")
        println(s"SNAPPROBE gbase OK v=$v rows=${Snap.read(spark, loc).count()}")

      case "grace" =>
        // one racer of the two-JVM merge race (two_jvm_race.sh leg 4):
        // apply this round's delta; the table lease serializes rivals
        val round = args.lift(3).map(_.toInt).getOrElse(2)
        val v = Snap.merge(spark, loc, delta(round))
        println(s"SNAPPROBE grace OK round=$round v=$v")

      case "gcheck" =>
        // post-race validation: rounds 2 and 3 COMMUTE (disjoint update
        // ranges, disjoint delete sets), so whichever racer won the
        // lease first, the final content must equal the chain through
        // `rounds` — and the versions must have serialized, not torn
        val rounds = args.lift(3).map(_.toInt).getOrElse(3)
        val h = Snap.head(spark, loc).get
        require(h.version == rounds + 1,
          s"gcheck: head=${h.version}, want ${rounds + 1} (one commit per racer)")
        assertSame(Snap.read(spark, loc), expected(rounds), "post-race state")
        println(s"SNAPPROBE gcheck OK v=${h.version} " +
          s"rows=${Snap.read(spark, loc).count()}")

      case "gocc" =>
        // one racer of the OPTIMISTIC merge race (two_jvm_race.sh leg
        // 5): stage leaseless with a widened window (the hold makes
        // both racers' staging provably overlap in wall-clock — the
        // serialized path can never produce that), then commit through
        // the conflict-checked point. Rounds: dA/dB touch DISJOINT
        // buckets (the rebase path — neither may retry); oA/oB update
        // OVERLAPPING key ranges with commuting +shifts (the loser
        // must discard and retry, and both rows must land).
        val round = args.lift(3).getOrElse(sys.error("gocc needs a round"))
        Snap.occStageHold = () => Thread.sleep(3000)
        Snap.occTrace = s => { println(s"SNAPPROBE TRACE $s"); Console.flush() }
        // rendezvous BEFORE resolving: JVM boot skew (seconds) would
        // otherwise let one racer commit before the other even reads
        // the head, making the race vacuous — both must resolve the
        // SAME base for the rebase/conflict paths to be exercised
        val rivalRound = Map("dA" -> "dB", "dB" -> "dA",
          "oA" -> "oB", "oB" -> "oA", "mA" -> "mB", "mB" -> "mA")(round)
        val rdvFs = Published.fsOf(loc)
        scala.util.Using.resource(
          rdvFs.create(new HPath(loc.getParent, s"occ-ready-$round"), true))(
          _.write('1'.toByte))
        val rdvDeadline = System.currentTimeMillis() + 120000L
        val rivalMarker = new HPath(loc.getParent, s"occ-ready-$rivalRound")
        while (!rdvFs.exists(rivalMarker)) {
          require(System.currentTimeMillis() < rdvDeadline,
            s"gocc[$round]: rival racer never arrived at the rendezvous")
          Thread.sleep(100)
        }
        val d = round match {
          case "dA" => upd(M / 8, M / 8 + M / 16, 3.0)          // bucket 1
          case "dB" => upd(6 * M / 8, 6 * M / 8 + M / 16, -3.0) // bucket 6
          case "oA" => upd(M / 4, M / 4 + M / 16, 5.0)          // bucket 2
          case "oB" => upd(M / 4 + M / 32, M / 4 + M / 16 + M / 32, 11.0)
          // leg 6 (r19): an OCC writer (mA, bucket 2) races a MERGE-ON-
          // READ writer (mB, bucket 6 — lease-held, commits ONE delta
          // file). Range-disjoint, so whichever order the commits land,
          // mA must never conflict-retry: it either resolves mB's head
          // or REBASES over it carrying the delta file.
          case "mA" => upd(M / 4, M / 4 + M / 16, 5.0)          // bucket 2
          case "mB" => upd(6 * M / 8, 6 * M / 8 + M / 16, -3.0) // bucket 6
          case r => sys.error(s"unknown occ round $r")
        }
        val v =
          if (round == "mB") {
            // bias the MOR commit into the OCC rival's staging window
            Thread.sleep(500)
            Snap.mergeMor(spark, loc, d)
          } else Snap.mergeOcc(spark, loc, d)
        println(s"SNAPPROBE gocc OK round=$round v=$v")

      case "gocccheck" =>
        // post-race validation for leg 5. disjoint: head v4, the loser
        // REBASED (base < parent on exactly the last commit), both
        // shifts present. overlap: head v6 — the deltas are ABSOLUTE
        // upserts (source value + shift), so the contested key range
        // must hold exactly the LAST committer's values (the loser
        // re-merged against the winner's head; its rows then replace
        // matched keys — per-key last-writer-wins, never a blend, a
        // lost update, or a wrongly-allowed rebase). The script passes
        // which racer committed last (the one that logged a
        // conflict_retry).
        val stage = args.lift(3).getOrElse("disjoint")
        def shifted(cur: DataFrame, loN: Long, hiN: Long, s: Double) =
          cur.withColumn("c_acctbal",
            when(col("c_custkey") >= loN && col("c_custkey") < hiN,
              col("c_acctbal") + s).otherwise(col("c_acctbal")))
        var exp = expected(1)
        exp = shifted(exp, M / 8, M / 8 + M / 16, 3.0)
        exp = shifted(exp, 6 * M / 8, 6 * M / 8 + M / 16, -3.0)
        val wantV = if (stage == "disjoint") 4 else 6
        if (stage == "overlap") {
          // oA sets [M/4, M/4+M/16) to source+5; oB sets
          // [M/4+M/32, M/4+M/16+M/32) to source+11; the later commit
          // owns the intersection
          val last = args.lift(4).getOrElse(
            sys.error("gocccheck overlap needs the last committer (oA|oB)"))
          if (last == "oB") {
            exp = shifted(exp, M / 4, M / 4 + M / 32, 5.0)
            exp = shifted(exp, M / 4 + M / 32, M / 4 + M / 16 + M / 32, 11.0)
          } else {
            exp = shifted(exp, M / 4, M / 4 + M / 16, 5.0)
            exp = shifted(exp, M / 4 + M / 16, M / 4 + M / 16 + M / 32, 11.0)
          }
        }
        val h = Snap.head(spark, loc).get
        require(h.version == wantV,
          s"gocccheck[$stage]: head=${h.version}, want $wantV")
        if (stage == "disjoint") {
          val last = Snap.atVersion(spark, loc, 4)
          require(last.resolvedBase == 2 && last.parent == 3,
            s"gocccheck: the loser must have REBASED (base=2, parent=3), " +
              s"got base=${last.resolvedBase} parent=${last.parent}")
        }
        assertSame(Snap.read(spark, loc), exp, s"post-occ-race [$stage] state")
        println(s"SNAPPROBE gocccheck OK stage=$stage v=${h.version}")

      case "gcrash" =>
        val round = args.lift(4).map(_.toInt).getOrElse(2)
        // the armed env var (SPARK_GRAFT_SNAP_HALT / SPARK_GRAFT_SNAP_TORN)
        // halts this JVM inside merge; reaching the OK line is a FAILURE
        // the script detects
        Snap.merge(spark, loc, delta(round))
        println(s"SNAPPROBE gcrash OK (halt never fired)")

      case "gheal" =>
        val window = args.lift(3).getOrElse("snapstage")
        val round = args.lift(4).map(_.toInt).getOrElse(2)
        val fs = Published.fsOf(loc)
        val headV = Snap.head(spark, loc).get.version
        // versions: create=1, round-1 merge=2, round-k merge = k+1
        val expectHead = round + 1
        window match {
          case "snapstage" =>
            require(headV == expectHead - 1,
              s"snapstage: head=$headV, crashed merge must not have advanced it")
            val orphans = fs.listStatus(new HPath(loc, "data"))
              .map(_.getPath.getName).count(_.startsWith(s"v$expectHead-"))
            require(orphans > 0, "snapstage: no orphan files — vacuous window")
            assertSame(Snap.read(spark, loc), expected(round - 1),
              "pre-heal head state")
            val (_, swept, _) = Snap.vacuum(spark, loc, keepVersions = 99)
            require(swept == orphans,
              s"vacuum swept $swept of $orphans orphans")
          case "snaptorn" =>
            require(headV == expectHead - 1,
              s"snaptorn: head=$headV, a TORN manifest must not serve")
            require(fs.exists(Snap.manifestPath(loc, expectHead)),
              "snaptorn: the torn manifest is missing — vacuous window")
            assertSame(Snap.read(spark, loc), expected(round - 1),
              "pre-heal head state")
          case "snapcommit" =>
            require(headV == expectHead,
              s"snapcommit: head=$headV != $expectHead — the landed commit " +
                "must be durable")
          case w => sys.error(s"unknown window $w")
        }
        if (headV < expectHead) {
          val v = Snap.merge(spark, loc, delta(round))
          require(v == expectHead, s"heal merge landed v$v, want v$expectHead")
        }
        assertSame(Snap.read(spark, loc), expected(round), "healed state")
        // the lifecycle stays healthy: a fresh vacuum leaves it serving
        Snap.vacuum(spark, loc, keepVersions = 2)
        assertSame(Snap.read(spark, loc), expected(round), "post-vacuum state")
        println(s"SNAPPROBE gheal OK window=$window v=$expectHead " +
          s"rows=${Snap.read(spark, loc).count()}")

      // ---- leg H: the streaming CDC sink's driver-death replay window
      case "hbase" =>
        // base snapshot + 6 staged one-file micro-batch deltas: batch k
        // re-prices keys [10k, 10k+10) by +(k+1) — pairwise disjoint,
        // so the expected state composes and batch ORDER is immaterial
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "cdc")
        val src = args.lift(3).getOrElse(sys.error("hbase needs a src dir"))
        val fs = Published.fsOf(new HPath(src))
        fs.mkdirs(new HPath(src))
        (0 until 6).foreach { k =>
          val d = cdcDelta(k)
          val tmp = new HPath(src, s"_tmp_$k")
          d.coalesce(1).write.mode("overwrite")
            .parquet(fs.makeQualified(tmp).toString)
          val part = fs.listStatus(tmp)
            .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
            .head.getPath
          require(fs.rename(part, new HPath(src, f"d$k%02d.parquet")))
          fs.delete(tmp, true)
        }
        println(s"SNAPPROBE hbase OK files=6")

      case "hrun" =>
        val src = args.lift(3).getOrElse(sys.error("hrun needs a src dir"))
        val ckpt = args.lift(4).getOrElse(sys.error("hrun needs a ckpt dir"))
        val haltAfter = args.lift(5).map(_.toInt).getOrElse(0)
        if (haltAfter > 0) RestartKit.haltOnCommit(spark, ckpt, haltAfter)
        val in = spark.readStream
          .schema(cdcDelta(0).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val q = graft.streaming.SnapCdc.cdcSink(in, loc.toString, ckpt,
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
        try require(q.awaitTermination(300000L), "cdc stream timed out")
        finally q.stop()
        println("SNAPPROBE hrun OK (drained)")

      case "hcheck" =>
        // post-resume: every batch applied EXACTLY once — content
        // row-set-exact AND one manifest version per batch (a replayed
        // batch must leave no extra version), applied high-water = 5
        val h = Snap.head(spark, loc).get
        require(h.applied == 5L, s"applied=${h.applied}, want 5")
        require(h.version == 7, s"version=${h.version}, want 7 " +
          "(create + one commit per batch — a double-apply or a lost " +
          "batch both break this)")
        val exp = (0 until 6).foldLeft(cust) { (cur, k) =>
          cur.withColumn("c_acctbal",
            when(col("c_custkey") >= k * 10 && col("c_custkey") < k * 10 + 10,
              col("c_acctbal") + (k + 1).toDouble)
              .otherwise(col("c_acctbal")))
        }
        assertSame(Snap.read(spark, loc), exp, "cdc-applied state")
        println(s"SNAPPROBE hcheck OK v=${h.version} applied=${h.applied}")

      // ---- leg I: the snap FOLLOWER's driver-death resume — the
      // offset ledger is the DESTINATION manifest, so the probe
      // resumes with a WIPED checkpoint on purpose: a follower whose
      // progress survived only in the checkpoint would double-apply or
      // restart from scratch; this one must converge exactly-once from
      // the cursor in the destination's head.
      case "ibase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "follow-probe")
        println("SNAPPROBE ibase OK v=1")

      case "irun" =>
        val dst = new HPath(args.lift(3).getOrElse(sys.error("irun needs dst")))
        val ckpt = args.lift(4).getOrElse(sys.error("irun needs ckpt"))
        val haltAfter = args.lift(5).map(_.toInt).getOrElse(0)
        if (haltAfter > 0) RestartKit.haltOnCommit(spark, ckpt, haltAfter)
        // maxVersionsPerPoll=1: the backlog drains one source version
        // per tick, so the kill lands MID-backlog (a single-poll
        // catch-up would leave no interesting window)
        val q = graft.streaming.SnapFollow.follow(spark, loc.toString,
          dst.toString, ckpt,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L),
          maxVersionsPerPoll = 1)
        val deadline = System.currentTimeMillis() + 300000L
        try {
          // seed the source WHILE the follower ticks (the moving-target
          // shape); mergeStreaming's batch ids make the resume's
          // re-seed skip whatever the killed run already applied — the
          // source converges to v7/applied=5 across any crash point
          (0 until 6).foreach { k =>
            Snap.mergeStreaming(spark, loc, cdcDelta(k), batchId = k.toLong)
          }
          val srcHead = Snap.head(spark, loc).get.version.toLong
          require(srcHead == 7L, s"irun: source head=$srcHead, want 7")
          while (Snap.head(spark, dst).forall(_.applied < srcHead) &&
              System.currentTimeMillis() < deadline) Thread.sleep(250L)
        } finally q.stop()
        require(Snap.head(spark, dst).exists(_.applied == 7L),
          "irun: follower never caught up")
        println("SNAPPROBE irun OK (caught up)")

      case "icheck" =>
        val dst = new HPath(args.lift(3).getOrElse(sys.error("icheck needs dst")))
        val h = Snap.head(spark, dst).get
        require(h.applied == 7L, s"icheck: cursor=${h.applied}, want 7")
        // exactly-once ledger: every destination commit advanced the
        // cursor STRICTLY (a replayed poll that re-applied would commit
        // a version with a non-advancing stamp; a no-news poll commits
        // nothing at all)
        val applieds = (1 to h.version).map(v =>
          Snap.atVersion(spark, dst, v).applied)
        require(applieds.zip(applieds.tail).forall { case (a, b) => b > a },
          s"icheck: non-monotone applied chain ${applieds.mkString(",")}")
        assertSame(Snap.read(spark, dst), Snap.read(spark, loc),
          "followed destination")
        println(s"SNAPPROBE icheck OK v=${h.version} applied=${h.applied}")

      case "gmorcheck" =>
        // post-race validation for leg 6: one commit per racer on top
        // of gbase's v2 (head v4), BOTH effects present row-set-exact,
        // and the MOR writer's delta file OUTSTANDING in the final
        // manifest (the OCC writer never touches bucket 6, so however
        // the commits ordered — plain resolve or rebase — the delta
        // must have carried, never been folded or lost).
        def shifted6(cur: DataFrame, loN: Long, hiN: Long, s: Double) =
          cur.withColumn("c_acctbal",
            when(col("c_custkey") >= loN && col("c_custkey") < hiN,
              col("c_acctbal") + s).otherwise(col("c_acctbal")))
        val h = Snap.head(spark, loc).get
        require(h.version == 4,
          s"gmorcheck: head=${h.version}, want 4 (one commit per racer)")
        require(h.deltas.size == 1 && h.deltas.head.bucket == 6,
          s"gmorcheck: the MOR delta file must survive the race " +
            s"outstanding in bucket 6, got ${h.deltas}")
        val last = Snap.atVersion(spark, loc, 4)
        println(s"SNAPPROBE gmorcheck order: v4 op=${last.op} " +
          s"base=${last.resolvedBase} parent=${last.parent}" +
          (if (last.op == "merge" && last.resolvedBase < last.parent)
            " (the OCC writer REBASED over the MOR commit)" else ""))
        var exp = expected(1)
        exp = shifted6(exp, M / 4, M / 4 + M / 16, 5.0)
        exp = shifted6(exp, 6 * M / 8, 6 * M / 8 + M / 16, -3.0)
        assertSame(Snap.read(spark, loc), exp, "post occ-vs-mor race state")
        println(s"SNAPPROBE gmorcheck OK v=${h.version} deltas=${h.deltas.size}")

      // ---- leg J: merge-on-read crash windows — the DELTA FOLD (an
      // optimize over a delta-carrying table dies after its rewritten
      // bucket files promoted but before the manifest create: the head
      // must keep serving the MOR view — base + outstanding deltas —
      // with the orphaned fold files invisible) and the MOR COMMIT
      // itself (a staged delta file without its manifest is invisible).
      case "jbase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "mor-probe")
        require(Snap.mergeMor(spark, loc, delta(1)) == 2)
        require(Snap.mergeMor(spark, loc, delta(2)) == 3)
        val h = Snap.head(spark, loc).get
        require(h.files.size == 8 && h.deltas.nonEmpty,
          s"jbase: MOR commits must carry all base files " +
            s"(files=${h.files.size}, deltas=${h.deltas.size})")
        assertSame(Snap.read(spark, loc), expected(2), "jbase MOR state")
        println(s"SNAPPROBE jbase OK v=3 deltas=${h.deltas.size}")

      case "jcrash" =>
        val mode = args.lift(3).getOrElse("fold")
        // the armed SPARK_GRAFT_SNAP_HALT=snapstage halts inside; OK
        // line reached = the window never fired (script-detected fail)
        if (mode == "fold") Snap.optimize(spark, loc, minFilesPerBucket = 2)
        else Snap.mergeMor(spark, loc, delta(3))
        println("SNAPPROBE jcrash OK (halt never fired)")

      case "jheal" =>
        val mode = args.lift(3).getOrElse("fold")
        val fs = Published.fsOf(loc)
        val h = Snap.head(spark, loc).get
        if (mode == "fold") {
          // fold died post-promote, pre-create: v3 (with deltas) serves
          require(h.version == 3 && h.deltas.nonEmpty,
            s"jheal[fold]: head v${h.version} deltas=${h.deltas.size} — " +
              "the crashed fold must not have advanced or retired anything")
          val orphans = fs.listStatus(new HPath(loc, "data"))
            .map(_.getPath.getName).count(_.startsWith("v4-"))
          require(orphans > 0, "jheal[fold]: no orphan fold files — vacuous")
          assertSame(Snap.read(spark, loc), expected(2), "pre-heal MOR view")
          val (_, swept, _) = Snap.vacuum(spark, loc, keepVersions = 99)
          require(swept == orphans, s"vacuum swept $swept of $orphans")
          // the retried fold lands and retires the deltas (the leg's
          // 'mor' window then exercises the next merge's crash)
          require(Snap.optimize(spark, loc, minFilesPerBucket = 2) == 4)
          require(Snap.head(spark, loc).get.deltas.isEmpty)
          assertSame(Snap.read(spark, loc), expected(2), "post-fold state")
        } else {
          // MOR commit died post-promote, pre-create: v4 (the fold)
          // serves; the staged delta file is an invisible orphan
          require(h.version == 4 && h.deltas.isEmpty,
            s"jheal[mor]: head v${h.version} — crashed MOR commit advanced it")
          assertSame(Snap.read(spark, loc), expected(2), "pre-heal state")
          val orphans = fs.listStatus(new HPath(loc, "data"))
            .map(_.getPath.getName).count(_.startsWith("v5-d"))
          require(orphans > 0, "jheal[mor]: no orphan delta file — vacuous")
          val (_, swept, _) = Snap.vacuum(spark, loc, keepVersions = 99)
          require(swept == orphans, s"vacuum swept $swept of $orphans")
          require(Snap.mergeMor(spark, loc, delta(3)) == 5)
          require(Snap.head(spark, loc).get.deltas.size == 1)
          assertSame(Snap.read(spark, loc), expected(3), "healed MOR state")
        }
        println(s"SNAPPROBE jheal OK mode=$mode " +
          s"rows=${Snap.read(spark, loc).count()}")

      // ---- leg K: the DELETION-VECTOR write windows (r20) — the DV
      // stage (a deleteVector dies after its positional files promoted
      // into data/ but before the manifest create: the head keeps
      // serving the pre-delete view, the orphans are invisible and
      // vacuum-sweepable, the retry lands with vectors + ONE residual
      // delta) and the DV commit itself (post-create death: the landed
      // version serves, the later fold retires the vectors).
      case "kbase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "dv-probe")
        require(Snap.mergeMor(spark, loc, delta(1)) == 2)
        assertSame(Snap.read(spark, loc), expected(1), "kbase MOR state")
        println("SNAPPROBE kbase OK v=2")

      case "kcrash" =>
        val mode = args.lift(3).getOrElse("stage")
        // armed SPARK_GRAFT_SNAP_HALT=snapstage|snapcommit halts
        // inside; the OK line reached = the window never fired
        Snap.deleteVector(spark, loc,
          if (mode == "stage") dvDel1(cust, M) else dvDel2(cust, M))
        println("SNAPPROBE kcrash OK (halt never fired)")

      case "kheal" =>
        val mode = args.lift(3).getOrElse("stage")
        val fs = Published.fsOf(loc)
        val h = Snap.head(spark, loc).get
        def expectedDv1 = expected(1).filter(!dvCut1(M))
        def expectedDv2 = expectedDv1.filter(!dvCut2(M))
        if (mode == "stage") {
          // died post-promote, pre-create: v2 (no vectors) serves
          require(h.version == 2 && h.dvs.isEmpty,
            s"kheal[stage]: head v${h.version} dvs=${h.dvs.size} — the " +
              "crashed deleteVector must not have advanced or landed")
          assertSame(Snap.read(spark, loc), expected(1), "pre-heal view")
          val orphans = fs.listStatus(new HPath(loc, "data"))
            .map(_.getPath.getName).count(_.startsWith("v3-dv"))
          require(orphans > 0, "kheal[stage]: no orphan DV files — vacuous")
          val (_, swept, _) = Snap.vacuum(spark, loc, keepVersions = 99)
          require(swept == orphans, s"vacuum swept $swept of $orphans")
          require(Snap.deleteVector(spark, loc, dvDel1(cust, M)) == 3)
          val h3 = Snap.head(spark, loc).get
          require(h3.dvs.nonEmpty && h3.deltas.size == h.deltas.size + 1,
            s"kheal[stage]: retried deleteVector must land vectors + ONE " +
              s"residual delta (dvs=${h3.dvs.size}, deltas=${h3.deltas.size})")
          assertSame(Snap.read(spark, loc), expectedDv1, "healed DV state")
        } else {
          // commit window: the create LANDED before the halt — v4 serves
          require(h.version == 4 && h.dvs.nonEmpty,
            s"kheal[commit]: head v${h.version} dvs=${h.dvs.size} — the " +
              "landed DV commit must serve")
          assertSame(Snap.read(spark, loc), expectedDv2, "landed DV state")
          require(Snap.optimize(spark, loc, minFilesPerBucket = 2) == 5)
          val h5 = Snap.head(spark, loc).get
          require(h5.dvs.isEmpty && h5.deltas.isEmpty,
            "the fold must retire every vector and delta")
          assertSame(Snap.read(spark, loc), expectedDv2, "post-fold state")
        }
        println(s"SNAPPROBE kheal OK mode=$mode " +
          s"rows=${Snap.read(spark, loc).count()}")

      // ---- leg L: the CHANGELOG STREAM SOURCE's driver-death resume
      // (r20) — offsets are manifest versions in the stream checkpoint;
      // a kill -9 mid-backlog must resume from the committed offset and
      // deliver every version EXACTLY once to the applying sink.
      case "lbase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "chstream-probe")
        println("SNAPPROBE lbase OK v=1")

      case "lrun" =>
        import org.apache.spark.sql.functions.{col => c, row_number}
        val dst = new HPath(args.lift(3).getOrElse(sys.error("lrun needs dst")))
        val ckpt = args.lift(4).getOrElse(sys.error("lrun needs ckpt"))
        val haltAfter = args.lift(5).map(_.toInt).getOrElse(0)
        if (haltAfter > 0) RestartKit.haltOnCommit(spark, ckpt, haltAfter)
        if (Snap.head(spark, dst).isEmpty)
          Snap.create(spark, dst, cust.limit(0), Seq("c_custkey"),
            "c_custkey", 8, layout = "hash", tag = "chstream-dst")
        val keys = Seq("c_custkey")
        val q = spark.readStream.format("graft-snap-changes")
          .option("path", loc.toString).option("startingVersion", "1")
          .load()
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L))
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            // collapse the batch latest-wins per key, apply exactly-once
            // through the destination's applied high-water
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy(keys.map(c): _*)
              .orderBy(c("_commit_version").desc)
            val collapsed = batch
              .withColumn("__graft_rn", row_number().over(w))
              .filter(c("__graft_rn") === 1)
              .withColumn("_deleted", c("_change_type") === "delete")
              .drop("__graft_rn", "_change_type", "_commit_version")
            if (!collapsed.isEmpty)
              Snap.mergeStreaming(spark, dst, collapsed, batchId = batchId)
            ()
          }
          .start()
        val deadline = System.currentTimeMillis() + 300000L
        try {
          // land a mixed-kind backlog WHILE the stream ticks: COW
          // merges, a MOR delta, a positional delete, a neutral fold
          (0 until 4).foreach { k =>
            Snap.mergeStreaming(spark, loc, cdcDelta(k), batchId = k.toLong) }
          Snap.mergeMor(spark, loc, cdcDelta(9))
          Snap.deleteVector(spark, loc,
            cust.filter(col("c_custkey") >= 120 && col("c_custkey") < 130)
              .select(col("c_custkey")))
          Snap.optimize(spark, loc, minFilesPerBucket = 2)
          val srcHead = Snap.head(spark, loc).get.version
          while (System.currentTimeMillis() < deadline && {
            val d = Snap.read(spark, dst)
            val s = Snap.read(spark, loc)
            d.exceptAll(s).limit(1).count() > 0 ||
              s.exceptAll(d).limit(1).count() > 0
          }) Thread.sleep(300L)
          require(srcHead >= 7, s"lrun: source head=$srcHead, want >= 7")
        } finally q.stop()
        assertSame(Snap.read(spark, dst), Snap.read(spark, loc),
          "lrun converged state")
        println("SNAPPROBE lrun OK (caught up)")

      case "lcheck" =>
        val dst = new HPath(args.lift(3).getOrElse(sys.error("lcheck needs dst")))
        assertSame(Snap.read(spark, dst), Snap.read(spark, loc),
          "streamed destination")
        // exactly-once ledger: the applied batch-id chain advances
        // STRICTLY (a replayed batch re-applying would stamp a
        // non-advancing id; mergeStreaming no-ops it instead)
        val h = Snap.head(spark, dst).get
        val applieds = (1 to h.version).map(v =>
          Snap.atVersion(spark, dst, v).applied)
        require(applieds.zip(applieds.tail).forall { case (a, b) => b > a },
          s"lcheck: non-monotone applied chain ${applieds.mkString(",")}")
        println(s"SNAPPROBE lcheck OK v=${h.version} applied=${h.applied}")

      // ---- leg M: the MAINTAINED-AGGREGATE follower's driver-death
      // resume (r20, the r19 verdict's ask #6) — followAgg's ledger is
      // the destination manifest (cursor = applied source version), so
      // like leg I the probe resumes with a WIPED checkpoint on
      // purpose: the maintained (count, non-null count, DECIMAL sum)
      // table must converge exactly-once from the cursor alone and
      // equal a full recompute bit-for-bit.
      case "mbase" =>
        Snap.create(spark, loc, cust, Seq("c_custkey"), "c_custkey", 8,
          layout = "range", tag = "followagg-probe")
        println("SNAPPROBE mbase OK v=1")

      case "mrun" =>
        val dst = new HPath(args.lift(3).getOrElse(sys.error("mrun needs dst")))
        val ckpt = args.lift(4).getOrElse(sys.error("mrun needs ckpt"))
        val haltAfter = args.lift(5).map(_.toInt).getOrElse(0)
        if (haltAfter > 0) RestartKit.haltOnCommit(spark, ckpt, haltAfter)
        // one source version per tick: the kill lands MID-backlog
        val q = graft.streaming.SnapFollow.followAgg(spark, loc.toString,
          dst.toString, ckpt, "c_nationkey", "c_acctbal",
          trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime(200L),
          maxVersionsPerPoll = 1)
        val deadline = System.currentTimeMillis() + 300000L
        try {
          (0 until 6).foreach { k =>
            Snap.mergeStreaming(spark, loc, cdcDelta(k), batchId = k.toLong)
          }
          val srcHead = Snap.head(spark, loc).get.version.toLong
          require(srcHead == 7L, s"mrun: source head=$srcHead, want 7")
          while (Snap.head(spark, dst).forall(_.applied < srcHead) &&
              System.currentTimeMillis() < deadline) Thread.sleep(250L)
        } finally q.stop()
        require(Snap.head(spark, dst).exists(_.applied == 7L),
          "mrun: maintained aggregate never caught up")
        println("SNAPPROBE mrun OK (caught up)")

      case "mcheck" =>
        val dst = new HPath(args.lift(3).getOrElse(sys.error("mcheck needs dst")))
        val h = Snap.head(spark, dst).get
        require(h.applied == 7L, s"mcheck: cursor=${h.applied}, want 7")
        val applieds = (1 to h.version).map(v =>
          Snap.atVersion(spark, dst, v).applied)
        require(applieds.zip(applieds.tail).forall { case (a, b) => b > a },
          s"mcheck: non-monotone applied chain ${applieds.mkString(",")}")
        // maintained ≡ recompute, bit-for-bit (the q85/IVM discipline)
        assertSame(Snap.read(spark, dst),
          graft.streaming.SnapFollow.aggOf(Snap.read(spark, loc),
            "c_nationkey", "c_acctbal"),
          "maintained aggregate vs full recompute")
        println(s"SNAPPROBE mcheck OK v=${h.version} applied=${h.applied}")

      case p => sys.error(s"unknown phase $p")
    }
    spark.stop()
  }

  /** Leg K's delete cuts: round 1 mixes delta-resident keys (< M/40,
    * bucket 0 holds delta(1)'s file → the residual path) with
    * base-resident ones ([M/6, M/6+M/20), bucket 1 — pure positions);
    * round 2 is purely positional (bucket 2 carries no delta). */
  private def dvCut1(M: Long): org.apache.spark.sql.Column =
    (col("c_custkey") >= M / 6 && col("c_custkey") < M / 6 + M / 20) ||
      col("c_custkey") < M / 40
  private def dvCut2(M: Long): org.apache.spark.sql.Column =
    col("c_custkey") >= M / 3 && col("c_custkey") < M / 3 + M / 30
  private def dvDel1(cust: org.apache.spark.sql.DataFrame, M: Long) =
    cust.filter(dvCut1(M)).select(col("c_custkey"))
  private def dvDel2(cust: org.apache.spark.sql.DataFrame, M: Long) =
    cust.filter(dvCut2(M)).select(col("c_custkey"))
}
