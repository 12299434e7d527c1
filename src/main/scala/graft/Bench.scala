package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // one shared session recipe (Session.builder) — only parallelism
    // varies; SPARK_GRAFT_MASTER can point a bench leg at a
    // local-cluster for multi-process measurements
    val spark = Session.builderFromEnv(cpus.toInt, cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JIT + codegen + parquet footer caches, so the first timed
    // query isn't charged session start-up costs.
    Seq("lineitem", "events").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    // recentProgress is capped by numRecentProgressUpdates (default 100):
    // today's staged sources produce ≤ ~32 micro-batches, but a scale
    // corpus with more source files would silently undercount "batches"
    // and commitMs in the state tail (r7 ADVICE) — raise the cap well
    // past any staged batch count for the bench session.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
    // Measure with a noop write, not .count(): count() lets Catalyst
    // prune every unreferenced projection, so pure-projection queries
    // would be charged only their scan. The noop sink fully evaluates
    // every output column. A failing query is recorded as -1 with its
    // error carried to the "errors" field — never a fake elapsed time.
    val errors = scala.collection.mutable.Map[String, String]()
    def runOnce(name: String,
                fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
          -1.0
      }
    }
    // Between queries: drop cached relations and nudge the collector.
    // ~180 query executions in one JVM otherwise accumulate broadcast
    // blocks, shuffle files, and old-gen pressure that tax whichever
    // queries happen to run late — round 4's driver bench reported six
    // phantom 2–6× "regressions" that all re-timed at steady state in
    // isolation. Hygiene between measurements, never inside them.
    def quiesce(): Unit = {
      spark.catalog.clearCache()
      System.gc()
    }
    // Steady-state reference times (idle machine, min-of-2; round-6 run
    // with the two in-suite phantoms replaced by their isolated re-times,
    // VERDICT r6 "What's wrong" #1). Used ONLY to trigger a third re-run
    // when a measurement looks like an outlier — never to replace or
    // adjust a measured value. Only entries whose steady state is ≥ ~1 s
    // are listed: below that the spread rule already catches contention,
    // and a sub-second entry tripling is absolute noise, not a phantom.
    val refTimes: Map[String, Double] = Map(
      "q27_ngram_jaccard" -> 1.65, "q40_approx_distinct" -> 1.68,
      "q45_sql_tpch5" -> 1.58, "q56_dedup_clusters" -> 2.85,
      // q73/q81 refs re-based round 10 with the data-sized loop
      // parallelism (Loops.dataSizedParts — see q109's note below):
      // measured 0.87 / 0.97 in the same filtered run that re-measured
      // q109; kept in the list although sub-second so a regression of
      // the loop-sizing rule itself flags immediately
      "q71_minhash_estimate" -> 1.73, "q73_pagerank" -> 0.90,
      "q74_kmeans_round" -> 1.35, "q75_triangle_count" -> 2.79,
      "q81_bfs_reach" -> 1.00, "q84_quality_audit" -> 1.21,
      "q86_skyline" -> 1.29, "q87_fuzzy_join" -> 3.40,
      // q95 ref re-based 1.10 → 1.80 round 8: the 1.5× bar flagged it at
      // 1.79 in-suite / 2.06 isolated with NO code change on its path
      // this round; r6's sweep had already measured 1.69 at sf0.1, so
      // 1.10 was a low-tail sample, not the steady state
      // q90 ref re-based 2.60 → 3.80 round 8: measured 3.78/4.25/4.17
      // across three r8 runs (r7 full suite already read 3.91); the
      // 2.60 was the same stale-low-sample class as q95's old ref
      "q90_ann_trained" -> 3.80, "q95_bigram_lm" -> 1.80,
      // q102 ref re-based 1.42 → 4.30 round 8: the audit gained its
      // fourth index leg (q113 IVF-PQ, which trains q90's cells
      // internally) — the jump is priced-in composition, not drift
      "q101_tfidf_retrieval" -> 2.04, "q102_ann_recall" -> 4.30,
      // q109 ref re-based 4.30 → 2.50 round 10, in two steps. (1) The
      // r9 verdict asked for ~2.1 (its isolated re-run), but a
      // controlled A/B measured the UNTOUCHED r9 HEAD at 6.15 s
      // isolated / 5.58-5.71 s warm PRTrace loops on today's VM —
      // identical to the r10 build — so 2.13 was a different
      // environment level, not this code's steady state; per-superstep
      // cost was 0.38-0.45 s × 14 supersteps of per-stage FIXED
      // overhead on 32-task stages. (2) LoopParts traced that floor to
      // the AQE-off loop's lost partition coalescing; with loop
      // parallelism sized to the edge count (Loops.dataSizedParts,
      // ~9 partitions at sf0.1) the same loop measures 2.50 s — the
      // ref is that measured steady state.
      // q108 ref re-based r19 (the r18 verdict's watch item): the old
      // 1.10 was the distribution's optimistic tail — the path is
      // untouched since its landing, and the r17-r19 samples read
      // 0.97 / 1.53 / 1.63 / 1.02 in-suite and 1.75 / 2.05 isolated
      // min-of-2 on the r19 boot (isolated pays the trained-quantizer
      // lifecycle cold each run; in-suite shares q99/q112's warm
      // corpus). 1.60 is the distribution's center; the 1.5× bar now
      // flags real regressions, not window noise.
      "q108_semdedup_scaled" -> 1.60, "q109_pagerank_stable" -> 2.50,
      // q103 gains a ref (r8 ask): in-suite steady state re-measured at
      // 0.90 s this round (its r7 level) after the r8 2.42 s reading —
      // the r8/r9 elevation was suite contention, not a plan change
      // (isolated first-in-JVM runs read 1.70 from cold parquet footers;
      // the in-suite number is the steady one). The 1.5× bar now
      // catches the next phantom the round it appears.
      "q103_recursive_spine" -> 0.90,
      // round-10 addition, ref from its first isolated min-of-2 (the
      // trainer's 3 vocab rounds dominate; the encode join is map-side)
      "q118_bpe_encode" -> 1.60,
      // round-11 additions — EXCEPTION to the ≥1 s rule above: these two
      // guard a STRUCTURAL split (the session-cached built index), where
      // the failure mode is not noise but a cache miss re-running the
      // full O(N) train (0.2 s → ~4 s, 20×) — exactly the regression the
      // r10 ADVICE wants flagged. Refs from the two stable r10 full-suite
      // runs (0.127/0.198 and 0.207/0.278)
      "q115_ann_search" -> 0.20, "q116_ivfpq_search" -> 0.28,
      // the published-TABLE legs (r10 ask #2) carry the same structural
      // guard: a catalog miss re-publishing (train + table write) per
      // query would read ~4-5 s. Refs from their first isolated
      // min-of-2 (0.452/0.505 — the ~2× over q115/q116 is the parquet
      // scan of the table vs the in-memory checkpoint, the price of the
      // fault-tolerant multi-executor form)
      "q120_ann_search_table" -> 0.45, "q121_ivfpq_search_table" -> 0.50,
      // the maintenance leg over the published base index (r11): its
      // steady state is the DELTA scan + broadcast argmin + k-row
      // stats (1.18/1.21 isolated min-of-2); a catalog miss re-running
      // the base training per call would read ~q114's in-run level —
      // the same publish-lifecycle guard as q120/q121
      "q122_index_maintain_table" -> 1.20,
      // the epoch roll's steady state is the handoff audit over the
      // published old/new tables + the delta assignment (isolated
      // min-of-2 1.061/1.041); a catalog+marker miss re-running the
      // full-corpus retrain per call would read ~q90's train level —
      // the same publish-lifecycle guard as q120-q122
      "q123_index_epoch_roll" -> 1.05,
      // minor compaction: steady state is a no-op high-water check +
      // the table-local audit (isolated min-of-2 0.80/0.78/0.76 at
      // 1×/10×/20× — flat); a marker miss re-cloning the base per call
      // would read ~2× — the same publish-lifecycle guard
      "q124_index_compact" -> 0.80,
      // q119 ref re-based 5.70 → 1.65 round 11: the signature pass moved
      // to the native byte-level kernel (graft_simhash64_bytes) — same
      // ~500 shingles × 2 md5 per doc (the md5 inputs define the
      // oracle-replayable signature and are unchanged, parity-spec'd),
      // but the hex column / substring array / boxed hash arrays the
      // column pipeline materialized per doc are gone. Controlled A/B,
      // isolated min-of-2 on the same VM: hex path 5.73/5.78 (r10),
      // native 1.72/1.62 — the old cost was the materialization, not
      // the md5
      "q119_media_neardup" -> 1.65,
      // round-8 additions, refs from their first full-suite run
      "q110_corpus_containment" -> 1.85, "q112_semdedup_hier" -> 4.40,
      "q113_ivfpq" -> 2.85, "q114_index_maintain" -> 2.50,
      // s02 ref re-based 6.00 → 3.40 round 10: state parallelism now
      // sized to the 1,500-user key universe (Tws.stateParallelism →
      // 8 stores instead of 32), cutting the per-store fixed commit
      // draw 18× (Σcommit 71.6 → 3.8 s) and wall 6.4 → 3.2-3.7 s
      // across five consecutive runs (r8 ask #3 closed)
      // q125/q126/s04 re-based round 15 (r14 verdict ask #2): the r14
      // stamps were first measurements on a ~1.3x-slow boot, and q125's
      // 2.50 predated the distributed-exact rewrite that halved it.
      // Trails: q125 1.89/1.58 (r14 close) + 1.33/1.59 (r15 idle pair)
      // -> 1.50; q126 1.84/1.12 (r15 pair; the 1.85 was the slow-boot
      // stamp) -> 1.40; s04 3.34/2.84 (r14 close) + 3.02/2.70 (r15
      // pair) -> 2.80
      "q125_quantile_sketch_merge" -> 1.50, "s04_quantiles_rocksdb" -> 2.80,
      "q126_exact_quantiles" -> 1.40,
      // q127 first measurement (r15): steady state is attach + the
      // blob-table serve + the exact-envelope reference (the range-sort
      // dominates, q126's kernel); 1.60 from the r15 pair's idle sample
      // — its 3.52 sibling included the cold publish plus post-probe
      // box contention. A marker miss re-publishing per call would read
      // ~2.5x — the same publish-lifecycle guard as q120-q124.
      // r16 trail (r15 verdict ask #4): 1.38 (r15 post-fix in-suite),
      // 1.50 / 1.96 (r16 pair), 2.16 (filtered fresh-JVM = cold
      // publish class) — 1.60 sits mid-distribution; kept
      "q127_published_quantiles" -> 1.60,
      // q128 first measurement (r16): the compacted-dashboard lifecycle
      // — steady state is the flag-gated no-op lifecycle (corpus max +
      // replay-skip probes + compact no-op) + the blob serve + the
      // exact-envelope reference that dominates (q126's kernel, like
      // q127). Trail: 2.82 min-of-2, spread 0.22, first filtered run
      "q128_compacted_dashboard" -> 2.80,
      // q129 first measurement (r17): the SELF-compacting streaming
      // dashboard — the sink folds its own store mid-stream
      // (compactEvery=2 over 5 one-batch files), so the measured
      // lifecycle is bootstrap + stream (two in-trigger folds) on the
      // first call and the drained no-op replay (AvailableNow over no
      // new files + flag-gated bootstrap + exact-envelope reference)
      // on the second; min-of-2 records the replay+reference class,
      // q128's precedent. Trail: 2.23 (r17 first in-suite, fast boot)
      "q129_selfcompacting_stream" -> 2.30,
      // s05 first measurement (r16): the streaming published-KLL
      // dashboard, deliberately measuring the COLD lifecycle —
      // bootstrap corpus scan + 8 one-batch appends EACH paying the
      // full lease/ensure/append/re-stamp discipline + attach-serve.
      // The per-batch publish overhead (~0.6 s of control-plane work/
      // batch) is the entry's point: a deployment amortizes it with
      // its trigger interval; the data volume is kilobytes throughout.
      // Trail: 6.53 / 7.95 (r16 pair, slow-boot family)
      "s05_kll_publish_stream" -> 6.50,
      // q130-q132 first measurements (r17): the Snap snapshot-format
      // faces. Steady state is the ATTACH path (head-manifest resolve +
      // explicit-file parquet read + agg) — the three-commit demo
      // lifecycle builds once per warehouse and is tag-guarded like
      // q120-q124's published tables. Same EXCEPTION to the ≥1 s rule
      // as q115/q116: the failure mode is structural (a head/tag miss
      // re-running create+2×merge per call, ~20-30×), not noise.
      // Trail: 0.14/0.15/0.31 (r17 first full-suite run)
      "q130_snap_merge" -> 0.15, "q131_snap_time_travel" -> 0.15,
      "q132_snap_prune" -> 0.30,
      // q133 first measurement (r17): the auto-optimize lifecycle face —
      // attach + two-manifest metadata audit + the folded-table agg.
      // Same structural-guard class (a head/tag miss re-runs
      // create+3×merge+fold). Trail: 0.09 (r17 third full-suite run)
      "q133_snap_optimize" -> 0.10,
      // q134/q135 first measurements (r17): evolution + SCD2 lifecycle
      // faces — same attach-path steady state and structural-guard
      // class as q130-q133. Trail: 0.12/0.10 (r17 fourth full-suite run)
      "q134_snap_evolve" -> 0.15, "q135_snap_scd2" -> 0.10,
      // s06 first measurement (r17): streaming CDC apply into a Snap
      // table — deliberately the COLD lifecycle like s05 (create + 6
      // one-file micro-batch merges, each paying the full lease/stage/
      // manifest discipline, with one in-stream fold at 4 files).
      // Trail: 4.96 in-suite / 6.44 filtered fresh-JVM (cold-footer
      // class, q127's precedent)
      "s06_snap_cdc_stream" -> 5.00,
      // q136 first measurement (r18): the changelog (CDF) face —
      // attach + manifest-chain metadata + the O(delta) changelog read
      // (two per-step anti/diff joins over the rewritten/added files)
      // over the q130 lifecycle. Same structural-guard class as
      // q130-q135 (a head/tag miss rebuilds the lifecycle).
      // Trail: 0.92 (r18 first isolated pair)
      "q136_snap_changelog" -> 0.95,
      // q137 first measurement (r18): the rename/drop evolution face —
      // attach + four-manifest metadata audit + the aliased
      // (physical→logical) head agg. Same structural-guard class as
      // q130-q136. Trail: 0.22 (r18 first isolated pair)
      "q137_snap_rename_drop" -> 0.25,
      // q138/q139 first measurements (r18): zorder dual-dimension
      // pruned scans (two explicit-file-subset aggs) and the retention
      // audit (manifest metadata + one data/ listing). Same
      // structural-guard class as q130-q137.
      // Trail: 0.42 / 0.09 (r18 first isolated pair)
      "q138_snap_zorder" -> 0.45, "q139_snap_retention" -> 0.15,
      // q140 first measurement (r18): the OCC-built lifecycle face —
      // attach + two-manifest protocol audit + head agg (steady state
      // identical to q130's attach class). Trail: 0.13 (r18 isolated)
      "q140_snap_occ" -> 0.15,
      // q141 first measurement (r19): the merge-on-read lifecycle face —
      // attach + four-manifest write-amplification audit + the folded
      // head agg (post-fold the read IS q130's base-scan class).
      // Trail: 0.21, 0.18 (r19 first full-surface samples)
      "q141_snap_mor" -> 0.22,
      // q142-q144 first measurements (r19): the SQL-entry join (view
      // registration + probe execution + the planned join), the
      // rebucket lifecycle face (attach + metadata audit), and the
      // preimage changelog aggregate (two-step delta read, both
      // update images). Trail: 0.43 / 0.15 / 0.56 (r19 first sample)
      "q142_snap_sql" -> 0.50, "q143_snap_rebucket" -> 0.20,
      "q144_snap_cdf_pre" -> 0.60,
      // q145 first measurement (r19): the CHUNKED changelog audit read
      // — chunkSteps=1 forces a localCheckpoint materialization per
      // changed version (3 here), the deliberate price of the bounded
      // deep-range plan. Trail: 0.92 (r19 first sample)
      "q145_snap_changelog_chunked" -> 0.95,
      // q147-q152 first measurements (r20): the SQL-DML lifecycle face
      // (attach + MERGE-parity audit + pruned-probe plan read), the
      // deletion-vector lifecycle (attach + the through-DV read and
      // fold-equality audit — the widest spread of the family, its
      // first run pays the 4-version build), the WAP face (metadata
      // audits + head agg), SQL time travel (three pinned reads + the
      // branch fork/read/drop round), the CALL-procedures lifecycle
      // (history-parity + rebucket/publish/horizon audits), and the
      // t$changes batch CDF (full-replay per-version counts).
      // Trail: 0.78 / 1.88 / 0.36 / 0.84 / 0.61 / 0.37 (r20 paired)
      "q147_snap_sql_dml" -> 0.85, "q148_snap_dv" -> 1.90,
      "q149_snap_wap" -> 0.40, "q150_snap_sql_asof" -> 0.90,
      "q151_snap_procedures" -> 0.65, "q152_snap_changes_sql" -> 0.40,
      // s07 first measurement (r18): the snap FOLLOWER — create source
      // + snapshot-copy destination, then 4 source merges converging
      // through the rate-ticked changelog follower (each tick an
      // O(delta) changes() read + exactly-once merge; cursor rides the
      // destination manifest). COLD lifecycle like s05/s06:
      // per-commit control-plane work is the measured object.
      // Trail: 7.55 (r18 first isolated pair)
      "s07_snap_follow_stream" -> 7.60,
      // s08 first measurement (r19): the maintained-aggregate follower
      // — s07's COLD lifecycle shape (create + 4 live merges + rate-
      // ticked convergence) plus the preimage changelog reads and the
      // exact-recompute equality gate. Trail: 8.40 (r19 first sample)
      "s08_snap_follow_agg" -> 8.40,
      // s09 first measurement (r20): the NATIVE catalog streaming sink
      // on s06's exact epoch schedule — the ~4 s over s06 is the
      // staging pass (each epoch's rows land executor-side as parquet
      // and are read back before the merge; the price of arriving
      // through the DataWriter API instead of foreachBatch's
      // DataFrame) plus the deferred first-epoch create. Control-plane
      // cost: O(epochs), invariant in table size.
      // Trail: 11.35 (r20 first paired sample, spread 1.4)
      "s09_snap_native_sink" -> 11.50,
      "s01_stream_envelope" -> 1.24, "s02_funnel_rocksdb" -> 3.40,
      // s03 ref re-based round 8: the old 5.80 (and r7's 9.08 "drift")
      // were samples of the 32-empty-store commit-contention distribution
      // (8–16 s wall, 2.4× variance); with state parallelism sized to the
      // region catalog the steady state is ~3.6 s flat (PLANS.md r8)
      "s03_trending_rocksdb" -> 3.60)
    // A spread is NOISE (not signal) above this bar — the same bar that
    // decides whether an entry earns a third run and a "noisy" flag in
    // the artifact tail.
    def noiseBar(best: Double): Double = math.max(0.3, 0.5 * best)
    // min of two runs per query: steady-state cost, not first-run JIT.
    // Self-diagnosis (round-6 verdict #1 — BENCH_r06 carried two in-suite
    // phantoms, q56 18.2 s vs 2.85 isolated, with their spread flags
    // truncated away): a measurement whose spread exceeds noiseBar OR
    // whose min-of-2 exceeds 1.5× its steady-state reference gets ONE
    // extra run after a fresh quiesce; if it still looks contended it is
    // flagged in the "noisy" tail map that now survives truncation. The
    // ref multiplier is 1.5 (was 3.0 — r7 verdict #2: the gate criterion
    // is "within 2× of baseline", and a 3× bar let s03's real 1.56×
    // drift arrive unflagged; the bench must be able to SEE a 2× drift
    // before the gate does). A failure in EITHER run reports -1 (never a
    // valid-looking time next to an errors entry).
    val spreads = scala.collection.mutable.Map[String, Double]()
    val noisy = scala.collection.mutable.Map[String, Double]()
    // third-run failures: the re-run's error message must survive
    // SOMEWHERE even though it is dropped from `errors` (the '-1 never
    // next to errors' invariant) — r7 ADVICE: losing the failure class
    // makes a flaky query undiagnosable from the artifact alone.
    val rerunFails = scala.collection.mutable.Map[String, String]()
    def timeBoth(name: String, once: () => Double): Double = {
      quiesce()
      val a = once()
      // quiesce between the two runs too (round 8): run b was the ONLY
      // run not preceded by one, so it alone paid run a's uncollected
      // shuffle files — ContextCleaner deletes them only after a GC
      // fires its weak references, and on this heap GC is rare. PRTrace
      // measured the asymmetry on the 14-superstep q109 loop at 10×:
      // back-to-back runs 30.6/23.2/32.5 s, GC-separated 29.5/26.2/18.4
      // (live RDDs pinned at 5 in BOTH — eager release works; the churn
      // is shuffle files, the one block class release() can't touch).
      val b = if (a < 0) -1.0 else { quiesce(); once() }
      if (a < 0 || b < 0) { spreads(name) = -1.0; return -1.0 }
      var runs = List(a, b).sorted
      def suspect: Boolean =
        (runs(1) - runs(0)) > noiseBar(runs(0)) ||
          refTimes.get(name).exists(r => runs(0) > math.max(1.0, 1.5 * r))
      if (suspect) {
        quiesce()
        val hadError = errors.contains(name)
        val c = once()
        if (c >= 0) runs = (c :: runs).sorted.take(2)
        // a FAILED extra run must not leave an errors entry beside the
        // still-valid min-of-2 (the '-1 never next to errors' invariant):
        // move the error it just recorded to the rerun-failure map, so
        // the failure class still reaches the artifact
        else if (!hadError)
          errors.remove(name).foreach(m => rerunFails(name) = m)
        // still suspect after the extra run → the artifact must say so
        if (suspect || c < 0) noisy(name) = runs(1) - runs(0)
      }
      spreads(name) = runs(1) - runs(0)
      runs(0)
    }
    def time(name: String,
             fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      timeBoth(name, () => runOnce(name, fn))
    // Per-query streaming state metrics (round-6 verdict ask #3): s02/s03
    // wall-clock is flat at 10× keys because per-batch fixed costs
    // dominate — these counters are the signal that shows WHEN state work
    // starts to matter. Last completed run wins (row/byte counts are
    // deterministic across runs; latencies are representative).
    val stateMetrics = scala.collection.mutable.Map[String, String]()
    def recordState(name: String,
                    q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val sos = q.recentProgress.flatMap(p => Option(p.stateOperators).toSeq.flatten)
      if (sos.nonEmpty) stateMetrics(name) =
        s"""{"batches":${q.recentProgress.length}""" +
          s""","rowsUpdated":${sos.map(_.numRowsUpdated).sum}""" +
          s""","rowsTotal":${sos.map(_.numRowsTotal).max}""" +
          s""","stateBytes":${sos.map(_.memoryUsedBytes).max}""" +
          s""","commitMs":${sos.map(_.commitTimeMs).sum}}"""
    }
    // awaitTermination(timeout) returns FALSE on timeout without killing
    // the query — ignoring the boolean records ~300 s as a "valid" sample
    // and leaks a live stream past the finally that restores RocksDB confs
    // (r14 ADVICE). Route the timeout to the errors map and always stop.
    def awaitStream(name: String,
                    q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
      try {
        if (!q.awaitTermination(300000L))
          throw new RuntimeException(s"$name: stream still running after 300 s")
      } finally { if (q.isActive) q.stop() }
    // the reference's whole job — geo ingest → envelope → routed sink —
    // as one timed streaming pass over the events table. min-of-2 with a
    // fresh checkpoint + source dir per run, same discipline as batch.
    def streamOnce(): Double = {
      val t0 = System.nanoTime()
      try {
        val ckpt = java.nio.file.Files.createTempDirectory("bench_ckpt").toString
        val src = java.nio.file.Files.createTempDirectory("bench_src")
        // events.parquet may be a single file (driver testdata) or a
        // directory of part files (Spark-written scale corpora) — stage
        // the data files either way
        val ep = java.nio.file.Paths.get(s"$sfDir/events.parquet")
        if (java.nio.file.Files.isDirectory(ep)) {
          val ls = java.nio.file.Files.list(ep)
          try {
            val it = ls.iterator()
            while (it.hasNext) {
              val p = it.next()
              if (p.getFileName.toString.endsWith(".parquet"))
                java.nio.file.Files.copy(p, src.resolve(p.getFileName.toString))
            }
          } finally ls.close()
        } else java.nio.file.Files.copy(ep, src.resolve("events.parquet"))
        val events = graft.streaming.Ingest.eventsFileStream(spark, src.toString,
          maxFilesPerTrigger = 1)
        val q = graft.streaming.Ingest.envelope(spark, events)
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        awaitStream("s01_stream_envelope", q)
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s01_stream_envelope") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s01_stream_envelope FAILED: ${errors("s01_stream_envelope")}")
          -1.0
      }
    }
    // s02: the stateful 100 TB path — per-user funnel state on the RocksDB
    // store, multi-batch so every batch after the first pays the real
    // read-modify-write state round-trip. Source prep (split events into 8
    // files = 8 micro-batches) happens ONCE outside timing; each timed run
    // gets a fresh checkpoint (fresh state), min-of-2 like everything else.
    lazy val s02Src: String = {
      val d = java.nio.file.Files.createTempDirectory("bench_s02_src").toString
      spark.read.parquet(s"$sfDir/events.parquet")
        .repartition(8).write.mode("overwrite").parquet(d)
      d
    }
    // the funnel's key universe — what sizes its state-store count
    // (Tws.stateParallelism, r8 ask #3: 1500 keys over 32 stores paid
    // ~70 s Σcommit in per-store fixed costs; 8 stores pay ~4 s). A
    // production job reads this from index/catalog metadata; the bench
    // derives it from the staged source ONCE, outside every timed run.
    lazy val s02Keys: Long = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id").distinct().count()
    def statefulOnce(): Double = {
      try {
        // staging inside the try (a staging failure degrades to an errors
        // entry like any other query) but BEFORE the clock starts — the
        // lazy val materializes once and is free on the second run
        val src = s02Src
        val t0 = System.nanoTime()
        val ckpt = java.nio.file.Files.createTempDirectory("bench_s02_ckpt").toString
        // conf mutation INSIDE the try (r8 ADVICE): a throw between a
        // partial set and the try entry would skip the finally restore
        // and leak RocksDB confs into every subsequent bench query
        // local probe knob (driver never sets it): override s02's state
        // parallelism to measure the RocksDB commit draw vs store count
        // (r8 ask #3 — 1500 user keys over 32 stores = 256 commits/run;
        // the probe asks whether fewer, fuller stores bound Σcommit)
        val prevS02Parts = spark.conf.get("spark.sql.shuffle.partitions")
        try {
          Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
          spark.conf.set("spark.sql.shuffle.partitions",
            graft.streaming.Tws.stateParallelism(s02Keys, cpus.toInt).toString)
          sys.env.get("SPARK_GRAFT_S02_PARTS").filter(_.nonEmpty)
            .foreach(p => spark.conf.set("spark.sql.shuffle.partitions", p))
          import spark.implicits._
          val ev = graft.streaming.Ingest.eventsFileStream(spark, src,
              maxFilesPerTrigger = 1)
            .select(org.apache.spark.sql.functions.col("user_id"),
              org.apache.spark.sql.functions.col("event_type"),
              org.apache.spark.sql.functions.col("ts"))
            .as[graft.streaming.Funnel.FunnelEvent]
          val q = graft.streaming.Funnel.funnelProgress(ev)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          awaitStream("s02_funnel_rocksdb", q)
          // clock FIRST, metrics after — bookkeeping must never ride
          // inside the measurement (r7 ADVICE; recentProgress iteration
          // is cheap but it belongs outside the timed region on principle)
          val elapsed = (System.nanoTime() - t0) / 1e9
          recordState("s02_funnel_rocksdb", q)
          elapsed
        } finally {
          Session.rocksDBConfs.keys.foreach(spark.conf.unset)
          spark.conf.set("spark.sql.shuffle.partitions", prevS02Parts)
        }
      } catch {
        case e: Throwable =>
          errors("s02_funnel_rocksdb") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s02_funnel_rocksdb FAILED: ${errors("s02_funnel_rocksdb")}")
          -1.0
      }
    }
    // Local-only knob (driver never sets it): comma-separated name
    // prefixes to bench a subset — e.g. the 8-query scale sweep at
    // sf0.5. Unset → full suite, exactly the driver's run.
    val nameFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
        case Some(f) if f.nonEmpty =>
          val ps = f.split(",").map(_.trim).filter(_.nonEmpty)
          (n: String) => ps.exists(n.startsWith)
        case _ => (_: String) => true
      }
    // s03: the streaming heavy-hitters sketch (MapState Misra–Gries) over
    // the geo-assigned events stream — hot user ids per region, the skew
    // detector. Same discipline as s02: shared 8-file source, fresh
    // checkpoint + RocksDB per run.
    def trendingOnce(): Double = {
      try {
        val src = s02Src
        val t0 = System.nanoTime()
        val ckpt = java.nio.file.Files.createTempDirectory("bench_s03_ckpt").toString
        // state parallelism = f(catalog), not executor count: 32 stores
        // for a 2-region key space measured 8–16 s wall / 130–210 s
        // Σcommit from concurrent empty-store fsync contention (and WAS
        // the r7 "s03 drift"); the shipped 4-store config measured
        // 3.76 s wall / 1.6 s Σcommit (5-store probe: 3.6 s / 3 s). See
        // Tws.regionStateParallelism. s02 keeps 32: its user_id key
        // space is corpus-sized, so every store carries real state.
        val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
        // conf mutation INSIDE the try (r8 ADVICE): a throw between a
        // partial set and the try entry would skip the finally restore
        // and leak a 4-partition shuffle config into every later query
        try {
          Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
          spark.conf.set("spark.sql.shuffle.partitions",
            graft.streaming.Tws.regionStateParallelism(
              graft.operators.Geo.usaCatalog.size).toString)
          import spark.implicits._
          import org.apache.spark.sql.functions.col
          val ev = graft.streaming.Ingest.eventsFileStream(spark, src,
            maxFilesPerTrigger = 1)
          val tokens = graft.operators.Geo.assignRegion(spark, ev)
            .select(col("region"), col("user_id").cast("string").as("token"))
            .as[graft.streaming.Tws.RegionToken]
          val q = graft.streaming.Tws.trendingTws(tokens)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          awaitStream("s03_trending_rocksdb", q)
          val elapsed = (System.nanoTime() - t0) / 1e9
          recordState("s03_trending_rocksdb", q)
          elapsed
        } finally {
          Session.rocksDBConfs.keys.foreach(spark.conf.unset)
          spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        }
      } catch {
        case e: Throwable =>
          errors("s03_trending_rocksdb") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s03_trending_rocksdb FAILED: ${errors("s03_trending_rocksdb")}")
          -1.0
      }
    }
    // s04: the streaming quantile sketch (ValueState KLL blob) over the
    // geo-assigned events stream — per-region value percentiles, the
    // distribution dashboard beside s03's frequent items. Same
    // discipline: shared 8-file source, fresh checkpoint + RocksDB per
    // run, state parallelism sized to the region catalog (one blob per
    // region per batch is the entire state write traffic).
    def quantilesOnce(): Double = {
      try {
        val src = s02Src
        val t0 = System.nanoTime()
        val ckpt = java.nio.file.Files.createTempDirectory("bench_s04_ckpt").toString
        val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
        try {
          Session.rocksDBConfs.foreach { case (k, v) => spark.conf.set(k, v) }
          spark.conf.set("spark.sql.shuffle.partitions",
            graft.streaming.Tws.regionStateParallelism(
              graft.operators.Geo.usaCatalog.size).toString)
          import spark.implicits._
          import org.apache.spark.sql.functions.col
          val ev = graft.streaming.Ingest.eventsFileStream(spark, src,
            maxFilesPerTrigger = 1)
          val values = graft.operators.Geo.assignRegion(spark, ev)
            .filter(col("value").isNotNull)
            .select(col("region"), col("value").cast("double").as("v"))
            .as[graft.streaming.Tws.RegionValue]
          val q = graft.streaming.Tws.quantilesTws(values)
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          awaitStream("s04_quantiles_rocksdb", q)
          val elapsed = (System.nanoTime() - t0) / 1e9
          recordState("s04_quantiles_rocksdb", q)
          elapsed
        } finally {
          Session.rocksDBConfs.keys.foreach(spark.conf.unset)
          spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        }
      } catch {
        case e: Throwable =>
          errors("s04_quantiles_rocksdb") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s04_quantiles_rocksdb FAILED: ${errors("s04_quantiles_rocksdb")}")
          -1.0
      }
    }
    // s05: the published KLL dashboard maintained by a STREAM (q127's
    // continuous twin, r15 verdict ask #3) — bootstrap the base window
    // into the segment store, stream the delta as 8 one-batch files
    // appending blob segments to the published table under the lease/
    // manifest discipline, then attach-serve the dashboard (blob-only
    // read). Fresh segment store + checkpoint + published table per
    // run (the table name is store-keyed): unlike q120-q127 this
    // entry deliberately measures the COLD lifecycle — publish-per-run
    // IS the operation, so no structural cache guard applies. No
    // recordState: the sink is a stateless foreachBatch.
    lazy val s05Src: String = {
      // the split point and the column selection come from ONE place
      // (Sketches.kllBaseCut / KllPublish.stageDelta) — a diverging
      // copy would double-count the overlap window in the dashboard
      val d = java.nio.file.Files.createTempDirectory("bench_s05_src").toString
      graft.streaming.KllPublish.stageDelta(spark, sfDir, d,
        graft.operators.Sketches.kllBaseCut(spark, sfDir), files = 8)
      d
    }
    // s06: the streaming CDC apply into a Snap table — like s05 this
    // measures the COLD lifecycle on purpose (create + 6 one-file
    // micro-batch merges, each paying the full lease/stage/manifest
    // discipline, with autoOptimize=4 folding the accumulating insert
    // bucket MID-STREAM). Source staged once per bench JVM; table and
    // checkpoint fresh per run. No recordState: stateless foreachBatch.
    lazy val s06Src: String = {
      val d = java.nio.file.Files.createTempDirectory("bench_s06_src")
      val cust = graft.sources.Tables.customer(spark, sfDir)
      val m = cust.agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("c_custkey"))).head.getLong(0) + 1L
      import org.apache.spark.sql.functions._
      (0 until 6).foreach { k =>
        // INSERT batches (keys past the range): the top bucket
        // accumulates one file per batch — the shape that makes the
        // in-stream fold fire at 4 files
        val delta = cust.filter(col("c_custkey") < math.max(1L, m / 100))
          .select((col("c_custkey") + lit(k + 1) * m).as("c_custkey"),
            col("c_name"), col("c_nationkey"), col("c_acctbal"),
            lit(s"CDC$k").as("c_mktsegment"))
          .withColumn("_deleted", lit(false))
        // underscore-prefixed staging dir (hidden from Spark's file
        // listings) + deleted after the move — the probe's discipline;
        // a visible leftover dir would be a phantom micro-batch away
        // from breaking the applied==5 gate (review finding)
        val tmp = d.resolve(s"_tmp_$k")
        delta.coalesce(1).write.parquet(tmp.toString)
        val ls = java.nio.file.Files.list(tmp)
        try {
          val it = ls.iterator()
          while (it.hasNext) {
            val p = it.next()
            if (p.getFileName.toString.startsWith("part-"))
              java.nio.file.Files.move(p, d.resolve(f"d$k%02d.parquet"))
          }
        } finally ls.close()
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      d.toString
    }
    def snapCdcOnce(): Double = {
      try {
        val src = s06Src
        val t0 = System.nanoTime()
        val root = java.nio.file.Files.createTempDirectory("bench_s06")
        val loc = new org.apache.hadoop.fs.Path(root.resolve("tbl").toString)
        val ckpt = root.resolve("ckpt").toString
        graft.sources.Snap.create(spark, loc,
          graft.sources.Tables.customer(spark, sfDir),
          Seq("c_custkey"), "c_custkey", 8, layout = "range", tag = "bench")
        val in = spark.readStream
          .schema(spark.read.parquet(src).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val q = graft.streaming.SnapCdc.cdcSink(in, loc.toString, ckpt,
          autoOptimize = 4,
          trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
        awaitStream("s06_snap_cdc_stream", q)
        val h = graft.sources.Snap.head(spark, loc).get
        require(h.applied == 5L, s"s06 applied=${h.applied}, want 5")
        require(h.files.groupBy(_.bucket).valuesIterator.forall(_.size < 4),
          "s06: the in-stream fold never fired")
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s06_snap_cdc_stream") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s06_snap_cdc_stream FAILED: ${errors("s06_snap_cdc_stream")}")
          -1.0
      }
    }
    // s07: the snap follower — source table + rate-ticked changelog
    // follower converging a live merge stream into a destination table
    // (SnapFollow). Fresh source/destination/checkpoint per run; the
    // follower's cursor lives in the destination manifest, so the
    // convergence check (applied == source head) IS the exactly-once
    // gate. COLD lifecycle on purpose: per-commit control-plane cost
    // is the object, data volume is the sf's customer rows.
    def snapFollowOnce(): Double = {
      try {
        val t0 = System.nanoTime()
        val root = java.nio.file.Files.createTempDirectory("bench_s07")
        val src = new org.apache.hadoop.fs.Path(root.resolve("src").toString)
        val dst = new org.apache.hadoop.fs.Path(root.resolve("dst").toString)
        val cust = graft.sources.Tables.customer(spark, sfDir)
        import org.apache.spark.sql.functions._
        graft.sources.Snap.create(spark, src, cust,
          Seq("c_custkey"), "c_custkey", 8, layout = "range", tag = "bench")
        val q = graft.streaming.SnapFollow.follow(spark, src.toString,
          dst.toString, root.resolve("ckpt").toString,
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
        try {
          // four disjoint re-price batches land WHILE the follower ticks
          (0 until 4).foreach { k =>
            graft.sources.Snap.merge(spark, src,
              cust.filter(col("c_custkey") >= k * 20 &&
                  col("c_custkey") < k * 20 + 20)
                .withColumn("c_acctbal", col("c_acctbal") + lit((k + 1).toDouble))
                .withColumn("_deleted", lit(false)))
          }
          val deadline = System.currentTimeMillis() + 120000L
          while (graft.sources.Snap.head(spark, dst)
              .exists(_.applied < 5L) &&
              System.currentTimeMillis() < deadline) Thread.sleep(200L)
        } finally q.stop()
        val dh = graft.sources.Snap.head(spark, dst).get
        require(dh.applied == 5L, s"s07 cursor=${dh.applied}, want 5")
        // bag equality in one job (the exceptAll pair cost four) —
        // the same strict row-set gate, cheaper to ask
        require(graft.sources.SnapOps.bagEqual(
            graft.sources.Snap.read(spark, dst),
            graft.sources.Snap.read(spark, src)),
          "s07 destination diverged from the source")
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s07_snap_follow_stream") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(
            s"[bench] s07_snap_follow_stream FAILED: ${errors("s07_snap_follow_stream")}")
          -1.0
      }
    }
    // s08: the MAINTAINED-AGGREGATE follower (r19) — followAgg keeps a
    // per-nation (count, decimal sum) table in lockstep with a live
    // merge stream by applying preimage changelog deltas (q85's IVM
    // lesson run continuously; never a recompute after the create).
    // Convergence gate: the maintained table must EXACTLY equal a
    // fresh recompute from the source head (decimal sums — bit-exact).
    // COLD lifecycle like s07: per-commit control-plane cost is the
    // measured object.
    def snapFollowAggOnce(): Double = {
      try {
        val t0 = System.nanoTime()
        val root = java.nio.file.Files.createTempDirectory("bench_s08")
        val src = new org.apache.hadoop.fs.Path(root.resolve("src").toString)
        val dst = new org.apache.hadoop.fs.Path(root.resolve("dst").toString)
        val cust = graft.sources.Tables.customer(spark, sfDir)
        import org.apache.spark.sql.functions._
        graft.sources.Snap.create(spark, src, cust,
          Seq("c_custkey"), "c_custkey", 8, layout = "range", tag = "bench")
        val q = graft.streaming.SnapFollow.followAgg(spark, src.toString,
          dst.toString, root.resolve("ckpt").toString,
          "c_nationkey", "c_acctbal",
          org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
        try {
          (0 until 4).foreach { k =>
            graft.sources.Snap.merge(spark, src,
              cust.filter(col("c_custkey") >= k * 20 &&
                  col("c_custkey") < k * 20 + 20)
                .withColumn("c_acctbal", col("c_acctbal") + lit((k + 1).toDouble))
                .withColumn("_deleted", lit(false)))
          }
          val deadline = System.currentTimeMillis() + 120000L
          while (graft.sources.Snap.head(spark, dst)
              .exists(_.applied < 5L) &&
              System.currentTimeMillis() < deadline) Thread.sleep(200L)
        } finally q.stop()
        val dh = graft.sources.Snap.head(spark, dst).get
        require(dh.applied == 5L, s"s08 cursor=${dh.applied}, want 5")
        val expect = graft.streaming.SnapFollow.aggOf(
          graft.sources.Snap.read(spark, src), "c_nationkey", "c_acctbal")
        val got = graft.sources.Snap.read(spark, dst)
        require(graft.sources.SnapOps.bagEqual(got, expect),
          "s08 maintained aggregate diverged from the recompute")
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s08_snap_follow_agg") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(
            s"[bench] s08_snap_follow_agg FAILED: ${errors("s08_snap_follow_agg")}")
          -1.0
      }
    }
    // s09: the NATIVE streaming sink (r20) — writeStream.toTable
    // through the DSv2 catalog: CREATE TABLE (pending) + 6 one-file
    // epochs (epoch 0 = the deferred data-bounds create, 1-5 merges
    // gated by the applied-high-water inside the manifest commit).
    // Same COLD control-plane lifecycle s06 measures for the
    // foreachBatch CDC sink — the pair prices the catalog write path
    // against the direct one on an identical epoch schedule.
    def nativeSinkOnce(): Double = {
      try {
        val src = s06Src
        val t0 = System.nanoTime()
        val root = java.nio.file.Files.createTempDirectory("bench_s09")
        val cat = "bench_s09cat_" + java.lang.Long.toHexString(t0)
        spark.conf.set(s"spark.sql.catalog.$cat",
          classOf[graft.sources.SnapCatalog].getName)
        spark.conf.set(s"spark.sql.catalog.$cat.root",
          root.resolve("wh").toString)
        spark.sql(s"CREATE TABLE $cat.t (c_custkey BIGINT, " +
          "c_name STRING, c_nationkey BIGINT, c_acctbal DOUBLE, " +
          "c_mktsegment STRING) TBLPROPERTIES (" +
          "'key'='c_custkey','buckets'='8','layout'='range')")
        // insert-only epochs; streaming writes carry no implicit casts,
        // so the stream states the table's exact column types
        val in = spark.readStream
          .schema(spark.read.parquet(src).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src).drop("_deleted")
          .selectExpr("CAST(c_custkey AS BIGINT) c_custkey", "c_name",
            "CAST(c_nationkey AS BIGINT) c_nationkey",
            "CAST(c_acctbal AS DOUBLE) c_acctbal", "c_mktsegment")
        val q = in.writeStream
          .option("checkpointLocation", root.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable(s"$cat.t")
        awaitStream("s09_snap_native_sink", q)
        val loc = new org.apache.hadoop.fs.Path(
          root.resolve("wh").resolve("t").toString)
        val h = graft.sources.Snap.head(spark, loc).get
        require(h.applied == 5L, s"s09 applied=${h.applied}, want 5")
        require(spark.sql(s"SELECT count(*) AS n FROM $cat.t")
          .head.getLong(0) == graft.sources.Snap.read(spark, loc).count(),
          "s09 catalog read diverged from the direct read")
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s09_snap_native_sink") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s09_snap_native_sink FAILED: ${errors("s09_snap_native_sink")}")
          -1.0
      }
    }
    def kllStreamOnce(): Double = {
      try {
        val src = s05Src
        val t0 = System.nanoTime()
        val segDir = java.nio.file.Files.createTempDirectory("bench_s05_seg").toString
        val ckpt = java.nio.file.Files.createTempDirectory("bench_s05_ckpt").toString
        graft.streaming.KllPublish.bootstrapBase(spark, sfDir, segDir)
        val in = spark.readStream
          .schema(spark.read.parquet(src).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(src)
        val q = graft.streaming.KllPublish.kllPublishedSink(in, segDir, ckpt)
        awaitStream("s05_kll_publish_stream", q)
        val served = graft.streaming.KllPublish.attachServe(spark, segDir).head
        require(served.getAs[Long]("n_rows") == served.getAs[Long]("sketch_n"),
          "s05 served a count-inexact dashboard")
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors("s05_kll_publish_stream") =
            Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.take(1).mkString
          System.err.println(s"[bench] s05_kll_publish_stream FAILED: ${errors("s05_kll_publish_stream")}")
          -1.0
      }
    }
    val results = SparkEntry.queries.collect {
      case (name, fn) if nameFilter(name) => name -> time(name, fn)
    } ++ Seq(
      "s01_stream_envelope" -> (() => streamOnce()),
      "s02_funnel_rocksdb" -> (() => statefulOnce()),
      "s03_trending_rocksdb" -> (() => trendingOnce()),
      "s04_quantiles_rocksdb" -> (() => quantilesOnce()),
      "s05_kll_publish_stream" -> (() => kllStreamOnce()),
      "s06_snap_cdc_stream" -> (() => snapCdcOnce()),
      "s07_snap_follow_stream" -> (() => snapFollowOnce()),
      "s08_snap_follow_agg" -> (() => snapFollowAggOnce()),
      "s09_snap_native_sink" -> (() => nativeSinkOnce())).collect {
      case (name, once) if nameFilter(name) => name -> timeBoth(name, once)
    }
    // ms precision: full ns resolution is noise (spreads are 10-100 ms).
    def f(v: Double): String = if (v < 0) "-1" else "%.3f".format(v)
    // compact tail keys: the qNN/sNN prefix (unique by construction),
    // 10 ms resolution — enough to read a regression, short enough that
    // ALL entries fit the tail budget
    def short(n: String): String = n.takeWhile(_ != '_')
    def f2(v: Double): String = if (v < 0) "-1" else "%.2f".format(v)
    val qs = results.map { case (k, v) => Jsons.str(k) + ":" + f(v) }
      .mkString("{", ",", "}")
    val sp = results.keys.map { k =>
      Jsons.str(k) + ":" + f(spreads.getOrElse(k, -1.0))
    }.mkString("{", ",", "}")
    // error messages are length-budgeted: a few 300-char Spark stage-
    // failure lines would push the tail past the driver's 2000-char
    // snapshot and evict the state/noisy maps this artifact exists to
    // preserve — 120 chars identifies any failure class
    val errs = errors.map { case (k, v) => Jsons.str(k) + ":" + Jsons.str(v.take(120)) }
      .mkString("{", ",", "}")
    val state = stateMetrics.map { case (k, v) => Jsons.str(short(k)) + ":" + v }
      .mkString("{", ",", "}")
    val noisyJs = noisy.map { case (k, v) => Jsons.str(short(k)) + ":" + f(v) }
      .mkString("{", ",", "}")
    val rerunJs = rerunFails.map { case (k, v) =>
      Jsons.str(short(k)) + ":" + Jsons.str(v.take(120))
    }.mkString("{", ",", "}")
    val qShort = results.map { case (k, v) => Jsons.str(short(k)) + ":" + f2(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // Field order matters: the driver snapshots only the LAST 2000 chars
    // of this line. Expendable first (full spread map, full-name times —
    // both readable in stdout), then the self-diagnosing tail that must
    // survive: streaming state metrics, the noisy-entry flags (round-6
    // verdict #1: q56's phantom arrived unflagged because the spread map
    // got truncated), ALL per-query times under compact qNN keys, errors,
    // total. Budget: 113 compact entries ≈ 1.5k chars + state + flags
    // + errors + total < 2000.
    // build identity (git HEAD, no exec — read the ref files directly):
    // state_trend's idle-min suppression window must only pool samples
    // from the SAME build, or a genuine regression whose build has one
    // sample would be suppressed by the previous build's idle minima
    val build = try {
      // `.git` is a FILE in worktrees ("gitdir: <path>") — follow it,
      // or build identity silently vanishes exactly where parallel
      // bench runs are most likely to happen
      val dotGit = java.nio.file.Paths.get(".git")
      val git =
        if (java.nio.file.Files.isRegularFile(dotGit))
          java.nio.file.Paths.get(new String(
            java.nio.file.Files.readAllBytes(dotGit), "UTF-8")
            .trim.stripPrefix("gitdir: "))
        else dotGit
      // In a worktree the gitdir holds HEAD but NOT the refs: a branch
      // HEAD says "ref: refs/heads/<b>", and that loose ref (and
      // packed-refs) live in the COMMON .git the worktree's `commondir`
      // file points at (usually "../.." relative to the worktree
      // gitdir). Resolving refs against the worktree gitdir missed
      // every on-branch worktree — exactly the parallel-bench scenario
      // this lookup exists for — and silently fell back to "".
      val commonFile = git.resolve("commondir")
      val common =
        if (java.nio.file.Files.isRegularFile(commonFile))
          git.resolve(new String(java.nio.file.Files.readAllBytes(commonFile),
            "UTF-8").trim).normalize()
        else git
      val head = new String(java.nio.file.Files.readAllBytes(
        git.resolve("HEAD")), "UTF-8").trim
      val sha =
        if (!head.startsWith("ref: ")) head
        else {
          val ref = head.stripPrefix("ref: ")
          val loose = common.resolve(ref)
          if (java.nio.file.Files.exists(loose))
            new String(java.nio.file.Files.readAllBytes(loose), "UTF-8").trim
          else {
            val packed = common.resolve("packed-refs")
            if (!java.nio.file.Files.exists(packed)) ""
            else new String(java.nio.file.Files.readAllBytes(packed), "UTF-8")
              .linesIterator.find(_.endsWith(" " + ref))
              .map(_.split(" ")(0)).getOrElse("")
          }
        }
      sha.take(12)
    } catch { case _: Exception => "" }
    // an EMPTY build id makes state_trend fall back to cross-build
    // pooling — the suppression hole the field exists to close — so
    // losing identity must at least be loud in the run log
    if (build.isEmpty)
      System.err.println("[bench] WARNING: build id unresolved; " +
        "idle-min trend suppression will pool across builds")
    val artifact = s"""{"metric":"total","unit":"sec","sf":"$sfDir","spread":$sp,"queries":$qs,"state":$state,"noisy":$noisyJs,"rerunErrors":$rerunJs,"q":$qShort,"errors":$errs,"build":"$build","value":${f(total)}}"""
    println(artifact)
    // the driver snapshots only the line's last 2000 chars into
    // BENCH_r{N}.json — ALSO append the full line to a repo-local
    // history file so tools/state_trend.py's cross-round batch diff
    // never works from a truncated map (round 10; the r1–r6 artifacts'
    // partial query coverage is exactly this gap). FULL suite runs
    // only — filtered subsets would pollute the trend with partial,
    // cold-JIT-inflated entries. Opt-out: SPARK_GRAFT_BENCH_HISTORY=off.
    if (sys.env.get("SPARK_GRAFT_BENCH_HISTORY").forall(_ != "off") &&
        sys.env.get("SPARK_GRAFT_BENCH_FILTER").forall(_.isEmpty)) {
      try {
        val dir = java.nio.file.Paths.get("bench_history")
        java.nio.file.Files.createDirectories(dir)
        val sfTag = sfDir.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+", "")
        java.nio.file.Files.write(
          dir.resolve(s"bench_${sfTag}_${System.currentTimeMillis / 1000}.json"),
          (artifact + "\n").getBytes("UTF-8"))
      } catch { case e: Exception =>
        System.err.println(s"[bench] history write skipped: ${e.getMessage}")
      }
    }
    // The driver snapshots the last 2000 chars of stdout and tries to
    // parse a JSON line out of it; the full artifact above is >2000
    // chars (129 long-name entries + spreads + state), so its HEAD is
    // what gets truncated and r1–r14 all landed with "parsed": null.
    // Emit a final COMPACT line that is complete, valid JSON inside the
    // snapshot even with sbt's trailing "[success] Total time: …" line
    // (~75 chars) after it. Budget: 130 compact 2dp entries ≈ 1.6k +
    // ~120 overhead + 75 sbt ≈ 1.8k < 2000 — ~15 more queries of
    // headroom; if the suite outgrows it, drop to 1dp or split the
    // queries map (full detail always lives in the line above and in
    // bench_history/).
    val sfTagShort = java.nio.file.Paths.get(sfDir).getFileName.toString
    val compact = s"""{"metric":"total","unit":"sec","sf":${Jsons.str(sfTagShort)},"queries":$qShort,"errors":$errs,"build":"$build","value":${f(total)}}"""
    if (compact.length > 1880)
      System.err.println(s"[bench] WARNING: compact artifact line is " +
        s"${compact.length} chars — approaching the driver's 2000-char " +
        "tail snapshot; shrink the encoding before it truncates")
    println(compact)
    spark.stop()
  }
}
