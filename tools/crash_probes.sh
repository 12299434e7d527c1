#!/usr/bin/env bash
# Two DRIVER-crash probes (r12 verdict asks #2 and #3) — the crashes the
# lease and the checkpoint exist for, executed for real with kill -9 /
# Runtime.halt on whole JVMs:
#
#   leg A (mid-publish writer death): a JVM first-building q120's
#     published ANN index is kill -9'd while its bucketed write is
#     in flight — provably mid-publish: the kill triggers on the
#     appearance of the private staging directory, before any marker
#     exists. A second JVM must then (1) find the dead writer's lease,
#     (2) break it once stale, (3) sweep the staging debris, (4)
#     rebuild, and (5) pass the DuckDB oracle — with no lease, break
#     or stage debris left behind. SPARK_GRAFT_LEASE_STALE_MS shrinks
#     the stale threshold so the probe doesn't wait 30 minutes.
#
#   leg B (mid-stream driver death): StreamRestartProbe runs the
#     streaming dedup gate over 8 staged files (one per micro-batch),
#     halts the driver JVM after exactly 2 committed batches, restarts
#     the sink from its checkpoint in a NEW JVM, and requires the
#     crashed+resumed decision lineage to be IDENTICAL to an
#     uninterrupted run — no doc decided twice, none lost.
#
# Run from the repo root. Exits non-zero on any violated expectation.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
# package once; probe JVMs launch via tools/graft_java.sh (bare java
# against the jar — no sbt boot-server socket collisions, no ~15 s sbt
# startup inside the kill-timing window)
sbt -batch package >/dev/null 2>&1
RUN="tools/graft_java.sh"
# honoring SPARK_GRAFT_MASTER=local-cluster[...] reruns the legs with
# real separate worker JVMs (the executors die with their driver's
# process group in leg A); that master needs the Scala version pinned
# for the executor launcher
if [[ "${SPARK_GRAFT_MASTER:-}" == local-cluster* ]]; then
  export SPARK_SCALA_VERSION=2.13
fi

echo "== leg A: kill -9 a publisher mid-write, stale-break + rebuild in a second JVM"
WH=$(mktemp -d /tmp/graft-crash-wh.XXXX); rm -rf "$WH"
OUT=$(mktemp -d /tmp/graft-crash-out.XXXX)
# SPARK_GRAFT_HDFS_SIM=true reruns the leg with the warehouse resolved
# through the hdfs:// scheme (graft.sources.HdfsSimFileSystem backs it
# onto the same local dir, so the script's out-of-band ls/find
# assertions keep inspecting the real files while every JVM-side
# operation — lease, staging, swap, heartbeat — goes through the
# non-file-scheme code paths)
WH_URI="$WH"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  WH_URI="hdfs://graftsim$WH"
  echo "-- hdfs-sim mode: warehouse URI $WH_URI"
fi
# SPARK_GRAFT_S3_SIM=true likewise resolves the warehouse through the
# s3a:// scheme (graft.sources.S3SimFileSystem — object-store semantics:
# copy+delete rename, silent setTimes, conditional-put create) and adds
# leg C below: a kill -9 INSIDE the non-atomic swap copy.
if [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  WH_URI="s3a://graftbucket$WH"
  echo "-- s3-sim mode: warehouse URI $WH_URI"
fi
setsid env SPARK_GRAFT_WAREHOUSE="$WH_URI" \
  $RUN graft.Verify $SF $OUT/a q120 >/tmp/crash_a.log 2>&1 &
A=$!
# kill the MOMENT the staging dir appears: the lease is held (staging
# only ever starts under it) and the marker cannot exist yet (it is
# stamped into the stage only after the bucketed write completes)
for i in $(seq 1 1200); do
  ls "$WH" 2>/dev/null | grep -q "_GRAFT_STAGE_" && break
  sleep 0.1
done
ls "$WH" | grep -q "_GRAFT_STAGE_" || { echo "FAIL: no staging dir ever appeared"; exit 1; }
kill -9 -- "-$A" 2>/dev/null || kill -9 "$A" || true
wait "$A" 2>/dev/null || true
echo "-- warehouse at kill: $(ls "$WH" | tr '\n' ' ')"
ls "$WH" | grep -q "_GRAFT_LEASE$" || { echo "FAIL: dead writer left no lease"; exit 1; }
# only a marker in the SERVE directory means the publish committed — a
# marker inside a ._GRAFT_STAGE_ dir is the staged pre-swap copy and
# does NOT mean the kill came too late
find "$WH" -maxdepth 2 -name "_GRAFT_PUBLISHED" -not -path "*_GRAFT_STAGE_*" 2>/dev/null | grep -q . && \
  { echo "FAIL: kill landed after the publish completed (serve marker exists)"; exit 1; }
sleep 3  # let the orphaned lease age past the shrunken stale threshold
SPARK_GRAFT_WAREHOUSE="$WH_URI" SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.Verify $SF $OUT/b q120 >/tmp/crash_b.log 2>&1
grep -aq "\[verify\].*failed" /tmp/crash_b.log && \
  { echo "FAIL: the rebuilding JVM reported a query failure"; exit 1; }
python3 tools/oracle_check.py "$SF" "$OUT/b" | tail -1
python3 tools/oracle_check.py "$SF" "$OUT/b" >/dev/null || \
  { echo "FAIL: rebuilt index failed the oracle"; exit 1; }
ls "$WH" | grep -q "_GRAFT_STAGE_" && { echo "FAIL: stage debris remains"; exit 1; }
ls "$WH" | grep -q "_GRAFT_LEASE" && { echo "FAIL: lease/break debris remains"; exit 1; }
ls "$WH"/graft_annidx_cells_*/_GRAFT_PUBLISHED >/dev/null 2>&1 || \
  { echo "FAIL: rebuilt table carries no marker"; exit 1; }
echo "leg A OK: mid-publish death -> stale-break -> clean rebuild, oracle green"

echo "== leg B: halt the streaming driver after 2 committed batches, resume in a new JVM"
ROOT=$(mktemp -d /tmp/graft-restart.XXXX)
# in a sim mode the probe root — SOURCE, CHECKPOINT, sink, index — all
# resolve through the foreign scheme too: the stream's commit log and
# resume machinery run on the simulated store's semantics (FileContext
# resolves the sims' AbstractFileSystem delegates)
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  ROOT="hdfs://graftsim$ROOT"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  ROOT="s3a://graftbucket$ROOT"
fi
$RUN graft.StreamRestartProbe base $SF $ROOT >/tmp/restart_base.log 2>&1
grep -a "RESTARTPROBE base" /tmp/restart_base.log || { echo "FAIL: base leg produced nothing"; exit 1; }
# run1 halts its own JVM (exit 137) — the nonzero exit is expected
$RUN graft.StreamRestartProbe run1 $SF $ROOT >/tmp/restart_run1.log 2>&1 || true
grep -a "RESTARTPROBE halting" /tmp/restart_run1.log || \
  { echo "FAIL: run1 did not halt mid-stream (drained or died early)"; exit 1; }
grep -aq "RESTARTPROBE run1 FAILED" /tmp/restart_run1.log && \
  { echo "FAIL: run1 drained the whole source before halting"; exit 1; }
$RUN graft.StreamRestartProbe run2 $SF $ROOT >/tmp/restart_run2.log 2>&1
grep -a "RESTARTPROBE run2" /tmp/restart_run2.log || { echo "FAIL: run2 resume failed"; exit 1; }
$RUN graft.StreamRestartProbe check $SF $ROOT >/tmp/restart_check.log 2>&1
grep -a "RESTARTPROBE ALL OK" /tmp/restart_check.log || \
  { echo "FAIL: crashed+resumed decisions diverge from uninterrupted run"; cat /tmp/restart_check.log | grep -a RESTARTPROBE; exit 1; }
echo "leg B OK: driver death after 2 batches -> checkpoint resume -> identical decisions"

echo "== leg D: halt the index-maintenance stream driver after 2 committed batches, resume in a new JVM"
# StreamRestartProbe's twin over the PUBLISHED-index lifecycle: every
# micro-batch writes two durable stores (occupancy delta + drift audit)
# against warehouse-published tables; the crashed+resumed delta table
# and per-batch audits must equal the uninterrupted run's row-for-row.
ROOTM=$(mktemp -d /tmp/graft-maintain.XXXX)
WHM=$(mktemp -d /tmp/graft-maintain-wh.XXXX); rm -rf "$WHM"
ROOTM_URI="$ROOTM"; WHM_URI="$WHM"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  ROOTM_URI="hdfs://graftsim$ROOTM"; WHM_URI="hdfs://graftsim$WHM"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  ROOTM_URI="s3a://graftbucket$ROOTM"; WHM_URI="s3a://graftbucket$WHM"
fi
SPARK_GRAFT_WAREHOUSE="$WHM_URI" $RUN graft.MaintainRestartProbe base $SF $ROOTM_URI >/tmp/maintain_base.log 2>&1
grep -a "MAINTAINPROBE base" /tmp/maintain_base.log || { echo "FAIL: maintain base leg produced nothing"; exit 1; }
# run1 halts its own JVM (exit 137) — the nonzero exit is expected
SPARK_GRAFT_WAREHOUSE="$WHM_URI" $RUN graft.MaintainRestartProbe run1 $SF $ROOTM_URI >/tmp/maintain_run1.log 2>&1 || true
grep -a "RESTARTPROBE halting" /tmp/maintain_run1.log || \
  { echo "FAIL: maintain run1 did not halt mid-stream (drained or died early)"; exit 1; }
grep -aq "MAINTAINPROBE run1 FAILED" /tmp/maintain_run1.log && \
  { echo "FAIL: maintain run1 drained the whole source before halting"; exit 1; }
SPARK_GRAFT_WAREHOUSE="$WHM_URI" $RUN graft.MaintainRestartProbe run2 $SF $ROOTM_URI >/tmp/maintain_run2.log 2>&1
grep -a "MAINTAINPROBE run2" /tmp/maintain_run2.log || { echo "FAIL: maintain run2 resume failed"; exit 1; }
SPARK_GRAFT_WAREHOUSE="$WHM_URI" $RUN graft.MaintainRestartProbe check $SF $ROOTM_URI >/tmp/maintain_check.log 2>&1
grep -a "MAINTAINPROBE ALL OK" /tmp/maintain_check.log || \
  { echo "FAIL: crashed+resumed index maintenance diverges from uninterrupted run"; grep -a MAINTAINPROBE /tmp/maintain_check.log; exit 1; }
echo "leg D OK: driver death after 2 batches -> checkpoint resume -> identical delta table + drift audits"

# leg C (s3-sim mode only): kill -9 INSIDE the publish swap's COPY phase.
# On an object store rename(stage -> serve) is per-object copy + delete,
# not a metadata op — a writer dying mid-swap leaves a PARTIAL serve
# directory (possibly with a complete-looking marker: the marker sorts
# first in the copy order). The next JVM must refuse to serve the torn
# table (manifest mismatch), stale-break the dead lease, retire the
# partial dir aside, rebuild, and pass the oracle with zero debris.
# SPARK_GRAFT_S3_SLOW_RENAME_MS widens the copy window enough to land
# the kill deterministically.
if [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  echo "== leg C: kill -9 a publisher mid-SWAP-COPY (s3 rename is copy+delete)"
  WH2=$(mktemp -d /tmp/graft-crash-wh.XXXX); rm -rf "$WH2"
  OUT2=$(mktemp -d /tmp/graft-crash-out.XXXX)
  WH2_URI="s3a://graftbucket$WH2"
  setsid env SPARK_GRAFT_WAREHOUSE="$WH2_URI" SPARK_GRAFT_S3_SLOW_RENAME_MS=150 \
    $RUN graft.Verify $SF $OUT2/a q120 >/tmp/crash_c.log 2>&1 &
  C=$!
  # mid-swap signature: a serve dir X exists WHILE its X._GRAFT_STAGE_*
  # sibling still exists — only the swap's copy/delete phases expose
  # both (the committer's internal renames all land inside the stage)
  TBL=""
  for i in $(seq 1 2400); do
    for d in "$WH2"/*._GRAFT_STAGE_*; do
      [[ -e "$d" ]] || continue
      t="${d%%._GRAFT_STAGE_*}"
      [[ -d "$t" ]] && { TBL="$t"; break 2; }
    done
    sleep 0.05
  done
  [[ -n "$TBL" ]] || { echo "FAIL: never observed the mid-swap window"; exit 1; }
  kill -9 -- "-$C" 2>/dev/null || kill -9 "$C" || true
  wait "$C" 2>/dev/null || true
  SERVE_N=$(find "$TBL" -maxdepth 1 -type f -name "part-*" 2>/dev/null | wc -l)
  STAGE_N=$(find "$TBL"._GRAFT_STAGE_* -maxdepth 1 -type f -name "part-*" 2>/dev/null | wc -l)
  echo "-- at kill: serve '$(basename "$TBL")' has $SERVE_N/$STAGE_N data files"
  [[ "$SERVE_N" -lt "$STAGE_N" ]] || \
    { echo "FAIL: kill landed after the copy phase completed ($SERVE_N/$STAGE_N)"; exit 1; }
  ls "$WH2" | grep -q "_GRAFT_LEASE$" || { echo "FAIL: dead writer left no lease"; exit 1; }
  sleep 3
  SPARK_GRAFT_WAREHOUSE="$WH2_URI" SPARK_GRAFT_LEASE_STALE_MS=2000 \
    $RUN graft.Verify $SF $OUT2/b q120 >/tmp/crash_c2.log 2>&1
  grep -aq "\[verify\].*failed" /tmp/crash_c2.log && \
    { echo "FAIL: the rebuilding JVM reported a query failure"; exit 1; }
  python3 tools/oracle_check.py "$SF" "$OUT2/b" | tail -1
  python3 tools/oracle_check.py "$SF" "$OUT2/b" >/dev/null || \
    { echo "FAIL: rebuilt index failed the oracle"; exit 1; }
  ls "$WH2" | grep -q "_GRAFT_STAGE_" && { echo "FAIL: stage debris remains"; exit 1; }
  ls "$WH2" | grep -q "_GRAFT_RETIRE_" && { echo "FAIL: retire debris remains"; exit 1; }
  ls "$WH2" | grep -q "_GRAFT_LEASE" && { echo "FAIL: lease/break debris remains"; exit 1; }
  ls "$WH2"/graft_annidx_cells_*/_GRAFT_PUBLISHED >/dev/null 2>&1 || \
    { echo "FAIL: rebuilt table carries no marker"; exit 1; }
  echo "leg C OK: mid-swap-copy death -> torn serve refused -> stale-break -> clean rebuild, oracle green"
fi

echo "== leg E: halt the published-KLL-dashboard stream driver after 2 committed batches, resume in a new JVM"
# KllPublish's crash story (r15 verdict ask #3): every micro-batch
# appends blob segments to a PUBLISHED table under the lease/manifest
# discipline, with a batch-keyed segment store as source of truth. The
# crashed+resumed dashboard must be count-exact-equal to the
# uninterrupted run's (total AND per-slice — KLL tracks n exactly, so
# a lost or doubled batch shifts them) with estimates in the exact
# envelope.
ROOTK=$(mktemp -d /tmp/graft-kllstream.XXXX)
WHK=$(mktemp -d /tmp/graft-kllstream-wh.XXXX); rm -rf "$WHK"
ROOTK_URI="$ROOTK"; WHK_URI="$WHK"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  ROOTK_URI="hdfs://graftsim$ROOTK"; WHK_URI="hdfs://graftsim$WHK"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  ROOTK_URI="s3a://graftbucket$ROOTK"; WHK_URI="s3a://graftbucket$WHK"
fi
SPARK_GRAFT_WAREHOUSE="$WHK_URI" $RUN graft.KllStreamProbe base $SF $ROOTK_URI >/tmp/kllprobe_base.log 2>&1
grep -a "KLLPROBE base OK" /tmp/kllprobe_base.log || { echo "FAIL: kll base leg produced nothing"; exit 1; }
# run1 halts its own JVM (exit 137) — the nonzero exit is expected
SPARK_GRAFT_WAREHOUSE="$WHK_URI" $RUN graft.KllStreamProbe run1 $SF $ROOTK_URI >/tmp/kllprobe_run1.log 2>&1 || true
grep -a "RESTARTPROBE halting" /tmp/kllprobe_run1.log || \
  { echo "FAIL: kll run1 did not halt mid-stream (drained or died early)"; exit 1; }
grep -aq "KLLPROBE run1 FAILED" /tmp/kllprobe_run1.log && \
  { echo "FAIL: kll run1 drained the whole source before halting"; exit 1; }
SPARK_GRAFT_WAREHOUSE="$WHK_URI" $RUN graft.KllStreamProbe run2 $SF $ROOTK_URI >/tmp/kllprobe_run2.log 2>&1
grep -a "KLLPROBE run2" /tmp/kllprobe_run2.log || { echo "FAIL: kll run2 resume failed"; exit 1; }
SPARK_GRAFT_WAREHOUSE="$WHK_URI" $RUN graft.KllStreamProbe check $SF $ROOTK_URI >/tmp/kllprobe_check.log 2>&1
grep -a "KLLPROBE ALL OK" /tmp/kllprobe_check.log || \
  { echo "FAIL: crashed+resumed KLL dashboard diverges from uninterrupted run"; grep -a KLLPROBE /tmp/kllprobe_check.log; exit 1; }
echo "leg E OK: driver death after 2 batches -> checkpoint resume -> count-exact published dashboard"

echo "== leg F: kill -9 INSIDE compactSegments at each of its three crash windows"
# Minor compaction is a four-step commit protocol (build gen -> flag ->
# sweep -> table rebuild); each inter-step window is a real crash state.
# One store carries all three windows in sequence — each fcompact JVM
# halts kill -9-grade (RestartKit.crashWindow) at the named window, a
# NEW JVM asserts the exact torn state and heals it with one compaction
# call, and an fgrow between windows appends PAST the previous heal so
# the next compaction has work (also proving cross-JVM append-after-
# compaction). Window 3 (prerebuild) walks straight into the r16
# "crash-before-rebuild no-op": the healed run must rebuild the stale
# published table from the already-compacted store.
ROOTF=$(mktemp -d /tmp/graft-kllcompact.XXXX)
WHF=$(mktemp -d /tmp/graft-kllcompact-wh.XXXX); rm -rf "$WHF"
ROOTF_URI="$ROOTF"; WHF_URI="$WHF"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  ROOTF_URI="hdfs://graftsim$ROOTF"; WHF_URI="hdfs://graftsim$WHF"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  ROOTF_URI="s3a://graftbucket$ROOTF"; WHF_URI="s3a://graftbucket$WHF"
fi
SPARK_GRAFT_WAREHOUSE="$WHF_URI" $RUN graft.KllStreamProbe fbase $SF $ROOTF_URI >/tmp/kllcompact_fbase.log 2>&1
grep -a "KLLPROBE fbase OK" /tmp/kllcompact_fbase.log || { echo "FAIL: leg F store seeding failed"; exit 1; }
GROW=3
for W in preflag presweep prerebuild; do
  # the compacting JVM must die AT the window (exit 137), never reach
  # its own completion line
  SPARK_GRAFT_WAREHOUSE="$WHF_URI" SPARK_GRAFT_KLL_COMPACT_HALT=$W \
    $RUN graft.KllStreamProbe fcompact $SF $ROOTF_URI >/tmp/kllcompact_${W}.log 2>&1 && \
    { echo "FAIL: fcompact[$W] exited 0 — the halt never fired"; exit 1; }
  grep -a "RESTARTPROBE halting in crash window $W" /tmp/kllcompact_${W}.log || \
    { echo "FAIL: fcompact[$W] died without reaching window $W"; tail -5 /tmp/kllcompact_${W}.log; exit 1; }
  grep -aq "KLLPROBE fcompact OK" /tmp/kllcompact_${W}.log && \
    { echo "FAIL: fcompact[$W] completed past the halt window"; exit 1; }
  # fresh JVM: assert the torn state, heal with one compaction call,
  # validate count-exact + folded store + O(slices) table. The dead
  # compactor died HOLDING the table lease — the healer must
  # stale-break it first (shrunken threshold, as in leg A), so leg F
  # also executes the dead-compactor lease-break.
  sleep 3
  SPARK_GRAFT_WAREHOUSE="$WHF_URI" SPARK_GRAFT_LEASE_STALE_MS=2000 \
    $RUN graft.KllStreamProbe fheal $SF $ROOTF_URI $W >/tmp/kllcompact_heal_${W}.log 2>&1
  grep -a "KLLPROBE fheal OK window=$W" /tmp/kllcompact_heal_${W}.log || \
    { echo "FAIL: fheal[$W] did not heal"; grep -a KLLPROBE /tmp/kllcompact_heal_${W}.log; tail -5 /tmp/kllcompact_heal_${W}.log; exit 1; }
  if [[ "$W" != "prerebuild" ]]; then
    SPARK_GRAFT_WAREHOUSE="$WHF_URI" \
      $RUN graft.KllStreamProbe fgrow $SF $ROOTF_URI $GROW >/tmp/kllcompact_grow_${GROW}.log 2>&1
    grep -a "KLLPROBE fgrow OK batch=$GROW" /tmp/kllcompact_grow_${GROW}.log || \
      { echo "FAIL: fgrow[$GROW] failed"; tail -5 /tmp/kllcompact_grow_${GROW}.log; exit 1; }
    GROW=$((GROW + 1))
  fi
done
echo "leg F OK: all three compaction crash windows (preflag/presweep/prerebuild) -> new-JVM heal -> folded store, O(slices) table, count-exact"

echo "== leg G: snapshot-format (Snap) manifest-commit crash windows"
# The Snap table format has ONE commit point (the manifest create-new).
# Three real process deaths around it, one chained store: snapstage
# (after the data-file moves, before the commit — head must not
# advance, orphans invisible, vacuum sweeps exactly them, retry lands),
# snaptorn (MID-create: footer-less manifest bytes land, then kill —
# readers must fall back to the parent and the retried merge must
# sweep+retake the version), snapcommit (right after the create — the
# commit must be durable with no healing). Each healer JVM also
# stale-breaks the dead writer's lease (shrunken threshold, leg A's
# discipline). Validation is FULL row-set equality against the
# relationally-applied delta chain, every round.
ROOTG=$(mktemp -d /tmp/graft-snapprobe.XXXX)
LOCG_URI="$ROOTG/tbl"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  LOCG_URI="hdfs://graftsim$ROOTG/tbl"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  LOCG_URI="s3a://graftbucket$ROOTG/tbl"
fi
$RUN graft.SnapCrashProbe gbase $SF "$LOCG_URI" >/tmp/snapprobe_gbase.log 2>&1
grep -a "SNAPPROBE gbase OK" /tmp/snapprobe_gbase.log || \
  { echo "FAIL: leg G seeding failed"; tail -5 /tmp/snapprobe_gbase.log; exit 1; }
ROUNDG=2
for W in snapstage snaptorn snapcommit; do
  if [[ "$W" == "snaptorn" ]]; then
    CRASH_ENV=(SPARK_GRAFT_SNAP_TORN=1)
    HALT_LINE="SNAPPROBE torn manifest"
  else
    CRASH_ENV=(SPARK_GRAFT_SNAP_HALT=$W)
    HALT_LINE="RESTARTPROBE halting in crash window $W"
  fi
  env "${CRASH_ENV[@]}" \
    $RUN graft.SnapCrashProbe gcrash $SF "$LOCG_URI" $W $ROUNDG >/tmp/snapprobe_${W}.log 2>&1 && \
    { echo "FAIL: gcrash[$W] exited 0 — the halt never fired"; exit 1; }
  grep -a "$HALT_LINE" /tmp/snapprobe_${W}.log || \
    { echo "FAIL: gcrash[$W] died without reaching window $W"; tail -5 /tmp/snapprobe_${W}.log; exit 1; }
  grep -aq "SNAPPROBE gcrash OK" /tmp/snapprobe_${W}.log && \
    { echo "FAIL: gcrash[$W] completed past the halt window"; exit 1; }
  sleep 3
  SPARK_GRAFT_LEASE_STALE_MS=2000 \
    $RUN graft.SnapCrashProbe gheal $SF "$LOCG_URI" $W $ROUNDG >/tmp/snapprobe_heal_${W}.log 2>&1
  grep -a "SNAPPROBE gheal OK window=$W" /tmp/snapprobe_heal_${W}.log || \
    { echo "FAIL: gheal[$W] did not heal"; grep -a SNAPPROBE /tmp/snapprobe_heal_${W}.log; tail -5 /tmp/snapprobe_heal_${W}.log; exit 1; }
  ROUNDG=$((ROUNDG + 1))
done
echo "leg G OK: all three snap commit windows (snapstage/snaptorn/snapcommit) -> new-JVM heal -> row-set-exact, vacuumed clean"
echo "== leg H: streaming CDC sink driver-death replay (exactly-once apply)"
# The snap table's continuous form: 6 one-file micro-batch deltas ->
# foreachBatch mergeStreaming. The driver is killed after exactly 2
# committed batches — the window where a batch's table-side commit can
# have landed without its checkpoint commit. The resumed sink re-offers
# that batch; the manifest's applied high-water (committed atomically
# WITH the rows) must turn the replay into a no-op: final state is
# row-set-exact AND holds exactly one manifest version per batch
# (create + 6 = v7, applied = 5) — a double-apply or a lost batch both
# break the version count.
ROOTH=$(mktemp -d /tmp/graft-snapcdc.XXXX)
LOCH_URI="$ROOTH/tbl"; SRCH_URI="$ROOTH/src"; CKPTH_URI="$ROOTH/ckpt"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  LOCH_URI="hdfs://graftsim$ROOTH/tbl"; SRCH_URI="hdfs://graftsim$ROOTH/src"; CKPTH_URI="hdfs://graftsim$ROOTH/ckpt"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  LOCH_URI="s3a://graftbucket$ROOTH/tbl"; SRCH_URI="s3a://graftbucket$ROOTH/src"; CKPTH_URI="s3a://graftbucket$ROOTH/ckpt"
fi
$RUN graft.SnapCrashProbe hbase $SF "$LOCH_URI" "$SRCH_URI" >/tmp/snapcdc_base.log 2>&1
grep -a "SNAPPROBE hbase OK" /tmp/snapcdc_base.log || \
  { echo "FAIL: leg H seeding failed"; tail -5 /tmp/snapcdc_base.log; exit 1; }
$RUN graft.SnapCrashProbe hrun $SF "$LOCH_URI" "$SRCH_URI" "$CKPTH_URI" 2 >/tmp/snapcdc_crash.log 2>&1 && \
  { echo "FAIL: hrun exited 0 — the halt never fired"; exit 1; }
grep -a "RESTARTPROBE halting driver after committed batch" /tmp/snapcdc_crash.log || \
  { echo "FAIL: hrun died without the commit-gated halt"; tail -5 /tmp/snapcdc_crash.log; exit 1; }
sleep 3
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe hrun $SF "$LOCH_URI" "$SRCH_URI" "$CKPTH_URI" 0 >/tmp/snapcdc_resume.log 2>&1
grep -a "SNAPPROBE hrun OK" /tmp/snapcdc_resume.log || \
  { echo "FAIL: resumed cdc sink did not drain"; tail -5 /tmp/snapcdc_resume.log; exit 1; }
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe hcheck $SF "$LOCH_URI" >/tmp/snapcdc_check.log 2>&1
grep -a "SNAPPROBE hcheck OK v=7 applied=5" /tmp/snapcdc_check.log || \
  { echo "FAIL: exactly-once violated"; grep -a SNAPPROBE /tmp/snapcdc_check.log; tail -5 /tmp/snapcdc_check.log; exit 1; }
echo "leg H OK: driver death mid-stream -> checkpoint resume -> replayed batch no-op'd by the applied high-water, one version per batch, row-set-exact"

echo "== leg I: snap FOLLOWER driver death -> WIPED-checkpoint resume (r18)"
# The follower's offset ledger is the DESTINATION manifest (the source
# cursor commits atomically with the rows), so the probe resumes with a
# DELETED checkpoint on purpose: run 1 drains the 6-version backlog one
# source version per tick and is killed after 3 committed ticks; run 2
# starts from a fresh checkpoint and must converge from the cursor in
# the destination's head. icheck requires row parity with the source
# AND a strictly-advancing applied stamp on every destination commit —
# a double-applied poll or a from-scratch restart both break it.
ROOTI=$(mktemp -d /tmp/graft-snapfollow.XXXX)
SRCI_URI="$ROOTI/src"; DSTI_URI="$ROOTI/dst"; CKPTI_URI="$ROOTI/ckpt"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  SRCI_URI="hdfs://graftsim$ROOTI/src"; DSTI_URI="hdfs://graftsim$ROOTI/dst"; CKPTI_URI="hdfs://graftsim$ROOTI/ckpt"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  SRCI_URI="s3a://graftbucket$ROOTI/src"; DSTI_URI="s3a://graftbucket$ROOTI/dst"; CKPTI_URI="s3a://graftbucket$ROOTI/ckpt"
fi
$RUN graft.SnapCrashProbe ibase $SF "$SRCI_URI" >/tmp/snapfollow_base.log 2>&1
grep -a "SNAPPROBE ibase OK" /tmp/snapfollow_base.log || \
  { echo "FAIL: leg I seeding failed"; tail -5 /tmp/snapfollow_base.log; exit 1; }
$RUN graft.SnapCrashProbe irun $SF "$SRCI_URI" "$DSTI_URI" "$CKPTI_URI" 3 >/tmp/snapfollow_crash.log 2>&1 && \
  { echo "FAIL: irun exited 0 — the halt never fired"; exit 1; }
grep -a "RESTARTPROBE halting driver after committed batch" /tmp/snapfollow_crash.log || \
  { echo "FAIL: irun died without the commit-gated halt"; tail -5 /tmp/snapfollow_crash.log; exit 1; }
sleep 3
rm -rf "$ROOTI/ckpt"
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe irun $SF "$SRCI_URI" "$DSTI_URI" "$CKPTI_URI" 0 >/tmp/snapfollow_resume.log 2>&1
grep -a "SNAPPROBE irun OK" /tmp/snapfollow_resume.log || \
  { echo "FAIL: resumed follower did not converge"; tail -5 /tmp/snapfollow_resume.log; exit 1; }
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe icheck $SF "$SRCI_URI" "$DSTI_URI" >/tmp/snapfollow_check.log 2>&1
grep -a "SNAPPROBE icheck OK" /tmp/snapfollow_check.log || \
  { echo "FAIL: follower exactly-once violated"; grep -a SNAPPROBE /tmp/snapfollow_check.log; tail -5 /tmp/snapfollow_check.log; exit 1; }
echo "leg I OK: follower killed mid-backlog -> WIPED-checkpoint resume -> converged exactly-once off the destination-manifest cursor, row-set-exact"

echo "== leg J: merge-on-read crash windows — the delta FOLD and the MOR commit (r19)"
# A MOR table (2 delta-file commits over an 8-bucket base). Window 1
# ('fold'): optimize dies after its rewritten bucket files promoted but
# before the manifest create — the head must keep serving the MOR view
# (base + outstanding deltas), the orphaned fold files stay invisible,
# vacuum sweeps exactly them, and the retried fold retires the deltas.
# Window 2 ('mor'): a mergeMor dies post-promote pre-create — the
# staged delta file is an invisible orphan and the retried merge lands.
ROOTJ=$(mktemp -d /tmp/graft-snapmor.XXXX)
LOCJ_URI="$ROOTJ/tbl"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  LOCJ_URI="hdfs://graftsim$ROOTJ/tbl"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  LOCJ_URI="s3a://graftbucket$ROOTJ/tbl"
fi
$RUN graft.SnapCrashProbe jbase $SF "$LOCJ_URI" >/tmp/snapmor_base.log 2>&1
grep -a "SNAPPROBE jbase OK" /tmp/snapmor_base.log || \
  { echo "FAIL: leg J seeding failed"; tail -5 /tmp/snapmor_base.log; exit 1; }
for MODE in fold mor; do
  SPARK_GRAFT_SNAP_HALT=snapstage \
    $RUN graft.SnapCrashProbe jcrash $SF "$LOCJ_URI" $MODE >/tmp/snapmor_${MODE}.log 2>&1 && \
    { echo "FAIL: jcrash[$MODE] exited 0 — the halt never fired"; exit 1; }
  grep -a "RESTARTPROBE halting in crash window snapstage" /tmp/snapmor_${MODE}.log || \
    { echo "FAIL: jcrash[$MODE] died without reaching the window"; tail -5 /tmp/snapmor_${MODE}.log; exit 1; }
  sleep 3
  SPARK_GRAFT_LEASE_STALE_MS=2000 \
    $RUN graft.SnapCrashProbe jheal $SF "$LOCJ_URI" $MODE >/tmp/snapmor_heal_${MODE}.log 2>&1
  grep -a "SNAPPROBE jheal OK mode=$MODE" /tmp/snapmor_heal_${MODE}.log || \
    { echo "FAIL: jheal[$MODE] did not heal"; grep -a SNAPPROBE /tmp/snapmor_heal_${MODE}.log; tail -5 /tmp/snapmor_heal_${MODE}.log; exit 1; }
done
echo "leg J OK: fold + MOR-commit kill -9 windows -> new-JVM heal -> MOR view served throughout, orphans swept, row-set-exact"

echo "== leg K: deletion-vector write windows — the DV stage and the DV commit (r20)"
# A MOR table (one delta commit over an 8-bucket base). Window 1
# ('stage'): deleteVector dies after its positional files promoted but
# before the manifest create — the head keeps serving the pre-delete
# view, the orphaned DV files stay invisible, vacuum sweeps exactly
# them, and the retry lands vectors + one residual delta. Window 2
# ('commit'): the create LANDED before the halt — the DV version
# serves, and the later fold retires every vector.
ROOTK=$(mktemp -d /tmp/graft-snapdv.XXXX)
LOCK_URI="$ROOTK/tbl"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  LOCK_URI="hdfs://graftsim$ROOTK/tbl"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  LOCK_URI="s3a://graftbucket$ROOTK/tbl"
fi
$RUN graft.SnapCrashProbe kbase $SF "$LOCK_URI" >/tmp/snapdv_base.log 2>&1
grep -a "SNAPPROBE kbase OK" /tmp/snapdv_base.log || \
  { echo "FAIL: leg K seeding failed"; tail -5 /tmp/snapdv_base.log; exit 1; }
for MODE in stage commit; do
  WINDOW=snapstage
  [[ "$MODE" == "commit" ]] && WINDOW=snapcommit
  SPARK_GRAFT_SNAP_HALT=$WINDOW \
    $RUN graft.SnapCrashProbe kcrash $SF "$LOCK_URI" $MODE >/tmp/snapdv_${MODE}.log 2>&1 && \
    { echo "FAIL: kcrash[$MODE] exited 0 — the halt never fired"; exit 1; }
  grep -a "RESTARTPROBE halting in crash window $WINDOW" /tmp/snapdv_${MODE}.log || \
    { echo "FAIL: kcrash[$MODE] died without reaching the window"; tail -5 /tmp/snapdv_${MODE}.log; exit 1; }
  sleep 3
  SPARK_GRAFT_LEASE_STALE_MS=2000 \
    $RUN graft.SnapCrashProbe kheal $SF "$LOCK_URI" $MODE >/tmp/snapdv_heal_${MODE}.log 2>&1
  grep -a "SNAPPROBE kheal OK mode=$MODE" /tmp/snapdv_heal_${MODE}.log || \
    { echo "FAIL: kheal[$MODE] did not heal"; grep -a SNAPPROBE /tmp/snapdv_heal_${MODE}.log; tail -5 /tmp/snapdv_heal_${MODE}.log; exit 1; }
done
echo "leg K OK: DV stage + DV commit kill -9 windows -> new-JVM heal -> pre-delete view served, orphans swept, vectors land and fold, row-set-exact"

echo "== leg L: changelog STREAM SOURCE driver death mid-backlog (r20)"
# The DSv2 micro-batch source's offsets are manifest versions in the
# stream checkpoint. A driver halt after 2 committed batches must
# resume from the committed offset in a NEW JVM and deliver every
# source version exactly once to the applying sink (strictly-advancing
# applied chain), converging row-set-exact across COW, MOR, positional-
# delete, and fold commits landing while the stream runs.
ROOTL=$(mktemp -d /tmp/graft-snapchs.XXXX)
LOCL_URI="$ROOTL/src"
DSTL_URI="$ROOTL/dst"
CKPTL="$ROOTL/ckpt"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  LOCL_URI="hdfs://graftsim$ROOTL/src"; DSTL_URI="hdfs://graftsim$ROOTL/dst"
  CKPTL="hdfs://graftsim$ROOTL/ckpt"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  LOCL_URI="s3a://graftbucket$ROOTL/src"; DSTL_URI="s3a://graftbucket$ROOTL/dst"
  CKPTL="s3a://graftbucket$ROOTL/ckpt"
fi
$RUN graft.SnapCrashProbe lbase $SF "$LOCL_URI" >/tmp/snapchs_base.log 2>&1
grep -a "SNAPPROBE lbase OK" /tmp/snapchs_base.log || \
  { echo "FAIL: leg L seeding failed"; tail -5 /tmp/snapchs_base.log; exit 1; }
$RUN graft.SnapCrashProbe lrun $SF "$LOCL_URI" "$DSTL_URI" "$CKPTL" 2 >/tmp/snapchs_crash.log 2>&1 && \
  { echo "FAIL: lrun[halt] exited 0 — the halt never fired"; exit 1; }
grep -a "RESTARTPROBE halting driver after committed batch" /tmp/snapchs_crash.log || \
  { echo "FAIL: lrun died without the batch-commit halt"; tail -5 /tmp/snapchs_crash.log; exit 1; }
sleep 3
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe lrun $SF "$LOCL_URI" "$DSTL_URI" "$CKPTL" 0 >/tmp/snapchs_resume.log 2>&1
grep -a "SNAPPROBE lrun OK" /tmp/snapchs_resume.log || \
  { echo "FAIL: resumed stream never converged"; grep -a SNAPPROBE /tmp/snapchs_resume.log; tail -5 /tmp/snapchs_resume.log; exit 1; }
$RUN graft.SnapCrashProbe lcheck $SF "$LOCL_URI" "$DSTL_URI" >/tmp/snapchs_check.log 2>&1
grep -a "SNAPPROBE lcheck OK" /tmp/snapchs_check.log || \
  { echo "FAIL: leg L exactly-once check failed"; tail -5 /tmp/snapchs_check.log; exit 1; }
echo "leg L OK: stream-source driver death -> checkpoint-offset resume -> every version once, row-set-exact"

echo "== leg M: MAINTAINED-AGGREGATE follower driver death -> WIPED-checkpoint resume (r20)"
# followAgg's ledger is the destination manifest (cursor = applied
# source version, committed atomically with the maintained groups), so
# run 2 starts from a DELETED checkpoint and must converge exactly-once
# from the cursor alone; mcheck requires the maintained (count, nval,
# DECIMAL sum) table to equal a full recompute bit-for-bit plus a
# strictly-advancing applied chain.
ROOTM=$(mktemp -d /tmp/graft-snapfollowagg.XXXX)
SRCM_URI="$ROOTM/src"; DSTM_URI="$ROOTM/dst"; CKPTM_URI="$ROOTM/ckpt"
if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
  SRCM_URI="hdfs://graftsim$ROOTM/src"; DSTM_URI="hdfs://graftsim$ROOTM/dst"; CKPTM_URI="hdfs://graftsim$ROOTM/ckpt"
elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
  SRCM_URI="s3a://graftbucket$ROOTM/src"; DSTM_URI="s3a://graftbucket$ROOTM/dst"; CKPTM_URI="s3a://graftbucket$ROOTM/ckpt"
fi
$RUN graft.SnapCrashProbe mbase $SF "$SRCM_URI" >/tmp/snapfollowagg_base.log 2>&1
grep -a "SNAPPROBE mbase OK" /tmp/snapfollowagg_base.log || \
  { echo "FAIL: leg M seeding failed"; tail -5 /tmp/snapfollowagg_base.log; exit 1; }
$RUN graft.SnapCrashProbe mrun $SF "$SRCM_URI" "$DSTM_URI" "$CKPTM_URI" 3 >/tmp/snapfollowagg_crash.log 2>&1 && \
  { echo "FAIL: mrun exited 0 — the halt never fired"; exit 1; }
grep -a "RESTARTPROBE halting driver after committed batch" /tmp/snapfollowagg_crash.log || \
  { echo "FAIL: mrun died without the commit-gated halt"; tail -5 /tmp/snapfollowagg_crash.log; exit 1; }
sleep 3
rm -rf "$ROOTM/ckpt"
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe mrun $SF "$SRCM_URI" "$DSTM_URI" "$CKPTM_URI" 0 >/tmp/snapfollowagg_resume.log 2>&1
grep -a "SNAPPROBE mrun OK" /tmp/snapfollowagg_resume.log || \
  { echo "FAIL: resumed followAgg did not converge"; tail -5 /tmp/snapfollowagg_resume.log; exit 1; }
SPARK_GRAFT_LEASE_STALE_MS=2000 \
  $RUN graft.SnapCrashProbe mcheck $SF "$SRCM_URI" "$DSTM_URI" >/tmp/snapfollowagg_check.log 2>&1
grep -a "SNAPPROBE mcheck OK" /tmp/snapfollowagg_check.log || \
  { echo "FAIL: followAgg exactly-once violated"; grep -a SNAPPROBE /tmp/snapfollowagg_check.log; tail -5 /tmp/snapfollowagg_check.log; exit 1; }
echo "leg M OK: followAgg killed mid-backlog -> WIPED-checkpoint resume -> maintained table == recompute bit-for-bit, strictly-advancing cursor"
echo "ALL OK"
