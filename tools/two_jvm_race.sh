#!/usr/bin/env bash
# Reproducible two-PROCESS validations of the publish lease (r12):
#
#   1. COLD-WAREHOUSE RACE: two Verify JVMs first-touch q50's bucketed
#      fact tables in a wiped scratch warehouse simultaneously — both
#      must pass the DuckDB oracle with identical rows off ONE publish
#      (the lease loser waits and attaches; see
#      Published.attachOrBuild).
#   2. COMPACTION CONTENTION: a LeaseHold JVM pins q124's table lease
#      while a second JVM compacts — the second must WAIT OUT the hold
#      (compaction is idempotent; r13 advice #3) and pass the oracle
#      once the holder releases.
#
# Run from the repo root (sbt + duckdb-python required, same as the
# verify skill). Exits non-zero on any violated expectation.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
# package ONCE, then launch every probe JVM via tools/graft_java.sh
# (bare java against the jar): concurrent sbt launches in one project
# dir race on sbt's boot-server socket ("Address already in use" has
# killed a racer at boot), and bare JVMs remove the startup skew that
# used to serialize the racers past the lease window
sbt -batch package >/dev/null 2>&1
RUN="tools/graft_java.sh"
# SPARK_GRAFT_HDFS_SIM=true reruns every leg with the warehouses
# resolved through hdfs:// (HdfsSimFileSystem backs them onto the same
# local dirs — cross-JVM lease contention through the non-file-scheme
# code paths, same as crash_probes.sh's mode)
wh_uri() {
  if [[ "${SPARK_GRAFT_HDFS_SIM:-}" == "true" ]]; then
    echo "hdfs://graftsim$1"
  elif [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then
    # object-store semantics (S3SimFileSystem): the same cross-JVM
    # races with copy+delete renames, no-op setTimes (heartbeats must
    # content-bump), and conditional-put create-new
    echo "s3a://graftbucket$1"
  else
    echo "$1"
  fi
}
RACE_WH=$(mktemp -d /tmp/graft-race-wh.XXXX)
OUT_A=$(mktemp -d /tmp/graft-race-a.XXXX); OUT_B=$(mktemp -d /tmp/graft-race-b.XXXX)

echo "== leg 1: cold-warehouse race (warehouse $RACE_WH)"
rm -rf "$RACE_WH"
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.Verify $SF $OUT_A q50 >/tmp/race_a.log 2>&1 &
A=$!
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.Verify $SF $OUT_B q50 >/tmp/race_b.log 2>&1 &
B=$!
wait $A; wait $B
for log in /tmp/race_a.log /tmp/race_b.log; do
  if grep -aq "\[verify\].*failed" "$log"; then
    echo "FAIL: a racer reported a query failure ($log)"; exit 1
  fi
done
python3 tools/oracle_check.py "$SF" "$OUT_A" | tail -1
python3 tools/oracle_check.py "$SF" "$OUT_B" | tail -1
python3 - "$OUT_A" "$OUT_B" <<'EOF'
import sys, duckdb
a = duckdb.sql(f"SELECT * FROM '{sys.argv[1]}/q50_bucketed_join/*.parquet' ORDER BY ALL").fetchall()
b = duckdb.sql(f"SELECT * FROM '{sys.argv[2]}/q50_bucketed_join/*.parquet' ORDER BY ALL").fetchall()
assert a == b and len(a) > 0, "racers must serve identical rows"
print(f"leg 1 OK: both racers serve {len(a)} identical oracle-checked rows")
EOF

# q122, not q120: the serve legs publish via attachOrBuild, while q122
# publishes its (mbase, mcents) PAIR via Similarity.publishAssignPair -
# the pair-level wait-and-attach loop this leg exists to exercise
echo "== leg 1b: cold ANN-pair race (two JVMs first-touch q122's published pair)"
OUT_E=$(mktemp -d /tmp/graft-race-e.XXXX); OUT_F=$(mktemp -d /tmp/graft-race-f.XXXX)
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.Verify $SF $OUT_E q122 >/tmp/race_e.log 2>&1 &
E=$!
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.Verify $SF $OUT_F q122 >/tmp/race_f.log 2>&1 &
F=$!
wait $E; wait $F
for log in /tmp/race_e.log /tmp/race_f.log; do
  if grep -aq "\[verify\].*failed" "$log"; then
    echo "FAIL: an ANN racer reported a query failure ($log)"; exit 1
  fi
done
python3 tools/oracle_check.py "$SF" "$OUT_E" | tail -1
python3 tools/oracle_check.py "$SF" "$OUT_F" | tail -1
echo "leg 1b OK: both ANN-pair racers pass the oracle off one shared publish"
# evidence: did the JVMs actually contend, or did startup skew
# serialize them? Either is a pass (results correct; PublishedSpec
# exercises the wait path deterministically with threads) - but the
# artifact should SAY which scenario this run proved.
if grep -aq "publish lease for" /tmp/race_a.log /tmp/race_b.log /tmp/race_e.log /tmp/race_f.log; then
  echo "legs 1/1b evidence: CONTENDED (a racer waited out a lease)"
else
  echo "legs 1/1b evidence: serialized by startup skew (no lease wait exercised this run)"
fi

echo "== leg 1c: pair build WAITS out a foreign process's lease (deterministic)"
# a fresh warehouse so q122 must first-build its pair; a foreign JVM
# pins the mbase lease for 60s - the builder must WAIT (not die) and
# then build and pass (Similarity.publishAssignPair's loop, cross-JVM)
WAIT_WH=$(mktemp -d /tmp/graft-race-wwh.XXXX); rm -rf "$WAIT_WH"
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$WAIT_WH") $RUN graft.LeaseHold $SF 60 mbase >/tmp/leasehold_wait.log 2>&1 &
W=$!
for i in $(seq 1 40); do
  grep -aq "LEASEHOLD acquired" /tmp/leasehold_wait.log && break; sleep 2
done
OUT_G=$(mktemp -d /tmp/graft-race-g.XXXX)
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$WAIT_WH") $RUN graft.Verify $SF $OUT_G q122 >/tmp/race_g.log 2>&1
wait $W
grep -aq "\[verify\].*failed" /tmp/race_g.log &&
  { echo "FAIL: pair build died instead of waiting out the foreign lease"; exit 1; }
python3 tools/oracle_check.py "$SF" "$OUT_G" | tail -1
echo "leg 1c OK: pair build waited out the 60s foreign lease and passed"

echo "== leg 2: compaction under a foreign process's lease"
# leg 2 in the SAME scratch warehouse - never the shared default:
# pinning /tmp/graft-warehouse's real lease would fail any concurrent
# session's q124 and append compaction windows to shared state
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.LeaseHold $SF 90 >/tmp/leasehold_race.log 2>&1 &
H=$!
for i in $(seq 1 40); do
  grep -aq "LEASEHOLD acquired" /tmp/leasehold_race.log && break; sleep 2
done
OUT_C=$(mktemp -d /tmp/graft-race-c.XXXX)
# compaction is idempotent, so a foreign holder is WAITED OUT (r13
# advice #3) with the serve paths' awaitNoWriter budget instead of
# failing the job: the contended q124 below must BLOCK until the 90s
# hold releases, then pass the oracle — and must NOT have failed loudly
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$RACE_WH") $RUN graft.Verify $SF $OUT_C q124 >/tmp/race_c.log 2>&1
grep -aq "\[verify\].*failed" /tmp/race_c.log &&
  { echo "FAIL: contended compaction failed instead of waiting out the lease"; exit 1; }
wait $H
grep -aq "LEASEHOLD released" /tmp/leasehold_race.log ||
  { echo "FAIL: leasehold JVM did not report a clean release"; exit 1; }
python3 tools/oracle_check.py "$SF" "$OUT_C" | tail -1
echo "leg 2 OK: contended compaction waited out the 90s foreign lease and passed"

echo "== leg 3: a long-lived reader re-serves across a rival's republish swaps"
# the r13 verdict's remaining swap caveat, from the READER's seat: while
# a hammer JVM republishes orders_bucketed (identical content, same
# fingerprint — full staged-write -> retire-aside -> swap each round),
# a reader JVM re-serves the q50 join through the per-serve contract.
# Every completed serve must equal the first; landing inside a swap
# window is a counted RETRY (stale listing / absent marker), never
# wrong rows; the final serve passes the DuckDB oracle.
SWAP_WH=$(mktemp -d /tmp/graft-race-swh.XXXX); rm -rf "$SWAP_WH"
OUT_R=$(mktemp -d /tmp/graft-race-r.XXXX)
# cold-publish one generation first so the reader starts on a served table
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$SWAP_WH") $RUN graft.ServeLoop $SF $OUT_R 1 >/tmp/serve_cold.log 2>&1
grep -aq "SERVELOOP OK" /tmp/serve_cold.log || { echo "FAIL: cold serve failed"; exit 1; }
# in s3 mode, stretch the hammer's per-object copy so the reader lands
# inside the (copy+delete) swap window reliably — crash-probe leg C's knob
HAMMER_ENV=""
if [[ "${SPARK_GRAFT_S3_SIM:-}" == "true" ]]; then HAMMER_ENV="SPARK_GRAFT_S3_SLOW_RENAME_MS=100"; fi
env $HAMMER_ENV SPARK_GRAFT_WAREHOUSE=$(wh_uri "$SWAP_WH") $RUN graft.RepublishHammer $SF 6 >/tmp/republish.log 2>&1 &
R3=$!
SPARK_GRAFT_WAREHOUSE=$(wh_uri "$SWAP_WH") $RUN graft.ServeLoop $SF $OUT_R 15 >/tmp/serveloop.log 2>&1 || \
  { echo "FAIL: reader died across republish swaps"; grep -a SERVELOOP /tmp/serveloop.log | tail -5; \
    kill "$R3" 2>/dev/null || true; wait "$R3" 2>/dev/null || true; exit 1; }
wait $R3
grep -aq "REPUBLISH HAMMER done" /tmp/republish.log || \
  { echo "FAIL: republish hammer did not finish its rounds"; exit 1; }
grep -a "SERVELOOP OK" /tmp/serveloop.log
python3 tools/oracle_check.py "$SF" "$OUT_R" | tail -1
python3 tools/oracle_check.py "$SF" "$OUT_R" >/dev/null || \
  { echo "FAIL: reader's final serve failed the oracle"; exit 1; }
# evidence line: did the reader actually overlap the hammer's swaps?
if grep -aq "raced a swap" /tmp/serveloop.log; then
  echo "leg 3 evidence: CONTENDED (reader landed inside a swap window and retried)"
else
  echo "leg 3 evidence: no swap window hit this run (republishes committed between serves)"
fi
echo "leg 3 OK: reader served identical oracle-checked rows across $(grep -ac 'REPUBLISH .* committed' /tmp/republish.log) republish swaps"
echo "== leg 4: two JVMs MERGE into one snap table concurrently"
# The Snap format's single-writer story, raced for real: both racers
# call Snap.merge at once; the table lease serializes them (the loser
# waits out the winner — withLeaseAwaiting), each commits its own
# manifest version, and because the two deltas commute the final
# content must equal the full chain regardless of commit order. A torn
# interleaving (lost update, double-applied delta, manifest version
# collision) fails the row-set-exact gcheck.
SNAP_ROOT=$(mktemp -d /tmp/graft-snaprace.XXXX)
SNAP_LOC="$(wh_uri "$SNAP_ROOT")/tbl"
$RUN graft.SnapCrashProbe gbase $SF "$SNAP_LOC" >/tmp/snaprace_base.log 2>&1
grep -a "SNAPPROBE gbase OK" /tmp/snaprace_base.log || \
  { echo "FAIL: leg 4 seeding failed"; tail -5 /tmp/snaprace_base.log; exit 1; }
$RUN graft.SnapCrashProbe grace $SF "$SNAP_LOC" 2 >/tmp/snaprace_r2.log 2>&1 &
S1=$!
$RUN graft.SnapCrashProbe grace $SF "$SNAP_LOC" 3 >/tmp/snaprace_r3.log 2>&1 &
S2=$!
wait $S1 || { echo "FAIL: racer round=2 died"; tail -5 /tmp/snaprace_r2.log; exit 1; }
wait $S2 || { echo "FAIL: racer round=3 died"; tail -5 /tmp/snaprace_r3.log; exit 1; }
grep -a "SNAPPROBE grace OK round=2" /tmp/snaprace_r2.log || { echo "FAIL: racer 2 no OK"; exit 1; }
grep -a "SNAPPROBE grace OK round=3" /tmp/snaprace_r3.log || { echo "FAIL: racer 3 no OK"; exit 1; }
$RUN graft.SnapCrashProbe gcheck $SF "$SNAP_LOC" 3 >/tmp/snaprace_check.log 2>&1
grep -a "SNAPPROBE gcheck OK" /tmp/snaprace_check.log || \
  { echo "FAIL: post-race state diverged"; grep -a SNAPPROBE /tmp/snaprace_check.log; tail -5 /tmp/snaprace_check.log; exit 1; }
# no lease/break debris may outlive the race
ls "$SNAP_ROOT" | grep -q "_GRAFT_LEASE" && \
  { echo "FAIL: lease debris leaked past the merge race"; exit 1; }
echo "leg 4 OK: concurrent merges serialized through the lease -> one commit each, row-set-exact combined state"

echo "== leg 5: OPTIMISTIC snap merges — disjoint writers stage concurrently (wall-clock overlap asserted), overlapping writers rebase-retry"
# The r17 verdict's throughput ceiling, removed and raced for real:
# two JVMs call Snap.mergeOcc at once. Leg 5a: DISJOINT-bucket deltas —
# both must stage in overlapping wall-clock (the lease-serialized path
# cannot produce that), neither may conflict-retry, and the loser must
# commit by REBASE (manifest base < parent). Leg 5b: OVERLAPPING key
# ranges of ABSOLUTE upserts — the loser must discard + retry against
# the winner's head, so the contested keys hold exactly the LAST
# committer's values (per-key last-writer-wins; gocccheck is told who
# committed last — the racer that logged the conflict_retry — and
# validates the full row set against that order).
OCC_ROOT=$(mktemp -d /tmp/graft-snapocc.XXXX)
OCC_LOC="$(wh_uri "$OCC_ROOT")/tbl"
$RUN graft.SnapCrashProbe gbase $SF "$OCC_LOC" >/tmp/snapocc_base.log 2>&1
grep -a "SNAPPROBE gbase OK" /tmp/snapocc_base.log || \
  { echo "FAIL: leg 5 seeding failed"; tail -5 /tmp/snapocc_base.log; exit 1; }
$RUN graft.SnapCrashProbe gocc $SF "$OCC_LOC" dA >/tmp/snapocc_dA.log 2>&1 &
OA=$!
$RUN graft.SnapCrashProbe gocc $SF "$OCC_LOC" dB >/tmp/snapocc_dB.log 2>&1 &
OB=$!
wait $OA || { echo "FAIL: occ racer dA died"; tail -5 /tmp/snapocc_dA.log; exit 1; }
wait $OB || { echo "FAIL: occ racer dB died"; tail -5 /tmp/snapocc_dB.log; exit 1; }
grep -a "SNAPPROBE gocc OK round=dA" /tmp/snapocc_dA.log || { echo "FAIL: dA no OK"; exit 1; }
grep -a "SNAPPROBE gocc OK round=dB" /tmp/snapocc_dB.log || { echo "FAIL: dB no OK"; exit 1; }
if grep -aq "conflict_retry" /tmp/snapocc_dA.log /tmp/snapocc_dB.log; then
  echo "FAIL: disjoint-bucket writers must rebase, never conflict-retry"; exit 1
fi
python3 - /tmp/snapocc_dA.log /tmp/snapocc_dB.log <<'EOF'
import sys, re
def span(path):
    txt = open(path, errors='replace').read()
    start = int(re.search(r'attempt=1 stage_start=(\d+)', txt).group(1))
    commit = int(re.search(r'attempt=1 commit_enter=(\d+)', txt).group(1))
    return start, commit
(sa, ca), (sb, cb) = span(sys.argv[1]), span(sys.argv[2])
# each racer began STAGING before the other entered its commit point:
# impossible under whole-merge lease serialization
assert sa < cb and sb < ca, f"no wall-clock overlap: A=[{sa},{ca}] B=[{sb},{cb}]"
print(f"leg 5a overlap proven: A staged at {sa} (committed {ca}), B staged at {sb} (committed {cb})")
EOF
$RUN graft.SnapCrashProbe gocccheck $SF "$OCC_LOC" disjoint >/tmp/snapocc_chk1.log 2>&1
grep -a "SNAPPROBE gocccheck OK stage=disjoint" /tmp/snapocc_chk1.log || \
  { echo "FAIL: disjoint occ race state diverged"; grep -a SNAPPROBE /tmp/snapocc_chk1.log; exit 1; }
$RUN graft.SnapCrashProbe gocc $SF "$OCC_LOC" oA >/tmp/snapocc_oA.log 2>&1 &
OC=$!
$RUN graft.SnapCrashProbe gocc $SF "$OCC_LOC" oB >/tmp/snapocc_oB.log 2>&1 &
OD=$!
wait $OC || { echo "FAIL: occ racer oA died"; tail -5 /tmp/snapocc_oA.log; exit 1; }
wait $OD || { echo "FAIL: occ racer oB died"; tail -5 /tmp/snapocc_oB.log; exit 1; }
if grep -aq "conflict_retry" /tmp/snapocc_oA.log; then LAST=oA
elif grep -aq "conflict_retry" /tmp/snapocc_oB.log; then LAST=oB
else
  echo "FAIL: overlapping writers raced without a single conflict-retry (vacuous)"; exit 1
fi
$RUN graft.SnapCrashProbe gocccheck $SF "$OCC_LOC" overlap $LAST >/tmp/snapocc_chk2.log 2>&1
grep -a "SNAPPROBE gocccheck OK stage=overlap" /tmp/snapocc_chk2.log || \
  { echo "FAIL: overlapping occ race state diverged"; grep -a SNAPPROBE /tmp/snapocc_chk2.log; exit 1; }
ls "$OCC_ROOT" | grep -q "_GRAFT_LEASE" && \
  { echo "FAIL: lease debris leaked past the occ race"; exit 1; }
echo "leg 5 OK: disjoint occ writers overlapped and rebased; overlapping pair retried; both row-set-exact"

echo "== leg 6: OPTIMISTIC writer vs MERGE-ON-READ writer across JVMs (r19)"
# The mixed-shape concurrency story executed for real: one JVM runs an
# OCC copy-on-write merge (bucket 2), the other a lease-held mergeMor
# (bucket 6 — ONE delta file, zero base rewrites). Range-disjoint, so
# the OCC writer must never conflict-retry regardless of commit order
# (plain resolve, or rebase carrying the rival's delta file), the MOR
# delta must survive the race OUTSTANDING, and the final content must
# hold both effects row-set-exact.
MOR_ROOT=$(mktemp -d /tmp/graft-snapoccmor.XXXX)
MOR_LOC="$(wh_uri "$MOR_ROOT")/tbl"
$RUN graft.SnapCrashProbe gbase $SF "$MOR_LOC" >/tmp/snapoccmor_base.log 2>&1
grep -a "SNAPPROBE gbase OK" /tmp/snapoccmor_base.log || \
  { echo "FAIL: leg 6 seeding failed"; tail -5 /tmp/snapoccmor_base.log; exit 1; }
$RUN graft.SnapCrashProbe gocc $SF "$MOR_LOC" mA >/tmp/snapoccmor_mA.log 2>&1 &
MA=$!
$RUN graft.SnapCrashProbe gocc $SF "$MOR_LOC" mB >/tmp/snapoccmor_mB.log 2>&1 &
MB=$!
wait $MA || { echo "FAIL: occ racer mA died"; tail -5 /tmp/snapoccmor_mA.log; exit 1; }
wait $MB || { echo "FAIL: mor racer mB died"; tail -5 /tmp/snapoccmor_mB.log; exit 1; }
grep -a "SNAPPROBE gocc OK round=mA" /tmp/snapoccmor_mA.log || { echo "FAIL: mA no OK"; exit 1; }
grep -a "SNAPPROBE gocc OK round=mB" /tmp/snapoccmor_mB.log || { echo "FAIL: mB no OK"; exit 1; }
if grep -aq "conflict_retry" /tmp/snapoccmor_mA.log; then
  echo "FAIL: a range-disjoint MOR rival must never force an OCC conflict-retry"; exit 1
fi
$RUN graft.SnapCrashProbe gmorcheck $SF "$MOR_LOC" >/tmp/snapoccmor_chk.log 2>&1
grep -a "SNAPPROBE gmorcheck OK" /tmp/snapoccmor_chk.log || \
  { echo "FAIL: occ-vs-mor race state diverged"; grep -a SNAPPROBE /tmp/snapoccmor_chk.log; exit 1; }
grep -a "SNAPPROBE gmorcheck order" /tmp/snapoccmor_chk.log
ls "$MOR_ROOT" | grep -q "_GRAFT_LEASE" && \
  { echo "FAIL: lease debris leaked past the occ-vs-mor race"; exit 1; }
echo "leg 6 OK: OCC and MOR writers raced across JVMs — no spurious retry, delta file survived outstanding, row-set-exact"
echo "ALL OK"
