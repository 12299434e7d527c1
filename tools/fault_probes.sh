#!/usr/bin/env bash
# Transient-fault campaign against the s3 sim (r14 verdict ask #1): run
# the q120–q124 published-index lifecycle with SEEDED probabilistic
# IOExceptions injected on every store operation class (PUT, conditional
# PUT, per-object rename copy/delete, DELETE, LIST, GET — see
# graft.sources.S3Sim.maybeFault), and hold the machinery to its
# contract:
#
#   - an attempt either COMPLETES (oracle-green results: Spark task
#     retries — SPARK_GRAFT_MASTER=local[8,4] — absorb data-plane
#     faults; the lease heartbeat tolerates isolated beat faults) or
#     fails LOUDLY ("[verify] ... failed" in its log) — an attempt that
#     claims success with oracle-WRONG results means a torn state was
#     served and the probe FAILS;
#   - the fault rate de-escalates across attempts (a store recovering
#     from an incident); the campaign must complete before the rate
#     reaches 0 or at it, with every earlier failure loud;
#   - a final fault-free pass over the SAME warehouse must attach and
#     be oracle-green — whatever the campaign left behind is either
#     serve-able-and-correct or invisible to the gate;
#   - the campaign must be NON-VACUOUS: a minimum number of injected
#     faults across attempts (each JVM reports its count);
#   - serve-only passes under read faults (GET+LIST) afterwards: each
#     either loud-fails or returns oracle-exact rows, never divergent.
#
# The deterministic per-fault specs (heartbeat bump faults, single GET
# blips, mid-copy swap faults) live in S3FaultSpec — this script is the
# whole-engine leg. Run from the repo root; exits non-zero on any
# violated expectation.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
sbt -batch package >/dev/null 2>&1
RUN="tools/graft_java.sh"
# the published-table lifecycle: the ANN index family (q120 serve,
# q121 pq, q122 maintain, q123 roll, q124 compact-append) plus the
# published KLL quantile dashboard (q127 — bootstrap + append +
# blob-only serve); the final fault-free pass doubles as q127's
# cross-JVM restart-attach proof
QS="q120,q121,q122,q123,q124,q127"
WH=$(mktemp -d /tmp/graft-fault-wh.XXXX); rm -rf "$WH"
WH_URI="s3a://graftbucket$WH"
# de-escalating rates (percent per store op, post-connector-retry — a
# real S3's post-retry failure rate is far below any of these; the
# ~500 eligible ops per 6-query lifecycle mean a fresh multi-table
# publish chain completes with useful probability only below ~0.5%,
# which is why the tail has low-rate steps: completing at a NONZERO
# rate exercises the full success path under residual faults, while
# the high-rate attempts exercise loud failure)
RATES=(5 5 2.5 2.5 1.2 0.6 0.3 0.3 0.15 0)
TOTAL_FAULTS=0
LOUD_FAILURES=0
SUCCESS=""
SUCCESS_PCT=""
for i in "${!RATES[@]}"; do
  PCT=${RATES[$i]}
  OUT=$(mktemp -d /tmp/graft-fault-out.XXXX)
  LOG=/tmp/fault_attempt_$((i + 1)).log
  echo "== attempt $((i + 1)) at ${PCT}% per-op fault rate"
  env SPARK_GRAFT_S3_SIM=true SPARK_GRAFT_WAREHOUSE="$WH_URI" \
      SPARK_GRAFT_S3_FAULT_PCT="$PCT" SPARK_GRAFT_S3_FAULT_SEED=$((7000 + i)) \
      SPARK_GRAFT_MASTER="local[8,4]" SPARK_GRAFT_CPUS=8 \
      SPARK_GRAFT_LEASE_STALE_MS=30000 \
    $RUN graft.Verify "$SF" "$OUT" "$QS" >"$LOG" 2>&1 || {
      echo "FAIL: attempt $((i + 1)) JVM died (rc) — Verify must catch per-query faults"; exit 1; }
  N=$(grep -ao "s3sim faults injected: [0-9]*" "$LOG" | grep -o "[0-9]*$" | tail -1 || true)
  N=${N:-0}
  TOTAL_FAULTS=$((TOTAL_FAULTS + N))
  if grep -aq "\[verify\].*failed" "$LOG"; then
    LOUD_FAILURES=$((LOUD_FAILURES + 1))
    echo "-- attempt $((i + 1)): failed LOUDLY under faults ($N injected) — acceptable; torn-state check rides on every later pass"
    continue
  fi
  # the attempt wrote all six results — gate them NOW: a pass that
  # SERVED a torn table is exactly what this campaign exists to catch
  if python3 tools/oracle_check.py "$SF" "$OUT" >/dev/null 2>&1; then
    echo "-- attempt $((i + 1)): COMPLETED under ${PCT}% faults ($N injected), oracle green"
    SUCCESS=yes
    SUCCESS_PCT="$PCT"
    break
  fi
  echo "FAIL: attempt $((i + 1)) reported no query failure but its results are oracle-WRONG — a torn state was served"
  python3 tools/oracle_check.py "$SF" "$OUT" | tail -5
  exit 1
done
[[ -n "$SUCCESS" ]] || { echo "FAIL: campaign never completed, even fault-free"; exit 1; }
[[ "$TOTAL_FAULTS" -ge 20 ]] || \
  { echo "FAIL: campaign vacuous — only $TOTAL_FAULTS faults injected"; exit 1; }
echo "-- campaign: completed at ${SUCCESS_PCT}%, $LOUD_FAILURES loud failure(s), $TOTAL_FAULTS faults injected"

echo "== final fault-free attach pass on the campaign warehouse"
# same stale threshold as the attempts: a lease an attempt leaked must
# be judged stale by the SAME clock, or this pass wedges on a corpse
# the 30-minute default still calls live (review finding, r15)
OUTF=$(mktemp -d /tmp/graft-fault-out.XXXX)
env SPARK_GRAFT_S3_SIM=true SPARK_GRAFT_WAREHOUSE="$WH_URI" \
    SPARK_GRAFT_LEASE_STALE_MS=30000 \
  $RUN graft.Verify "$SF" "$OUTF" "$QS" >/tmp/fault_final.log 2>&1
grep -aq "\[verify\].*failed" /tmp/fault_final.log && \
  { echo "FAIL: fault-free attach pass reported a query failure"; exit 1; }
python3 tools/oracle_check.py "$SF" "$OUTF" | tail -1
python3 tools/oracle_check.py "$SF" "$OUTF" >/dev/null || \
  { echo "FAIL: the state the campaign left behind fails the oracle"; exit 1; }
ls "$WH" | grep -q "_GRAFT_LEASE" && \
  { echo "FAIL: lease/break debris leaked past the campaign"; exit 1; }

echo "== serve-only passes under READ faults (GET+LIST)"
GREEN=0
GREEN_WITH_FAULTS=0
for pct in 10 5 2 0; do
  OUTS=$(mktemp -d /tmp/graft-fault-out.XXXX)
  LOGS=/tmp/fault_serve_${pct}.log
  env SPARK_GRAFT_S3_SIM=true SPARK_GRAFT_WAREHOUSE="$WH_URI" \
      SPARK_GRAFT_S3_FAULT_PCT="$pct" SPARK_GRAFT_S3_FAULT_OPS="get,list" \
      SPARK_GRAFT_S3_FAULT_SEED=$((9000 + pct)) \
      SPARK_GRAFT_MASTER="local[8,4]" SPARK_GRAFT_CPUS=8 \
      SPARK_GRAFT_LEASE_STALE_MS=30000 \
    $RUN graft.Verify "$SF" "$OUTS" "$QS" >"$LOGS" 2>&1
  NS=$(grep -ao "s3sim faults injected: [0-9]*" "$LOGS" | grep -o "[0-9]*$" | tail -1 || true)
  NS=${NS:-0}
  if grep -aq "\[verify\].*failed" "$LOGS"; then
    echo "-- serve pass at ${pct}%: failed LOUDLY ($NS faults injected, retryable) — acceptable"
    continue
  fi
  if python3 tools/oracle_check.py "$SF" "$OUTS" >/dev/null 2>&1; then
    echo "-- serve pass at ${pct}%: oracle green ($NS faults injected)"
    GREEN=$((GREEN + 1))
    [[ "$NS" -gt 0 ]] && GREEN_WITH_FAULTS=$((GREEN_WITH_FAULTS + 1))
  else
    echo "FAIL: serve pass at ${pct}% returned oracle-WRONG rows — a stale/partial result"
    exit 1
  fi
done
[[ "$GREEN" -ge 1 ]] || { echo "FAIL: no serve pass ever completed"; exit 1; }
# advisory, not a gate: completion WITH faults actually absorbed is the
# strongest line — record whether this run produced one
echo "-- serve passes green with >=1 injected fault: $GREEN_WITH_FAULTS"
echo "ALL OK: publish completes-or-fails-loudly under faults, torn state never served, reads never divergent"
