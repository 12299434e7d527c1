#!/usr/bin/env bash
# Reproducible two-PROCESS validations of the publish lease (r12):
#
#   1. COLD-WAREHOUSE RACE: two Verify JVMs first-touch q50's bucketed
#      fact tables in a wiped scratch warehouse simultaneously — both
#      must pass the DuckDB oracle with identical rows off ONE publish
#      (the lease loser waits and attaches; see
#      Published.attachOrBuild).
#   2. COMPACTION CONTENTION: a LeaseHold JVM pins q124's table lease
#      while a second JVM compacts — the second must fail LOUDLY with
#      the holder's id, then replay green after release.
#
# Run from the repo root (sbt + duckdb-python required, same as the
# verify skill). Exits non-zero on any violated expectation.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
RACE_WH=$(mktemp -d /tmp/graft-race-wh.XXXX)
OUT_A=$(mktemp -d /tmp/graft-race-a.XXXX); OUT_B=$(mktemp -d /tmp/graft-race-b.XXXX)

echo "== leg 1: cold-warehouse race (warehouse $RACE_WH)"
rm -rf "$RACE_WH"
SPARK_GRAFT_WAREHOUSE=$RACE_WH sbt -batch "runMain graft.Verify $SF $OUT_A q50" >/tmp/race_a.log 2>&1 &
A=$!
SPARK_GRAFT_WAREHOUSE=$RACE_WH sbt -batch "runMain graft.Verify $SF $OUT_B q50" >/tmp/race_b.log 2>&1 &
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

echo "== leg 1b: cold ANN-index race (two JVMs first-touch q120's published pair)"
OUT_E=$(mktemp -d /tmp/graft-race-e.XXXX); OUT_F=$(mktemp -d /tmp/graft-race-f.XXXX)
SPARK_GRAFT_WAREHOUSE=$RACE_WH sbt -batch "runMain graft.Verify $SF $OUT_E q120" >/tmp/race_e.log 2>&1 &
E=$!
SPARK_GRAFT_WAREHOUSE=$RACE_WH sbt -batch "runMain graft.Verify $SF $OUT_F q120" >/tmp/race_f.log 2>&1 &
F=$!
wait $E; wait $F
for log in /tmp/race_e.log /tmp/race_f.log; do
  if grep -aq "\[verify\].*failed" "$log"; then
    echo "FAIL: an ANN racer reported a query failure ($log)"; exit 1
  fi
done
python3 tools/oracle_check.py "$SF" "$OUT_E" | tail -1
python3 tools/oracle_check.py "$SF" "$OUT_F" | tail -1
echo "leg 1b OK: both ANN racers pass the oracle off one shared publish"

echo "== leg 2: compaction under a foreign process's lease"
sbt -batch "runMain graft.LeaseHold $SF 45" >/tmp/leasehold_race.log 2>&1 &
H=$!
for i in $(seq 1 40); do
  grep -aq "LEASEHOLD acquired" /tmp/leasehold_race.log && break; sleep 2
done
OUT_C=$(mktemp -d /tmp/graft-race-c.XXXX)
sbt -batch "runMain graft.Verify $SF $OUT_C q124" >/tmp/race_c.log 2>&1 || true
grep -a "publish lease for .* held by 'leasehold-demo" /tmp/race_c.log >/dev/null ||
  { echo "FAIL: contended compaction did not fail with the holder's id"; exit 1; }
echo "leg 2a OK: contended compaction failed loudly with the holder id"
wait $H
sbt -batch "runMain graft.Verify $SF $OUT_C q124" >/tmp/race_d.log 2>&1
grep -aq "\[verify\].*failed" /tmp/race_d.log &&
  { echo "FAIL: post-release replay failed"; exit 1; }
python3 tools/oracle_check.py "$SF" "$OUT_C" | tail -1
echo "leg 2b OK: post-release compaction replayed green"
echo "ALL OK"
