#!/usr/bin/env python3
"""Cross-round streaming-state trend check (r7 verdict ask #7).

The bench emits per-query state-store metrics (batches, rowsUpdated,
rowsTotal, stateBytes, commitMs) into the artifact tail, but nothing
compared them across rounds — s02's 112 s cumulative commit time was a
number with no trend line. This tool diffs the two most recent bench
artifacts (or any two given explicitly) and flags per-batch drifts
> 1.5x in either direction for rowsUpdated, stateBytes, and commitMs —
the early-warning channel for state-design regressions that wall-clock
hides behind per-batch fixed costs.

Usage:
    python3 tools/state_trend.py                 # two newest BENCH_r*.json
    python3 tools/state_trend.py OLD.json NEW.json

Accepts both artifact forms: the driver wrapper ({"tail": "..."} with
the bench line's last 2000 chars) and a raw bench stdout JSON line.
Exits 1 when any flag fires, 0 otherwise (2 = metrics unavailable).
"""
import glob
import json
import re
import sys

BAR = 1.5
METRICS = ("rowsUpdated", "stateBytes", "commitMs")


def extract_state(path):
    """Return the {query: {metric: value}} state map from an artifact."""
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.load(open(path))
    except json.JSONDecodeError:
        # raw bench stdout with an sbt "[info] " prefix (or other noise):
        # fall back to brace-scanning the whole text for the state map
        doc = {"tail": raw}
    if "state" in doc and isinstance(doc["state"], dict):
        return doc["state"]
    text = doc.get("tail", "") if isinstance(doc, dict) else ""
    m = re.search(r'"state":\{', text)
    if not m:
        return None
    # brace-scan the (possibly truncated) fragment
    start = m.end() - 1
    depth, end = 0, None
    for i in range(start, len(text)):
        if text[i] == "{":
            depth += 1
        elif text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    if end is None:
        return None
    try:
        return json.loads(text[start:end])
    except json.JSONDecodeError:
        return None


def per_batch(entry):
    b = max(1, entry.get("batches", 1))
    return {m: entry.get(m, 0) / b for m in METRICS}


def main():
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(glob.glob("BENCH_r*.json"))
        if len(arts) < 2:
            print("state_trend: need two BENCH_r*.json artifacts")
            return 2
        old_p, new_p = arts[-2], arts[-1]
    old, new = extract_state(old_p), extract_state(new_p)
    if not old or not new:
        missing = [p for p, s in ((old_p, old), (new_p, new)) if not s]
        print(f"state_trend: no state map in {', '.join(missing)} "
              "(pre-r7 artifacts carry none)")
        return 2
    flags = 0
    for q in sorted(set(old) & set(new)):
        po, pn = per_batch(old[q]), per_batch(new[q])
        for m in METRICS:
            o, n = po[m], pn[m]
            ratio = n / o if o else float("inf") if n else 1.0
            mark = ""
            if ratio > BAR or ratio < 1 / BAR:
                mark = "  <-- FLAG"
                flags += 1
            print(f"{q:6s} {m:12s}/batch {o:12.1f} -> {n:12.1f} "
                  f"({ratio:5.2f}x){mark}")
    for q in sorted(set(new) - set(old)):
        print(f"{q:6s} new in {new_p}: {new[q]}")
    print(f"state_trend: {old_p} -> {new_p}, {flags} flag(s) at {BAR}x")
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
