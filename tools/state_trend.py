#!/usr/bin/env python3
"""Cross-round bench trend check (r7 verdict ask #7 + r8 ask #2).

Two sections, one tool:

STATE (r7): the bench emits per-query state-store metrics (batches,
rowsUpdated, rowsTotal, stateBytes, commitMs) into the artifact tail;
this diffs the two most recent bench artifacts and flags per-batch
drifts > 1.5x in either direction for rowsUpdated, stateBytes, and
commitMs — the early-warning channel for state-design regressions that
wall-clock hides behind per-batch fixed costs.

BATCH (r10, r8 ask #2; sNN wall-clock added r11 per the r10 verdict
ask #6): the same diff over every qNN batch-query AND sNN streaming
wall-clock timing recoverable from the artifacts (the driver keeps the
bench line's last 2000 chars; r7+ artifacts carry the full ~114-query
map, earlier ones a suffix — the tool diffs the intersection and
reports coverage). Flags ratio > 1.5x either way; sub-second entries
are annotated as noise-prone rather than counted, because the
contended suite routinely wobbles 0.2 <-> 0.5 s entries (the q22/q03
signature, PLANS.md r9) — a flag there would page on noise every
round. q103's unexplained r8 tripling (0.84 -> 2.42 s) is exactly the
class of drift this section exists to catch the round it happens; the
sNN entries close the channel s02's r9 wall-clock regression slipped
through (it was caught by commitMs, not wall).

Usage:
    python3 tools/state_trend.py                 # two newest BENCH_r*.json
    python3 tools/state_trend.py OLD.json NEW.json

Accepts both artifact forms: the driver wrapper ({"tail": "..."} with
the bench line's last 2000 chars) and a raw bench stdout JSON line.
Exits 1 when any flag fires, 0 otherwise (2 = metrics unavailable).
"""
import glob
import json
import os
import re
import sys

BAR = 1.5
NOISE_FLOOR = 1.0  # seconds: below this, batch drift is annotated, not flagged
METRICS = ("rowsUpdated", "stateBytes", "commitMs")


def find_full_record(text, art_sf=None):
    """Resolve a TRUNCATED driver artifact tail to the full structured
    bench record the suite itself wrote into bench_history/ (r11 verdict
    ask #6: stop regex-scanning 2000-char tails when the full object
    exists). Match key: the suite total ('"value":X' closes the line and
    always survives the driver's tail window), narrowed by the
    artifact's sf when the wrapper carries one (so a coincidental total
    from another corpus's record can't be picked up). Ambiguity returns
    None and the caller keeps the regex fallback."""
    m = re.search(r'"value":([0-9.]+)\}', text)
    if not m:
        return None
    target = float(m.group(1))
    here = os.path.dirname(os.path.abspath(__file__))
    hits = []
    for fp in glob.glob(os.path.join(here, "..", "bench_history", "bench_*.json")):
        try:
            d = json.loads(open(fp).read())
        except (json.JSONDecodeError, OSError):
            continue
        if not (isinstance(d, dict) and abs(float(d.get("value", -1)) - target) < 5e-4):
            continue
        # the record's sf is the corpus dir string; the driver wrapper's
        # is a number — require the dir to end with "sf<number>"
        if art_sf is not None:
            rec_sf = str(d.get("sf", "")).rstrip("/")
            if not rec_sf.endswith(f"sf{art_sf}"):
                continue
        hits.append(d)
    return hits[0] if len(hits) == 1 else None


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
    if isinstance(doc, dict) and "tail" in doc:
        full = find_full_record(doc["tail"], doc.get("sf"))
        if full and isinstance(full.get("state"), dict):
            return full["state"]
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


def extract_queries(path):
    """Return {qname: seconds} for every batch query recoverable from the
    artifact, preferring in-suite timings: pairs inside the "noisy"
    re-run map are kept separately and only used when the suite timing
    for that query is outside the visible tail window."""
    with open(path) as f:
        raw = f.read()
    art_sf = None
    try:
        doc = json.loads(raw)
        text = doc["tail"] if isinstance(doc, dict) and "tail" in doc else raw
        if isinstance(doc, dict):
            art_sf = doc.get("sf")
    except json.JSONDecodeError:
        text = raw
    # structured path first: a truncated driver tail that resolves to
    # its full bench_history record yields the COMPLETE query map with
    # no regex scanning (noisy re-run pairs handled per the same rule)
    if '"metric"' not in text[:40]:
        full = find_full_record(text, art_sf)
        if full and isinstance(full.get("queries"), dict):
            suite = {k: float(v) for k, v in full["queries"].items()
                     if isinstance(v, (int, float)) and float(v) >= 0}
            for short, val in (full.get("noisy") or {}).items():
                if not any(k == short or k.startswith(short + "_") for k in suite):
                    suite[short] = float(val)
            return suite
    noisy_span = (len(text), len(text))
    m = re.search(r'"noisy":\{', text)
    if m:
        end = text.find("}", m.end())
        noisy_span = (m.start(), end if end != -1 else len(text))
    suite, noisy = {}, {}
    for pm in re.finditer(r'"([qs]\d+[a-z0-9_]*)":([0-9][0-9.]*)', text):
        name, val = pm.group(1), float(pm.group(2))
        # noisy map keys are short (q75) vs suite keys (q75_triangle_count)
        if noisy_span[0] <= pm.start() < noisy_span[1]:
            noisy[name] = val
        else:
            suite[name] = val
    for short, val in noisy.items():
        if not any(k == short or k.startswith(short + "_") for k in suite):
            suite[short] = val
    # full bench lines carry BOTH the full-name "queries" map and the
    # compact "q" map — drop a short key whenever its full-name sibling
    # is present so each query diffs once
    for short in [k for k in suite if "_" not in k]:
        if any(k != short and k.startswith(short + "_") for k in suite):
            del suite[short]
    return suite


def idle_min(path, k=3):
    """The repo's no-single-sample rule, mechanized (r12 verdict ask #4):
    per-query MIN over the artifact's own bench_history record and the
    k-1 records preceding it with the same sf AND (when recorded) the
    same build id. A suite total wobbles +-10% with VM contention, so
    one contended closing sample (r12: q75 3.43 s vs 2.3-2.5 s in the
    round's idle samples) must never read as a regression when an idle
    sample from the same build says otherwise — while a genuinely
    regressed NEW build with a single sample must not borrow the old
    build's idle minima (hence the build filter; records predating the
    build field fall back to sf-only pooling). Returns {} when the
    artifact's record isn't in bench_history (the caller then falls
    back to single-sample comparison)."""
    with open(path) as f:
        raw = f.read()
    # parse the driver wrapper FIRST (like extract_queries): the wrapper
    # stores the bench tail as a JSON string, so its quotes are escaped
    # in the raw file text and a regex over `raw` never matches — which
    # silently disabled the suppression for exactly the BENCH_r*.json
    # artifacts main() feeds in by default
    art_sf = None
    try:
        doc = json.loads(raw)
        text = doc["tail"] if isinstance(doc, dict) and "tail" in doc else raw
        if isinstance(doc, dict):
            art_sf = doc.get("sf")
    except json.JSONDecodeError:
        text = raw
    # same anchored form as find_full_record: the suite total CLOSES the
    # bench line; an unanchored match could pick up a different "value"
    # key and map the artifact to the wrong record
    m = re.search(r'"value":([0-9.]+)\}', text)
    if not m:
        return {}
    target = float(m.group(1))
    here = os.path.dirname(os.path.abspath(__file__))
    recs = []
    for fp in sorted(glob.glob(os.path.join(here, "..", "bench_history",
                                            "bench_*.json"))):
        try:
            d = json.loads(open(fp).read())
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(d, dict) or not isinstance(d.get("queries"), dict):
            continue
        if art_sf is not None:
            # driver wrappers carry a numeric sf (0.1); raw bench records
            # carry the corpus dir string — accept either spelling
            rec_sf = str(d.get("sf", "")).rstrip("/")
            want = str(art_sf).rstrip("/")
            if rec_sf != want and not rec_sf.endswith(f"sf{want}"):
                continue
        recs.append(d)
    own = [i for i, d in enumerate(recs)
           if abs(float(d.get("value", -1)) - target) < 5e-4]
    if not own:
        return {}
    idx = own[-1]
    own_build = recs[idx].get("build")
    pool = [d for d in recs[:idx + 1]
            if not own_build or d.get("build") == own_build]
    window = pool[-k:]
    out = {}
    for d in window:
        for q, v in d["queries"].items():
            if isinstance(v, (int, float)) and float(v) >= 0:
                out[q] = min(out.get(q, float("inf")), float(v))
    return out


def batch_section(old_p, new_p):
    """Diff per-query batch timings; returns the number of hard flags."""
    old, new = extract_queries(old_p), extract_queries(new_p)
    both = sorted(set(old) & set(new))
    if not both:
        print("batch_trend: no overlapping query timings (pre-r7 artifact?)")
        return 0
    old_idle, new_idle = idle_min(old_p), idle_min(new_p)
    flags = 0
    for q in both:
        o, n = old[q], new[q]
        ratio = n / o if o else float("inf") if n else 1.0
        if ratio <= BAR and ratio >= 1 / BAR:
            continue  # steady entries stay quiet; coverage line says how many
        if max(o, n) >= NOISE_FLOOR:
            # regression direction: consult the idle minima before paging —
            # compare the best recent sample on each side; only a drift the
            # idle samples CONFIRM is a flag
            omin, nmin = old_idle.get(q, o), new_idle.get(q)
            if ratio > BAR and nmin is not None and omin and nmin / omin <= BAR:
                mark = (f"  (contended sample; idle min {nmin:.2f}s = "
                        f"{nmin / omin:.2f}x vs old idle {omin:.2f}s -- not a regression)")
            else:
                mark = "  <-- FLAG"
                flags += 1
        else:
            mark = "  (sub-second, noise-prone)"
        print(f"{q:24s} {o:8.2f} -> {n:8.2f} s ({ratio:5.2f}x){mark}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"batch_trend: {len(only_new)} quer{'y' if len(only_new)==1 else 'ies'} "
              f"new in {new_p}: {', '.join(only_new[:8])}"
              + ("..." if len(only_new) > 8 else ""))
    print(f"batch_trend: {old_p} -> {new_p}, {len(both)} compared, "
          f"{flags} flag(s) at {BAR}x (floor {NOISE_FLOOR}s)")
    return flags


def main():
    if len(sys.argv) == 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(glob.glob("BENCH_r*.json"))
        if len(arts) < 2:
            print("state_trend: need two BENCH_r*.json artifacts")
            return 2
        old_p, new_p = arts[-2], arts[-1]
    batch_flags = batch_section(old_p, new_p)
    old, new = extract_state(old_p), extract_state(new_p)
    if not old or not new:
        missing = [p for p, s in ((old_p, old), (new_p, new)) if not s]
        print(f"state_trend: no state map in {', '.join(missing)} "
              "(pre-r7 artifacts carry none)")
        return 2
    flags = batch_flags
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
