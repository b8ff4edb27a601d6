#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (BENCH_LOCAL.json files or raw
`{"metric": ...}` lines embedded in logs) and report per-query movers.

Usage: python3 tools/bench_diff.py OLD NEW [--thresh=1.3] [--floor=0.2]

Movers are queries present in both runs, above `--floor` seconds in the
old run (default 0.2 s — low enough that a sub-second query regressing
5x, like r11's q141, still surfaces), whose new/old ratio falls outside [1/thresh, thresh]. Queries
only in one run are listed separately. Exit code is always 0 — this is
a reporting tool, not a gate (sub-second timings jitter run to run;
confirm a suspected regression with an isolated
`SPARK_GRAFT_ONLY=<q> runMain graft.Bench` min-of-3 before acting,
and check the forensics block: same jobs/tasks/shuffle with higher
gc_task_ms is environment drift, not a plan regression).
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        # a log may hold several {"metric"...} lines (the full
        # forensics line, then the compact tail summary) and truncation
        # can corrupt any of them — prefer the first PARSEABLE one that
        # carries the per-query map
        parsed = []
        for m in re.finditer(r'\{"metric".*', text):
            try:
                parsed.append(json.loads(m.group(0)))
            except json.JSONDecodeError:
                pass
        full = [d for d in parsed if "queries" in d]
        if full:
            return full[0]
        if parsed:
            return parsed[0]
        raise SystemExit(f"{path}: no parseable bench JSON found")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a.split("=") for a in sys.argv[1:]
                if a.startswith("--") and "=" in a)
    thresh = float(opts.get("--thresh", 1.3))
    floor = float(opts.get("--floor", 0.2))
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    for label, d in (("OLD", old), ("NEW", new)):
        if "queries" not in d:
            # Bench's stdout now ENDS with a compact summary line (no
            # per-query map) for the driver's tail parser; a truncated
            # log may only contain that line
            raise SystemExit(
                f"{label} artifact has no per-query map (compact summary "
                f"line only?) — use the full BENCH_LOCAL.json instead")
    oq, nq = old["queries"], new["queries"]
    both = sorted(set(oq) & set(nq))
    movers = [(k, oq[k], nq[k]) for k in both
              if oq[k] > floor and (nq[k] / oq[k] > thresh
                                    or nq[k] / oq[k] < 1 / thresh)]
    print(f"total: {sum(oq.values()):.1f}s ({len(oq)} queries) -> "
          f"{sum(nq.values()):.1f}s ({len(nq)} queries)")
    if movers:
        print(f"movers (>{thresh}x either way, old >{floor}s):")
        for k, a, b in sorted(movers, key=lambda t: t[1] - t[2]):
            print(f"  {k:34s} {a:6.2f} -> {b:6.2f}  ({b / a:.2f}x)")
    else:
        print("no movers")
    for label, s in (("only-old", set(oq) - set(nq)),
                     ("only-new", set(nq) - set(oq))):
        if s:
            print(f"{label}: {', '.join(sorted(s))}")


if __name__ == "__main__":
    main()
