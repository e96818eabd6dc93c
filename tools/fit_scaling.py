#!/usr/bin/env python3
"""Fit per-query scaling exponents from Bench detail files (r16 study).

VERDICT r15 item 1: the 100 TB claims rest on gated plan SHAPE plus
walls at sf0.01..sf1; nothing measures the SLOPE of the heavy family
paths one more decade up. This takes Bench detail JSONs (tmp/
bench_now.json copies) recorded at increasing scale factors and fits,
per query, the log-log slope between consecutive rungs and over the
full range: wall ~ scale^b. A capped/bucketed path should fit b ~<= 1
(linear in corpus size); b >= ~1.5 between the LAST two rungs flags a
super-linear path (the next round's task).

The smallest rung is noise-dominated (fixed JVM/stream-lifecycle
overhead flattens its slope), so the verdict slope is the LAST segment
(largest corpora), where fixed costs are the smallest share.

Usage:
  python3 tools/fit_scaling.py out.json LABEL:SCALE:DETAIL.json ... [--queries q88,q109]
  e.g. fit_scaling.py artifacts/r16_scaling.json \
      sf0.1:1:tmp/bench_sf01.json sf1:10:tmp/bench_sf1.json sf10:100:tmp/bench_sf10.json
"""
import json
import math
import sys


def main():
    out_path = sys.argv[1]
    rungs = []  # (label, scale, {query: sec})
    wanted = None
    for a in sys.argv[2:]:
        if a.startswith("--queries"):
            wanted = a.split("=", 1)[1].split(",") if "=" in a else None
            continue
        label, scale, path = a.split(":", 2)
        with open(path) as f:
            doc = json.load(f)
        rungs.append((label, float(scale), doc["queries"]))
    rungs.sort(key=lambda r: r[1])
    names = [q for q in rungs[0][2]
             if all(q in r[2] for r in rungs)
             and (wanted is None or any(w in q for w in wanted))]
    res = {}
    for q in names:
        walls = [(r[0], r[1], r[2][q]) for r in rungs]
        if any(w[2] <= 0 for w in walls):
            res[q] = {"walls": {w[0]: w[2] for w in walls}, "error": "non-positive wall"}
            continue
        segs = {}
        for (l0, s0, w0), (l1, s1, w1) in zip(walls, walls[1:]):
            segs[f"{l0}->{l1}"] = round(
                math.log(w1 / w0) / math.log(s1 / s0), 3)
        overall = round(
            math.log(walls[-1][2] / walls[0][2]) /
            math.log(walls[-1][1] / walls[0][1]), 3)
        last = list(segs.values())[-1]
        res[q] = {
            "walls_sec": {w[0]: w[2] for w in walls},
            "seg_exponents": segs,
            "overall_exponent": overall,
            "verdict_exponent": last,  # last segment: fixed costs smallest share
            "judgment": ("LINEAR-OR-BETTER" if last <= 1.15 else
                         "MILDLY-SUPER-LINEAR" if last < 1.5 else
                         "SUPER-LINEAR (flag)"),
        }
    doc = {
        "metric": "scaling_exponents",
        "rungs": [{"label": l, "scale": s} for l, s, _ in rungs],
        "note": ("wall ~ scale^b fitted per segment on Bench minima; "
                 "verdict_exponent = last (largest-corpora) segment"),
        "queries": res,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    for q, r in sorted(res.items()):
        if "error" in r:
            print(f"{q}: ERROR {r['error']}")
        else:
            walls = " ".join(f"{l}={w:.2f}s" for l, w in r["walls_sec"].items())
            print(f"{q}: {walls}  b_last={r['verdict_exponent']} "
                  f"b_all={r['overall_exponent']}  {r['judgment']}")


if __name__ == "__main__":
    main()
