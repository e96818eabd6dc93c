#!/usr/bin/env python3
"""Assemble artifacts/r11_semcap_quality.json from `graft.Prof semcap`
logs (one per corpus) — q131's engine-side quality evidence, the
wordcap_quality.py pattern on the semantic family. The uncapped form is
q118's spill-blocked join over the same planted corpus (exact copies at
+100000 that must survive; a full boilerplate mirror of the base corpus
at +200000 that must be bounded); flood_pairs reads the bound directly.

Usage: python3 tools/semcap_quality.py sf0.01=log1 sf0.1=log2 ...
"""
import json
import re
import sys


def parse(path):
    txt = open(path).read()
    out = {}
    for kind in ("capped", "uncapped"):
        m = re.search(
            rf"{kind}: cands=(\d+) pairs=(\d+) planted_kept=(\d+)/(\d+) "
            rf"flood_pairs=(\d+)", txt)
        if not m:
            raise SystemExit(f"{path}: no '{kind}:' summary line")
        c, p, k, t, f = map(int, m.groups())
        out[f"{kind}_cands"], out[f"{kind}_pairs"] = c, p
        out[f"{kind}_flood_pairs"] = f
        if kind == "capped":
            out["planted_kept"], out["planted_total"] = k, t
        else:
            out["uncapped_planted_kept"] = k
    out["cand_reduction"] = (
        round(out["uncapped_cands"] / out["capped_cands"], 1)
        if out["capped_cands"] else None)
    out["flood_bound"] = (
        round(out["uncapped_flood_pairs"] / out["capped_flood_pairs"], 1)
        if out["capped_flood_pairs"] else None)
    return out


def main():
    doc = {
        "metric": "semcap_quality",
        "method": ("graft.Prof semcap per corpus: q131's engine "
                   "derivation (IvfKmeans train -> 2x spill -> capCells "
                   "-> (cell, grp) self-join -> exact-cosine verify) vs "
                   "the uncapped q118 shape on the SAME planted corpus "
                   "(exact copies of vec_id % 7 at +100000; a full "
                   "boilerplate mirror of the base corpus at +200000). "
                   "cands = DISTINCT same-cell(-and-group) pairs "
                   "pre-verify; pairs = cosine >= 0.4; planted = "
                   "exact-copy pairs the construction guarantees; "
                   "flood_pairs = verified pairs with BOTH ends in the "
                   "mirror flood."),
        "corpora": {},
    }
    for arg in sys.argv[1:]:
        name, path = arg.split("=", 1)
        doc["corpora"][name] = parse(path)
    json.dump(doc, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
