#!/usr/bin/env python3
"""Assemble artifacts/r11_hotcap_word_quality.json from `graft.Prof
wordcap` logs (one per corpus). Engine-side counterpart of
r10_hotcap_quality.json: the word-granularity uncapped DuckDB verify is
infeasible past sf0.01 (abandoned at 2h wall at sf0.1, r11), so the
capped-vs-uncapped comparison runs in Spark, where the uncapped band
join still completes.

Usage: python3 tools/wordcap_quality.py sf0.01=log1 sf0.1=log2 ...
"""
import json
import re
import sys


def parse(path):
    txt = open(path).read()
    out = {}
    for kind in ("capped", "uncapped"):
        m = re.search(
            rf"{kind}: cands=(\d+) pairs=(\d+) planted_kept=(\d+)/(\d+)", txt)
        if not m:
            raise SystemExit(f"{path}: no '{kind}:' summary line")
        c, p, k, t = map(int, m.groups())
        out[f"{kind}_cands"], out[f"{kind}_pairs"] = c, p
        if kind == "capped":
            out["planted_kept"], out["planted_total"] = k, t
        else:
            out["uncapped_planted_kept"] = k
    out["pair_recall"] = (round(out["capped_pairs"] / out["uncapped_pairs"], 4)
                          if out["uncapped_pairs"] else None)
    out["cand_reduction"] = (
        round(out["uncapped_cands"] / out["capped_cands"], 1)
        if out["capped_cands"] else None)
    return out


def main():
    doc = {
        "metric": "wordcap_quality",
        "method": ("graft.Prof wordcap per corpus: q127's engine "
                   "derivation (signedDocsWord -> capBands -> band "
                   "self-join -> sorted_inter_count verify) vs the "
                   "uncapped q108 shape on the SAME planted-copy corpus "
                   "(doc_id % 7 duplicated at +100000). cands = DISTINCT "
                   "band-collision pairs pre-verify; pairs = verified "
                   "jacc_x1000 >= threshold; planted = exact-copy pairs "
                   "the corpus construction guarantees."),
        "corpora": {},
    }
    for arg in sys.argv[1:]:
        name, path = arg.split("=", 1)
        doc["corpora"][name] = parse(path)
    json.dump(doc, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
