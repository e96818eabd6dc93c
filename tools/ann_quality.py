#!/usr/bin/env python3
"""Measured ANN search-quality numbers from a Verify dump (dev-side
python, not part of the library): turns the gated integer recall
NUMERATORS (q115, q117) and the blocked pair set (q118) into the
fractions a user quotes — recall@5 per method and q118's pair recall
against q46's exact all-pairs ground truth. The gates pin the exact
per-query counts; this script only summarizes them into artifacts/.

Usage:
  SPARK_GRAFT_VERIFY_FILTER=q46_,q115_,q117_,q118_ sbt -batch \
    "runMain graft.Verify /root/testdata/sf0.1 tmp/verify_ann"
  python3 tools/ann_quality.py tmp/verify_ann
"""
import glob
import json
import sys

import pandas as pd


def load(out_dir, name):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    return pd.concat(pd.read_parquet(f) for f in files)


def main():
    out_dir = sys.argv[1]
    res = {}

    q115 = load(out_dir, "q115_ann_recall")
    n = float(q115["n_exact"].sum())
    res["q115_recall_at_5"] = {
        "n_probes": int(len(q115)),
        "lsh": round(q115["lsh_hits"].sum() / n, 4),
        "multiprobe_lsh": round(q115["mlsh_hits"].sum() / n, 4),
        "ivf_trained": round(q115["ivf_hits"].sum() / n, 4),
    }

    q117 = load(out_dir, "q117_ivf_nprobe")
    n = float(q117["n_exact"].sum())
    res["q117_ivf_recall_at_5_by_nprobe"] = {
        "n_probes": int(len(q117)),
        "nprobe_1": round(q117["p1_hits"].sum() / n, 4),
        "nprobe_2": round(q117["p2_hits"].sum() / n, 4),
        "nprobe_4": round(q117["p4_hits"].sum() / n, 4),
    }

    exact = load(out_dir, "q46_dedup_embedding")[["vec_a", "vec_b"]]
    blocked = load(out_dir, "q118_semantic_dedup_ivf")[["vec_a", "vec_b"]]
    inter = exact.merge(blocked, on=["vec_a", "vec_b"])
    res["q118_pair_recall_vs_q46"] = {
        "exact_pairs": int(len(exact)),
        "blocked_pairs": int(len(blocked)),
        "found": int(len(inter)),
        # q118 verifies with q46's exact cosine, so blocked ⊆ exact:
        # precision is 1.0 by construction; recall is what blocking costs
        "pair_recall": round(len(inter) / max(len(exact), 1), 4),
        "blocked_is_subset": bool(len(blocked) == len(inter)),
    }
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
