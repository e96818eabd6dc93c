#!/usr/bin/env python3
"""Annotate an EngineRun JSON line with baseline-vs-production roles.

VERDICT r10 "What's wrong" #3: the engine-sf1 artifact listed deliberate
uncapped/exact baselines (q41 at 1059 s, ...) undifferentiated from
production paths, so a reader could quote 1059 s as the engine's dedup
cost. This stamps each query row with its role so the artifact is
self-describing.

Usage: python3 tools/annotate_engine.py < enginerun.json > annotated.json
"""
import json
import sys

# baseline rows are kept to PRICE their production paths; quoting them
# as the engine's cost is the misreading this annotation prevents
ROLES = {
    "q41_dedup_minhash_lsh": "BASELINE (uncapped 3-gram band join) — production: q121_dedup_lsh_hotcap",
    "q108_dedup_minhash_word": "BASELINE (uncapped word-bigram band join) — production: q127_dedup_word_hotcap",
    "q46_dedup_embedding": "BASELINE (exact all-pairs cosine) — production: q118_semantic_dedup_ivf",
    "q58_multimodal_embed": "BASELINE (brute-force O(q*n) top-k) — production: q130_multimodal_ann",
    "q43_dedup_ngram_jaccard": "BASELINE (exact all-pairs n-gram edges) — production: q88_dedup_pipeline",
    "q52_dedup_clusters": "BASELINE (components over exact all-pairs edges) — production: q88_dedup_pipeline / q119_semantic_dedup_pipeline",
    "q44_knn_bruteforce": "BASELINE (exact k-NN) — production: q45_knn_lsh / q53_knn_ivf (+ q125/q126 operating points)",
    "q121_dedup_lsh_hotcap": "PRODUCTION (caps q41's band join; planted-copy recall 1.0, r10_hotcap_quality.json)",
    "q127_dedup_word_hotcap": "PRODUCTION (caps q108's band join; r11_hotcap_word_quality.json)",
    "q118_semantic_dedup_ivf": "PRODUCTION (IVF-blocked q46; blocking only prunes)",
    "q119_semantic_dedup_pipeline": "PRODUCTION (IVF-blocked candidate->verify->components->canonical)",
    "q130_multimodal_ann": "PRODUCTION (cell-blocked q58; ~101 candidates/probe at any corpus size)",
    "q88_dedup_pipeline": "PRODUCTION (banded candidate->verify->components->canonical)",
    "q45_knn_lsh": "PRODUCTION (LSH-bucketed k-NN)",
    "q53_knn_ivf": "PRODUCTION (IVF cell-blocked k-NN)",
    "q131_semantic_hotcell_cap": "PRODUCTION shape at the PINNED gate K=8 — at fixed K its COLD-cell pair cost grows (n/K)²·K (measured sf10, r16_scaling_study.md); deployment K comes from the q134 occupancy hand-off, which holds it linear (Prof semscale)",
    "q92_dedup_prefix_filter": "exact Jaccard with prefix-filter pruning (its own production form)",
    "q117_ivf_nprobe": "quality ladder (measurement query)",
    "q109_stream_dedup": "LIFECYCLE GATE whose accept path is the uncapped wave-vs-index baseline (candidates ∝ copy-family²; r16 scaling study) — production accept: q138_index_accept_hotcap",
    "q110_index_compaction": "LIFECYCLE GATE (compaction semantics) whose accept path is the uncapped baseline — production accept: q138_index_accept_hotcap",
    "q138_index_accept_hotcap": "PRODUCTION (hot-bucket-capped wave-vs-index accept; candidates wave-linear, IndexAcceptCapSpec)",
}


def main():
    doc = json.loads(sys.stdin.read())
    doc["roles"] = {q: ROLES.get(q, "") for q in doc.get("queries", {})}
    json.dump(doc, sys.stdout, indent=1)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
