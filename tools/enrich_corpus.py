#!/usr/bin/env python3
"""Realistic-vocabulary twin of a driver corpus (validation data only).

The driver's synthetic documents draw from ~31 distinct tokens (and so
~400 char-3-gram shingles), which makes EVERY MinHash band collide: the
LSH dedup family's candidate counts and bench costs at the driver SFs
are dominated by this fixture artifact (documented at q41/q88/q92).
This tool builds a twin corpus with a realistic token universe so the
dedup-family numbers become transferable, while PRESERVING the dedup
semantics the gates rely on:

- topic = hash(text) % n_topics: a pure function of CONTENT, so exact
  copies (however re-keyed) still map to identical text and every
  copy-based duplicate/decoy structure survives enrichment;
- ~30% of token instances stay unsuffixed (the shared zipf head — the
  'the/of/and' words every real doc shares), chosen deterministically
  by (position, topic);
- the rest get a topic suffix (the topical tail), growing the vocab to
  ~31 * n_topics while keeping realistic cross-doc overlap inside a
  topic.

Only documents.parquet is rewritten; the other tables are copied
byte-identical. Both engines read the SAME generated files, so every
oracle gate stays exact on the twin. NOT used by the driver gates —
/root/testdata stays untouched.

Usage: python3 tools/enrich_corpus.py /root/testdata/sf0.1 tmp/sf0.1rich [n_topics]
"""
import os
import shutil
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]


def main():
    src, dst = sys.argv[1], sys.argv[2]
    n_topics = int(sys.argv[3]) if len(sys.argv) > 3 else 1600
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id,
            array_to_string([
              CASE WHEN (i * 2654435761 + topic) % 10 < 3 THEN toks[i]
                   ELSE toks[i] || '~' || CAST(topic AS VARCHAR) END
              FOR i IN generate_series(1, len(toks))], ' ') AS text,
            lang, source,
            CAST(len(array_to_string([
              CASE WHEN (i * 2654435761 + topic) % 10 < 3 THEN toks[i]
                   ELSE toks[i] || '~' || CAST(topic AS VARCHAR) END
              FOR i IN generate_series(1, len(toks))], ' ')) AS BIGINT) AS n_chars
          FROM (
            SELECT doc_id, lang, source,
              string_split_regex(trim(text), '\\s+') AS toks,
              CAST(hash(text) % {n_topics} AS BIGINT) AS topic
            FROM read_parquet('{src}/documents.parquet'))
        ) TO '{dst}/documents.parquet' (FORMAT parquet)""")
    n, v = con.execute(f"""
        SELECT count(DISTINCT doc_id), count(DISTINCT t.t)
        FROM read_parquet('{dst}/documents.parquet'),
          LATERAL unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t(t)
        """).fetchone()
    print(f"enriched {n} docs, vocabulary {v} tokens "
          f"({n_topics} topics), -> {dst}")


if __name__ == "__main__":
    main()
