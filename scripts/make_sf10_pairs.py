"""Derive the sf10 PAIR-RUNG spot-sweep dataset (r8 verdict task 6):
100x sf0.1 documents (500k) and embeddings (200k) — ONLY the two
tables the six PAIR_RUNGS read; the relational tables are not needed
and tiling them 100x would waste minutes of generation for nothing.

Tiling design — the density contract matters more than raw volume:
the committed growth gate (tests/test_scale_growth.py) bounds every
pair rung at c*N where c was calibrated on the sf1 tiling's
duplicate MULTIPLICITY of 10 (every sf0.1 text repeated 10x). A naive
100x verbatim tiling would raise multiplicity to 100 and the GENUINE
pair density to ~C(100,2)/100 = 50/doc — the gate would fail on real
duplicate mass, not on a scaling bug. So sf10 tiles in 10 SUPER-BLOCKS
of 10 verbatim copies each:

- documents: within a super-block, texts repeat verbatim 10x (the sf1
  regime — caps and rescue stars get exercised); across super-blocks
  every token carries a block suffix (``tok`` -> ``tokxB``), making
  blocks mutually dissimilar shards. Per-doc pair density stays at sf1
  levels while N grows another decade — the pure linearity probe.
- embeddings: vectors repeat verbatim (the aHash rung sees 100-member
  identical-render clusters — over both the bucket cap and the
  identical-group cap, so the min-id star path carries the recall);
  labels carry the super-block suffix so the label-blocked cosine
  rung's blocks stay at their sf1 size (2000 vectors) — 10x more
  blocks instead of 10x bigger blocks, which is exactly how a real
  corpus scales its blocking key (finer buckets, not fatter ones).

Output: /root/repo/.localdata/sf10_pairs/*.parquet  (gitignored)
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".localdata",
    "sf10_pairs",
)
SUPER_BLOCKS = 10
COPIES_PER_BLOCK = 10
DOC_UNIT = 5_000  # sf0.1 documents rows
VEC_UNIT = 2_000  # sf0.1 embeddings rows


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    doc_parts, vec_parts = [], []
    for b in range(SUPER_BLOCKS):
        salt = f"x{b}"
        for c in range(COPIES_PER_BLOCK):
            k = b * COPIES_PER_BLOCK + c
            doc_parts.append(f"""
              SELECT doc_id + {k * DOC_UNIT} AS doc_id,
                     replace(text, ' ', '{salt} ') || '{salt}' AS text,
                     lang, source,
                     CAST(length(replace(text, ' ', '{salt} ') || '{salt}')
                          AS BIGINT) AS n_chars
              FROM read_parquet('{SRC}/documents.parquet')""")
            vec_parts.append(f"""
              SELECT vec_id + {k * VEC_UNIT} AS vec_id,
                     label || '_b{b}' AS label, embedding
              FROM read_parquet('{SRC}/embeddings.parquet')""")
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{DST}/documents.parquet' (FORMAT PARQUET)"
    )
    print(f"documents: {DOC_UNIT} -> {SUPER_BLOCKS * COPIES_PER_BLOCK * DOC_UNIT}")
    con.execute(
        f"COPY ({' UNION ALL '.join(vec_parts)}) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)"
    )
    print(f"embeddings: {VEC_UNIT} -> {SUPER_BLOCKS * COPIES_PER_BLOCK * VEC_UNIT}")


if __name__ == "__main__":
    main()
