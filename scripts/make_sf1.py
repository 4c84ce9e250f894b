"""Derive an sf1 stress dataset (10x sf0.1) for the full-registry
differential sweep (r6 verdict task 6).

The driver ships sf0.001/0.01/0.1 only; this tiles sf0.1 ten times
with per-copy key offsets chosen so every foreign-key relationship is
preserved inside each copy block (custkey/orderkey/partkey/suppkey/
event_id/user_id/doc_id/vec_id all shift by max+1 per copy; dims
region/nation stay fixed). Values, dates, text, and embeddings repeat
verbatim — volumes, key cardinalities, and aggregate magnitudes grow
10x, which is exactly what the sweep stresses (int64/decimal edges,
ordering hazards, join fan-outs). Both engines read the same files, so
oracle parity semantics are unchanged.

Output: /root/repo/.localdata/sf1/*.parquet  (gitignored)
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".localdata", "sf1")
COPIES = 10

# per-table key columns and their per-copy offset units (max+1 at sf0.1)
OFFSETS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 15000},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name, keys in OFFSETS.items():
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        if not keys:
            out = src
        else:
            parts = []
            for i in range(COPIES):
                t = src
                for col, unit in keys.items():
                    idx = t.schema.get_field_index(col)
                    shifted = pc.add(t.column(col), pa.scalar(i * unit, type=pa.int64()))
                    t = t.set_column(idx, t.schema.field(col), shifted.cast(t.schema.field(col).type))
                parts.append(t)
            out = pa.concat_tables(parts)
        # one row group per tiled copy: a single-row-group file scans as
        # ONE task regardless of cores (the r12 scaling block's finding
        # at sf0.1), which hides every data-path cost behind a serial
        # scan stage; per-copy groups give the scan the same parallelism
        # a real multi-file corpus would have without touching values.
        rg = src.num_rows
        pq.write_table(out, os.path.join(DST, f"{name}.parquet"),
                       row_group_size=rg)
        print(f"{name}: {src.num_rows} -> {out.num_rows} "
              f"({-(-out.num_rows // rg)} row groups)")


if __name__ == "__main__":
    main()
