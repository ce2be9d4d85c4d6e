#!/usr/bin/env python
"""Generate a larger scale factor from an existing testdata directory by
key-remapped replication — for SCALING.md timing rows beyond the
driver-provided sf0.1 (correctness still runs against driver data only).

Verbatim duplication would lie about the workload: join/agg group counts
would stay flat while rows-per-group grew, and dedup/similarity would see
every replica as an exact/near duplicate (quadratic in-bucket blowup that
real corpus growth does not have). So each replica r (1..k-1):

- offsets every key column by r * (max key + 1) — key cardinality scales
  with data, as in real TPC-H SF growth;
- word-permutes document text with a per-(replica, doc) seeded RNG —
  destroys shingle overlap so near-dup density per doc stays ~flat;
- perturbs embeddings with seeded Gaussian noise — distance structure
  stays, degenerate zero-distance pairs don't multiply;
- shifts event ts by r days — the event-time span grows with volume
  instead of densifying the same hours 10x.

Usage: python tools/gen_sf.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key columns to offset per table: column → which table's key space it
# belongs to (offset unit = that space's max+1 in the SOURCE data)
KEY_SPACES = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
SPACE_SOURCE = {  # key space → (table, column) to take max from
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
FIXED_DIMS = ("region", "nation")


def _permute_texts(texts: list, replica: int) -> list:
    out = []
    for i, t in enumerate(texts):
        words = t.split()
        rng = np.random.default_rng(1_000_003 * replica + i)
        out.append(" ".join(np.array(words)[rng.permutation(len(words))]))
    return out


def _perturb_embeddings(col: pa.ChunkedArray, replica: int) -> pa.Array:
    flat = col.combine_chunks()
    vals = np.asarray(flat.values, dtype=np.float32)
    rng = np.random.default_rng(7_000_003 * replica)
    noisy = vals + rng.normal(0.0, 0.05, size=vals.shape).astype(np.float32)
    return pa.ListArray.from_arrays(flat.offsets, pa.array(noisy))


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    units = {
        space: pc.max(pq.read_table(
            os.path.join(src, f"{t}.parquet"), columns=[c]
        )[c]).as_py() + 1
        for space, (t, c) in SPACE_SOURCE.items()
    }
    for t in FIXED_DIMS:
        # fixed-size dims are copied once, unreplicated
        pq.write_table(
            pq.read_table(os.path.join(src, f"{t}.parquet")),
            os.path.join(dst, f"{t}.parquet"),
        )
    for t, keycols in KEY_SPACES.items():
        base = pq.read_table(os.path.join(src, f"{t}.parquet"))
        replicas = [base]
        for r in range(1, k):
            tbl = base
            for col, space in keycols.items():
                idx = tbl.schema.get_field_index(col)
                shifted = pc.add(tbl[col], r * units[space])
                tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted)
            if t == "documents":
                idx = tbl.schema.get_field_index("text")
                texts = _permute_texts(tbl["text"].to_pylist(), r)
                tbl = tbl.set_column(
                    idx, tbl.schema.field(idx), pa.array(texts, pa.string())
                )
            if t == "embeddings":
                idx = tbl.schema.get_field_index("embedding")
                tbl = tbl.set_column(
                    idx,
                    tbl.schema.field(idx),
                    _perturb_embeddings(tbl["embedding"], r),
                )
            if t == "events":
                idx = tbl.schema.get_field_index("ts")
                shifted_ts = pc.add(
                    tbl["ts"], pa.scalar(r * 86_400_000_000, pa.duration("us"))
                )
                tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted_ts)
            replicas.append(tbl)
        out = pa.concat_tables(replicas)
        pq.write_table(out, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: {base.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    src, dst, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    main(src, dst, k)
