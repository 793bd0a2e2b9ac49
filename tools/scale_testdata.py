#!/usr/bin/env python3
"""Synthesize a larger SF from the shipped sf0.1 parquet (VERDICT r3 item 4:
scale-step the correctness gate to sf1 = 10x the bench SF).

/root/testdata is read-only and ships nothing above sf0.1, so sf1 is built in
/tmp by stacking K offset replicas of sf0.1. Both engines read the SAME files,
so oracle parity stays a valid check on whatever data this produces; the goal
is volume with non-degenerate content:

- fact/dim keys get a per-replica stride (FKs offset consistently, so join
  fan-outs scale like a real 10x corpus instead of multiplying);
- region/nation stay fixed (real dimensions don't scale with volume);
- document text gets a per-replica marker woven in — otherwise every doc has
  9 EXACT duplicates and the near-dup entries measure a pathological
  all-duplicate corpus rather than a big one;
- embeddings get deterministic per-replica jitter for the same reason.

Usage: python tools/scale_testdata.py [K] [out_dir]   (defaults: 10 /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

STRIDES = {
    "c_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,  # must match c_custkey or replica-k orders all
    # point at replica-0 customers (10x fan-in skew; caught in review)
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def _offset(tbl: pa.Table, k: int) -> pa.Table:
    for name, stride in STRIDES.items():
        if name in tbl.column_names:
            i = tbl.column_names.index(name)
            col = tbl.column(i)
            tbl = tbl.set_column(
                i, name, pc.add(col, pa.scalar(k * stride, type=col.type))
            )
    # entity names derive from the key in the source generator
    # (Customer#%09d); rebuild them from the OFFSET key, otherwise every name
    # has K exact copies and name-keyed operators (fuzzy entity resolution)
    # measure a pathological all-duplicate corpus instead of a bigger one
    for name, key, prefix in (
        ("c_name", "c_custkey", "Customer#"),
        ("s_name", "s_suppkey", "Supplier#"),
    ):
        if name in tbl.column_names:
            keys = tbl.column(key).to_pylist()
            i = tbl.column_names.index(name)
            tbl = tbl.set_column(
                i, name, pa.array([f"{prefix}{v:09d}" for v in keys])
            )
    return tbl


def _perturb_documents(tbl: pa.Table, k: int) -> pa.Table:
    ids = tbl.column("doc_id").to_numpy()
    texts = tbl.column("text").to_pylist()
    out = []
    for i, t in zip(ids, texts):
        words = t.split(" ")
        # weave replica markers INTO the text (prefix-only would leave nearly
        # every shingle shared with the source replica)
        step = max(3, len(words) // 4)
        for pos in range(step - 1, len(words), step):
            words[pos] = f"r{k}x{(int(i) * 31 + pos) % 9973}"
        out.append(" ".join(words))
    j = tbl.column_names.index("text")
    tbl = tbl.set_column(j, "text", pa.array(out, type=pa.string()))
    if "n_chars" in tbl.column_names:
        j = tbl.column_names.index("n_chars")
        tbl = tbl.set_column(
            j, "n_chars", pa.array([len(t) for t in out], type=pa.int64())
        )
    return tbl


def _perturb_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    emb = tbl.column("embedding").to_pylist()
    ids = tbl.column("vec_id").to_numpy()
    dim = len(emb[0])
    rng = np.random.default_rng(10_007 * k)  # deterministic per replica
    mat = np.asarray(emb, dtype=np.float32)
    mat = mat + rng.normal(0.0, 0.15, size=mat.shape).astype(np.float32)
    arr = pa.array(
        [row.tolist() for row in mat], type=pa.list_(pa.float32())
    )
    j = tbl.column_names.index("embedding")
    return tbl.set_column(j, "embedding", arr)


def main() -> None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    # optional comma-list of tables: the sf30 scale-trend corpus only needs
    # documents (the capped dedup family's sole input) — no point writing
    # a 180M-row lineitem nobody sweeps at that SF
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        if only is not None and t not in only:
            continue
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        src = src.replace_schema_metadata(None)
        if t in ("region", "nation"):
            reps = [src]
        else:
            reps = []
            for k in range(K):
                r = _offset(src, k)
                if t == "documents" and k > 0:
                    r = _perturb_documents(r, k)
                if t == "embeddings" and k > 0:
                    r = _perturb_embeddings(r, k)
                reps.append(r)
        big = pa.concat_tables(reps)
        # Bounded row groups: pyarrow's default writes ~1M-row groups, and a
        # parquet ROW GROUP is the unit of split assignment — a 500k-doc file
        # in one row group hands the entire scan (and the repartition write
        # feeding every downstream map kernel) to ONE task. 50k-row groups
        # give the local[32] session a parallel scan, exactly like the
        # thousands-of-files layout of a real corpus (found round 9: the
        # sf30 slope probe's scan stage ran 2 tasks for 1.5M docs).
        pq.write_table(
            big, os.path.join(out_dir, f"{t}.parquet"), row_group_size=50_000
        )
        print(f"{t}: {src.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main()
