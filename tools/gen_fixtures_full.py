#!/usr/bin/env python3
"""Generate a FULL sf-N fixture directory — all 10 harness tables — for
local bench sweeps above the read-only sf0.1 (the r6 verdict asked for a
full-surface sweep at sf1, not just the documents-only probes).

Method, chosen so the workload SHAPE scales like the driver's own
generator would:

  - relational tables (customer/supplier/part/orders/lineitem/events):
    row replication with per-copy KEY OFFSETS large enough to never
    collide — this preserves every per-table marginal (value
    distributions, null rates, dates) and every join fan-out (each
    order keeps its lineitems, each user keeps its event history)
    EXACTLY, at N x the rows;
  - region/nation: fixed-size dimensions, copied as-is;
  - embeddings: fresh deterministic unit vectors per copy (verbatim
    copies would give every vector N-1 exact twins and quadratically
    inflate near-dup candidate pairs — the one place replication
    distorts the workload);
  - documents: the gen_fixtures generator (same reason: dup rates must
    stay at the generator's marginals, not explode combinatorially).

Deterministic throughout; NEVER writes into /root/testdata.

Usage: python3 tools/gen_fixtures_full.py <copies> <out_dir>
   e.g. python3 tools/gen_fixtures_full.py 10 target/sf1full
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from gen_fixtures import gen as gen_documents

SRC = "/root/testdata/sf0.1"
DOCS_PER_COPY = 5000   # sf0.1 documents rows
VECS_PER_COPY = 2000   # sf0.1 embeddings rows

KEY_OFFSETS = {
    "orders":   {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part":     {"p_partkey": 1_000_000},
    "events":   {"event_id": 10_000_000, "user_id": 1_000_000},
}


def replicate(name: str, copies: int) -> pa.Table:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    offs = KEY_OFFSETS[name]
    parts = [t]
    for c in range(1, copies):
        cols = [pc.add(t[f], offs[f] * c) if f in offs else t[f]
                for f in t.schema.names]
        parts.append(pa.table(dict(zip(t.schema.names, cols))))
    return pa.concat_tables(parts)


def embeddings(copies: int) -> pa.Table:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    # the per-copy vec_id offset below is the CONSTANT, not n — if the
    # source ever grows past it, ids would silently collide across
    # copies and the near-dup/vector demos' keys stop being unique
    assert n == VECS_PER_COPY, \
        f"embeddings source has {n} rows, expected VECS_PER_COPY={VECS_PER_COPY}"
    dim = len(t["embedding"][0])
    parts = [t]
    for c in range(1, copies):
        rng = np.random.RandomState(7000 + c)
        vecs = rng.normal(0.0, 1.0, size=(n, dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        parts.append(pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64) + VECS_PER_COPY * c),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n).astype(np.int32)),
        }))
    return pa.concat_tables(parts)


if __name__ == "__main__":
    copies, out_dir = int(sys.argv[1]), sys.argv[2]
    assert copies >= 1
    assert not out_dir.startswith("/root/testdata"), "testdata is read-only"
    n_docs_src = pq.read_table(f"{SRC}/documents.parquet").num_rows
    assert n_docs_src == DOCS_PER_COPY, \
        f"documents source has {n_docs_src} rows, expected {DOCS_PER_COPY}"
    os.makedirs(out_dir, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")
    # small row groups keep every generated file SPLITTABLE (with
    # spark.sql.files.maxPartitionBytes sized down, scans parallelize
    # like a real cluster's pre-split inputs; a single-row-group file is
    # ONE scan partition no matter its size)
    for name in KEY_OFFSETS:
        pq.write_table(replicate(name, copies), f"{out_dir}/{name}.parquet",
                       row_group_size=50000)
    pq.write_table(embeddings(copies), f"{out_dir}/embeddings.parquet",
                   row_group_size=2000)
    pq.write_table(gen_documents(DOCS_PER_COPY * copies),
                   f"{out_dir}/documents.parquet", row_group_size=10000)
    print(f"wrote {copies}x sf0.1 tables to {out_dir}")
