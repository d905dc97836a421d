#!/usr/bin/env python3
"""Generate an embeddings-ONLY fixture dir at N x sf0.1 — the scale
points for graft.ScaleProbe's `semdedup_scaled` face (constant cell
SIZE, kCells = n/500), which needs 2k/20k/200k-vector tables without
paying for a full 10-table sf-N replication.

Vector synthesis is gen_fixtures_full.embeddings verbatim (one shared
definition — fresh deterministic unit vectors per copy, so near-dup
rates stay at the generator's marginals instead of every vector gaining
N-1 exact twins). NEVER writes into /root/testdata.

Usage: python3 tools/gen_embeddings.py <copies> <out_dir>
   e.g. python3 tools/gen_embeddings.py 100 target/semb10
"""
import os
import sys

import pyarrow.parquet as pq

from gen_fixtures_full import embeddings

if __name__ == "__main__":
    copies, out_dir = int(sys.argv[1]), sys.argv[2]
    assert copies >= 1
    assert not out_dir.startswith("/root/testdata"), "testdata is read-only"
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(embeddings(copies), f"{out_dir}/embeddings.parquet",
                   row_group_size=2000)
    print(f"wrote {copies}x sf0.1 embeddings to {out_dir}")
