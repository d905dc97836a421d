#!/usr/bin/env python3
"""Generate a LARGER synthetic documents.parquet for local scale probes.

The driver ships read-only fixtures up to sf0.1 (5,000 docs). The
"survives 100x" claims in SURVEY/BENCHNOTES need at least one EMPIRICAL
point above that, so this tool builds an sf-N documents table with the
same observable marginals as the driver's generator (measured on
/root/testdata/sf0.1/documents.parquet):

  - 30-word uniform vocabulary (the sf0.1 vocab, minus the 'dup' marker),
  - token lengths uniform 10..100 (mean ~54),
  - lang mix ~41% en / ~15% each de es fr zh, 20 uniform sources,
  - 0.16% exact-duplicate pairs (copy of an earlier doc),
  - ~5% near-duplicate docs (copy an earlier doc, keep a >=60-char
    prefix, regenerate the tail, tag with the 'dup' marker word),

so the dedup-family workload shape (gram counts, candidate-pair rates)
scales like the real fixtures. Deterministic: seeded per doc_id, no
global RNG state. NEVER writes into /root/testdata.

Usage: python3 tools/gen_fixtures.py <n_docs> <out_dir>
   e.g. python3 tools/gen_fixtures.py 50000 target/sf1
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "de", "es", "fr", "zh"]


def gen(n_docs: int):
    texts, langs, sources = [], [], []
    for i in range(n_docs):
        rng = random.Random(42 + i)
        r = rng.random()
        if i > 10 and r < 0.0016:  # exact duplicate of an earlier doc
            texts.append(texts[rng.randrange(i)])
        elif i > 10 and r < 0.05:  # near-dup: shared prefix, new tail
            src = texts[rng.randrange(i)].split(" ")
            keep = max(12, len(src) * 2 // 3)
            tail_n = rng.randint(4, 30)
            tail = ["dup"] + [rng.choice(VOCAB) for _ in range(tail_n)]
            texts.append(" ".join(src[:keep] + tail))
        else:
            n_toks = rng.randint(10, 100)
            texts.append(" ".join(rng.choice(VOCAB) for _ in range(n_toks)))
        langs.append("en" if rng.random() < 0.41 else rng.choice(LANGS[1:]))
        sources.append(f"src{i % 20}")
    return pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


if __name__ == "__main__":
    n_docs, out_dir = int(sys.argv[1]), sys.argv[2]
    assert not out_dir.startswith("/root/testdata"), "testdata is read-only"
    import os
    os.makedirs(out_dir, exist_ok=True)
    # small row groups make the file SPLITTABLE: a single-row-group 58 MB
    # file is one Spark scan partition, so the probe's expensive map side
    # (shingle hash + minhash) ran on ONE task at sf10 — combined with
    # spark.sql.files.maxPartitionBytes this is the knob the 100 TB
    # guidance prescribes (a real cluster's inputs arrive pre-split)
    pq.write_table(gen(n_docs), f"{out_dir}/documents.parquet",
                   row_group_size=10000)
    print(f"wrote {n_docs} docs to {out_dir}/documents.parquet")
