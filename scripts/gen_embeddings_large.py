#!/usr/bin/env python3
"""Generate a 1M-vector embedding corpus for ANN-at-scale probes
(measurement tooling — NOT part of the graft library).

500 perturbed copies of each of sf0.1's 2000 embeddings (Gaussian noise,
sigma=0.05 per dim on unit-ish 64-dim vectors): a naturally clustered
corpus — the structure IVF cells exist to exploit — with the originals
as planted nearest neighbors.

Output: /root/repo/localdata/emb1m/embeddings.parquet
"""
import duckdb, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
OUT_DIR = "/root/repo/localdata/emb1m"
COPIES = 500
OFF = 100_000_000

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
rows = con.execute(f"SELECT vec_id, embedding, label FROM '{SRC}' ORDER BY vec_id").fetchall()
base = np.array([r[1] for r in rows], dtype=np.float32)          # (2000, 64)
ids = np.array([r[0] for r in rows], dtype=np.int64)
labels = np.array([r[2] for r in rows], dtype=np.int32)

rng = np.random.default_rng(7)
n, dim = base.shape
all_ids = np.empty(n * COPIES, dtype=np.int64)
all_vecs = np.empty((n * COPIES, dim), dtype=np.float32)
all_labels = np.empty(n * COPIES, dtype=np.int32)
for c in range(COPIES):
    lo, hi = c * n, (c + 1) * n
    all_ids[lo:hi] = ids + c * OFF
    noise = rng.normal(0.0, 0.05, size=(n, dim)).astype(np.float32)
    all_vecs[lo:hi] = base + (0 if c == 0 else noise)  # copy 0 = exact originals
    all_labels[lo:hi] = labels

table = pa.table({
    "vec_id": pa.array(all_ids),
    "embedding": pa.FixedSizeListArray.from_arrays(pa.array(all_vecs.reshape(-1)), dim).cast(
        pa.list_(pa.float32())),
    "label": pa.array(all_labels),
})
pq.write_table(table, f"{OUT_DIR}/embeddings.parquet", row_group_size=122880)
print("rows:", len(all_ids), "->", f"{OUT_DIR}/embeddings.parquet")
