#!/usr/bin/env python3
"""Generate an sf10-equivalent documents corpus for dedup-at-scale probes
(measurement tooling — NOT part of the graft library).

100 re-keyed copies of sf0.1 documents (5k -> 500k rows). Unlike gen_sf1
(which keeps text identical across copies, creating an artificial N-way
exact-duplicate cluster for EVERY doc), this mutates 98% of rows with a
seeded per-copy word shuffle — destroying shingle overlap so they are
genuinely distinct — and plants the remaining 2% (doc_id % 50 == 0) as
cross-copy NEAR-duplicates (original text + a copy tag), i.e. ~100 heavy
100-way clusters in a mostly-unique corpus: the skew shape a real crawl
has, and the one the banding shuffle's bucket caps exist for.

Output: /root/repo/localdata/sf10docs/documents.parquet
"""
import duckdb, os, random
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"
OUT_DIR = "/root/repo/localdata/sf10docs"
COPIES = 100
OFF = 100_000_000

os.makedirs(OUT_DIR, exist_ok=True)
con = duckdb.connect()
base = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars FROM '{SRC}' ORDER BY doc_id").fetchall()

ids, texts, langs, sources, nchars = [], [], [], [], []
for i in range(COPIES):
    rng = random.Random(1000 + i)
    for (doc_id, text, lang, source, n) in base:
        new_id = doc_id + i * OFF
        if doc_id % 50 == 0:
            # planted near-duplicate cluster: same text, tiny per-copy tail
            new_text = text + f" c{i}"
        else:
            words = text.split(" ")
            rng.shuffle(words)
            new_text = " ".join(words)
        ids.append(new_id); texts.append(new_text)
        langs.append(lang); sources.append(source); nchars.append(len(new_text))

table = pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
    "n_chars": pa.array(nchars, pa.int64()),
})
pq.write_table(table, f"{OUT_DIR}/documents.parquet", row_group_size=122880)
print("rows:", len(ids), "->", f"{OUT_DIR}/documents.parquet")
