#!/usr/bin/env python3
"""Build an sf1-scale replica of sf0.1 in /tmp for scale rehearsals.

Replicates documents/embeddings/events R times with id remapping
(id' = id + rep * stride). Document texts get a short per-replica
prefix so replicas are not byte-identical (exact dedup stays
meaningful); the prefix is < 3 tokens on ~60-token docs, so each
original's replica group remains a NEAR-duplicate cluster — a heavy
but linearly-bounded duplicate mass, which is exactly the stress a
dedup rehearsal wants. Embedding vectors are kept as-is (ids remapped)
so ANN cell structure is preserved at 10x the point count.

Usage: python3 tools/make_big_sf.py [R] [outDir]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

R = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
SRC = "/root/testdata/sf0.1"
STRIDE = 1_000_000

import os
os.makedirs(OUT, exist_ok=True)

docs = pq.read_table(f"{SRC}/documents.parquet")
parts = []
for r in range(R):
    t = docs
    if r > 0:
        pre = pc.binary_join_element_wise(
            pa.array([f"v{r}x" for _ in range(t.num_rows)]),
            pc.cast(t.column("doc_id"), pa.string()),
            t.column("text").combine_chunks(), " ")
        t = t.set_column(t.schema.get_field_index("text"), "text", pre)
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pc.cast(pc.utf8_length(pre), pa.int64()))
    t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                     pc.add(t.column("doc_id"), r * STRIDE))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{OUT}/documents.parquet")
print("documents", R * docs.num_rows)

emb = pq.read_table(f"{SRC}/embeddings.parquet")
parts = []
for r in range(R):
    t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                       pc.add(emb.column("vec_id"), r * STRIDE))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{OUT}/embeddings.parquet")
print("embeddings", R * emb.num_rows)

ev = pq.read_table(f"{SRC}/events.parquet")
parts = []
for r in range(R):
    t = ev
    for c in ("event_id", "user_id"):
        t = t.set_column(t.schema.get_field_index(c), c,
                         pc.add(t.column(c), r * STRIDE))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet")
print("events", R * ev.num_rows)

# remaining gate tables: symlink the sf0.1 originals so Verify's other
# table reads resolve (they are not part of the scale rehearsal)
for t in "region nation customer supplier part orders lineitem".split():
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)
print("done ->", OUT)
