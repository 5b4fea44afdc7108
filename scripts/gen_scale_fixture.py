#!/usr/bin/env python3
"""Seeded synthetic scale fixture generator (r9 verdict item 4).

Inflates the sf0.1 embeddings/documents tables by an integer factor so
the headline families' time-vs-rows curve can be MEASURED instead of
argued. Replica 0 is the original data byte-for-byte; replica i > 0
gets offset ids plus a deterministic per-replica perturbation chosen to
keep PER-ROW workload difficulty constant as rows grow:

- embeddings: i.i.d. uniform(-0.05, 0.05) float32 noise per dimension
  (seeded by replica), so replicas are near but not identical — no
  degenerate zero-distance mass, scan cost per row unchanged. Labels
  copy over, so filtered-query selectivity is scale-invariant.
- documents: per-document seeded word-order shuffle, so shingle /
  MinHash / winnowing similarity across replicas is broken — candidate
  volume scales ~linearly with rows instead of quadratically in the
  replica count (duplicating text verbatim would measure the dedup
  family against a 100x-denser near-dup graph, a different workload,
  not a bigger one).

Query ids (vec_id/doc_id < 8 etc.) stay the original low ids: the
serving contract is a FIXED query batch against a GROWING corpus.

Usage: python3 scripts/gen_scale_fixture.py <mult> [outDir] [tables] [verbatim_frac]
Writes <outDir>/{embeddings,documents}.parquet
(default /tmp/graft_scale_<mult>x). `tables` = both (default) |
embeddings | documents — the 1000x vector-family sweep needs no 5M-doc
text table. `verbatim_frac` (documents only, default 0): fraction of
replicas that copy text VERBATIM instead of shuffled — the
boilerplate-heavy-crawl profile (r13 verdict item 2: the dedup band
join's quadratic term lives in verbatim clouds; a fixture with 0
verbatim dups cannot measure the collapse mitigation). Data is
generated, never committed.
"""
import os, sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
ID_STRIDE = 10_000_000  # replica id offset — far above any real id


def gen(mult: int, out: str, tables: str = "both",
        verbatim_frac: float = 0.0) -> None:
    os.makedirs(out, exist_ok=True)
    if tables in ("both", "embeddings"):
        gen_embeddings(mult, out)
    if tables in ("both", "documents"):
        gen_documents(mult, out, verbatim_frac)


def gen_embeddings(mult: int, out: str) -> None:
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = emb["vec_id"].to_numpy()
    label = emb["label"].to_numpy()
    mat = np.vstack(emb["embedding"].to_pandas().to_numpy()).astype(np.float32)
    n, d = mat.shape
    parts_e = []
    for i in range(mult):
        if i == 0:
            parts_e.append(emb)
            continue
        rng = np.random.default_rng(42_000 + i)
        noise = rng.uniform(-0.05, 0.05, size=(n, d)).astype(np.float32)
        m = mat + noise
        parts_e.append(pa.table({
            "vec_id": pa.array(vec_id + i * ID_STRIDE, type=pa.int64()),
            "embedding": pa.array(list(m), type=pa.list_(pa.float32())),
            "label": pa.array(label, type=pa.int32()),
        }))
    pq.write_table(pa.concat_tables(parts_e, promote_options="default"),
                   f"{out}/embeddings.parquet")
    print(f"[fixture] {out}: embeddings={emb.num_rows * mult}")


def gen_documents(mult: int, out: str, verbatim_frac: float = 0.0) -> None:
    doc = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = doc["doc_id"].to_numpy()
    texts = doc["text"].to_pylist()
    lang, source = doc["lang"], doc["source"]
    parts_d = [doc]
    # replicas 1..ceil(mult*frac) copy verbatim (boilerplate clouds of
    # that size, replica 0 included); the rest are per-doc shuffles
    n_verbatim = int(round((mult - 1) * verbatim_frac))
    for i in range(1, mult):
        if i <= n_verbatim:
            new_texts = texts
        else:
            rng = np.random.default_rng(43_000 + i)
            shuffled = []
            for t in texts:
                w = (t or "").split()
                rng.shuffle(w)
                shuffled.append(" ".join(w))
            new_texts = shuffled
        parts_d.append(pa.table({
            "doc_id": pa.array(doc_id + i * ID_STRIDE, type=pa.int64()),
            "text": pa.array(new_texts, type=pa.string()),
            "lang": lang,
            "source": source,
            "n_chars": pa.array([len(s) for s in new_texts], type=pa.int64()),
        }))
    pq.write_table(pa.concat_tables(parts_d, promote_options="default"),
                   f"{out}/documents.parquet")
    print(f"[fixture] {out}: documents={len(texts) * mult} "
          f"(verbatim replicas per doc: {n_verbatim + 1})")


if __name__ == "__main__":
    mult = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/graft_scale_{mult}x"
    tables = sys.argv[3] if len(sys.argv) > 3 else "both"
    frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    gen(mult, out, tables, frac)
