"""Generate a synthetic sf1-scale extension of the driver's sf0.1
testdata, for overhead-scaling measurements only (SCALE.md).

The driver's generator tops out at sf0.1 (TESTDATA.md); this builds a
10x dataset at ``/tmp/sf1_synth`` with the same schemas so the bench's
Spark-vs-DuckDB comparison can be repeated at 10x scale:

- ``lineitem``/``orders``/``events``: 10 stacked copies of sf0.1 with
  key offsets (value distributions identical — fine for scan/agg
  queries like q1).
- ``documents``: regenerated at 10x row count with a seeded
  zipf-ish vocabulary, matching sf0.1's length distribution and an
  injected ~8% near/exact-dup rate — stacking copies would have made
  every doc a 10-way duplicate and quadratically exploded the dedup
  pair queries instead of scaling them.
- ``embeddings``: regenerated at 10x with seeded unit vectors.
- small dims (``region`` .. ``supplier``): copied as-is.

Deterministic (seed 1337). Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(1337)

    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    # -- stacked fact tables ------------------------------------------------
    for t, key_cols in (("lineitem", ["l_orderkey"]),
                        ("orders", ["o_orderkey"]),
                        ("events", ["event_id"])):
        src = pq.read_table(f"{SRC}/{t}.parquet")
        copies = []
        for k in range(10):
            tbl = src
            for kc in key_cols:
                if kc in tbl.column_names:
                    col = tbl[kc]
                    off = pa.compute.add(
                        col, pa.scalar(k * 10_000_000,
                                       type=col.type))
                    tbl = tbl.set_column(
                        tbl.column_names.index(kc), kc, off)
            copies.append(tbl)
        pq.write_table(pa.concat_tables(copies), f"{out}/{t}.parquet")
        print(f"{t}: {sum(len(c) for c in copies)} rows")

    # -- documents: regenerate at 10x --------------------------------------
    src_docs = pq.read_table(f"{SRC}/documents.parquet")
    n = len(src_docs) * 10
    lens = rng.choice(
        src_docs["text"].to_pandas().str.split().str.len().to_numpy(), n)
    langs = rng.choice(src_docs["lang"].to_pandas().to_numpy(), n)
    vocab = np.array([f"w{i:05d}" for i in range(20_000)])
    # zipf-ish: token ranks ~ 1/(r+2)
    probs = 1.0 / (np.arange(20_000) + 2.0)
    probs /= probs.sum()
    texts = []
    for i in range(n):
        L = max(1, int(lens[i]))
        toks = vocab[rng.choice(20_000, L, p=probs)]
        texts.append(" ".join(toks))
    # inject ~8% duplicates: 5% exact, 3% near (one token appended)
    n_exact, n_near = int(n * 0.05), int(n * 0.03)
    dup_src = rng.choice(n - n_exact - n_near, n_exact + n_near,
                         replace=False)
    pos = n - n_exact - n_near
    for j, s in enumerate(dup_src):
        texts[pos + j] = texts[s] if j < n_exact else \
            texts[s] + " wdup"
    schema_names = src_docs.column_names
    cols = {
        "doc_id": pa.array(np.arange(n, dtype="int64")),
        "lang": pa.array(langs),
        "text": pa.array(texts),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype="int64")),
    }
    # carry any extra source columns with resampled values
    for name in schema_names:
        if name not in cols:
            vals = src_docs[name].to_pandas().to_numpy()
            cols[name] = pa.array(rng.choice(vals, n),
                                  type=src_docs[name].type)
    pq.write_table(
        pa.table({k: cols[k] for k in schema_names}),
        f"{out}/documents.parquet")
    print(f"documents: {n} rows")

    # -- embeddings: regenerate at 10x -------------------------------------
    src_emb = pq.read_table(f"{SRC}/embeddings.parquet")
    dim = len(src_emb["embedding"][0])
    m = len(src_emb) * 10
    vecs = rng.normal(size=(m, dim)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb_cols = {}
    for name in src_emb.column_names:
        if name == "embedding":
            emb_cols[name] = pa.array(list(vecs),
                                      type=src_emb[name].type)
        elif name in ("vec_id", "doc_id"):
            emb_cols[name] = pa.array(np.arange(m, dtype="int64"))
        else:
            vals = src_emb[name].to_pandas().to_numpy()
            emb_cols[name] = pa.array(rng.choice(vals, m),
                                      type=src_emb[name].type)
    pq.write_table(pa.table(emb_cols), f"{out}/embeddings.parquet")
    print(f"embeddings: {m} rows (dim {dim})")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
