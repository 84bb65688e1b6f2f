#!/usr/bin/env python3
"""Generate a LARGER synthetic documents+embeddings corpus matching the
testdata generator's distributions, for scaling-slope measurement
(SCALE.md §6e): the shipped testdata spans only one decade of
documents rows (500 → 5 000), so slope exponents fitted on it are
overhead-dominated; this adds decades above sf0.1 with INDEPENDENT
content (fresh PRNG per doc — realistic near-dup rates, not a
replicated corpus whose every row is a near-duplicate).

Distributions mirrored from sf0.1 (checked via DuckDB): text = 10–100
uniform draws from the base corpus' word vocabulary, lang/source drawn
from the base corpus' observed sets, n_chars = len(text); embeddings =
64-dim standard-normal float32, label uniform 0–9. Every OTHER table is
copied from the base sf dir so CATALOG entries resolve all inputs.

Run: python tools/gen_scale_corpus.py OUT_DIR N_DOCS N_VECS [BASE_SF_DIR]
Deterministic for a given (N_DOCS, N_VECS).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]


def generate(out_dir: str, n_docs: int, n_vecs: int, base: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    vocab = [
        r[0]
        for r in con.sql(
            "select distinct unnest(string_split(text, ' ')) w "
            f"from '{base}/documents.parquet' order by w"
        ).fetchall()
    ]
    langs = [
        r[0]
        for r in con.sql(
            f"select distinct lang from '{base}/documents.parquet' order by 1"
        ).fetchall()
    ]
    sources = [
        r[0]
        for r in con.sql(
            f"select distinct source from '{base}/documents.parquet' order by 1"
        ).fetchall()
    ]

    rng = np.random.default_rng(20260814)
    lengths = rng.integers(10, 101, size=n_docs)
    # one vocab->ndarray conversion, not one per document (500k docs
    # would re-wrap the list 500k times); draws stay per-doc so the
    # stream of random values (and thus the corpus) is unchanged
    vocab_arr = np.array(vocab)
    texts = [
        " ".join(rng.choice(vocab_arr, size=int(n)).tolist()) for n in lengths
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(rng.choice(langs, size=n_docs).tolist(), pa.string()),
            "source": pa.array(
                rng.choice(sources, size=n_docs).tolist(), pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    # bounded row groups so a multi-million-row file still scans wide
    # (one default-size row group = one Spark task for the whole file)
    pq.write_table(
        docs,
        os.path.join(out_dir, "documents.parquet"),
        row_group_size=min(262_144, n_docs),
    )

    vecs = rng.standard_normal((n_vecs, 64)).astype(np.float32)
    # vectorized list<float> construction (2 M python sublists took
    # minutes and GBs; offsets+values is one copy)
    offsets = pa.array(np.arange(0, (n_vecs + 1) * 64, 64, dtype=np.int32))
    emb_col = pa.ListArray.from_arrays(offsets, pa.array(vecs.reshape(-1)))
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": emb_col,
            "label": pa.array(
                rng.integers(0, 10, size=n_vecs).tolist(), pa.int32()
            ),
        }
    )
    # bounded row groups, same reason as documents: parquet splits at
    # ROW-GROUP granularity, so a single-group file scans as ONE Spark
    # task no matter how many cores exist — which silently serialized
    # every map-side encode chain on the r7-era single-group embeddings
    # (found round 8: d100 PQ walls were ~1-task-bound)
    pq.write_table(
        emb,
        os.path.join(out_dir, "embeddings.parquet"),
        row_group_size=min(32_768, n_vecs),
    )

    for t in TABLES:
        src = os.path.join(base, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    print(f"wrote {n_docs} docs / {n_vecs} vecs to {out_dir}")


if __name__ == "__main__":
    out = sys.argv[1]
    n_docs = int(sys.argv[2])
    n_vecs = int(sys.argv[3])
    base = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    generate(out, n_docs, n_vecs, base)
