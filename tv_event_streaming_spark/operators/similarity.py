"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **Brute-force cosine top-k** — the correctness baseline: query set ×
  corpus, JVM-side ``zip_with``/``aggregate`` dot products, per-query
  ``row_number`` top-k. O(|Q|·N); right when |Q| is small or as the
  re-rank stage.
- **Random-hyperplane LSH buckets** — the scale path: 16-bit signatures
  from deterministic (xxhash64-derived) hyperplanes; candidates share a
  bucket, then exact re-rank. Sub-linear candidate generation; recall
  tunable with bands/bits.

Determinism contract: dot products quantize each component to an int64
(floor(x·1e6)) so sums are exact integer arithmetic — bit-identical in
any engine and any summation order. Cosines derived from those integers
in double are then deterministic too (see plans/datapipe.py oracles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

QUANT = 1_000_000


def _q(x: Column) -> Column:
    """Quantize a float component to int64: floor(double(x)·1e6)."""
    return F.floor(x.cast("double") * QUANT).cast("long")


def quantized_dot(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _q(x) * _q(y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: _q(x) * _q(x)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: queries (filtered subset) × corpus.

    The query side is broadcast (it's small by construction); the corpus
    never shuffles. Ranking ties break on neighbor id for determinism.
    """
    q = embeddings.filter(query_filter).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        quantized_norm_sq(F.col(vec_col)).alias("cnorm"),
    )
    pairs = F.broadcast(q.withColumn("qnorm", quantized_norm_sq(F.col("qvec")))).join(
        c, F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            quantized_dot(F.col("qvec"), F.col("cvec")).cast("double")
            / F.sqrt(F.col("qnorm").cast("double") * F.col("cnorm").cast("double"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def plane_sign(p: int, d: int) -> int:
    """±1 component of hyperplane p at dimension d — a fixed integer
    mixing formula evaluated at PLAN BUILD time (python ints), so the
    identical pattern can be embedded in the DuckDB-oracle SQL. No
    driver-side randomness ships to executors; no per-row hashing."""
    return 1 if ((p * 2654435761 + d * 40503 + 12345) >> 7) % 2 == 0 else -1


def hyperplane_signature(
    vec: Column, dims: int, bits: int = 16
) -> Column:
    """Random-hyperplane LSH signature as an integer bucket id.

    The signature bit is sign(Σ_d q(vec[d])·plane[p][d]) over the
    int64-quantized components — exact integer sums, so the sign decision
    (and therefore the bucket) is bit-identical in any engine and any
    summation order."""
    qv = F.transform(vec, _q)

    def bit(p: int) -> Column:
        signs = F.array(*[F.lit(plane_sign(p, d)).cast("long") for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(qv, signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for p in range(bits):
        out = out + bit(p)
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    dims: int = 64,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: signature equi-join generates candidates, exact
    quantized cosine re-ranks. Approximate — recall depends on bits; at
    scale, add multi-probe or repeat with several signature seeds."""
    sig = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_signature(F.col(vec_col), dims, bits).alias("bucket"),
    )
    q = sig.filter(query_filter).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket"),
    )
    c = sig.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("bucket"),
    )
    pairs = F.broadcast(q).join(c, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (
            quantized_dot(F.col("qvec"), F.col("cvec")).cast("double")
            / F.sqrt(
                quantized_norm_sq(F.col("qvec")).cast("double")
                * quantized_norm_sq(F.col("cvec")).cast("double")
            )
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_filter: Column,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into centroid cells,
    probe only the ``nprobe`` nearest cells per query, exact-rank inside.

    Centroids are the vectors with id < ``n_centroids`` — a deterministic
    seed assignment (production would refine with k-means rounds; the
    cell/probe/re-rank machinery is identical and this keeps the operator
    oracle-checkable). Cell assignment is a per-row argmax over a literal
    centroid array — pure map-side, NO shuffle of the corpus; at scale the
    one-time ``repartition(cell)`` of the assigned corpus IS the IVF
    index build, and queries touch only nprobe/n_centroids of the data.
    """
    import math  # noqa: PLC0415

    cent_rows = sorted(
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect(),
        key=lambda r: r[0],
    )
    # centroids travel as a broadcast DataFrame (data), NOT as literal
    # arrays in the plan — a 16×64-literal expression tree costs seconds
    # of analyzer time on every fresh plan. Components quantize
    # driver-side with the same floor(x·1e6) the column path uses, norms
    # precomputed exactly.
    spark = embeddings.sparkSession
    cents_df = spark.createDataFrame(
        [
            (int(r[0]), qc, sum(q * q for q in qc))
            for r in cent_rows
            for qc in [[int(math.floor(float(x) * QUANT)) for x in r[1]]]
        ],
        "cent_id long, qcvec array<bigint>, cnormsq bigint",
    )

    staged = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.transform(F.col(vec_col), _q).alias("_qv"),
    ).withColumn(
        "_nv",
        F.aggregate(
            F.transform(F.col("_qv"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    ccos = (
        F.aggregate(
            F.zip_with(F.col("_qv"), F.col("qcvec"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.sqrt(F.col("_nv").cast("double") * F.col("cnormsq").cast("double"))
    )
    ranked = (
        staged.crossJoin(F.broadcast(cents_df))
        .select(id_col, vec_col, "_nv", "cent_id", ccos.alias("_ccos"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(F.desc("_ccos"), "cent_id")
            ),
        )
    )
    assign = ranked.filter(F.col("_rn") == 1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.col("cent_id").alias("cell"),
        F.col("_nv").alias("cnorm"),
    )
    probes = ranked.filter(query_filter & (F.col("_rn") <= nprobe)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col("cent_id").alias("cell"),
        F.col("_nv").alias("qnorm"),
    )
    cands = F.broadcast(probes).join(assign, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        (
            quantized_dot(F.col("qvec"), F.col("cvec")).cast("double")
            / F.sqrt(F.col("qnorm").cast("double") * F.col("cnorm").cast("double"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"), "cos_sim")
    )


def allpairs_cosine_blockwise(
    embeddings: DataFrame,
    per_row_k: int | None = None,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine via int64 block matrix products (the fast exact
    path for pairwise similarity).

    The quantized corpus matrix is broadcast to every executor; each
    partition multiplies its block against it with a single integer
    matmul (Arrow in, numpy BLAS-shaped loop out) instead of millions of
    interpreted per-pair expressions. Emits pairs (id_a < id_b) filtered
    to ``threshold`` and/or per-row top-k (a superset of the global
    top-k: every global-top pair appears in its lower id's row list).

    Exactness: quantization (floor(double(x)·1e6) → int64) and the
    int64 matmul are exact; the final cosine double matches the SQL
    oracle bit-for-bit because the op sequence is identical.

    Scale: the broadcast side must fit in executor memory (~1 GB per
    million 64-dim vectors quantized) — beyond that, switch candidate
    generation to :func:`cosine_topk_lsh` buckets and keep this as the
    per-bucket scorer.
    """
    import numpy as np  # noqa: PLC0415

    spark = embeddings.sparkSession
    corpus_pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = corpus_pdf[id_col].to_numpy()
    mat = np.floor(
        np.stack(corpus_pdf[vec_col].to_numpy()).astype(np.float64) * QUANT
    ).astype(np.int64)
    norms = (mat * mat).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = f"id_a bigint, id_b bigint, cos_sim double"

    def run(batches):
        import numpy as _np  # noqa: PLC0415
        import pandas as _pd  # noqa: PLC0415

        c_ids, c_mat, c_norms = bc.value
        for pdf in batches:
            q_ids = pdf[id_col].to_numpy()
            q_mat = _np.floor(
                _np.stack(pdf[vec_col].to_numpy()).astype(_np.float64) * QUANT
            ).astype(_np.int64)
            q_norms = (q_mat * q_mat).sum(axis=1)
            dots = q_mat @ c_mat.T  # exact int64
            cos = dots.astype(_np.float64) / _np.sqrt(
                q_norms.astype(_np.float64)[:, None] * c_norms.astype(_np.float64)[None, :]
            )
            rows_a, rows_b, rows_c = [], [], []
            for i, qa in enumerate(q_ids):
                mask = c_ids > qa  # a < b, no self-pairs
                if threshold is not None:
                    mask = mask & (cos[i] >= threshold)
                cand_ids, cand_cos = c_ids[mask], cos[i][mask]
                if per_row_k is not None and len(cand_ids) > per_row_k:
                    top = _np.argsort(-cand_cos, kind="stable")[:per_row_k]
                    cand_ids, cand_cos = cand_ids[top], cand_cos[top]
                rows_a.extend([qa] * len(cand_ids))
                rows_b.extend(cand_ids.tolist())
                rows_c.extend(cand_cos.tolist())
            yield _pd.DataFrame({"id_a": rows_a, "id_b": rows_b, "cos_sim": rows_c})

    return embeddings.select(id_col, vec_col).mapInPandas(run, schema=out_schema)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold, a<b). Brute-force
    form; at scale swap candidate generation for the LSH buckets above."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        quantized_norm_sq(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        quantized_norm_sq(F.col(vec_col)).alias("nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        (
            quantized_dot(F.col("va"), F.col("vb")).cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double"))
        ).alias("cos_sim"),
    ).filter(F.col("cos_sim") >= threshold)
