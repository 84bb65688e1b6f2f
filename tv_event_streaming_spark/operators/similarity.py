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
    vec: Column, dims: int, bits: int = 16, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH signature as an integer bucket id.

    The signature bit is sign(Σ_d q(vec[d])·plane[p][d]) over the
    int64-quantized components — exact integer sums, so the sign decision
    (and therefore the bucket) is bit-identical in any engine and any
    summation order. ``plane_offset`` selects a disjoint plane set so
    several independent band signatures can be derived (LSH
    OR-construction)."""
    qv = F.transform(vec, _q)

    def bit(i: int) -> Column:
        p = plane_offset + i
        signs = F.array(*[F.lit(plane_sign(p, d)).cast("long") for d in range(dims)])
        dot = F.aggregate(
            F.zip_with(qv, signs, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )

    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out + bit(i)
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
    oracle-checkable). Cell assignment is a per-row sort of the
    n_centroids cosine scores against a SINGLE-ROW broadcast holding all
    centroids as one array column — pure map-side (broadcast
    nested-loop join adds a column, not rows), NO shuffle and NO ×16 row
    blowup before the cell join; at scale the one-time
    ``repartition(cell)`` of the assigned corpus IS the IVF index build,
    and queries touch only nprobe/n_centroids of the data.
    """
    import math  # noqa: PLC0415

    cent_rows = sorted(
        embeddings.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect(),
        key=lambda r: r[0],
    )
    # centroids travel as ONE broadcast row of array<struct> (data), NOT
    # as literal arrays in the plan — a 16×64-literal expression tree
    # costs seconds of analyzer time on every fresh plan. Components
    # quantize driver-side with the same floor(x·1e6) the column path
    # uses, norms precomputed exactly.
    spark = embeddings.sparkSession
    cents_row = spark.createDataFrame(
        [
            (
                [
                    (int(r[0]), qc, sum(q * q for q in qc))
                    for r in cent_rows
                    for qc in [[int(math.floor(float(x) * QUANT)) for x in r[1]]]
                ],
            )
        ],
        "_cents array<struct<cent_id:bigint,qcvec:array<bigint>,cnormsq:bigint>>",
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

    def cent_cos(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(F.col("_qv"), c["qcvec"], lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).cast("double") / F.sqrt(
            F.col("_nv").cast("double") * c["cnormsq"].cast("double")
        )

    # per-row: score all centroids, sort (cos desc, cent_id asc) map-side
    ordered = F.array_sort(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                cent_cos(c).alias("ccos"), c["cent_id"].alias("cent_id")
            ),
        ),
        lambda a, b: F.when(a["ccos"] > b["ccos"], F.lit(-1))
        .when(a["ccos"] < b["ccos"], F.lit(1))
        .otherwise((a["cent_id"] - b["cent_id"]).cast("int")),
    )
    ranked = staged.crossJoin(F.broadcast(cents_row)).select(
        id_col, vec_col, "_nv", ordered.alias("_ordered")
    )
    assign = ranked.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        F.element_at("_ordered", 1)["cent_id"].alias("cell"),
        F.col("_nv").alias("cnorm"),
    )
    probes = (
        ranked.filter(query_filter)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("_nv").alias("qnorm"),
            F.explode(F.slice("_ordered", 1, nprobe)).alias("_probe"),
        )
        .select("query_id", "qvec", F.col("_probe")["cent_id"].alias("cell"), "qnorm")
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


def allpairs_cosine_lsh(
    embeddings: DataFrame,
    bands: int = 4,
    bits_per_band: int = 8,
    dims: int = 64,
    threshold: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine over LSH candidates — fully distributed, no
    driver-side collect and no global broadcast.

    Candidate generation is the LSH OR-construction: ``bands``
    independent hyperplane signatures (disjoint plane sets); two vectors
    are candidates iff they share at least one band's bucket. Scoring is
    a per-bucket int64 block matmul inside ``applyInPandas`` — one
    vectorized multiply per (band, bucket) group instead of millions of
    interpreted per-pair expressions, and the group is the ONLY unit that
    must fit in worker memory (bucket size, not corpus size). A pair
    sharing several bands is scored identically in each (exact integer
    arithmetic ⇒ bit-identical doubles), so the final ``distinct`` keeps
    one row.

    Shuffle profile: one hash-partition of (corpus × bands) rows on
    (band, bucket) + one distinct on emitted pairs — both linear in
    candidates, never O(N²). Skewed (hot) buckets split across more
    bands/bits; at 100 TB raise ``bits_per_band`` so buckets stay small.

    Exactness contract (matches the DuckDB oracle bit-for-bit): component
    quantization floor(double(x)·1e6) → int64, exact integer dot/norm,
    ONE final double division.
    """
    sig = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        F.array(
            *[
                hyperplane_signature(
                    F.col(vec_col), dims, bits_per_band, plane_offset=b * bits_per_band
                )
                for b in range(bands)
            ]
        ).alias("_buckets"),
    )
    exploded = sig.select(
        id_col,
        vec_col,
        F.posexplode("_buckets").alias("band", "bucket"),
    )

    quant = QUANT
    thr = threshold
    idc, vecc = id_col, vec_col

    def score_group(pdf):
        import numpy as _np  # noqa: PLC0415
        import pandas as _pd  # noqa: PLC0415

        ids = pdf[idc].to_numpy()
        mat = _np.floor(
            _np.stack(pdf[vecc].to_numpy()).astype(_np.float64) * quant
        ).astype(_np.int64)
        norms = (mat * mat).sum(axis=1)
        dots = mat @ mat.T  # exact int64
        cos = dots.astype(_np.float64) / _np.sqrt(
            norms.astype(_np.float64)[:, None] * norms.astype(_np.float64)[None, :]
        )
        lo = ids[:, None] < ids[None, :]  # a < b, no self-pairs
        mask = lo if thr is None else (lo & (cos >= thr))
        ai, bi = _np.nonzero(mask)
        return _pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bi], "cos_sim": cos[ai, bi]}
        )

    pairs = exploded.groupBy("band", "bucket").applyInPandas(
        score_group, schema="id_a bigint, id_b bigint, cos_sim double"
    )
    return pairs.distinct()


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    bands: int = 4,
    bits_per_band: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos ≥ threshold, a<b) over LSH
    candidates — the threshold form of :func:`allpairs_cosine_lsh`.

    Near-identical vectors agree on every signature bit (a scaled or
    lightly-perturbed copy flips no hyperplane sign), so recall at
    near-dup thresholds is governed by the OR-construction across
    ``bands`` disjoint plane sets. No O(N²) path: candidates only."""
    return allpairs_cosine_lsh(
        embeddings,
        bands=bands,
        bits_per_band=bits_per_band,
        dims=dims,
        threshold=threshold,
        id_col=id_col,
        vec_col=vec_col,
    )
