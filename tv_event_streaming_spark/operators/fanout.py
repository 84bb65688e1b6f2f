"""Scale-adaptive scan fan-out (optimization guide §2.5 "input skew" /
§6 input-split sizing).

The engine's test parquet tables are single-row-group files, and a
single row group is the minimum parquet split granularity — so every
scan plans as ONE task no matter how many cores the session has, and
every deliberately "zero-shuffle, map-side" operator (HOF token folds,
Arrow matmul kernels) runs its CPU-heavy stage on 1 of N cores. A few
operators (minhash/simhash signatures, the LSH pair stages) already
repartition explicitly; this module makes that idiom reusable and
SCALE-ADAPTIVE: the repartition happens only when the input's estimated
scan parallelism is below the session's core count, so on a real
cluster reading properly-sized files (or any remote filesystem) the
helper is a no-op and the map-side operators keep their zero-shuffle
plans.

The estimate is driver-side metadata only (file listing + local file
sizes vs ``spark.sql.files.maxPartitionBytes``): no Spark job, no
``df.rdd`` materialization (which would force physical planning and,
under AQE, can execute upstream stages). Inputs whose bytes cannot be
stat'ed locally (hdfs://, s3a://, in-memory frames) are assumed to
parallelize — exactly the regime where fan-out is unnecessary.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SIZE_SUFFIX = {
    "b": 1,
    "k": 1 << 10,
    "kb": 1 << 10,
    "m": 1 << 20,
    "mb": 1 << 20,
    "g": 1 << 30,
    "gb": 1 << 30,
}


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ('134217728b', '128m', '1g')."""
    s = v.strip().lower()
    num = s.rstrip("kmgb")
    suffix = s[len(num) :] or "b"
    return int(float(num) * _SIZE_SUFFIX.get(suffix, 1))


def _local_input_bytes(df: DataFrame) -> int | None:
    """Total bytes of the frame's input files when ALL of them are
    stat-able local files; None otherwise (remote storage or no file
    sources — the caller must then assume the scan parallelizes)."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — estimation only, never fail a plan
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        if uri.startswith("file:"):
            path = uri[5:]
            while path.startswith("//"):  # file:///p and file://host/p forms
                path = path[1:]
        elif uri.startswith("/"):
            path = uri
        else:
            return None
        try:
            total += os.path.getsize(path)
        except OSError:
            return None
    return total


def estimated_scan_tasks(df: DataFrame) -> int | None:
    """Estimated number of scan tasks Spark will plan for ``df``'s file
    sources: ceil(total_bytes / maxPartitionBytes). None when unknowable
    (remote/in-memory inputs). The estimate IGNORES row-group boundaries,
    which only ever makes it an over-estimate of real parallelism for
    small files — i.e. when it says "too few tasks" it is right, and for
    our single-row-group test tables it is exact."""
    total = _local_input_bytes(df)
    if total is None:
        return None
    conf = df.sparkSession.conf
    try:
        mpb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:  # noqa: BLE001
        mpb = 128 << 20
    return max(1, -(-total // mpb))


def fan_out_scan(df: DataFrame, *keys: str | Column) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism — but ONLY
    when its scan would otherwise run in fewer tasks than cores.

    Use immediately before a CPU-heavy map-side stage (HOF folds, Arrow
    kernels) whose input is a raw table scan. ``keys`` (required — a
    keyless round-robin repartition pays a local sort and is
    retry-unsafe per SPARK-38388) should be the column the next shuffle
    groups on, so the exchange this inserts is one a downstream
    groupBy/join can reuse.

    Scale behavior: on inputs whose estimated scan parallelism is at or
    above ``defaultParallelism`` — or whose size cannot be cheaply
    determined (remote storage) — the frame is returned UNCHANGED, so
    cluster plans keep their shape and the helper can never add a
    shuffle at scale.

    A STRING key naming a column the frame does not have also makes the
    helper a no-op (ADVICE r12): generic operators hardcode their
    domain's id column ('doc_id', 'event_id'), and a caller feeding a
    differently-shaped frame should lose the fan-out, not gain an
    AnalysisException that only reproduces in the unsplittable-local-
    file regime where the fan fires. Column-object keys can't be
    checked this way and are passed through to the analyzer as before.
    """
    if not keys:
        raise ValueError("fan_out_scan requires at least one partition key")
    if any(isinstance(k, str) and k not in df.columns for k in keys):
        return df
    sc = df.sparkSession.sparkContext
    n_par = sc.defaultParallelism
    est = estimated_scan_tasks(df)
    if est is None or est >= n_par:
        return df
    cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    return df.repartition(n_par, *cols)
