"""Iterative graph analytics over edge DataFrames.

Second member of the iterative-algorithm family (the first is
``dedup.neardup_clusters``'s connected components): PageRank with a
FIXED iteration count and fixed-point integer arithmetic, so every
rank is exact int64 math — deterministic under any partitioning,
summation order, or engine, and therefore oracle-hashable. Real
deployments run to convergence with float ranks; the fixed-point form
is the same dataflow with the nondeterminism removed (documented
trade: ranks are floor-rounded at each step).

No reference analogue (the reference has no graph workloads); this is
the LLM-pipeline/web-graph tier — PageRank over a kNN graph is the
centrality signal behind graph-based quality scoring and
diversity-aware sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(
    edges: DataFrame,
    iters: int = 3,
    scale: int = PR_SCALE,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """``iters`` synchronous PageRank steps (damping 0.85 as the exact
    rational 85/100) over a directed edge list, all arithmetic in
    scaled int64: initial rank = ``scale div N`` per node, contribution
    = ``rank div out_degree``, update = ``(15·(scale div N)) div 100 +
    (85·Σcontrib) div 100``. Every division is integer floor — the
    deterministic skeleton of the float algorithm.

    Loop mechanics follow ``dedup.neardup_clusters`` (the measured
    playbook for small-latency iteration): the upstream edge pipeline
    runs ONCE into a ``localCheckpoint`` with its count riding the
    job as an ``Observation``; per-loop frames are coalesced to a
    data-sized partition count; AQE is off and shuffle partitions are
    pinned for the loop's duration (restored in ``finally`` — same
    single-threaded-driver caveat as neardup_clusters). Without this
    the loop paid ~6 s of near-empty default-width stages at sf0.1.

    Per iteration: one edges→ranks join on src, one groupBy(dst) with
    map-side partials, one node-sized left join. In-edge sums are
    bounded by total rank mass (= scale), so int64 never overflows
    regardless of graph size; ``scale`` must exceed the node count or
    initial ranks round to zero (10^12 covers any sub-trillion-node
    graph).

    Degree-0 nodes never appear in an edge list and are invisible —
    callers wanting them must union isolated ids in with self-loops
    removed. Output: (node, rank_fp int64, rank double — one final
    cast)."""
    from pyspark.sql import Observation  # noqa: PLC0415

    spark = edges.sparkSession
    edge_obs = Observation()
    e = (
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
        .observe(edge_obs, F.count(F.lit(1)).alias("n_edges"))
        .localCheckpoint()
    )
    n_edges = int(edge_obs.get["n_edges"] or 0)
    node_obs = Observation()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionAll(e.select(F.col("_dst").alias("node")))
        .distinct()
        .observe(node_obs, F.count(F.lit(1)).alias("n_nodes"))
        .localCheckpoint()
    )
    n = int(node_obs.get["n_nodes"] or 0)
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("rank_fp"),
            F.lit(0.0).alias("rank"),
        )
    base = scale // n
    teleport = (15 * base) // 100

    n_par = max(
        2,
        min(
            spark.sparkContext.defaultParallelism,
            -(-max(n_edges, n) // 500_000),
        ),
    )
    e = e.coalesce(n_par)
    nodes = nodes.coalesce(n_par)

    conf = spark.conf
    saved = {
        "spark.sql.adaptive.enabled": conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.shuffle.partitions": conf.get("spark.sql.shuffle.partitions"),
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(n_par))
        outdeg = e.groupBy("_src").agg(F.count("*").alias("_deg")).localCheckpoint()
        ranks = nodes.withColumn("rank_fp", F.lit(base).cast("long"))
        for _ in range(iters):
            contribs = (
                e.join(ranks, e["_src"] == ranks["node"])
                .join(outdeg, "_src")
                .select(
                    F.col("_dst").alias("node"),
                    F.expr("rank_fp div _deg").alias("_c"),
                )
                .groupBy("node")
                .agg(F.sum("_c").alias("_s"))
            )
            ranks = nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr("(85 * coalesce(_s, CAST(0 AS BIGINT))) div 100")
                )
                .cast("long")
                .alias("rank_fp"),
            )
        # materialize INSIDE the pinned-conf scope: the returned frame
        # must not depend on the restored session conf at action time
        ranks = ranks.localCheckpoint()
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)
    return ranks.select(
        "node",
        "rank_fp",
        (F.col("rank_fp").cast("double") / F.lit(float(scale))).alias("rank"),
    )
