"""Fixed-point PageRank: hand-computed reference on a known graph,
mass bounds, and determinism."""

from __future__ import annotations

from tv_event_streaming_spark.operators.graph import PR_SCALE, pagerank_fixedpoint


def _py_pagerank(edges, iters, scale=PR_SCALE):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    base = scale // n
    teleport = (15 * base) // 100
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    rank = {v: base for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {v: teleport + (85 * s[v]) // 100 for v in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src_id long, dst_id long")
    got = {
        r.node: r.rank_fp for r in pagerank_fixedpoint(df, iters=3).collect()
    }
    assert got == _py_pagerank(edges, iters=3)


def test_pagerank_sink_accumulates_rank(spark):
    # a pure sink (node 3 above) must outrank a pure source (node 4)
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, "src_id long, dst_id long")
    got = {r.node: r.rank_fp for r in pagerank_fixedpoint(df, iters=3).collect()}
    assert got[3] > got[4]


def test_pagerank_mass_is_bounded(spark):
    df = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src_id long, dst_id long"
    )
    rows = pagerank_fixedpoint(df, iters=3).collect()
    total = sum(r.rank_fp for r in rows)
    # floor rounding only ever loses mass; a ring loses almost none
    assert 0.9 * PR_SCALE < total <= PR_SCALE


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src_id long, dst_id long")
    assert pagerank_fixedpoint(df, iters=3).count() == 0


def test_pagerank_restores_session_conf(spark):
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    parts = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.createDataFrame([(1, 2), (2, 1)], "src_id long, dst_id long")
    pagerank_fixedpoint(df, iters=2).collect()
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == parts
