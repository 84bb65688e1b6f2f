"""Every SQL-expressible catalog entry must match its DuckDB oracle —
the local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tv_event_streaming_spark.plans import CATALOG

from .oracle import compare_entry

ORACLE_ENTRIES = sorted(n for n, e in CATALOG.items() if e.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_ENTRIES)
def test_oracle_match(spark, sf_dir, name):
    ok, msg = compare_entry(spark, CATALOG[name], sf_dir)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_nonempty(spark, sf_dir, name):
    # every catalog query must return rows on the smoke SF (schema sanity
    # and the driver's rows>=0 smoke in one)
    df = CATALOG[name].build(spark, sf_dir)
    assert df.count() > 0, f"{name} returned no rows at {sf_dir}"


def test_driver_check_order_covers_risky_entries_first():
    """The round-2 driver's correctness check stopped at 50 of 56
    entries — exactly the last 6 in queries() order. The contract now
    pins the historically-unchecked entries FIRST so any bounded check
    budget always covers them."""
    import __spark_entry__ as E

    names = list(E.queries())
    assert names[:6] == [
        "simhash_signatures",
        "simhash_neardup",
        "neardup_clusters",
        "ann_cosine_lsh",
        "embedding_neardup_topk",
        "multimodal_features",
    ]
    # every catalog entry appears exactly once, and oracles cover all
    assert sorted(names) == sorted(CATALOG)
    assert set(E.oracle_sql()) == set(names)
