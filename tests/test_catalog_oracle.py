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
    """The driver's correctness budget is bounded (50 entries in rounds
    2-3), so queries() must order risk-first: never-driver-green or
    stale-evidence entries before anything else, then ascending by
    last-green round so a cutoff always drops the freshest evidence."""
    import __spark_entry__ as E

    names = list(E.queries())
    green = E._last_green()

    def risk(n):
        if n not in green or n in E._TOUCHED_SINCE_GREEN:
            return 0
        return green[n]

    risks = [risk(n) for n in names]
    assert risks == sorted(risks), (
        "queries() is not ordered by ascending risk tier: "
        + str([(n, r) for n, r in zip(names, risks)])
    )
    # every never-green/stale entry sits inside the first 50 (the
    # observed driver budget)
    risky = [n for n in CATALOG if risk(n) == 0]
    assert all(names.index(n) < 50 for n in risky), risky
    # every catalog entry appears exactly once, and oracles cover all
    assert sorted(names) == sorted(CATALOG)
    assert set(E.oracle_sql()) == set(names)
