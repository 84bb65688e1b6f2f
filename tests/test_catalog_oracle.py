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
