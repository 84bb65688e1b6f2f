"""The DataFrame domain derivations and their SQL twins (DOMAIN_CTES)
must stay row-for-row identical — every oracle depends on it."""

from __future__ import annotations

import pytest

from tv_event_streaming_spark.domain import derive_domain, with_domain

from .oracle import canonicalize, duck_connection

DERIVED = ["sources", "genres", "titles", "title_index", "user_prefs", "details"]


@pytest.mark.parametrize("name", DERIVED)
def test_derivation_lockstep(spark, sf_dir, name):
    d = derive_domain(spark, sf_dir)
    spark_pdf = d[name].toPandas()
    con = duck_connection(sf_dir)
    try:
        duck_pdf = con.execute(with_domain(f"SELECT * FROM {name}")).fetchdf()
    finally:
        con.close()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
    assert canonicalize(spark_pdf) == canonicalize(duck_pdf), f"{name} diverged"


def test_pivot_value_list_matches_data(spark, sf_dir):
    """daily_event_pivot pins an EXPLICIT pivot value list; if the
    generated testdata ever grows a new event type, the pivot would
    silently drop it into no column — fail loudly here instead."""
    from tv_event_streaming_spark.domain import load_table
    from tv_event_streaming_spark.operators.analytics import EVENT_TYPES

    types = {
        r.event_type
        for r in load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .collect()
    }
    assert types == set(EVENT_TYPES), types
