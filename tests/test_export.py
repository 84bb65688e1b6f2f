"""S13 data-dump sink: per-entity JSON exports round-trip losslessly."""

from __future__ import annotations

from tv_event_streaming_spark.domain import derive_domain
from tv_event_streaming_spark.sources.export import DEFAULT_ENTITIES, dump_entities


def test_dump_entities_roundtrip(spark, sf_dir, tmp_path):
    d = derive_domain(spark, sf_dir)
    paths = dump_entities(d, str(tmp_path))
    assert set(paths) == set(DEFAULT_ENTITIES)
    for name, path in paths.items():
        back = spark.read.json(path)
        assert back.count() == d[name].count(), name
        assert set(back.columns) == set(d[name].columns), name
