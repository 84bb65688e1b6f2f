#!/usr/bin/env python3
"""Regenerate EVIDENCE.json — per-entry fingerprints as of each entry's
last driver-green round (see tv_event_streaming_spark/evidence.py).

Run at round start, right after the driver commits CORRECTNESS_r{N}.json
(a test gates that the latest round has been absorbed). For every round
that is some entry's last green round, this:

1. finds the commit that ADDED that round's CORRECTNESS file (the
   driver commits results onto the exact tree it tested),
2. `git archive`s that tree into a tempdir,
3. drops the CURRENT evidence.py into it (old trees predate the
   module; the fingerprint ALGORITHM must be today's on both sides),
4. fingerprints the archived catalog in a subprocess, and
5. records {entry: {round, fingerprint}} for entries green that round.

If a round's commit can't be found (file never committed — e.g. a local
dry run), the LIVE tree's fingerprints are used for that round with a
warning: correct whenever the working tree still matches what the
driver tested, conservative otherwise (a mismatch only re-prioritizes).
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVIDENCE = os.path.join(ROOT, "EVIDENCE.json")


def _green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _round_commit(rnd: int) -> str | None:
    pattern = os.path.join(ROOT, f"CORRECTNESS_r*{rnd}.json")
    paths = [
        p
        for p in glob.glob(pattern)
        if re.search(rf"r0*{rnd}\.json$", p)
    ]
    if not paths:
        return None
    rel = os.path.relpath(paths[0], ROOT)
    res = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "-n", "1", "--", rel],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    sha = res.stdout.strip()
    return sha or None


def _fingerprint_tree(commit: str | None) -> dict[str, str]:
    """Fingerprint the catalog of the given commit's tree (or the live
    tree when commit is None) with TODAY'S algorithm, in a subprocess."""
    code = (
        "import sys, json; sys.path.insert(0, sys.argv[1]); "
        "from tv_event_streaming_spark.evidence import fingerprint_catalog; "
        "print(json.dumps(fingerprint_catalog()))"
    )
    if commit is None:
        res = subprocess.run(
            [sys.executable, "-c", code, ROOT],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(res.stdout)
    with tempfile.TemporaryDirectory(prefix="evidence_tree_") as tmp:
        archive = subprocess.run(
            ["git", "archive", commit],
            cwd=ROOT,
            capture_output=True,
            check=True,
        )
        subprocess.run(
            ["tar", "-x", "-C", tmp], input=archive.stdout, check=True
        )
        shutil.copy(
            os.path.join(ROOT, "tv_event_streaming_spark", "evidence.py"),
            os.path.join(tmp, "tv_event_streaming_spark", "evidence.py"),
        )
        res = subprocess.run(
            [sys.executable, "-c", code, tmp],
            cwd=tmp,
            capture_output=True,
            text=True,
            check=True,
        )
        return json.loads(res.stdout)


def main() -> None:
    green = _green_rounds()
    if not green:
        print("no CORRECTNESS files — nothing to record", file=sys.stderr)
        return
    rounds = sorted({r for r in green.values()})
    entries: dict[str, dict] = {}
    sources: dict[str, str] = {}
    for rnd in rounds:
        commit = _round_commit(rnd)
        if commit is None:
            print(
                f"WARNING: round {rnd} CORRECTNESS file has no commit — "
                "fingerprinting the LIVE tree for its entries",
                file=sys.stderr,
            )
        fps = _fingerprint_tree(commit)
        sources[str(rnd)] = commit or "<live-tree>"
        for name, last in green.items():
            if last != rnd:
                continue
            if name not in fps:
                print(
                    f"WARNING: {name} green in round {rnd} but absent from "
                    "that tree's catalog — leaving unrecorded (stays stale)",
                    file=sys.stderr,
                )
                continue
            entries[name] = {"round": rnd, "fingerprint": fps[name]}
    # the absorbed-round marker must cover every CORRECTNESS file that
    # EXISTS, not just rounds that produced green rows — an all-red or
    # truncated round would otherwise make the absorption test red
    # forever with a re-run remedy that cannot work
    import glob as _glob
    import re as _re

    file_rounds = [
        int(_re.search(r"r(\d+)\.json$", q).group(1))
        for q in _glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))
    ]
    doc = {
        "round": max(file_rounds + list(rounds)),
        "commits": sources,
        "entries": dict(sorted(entries.items())),
    }
    with open(EVIDENCE, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"EVIDENCE.json: {len(entries)} entries across rounds {rounds}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
