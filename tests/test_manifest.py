"""Manifest-drift gates (VERDICT r5 item 6): the three places a
corpus count appears — QUERIES.md, COVERAGE.md's header, and
``len(QUERIES)`` itself — must agree, and QUERIES.md must be byte-
identical to what scripts/gen_query_manifest.py would regenerate.
Round 5 shipped a COVERAGE.md header saying 232 while the corpus
held 240; these pins make that class of drift a test failure."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_queries_md_matches_generator(tmp_path):
    """Regenerating the manifest in a scratch dir must reproduce the
    committed QUERIES.md byte-for-byte (entry added without regen =
    red)."""
    committed = (REPO / "QUERIES.md").read_text()
    script = (REPO / "scripts" / "gen_query_manifest.py").read_text()
    subprocess.run(
        [sys.executable, "-c", script],
        cwd=tmp_path,
        env={"PYTHONPATH": str(REPO), "PATH": "/usr/bin:/bin"},
        check=True,
        capture_output=True,
    )
    regenerated = (tmp_path / "QUERIES.md").read_text()
    assert regenerated == committed, (
        "QUERIES.md is stale — run "
        "`PYTHONPATH=. python scripts/gen_query_manifest.py`"
    )


def test_counts_agree_everywhere():
    from zappy_spark.queries import ORACLE, QUERIES

    n = len(QUERIES)
    # QUERIES.md header line
    qmd = (REPO / "QUERIES.md").read_text()
    m = re.search(r"^(\d+) entries; (\d+) with DuckDB oracles", qmd, re.M)
    assert m, "QUERIES.md header line missing"
    assert int(m.group(1)) == n and int(m.group(2)) == len(ORACLE)
    # QUERIES.md table rows
    assert len(re.findall(r"^\| \d+ \|", qmd, re.M)) == n
    # COVERAGE.md headline count
    cmd = (REPO / "COVERAGE.md").read_text()
    m2 = re.search(
        r"\*\*(\d+) queries, (\d+) oracle-checked", cmd
    )
    assert m2, "COVERAGE.md headline count missing"
    assert int(m2.group(1)) == n, (
        f"COVERAGE.md says {m2.group(1)} queries but len(QUERIES) is "
        f"{n} — update the header"
    )
    assert int(m2.group(2)) == len(ORACLE)


def test_every_query_key_has_unique_prefix_id():
    """Corpus keys follow `<family><nn>_name`; collisions in the
    short id (e.g. two r89s) would scramble the rotation doctrine."""
    from zappy_spark.queries import QUERIES

    ids = [k.split("_", 1)[0] for k in QUERIES]
    dupes = {i for i in ids if ids.count(i) > 1}
    assert not dupes, f"duplicate corpus ids: {sorted(dupes)}"
