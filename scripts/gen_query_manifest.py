"""Regenerate QUERIES.md: one line per corpus entry — key, oracle
status, and the first docstring sentence of its builder. Run after
adding queries:

    PYTHONPATH=. python scripts/gen_query_manifest.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from zappy_spark.queries import ORACLE, QUERIES  # noqa: E402


def first_sentence(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return "(see builder)"
    doc = re.sub(r"\s+", " ", doc)
    m = re.match(r"(.+?[.!?])(\s|$)", doc)
    out = m.group(1) if m else doc
    return out if len(out) <= 220 else out[:217] + "..."


def main() -> None:
    lines = [
        "# QUERIES — the declared corpus, one line per entry",
        "",
        f"{len(QUERIES)} entries; {len(ORACLE)} with DuckDB oracles "
        "(driver CORRECTNESS gate), the rest rows-only + property "
        "tests. Regenerate with scripts/gen_query_manifest.py.",
        "",
        "| # | entry | oracle | what it does |",
        "|---|---|---|---|",
    ]
    for i, (k, fn) in enumerate(QUERIES.items(), 1):
        mark = "yes" if k in ORACLE else "rows-only"
        desc = first_sentence(fn).replace("|", "\\|")
        lines.append(f"| {i} | {k} | {mark} | {desc} |")
    with open("QUERIES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md ({len(QUERIES)} entries)")


if __name__ == "__main__":
    main()
