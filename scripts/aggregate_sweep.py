"""Aggregate a scale_sweep JSONL into the per-family markdown table
SCALE.md records (VERDICT r5 item 5: every corpus entry needs 100×
evidence, summarized per family rather than as 249 raw lines).

Usage: python scripts/aggregate_sweep.py /tmp/scale100_r6.jsonl
Prints the markdown table + a failures/skips appendix to stdout.
"""

from __future__ import annotations

import json
import statistics
import sys

FAMILIES = {
    "z": "zappy array ops",
    "r": "relational / TPC-H",
    "b": "bench twins",
    "s": "streaming twins (batch form)",
    "t": "text analysis",
    "d": "dedup / sampling / pipeline",
    "v": "vectors / ANN / sketches",
    "l": "LLM-pipeline core",
    "m": "multimodal plumbing",
}


def main() -> int:
    path = sys.argv[1]
    rows = [json.loads(line) for line in open(path)]
    seen: dict[str, dict] = {}
    for r in rows:  # keep the LAST record per name (re-runs win)
        seen[r["name"]] = r
    fams: dict[str, list[dict]] = {}
    for r in seen.values():
        fams.setdefault(r["name"][0], []).append(r)

    print(
        "| family | entries | hash-match | skipped | failed |"
        " spark med/max (s) | duck med/max (s) |"
    )
    print("|---|---|---|---|---|---|---|")
    tot = {"n": 0, "ok": 0, "skip": 0, "fail": 0}
    for key in sorted(fams, key=lambda k: "zrbstdvlm".index(k)):
        rs = fams[key]
        ok = [r for r in rs if r.get("ok")]
        skip = [r for r in rs if r.get("skipped")]
        fail = [r for r in rs if not r.get("ok") and not r.get("skipped")]
        sp = sorted(r["spark_s"] for r in ok)
        du = sorted(r["duck_s"] for r in ok)
        med = lambda xs: statistics.median(xs) if xs else 0.0  # noqa: E731
        print(
            f"| {key}* {FAMILIES[key]} | {len(rs)} | {len(ok)} |"
            f" {len(skip)} | {len(fail)} |"
            f" {med(sp):.2f} / {max(sp, default=0):.1f} |"
            f" {med(du):.2f} / {max(du, default=0):.1f} |"
        )
        tot["n"] += len(rs)
        tot["ok"] += len(ok)
        tot["skip"] += len(skip)
        tot["fail"] += len(fail)
    print(
        f"| **total** | {tot['n']} | {tot['ok']} | {tot['skip']} |"
        f" {tot['fail']} | | |"
    )
    print()
    vac = sorted(r["name"] for r in seen.values() if r.get("vacuous"))
    print(
        f"Vacuous (0-row hash matches — arithmetic unexercised at this "
        f"fixture): {len(vac)}"
        + (f" — {', '.join(f'`{n}`' for n in vac)}" if vac else "")
    )
    print()
    for r in seen.values():
        if r.get("skipped"):
            print(f"- skipped `{r['name']}`: {r.get('reason', 'quadratic oracle twin (conftest policy)')}")
    for r in seen.values():
        if not r.get("ok") and not r.get("skipped"):
            print(f"- FAILED `{r['name']}`: {str(r.get('error'))[:160]}")
    slow = sorted(
        (r for r in seen.values() if r.get("ok")),
        key=lambda r: -r["spark_s"],
    )[:8]
    print()
    print("Slowest Spark sides:")
    for r in slow:
        print(
            f"- `{r['name']}`: spark {r['spark_s']:.1f}s,"
            f" duck {r['duck_s']:.1f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
