"""Render SCALE.md §10d from BENCH_sf1_all.json: per-query sf0.1→sf1
growth for the FULL registry, grouped into verdict bands, with every
above-linear probe ratio listed for explanation.

    python tools/growth_report.py [--md]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(md: bool = False) -> int:
    with open(os.path.join(ROOT, "BENCH_sf1_all.json")) as fh:
        d = json.load(fh)
    names = d["queries"]
    rows = []
    for n in names:
        m01, m1 = d["sf0.1"]["queries"][n], d["sf1"]["queries"][n]
        c01, c1 = d["sf0.1"]["cold"][n], d["sf1"]["cold"][n]
        rows.append((n, m01, m1, d["growth"][n], c01, c1,
                     d["growth_cold"][n]))
    rows.sort(key=lambda r: -r[3])
    # fixture is 10x: <=10x probe growth is at-or-under linear; small
    # absolute times are scheduling-bound and read as fixed-cost
    over = [r for r in rows if r[3] > 10.0 and r[2] > 1.0]
    bands = {
        "above linear (>10x, explain or fix)": over,
        "linear band (3x-10x)": [r for r in rows if 3.0 < r[3] <= 10.0],
        "sublinear (<=3x, fixed costs dominate)": [
            r for r in rows if r[3] <= 3.0
        ],
        "small-absolute above-10x (probe <=1 s at sf1 — scheduling noise, not data work)": [
            r for r in rows if r[3] > 10.0 and r[2] <= 1.0
        ],
    }
    for title, band in bands.items():
        print(f"\n### {title} — {len(band)} queries")
        if title.startswith("above linear"):
            print("| query | sf0.1 s | sf1 s | growth | cold sf1 s | cold growth |")
            print("|---|---|---|---|---|---|")
            for n, m01, m1, g, c01, c1, gc in band:
                print(f"| {n} | {m01} | {m1} | **{g}x** | {c1} | {gc}x |")
        else:
            worst = band[:8]
            shown = ", ".join(f"{n} {g}x" for n, _, _, g, _, _, _ in worst)
            print(f"worst: {shown}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main("--md" in sys.argv[1:]))
