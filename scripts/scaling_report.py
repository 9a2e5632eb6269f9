#!/usr/bin/env python
"""Scaling-rehearsal report: per-query r(sf1)/r(sf0.1) ratios.

Reads the two bench records (BENCH_LOCAL.json at sf0.1, BENCH_SF1.json at
sf1 — both produced by bench.py under its best-run-wins discipline) and
prints a markdown table sorted by ratio, flagging anything super-linear
(ratio > the data factor). Exchange counts at both scales are shown so a
ratio regression is attributable: same exchanges ⇒ same plan shape, the
growth is data; different exchanges ⇒ the plan changed with scale.

Usage: python scripts/scaling_report.py [base.json] [scaled.json] [factor]
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    base_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "BENCH_LOCAL.json")
    scaled_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "BENCH_SF1.json")
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    with open(base_path) as f:
        base = json.load(f)
    with open(scaled_path) as f:
        scaled = json.load(f)

    rows = []
    for q, t in scaled["queries"].items():
        p = base["queries"].get(q)
        if p:
            rows.append(
                (
                    t / p,
                    q,
                    p,
                    t,
                    base.get("exchanges", {}).get(q),
                    scaled.get("exchanges", {}).get(q),
                )
            )
    if not rows:
        print(
            "no overlapping queries between the two bench files "
            f"({len(base['queries'])} vs {len(scaled['queries'])}) - nothing to compare"
        )
        return 1
    # key on ratio only: trailing exchange counts can be None and tuple
    # comparison would TypeError on a ratio tie
    rows.sort(key=lambda r: r[0], reverse=True)

    print(f"| query | sf{base['sf']} s | sf{scaled['sf']} s | ratio | exchanges | verdict |")
    print("|---|---|---|---|---|---|")
    for ratio, q, p, t, eb, es in rows:
        plan = f"{eb}→{es}" + ("" if eb == es else " ⚠ plan changed")
        verdict = "super-linear ⚠" if ratio > factor else ("~linear" if ratio > factor / 2 else "sub-linear")
        print(f"| {q} | {p:.2f} | {t:.2f} | {ratio:.1f}× | {plan} | {verdict} |")

    ratios = sorted(r[0] for r in rows)
    med = ratios[len(ratios) // 2]
    base_total = base["value"] or float("nan")
    over = [r for r in rows if r[0] > factor]
    print()
    print(
        f"{len(rows)} queries; totals {base['value']:.1f}s → {scaled['value']:.1f}s "
        f"({scaled['value'] / base_total:.2f}× for {factor:.0f}× data); "
        f"median ratio {med:.2f}×; >{factor:.0f}× : {[r[1] for r in over] or 'none'}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
