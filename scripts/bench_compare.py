"""Shared-subset reconciliation between two BENCH_full_r{N}.json records
— the measurement protocol's adjudication step (PERFORMANCE.md): compare
per-query mins over the queries BOTH records carry, print the total and
median ratios plus the biggest movers with their rep spreads, so a
reader can tell code drift (stable across reps, concentrated in touched
paths) from host steal (large spread, uniform inflation).

Usage: python scripts/bench_compare.py BENCH_full_r11.json BENCH_full_r12.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    a, b = load(a_path), load(b_path)
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ratios = {n: (qb[n] / qa[n] if qa[n] else float("inf")) for n in shared}
    tot_a = sum(qa[n] for n in shared)
    tot_b = sum(qb[n] for n in shared)
    med = sorted(ratios.values())[len(ratios) // 2]
    print(f"shared queries: {len(shared)}")
    print(
        f"total: {tot_a:.2f}s -> {tot_b:.2f}s = {tot_b / tot_a:.3f}x; "
        f"median per-query {med:.3f}x"
    )
    spread_b = b.get("spread", {})
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print("biggest movers (ratio, new spread):")
    for n, r in movers[:3] + movers[-5:]:
        print(
            f"  {n}: {qa[n]:.2f}s -> {qb[n]:.2f}s = {r:.2f}x"
            f" (spread {spread_b.get(n, '?')})"
        )
    only_b = sorted(set(qb) - set(qa))
    if only_b:
        print(f"new in {b_path}: {only_b}")


if __name__ == "__main__":
    main()
