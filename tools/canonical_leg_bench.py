"""Measure the canonical-leg compiler optimization (round 4).

Ordered join legs reading the canonical (src<dst) base table directly
(``compile_match(..., edges_canonical=...)``) vs plain symmetrized-union
legs, on generic-compiler pattern counts at --sf. Fresh plan per rep,
min over --reps (shared-host methodology, BENCH.md).

Usage: python tools/canonical_leg_bench.py [--sf 0.1] [--reps 3]
Prints one JSON line with per-pattern {plain, canonical, speedup}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skewed", action="store_true",
                    help="power-law hub graph (bench.py --skewed input) — "
                         "the big-intermediate regime where halved build "
                         "sides matter most")
    args = ap.parse_args()

    from peregrine_spark.graph.build import build_graph, symmetrized
    from peregrine_spark.patterns.small_graph import PatternGenerator, SmallGraph
    from peregrine_spark.plans.compiler import compile_match
    from peregrine_spark.session import get_spark
    from peregrine_spark.tables import powerlaw_edges, source_repo_table

    spark = get_spark(app_name="canonical_leg_bench")
    if args.skewed:
        edges = powerlaw_edges(spark, int(args.sf * 1_000_000), 100_000)
    else:
        edges = build_graph(source_repo_table(spark, sf=args.sf)).edges
    edges = edges.localCheckpoint()  # shared materialized table, lakehouse-style
    n_edges = edges.count()

    pats = {
        "clique4": PatternGenerator.clique(4),
        "clique5": PatternGenerator.clique(5),
        "cycle4": PatternGenerator.cycle(4),
        "p1_diamond": SmallGraph(edges=[(1, 2), (1, 3), (1, 4), (2, 3), (3, 4)]),
    }
    out = {"sf": args.sf, "skewed": args.skewed, "n_edges": n_edges,
           "reps": args.reps, "queries": {}}
    for name, p in pats.items():
        res = {}
        mode_counts = {}
        for mode, canon in (("plain", None), ("canonical", edges)):
            walls, counts = [], set()
            for _ in range(args.reps):
                t0 = time.monotonic()
                # fresh plan per rep: symmetrized() builds a new union node
                c = compile_match(
                    symmetrized(edges), p, edges_canonical=canon
                ).df.count()
                walls.append(time.monotonic() - t0)
                counts.add(c)
            assert len(counts) == 1, (name, mode, counts)
            res[mode] = round(min(walls), 3)
            res[f"{mode}_reps"] = [round(w, 3) for w in walls]
            mode_counts[mode] = counts.pop()
        # the measured configuration must agree ACROSS modes, not just
        # within each — a plain-vs-canonical divergence is a correctness
        # bug, not a benchmark result
        assert mode_counts["plain"] == mode_counts["canonical"], (
            name, mode_counts,
        )
        res["count"] = mode_counts["plain"]
        res["speedup"] = round(res["plain"] / res["canonical"], 3)
        out["queries"][name] = res
        print(f"# {name}: {res['plain']} -> {res['canonical']} s "
              f"({res['speedup']}x), count={res['count']}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
